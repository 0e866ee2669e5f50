package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting. All are pure `Column` expressions (whole-stage codegen,
  * no UDFs) except language ID, which is a tiny scoring expression over
  * per-language stopword hit counts.
  *
  * Scale: every operator is per-row (map-only, no shuffle); fingerprints
  * and token stats feed the dedup operators (see Dedup.scala).
  */
object TextOps {

  /** Whitespace tokens, empties dropped (WordCount tokenizer semantics —
    * reference: hadoop-mapreduce-examples `WordCount.java:36-50`,
    * StringTokenizer = split on whitespace runs).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > 0)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: tokens split further on letter/digit/other
    * boundaries (a cheap proxy for tokenizer-cost estimation).
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|[^a-zA-Z0-9]+"),
      w => length(w) > 0)).cast("long")

  /** Quality metrics per document: token count, mean token length,
    * punctuation ratio, uppercase ratio, stopword ratio — the standard
    * length/punct/stopword heuristics.
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that",
      "for", "on", "with", "as", "was", "at", "by", "be", "this", "are")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text),
      w => array_contains(array(stopwords.map(lit): _*), lower(w)))).cast("long")

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  def upperCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[A-Z]", ""))

  /** Quality feature frame: doc rows → metrics columns.
    *
    * All ratios are a SINGLE IEEE division of exact integer counts, so the
    * doubles are bitwise-reproducible in any engine computing the same
    * formula (DuckDB oracle parity — no decimal rounding involved).
    */
  def qualityMetrics(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    docs.select(
      col(idCol),
      nTok.as("n_tokens"),
      when(nTok > 0,
        aggregate(tokens(t), lit(0L), (acc, w) => acc + length(w))
          .cast("double") / nTok).otherwise(0.0).as("mean_tok_len"),
      when(length(t) > 0,
        punctCount(t).cast("double") / length(t)).otherwise(0.0)
        .as("punct_ratio"),
      when(length(t) > 0,
        upperCount(t).cast("double") / length(t)).otherwise(0.0)
        .as("upper_ratio"),
      when(nTok > 0,
        stopwordCount(t).cast("double") / nTok).otherwise(0.0)
        .as("stopword_ratio"))
  }

  /** Content fingerprint: md5 of whitespace-normalized, lowercased text —
    * engine-independent (DuckDB-checkable), stable under formatting noise.
    */
  def fingerprint(text: Column): Column =
    substring(md5(lower(regexp_replace(text, "\\s+", " "))), 1, 16)

  /** Shingle fingerprint: min of 64-bit hashes over word 3-shingles — a
    * 1-value MinHash, useful as a cheap near-dup blocking key. Uses the
    * native `word_shingles` kernel (requires
    * `GraftFunctions.ensureRegistered`); short texts fall back to a
    * whole-text hash.
    */
  def shingleFingerprint(text: Column, k: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) < k, xxhash64(text))
      .otherwise(array_min(transform(
        graft.functions.GraftFunctions.wordShingles(toks, k),
        s => xxhash64(s))))
  }

  /** Corpus-commonality score — the two-pass global-statistic shape of
    * perplexity-style quality filtering (pass 1: corpus-wide token
    * frequencies; pass 2: score each document against them), kept in
    * exact integer arithmetic so it is engine-reproducible (log-prob
    * variants differ in the last ulp across libm implementations).
    * Low `sum_tok_freq / n_tokens` = document of rare tokens — the
    * usual "weird text" signal.
    *
    * Scale: the frequency table is a corpus-derived dimension (vocab ≪
    * corpus); the score join shuffles tokens by word — or broadcasts
    * when the vocab fits, which Catalyst/AQE decides.
    */
  def commonality(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("word"))
    val freq = toks.groupBy("word").agg(count(lit(1)).as("freq"))
    toks.join(freq, "word")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("freq").as("sum_tok_freq"))
  }

  /** Overlapping character chunks for long-document training prep:
    * 1→N explode of (chunk_idx, chunk) with `size` chars per chunk and
    * `overlap` chars shared between neighbors. Pure column expressions —
    * map-only, no UDF; empty text yields no chunks.
    */
  def chunk(text: Column, size: Int, overlap: Int): Column = {
    require(size > overlap && overlap >= 0, "need size > overlap >= 0")
    val stride = size - overlap
    val n = length(text)
    // starts: 1, 1+stride, … while start <= len - overlap — i.e. stop
    // once the previous chunk already reached the end, so no chunk is
    // fully contained in its predecessor; sequence guard for empty text
    val starts = when(n < 1, array().cast("array<int>"))
      .otherwise(sequence(lit(1), greatest(n - overlap, lit(1)), lit(stride)))
    // NB: Column `/` is double division — cast back to int for the index
    // (exact: chunk counts are far below 2^53)
    transform(starts, st => struct(((st - 1) / stride).cast("int").as("chunk_idx"),
      substring(text, st, lit(size)).as("chunk")))
  }

  /** PII scrubbing: regex redaction of emails, long digit runs (phone /
    * account numbers), and IPv4 addresses — the standard patterns, each
    * replaced with a typed tag so downstream counts stay analyzable.
    */
  def redact(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\b\\d{7,}\\b", "<NUM>")
  }

  /** Deterministic train/val/test assignment from a stable key: the
    * first two hex digits of md5(key) give a 256-bucket hash, compared
    * against hex thresholds AS STRINGS (2-char lowercase hex compares
    * lexicographically = numerically, the same trick as md5Filter) —
    * engine-reproducible and stable under resharding, which is the
    * property that matters for split hygiene.
    */
  def splitAssign(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    // A 100% threshold would format as the 3-char "100", which compares
    // lexicographically BELOW most 2-char hex hashes — clamp to a sentinel
    // above every 2-char hex string instead.
    def thresh(pct: Int): String =
      if (pct >= 100) "zz" else f"${256 * pct / 100}%02x"
    val h = substring(md5(key.cast("string")), 1, 2)
    when(h < thresh(trainPct), "train")
      .when(h < thresh(trainPct + valPct), "val")
      .otherwise("test")
  }

  /** Language ID: n-gram/stopword heuristic. Scores each candidate
    * language by stopword hits and picks the max (deterministic
    * tie-break: language order). Real pipelines plug in fastText-style
    * models via the same column contract.
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "una", "para", "que", "con"))

  def langId(text: Column): Column = {
    val toks = transform(tokens(text), w => lower(w))
    // max by (hits, -rank) → highest hits; on a tie the language earliest
    // in sorted order wins. The tie field must distinguish whole codes
    // (a first-character tie like 'en'/'es' would otherwise fall through
    // to the lexicographically larger lang string).
    val scored = langStopwords.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((lang, sw), idx) =>
        struct(
          size(filter(toks, w => array_contains(array(sw.map(lit): _*), w))).as("hits"),
          lit(-idx).as("tie"),
          lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
