package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Word-bigram language-model quality scoring — the CCNet-style corpus
  * filter (Wenzek et al., LREC'20: documents improbable under a
  * reference LM are boilerplate/gibberish/wrong-language; they filter
  * CommonCrawl by LM perplexity buckets). Kneser-Ney at 100 TB is a
  * different project; an add-one-smoothed bigram model captures the
  * ranking signal the pipeline dial needs and keeps every number
  * exactly reproducible (integer counts in, one ln per bigram out).
  *
  * Reference lineage: the closest reference surface is the aggregate
  * wordcount family (`hadoop-mapreduce-examples` AggregateWordCount /
  * WordCount chains) — counting n-grams over a corpus and reusing the
  * counts as a side input. This operator is that pattern with a second
  * pass scoring documents against the counts, plus the incremental
  * contract every index family here carries.
  *
  * Persisted layout (the incremental-index shape, like the BM25/minhash
  * families): `<table>` holds bigram COUNT DELTAS `(w1, w2, c)` —
  * [[train]] writes one, each [[append]] adds a batch's deltas into the
  * same bucketed layout — and `<table>_vocab` holds the distinct
  * vocabulary (append adds only unseen words). Counts fold at query
  * time: [[score]] aggregates the deltas by (w1, w2), then derives
  * history totals c(w1) = Σ_w2 c and V = vocab count from the folded
  * frame. Both aggregates group by a superset of the bucket key (w1),
  * so they reuse the table's bucketing — NO exchange on the big table;
  * the one driver-side action is the single-value V count (bounded
  * control value). A grown model is numerically IDENTICAL to one built
  * whole (counts are additive, vocab is a set union) — the dd6/t17
  * grown ≡ whole-built contract, oracle-gated at t25.
  *
  * Id contract: append-only — re-appending the same documents
  * double-counts them (the [[Retrieval.bm25Append]] contract; run the
  * dedup admission check first in refresh flows). [[compact]] folds
  * accumulated deltas into one row per bigram to cap the serve-time
  * fold's input after many appends.
  *
  * [[score]] output is `(id, n_bigrams, logp_micro)`: per-bigram
  * contribution round(ln((c+1)/(ch+V))·1e6) as an integer micro —
  * integer sums are order-independent, so scores are bit-stable under
  * any partitioning (the BM25 determinism discipline). Documents with
  * fewer than two tokens emit `(id, 0, 0)`: a length filter's job, not
  * the LM's — dropping them silently would make the output a filtered
  * view nobody asked for.
  */
object LangModel {

  private def toks(c: org.apache.spark.sql.Column) = TextOps.tokens(lower(c))

  /** Adjacent-pair bigrams of `textCol` as `(w1, w2)` rows, one per
    * OCCURRENCE (duplicates preserved — counts, not sets).
    */
  private def bigrams(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = docs.select(col(idCol).as("id"), toks(col(textCol)).as("ws"))
    t.select(col("id"),
        explode(zip_with(
          slice(col("ws"), lit(1), greatest(size(col("ws")) - 1, lit(0))),
          slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("id"), col("bg.w1"), col("bg.w2"))
  }

  /** One delta row per (w1, w2) per batch, tagged with the batch's
    * `epoch` (−1 for non-streaming writes): the tag is what makes a
    * crashed streaming absorb row-level repairable — a replayed epoch
    * anti-joins on (w1, w2, epoch) and appends only the rows the crash
    * lost, the [[Retrieval.bm25Append]] repair discipline applied to
    * additive counts.
    */
  private def bigramDeltas(docs: DataFrame, idCol: String,
                           textCol: String, epoch: Long): DataFrame =
    bigrams(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .withColumn("epoch", lit(epoch))

  private def vocabOf(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(toks(col(textCol))).as("w")).distinct()

  /** Build: ONE tokenize scan → `<table>` (w1, w2, c — bucketed by w1)
    * + `<table>_vocab` (w — the add-one denominator's universe).
    */
  def train(corpus: DataFrame, idCol: String, textCol: String,
            table: String, buckets: Int = 8): Unit = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    BucketedJoin.writeBucketed(bigramDeltas(corpus, idCol, textCol, -1L),
      table, "w1", buckets)
    BucketedJoin.writeBucketed(vocabOf(corpus, textCol),
      s"${table}_vocab", "w", buckets)
  }

  /** Absorb a batch of NEW documents at O(batch) cost: the batch's
    * bigram deltas re-bucket into the standing layout, unseen words
    * append to the vocab. Nothing existing is rewritten — counts fold
    * at query time ([[score]]), or physically via [[compact]].
    *
    * `epoch`/`repair`: the streaming-replay contract. A replayed epoch
    * calls with `repair = true`; the delta append then anti-joins the
    * standing table's rows FOR THIS EPOCH and appends only what a
    * crash lost (each epoch writes at most one row per (w1, w2), so
    * the anti-join completes a partial append exactly). The vocab
    * append is left-anti by construction — naturally idempotent.
    */
  def append(spark: SparkSession, table: String, docs: DataFrame,
             idCol: String, textCol: String, epoch: Long = -1L,
             repair: Boolean = false): Unit = {
    GraftFunctions.ensureRegistered(spark)
    val deltas0 = bigramDeltas(docs, idCol, textCol, epoch)
    val deltas = if (repair)
      deltas0.join(
        spark.table(table).filter(col("epoch") === epoch)
          .select("w1", "w2"),
        Seq("w1", "w2"), "left_anti")
    else deltas0
    BucketedJoin.appendBucketed(deltas, table, "w1")
    BucketedJoin.appendBucketed(
      vocabOf(docs, textCol)
        .join(spark.table(s"${table}_vocab"), Seq("w"), "left_anti"),
      s"${table}_vocab", "w")
  }

  /** Physically fold accumulated append deltas: one row per (w1, w2),
    * same bucketed layout, scores unchanged (the fold [[score]] does
    * lazily, made durable). Crash-safe via the shared
    * stage → rename-aside swap ([[BucketedJoin.rewriteBucketed]]) —
    * never overwrites the only copy in place.
    */
  /** Folded rows carry epoch −1 ("base"): compaction only ever runs on
    * committed epochs (the refresh loop's cadence), and committed
    * epochs never replay their appends, so erasing their tags is safe.
    */
  def compact(spark: SparkSession, table: String): Unit =
    compactImpl(spark, table, failAt = -1)

  /** [[compact]] with the [[BucketedJoin.rewriteBucketedImpl]] crash
    * seam threaded through — the chaos spec kills the fold after every
    * swap boundary and asserts [[score]] heals bit-identical (score
    * runs [[BucketedJoin.recoverCompacted]] before reading).
    */
  private[graft] def compactImpl(spark: SparkSession, table: String,
                                 failAt: Int): Unit =
    BucketedJoin.rewriteBucketedImpl(spark, table, "w1", failAt)(df =>
      df.groupBy("w1", "w2").agg(sum("c").as("c"))
        .withColumn("epoch", lit(-1L)))

  /** Score: per-doc Σ round(ln((c(w1,w2)+1)/(c(w1)+V))·1e6) over the
    * doc's adjacent-pair bigrams (integer micro sum) plus the bigram
    * count. Unseen histories/bigrams smooth to (0+1)/(0+V) naturally
    * through the left joins. Counts fold from the delta table inside
    * the plan (bucket-local aggregates, no exchange on the index).
    */
  def score(spark: SparkSession, table: String, docs: DataFrame,
            idCol: String, textCol: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    // heal a crashed compact before reading (the rename-aside swap can
    // die between its two renames, leaving <table> briefly absent —
    // recoverCompacted rolls the idempotent swap forward or back, the
    // bm25 healFold discipline applied to the LM fold)
    BucketedJoin.recoverCompacted(spark, table)
    val v = spark.table(s"${table}_vocab").count()
    // V = 0 means the model trained on an empty/whitespace-only corpus:
    // every scored bigram would compute ln((c+1)/0) = +Inf and the long
    // cast would saturate to garbage scores — fail loudly instead
    require(v > 0, s"LangModel.score: model $table has an empty " +
      "vocabulary (trained on an empty or whitespace-only corpus)")
    val cnt = spark.table(table).groupBy("w1", "w2").agg(sum("c").as("c"))
    val hist = cnt.groupBy("w1").agg(sum("c").as("ch"))
    val bg = bigrams(docs, idCol, textCol)
    val contrib = bg
      .join(cnt, Seq("w1", "w2"), "left")
      .join(hist, Seq("w1"), "left")
      .select(col("id"),
        round(log(
            (coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) /
            (coalesce(col("ch"), lit(0L)).cast("double") + lit(v.toDouble)))
          * lit(1e6)).cast("long").as("lp"))
    val scored = contrib.groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("logp_micro"))
    // <2-token docs produced no bigram rows: restore them with (0, 0)
    docs.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logp_micro"), lit(0L)).as("logp_micro"))
  }
}
