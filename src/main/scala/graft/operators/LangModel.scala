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
  * counts as a side input. This operator is that pattern with the
  * second pass scoring documents against the counts.
  *
  * Two passes over text, both shaped for scale:
  *  - [[train]]: ONE tokenize scan → bigram counts, bucketed by the
  *    history word (`w1`) so scoring joins are co-located; history
  *    totals derive FROM the bigram table (c(w1) = Σ_w2 c(w1,w2) — no
  *    second scan), and the vocabulary size lands in a one-row stats
  *    table.
  *  - [[score]]: explode each doc's adjacent-pair bigrams, left-join
  *    the count tables (unseen bigram/history → 0), per-bigram
  *    contribution round(ln((c+1)/(ch+V))·1e6) as an integer micro —
  *    integer sums are order-independent, so the doc score is
  *    bit-stable under any partitioning (the BM25 determinism
  *    discipline). No window, no driver loop; the one driver-side read
  *    is the one-row V lookup (bounded control value).
  *
  * Output is `(id, n_bigrams, logp_micro)` — the SUM of micro log
  * probabilities and the bigram count; callers derive mean-logP or a
  * perplexity proxy without this operator ever dividing doubles.
  * Documents with fewer than two tokens emit `(id, 0, 0)`: a length
  * filter's job, not the LM's — dropping them silently would make the
  * operator's output a filtered view nobody asked for.
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

  /** Train: write `<table>` (w1, w2, c — bucketed by w1),
    * `<table>_hist` (w1, ch — bucketed by w1) and `<table>_stats`
    * (one row: v = distinct vocabulary size over ALL tokens, the
    * add-one denominator).
    */
  def train(corpus: DataFrame, idCol: String, textCol: String,
            table: String, buckets: Int = 8): Unit = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val bg = bigrams(corpus, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    BucketedJoin.writeBucketed(bg, table, "w1", buckets)
    val spark = corpus.sparkSession
    // derive history totals from the LANDED bigram table: one bucketed
    // aggregate, zero extra corpus scans, and hist is exactly Σ_w2 c
    val hist = spark.table(table).groupBy("w1").agg(sum("c").as("ch"))
    BucketedJoin.writeBucketed(hist, s"${table}_hist", "w1", buckets)
    val v = corpus.select(explode(toks(col(textCol))).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    BucketedJoin.writeBucketed(v, s"${table}_stats", "v", 1)
  }

  /** Score: per-doc Σ round(ln((c(w1,w2)+1)/(c(w1)+V))·1e6) over the
    * doc's adjacent-pair bigrams (integer micro sum) plus the bigram
    * count. Unseen histories/bigrams smooth to ln(1/V)/ln((0+1)/(0+V))
    * naturally through the left joins.
    */
  def score(spark: SparkSession, table: String, docs: DataFrame,
            idCol: String, textCol: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val v = spark.table(s"${table}_stats").head().getLong(0)
    val bg = bigrams(docs, idCol, textCol)
    val contrib = bg
      .join(spark.table(table), Seq("w1", "w2"), "left")
      .join(spark.table(s"${table}_hist"), Seq("w1"), "left")
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
