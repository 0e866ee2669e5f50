package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** bench_phrase / bench_bm25 adjudication probe (round 17, the round-16
  * verdict's watch #1): the driver's single-run BENCH_r16 read
  * bench_phrase at 1.22× and bench_bm25 at 1.14× of their gates while
  * the in-run calibrator (bench_ann) read CALM — the exact pattern the
  * round-16 hybrid ruling says must NOT be auto-ruled box drift.
  * Decompose the phrase kernel into its legs ON THE SAME JVM IN THE
  * SAME MINUTE, bracketed by the calibrator:
  *
  *  - `ann` (×2, before/after): the unchanged-since-round-7 calibrator;
  *  - `bag`: bm25Query over the SAME positional index — the scoring
  *    machinery the phrase kernel ends with (control collect + pushed
  *    scan + partials + top-k), none of the positional work;
  *  - `bagIdx`: bm25Query over the bench_bm25-style plain index — the
  *    bench_bm25 kernel itself;
  *  - `control`: the bounded per-(qid, term) df collect replicated
  *    verbatim (the ONE control read the phrase plan makes);
  *  - `cand`: the rarest-term candidate subplan replicated (rarest
  *    term per qid from the control rows, semi-join of the positional
  *    scan, distinct candidate docs) — the candidate-gate leg;
  *  - `phrase`: the full bm25PhraseQuery kernel, Bench's call verbatim.
  *
  * The alignment+match residual is phrase − (control + cand + bag).
  * Reading: a leg whose share is anomalous vs the r13 gate profile
  * names a regression; all legs proportionally warm with a calm
  * calibrator names JVM wander (re-baseline with bands).
  * `SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.DevPhraseProfile"`.
  */
object DevPhraseProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def med(df: => DataFrame): Double = {
      force(df)
      (0 until 3).map { _ =>
        val t0 = System.nanoTime(); force(df)
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }
    def medU(body: => Unit): Double = {
      body
      (0 until 3).map { _ =>
        val t0 = System.nanoTime(); body
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }
    val docs = Tables.documents(spark, sfDir)
    val posT = "phprof_pos"
    val bagT = "phprof_bag"
    Retrieval.bm25Build(docs, "doc_id", "text", posT, positions = true)
    Retrieval.bm25Build(docs, "doc_id", "text", bagT)
    val q = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(operators.TextOps.tokens(lower(col("text"))),
          1, 3)).as("qtext"))

    val tAnn1 = med(queries.Queries.sim1_knn(spark, sfDir))
    val tPhrase = med(Retrieval.bm25PhraseQuery(spark, posT, q,
      "qid", "qtext", 5))
    val tBagIdx = med(Retrieval.bm25Query(spark, bagT, q,
      "qid", "qtext", 5))
    val tBagPos = med(Retrieval.bm25Query(spark, posT, q,
      "qid", "qtext", 5))
    // the control read, replicated verbatim (posGatedProbe's one
    // bounded collect): per-(qid, term) df over the folded dictionary
    val qt = q.select(col("qid"),
        explode(operators.TextOps.tokens(lower(col("qtext")))).as("term"))
      .distinct()
    def controlRows() = qt
      .join(spark.table(s"${posT}_terms")
        .groupBy("term").agg(sum("df").as("df")), Seq("term"), "left")
      .select(col("qid"), col("term"),
        coalesce(col("df"), lit(0L)).as("df"))
      .limit(8193).collect()
    val tControl = medU { controlRows(); () }
    // the rarest-term candidate subplan: candidates = the lowest-df
    // term's positional postings per qid, distinct docs
    val rows = controlRows()
    val rarest = rows.groupBy(_.getLong(0)).map { case (_, rs) =>
      rs.minBy(r => (r.getLong(2), r.getString(1))).getString(1)
    }.toSeq.distinct
    val tCand = med {
      spark.table(s"${posT}_pos")
        .filter(col("term").isin(rarest: _*))
        .select("doc_id").distinct()
    }
    val tAnn2 = med(queries.Queries.sim1_knn(spark, sfDir))
    val residual = tPhrase - tControl - tCand - tBagPos
    println(f"[phprof] sf=$sfDir ann1=${tAnn1}%.3fs ann2=${tAnn2}%.3fs " +
      f"phrase=${tPhrase}%.3fs bagIdx(bench_bm25)=${tBagIdx}%.3fs " +
      f"bagOnPosIdx=${tBagPos}%.3fs control=${tControl}%.3fs " +
      f"cand=${tCand}%.3fs alignResidual=${residual}%.3fs")
  }
}
