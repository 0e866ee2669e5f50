package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Block-max SCAN-SKIP demonstration (round 20, VERDICT r19 ask #5):
  * the layout's claim is that the pushed candidate predicate skips
  * parquet pages when posting lists outgrow the candidate set — prove
  * it by reading the executor INPUT METRICS (records/bytes actually
  * read from files), not by wall-clock inference.
  *
  * Three serving arms, one engaged `mixed` batch (DevMaxScore's
  * protocol: tail-bearing queries + the corpus's hottest term), same
  * queries, bit-identical results (asserted):
  *
  *  1. `blockmax pushed`   — defaults on the blk-sorted table: the
  *     materialized candidate ids reach the postings SCAN as a pushed
  *     per-value `doc_id IN` (fine 2048-row pages skip via the column
  *     index);
  *  2. `blockmax unpushed` — SAME table, SAME files, `maxCandBroadcast
  *     = 0` forces the lazy flow: candidates gate through a shuffle
  *     semi-join, nothing reaches the scan — the only difference from
  *     arm 1 is the push, so rows-read(1) / rows-read(2) IS the skip
  *     ratio;
  *  3. `plain` — the non-block-max layout at defaults (its doc-sorted
  *     coarse pages cannot skip against a pushed set; the engine
  *     routes it through the semi-join), the round-18 reference.
  *
  * `sbt "Test/runMain graft.DevBlockSkip [nDocs] [nq]"` — reuses
  * DevMaxScore's corpus + index fixtures under /tmp/graft-scale.
  */
object DevBlockSkip {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val nqTarget = if (args.length > 1) args(1).toLong else 25L
    val spark = SparkSession.builder()
      .master("local[32,4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._

    // executor input metrics, accumulated per task — records/bytes
    // actually READ from files (post page-skip), the direct evidence
    // the ask wants
    val recs = new java.util.concurrent.atomic.AtomicLong()
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val im = te.taskMetrics.inputMetrics
          recs.addAndGet(im.recordsRead)
          bytes.addAndGet(im.bytesRead)
        }
      })
    def settle(): Unit = {
      var last = -1L; var cur = recs.get()
      while (cur != last) { Thread.sleep(300); last = cur; cur = recs.get() }
    }
    def measured(tag: String)(body: => Long): (Long, Long, Long, Double) = {
      settle()
      val (r0, b0) = (recs.get(), bytes.get())
      val t0 = System.nanoTime()
      val out = body
      val wall = (System.nanoTime() - t0) / 1e9
      settle()
      val (dr, db) = (recs.get() - r0, bytes.get() - b0)
      println(f"[blockskip] n=$n $tag%-18s rowsRead=$dr%12d " +
        f"bytesRead=${db / 1048576.0}%9.1f MiB wall=$wall%7.2fs rows=$out")
      System.out.flush()
      (out, dr, db, wall)
    }

    val dir = s"/tmp/graft-scale/zdocs$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      sources.Generators.zipfText(spark, n, seed = 11L, partitions = 32)
        .select(col("id").as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(dir)
    }
    val corpus = spark.read.parquet(dir)
    val table = s"devms_$n"
    if (!spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
      Retrieval.bm25Build(corpus, "doc_id", "text", table, buckets = 32)
    val tableBm = s"devmsbm_$n"
    if (!spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(tableBm)))
      Retrieval.bm25Build(corpus, "doc_id", "text", tableBm, buckets = 32,
        blockMax = true)

    val dict = spark.table(s"${table}_terms")
      .groupBy("term").agg(sum("df").as("df"))
    val topHead = dict.orderBy(col("df").desc).limit(1)
      .as[(String, Long)].collect().head._1
    val natural = corpus.filter(col("doc_id") % (n / nqTarget) === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("qtext"))
      .localCheckpoint()
    val qdf = natural.select(col("qid"),
        explode(split(col("qtext"), " ")).as("term"))
      .join(dict, Seq("term"), "left").na.fill(0L, Seq("df"))
      .groupBy("qid").agg(min("df").as("mindf"))
    val mixed = natural.join(
        qdf.filter(col("mindf") <= n / 1000).select("qid"), "qid")
      .select(col("qid"), concat_ws(" ", col("qtext"), lit(topHead))
        .as("qtext"))
      .localCheckpoint()
    println(s"[blockskip] n=$n mixed nq=${mixed.count()}")

    def serve(t: String, candBcast: Long): org.apache.spark.sql.DataFrame =
      Retrieval.bm25QueryMaxScore(spark, t, mixed, "qid", "qtext", 5,
        gateMinHeadMass = 1L, gateCandFrac = 1.0,
        maxCandBroadcast = candBcast)

    // results identical across all three arms (cheap insurance that
    // the metric contrast compares equal work)
    val ref = serve(tableBm, Retrieval.DefaultMaxCandBroadcast)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(ref == serve(tableBm, 0L).as[(Long, Long, Long, Int)]
      .collect().toSet, "[blockskip] unpushed arm diverged — BUG")
    assert(ref == serve(table, Retrieval.DefaultMaxCandBroadcast)
      .as[(Long, Long, Long, Int)].collect().toSet,
      "[blockskip] plain arm diverged — BUG")

    // one warm pass each (file footers/page cache), then the measured
    // pass — rows-read is deterministic either way; the warm pass just
    // keeps the walls comparable too
    for ((tag, t, b) <- Seq(
        ("blockmax pushed", tableBm, Retrieval.DefaultMaxCandBroadcast),
        ("blockmax unpushed", tableBm, 0L),
        ("plain semi-join", table, Retrieval.DefaultMaxCandBroadcast))) {
      serve(t, b).count()
      measured(tag) { serve(t, b).count() }
    }
    spark.stop()
  }
}
