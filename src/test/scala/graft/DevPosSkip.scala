package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Positional PAGE-SKIP demonstration (round 21, VERDICT r20 ask #3):
  * the round-21 `_pos` layout sorts (term, doc_id) within buckets at
  * the fine 2048-row page geometry, and the fused candidate plane
  * pushes the materialized candidate ids into the positional scan
  * (per-value `doc_id IN` ≤ 256 ids; gap-merged range-OR above it when
  * the ranges cover ≤ half the corpus). Prove the skip with executor
  * INPUT METRICS (records/bytes actually read from files) — the
  * DevBlockSkip protocol applied to positions.
  *
  * Batch shape — the CLUSTERED-candidate case the range push exists
  * for (and a production-realistic one: querying a fresh append, the
  * RAG-over-recent-docs pattern). The zipf vocabulary's rarest terms
  * carry df ≈ 295 at 1e7 with UNIFORM doc ids (measured — no natural
  * per-value batch exists on this corpus), so the probe appends
  * `nq × 80` docs at the id tail, each carrying two batch-unique
  * marker terms plus the corpus's TOP head term; each query is
  * `(marker_a marker_b tophead)`. Candidates = the markers' postings =
  * one contiguous id run at the tail; the head term's ~1e7-doc
  * position list is exactly the mass the pushed range must SKIP and
  * the semi-join-only flow must READ.
  *
  * Arms (same table, same queries, results asserted identical):
  *  1/2. `phrase pushed` (defaults) vs `phrase unpushed`
  *       (`maxCandBroadcast = 0` forces the lazy semi-join flow —
  *       the pre-round-21 plan on the same files), so
  *       rows-read(2) / rows-read(1) IS the skip ratio;
  *  3/4. `near8 pushed/unpushed` — the same pair through the NEAR
  *       window-cover match.
  *
  * Idempotent: the append lands once (guarded by a marker-term df
  * probe); re-runs reuse it. `sbt "Test/runMain graft.DevPosSkip
  * [nDocs] [nq]"` — reuses /tmp/graft-scale corpus fixtures; builds
  * the positional index (round-21 layout) if absent.
  */
object DevPosSkip {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val nqTarget = if (args.length > 1) args(1).toInt else 25
    val docsPerQ = 80
    val spark = SparkSession.builder()
      .master("local[32,4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._

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
    def measured(tag: String)(body: => Long): Unit = {
      settle()
      val (r0, b0) = (recs.get(), bytes.get())
      val t0 = System.nanoTime()
      val out = body
      val wall = (System.nanoTime() - t0) / 1e9
      settle()
      val (dr, db) = (recs.get() - r0, bytes.get() - b0)
      println(f"[posskip] n=$n $tag%-18s rowsRead=$dr%12d " +
        f"bytesRead=${db / 1048576.0}%9.1f MiB wall=$wall%7.2fs rows=$out")
      System.out.flush()
    }

    val dir = s"/tmp/graft-scale/zdocs$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      sources.Generators.zipfText(spark, n, seed = 11L, partitions = 32)
        .select(col("id").as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(dir)
    }
    val corpus = spark.read.parquet(dir)
    val tablePos = s"devmspos_$n"
    if (!spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(tablePos)))
      Retrieval.bm25Build(corpus, "doc_id", "text", tablePos, buckets = 32,
        positions = true)

    val dict = spark.table(s"${tablePos}_terms")
      .groupBy("term").agg(sum("df").as("df"))
    val topHead = dict.orderBy(col("df").desc).limit(1)
      .as[(String, Long)].collect().head._1
    // the clustered fresh batch: ids [n, n + nq·docsPerQ), query i's
    // markers qposa{i}/qposb{i} on its own docsPerQ-doc contiguous run
    val appended = dict.filter(col("term") === "qposa0").count() > 0
    if (!appended) {
      val fresh = spark.range(nqTarget.toLong * docsPerQ)
        .select((col("id") + n).as("doc_id"),
          concat_ws(" ",
            concat(lit("qposa"), (col("id") / docsPerQ).cast("long")),
            concat(lit("qposb"), (col("id") / docsPerQ).cast("long")),
            lit(topHead),
            lit("pad1 pad2 pad3 pad4 pad5")).as("text"))
      Retrieval.bm25Append(spark, tablePos, fresh, "doc_id", "text")
      println(s"[posskip] appended ${nqTarget * docsPerQ} fresh docs " +
        s"at ids [$n, ${n + nqTarget * docsPerQ})")
    }
    val q = (0 until nqTarget).map { i =>
      (i.toLong, s"qposa$i qposb$i $topHead")
    }.toDF("qid", "qtext").localCheckpoint()
    println(s"[posskip] n=$n nq=$nqTarget head=$topHead " +
      s"(each query: 2 fresh-batch markers + head)")

    def phrase(candBcast: Long) =
      Retrieval.bm25PhraseQuery(spark, tablePos, q, "qid", "qtext", 5,
        maxCandBroadcast = candBcast)
    def near(candBcast: Long) =
      Retrieval.bm25ProximityQuery(spark, tablePos, q, "qid", "qtext", 5,
        window = 8, maxCandBroadcast = candBcast)

    if (args.contains("explain")) {
      val df = phrase(Retrieval.DefaultMaxCandBroadcast)
      df.count() // let AQE finalize
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("==== executed (final adaptive) ====")
      println(df.queryExecution.executedPlan.toString)
      spark.stop(); return
    }
    // results identical across arms (the push is cost-only)
    val refP = phrase(Retrieval.DefaultMaxCandBroadcast)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(refP == phrase(0L).as[(Long, Long, Long, Int)].collect().toSet,
      "[posskip] phrase unpushed arm diverged — BUG")
    assert(refP.nonEmpty, "[posskip] empty phrase results — bad fixture")
    val refN = near(Retrieval.DefaultMaxCandBroadcast)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(refN == near(0L).as[(Long, Long, Long, Int)].collect().toSet,
      "[posskip] near unpushed arm diverged — BUG")

    for ((tag, mk) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
        ("phrase pushed", () => phrase(Retrieval.DefaultMaxCandBroadcast)),
        ("phrase unpushed", () => phrase(0L)),
        ("near8 pushed", () => near(Retrieval.DefaultMaxCandBroadcast)),
        ("near8 unpushed", () => near(0L)))) {
      mk().count() // warm (file footers; rows-read is deterministic)
      measured(tag) { mk().count() }
    }
    spark.stop()
  }
}
