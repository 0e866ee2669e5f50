package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Positional PAGE-SKIP demonstration (round 21, VERDICT r20 ask #3):
  * the round-21 `_pos` layout sorts (term, doc_id) within buckets at
  * the fine 2048-row page geometry, and [[Retrieval]]'s fused
  * candidate plane pushes the materialized candidate ids into the
  * positional scan ([[Retrieval.bm25PhraseQuery]] /
  * [[Retrieval.bm25ProximityQuery]] via posGatedProbe). Prove the skip
  * with executor INPUT METRICS (records/bytes actually read from
  * files), the DevBlockSkip protocol applied to positions.
  *
  * Batch shape: `nq` queries, each TWO ultra-rare terms (df ≤ ~10 —
  * the per-query candidate set is the rarest term's postings, so the
  * batch's candidate ids stay under the 256-value per-value push cap)
  * plus the corpus's TOP head term — the head term's full position
  * list is exactly the mass the push must SKIP and the semi-join-only
  * flow must READ.
  *
  * Arms (same table, same queries, results asserted identical):
  *  1. `phrase pushed`     — defaults: candidates collect once and
  *     push as a per-value `doc_id IN` into the (term, doc_id)-sorted
  *     positional scan;
  *  2. `phrase unpushed`   — `maxCandBroadcast = 0` forces the lazy
  *     flow (shuffle semi-join gate, nothing reaches the scan) — the
  *     pre-round-21 plan on the same files, so rows-read(2)/rows-read(1)
  *     IS the skip ratio;
  *  3/4. `near8 pushed/unpushed` — the same pair through the NEAR
  *     window-cover match.
  *
  * `sbt "Test/runMain graft.DevPosSkip [nDocs] [nq]"` — reuses
  * /tmp/graft-scale corpus fixtures; builds the positional index
  * (round-21 layout) if absent.
  */
object DevPosSkip {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val nqTarget = if (args.length > 1) args(1).toInt else 25
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
    // ultra-rare terms (df ≤ 10), deterministic order, two per query
    val rare = dict.filter(col("df") <= 10 && col("df") >= 1)
      .orderBy(col("df"), col("term")).limit(2 * nqTarget)
      .as[(String, Long)].collect().map(_._1)
    require(rare.length == 2 * nqTarget,
      s"[posskip] corpus has only ${rare.length} df<=10 terms — " +
        s"need ${2 * nqTarget}; lower nq")
    val q = (0 until nqTarget).map { i =>
      (i.toLong, s"${rare(2 * i)} ${rare(2 * i + 1)} $topHead")
    }.toDF("qid", "qtext").localCheckpoint()
    println(s"[posskip] n=$n nq=$nqTarget head=$topHead " +
      s"(each query: 2 df<=10 terms + head)")

    def phrase(candBcast: Long) =
      Retrieval.bm25PhraseQuery(spark, tablePos, q, "qid", "qtext", 5,
        maxCandBroadcast = candBcast)
    def near(candBcast: Long) =
      Retrieval.bm25ProximityQuery(spark, tablePos, q, "qid", "qtext", 5,
        window = 8, maxCandBroadcast = candBcast)

    // results identical across arms (the push is cost-only)
    val refP = phrase(Retrieval.DefaultMaxCandBroadcast)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(refP == phrase(0L).as[(Long, Long, Long, Int)].collect().toSet,
      "[posskip] phrase unpushed arm diverged — BUG")
    val refN = near(Retrieval.DefaultMaxCandBroadcast)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(refN == near(0L).as[(Long, Long, Long, Int)].collect().toSet,
      "[posskip] near unpushed arm diverged — BUG")

    for ((tag, mk) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
        ("phrase pushed", () => phrase(Retrieval.DefaultMaxCandBroadcast)),
        ("phrase unpushed", () => phrase(0L)),
        ("near8 pushed", () => near(Retrieval.DefaultMaxCandBroadcast)),
        ("near8 unpushed", () => near(0L)))) {
      mk().count() // warm (footers/page cache; rows-read is deterministic)
      measured(tag) { mk().count() }
    }
    spark.stop()
  }
}
