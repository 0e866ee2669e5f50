package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, Similarity}

/** Reshard cost at a real decade (round-17 ask #7): the O(shard) claim
  * for `splitShard` is argued from the plan shape and spec-proven at
  * toy scale — this measures ONE split of a 10⁷-doc positional BM25
  * shard and one of a 10⁷-vector IVF shard: wall-clock, total shuffle
  * bytes during the split, and a byte-level proof that a STANDING
  * NEIGHBOR shard's files never move (names+sizes+mtimes identical
  * before/after). Reuses the /tmp/graft-scale cached corpora.
  * `sbt "Test/runMain graft.DevReshardCost [bm25|ivf|both]"`.
  */
object DevReshardCost {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "both"
    val n = 10000000L
    val spark = SparkSession.builder()
      .master("local[32,4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def timed[T](body: => T): Double = {
      val t0 = System.nanoTime(); body
      (System.nanoTime() - t0) / 1e9
    }
    // shuffle accounting across the split's stages
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleWrite.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    def fileState(prefix: String): Set[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else Option(f.listFiles).map(_.toSeq.flatMap(walk)).getOrElse(Nil)
      Option(wh.listFiles).getOrElse(Array.empty)
        .filter(_.getName.startsWith(prefix)).toSeq.flatMap(walk)
        .map(f => (f.getPath, f.length, f.lastModified)).toSet
    }
    def gb(b: Long): Double = b.toDouble / (1L << 30)
    def drop(ts: String*): Unit = ts.foreach(t =>
      graft.operators.BucketedJoin.dropWithLocation(spark, t))

    // the standing NEIGHBOR shard whose bytes must never move: a small
    // real index (1e6 docs) — the claim is placement, not size
    val small = spark.read.parquet("/tmp/graft-scale/docs1000000")

    if (mode == "bm25" || mode == "both") {
      val corpus = spark.read.parquet(s"/tmp/graft-scale/zdocs$n")
      val (p, nb) = (s"rsc_bm_$n", "rsc_bm_nb")
      Retrieval.bm25Build(small, "doc_id", "text", nb, buckets = 32,
        positions = true)
      val tBuild = timed {
        Retrieval.bm25Build(corpus, "doc_id", "text", p, buckets = 32,
          positions = true)
      }
      println(f"[reshardcost] bm25 build(1e7, positions)=${tBuild}%.1fs " +
        f"index=${gb(fileState(p).toSeq.map(_._2).sum)}%.2fGB")
      System.out.flush()
      val before = fileState(nb)
      shuffleWrite.set(0L)
      val tSplit = timed {
        Retrieval.splitShard(spark, p, s"${p}_c0", s"${p}_c1", 0, 1)
      }
      val sw = shuffleWrite.get()
      val same = fileState(nb) == before
      println(f"[reshardcost] bm25 splitShard(1e7)=${tSplit}%.1fs " +
        f"shuffleWrite=${gb(sw)}%.2fGB neighborUntouched=$same " +
        f"children=${gb(fileState(s"${p}_c").toSeq.map(_._2).sum)}%.2fGB")
      System.out.flush()
      drop(s"${p}_c0", s"${p}_c0_terms", s"${p}_c0_stats", s"${p}_c0_pos",
        s"${p}_c1", s"${p}_c1_terms", s"${p}_c1_stats", s"${p}_c1_pos",
        nb, s"${nb}_terms", s"${nb}_stats", s"${nb}_pos")
    }

    if (mode == "ivf" || mode == "both") {
      val emb = spark.read.parquet(s"/tmp/graft-scale/sembA$n")
      val (p, nb) = (s"rsc_ivf_$n", "rsc_ivf_nb")
      // neighbor: a small IVF over the 1e6-doc ids as fake 8-dim vecs —
      // only its files' immobility matters
      Similarity.ivfBuild(
        small.limit(100000).select(col("doc_id").as("vec_id"),
          transform(sequence(lit(0), lit(7)), d =>
            pmod(xxhash64(col("doc_id"), d), lit(1000L)).cast("double") / 500.0 - 1.0)
            .as("embedding")),
        "vec_id", "embedding", nb, buckets = 32)
      val cols = emb.columns.toSeq
      val (idC, vecC) = (cols.head, cols(1))
      val tBuild = timed {
        Similarity.ivfBuild(emb, idC, vecC, p, buckets = 32)
      }
      println(f"[reshardcost] ivf build(1e7)=${tBuild}%.1fs " +
        f"index=${gb(fileState(p).toSeq.map(_._2).sum)}%.2fGB")
      System.out.flush()
      val before = fileState(nb)
      shuffleWrite.set(0L)
      val tSplit = timed {
        Similarity.splitShard(spark, p, s"${p}_c0", s"${p}_c1", 0, 1)
      }
      val sw = shuffleWrite.get()
      val same = fileState(nb) == before
      println(f"[reshardcost] ivf splitShard(1e7)=${tSplit}%.1fs " +
        f"shuffleWrite=${gb(sw)}%.2fGB neighborUntouched=$same " +
        f"children=${gb(fileState(s"${p}_c").toSeq.map(_._2).sum)}%.2fGB")
      System.out.flush()
      drop(s"${p}_c0", s"${p}_c0_cents", s"${p}_c0_stats",
        s"${p}_c1", s"${p}_c1_cents", s"${p}_c1_stats",
        nb, s"${nb}_cents", s"${nb}_stats")
    }
    spark.stop()
  }
}
