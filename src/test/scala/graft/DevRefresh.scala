package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.RefreshLoop

/** End-to-end probe of the STREAMING refresh loop (the composition the
  * batch probes DevInc/DevIncIvf measure piecewise): MinHash-index an
  * N-doc corpus, then drive `RefreshLoop.minhashRefresh` with
  * `nEpochs` micro-batches of N/50 docs each — half resubmissions of
  * corpus docs, half novel — with compaction every 3rd epoch. The
  * number that matters: per-epoch wall time staying flat across
  * epochs while the index grows (check O(batch), absorb O(novel),
  * plus the visible compaction spike on its cadence).
  * `sbt "Test/runMain graft.DevRefresh [nDocs] [nEpochs]"`.
  */
object DevRefresh {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val nEpochs = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._

    val dir = s"/tmp/graft-scale/docs$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      graft.sources.Generators.randomText(spark, n, seed = 11L,
          wordsMin = 30, wordsMax = 80, partitions = 32)
        .select(col("id").as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(dir)
    }
    val corpus = spark.read.parquet(dir).select("doc_id", "text")
      .filter(col("doc_id") < n) // DevScale corpora carry planted extras

    val table = s"devrefresh_$n"
    val t0 = System.nanoTime()
    Dedup.minhashIndexBuild(corpus, "text", "doc_id", table, buckets = 32)
    println(f"[refresh] n=$n build=${(System.nanoTime() - t0) / 1e9}%.1fs")
    System.out.flush()

    val batchSize = n / 50
    val resub = corpus.filter(col("doc_id") % 100 === 0)
      .limit((batchSize / 2).toInt)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    @volatile var lastDups = 0L
    @volatile var lastNovel = 0L
    val q = RefreshLoop.minhashRefresh(
        ms.toDF().toDF("doc_id", "text"), table,
        "text", "doc_id", compactEvery = 3) { (dups, novel, _) =>
      lastDups = dups.select("batch_id").distinct().count()
      lastNovel = novel.count()
    }.start()

    try {
      for (e <- 1 to nEpochs) {
        // novel half: REVERSED generator docs over per-epoch disjoint id
        // slices. Reversal makes the 3-shingle set disjoint from every
        // forward corpus doc (randomText's doc universe is keyed by
        // mix(seed ^ i), so a different seed only PERMUTES the same
        // docs — seed alone does not give novel text); disjoint slices
        // keep epochs from colliding with each other's absorbed docs.
        val half = (batchSize / 2).toInt
        val novelDocs = graft.sources.Generators.randomText(spark,
            half.toLong * (e + 1), seed = 777L, wordsMin = 30, wordsMax = 80,
            partitions = 8)
          .filter(col("id") >= half.toLong * e)
          .select((col("id") + n * 10).as("doc_id"),
            array_join(reverse(split(col("text"), " ")), " ").as("text"))
          .as[(Long, String)].collect()
        val resubEpoch = resub.map { case (id, t) => (id + n * (100 + e), t) }
        val te = System.nanoTime()
        ms.addData(resubEpoch.toSeq ++ novelDocs.toSeq)
        q.processAllAvailable()
        val sec = (System.nanoTime() - te) / 1e9
        val compacted = if (e % 3 == 0) " (compacted)" else ""
        println(f"[refresh] n=$n epoch=$e batch=${resubEpoch.length + novelDocs.length} " +
          f"dupDocs=$lastDups novel=$lastNovel ${sec}%.1fs$compacted")
        System.out.flush()
      }
    } finally q.stop()
    spark.stop()
  }
}
