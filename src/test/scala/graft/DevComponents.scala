package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Adversarial-graph probe for [[Dedup.connectedComponents]]: a single
  * n-node CHAIN (diameter n−1 — the worst case for diameter-bound
  * propagation, which would need n−1 rounds and previously threw past
  * maxIters) plus 10⁴ disjoint 5-node clusters (the realistic near-dup
  * shape, to keep the star phase honest about mixed graphs). Verifies
  * every chain node labels 0 and cluster labels stay within clusters.
  *
  * `sbt "Test/runMain graft.DevComponents [nChain]"` (default 1e6).
  */
object DevComponents {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val chain = spark.range(n - 1).select(col("id").as("a"),
      (col("id") + 1).as("b"))
    // clusters live far above the chain ids: node base + 0..4
    val clusters = spark.range(10000L * 4).select(
      (lit(10L) * n + floor(col("id") / 4).cast("long") * 8).as("a"),
      (lit(10L) * n + floor(col("id") / 4).cast("long") * 8
        + (col("id") % 4) + 1).as("b"))
    val pairs = chain.unionByName(clusters)

    val t0 = System.nanoTime()
    val labels = Dedup.connectedComponents(pairs, "a", "b", maxIters = 60)
    val chainOk = labels.filter(col("id") < n)
      .agg(count(lit(1)), sum(when(col("component") === 0L, 0L).otherwise(1L)))
      .as[(Long, Long)].head()
    val nClusterComps = labels.filter(col("id") >= n)
      .select("component").distinct().count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[components] chain=$n nodes=${chainOk._1} " +
      f"offChain=${chainOk._2} clusterComps=$nClusterComps " +
      f"(expect 10000) wall=${secs}%.1fs")
    System.out.flush()
    spark.stop()
  }
}
