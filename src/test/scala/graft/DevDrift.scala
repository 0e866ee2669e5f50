package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Centroid-drift probe — measures the [[Similarity.ivfAppend]] drift
  * signal and the recall cost of FROZEN centroids under real
  * distribution drift, then shows [[Similarity.ivfRetrain]] restoring
  * it.
  *
  * Setup: the build corpus lives in dims 0..d/2-1; the drifted batch is
  * 40 tight clusters in dims d/2..d-1 plus tiny low-subspace noise.
  * Frozen-centroid assignment of the drifted vectors is NOISE-driven
  * (their signal subspace is orthogonal to every trained centroid), so
  * cluster neighbors scatter across unrelated lists and a fixed probe
  * budget stops finding them — the decay mode the signal exists to
  * catch. After retrain the centroids cover the drifted region and the
  * same probe budget recovers the neighbors.
  *
  * `sbt "Test/runMain graft.DevDrift [nCorpus]"` (default 200000).
  */
object DevDrift {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val dim = 64
    val half = dim / 2
    // build corpus: hash-uniform in the LOW subspace
    val corpus = spark.range(n).repartition(32).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        when(d < half,
          pmod(xxhash64(col("id"), d), lit(1000000L)).cast("double") / 500000.0 - 1.0)
          .otherwise(0.0)).as("embedding"))
    val table = "devdrift_idx"
    val (_, tBuild) = timed {
      Similarity.ivfBuild(corpus, "vec_id", "embedding", table, buckets = 32)
    }
    val buildMean = spark.table(s"${table}_stats").head().getDouble(1)

    // drifted batch: 40 tight clusters in the HIGH subspace + tiny
    // low-subspace noise (drift is never exactly orthogonal; the noise
    // is what makes frozen assignment scatter instead of tie-collapse)
    val nClusters = 40
    val perCluster = 100
    val batch = spark.range(nClusters.toLong * perCluster).repartition(32)
      .select((col("id") + n).as("vec_id"), (col("id") % nClusters).as("cl"),
        col("id").as("i"))
      .select(col("vec_id"), transform(sequence(lit(0), lit(dim - 1)), d =>
        when(d >= half,
          pmod(xxhash64(col("cl"), d), lit(1000000L)).cast("double") / 500000.0 - 1.0
            + pmod(xxhash64(col("i"), d, lit(7L)), lit(1000L)).cast("double") / 50000.0 - 0.01)
          .otherwise(
            pmod(xxhash64(col("i"), d, lit(13L)), lit(1000L)).cast("double") / 500000.0 - 0.001))
        .as("embedding"))
    val (stats, tAppend) = timed {
      Similarity.ivfAppend(spark, table, batch, "vec_id", "embedding")
    }

    // queries: fresh jitters of the cluster centers; ground truth =
    // exact cosine top-5 over the grown corpus (brute-force verifier)
    val queries = spark.range(50).select((col("id") + 10000000L).as("vec_id"),
        (col("id") % nClusters).as("cl"), col("id").as("i"))
      .select(col("vec_id"), transform(sequence(lit(0), lit(dim - 1)), d =>
        when(d >= half,
          pmod(xxhash64(col("cl"), d), lit(1000000L)).cast("double") / 500000.0 - 1.0
            + pmod(xxhash64(col("i"), d, lit(23L)), lit(1000L)).cast("double") / 50000.0 - 0.01)
          .otherwise(
            pmod(xxhash64(col("i"), d, lit(29L)), lit(1000L)).cast("double") / 500000.0 - 0.001))
        .as("embedding"))
    val all = corpus.unionByName(batch)
    val truth = Similarity.bruteForceTopK(all, queries, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }

    def recallAt5(probeFrac: Double): Double = {
      val got = Similarity.ivfQuery(spark, table, queries, "vec_id", "embedding",
          5, probeFrac = probeFrac)
        .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1)
        .map { case (q, xs) => q -> xs.map(_._2).toSet }
      truth.map { case (q, t) =>
        (t intersect got.getOrElse(q, Set.empty)).size.toDouble / t.size
      }.sum / truth.size
    }
    // where did frozen assignment put the drifted rows?
    val spread = spark.table(table).filter(col("nid") >= n)
      .groupBy("cid").count().agg(count(lit(1)), max("count"))
      .as[(Long, Long)].head()
    println(s"[drift-diag] drifted rows landed in ${spread._1} lists, " +
      s"largest holds ${spread._2}")

    val probeFrac = 0.125
    val (rBefore, tQBefore) = timed(recallAt5(probeFrac))
    val (_, tRetrain) = timed(Similarity.ivfRetrain(spark, table))
    val (rAfter, tQAfter) = timed(recallAt5(probeFrac))
    val newBuildMean = spark.table(s"${table}_stats").head().getDouble(1)

    println(f"[drift] n=$n build=${tBuild}%.1fs buildMean=${buildMean}%.4f " +
      f"append=${tAppend}%.1fs batchMean=${stats.batchMeanTop1Cos}%.4f " +
      f"drifted=${stats.drifted} " +
      f"recall@5(probeFrac=$probeFrac)=${rBefore}%.3f (${tQBefore}%.1fs) " +
      f"retrain=${tRetrain}%.1fs retrainedMean=${newBuildMean}%.4f " +
      f"recallAfter=${rAfter}%.3f (${tQAfter}%.1fs)")
    System.out.flush()
    spark.stop()
  }
}
