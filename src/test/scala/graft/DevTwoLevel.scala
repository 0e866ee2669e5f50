package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Extreme-nlist probe for the two-level coarse quantizer: build flat
  * and two-level IVF indexes on the SAME corpus at a forced large
  * nlist (default 3e4, dim 64 — the regime where the pre-round-6
  * single-row nested broadcast was the flagged ceiling), and compare
  * ivfQuery recall@5 vs brute force on both. Passes when the two-level
  * build COMPLETES (multi-row member broadcast, no 2 GB row) at recall
  * parity with flat.
  * `sbt "Test/runMain graft.DevTwoLevel [nlist] [nVecs]"`.
  */
object DevTwoLevel {
  def main(args: Array[String]): Unit = {
    val nlist = if (args.length > 0) args(0).toInt else 30000
    val n = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._

    val dim = 64
    val dir = s"/tmp/graft-scale/emb$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      val base = spark.range(n).repartition(32).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), d =>
          pmod(xxhash64(col("id"), d), lit(1000000L)).cast("double") / 500000.0 - 1.0
        ).as("embedding"))
      val planted = base.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + n).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x + when(i === 0, 0.05).otherwise(0.0)).as("embedding"))
      base.unionByName(planted).write.mode("overwrite").parquet(dir)
    }
    val emb = spark.read.parquet(dir)

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val q = emb.filter(col("vec_id") % math.max(1L, n / 100) === 0 && col("vec_id") < n)
    val nq = q.count()
    val (exact, tBrute) = timed {
      val e = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select("qid", "nid").cache()
      e.count(); e
    }
    for (two <- Seq(false, true)) {
      val kind = if (two) "2lvl" else "flat"
      val table = s"tlx_${kind}_$nlist"
      val (_, tBuild) = timed {
        Similarity.ivfBuild(emb, "vec_id", "embedding", table,
          nlist = nlist, twoLevel = two)
      }
      val (approx, tQuery) = timed {
        val a = Similarity.ivfQuery(spark, table, q, "vec_id", "embedding", 5)
          .select("qid", "nid").cache()
        a.count(); a
      }
      val hits = exact.join(approx, Seq("qid", "nid"))
        .groupBy("qid").agg(count(lit(1)).as("h"))
      val pass = hits.filter(col("h") >= 3).count()
      val minH = hits.agg(min("h")).head().getLong(0)
      approx.unpersist()
      println(f"[twolevel] n=$n nlist=$nlist $kind build=${tBuild}%.1fs " +
        f"brute=${tBrute}%.1fs query=${tQuery}%.1fs recall pass=$pass/$nq minHits=$minH")
      System.out.flush()
    }
    spark.stop()
  }
}
