package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuant, Similarity}

/** Measurement probe for the OPQ rotation (parametric Ge et al.
  * CVPR'13): recall@5 at TIGHT refine pools, plain IVFPQ vs OPQ IVFPQ,
  * on an ANISOTROPIC synthetic corpus — the geometry every real
  * embedding model produces (variance concentrated in a few principal
  * directions) and the one the hash-uniform testdata deliberately
  * lacks. Also reports build-wall delta (rotation estimate + the
  * rotated encode pass) so the cost side of the dial is pinned.
  *
  * Corpus: dim 64, signal in `sig` latent directions with geometric
  * variance decay mixed by a fixed orthonormal-ish integer-hash mixer,
  * plus low-amplitude noise on every coordinate. Deterministic.
  *
  * `sbt "Test/runMain graft.DevOpq [n] [sig] [m]"` — defaults 200000,
  * 8, 8. Writes nothing outside /tmp metastore tables.
  */
object DevOpq {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("rot")) {
      // optional dim list: `rot 64,256,768,1024,1536`
      rotMain(if (args.length > 1)
        args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(64, 256, 768, 1024))
      return
    }
    val n = if (args.length > 0) args(0).toInt else 200000
    val sig = if (args.length > 1) args(1).toInt else 8
    val m = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val dim = 64

    // anisotropic corpus, built columnar (no driver loop): latent
    // z_l ~ hash-uniform[-1,1] scaled by 8·(0.7^l), mixed into raw
    // coordinate j by a fixed pseudo-random +-1 mixer, noise 0.05
    def h(seed: Int, i: org.apache.spark.sql.Column, j: Int): org.apache.spark.sql.Column =
      (pmod(xxhash64(i, lit(j.toLong * 7919 + seed)), lit(1000L))
        .cast("double") / lit(500.0)) - lit(1.0)
    val mixerSign: (Int, Int) => Double = (l, j) =>
      if (((l * 2654435761L + j * 40503L) >>> 7) % 2 == 0) 1.0 else -1.0
    val vecs = spark.range(n.toLong).select(col("id").as("vec_id"),
      array((0 until dim).map { j =>
        val s = (0 until sig).map { l =>
          h(17, col("id"), l) * lit(8.0 * math.pow(0.7, l) * mixerSign(l, j))
        }.reduce(_ + _)
        s + h(23, col("id"), 1000 + j) * lit(0.05)
      }: _*).as("embedding")).persist()
    vecs.count()
    // max(1, …): n is a CLI arg — n < 100 must select every row, not
    // divide by zero inside a measurement tool
    val q = vecs.filter(col("vec_id") % math.max(1L, n / 100) === 0).persist()
    val nq = q.count()
    println(s"[opq] corpus n=$n dim=$dim sig=$sig m=$m queries=$nq")

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (plainT, opqT) = ("devopq_plain", "devopq_rot")
    val (_, tPlain) = timed(ProductQuant.ivfPqBuild(
      vecs, "vec_id", "embedding", plainT, m = m))
    val (_, tOpq) = timed(ProductQuant.ivfPqBuild(
      vecs, "vec_id", "embedding", opqT, m = m, opq = true))
    println(f"[opq] build plain=${tPlain}%.1fs opq=${tOpq}%.1fs " +
      f"(rotation tax ${(tOpq / tPlain - 1) * 100}%.0f%%)")

    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 5)
      .select("qid", "nid").persist()
    val nExact = exact.count()
    def recall(table: String, refineK: Int, probeFrac: Double)
        : (Double, Double) = {
      val (got, t) = timed {
        val a = ProductQuant.ivfPqQuery(spark, table, q, "vec_id",
          "embedding", 5, probeFrac = probeFrac, refineK = refineK)
          .select("qid", "nid").persist()
        a.count(); a
      }
      val r = exact.join(got, Seq("qid", "nid")).count().toDouble / nExact
      got.unpersist()
      (r, t)
    }
    for (rk <- Seq(5, 10, 20, 50, 200); pf <- Seq(0.5)) {
      val (rp, tp) = recall(plainT, rk, pf)
      val (ro, to) = recall(opqT, rk, pf)
      println(f"[opq] refineK=$rk%3d probe=$pf plain=${rp}%.3f " +
        f"(${tp}%.1fs) opq=${ro}%.3f (${to}%.1fs) " +
        f"delta=+${(ro - rp) * 100}%.1fpp")
    }
    spark.stop()
  }

  /** `rot` mode: pins the rotation-ESTIMATE cost claim across the
    * dimension range real embedding models use — the scaladoc's
    * "sub-second at d ≤ 256, seconds at 768, guarded at 1024" must be
    * measured, not asserted. 20k rows each (the covariance sample cap
    * binds anyway above d = 209 at the default 1<<22 element budget).
    */
  private def rotMain(dims: Seq[Int]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (d <- dims) {
      val vecs = spark.range(20000).select(col("id").as("vec_id"),
        org.apache.spark.sql.functions.array((0 until d).map(j =>
          (pmod(xxhash64(col("id"), lit(j.toLong)), lit(1000L))
            .cast("double") / lit(500.0)) - lit(1.0)): _*).as("embedding"))
        .persist()
      vecs.count()
      val t0 = System.nanoTime()
      val rot = graft.operators.ProductQuant.opqRotation(
        vecs, "vec_id", "embedding", m = 8)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[rot] d=$d%4d wall=${wall}%.2fs cells=${rot.length}")
      vecs.unpersist()
    }
    spark.stop()
  }
}
