package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quasi-Monte-Carlo π estimation (reference semantics:
  * hadoop-mapreduce-examples `QuasiMonteCarlo.java:71-170` — Halton
  * low-discrepancy points in the unit square, count inside/outside the
  * inscribed circle, π ≈ 4·inside/total).
  *
  * Halton radical-inverse is textbook math; points are a pure function of
  * the index, so `spark.range(n)` distributes the id space and the job is
  * a map + one partial-aggregated sum — no shuffle of point data.
  */
object MonteCarlo {

  /** Radical inverse of `i` in the given base — Halton coordinate. */
  def radicalInverse(i: Long, base: Int): Double = {
    var x = i
    var inv = 1.0 / base
    var f = inv
    var r = 0.0
    while (x > 0) {
      r += f * (x % base)
      x /= base
      f *= inv
    }
    r
  }

  def piEstimate(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val counts = spark.range(0L, n).mapPartitions { it =>
      var inside = 0L; var total = 0L
      it.foreach { i =>
        val x = radicalInverse(i, 2) - 0.5
        val y = radicalInverse(i, 3) - 0.5
        if (x * x + y * y <= 0.25) inside += 1
        total += 1
      }
      Iterator((inside, total))
    }.toDF("inside", "total")
      .agg(sum("inside").as("n_inside"), sum("total").as("n_total"))
    counts.select(col("n_inside"), col("n_total"),
      round(col("n_inside") * 4.0 / col("n_total"), 6).as("pi_est"))
  }
}
