package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.math.{BigDecimal => JBig, MathContext, RoundingMode}

/** Distributed arbitrary-precision summation (reference `ex:pi/DistSum
  * .java`: partition a summation's index space across map tasks, sum the
  * partials — the machinery behind the reference's π programs). Kernel
  * here: π via Machin's formula (public mathematics)
  *
  *   π/4 = 4·arctan(1/5) − arctan(1/239),
  *   arctan(1/x) = Σ_k (−1)^k / ((2k+1)·x^(2k+1))
  *
  * computed in BigDecimal. Each task owns a contiguous k-range of both
  * series and returns ONE partial sum; the driver adds a handful of
  * partials — summation is exact at any split, so the distribution is
  * coordination-free and deterministic.
  */
object DistSum {

  /** Partial sum of arctan(1/x)'s series for k in [lo, hi). */
  private def arctanPartial(x: Long, lo: Long, hi: Long,
                            mc: MathContext): JBig = {
    val xsq = JBig.valueOf(x).multiply(JBig.valueOf(x))
    var term = JBig.ONE.divide(
      JBig.valueOf(x).pow((2 * lo + 1).toInt, mc), mc)
    var sum = JBig.ZERO
    var k = lo
    while (k < hi) {
      val contrib = term.divide(JBig.valueOf(2 * k + 1), mc)
      sum = if (k % 2 == 0) sum.add(contrib, mc) else sum.subtract(contrib, mc)
      term = term.divide(xsq, mc)
      k += 1
    }
    sum
  }

  /** π to `digits` decimal places, index space split over `splits`
    * tasks. Returns one row: (digits, pi_prefix) where pi_prefix is
    * "3." + the first `digits` decimals (guard digits keep the prefix
    * exact).
    */
  def pi(spark: SparkSession, digits: Int, splits: Int = 16): DataFrame = {
    import spark.implicits._
    val mc = new MathContext(digits + 20, RoundingMode.HALF_EVEN)
    // series terms needed: x^(2k+1) > 10^(digits+guard)
    def termsFor(x: Long): Long =
      ((digits + 15) / (2 * math.log10(x.toDouble))).toLong + 2
    val jobs = for {
      (x, coef) <- Seq((5L, 16L), (239L, -4L))
      n = termsFor(x)
      s <- 0 until splits
      lo = n * s / splits
      hi = n * (s + 1) / splits
      if hi > lo
    } yield (x, coef, lo, hi)
    val partials = spark.sparkContext
      .parallelize(jobs, math.min(jobs.size, 64))
      .map { case (x, coef, lo, hi) =>
        JBig.valueOf(coef).multiply(arctanPartial(x, lo, hi, mc), mc).toString
      }
      .collect()
    val piVal = partials.map(new JBig(_)).foldLeft(JBig.ZERO)(_.add(_, mc))
    val text = piVal.round(new MathContext(digits + 1, RoundingMode.DOWN))
      .toPlainString.take(digits + 2) // "3." + digits decimals
    Seq((digits, text)).toDF("digits", "pi_prefix")
  }
}
