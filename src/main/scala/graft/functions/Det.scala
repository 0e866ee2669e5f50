package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-reproducible decimal rounding.
  *
  * `round()` differs across engines for doubles (Spark routes through
  * BigDecimal's shortest decimal string with HALF_UP; DuckDB scales the
  * raw double), so oracle-compared columns use this instead:
  * `floor(x * 10^d + 0.5) / 10^d` — a fixed sequence of IEEE ops that
  * yields bit-identical doubles in any engine evaluating the same
  * formula (the DuckDB oracle SQL spells out the identical expression).
  */
object Det {
  def r(c: Column, digits: Int): Column = {
    val s = math.pow(10, digits)
    floor(c * s + 0.5) / s
  }
  def r2(c: Column): Column = r(c, 2)
  def r4(c: Column): Column = r(c, 4)
  def r6(c: Column): Column = r(c, 6)

  /** The matching SQL fragment for the oracle side. */
  def sql(expr: String, digits: Int): String = {
    val s = math.pow(10, digits).toLong
    s"floor(($expr) * $s + 0.5) / $s"
  }
}
