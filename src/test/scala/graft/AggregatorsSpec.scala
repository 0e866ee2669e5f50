package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Aggregators

/** Reference semantics: `mapreduce/lib/aggregate/UniqValueCount.java:35-108`
  * (insertion cap) and `ValueHistogram.java:55-163` (report = #distinct,
  * min/median/max/mean/stddev of per-value counts, upper median,
  * population stddev).
  */
class AggregatorsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("cappedDistinct exact when under cap, capped when over") {
    val df = (1 to 100).map(i => ("g", s"v${i % 10}")).toDF("g", "v")
    val exact = df.groupBy("g")
      .agg(Aggregators.cappedDistinct(Int.MaxValue)(col("v")).as("u"))
      .select("u").as[Long].head()
    assert(exact == 10L)
    val capped = df.groupBy("g")
      .agg(Aggregators.cappedDistinct(3)(col("v")).as("u"))
      .select("u").as[Long].head()
    assert(capped == 3L)
  }

  test("cappedDistinct ignores nulls") {
    val df = Seq(("g", "a"), ("g", null), ("g", "b")).toDF("g", "v")
    val u = df.groupBy("g")
      .agg(Aggregators.cappedDistinct(Int.MaxValue)(col("v")).as("u"))
      .select("u").as[Long].head()
    assert(u == 2L)
  }

  test("valueHistogram report matches hand computation (upper median, pop stddev)") {
    // counts per value: a→4, b→2, c→1  → sorted [1,2,4]
    val vals = Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c")
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = df.groupBy("g").agg(Aggregators.valueHistogram(col("v")).as("r"))
      .select("r.n_distinct", "r.min_cnt", "r.med_cnt", "r.max_cnt",
        "r.avg_cnt", "r.std_cnt")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    val (nd, mn, med, mx, avg, std) = r
    assert(nd == 3L && mn == 1L && mx == 4L)
    assert(med == 2L) // upper median of [1,2,4] = index 3/2=1 → 2
    assert(math.abs(avg - 7.0 / 3) < 1e-12)
    // pop stddev of [1,2,4]: mean 7/3, var = ((1-m)^2+(2-m)^2+(4-m)^2)/3
    val m = 7.0 / 3
    val v = (math.pow(1 - m, 2) + math.pow(2 - m, 2) + math.pow(4 - m, 2)) / 3
    assert(math.abs(std - math.sqrt(v)) < 1e-12)
  }

  test("valueHistogram across partitions merges correctly") {
    val df = spark.range(0, 1000, 1, 7)
      .select(lit("g").as("g"), (col("id") % 10).cast("string").as("v"))
    val r = df.groupBy("g").agg(Aggregators.valueHistogram(col("v")).as("r"))
      .select("r.n_distinct", "r.min_cnt", "r.max_cnt").as[(Long, Long, Long)].head()
    assert(r == ((10L, 100L, 100L)))
  }

  test("valueHistogramDetail returns the full sorted frequency table") {
    val df = Seq("b", "a", "b", "c", "b", "a").toDF("v")
      .select(lit("g").as("g"), col("v"))
    val r = df.groupBy("g")
      .agg(Aggregators.valueHistogramDetail(col("v")).as("d"))
      .select("d").as[Seq[(String, Long)]].head()
    assert(r == Seq(("a", 2L), ("b", 3L), ("c", 1L)))
  }
}
