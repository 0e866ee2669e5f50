package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Skew mitigation — salted-join equivalence and hot-key detection. */
class SkewSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("saltedEquiJoin equals the plain join on skewed data") {
    // 90% of fact rows share key 0
    val fact = spark.range(0, 10000)
      .select(col("id"), when(col("id") % 10 === 0, col("id") % 7)
        .otherwise(lit(0L)).as("k"))
    val dim = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"),
      (4L, "four"), (5L, "five"), (6L, "six")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("id", "k", "name")
      .as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedEquiJoin(fact, dim, "k", salt = 8,
        discriminator = "id").select("id", "k", "name")
      .as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 10000)
  }

  test("hotKeys flags only keys above the threshold") {
    val df = spark.range(0, 1000)
      .select(when(col("id") < 400, lit("hot")).otherwise(col("id").cast("string")).as("k"))
    val hot = Skew.hotKeys(df, col("k"), 0.1).as[(String, Long)].collect().toSeq
    assert(hot == Seq(("hot", 400L)))
  }

  test("hotKeysSampled finds the hot key from a single sampled pass") {
    // 40% of 100k rows share one key; everything else is unique
    val df = spark.range(0, 100000)
      .select(when(col("id") % 5 < 2, lit("hot"))
        .otherwise(col("id").cast("string")).as("k"))
    val rep = Skew.hotKeysSampled(df, col("k"), threshold = 0.1,
      fraction = 0.02, seed = 7L).as[(String, Double)].collect().toSeq
    assert(rep.map(_._1) == Seq("hot"))
    // sampled share estimate lands near the true 0.4
    assert(math.abs(rep.head._2 - 0.4) < 0.1)
  }
}
