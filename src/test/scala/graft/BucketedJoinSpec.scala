package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BucketedJoin

/** Bucketed co-located join — CompositeInputFormat's pre-partitioned
  * sorted-merge precondition as table bucketing.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("same-bucketed tables join without a shuffle; result matches plain join") {
    val a = spark.range(0, 10000).select(col("id").as("k"),
      (col("id") % 97).as("va"))
    val b = spark.range(0, 10000, 2).select(col("id").as("k"),
      (col("id") % 31).as("vb"))
    BucketedJoin.writeBucketed(a, "bj_left", "k", 8)
    BucketedJoin.writeBucketed(b, "bj_right", "k", 8)
    val joined = BucketedJoin.join(spark, "bj_left", "bj_right", "k")
    assert(!BucketedJoin.hasJoinShuffle(joined),
      "bucketed join must not re-shuffle")
    val got = joined.agg(count(lit(1)), sum(col("va") + col("vb")))
      .as[(Long, Long)].head()
    val expected = a.join(b, "k").agg(count(lit(1)), sum(col("va") + col("vb")))
      .as[(Long, Long)].head()
    assert(got == expected)
    assert(got._1 == 5000)
  }
}
