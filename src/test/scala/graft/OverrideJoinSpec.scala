package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.OverrideJoin

/** Composite-join semantics — reference `mapreduce/lib/join/`:
  * `OverrideRecordReader.java:84-110` (rightmost-source priority, NO
  * cross-product on duplicate keys — the SURVEY §7 risk-register case).
  */
class OverrideJoinSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("override: rightmost source wins per key, dup keys do NOT cross-product") {
    val s1 = Seq((1, "s1a"), (1, "s1b"), (2, "s1c"), (4, "s1d")).toDF("k", "v")
    val s2 = Seq((1, "s2a"), (3, "s2b"), (3, "s2c")).toDF("k", "v")
    val r = OverrideJoin.overrideJoin(Seq(s1, s2), "k")
      .as[(Int, String)].collect().toSeq.sorted
    // key 1: only s2's single row (not 2 s1-rows × 1 s2-row)
    // key 3: both s2 rows; key 2,4: s1 rows (absent from s2)
    assert(r == Seq((1, "s2a"), (2, "s1c"), (3, "s2b"), (3, "s2c"), (4, "s1d")))
  }

  test("3-way override respects priority chain") {
    val s1 = Seq((1, "a1"), (2, "a2")).toDF("k", "v")
    val s2 = Seq((2, "b2"), (3, "b3")).toDF("k", "v")
    val s3 = Seq((3, "c3")).toDF("k", "v")
    val r = OverrideJoin.overrideJoin(Seq(s1, s2, s3), "k")
      .as[(Int, String)].collect().toSeq.sorted
    assert(r == Seq((1, "a1"), (2, "b2"), (3, "c3")))
  }

  test("inner join emits only keys in all sources") {
    val s1 = Seq((1, "a"), (2, "b")).toDF("k", "v1")
    val s2 = Seq((2, "x"), (3, "y")).toDF("k", "v2")
    val r = OverrideJoin.innerJoin(Seq(s1, s2), "k")
      .select("k").as[Int].collect().toSeq
    assert(r == Seq(2))
  }

  test("outer join keeps every key with null slots") {
    val s1 = Seq((1, "a")).toDF("k", "v1")
    val s2 = Seq((2, "x")).toDF("k", "v2")
    val r = OverrideJoin.outerJoin(Seq(s1, s2), "k")
      .as[(Int, Option[String], Option[String])].collect().toSeq.sortBy(_._1)
    assert(r == Seq((1, Some("a"), None), (2, None, Some("x"))))
  }
}
