package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import java.sql.Timestamp
import graft.operators.AsOfJoin

/** As-of join (union+window, strict-inequality ties) and binned range
  * join (bucket equi-join + refine, exactly-once matches).
  */
class AsOfJoinSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("range join: matches equal plain theta join, each pair exactly once") {
    val points = (0 until 500).map(i =>
      (i.toLong, ts(f"2026-01-01 ${i / 60 % 24}%02d:${i % 60}%02d:00")))
      .toDF("pid", "t")
    val ivals = Seq(
      (1L, ts("2026-01-01 00:30:00"), ts("2026-01-01 02:00:00")),
      (2L, ts("2026-01-01 01:00:00"), ts("2026-01-01 01:10:00")), // overlapping
      (3L, ts("2026-01-01 07:59:00"), ts("2026-01-01 08:20:00")))
      .toDF("wid", "ws", "we")
    val got = graft.operators.RangeJoin
      .pointInInterval(points, "t", ivals, "ws", "we", binWidthSec = 1800)
      .select("pid", "wid").as[(Long, Long)].collect().sorted.toSeq
    val expected = points.as("p").join(ivals.as("i"),
        col("t") >= col("ws") && col("t") < col("we"))
      .select("pid", "wid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.size == got.distinct.size)
  }

  test("latest strictly-earlier right row per key; equal ts excluded; no match → null") {
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00")),  // no earlier right row
      (1L, ts("2026-01-01 10:30:00")),  // matches 10:10
      (1L, ts("2026-01-01 11:00:00")),  // equal-ts right row NOT matched → 10:40
      (2L, ts("2026-01-01 09:00:00")))  // other key, no right rows
      .toDF("k", "t")
    val right = Seq(
      (1L, ts("2026-01-01 10:10:00"), 1.0),
      (1L, ts("2026-01-01 10:40:00"), 2.0),
      (1L, ts("2026-01-01 11:00:00"), 3.0))
      .toDF("k", "rt", "v")
    val got = AsOfJoin.asOfStrict(left, right, "k", "t", "rt", "v")
      .select("k", "t", "prior_val")
      .as[(Long, Timestamp, Option[Double])].collect().toSet
    assert(got == Set(
      (1L, ts("2026-01-01 10:00:00"), None),
      (1L, ts("2026-01-01 10:30:00"), Some(1.0)),
      (1L, ts("2026-01-01 11:00:00"), Some(2.0)),
      (2L, ts("2026-01-01 09:00:00"), None)))
  }
}
