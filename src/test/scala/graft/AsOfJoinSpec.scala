package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.operators.AsOfJoin

/** As-of join — union+window formulation, strict-inequality tie rule. */
class AsOfJoinSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

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
