package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless point-in-interval range join. Spark's planner turns a pure
  * range predicate (no equi key) into a broadcast-nested-loop /
  * cartesian — O(|P|·|I|). The scalable formulation bins time:
  *
  *   1. each interval explodes into the `binWidth` buckets it covers
  *      (bounded by ceil(intervalLen/binWidth)+1 rows);
  *   2. each point maps to its single bucket;
  *   3. equi-join on the bucket, then refine with the exact predicate.
  *
  * Each (point, interval) match is produced exactly once (a point lives
  * in one bucket), so no dedup is needed. Cost: one shuffle on bucket
  * ids whose fan-out is interval-length-bounded — the standard
  * interval-join strategy at any scale. Pick `binWidth` ≈ the typical
  * interval length.
  */
object RangeJoin {

  /** points(ptTs …) × intervals(start, end, …) → matched rows with all
    * columns of both sides, for `start <= pt < end`.
    */
  def pointInInterval(points: DataFrame, ptTs: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidthSec: Long): DataFrame = {
    val binUs = binWidthSec * 1000000L
    val p = points.withColumn("_bin",
      floor(unix_micros(col(ptTs)) / binUs).cast("long"))
    // guard: sequence(a, b) DESCENDS when b < a, so an empty/inverted
    // interval would explode into bogus bins (the refine filter rejects
    // their matches, but the rows are wasted shuffle) — drop them first
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bin",
        explode(sequence(
          floor(unix_micros(col(startCol)) / binUs).cast("long"),
          floor((unix_micros(col(endCol)) - 1) / binUs).cast("long"))))
    p.join(i, "_bin")
      .filter(col(ptTs) >= col(startCol) && col(ptTs) < col(endCol))
      .drop("_bin")
  }
}
