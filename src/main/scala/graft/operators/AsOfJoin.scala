package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with the same
  * key and strictly earlier timestamp. Spark has no native operator
  * (the reference certainly doesn't); the scalable formulation is the
  * classic union trick, NOT a per-row probe:
  *
  *   1. tag right rows 0 and left rows 1, union on (key, ts, tag);
  *   2. one shuffle on key, sort within partitions by (ts, tag);
  *   3. running `last(right value, ignoreNulls)` window fills each left
  *      row with the most recent preceding right row;
  *   4. keep the left rows.
  *
  * Cost = one shuffle + one window pass over |L|+|R| — the same shape
  * as a sort-merge join, scalable to any key cardinality. Ties: a right
  * row at exactly the left row's timestamp is NOT matched (strict <) —
  * left rows (tag 0) sort before right rows (tag 1) at equal (key, ts),
  * so the left row's window (unbounded preceding → current) has not yet
  * seen that right row.
  *
  * `right` must be unique per (key, ts) for deterministic results —
  * pre-aggregate if needed.
  */
object AsOfJoin {

  def asOfStrict(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String,
                 valueCol: String): DataFrame = {
    require(!left.columns.exists(Set("prior_ts", "prior_val", "_tag", "_ts", "_rts", "_rv")),
      "left side must not already contain prior_ts/prior_val or _-prefixed working columns")
    val l = left.withColumn("_tag", lit(0))
      .withColumn("_rts", lit(null).cast(right.schema(rightTs).dataType))
      .withColumn("_rv", lit(null).cast(right.schema(valueCol).dataType))
      .withColumnRenamed(leftTs, "_ts")
    val r = right.select(col(key), col(rightTs).as("_ts"),
      col(rightTs).as("_rts"), col(valueCol).as("_rv"), lit(1).as("_tag"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // left (_tag 0) sorts before right (_tag 1) at equal ts → strict <
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("prior_ts", last(col("_rts"), ignoreNulls = true).over(w))
      .withColumn("prior_val", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 0)
      .drop("_tag", "_rts", "_rv")
      .withColumnRenamed("_ts", leftTs)
  }
}
