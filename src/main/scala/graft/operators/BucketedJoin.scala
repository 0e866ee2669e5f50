package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located join — the faithful Spark analog of the
  * reference's map-side merge join precondition
  * (`core:mapreduce/lib/join/CompositeInputFormat.java:120-130`: k
  * datasets identically partitioned AND sorted, split i joined against
  * split i with no shuffle at join time).
  *
  * `bucketBy(n, key).sortBy(key)` persists exactly that invariant in the
  * table layout; a subsequent equi-join of two tables bucketed the same
  * way runs as a sort-merge join with NO Exchange on either side — the
  * shuffle was paid once at write time, like the reference's
  * pre-partitioned inputs. At 100 TB this is the pattern for repeated
  * fact⋈fact joins: bucket both tables on the join key once, join many
  * times shuffle-free.
  */
object BucketedJoin {

  /** Persist `df` as a bucketed, per-bucket-sorted table. Drops any
    * prior table AND its warehouse directory first: the default
    * in-memory catalog forgets tables across JVMs while their files
    * survive, and saveAsTable refuses a fresh managed table over an
    * existing location.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/${table.toLowerCase}")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. The returned
    * plan contains no shuffle for the join itself (verify with
    * `hasJoinShuffle`).
    */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
           key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True if the executed plan still contains an Exchange feeding the
    * join — the assertion hook for the no-shuffle invariant.
    */
  def hasJoinShuffle(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("Exchange hashpartitioning")
  }
}
