package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink with data-driven range splitting.
  *
  * Reference semantics: DBInputFormat emits one generated SQL query per
  * split (`core:mapreduce/lib/db/DBInputFormat.java:256-347`);
  * DataDrivenDBInputFormat instead splits the [min, max] value range of
  * a split-by column into contiguous `WHERE splitcol >= lo AND
  * splitcol < hi` ranges (`core:mapreduce/lib/db/
  * DataDrivenDBInputFormat.java:55`, IntegerSplitter et al.), which is
  * exactly Spark's `read.jdbc(partitionColumn, lowerBound, upperBound,
  * numPartitions)` contract. DBOutputFormat batches
  * `INSERT INTO t VALUES (?,...)` per task
  * (`core:mapreduce/lib/db/DBOutputFormat.java`) — `df.write.jdbc` with
  * `batchsize` is the same shape.
  *
  * Scale: the bounds discovery is ONE min/max aggregate pushed to the
  * database (the same query DataDrivenDBInputFormat.getSplits issues);
  * actual data movement is fully parallel across `numSplits` executors,
  * each streaming its range. Writes run one batched statement stream per
  * partition.
  */
object Jdbc {

  /** Boundary points splitting [lo, hi] (inclusive) into n near-equal
    * integer ranges — IntegerSplitter semantics: floor division with the
    * remainder spread over the leading splits. Returns n+1 ascending
    * boundaries; consumers interpret [b(i), b(i+1)) with the final range
    * closed on hi.
    */
  def integerSplitPoints(lo: Long, hi: Long, n: Int): Seq[Long] = {
    require(n > 0 && hi >= lo, s"bad split request [$lo, $hi] x $n")
    val span = hi - lo + 1
    val width = span / n
    val rem = span % n
    val bounds = Iterator.iterate((lo, 0)) { case (b, i) =>
      (b + width + (if (i < rem) 1 else 0), i + 1)
    }.map(_._1).take(n + 1).toSeq
    bounds.updated(n, hi + 1)
  }

  /** Predicate array form (`read.jdbc(url, table, predicates, ...)`) for
    * engines/tables where a numeric partition column is unavailable.
    */
  def rangePredicates(column: String, lo: Long, hi: Long, n: Int): Array[String] = {
    val b = integerSplitPoints(lo, hi, n)
    (0 until n).map { i =>
      s"$column >= ${b(i)} AND $column < ${b(i + 1)}"
    }.toArray
  }

  private def props(extra: Map[String, String]): java.util.Properties = {
    val p = new java.util.Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Full-table (unsplit) read — DBInputFormat with one split. */
  def read(spark: SparkSession, url: String, table: String,
           options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** Range-partitioned read: discovers [min, max] of `splitCol` with one
    * pushed-down aggregate, then reads `numSplits` parallel range scans
    * (DataDrivenDBInputFormat.getSplits behavior).
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      splitCol: String, numSplits: Int,
                      options: Map[String, String] = Map.empty): DataFrame = {
    val bounds = spark.read
      .jdbc(url, s"(SELECT MIN($splitCol) AS LO, MAX($splitCol) AS HI FROM $table) B",
        props(options))
      .collect()(0)
    if (bounds.isNullAt(0)) read(spark, url, table, options) // empty table
    else {
      // getAs[Number]: MIN/MAX of an INTEGER-typed column (e.g. Derby INT)
      // comes back as Integer; Row.getLong does not widen.
      val lo = bounds.getAs[Number](0).longValue
      val hi = bounds.getAs[Number](1).longValue
      spark.read.jdbc(url, table, splitCol, lo, hi,
        math.max(1, numSplits), props(options))
    }
  }

  /** Batched JDBC write (DBOutputFormat): one prepared-statement batch
    * stream per partition.
    */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Overwrite, batchSize: Int = 1000,
            options: Map[String, String] = Map.empty): Unit =
    df.write.mode(mode)
      .options(options)
      .option("batchsize", batchSize)
      .jdbc(url, table, props(options))
}
