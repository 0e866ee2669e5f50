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

  /** Date-range predicates — DateSplitter semantics
    * (`core:mapreduce/lib/db/DateSplitter.java`): the [lo, hi] day range
    * splits into `n` contiguous `>= lo AND < hi` slices. Literals use
    * the JDBC `{d '...'}` escape, which every conforming driver (incl.
    * Derby, which rejects the ANSI `DATE '...'` form) rewrites natively.
    */
  def dateRangePredicates(column: String, lo: java.time.LocalDate,
                          hi: java.time.LocalDate, n: Int): Array[String] = {
    val b = integerSplitPoints(lo.toEpochDay, hi.toEpochDay, n)
    (0 until n).map { i =>
      val loLit = java.time.LocalDate.ofEpochDay(b(i))
      val hiLit = java.time.LocalDate.ofEpochDay(b(i + 1))
      s"$column >= {d '$loLit'} AND $column < {d '$hiLit'}"
    }.toArray
  }

  /** Timestamp-range predicates (DateSplitter's TIMESTAMP branch):
    * millisecond-linear slices rendered as JDBC `{ts '...'}` escape
    * literals, which every conforming driver (incl. Derby) rewrites to
    * its native form. Final slice closed at hi.
    */
  def timestampRangePredicates(column: String, lo: java.sql.Timestamp,
                               hi: java.sql.Timestamp, n: Int): Array[String] = {
    val b = integerSplitPoints(lo.getTime, hi.getTime, n)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    def ts(ms: Long) = s"{ts '${fmt.format(new java.util.Date(ms))}'}"
    (0 until n).map { i =>
      val cmp = if (i == n - 1) "<=" else "<"
      val hiMs = if (i == n - 1) hi.getTime else b(i + 1)
      s"$column >= ${ts(b(i))} AND $column $cmp ${ts(hiMs)}"
    }.toArray
  }

  /** Decimal-range predicates — BigDecimalSplitter semantics
    * (`core:mapreduce/lib/db/BigDecimalSplitter.java`): linear
    * interpolation of [lo, hi] into `n` slices; the final slice is
    * closed at hi so max-valued rows are not dropped.
    */
  def bigDecimalRangePredicates(column: String, lo: BigDecimal, hi: BigDecimal,
                                n: Int): Array[String] = {
    require(n > 0 && hi >= lo, s"bad split request [$lo, $hi] x $n")
    val step = (hi - lo) / n
    val bounds = (0 to n).map(i => if (i == n) hi else lo + step * i)
    (0 until n).map { i =>
      val cmp = if (i == n - 1) "<=" else "<"
      s"$column >= ${bounds(i)} AND $column $cmp ${bounds(i + 1)}"
    }.toArray
  }

  /** A string's position in [0, 1) from its first `k` UTF-16 code units
    * past the common prefix — the base-65536 place-value interpretation
    * TextSplitter uses (`core:mapreduce/lib/db/TextSplitter.java:
    * stringToBigDecimal`).
    */
  private def stringToFraction(s: String, k: Int = 8): BigDecimal = {
    var acc = BigDecimal(0)
    var place = BigDecimal(1)
    for (i <- 0 until math.min(k, s.length)) {
      place /= 65536
      acc += place * s.charAt(i).toInt
    }
    acc
  }

  /** Inverse of `stringToFraction` (TextSplitter.fractionToString). */
  private def fractionToString(f0: BigDecimal, k: Int = 8): String = {
    val sb = new StringBuilder
    var f = f0
    var i = 0
    while (i < k && f > 0) {
      f *= 65536
      val c = f.toInt
      // stay in printable/comparable range: Derby & friends compare
      // VARCHAR by code unit, but avoid emitting a bare surrogate
      val safe = math.min(c, 0xD7FF)
      if (safe > 0) sb.append(safe.toChar)
      f -= c
      i += 1
    }
    sb.toString
  }

  /** Text-range predicates — TextSplitter semantics
    * (`core:mapreduce/lib/db/TextSplitter.java`): keep the common
    * prefix, interpolate the remainders as base-65536 fractions, emit
    * boundary strings. First slice opens at lo, last closes at hi, so
    * rows sorting outside the generated midpoints (longer strings etc.)
    * are still covered.
    */
  def textRangePredicates(column: String, lo: String, hi: String,
                          n: Int): Array[String] = {
    require(n > 0 && lo <= hi, s"bad split request ['$lo', '$hi'] x $n")
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    if (n == 1 || lo == hi)
      return Array(s"$column >= ${lit(lo)} AND $column <= ${lit(hi)}")
    val cp = lo.zip(hi).takeWhile { case (a, b) => a == b }.length
    val prefix = lo.substring(0, cp)
    val fa = stringToFraction(lo.substring(cp))
    val fb = stringToFraction(hi.substring(cp))
    val step = (fb - fa) / n
    val mids = (1 until n).map(i => prefix + fractionToString(fa + step * i))
    val bounds = (lo +: mids) :+ hi
    (0 until n).map { i =>
      val cmp = if (i == n - 1) "<=" else "<"
      s"$column >= ${lit(bounds(i))} AND $column $cmp ${lit(bounds(i + 1))}"
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

  /** Typed range-partitioned read: discovers [min, max] of `splitCol`,
    * dispatches on its JDBC type (the DataDrivenDBInputFormat splitter
    * registry, `core:mapreduce/lib/db/DataDrivenDBInputFormat.java:
    * getSplitter` — Date/Text/BigDecimal/integer), and reads the
    * resulting predicate ranges in parallel.
    */
  def readPartitionedTyped(spark: SparkSession, url: String, table: String,
                           splitCol: String, numSplits: Int,
                           options: Map[String, String] = Map.empty): DataFrame = {
    val bounds = spark.read
      .jdbc(url, s"(SELECT MIN($splitCol) AS LO, MAX($splitCol) AS HI FROM $table) B",
        props(options))
      .collect()(0)
    if (bounds.isNullAt(0)) return read(spark, url, table, options) // empty table
    val preds = splitterPredicates(splitCol, bounds.get(0), bounds.get(1), numSplits)
    spark.read.jdbc(url, table, preds, props(options))
  }

  /** The splitter registry (DataDrivenDBInputFormat.getSplitter): maps
    * the discovered min/max values to typed range predicates. Unknown
    * types degrade to a documented single split (the reference throws;
    * degraded-but-correct is friendlier).
    */
  def splitterPredicates(splitCol: String, lo: Any, hi: Any,
                         numSplits: Int): Array[String] = lo match {
    case d: java.sql.Date =>
      dateRangePredicates(splitCol, d.toLocalDate,
        hi.asInstanceOf[java.sql.Date].toLocalDate, numSplits)
    case t: java.sql.Timestamp =>
      timestampRangePredicates(splitCol, t,
        hi.asInstanceOf[java.sql.Timestamp], numSplits)
    case s: String =>
      textRangePredicates(splitCol, s, hi.asInstanceOf[String], numSplits)
    case b: java.math.BigDecimal =>
      bigDecimalRangePredicates(splitCol, BigDecimal(b),
        BigDecimal(hi.asInstanceOf[java.math.BigDecimal]), numSplits)
    case n: Number =>
      rangePredicates(splitCol, n.longValue,
        hi.asInstanceOf[Number].longValue, numSplits)
    case _: java.lang.Boolean =>
      booleanPredicates(splitCol)
    case other =>
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"no typed splitter for ${other.getClass.getName} column " +
          s"$splitCol; falling back to a single split")
      Array("1 = 1")
  }

  /** Boolean splits (`core:mapreduce/lib/db/BooleanSplitter.java`): two
    * value arms, with the NULL stripe attached to one so every row is
    * read exactly once. (min/max pre-check means an all-NULL column
    * never reaches here — it takes the empty-table path.)
    */
  def booleanPredicates(column: String): Array[String] =
    Array(s"$column = TRUE",
          s"$column = FALSE OR $column IS NULL")

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
