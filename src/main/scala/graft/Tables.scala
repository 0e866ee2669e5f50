package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries take an `sfDir` so the same plan runs at any scale factor;
  * nothing below hard-codes row counts. Reads are plain parquet scans so
  * Catalyst's filter/column pushdown applies (verify with
  * `.explain("formatted")` — `PushedFilters`/`ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  /** `events.ts` lands as a session-zone micro-precision TimestampType
    * whatever the file's physical type — the generator has shipped BOTH:
    *  - parquet TIMESTAMP(NANOS) (rounds ≤11), which the vectorized
    *    reader rejects: read nanos as long and convert. The division
    *    MUST be exact integer division (`div`): `/` promotes to double,
    *    and epoch nanos (~1.7e18) exceed double's 2^53 exact range, so
    *    the truncated quotient can be off by 1 µs near boundaries;
    *  - parquet TIMESTAMP(MICROS) without UTC adjustment (round 12+),
    *    which Spark 4 infers as TIMESTAMP_NTZ. The stored wall-clock is
    *    UTC, so the NTZ value is first CONVERTED to the session zone's
    *    wall-clock (`convert_timezone`) and only then re-tagged as the
    *    session-zone type — the resulting INSTANT is the stored UTC
    *    one under ANY session timezone. (A bare cast would re-interpret
    *    the UTC wall-clock in the session zone, silently shifting every
    *    event for non-UTC callers; in-repo entry points all run UTC,
    *    where both forms agree.)
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ =>
        val zone = spark.conf.get("spark.sql.session.timeZone")
        raw.withColumn("ts",
          convert_timezone(lit("UTC"), lit(zone), col("ts"))
            .cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
