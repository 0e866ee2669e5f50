package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Counters report — reference `core:mapreduce/TaskCounter.java:28-47`
  * mapped to Spark task metrics via SparkListener.
  */
class CountersSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("e2e: input/shuffle counters reflect a grouped job; user counter via safeMap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-counters")
    spark.range(0, 5000).select(col("id"), (col("id") % 13).as("k"))
      .write.mode("overwrite").parquet(s"$dir/in")

    val ((rows, nBad), report) = Counters.withReport(spark) {
      val df = spark.read.parquet(s"$dir/in")
      val lines = df.select(
        when(col("id") % 100 === 0, lit("x"))
          .otherwise(col("id").cast("string")).as("v")).as[String]
      val (ok, acc) = operators.Pipe.safeMapCounted(lines, "bad")(_.toLong)
      val n = ok.groupBy(expr("value % 13")).count().count()
      (n, acc.value: Long)
    }
    assert(rows == 13)
    assert(nBad == 50) // ids 0,100,...,4900 poisoned
    val m = report.as[(String, Long)].collect().toMap
    assert(m("MAP_INPUT_RECORDS") == 5000)   // parquet scan rows
    assert(m("MAP_OUTPUT_RECORDS") > 0)      // shuffle write happened
    assert(m("REDUCE_INPUT_RECORDS") > 0)    // shuffle read happened
    assert(m("TASKS") > 0)
  }
}
