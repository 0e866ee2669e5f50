package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** JDBC source/sink — reference `mapreduce/lib/db/DataDrivenDBInputFormat
  * .java:55` (value-range splits), `DBOutputFormat.java` (batched insert).
  */
class JdbcSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("integerSplitPoints: even division") {
    assert(Jdbc.integerSplitPoints(0, 99, 4) == Seq(0L, 25L, 50L, 75L, 100L))
  }

  test("integerSplitPoints: remainder spread over leading splits") {
    // span 10 over 3 splits → widths 4,3,3
    assert(Jdbc.integerSplitPoints(1, 10, 3) == Seq(1L, 5L, 8L, 11L))
  }

  test("integerSplitPoints: more splits than values degrades gracefully") {
    val b = Jdbc.integerSplitPoints(5, 6, 4)
    assert(b.head == 5L && b.last == 7L && b == b.sorted)
  }

  test("rangePredicates cover the range disjointly") {
    val p = Jdbc.rangePredicates("k", 0, 9, 3).toSeq
    assert(p == Seq("k >= 0 AND k < 4", "k >= 4 AND k < 7", "k >= 7 AND k < 10"))
  }

  test("derby round trip: write, partitioned read, count parity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby-spec")
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    val url = s"jdbc:derby:$dir/db;create=true"
    val df = spark.range(0, 1000).select(col("id").as("ID"),
      (col("id") % 7).cast("string").as("V"))
    Jdbc.write(df, url, "T_ROUND")
    val back = Jdbc.readPartitioned(spark, url, "T_ROUND", "ID", 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 1000)
    val sums = back.groupBy("V").count().orderBy("V")
      .as[(String, Long)].collect().toSeq
    assert(sums.map(_._2).sum == 1000)
    assert(sums.size == 7)
  }
}
