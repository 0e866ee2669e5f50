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

  test("dateRangePredicates: contiguous day slices covering [lo, hi]") {
    val lo = java.time.LocalDate.parse("2020-01-01")
    val hi = java.time.LocalDate.parse("2020-12-31")
    val p = Jdbc.dateRangePredicates("D", lo, hi, 4)
    assert(p.length == 4)
    assert(p.head.startsWith("D >= {d '2020-01-01'}"))
    assert(p.last.contains("< {d '2021-01-01'}")) // hi+1: hi itself covered
    // contiguity: each slice's upper bound is the next slice's lower
    val bounds = p.toSeq.map(s => "\\{d '([0-9-]+)'\\}".r.findAllMatchIn(s)
      .map(_.group(1)).toSeq)
    bounds.sliding(2).foreach {
      case Seq(a, b) => assert(a(1) == b(0))
      case _ =>
    }
  }

  test("bigDecimal and text splitters: ordered, covering, non-degenerate") {
    val bd = Jdbc.bigDecimalRangePredicates("X", BigDecimal(0), BigDecimal(10), 4)
    assert(bd.length == 4 && bd.head.startsWith("X >= 0") && bd.last.endsWith("<= 10"))
    val tx = Jdbc.textRangePredicates("S", "apple", "applz", 3)
    assert(tx.length == 3)
    assert(tx.head.contains(">= 'apple'") && tx.last.contains("<= 'applz'"))
    // escaping
    val esc = Jdbc.textRangePredicates("S", "o'lo", "o'zz", 1)
    assert(esc.head.contains("'o''lo'"))
  }

  test("typed read: DATE column splits into multiple non-empty partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby-date")
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    val url = s"jdbc:derby:$dir/db;create=true"
    val df = spark.range(0, 365).select(col("id").as("ID"),
      date_add(lit(java.sql.Date.valueOf("2021-01-01")),
        col("id").cast("int")).as("D"))
    Jdbc.write(df, url, "T_DATES")
    val back = Jdbc.readPartitionedTyped(spark, url, "T_DATES", "D", 5)
    assert(back.rdd.getNumPartitions == 5)
    assert(back.count() == 365)
    val perPart = back.groupBy(spark_partition_id()).count()
      .as[(Int, Long)].collect().toMap
    assert(perPart.size == 5 && perPart.values.forall(_ > 0))
    // no row lost or duplicated at slice boundaries
    assert(back.select(count_distinct(col("ID"))).as[Long].head() == 365)
  }

  test("booleanPredicates: TRUE / FALSE-or-NULL arms partition all rows") {
    val p = Jdbc.booleanPredicates("B")
    assert(p.toSeq == Seq("B = TRUE", "B = FALSE OR B IS NULL"))
    val dir = java.nio.file.Files.createTempDirectory("graft-derby-bool")
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    val url = s"jdbc:derby:$dir/db;create=true"
    val df = spark.range(0, 90).select(col("id").as("ID"),
      when(col("id") % 3 === 0, lit(true))
        .when(col("id") % 3 === 1, lit(false)).as("B"))
    Jdbc.write(df, url, "T_BOOL")
    val back = Jdbc.readPartitionedTyped(spark, url, "T_BOOL", "B", 2)
    assert(back.rdd.getNumPartitions == 2)
    assert(back.count() == 90) // 30 true + 30 false + 30 null, each read once
    assert(back.filter(col("B").isNull).count() == 30)
  }

  test("splitter registry: typed dispatch + unknown-type single-split fallback") {
    // integer arm via the registry entry point
    assert(Jdbc.splitterPredicates("K", Integer.valueOf(0),
      Integer.valueOf(9), 3).length == 3)
    // boolean arm
    assert(Jdbc.splitterPredicates("B", java.lang.Boolean.FALSE,
      java.lang.Boolean.TRUE, 8).toSeq ==
      Seq("B = TRUE", "B = FALSE OR B IS NULL"))
    // binary min/max has no splitter → documented whole-table fallback
    assert(Jdbc.splitterPredicates("BB", Array[Byte](1), Array[Byte](9), 4)
      .toSeq == Seq("1 = 1"))
  }
}
