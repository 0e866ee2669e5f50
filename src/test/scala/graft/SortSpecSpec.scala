package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SortSpec
import graft.operators.SortSpec.Key

/** GNU-sort key specs (`-k2,2nr` style) — reference
  * `mapreduce/lib/partition/KeyFieldBasedComparator.java:36-60`.
  */
class SortSpecSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("parse flags and ranges") {
    assert(SortSpec.parse("-k2,2nr -k1,1") ==
      Seq(Key(2, 2, numeric = true, reverse = true),
          Key(1, 1, numeric = false, reverse = false)))
    assert(SortSpec.parse("-k3") == Seq(Key(3, 3, numeric = false, reverse = false)))
    assertThrows[IllegalArgumentException](SortSpec.parse("k2"))
  }

  test("numeric descending then lexicographic ascending") {
    val df = Seq("b\t2", "a\t10", "c\t2", "a\t1").toDF("line")
    val sorted = df.orderBy(SortSpec.sortCols(col("line"), "\t", "-k2,2nr -k1,1"): _*)
      .as[String].collect().toSeq
    assert(sorted == Seq("a\t10", "b\t2", "c\t2", "a\t1"))
  }

  test("partitionCols co-locate rows sharing the key fields") {
    val df = (1 to 100).map(i => s"k${i % 5}\t$i").toDF("line")
    val parted = df.repartition(4,
      SortSpec.partitionCols(col("line"), "\t", "-k1,1"): _*)
    import org.apache.spark.sql.functions.spark_partition_id
    val keyParts = parted
      .select(split(col("line"), "\t").getItem(0).as("k"), spark_partition_id().as("p"))
      .distinct().collect().map(r => (r.getString(0), r.getInt(1)))
    // every key maps to exactly one partition
    assert(keyParts.groupBy(_._1).values.forall(_.map(_._2).distinct.length == 1))
  }

  test("char offsets parse: -k f.c,f.c and mixed forms") {
    assert(SortSpec.parse("-k2.6,2.7") ==
      Seq(Key(2, 2, numeric = false, reverse = false, fromChar = 6, toChar = 7)))
    assert(SortSpec.parse("-k1.3nr") ==
      Seq(Key(1, 1, numeric = true, reverse = true, fromChar = 3, toChar = 0)))
    assert(SortSpec.parse("-k1.2,3.4n") ==
      Seq(Key(1, 3, numeric = true, reverse = false, fromChar = 2, toChar = 4)))
    // charless specs keep whole-field defaults
    assert(SortSpec.parse("-k2,2nr") ==
      Seq(Key(2, 2, numeric = true, reverse = true)))
  }

  test("char-offset keys order by the sub-field slice") {
    // field 2 is yyyy-MM-dd; -k2.6,2.7 sorts by MONTH — a different
    // order than the whole field (year-first)
    val df = Seq("a\t2001-12-01", "b\t2003-01-15", "c\t2002-06-30").toDF("line")
    val byMonth = df.orderBy(SortSpec.sortCols(col("line"), "\t", "-k2.6,2.7"): _*)
      .as[String].collect().toSeq
    assert(byMonth == Seq("b\t2003-01-15", "c\t2002-06-30", "a\t2001-12-01"))
    val byWhole = df.orderBy(SortSpec.sortCols(col("line"), "\t", "-k2,2"): _*)
      .as[String].collect().toSeq
    assert(byWhole == Seq("a\t2001-12-01", "c\t2002-06-30", "b\t2003-01-15"))
    // from-char to end-of-field: -k2.9 → day+1 digit... -k2.9,2 → "01","15","30"
    val byDay = df.orderBy(SortSpec.sortCols(col("line"), "\t", "-k2.9,2"): _*)
      .as[String].collect().toSeq
    assert(byDay == Seq("a\t2001-12-01", "b\t2003-01-15", "c\t2002-06-30"))
  }

  test("char-offset numeric key: digits sliced then compared numerically") {
    // field 2 from char 2: "10", "9", "2" — numeric asc (2 < 9 < 10)
    // differs from string asc ("10" < "2" < "9")
    val df = Seq(("b", "x10"), ("a", "x9"), ("c", "x2"))
      .map { case (a, b) => s"$a\t$b" }.toDF("line")
    val numeric = df.orderBy(SortSpec.sortCols(col("line"), "\t", "-k2.2,2.3n"): _*)
      .as[String].collect().toSeq
    assert(numeric == Seq("c\tx2", "a\tx9", "b\tx10"))
    val string = df.orderBy(SortSpec.sortCols(col("line"), "\t", "-k2.2,2.3"): _*)
      .as[String].collect().toSeq
    assert(string == Seq("b\tx10", "c\tx2", "a\tx9"))
  }

  test("ragged and non-numeric fields sort as null, not ANSI errors") {
    // "x" has no field 2; "y\tabc" has a non-numeric field 2. GNU sort
    // treats both as empty/0 — here they sort as null (desc → last).
    val df = Seq("b\t2", "x", "y\tabc", "a\t10").toDF("line")
    val sorted = df.orderBy(SortSpec.sortCols(col("line"), "\t", "-k2,2nr -k1,1"): _*)
      .as[String].collect().toSeq
    assert(sorted == Seq("a\t10", "b\t2", "x", "y\tabc"))
  }
}
