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

  test("ragged and non-numeric fields sort as null, not ANSI errors") {
    // "x" has no field 2; "y\tabc" has a non-numeric field 2. GNU sort
    // treats both as empty/0 — here they sort as null (desc → last).
    val df = Seq("b\t2", "x", "y\tabc", "a\t10").toDF("line")
    val sorted = df.orderBy(SortSpec.sortCols(col("line"), "\t", "-k2,2nr -k1,1"): _*)
      .as[String].collect().toSeq
    assert(sorted == Seq("a\t10", "b\t2", "x", "y\tabc"))
  }
}
