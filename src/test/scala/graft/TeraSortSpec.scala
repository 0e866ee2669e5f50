package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TeraSort

/** TeraValidate-style computed validation (reference
  * `examples/terasort/TeraValidate.java:40-120`): order within and across
  * partitions + content checksum, asserted in-process.
  */
class TeraSortSpec extends AnyFunSuite {
  import SharedSpark.spark

  test("teragen is deterministic and shaped 10+90 bytes") {
    import spark.implicits._
    val a = TeraSort.teragen(spark, 100, seed = 7L)
      .as[(Array[Byte], Array[Byte])].collect()
    val b = TeraSort.teragen(spark, 100, seed = 7L)
      .as[(Array[Byte], Array[Byte])].collect()
    assert(a.length == 100)
    assert(a.forall { case (k, v) => k.length == 10 && v.length == 90 })
    assert(a.map(_._1.toSeq).toSeq == b.map(_._1.toSeq).toSeq)
    // different seed → different keys
    val c = TeraSort.teragen(spark, 100, seed = 8L)
      .as[(Array[Byte], Array[Byte])].collect()
    assert(a.map(_._1.toSeq).toSeq != c.map(_._1.toSeq).toSeq)
  }

  test("terasort + teravalidate: ordered within and across partitions, checksum preserved") {
    val gen = TeraSort.teragen(spark, 5000)
    val sorted = TeraSort.terasort(gen)
    val r = TeraSort.teravalidate(sorted)
    assert(r.rows == 5000L)
    assert(r.sortedWithin && r.sortedAcross)
    // checksum is content-only: equals the checksum of the unsorted input
    val r0 = TeraSort.teravalidate(TeraSort.teragen(spark, 5000).repartition(5))
    assert(r.checksum == r0.checksum)
  }

  test("teravalidate detects disorder") {
    val gen = TeraSort.teragen(spark, 2000).repartition(4) // hash-shuffled, unsorted
    val r = TeraSort.teravalidate(gen)
    assert(!(r.sortedWithin && r.sortedAcross))
  }

  test("kernel: write-then-validate from files, input/output checksum equal") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-terasort").toString
    val row = TeraSort.kernel(spark, 3000, s"$dir/out").as[
      (Long, Boolean, Boolean, String, Boolean)].head()
    assert(row == ((3000L, true, true, row._4, true)))
    // file-based validation agrees with the pipeline validator
    val direct = TeraSort.teravalidate(
      TeraSort.terasort(TeraSort.teragen(spark, 3000)))
    assert(row._4 == direct.checksum.toString)
  }

  test("teravalidateFiles flags boundary violations across files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-terasort").toString
    // hash-partitioned (NOT range-sorted) but sorted within partitions:
    // within-file order passes, cross-file boundaries must fail
    TeraSort.teragen(spark, 2000).repartition(4)
      .sortWithinPartitions("key")
      .write.mode("overwrite").parquet(s"$dir/bad")
    val r = TeraSort.teravalidateFiles(spark, s"$dir/bad")
    assert(r.rows == 2000L)
    assert(r.sortedWithin)
    assert(!r.sortedAcross)
  }
}
