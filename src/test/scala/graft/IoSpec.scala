package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Io

/** Non-parquet IO round trips — reference `mapreduce/lib/input/
  * KeyValueLineRecordReader.java`, `FixedLengthInputFormat.java:41-50`,
  * `io/SequenceFile.java`, `mapreduce/lib/output/TextOutputFormat.java`.
  */
class IoSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-io-$tag").toString + "/d"

  test("kvText splits on FIRST separator only; no separator => empty value") {
    val p = tmp("kv")
    Seq("a\tb\tc", "noseparator", "k\t").toDF("value")
      .write.mode("overwrite").text(p)
    val got = Io.kvText(spark, p).as[(String, String)].collect().toSet
    assert(got == Set(("a", "b\tc"), ("noseparator", ""), ("k", "")))
  }

  test("tsv renders nulls as empty fields") {
    val p = tmp("tsv")
    Io.tsv(Seq((Option(1L), Option.empty[String]), (Option.empty[Long], Option("x")))
      .toDF("a", "b"), p)
    val lines = spark.read.text(p).as[String].collect().toSet
    assert(lines == Set("1\t", "\tx"))
  }

  test("fixedLength records are aligned across multi-file output") {
    val p = tmp("fix")
    // 4-byte payload + newline = 5-byte records, written from 3 partitions
    spark.range(0, 30, 1, 3).select(lpad(col("id").cast("string"), 4, "0").as("value"))
      .write.mode("overwrite").text(p)
    val rec = Io.fixedLength(spark, p, 5)
    assert(rec.count() == 30)
    val ids = rec.select(substring(decode(col("record"), "US-ASCII"), 1, 4)
      .cast("long")).as[Long].collect().toSet
    assert(ids == (0L until 30L).toSet)
  }

  test("partitionedTsv: records land in filename-from-key directories") {
    val p = tmp("part")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
    Io.partitionedTsv(df, p, "k")
    val back = spark.read.text(p)
      .select(regexp_extract(input_file_name(), "k=([^/]+)", 1).as("k"),
        col("value").cast("long").as("id"))
      .as[(String, Long)].collect().toSet
    assert(back == Set(("a", 1L), ("b", 2L), ("a", 3L)))
  }

  test("multiOutputs: N sinks off one cached pass") {
    val p = tmp("multi")
    val df = spark.range(0, 100).toDF("id")
    Io.multiOutputs(df, Seq(
      ((d: org.apache.spark.sql.DataFrame) => d.filter(col("id") % 2 === 0), s"$p/even"),
      ((d: org.apache.spark.sql.DataFrame) => d.filter(col("id") % 2 =!= 0), s"$p/odd")))
    assert(spark.read.parquet(s"$p/even").count() == 50)
    assert(spark.read.parquet(s"$p/odd").count() == 50)
  }

  test("xmlRecords: tag-delimited records across lines, inter-record noise dropped") {
    val p = tmp("xml")
    Seq("<r>a</r>  <r>b", "with newline</r>", "junk", "<r>c</r>trailing")
      .toDF("value").coalesce(1).write.mode("overwrite").text(p)
    val got = Io.xmlRecords(spark, p, "<r>", "</r>")
      .as[String].collect().toSet
    assert(got == Set("a", "b\nwith newline", "c"))
  }

  test("auto: sniffs SEQ magic vs text") {
    val pSeq = tmp("auto-seq")
    Io.sequenceFile(Seq(("k", "v")).toDF("k", "v"), pSeq)
    assert(Io.auto(spark, pSeq).columns.toSeq == Seq("k", "v"))
    val pTxt = tmp("auto-txt")
    Seq("SEQuence text that is not a seqfile", "line2").toDF("value")
      .write.mode("overwrite").text(pTxt)
    val a = Io.auto(spark, pTxt)
    assert(a.columns.toSeq == Seq("value") && a.count() == 2)
  }

  test("sequenceFile KV round trip preserves pairs") {
    val p = tmp("seq")
    val df = Seq(("k1", "v1"), ("k2", "v2"), ("k1", "v3")).toDF("k", "v")
    Io.sequenceFile(df, p)
    val back = Io.sequenceFile(spark, p).as[(String, String)].collect().toSeq
    assert(back.sorted == Seq(("k1", "v1"), ("k1", "v3"), ("k2", "v2")))
  }

  test("binary sequenceFile round trip: tabs, newlines, zero bytes survive") {
    val p = tmp("binseq")
    val pairs = Seq(
      (Array[Byte](0, 1, 2), Array[Byte](9, 10, 0, 13, 10)),     // \t \n NUL \r \n
      (Array[Byte](0x7f, 0, -1), Array[Byte]()),                 // empty value
      (Array[Byte](0), Array[Byte](0, 0, 0)))
    Io.sequenceFileBinary(pairs.toDF("k", "v"), p)
    val back = Io.sequenceFileBinary(spark, p)
      .as[(Array[Byte], Array[Byte])].collect().toSeq
      .map { case (k, v) => (k.toSeq, v.toSeq) }.sortBy(_._1.toString)
    assert(back == pairs.map { case (k, v) => (k.toSeq, v.toSeq) }.sortBy(_._1.toString))
  }

  test("kvText round trip survives a splittable bzip2 codec") {
    // CompressedSplitLineReader parity: the same i1-style text chain
    // through .bz2 part files (bzip2 is the splittable codec), written
    // by the tsv sink's codec option (TextOutputFormat compression)
    val p = tmp("bz2")
    val df = (1 to 500).map(i => (s"k$i", s"v$i\twith tab")).toDF("k", "v")
    Io.tsv(df, p, codec = "bzip2")
    val files = new java.io.File(p).listFiles.filter(_.getName.endsWith(".bz2"))
    assert(files.nonEmpty, "fixture must actually be bzip2-compressed")
    val back = Io.kvText(spark, p)
    assert(back.count() == 500)
    // first-separator-only split: embedded tab stays in the value
    val r = back.filter(col("k") === "k7").as[(String, String)].head()
    assert(r == ("k7", "v7\twith tab"))
  }
}
