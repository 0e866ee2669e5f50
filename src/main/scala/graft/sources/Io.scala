package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Non-parquet ingestion and egress — the reference's InputFormat /
  * OutputFormat surface re-expressed on Spark's file sources.
  *
  * Readers (reference `core:mapreduce/lib/input/`):
  *  - `text`       ← TextInputFormat (`TextInputFormat.java`,
  *                   `LineRecordReader.java`): one row per line. The
  *                   reference's byte-offset key was never semantic
  *                   (just a unique id) and is not reproduced; use
  *                   `input_file_name()` + a row id when a key is needed.
  *  - `kvText`     ← KeyValueTextInputFormat (`KeyValueLineRecordReader
  *                   .java`): line split on the FIRST separator; a line
  *                   with no separator is all key, empty value.
  *  - `fixedLength`← FixedLengthInputFormat (`FixedLengthInputFormat
  *                   .java:41-50`): exact `recordLen`-byte binary records.
  *  - `sequenceFile` ← SequenceFileInputFormat (`SequenceFileInputFormat
  *                   .java`, writer `io:SequenceFile.java`) for Text KV
  *                   pairs.
  *
  * Sinks (reference `core:mapreduce/lib/output/`):
  *  - `tsv`        ← TextOutputFormat (`TextOutputFormat.java`):
  *                   `key <sep> value` lines (null → empty string).
  *  - `sequenceFile` ← SequenceFileOutputFormat.
  *
  * Scale: all readers are splittable distributed scans (text/binary file
  * sources split by HDFS block like FileInputFormat.getSplits;
  * fixed-length splits are record-aligned by construction). Nothing here
  * collects to the driver.
  */
object Io {

  // ------------------------------------------------------------ readers

  /** One row per line: DataFrame(value: string). */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** (k, v) from splitting each line on the FIRST `sep` only —
    * KeyValueLineRecordReader semantics: no separator ⇒ whole line is
    * the key and the value is empty.
    */
  def kvText(spark: SparkSession, path: String, sep: String = "\t"): DataFrame = {
    val parts = split(col("value"), java.util.regex.Pattern.quote(sep), 2)
    spark.read.text(path).select(
      element_at(parts, 1).as("k"),
      coalesce(try_element_at(parts, lit(2)), lit("")).as("v"))
  }

  /** Fixed-size binary records: DataFrame(record: binary), each exactly
    * `recordLen` bytes. Splits are record-aligned (binaryRecords
    * guarantees it), so the format parallelizes like the reference's
    * FixedLengthInputFormat.
    */
  def fixedLength(spark: SparkSession, path: String, recordLen: Int): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryRecords(path, recordLen).toDF("record")
  }

  /** Text-KV SequenceFile scan: DataFrame(k: string, v: string). */
  def sequenceFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[String, String](path).toDF("k", "v")
  }

  /** NLineInputFormat analog (`core:mapreduce/lib/input/NLineInputFormat
    * .java:62,150-159`): control task granularity at ~N lines per
    * partition. The reference's getSplitsForFile reads every file
    * client-side to find exact line boundaries — a full driver-side pass
    * that does not scale; here the line count is ESTIMATED from file
    * metadata (total bytes) and a single bounded 64 KiB head sample for
    * the average line length, so sizing costs O(#files) metadata calls +
    * one tiny read, never a data scan. Partition sizes are then ~N lines,
    * which is all the reference's use (bounding per-task work) needs;
    * jobs wanting byte-exact control should set maxPartitionBytes.
    */
  def textNLines(spark: SparkSession, path: String, linesPerPartition: Int): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files = (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
                 else Seq(fs.getFileStatus(p)))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    val totalBytes = files.map(_.getLen).sum
    val avgLineBytes = files.find(_.getLen > 0).map { f =>
      val in = fs.open(f.getPath)
      try {
        val buf = new Array[Byte](math.min(f.getLen, 64 * 1024L).toInt)
        var read = 0
        var r = in.read(buf, 0, buf.length)
        while (r > 0 && read + r < buf.length) { read += r; r = in.read(buf, read, buf.length - read) }
        if (r > 0) read += r
        val lines = buf.take(read).count(_ == '\n'.toByte)
        if (lines > 0) read.toDouble / lines else read.toDouble.max(1.0)
      } finally in.close()
    }.getOrElse(1.0)
    val estLines = math.max(1L, math.round(totalBytes / avgLineBytes))
    val parts = math.max(1, ((estLines + linesPerPartition - 1) / linesPerPartition).toInt)
    spark.read.text(path).repartition(parts)
  }

  /** Binary-KV SequenceFile scan — SequenceFileAsBinaryInputFormat
    * semantics (`core:mapreduce/lib/input/SequenceFileAsBinaryInputFormat
    * .java`): raw BytesWritable payloads, safe for keys/values containing
    * tabs, newlines, and zero bytes. DataFrame(k: binary, v: binary).
    * The record reader REUSES its Writable instances, so bytes are copied
    * out per record before leaving the iterator.
    */
  def sequenceFileBinary(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.io.BytesWritable
    spark.sparkContext
      .sequenceFile(path, classOf[BytesWritable], classOf[BytesWritable])
      .map { case (k, v) =>
        (java.util.Arrays.copyOf(k.getBytes, k.getLength),
          java.util.Arrays.copyOf(v.getBytes, v.getLength))
      }
      .toDF("k", "v")
  }

  /** Binary-KV SequenceFile write from a 2-column (k, v) binary frame —
    * SequenceFileAsBinaryOutputFormat
    * (`core:mapreduce/lib/output/SequenceFileAsBinaryOutputFormat.java`).
    */
  def sequenceFileBinary(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.io.BytesWritable
    val spark = df.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    df.select(col(df.columns(0)).cast("binary"), col(df.columns(1)).cast("binary"))
      .rdd.map { r =>
        (new BytesWritable(r.getAs[Array[Byte]](0)),
          new BytesWritable(r.getAs[Array[Byte]](1)))
      }
      .saveAsNewAPIHadoopFile(path, classOf[BytesWritable], classOf[BytesWritable],
        classOf[org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat[
          BytesWritable, BytesWritable]])
  }

  /** Tag-delimited record scan — StreamXmlRecordReader semantics
    * (`stream:StreamXmlRecordReader.java`: records bracketed by
    * begin/end tags, one record per emitted row): implemented with the
    * text source's custom record delimiter (split on the END tag, strip
    * everything before the begin tag). Content between records (incl.
    * trailing whitespace/newlines) is discarded; records not containing
    * `beginTag` (e.g. the post-final-tag remainder) are dropped.
    */
  def xmlRecords(spark: SparkSession, path: String,
                 beginTag: String, endTag: String): DataFrame = {
    val df = spark.read
      .option("lineSep", endTag)
      .text(path)
    val body = substring_index(col("value"),
      beginTag, -1) // text after the last beginTag
    df.filter(col("value").contains(beginTag))
      .select(body.as("record"))
  }

  /** Format-sniffing reader — AutoInputFormat semantics
    * (`stream:AutoInputFormat.java`: peek at the file header, route to
    * SequenceFile or text). Checks the 3-byte `SEQ` magic of the first
    * data file.
    */
  def auto(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val first = fs.listStatus(p).filter(_.isFile)
      .map(_.getPath).sortBy(_.getName)
      .find(f => fs.getFileStatus(f).getLen > 0)
    val isSeq = first.exists { f =>
      val in = fs.open(f)
      try {
        // "SEQ" magic + a small version byte — text that merely starts
        // with the letters SEQ has a printable 4th byte and routes to text
        val magic = new Array[Byte](4)
        in.readFully(magic)
        magic.take(3).sameElements("SEQ".getBytes("US-ASCII")) && magic(3) < 0x20
      } catch { case _: java.io.EOFException => false }
      finally in.close()
    }
    if (isSeq) sequenceFile(spark, path) else text(spark, path)
  }

  // ------------------------------------------------------------ sinks

  /** `col1 <sep> col2 <sep> ...` text lines (TextOutputFormat shape);
    * nulls render as empty strings (concat_ws drops nulls only between
    * separators, so cast+coalesce first for faithful columns).
    * `codec`: output compression (TextOutputFormat.setCompressOutput
    * parity) — "none", "gzip", "bzip2" (splittable), "lz4", "snappy",
    * "deflate".
    */
  def tsv(df: DataFrame, path: String, sep: String = "\t",
          codec: String = "none"): Unit = {
    val cols: Seq[Column] =
      df.columns.toSeq.map(c => coalesce(col(c).cast("string"), lit("")))
    df.select(concat_ws(sep, cols: _*).as("value"))
      .write.mode("overwrite").option("compression", codec).text(path)
  }

  /** Text-KV SequenceFile write from a 2-column (k, v) frame. */
  def sequenceFile(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    df.select(col(df.columns(0)).cast("string"), col(df.columns(1)).cast("string"))
      .as[(String, String)].rdd.saveAsSequenceFile(path)
  }

  /** Key-partitioned text output — the filename-from-key semantics of
    * MultipleOutputFormat.generateFileNameForKeyValue
    * (`core:mapred/lib/MultipleOutputFormat.java:56-144`): records land
    * in `<path>/<partitionCol>=<value>/part-*`.
    */
  def partitionedTsv(df: DataFrame, path: String, partitionCol: String,
                     sep: String = "\t"): Unit = {
    val rest = df.columns.toSeq.filterNot(_ == partitionCol)
      .map(c => coalesce(col(c).cast("string"), lit("")))
    df.select(concat_ws(sep, rest: _*).as("value"), col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol).text(path)
  }

  /** MultipleOutputs (`core:mapreduce/lib/output/MultipleOutputs.java:
    * 69-179`): N named side outputs written off ONE cached upstream pass
    * — the upstream plan executes once, each sink consumes the
    * materialized blocks.
    */
  def multiOutputs(df: DataFrame,
                   outputs: Seq[(DataFrame => DataFrame, String)]): Unit = {
    val cached = df.persist()
    try {
      cached.count() // materialize once before fan-out
      outputs.foreach { case (f, path) =>
        f(cached).write.mode("overwrite").parquet(path)
      }
    } finally cached.unpersist()
  }

  /** MapFile nearest-key lookup (`io:MapFile.java:681-715`
    * `Reader.getClosest`): for each probe, the record with the largest
    * key ≤ probe (`before = true`) or the smallest key ≥ probe
    * (default), NULL columns when no such record exists — exactly the
    * reference's null return.
    *
    * Scale shape: one INNER BroadcastNestedLoopJoin pass of the
    * (sorted, stats-pruned) table against the tiny broadcast probe set
    * (inner lets Spark legally build/broadcast the probe side; a
    * left-outer join with the probes on the left cannot — BuildLeft is
    * illegal for LeftOuter, so the hint would be dropped and the BIG
    * side broadcast), then a map-side-partial `max_by`/`min_by` per
    * probe, then a tiny left equi-join back onto the probe set to
    * restore the NULL rows for probes with no qualifying record — no
    * shuffle of the big side, no window over the full table.
    */
  def mapFileGetClosest(sorted: DataFrame, keyCol: String, valCol: String,
                        probes: Seq[Long], before: Boolean = false): DataFrame = {
    val spark = sorted.sparkSession
    import spark.implicits._
    val probeDf = probes.toDF("probe")
    val k = col(keyCol)
    val cond = if (before) k <= col("probe") else k >= col("probe")
    val closestKey = if (before) max(k) else min(k)
    val closestVal = if (before) max_by(col(valCol), k) else min_by(col(valCol), k)
    val hits = sorted.join(broadcast(probeDf), cond, "inner")
      .groupBy("probe")
      .agg(closestKey.as("closest_key"), closestVal.as("closest_val"))
    probeDf.join(broadcast(hits), Seq("probe"), "left")
  }

  /** Deterministic per-sfDir scratch dir for ingestion round-trip
    * queries (they must be rerunnable and sf-isolated).
    */
  def scratch(tag: String, sfDir: String): String =
    s"/tmp/graft-io/$tag-${sfDir.hashCode & Int.MaxValue}"
}
