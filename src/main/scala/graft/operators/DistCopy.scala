package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** DistCp-style manifest copy job (reference `tools:hadoop-distcp`:
  * `DistCp.java` driver, `SimpleCopyListing.java` recursive listing,
  * `RegexCopyFilter.java` exclusions, update/skip-identical semantics of
  * `DistCpSync`/`CopyMapper`): build a file manifest, distribute it, and
  * stream-copy each file in its own task.
  *
  * Scale: the listing is metadata-only (driver-side, like the
  * reference's copy-listing phase); the data movement is one streaming
  * copy per file across the cluster, with per-task byte counters
  * aggregated by accumulator. No file content ever gathers at the
  * driver.
  */
object DistCopy {

  final case class Entry(rel: String, size: Long)

  /** Recursive copy listing relative to `srcDir`, optionally excluding
    * paths matching `excludeRegex` (RegexCopyFilter semantics).
    */
  def listing(spark: SparkSession, srcDir: String,
              excludeRegex: Option[String] = None): Seq[Entry] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val fs = src.getFileSystem(conf)
    val base = fs.getFileStatus(src).getPath.toUri.getPath
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    val it = fs.listFiles(src, true)
    val excl = excludeRegex.map(_.r)
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
      if (!excl.exists(_.findFirstIn(rel).isDefined))
        out += Entry(rel, st.getLen)
    }
    out.sortBy(_.rel).toSeq
  }

  final case class CopyStats(copied: Long, skipped: Long, bytes: Long)

  /** Copy `srcDir` → `dstDir`. `update = true` skips files already
    * present at the destination with the same size (the -update
    * fast-path; the reference also offers checksum compare — size-only
    * here, documented divergence).
    */
  def copy(spark: SparkSession, srcDir: String, dstDir: String,
           update: Boolean = false,
           excludeRegex: Option[String] = None): CopyStats = {
    val manifest = listing(spark, srcDir, excludeRegex)
    val sc = spark.sparkContext
    val copied = sc.longAccumulator("distcp_copied")
    val skipped = sc.longAccumulator("distcp_skipped")
    val bytes = sc.longAccumulator("distcp_bytes")
    val confBc = sc.broadcast(
      new org.apache.spark.util.SerializableConfiguration(sc.hadoopConfiguration))
    val parts = math.min(math.max(manifest.size, 1), 64)
    sc.parallelize(manifest, parts).foreachPartition { it =>
      val conf = confBc.value.value
      it.foreach { e =>
        val from = new Path(s"$srcDir/${e.rel}")
        val to = new Path(s"$dstDir/${e.rel}")
        val sfs = from.getFileSystem(conf)
        val dfs = to.getFileSystem(conf)
        if (update && dfs.exists(to) && dfs.getFileStatus(to).getLen == e.size) {
          skipped.add(1)
        } else {
          dfs.mkdirs(to.getParent)
          val in = sfs.open(from)
          try {
            val outS = dfs.create(to, true)
            try org.apache.hadoop.io.IOUtils.copyBytes(in, outS, 65536, false)
            finally outS.close()
          } finally in.close()
          copied.add(1)
          bytes.add(e.size)
        }
      }
    }
    CopyStats(copied.value, skipped.value, bytes.value)
  }

  /** Small-file compaction (HadoopArchives/`har` capability,
    * `tools:hadoop-archives`, as SURVEY §2.11 maps it: coalesce+rewrite):
    * read a directory of small text files, rewrite as ~`targetBytes`
    * parts. Content-preserving, metadata-light — the archive-index
    * aspect of har is subsumed by the file-source's listing.
    */
  def compactText(spark: SparkSession, srcDir: String, dstDir: String,
                  targetBytes: Long = 128L * 1024 * 1024): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val fs = src.getFileSystem(conf)
    val totalBytes = listing(spark, srcDir).map(_.size).sum
    val parts = math.max(1, (totalBytes / math.max(targetBytes, 1)).toInt)
    val df = spark.read.text(srcDir)
    df.coalesce(parts).write.mode("overwrite").text(dstDir)
    fs.listStatus(new Path(dstDir)).count(s =>
      s.isFile && s.getPath.getName.startsWith("part-")).toLong
  }

  /** Stats as a one-row frame for report-style use. */
  def copyReport(spark: SparkSession, srcDir: String, dstDir: String,
                 update: Boolean = false): DataFrame = {
    import spark.implicits._
    val s = copy(spark, srcDir, dstDir, update)
    Seq((s.copied, s.skipped, s.bytes)).toDF("copied", "skipped", "bytes")
  }
}
