package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** DistCp-style manifest copy job (reference `tools:hadoop-distcp`:
  * `DistCp.java` driver, `SimpleCopyListing.java` recursive listing,
  * `RegexCopyFilter.java` exclusions, update/skip-identical semantics of
  * `DistCpSync`/`CopyMapper`): build a file manifest, distribute it, and
  * stream-copy each file in its own task.
  *
  * Scale: the listing is metadata-only AND distributed — the driver
  * sees one row per top-level entry, each subtree walks in its own
  * task ([[listingDs]]); the data movement is one streaming copy per
  * file across the cluster, with per-task byte counters aggregated by
  * accumulator. Neither file content nor the manifest ever gathers at
  * the driver.
  */
object DistCopy {

  final case class Entry(rel: String, size: Long)

  /** [[Entry]] + modification time — the snapshot row [[copyDiff]]
    * diffs on (rel identity, size+mtime change signal). */
  final case class FileMeta(rel: String, size: Long, mtime: Long)

  /** DISTRIBUTED recursive copy listing relative to `srcDir`,
    * optionally excluding paths matching `excludeRegex`
    * (RegexCopyFilter semantics). The driver touches only the top
    * level (O(fanout) metadata); each first-level directory's subtree
    * is then walked by its own executor task, so a 10⁸-small-file tree
    * never materializes as driver heap — the manifest stays a Dataset
    * end to end (the reference's copy-listing phase is itself a
    * sequential driver-side walk; this is the Spark-shaped scale
    * version of it).
    */
  def listingDs(spark: SparkSession, srcDir: String,
                excludeRegex: Option[String] = None):
      org.apache.spark.sql.Dataset[Entry] = {
    import spark.implicits._
    listingMetaDs(spark, srcDir, excludeRegex)
      .map(m => Entry(m.rel, m.size))
  }

  /** [[listingDs]] with modification times — the snapshot form
    * [[copyDiff]] persists and diffs. Same distributed walk. */
  def listingMetaDs(spark: SparkSession, srcDir: String,
                    excludeRegex: Option[String] = None):
      org.apache.spark.sql.Dataset[FileMeta] = {
    import spark.implicits._
    val sc = spark.sparkContext
    val conf = sc.hadoopConfiguration
    val src = new Path(srcDir)
    val fs = src.getFileSystem(conf)
    val base = fs.getFileStatus(src).getPath.toUri.getPath
    val top = fs.listStatus(src).toSeq
    val topFiles = top.filter(_.isFile).map(st =>
      FileMeta(st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/"),
        st.getLen, st.getModificationTime))
    val topDirs = top.filter(_.isDirectory)
      .map(_.getPath.toUri.getPath)
    val confBc = sc.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val deep =
      if (topDirs.isEmpty) spark.emptyDataset[FileMeta]
      else spark.createDataset(topDirs)
        .repartition(math.min(topDirs.size, 64))
        .flatMap { dir =>
          val p = new Path(dir)
          val dfs = p.getFileSystem(confBc.value.value)
          val it = dfs.listFiles(p, true)
          // lazy: one subtree never buffers in executor heap either
          new Iterator[FileMeta] {
            override def hasNext: Boolean = it.hasNext
            override def next(): FileMeta = {
              val st = it.next()
              FileMeta(
                st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/"),
                st.getLen, st.getModificationTime)
            }
          }
        }
    val all = spark.createDataset(topFiles).unionByName(deep)
    excludeRegex.fold(all) { rx =>
      all.filter(e => rx.r.findFirstIn(e.rel).isEmpty)
    }
  }

  /** Driver-side copy listing — [[listingDs]] collected and sorted.
    * Convenience for modest trees (specs, archives of a few million
    * members); the copy job itself runs off the Dataset form.
    */
  def listing(spark: SparkSession, srcDir: String,
              excludeRegex: Option[String] = None): Seq[Entry] =
    listingDs(spark, srcDir, excludeRegex).collect().toSeq.sortBy(_.rel)

  final case class CopyStats(copied: Long, skipped: Long, bytes: Long)

  /** Fill `buf` from `in` until full or EOF; returns bytes read. */
  private def readFull(in: java.io.InputStream, buf: Array[Byte]): Int = {
    var off = 0
    var n = 0
    while (off < buf.length && n >= 0) {
      n = in.read(buf, off, buf.length - off)
      if (n > 0) off += n
    }
    off
  }

  /** Same-contents test for the `-update` skip decision (reference
    * `tools:hadoop-distcp` `DistCpUtils.checksumsAreEqual`): when both
    * filesystems expose a native file checksum (HDFS's MD5-of-CRCs) the
    * comparison is pure metadata; filesystems that report none (e.g.
    * the raw local fs) fall back to a streamed byte compare — still
    * cheaper than an unconditional copy (read-only, no write path) and
    * never silently skips a same-size changed file, which a size-only
    * check would.
    */
  private def contentsEqual(sfs: FileSystem, from: Path,
                            dfs: FileSystem, to: Path): Boolean = {
    val sck = sfs.getFileChecksum(from)
    val dck = dfs.getFileChecksum(to)
    if (sck != null && dck != null &&
        sck.getAlgorithmName == dck.getAlgorithmName) return sck == dck
    val a = sfs.open(from)
    try {
      val b = dfs.open(to)
      try {
        val bufA = new Array[Byte](65536)
        val bufB = new Array[Byte](65536)
        var same = true
        var more = true
        while (same && more) {
          val na = readFull(a, bufA)
          val nb = readFull(b, bufB)
          same = na == nb && java.util.Arrays.equals(bufA, 0, na, bufB, 0, na)
          more = na == bufA.length
        }
        same
      } finally b.close()
    } finally a.close()
  }

  /** Per-TASK byte throttle — the reference's `-bandwidth` map-side
    * limiter (`tools:hadoop-distcp ThrottledInputStream`): each copy
    * task independently caps its observed rate at `bytesPerSec` by
    * sleeping off any surplus, so a J-task job is bounded by
    * J·bandwidth aggregate exactly as J maps were. Instantiated INSIDE
    * the partition (wall-clock origin = task start).
    */
  private final class Throttle(bytesPerSec: Double) {
    private val t0 = System.nanoTime()
    private var sent = 0L
    def acquire(n: Int): Unit = {
      sent += n
      val surplus = sent / bytesPerSec - (System.nanoTime() - t0) / 1e9
      if (surplus > 0) Thread.sleep((surplus * 1000).toLong)
    }
  }

  /** One file's payload copy, throttled and attribute-preserving as
    * dialed. `preserve` copies the POSIX permission bits and the
    * modification time after the payload lands (the reference's
    * `-p[up...]` attribute set, scoped to what every Hadoop FS client
    * exposes portably).
    */
  private def copyFile(sfs: FileSystem, from: Path, dfs: FileSystem,
                       to: Path, throttle: Option[Throttle],
                       preserve: Boolean): Unit = {
    dfs.mkdirs(to.getParent)
    val in = sfs.open(from)
    try {
      val outS = dfs.create(to, true)
      try {
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n > 0) {
          throttle.foreach(_.acquire(n))
          outS.write(buf, 0, n)
          n = in.read(buf)
        }
      } finally outS.close()
    } finally in.close()
    if (preserve) {
      val st = sfs.getFileStatus(from)
      dfs.setPermission(to, st.getPermission)
      dfs.setTimes(to, st.getModificationTime, -1)
    }
  }

  /** Copy `srcDir` → `dstDir`. `update = true` skips files already
    * present at the destination with the same size AND equal contents
    * (native-checksum compare when the filesystems expose one, streamed
    * byte compare otherwise — see [[contentsEqual]]); same-size changed
    * files are re-copied, matching the reference's checksum-gated
    * update. The manifest is a Dataset end to end ([[listingDs]]), so
    * neither the listing nor the copy job materializes the tree at the
    * driver.
    *
    * Operational dials (reference `DistCpOptionSwitch`):
    *  - `bandwidthMB` > 0 throttles every copy task at that many
    *    MB/s ([[Throttle]] — the `-bandwidth` per-map semantics);
    *  - `atomic = true` is the `-atomic` commit: the whole tree copies
    *    into a hidden staging sibling of the target and ONE
    *    `FileSystem.rename` publishes it — a reader never observes a
    *    partial target, and a mid-copy kill leaves only staging debris
    *    (cleared by the next atomic attempt). Requires a fresh target;
    *    rejected with `update` (re-copying everything into staging
    *    would silently defeat update's purpose — the reference rejects
    *    the pair too);
    *  - `preserve = true` copies permission bits + mtime per file.
    */
  def copy(spark: SparkSession, srcDir: String, dstDir: String,
           update: Boolean = false,
           excludeRegex: Option[String] = None,
           bandwidthMB: Double = 0.0,
           atomic: Boolean = false,
           preserve: Boolean = false): CopyStats = {
    require(bandwidthMB >= 0.0, s"bandwidthMB must be >= 0, got $bandwidthMB")
    if (!atomic)
      copyInto(spark, srcDir, dstDir, update, excludeRegex, bandwidthMB,
        preserve)
    else {
      require(!update, "atomic + update are mutually exclusive " +
        "(the staging copy is always full — the reference rejects the " +
        "pair as well)")
      val conf = spark.sparkContext.hadoopConfiguration
      val dst = new Path(dstDir)
      val fs = dst.getFileSystem(conf)
      require(!fs.exists(dst), s"atomic copy: target $dstDir exists")
      val parent = Option(dst.getParent).getOrElse(
        sys.error(s"atomic copy: target $dstDir has no parent directory"))
      val staging = new Path(parent, s".${dst.getName}._distcp_staging")
      fs.delete(staging, true) // debris from a killed prior attempt
      val st = copyInto(spark, srcDir, staging.toString, update = false,
        excludeRegex, bandwidthMB, preserve)
      fs.mkdirs(parent)
      require(fs.rename(staging, dst),
        s"atomic commit rename $staging -> $dst failed")
      st
    }
  }

  private def copyInto(spark: SparkSession, srcDir: String, dstDir: String,
                       update: Boolean, excludeRegex: Option[String],
                       bandwidthMB: Double, preserve: Boolean): CopyStats = {
    val sc = spark.sparkContext
    val copied = sc.longAccumulator("distcp_copied")
    val skipped = sc.longAccumulator("distcp_skipped")
    val bytes = sc.longAccumulator("distcp_bytes")
    val confBc = sc.broadcast(
      new org.apache.spark.util.SerializableConfiguration(sc.hadoopConfiguration))
    listingDs(spark, srcDir, excludeRegex)
      .repartition(64)
      .foreachPartition { it: Iterator[Entry] =>
      val conf = confBc.value.value
      val throttle = if (bandwidthMB > 0.0)
        Some(new Throttle(bandwidthMB * 1e6)) else None
      it.foreach { e =>
        val from = new Path(s"$srcDir/${e.rel}")
        val to = new Path(s"$dstDir/${e.rel}")
        val sfs = from.getFileSystem(conf)
        val dfs = to.getFileSystem(conf)
        if (update && dfs.exists(to) &&
            dfs.getFileStatus(to).getLen == e.size &&
            contentsEqual(sfs, from, dfs, to)) {
          skipped.add(1)
        } else {
          copyFile(sfs, from, dfs, to, throttle, preserve)
          copied.add(1)
          bytes.add(e.size)
        }
      }
    }
    CopyStats(copied.value, skipped.value, bytes.value)
  }

  final case class DiffStats(renamed: Long, deleted: Long, copied: Long,
                             skipped: Long, bytes: Long)

  /** CRC32 of a file's content — the cheap pairing fingerprint for
    * rename inference. Collisions are harmless: every inferred rename
    * is verified byte-for-byte ([[contentsEqual]]) before executing. */
  private def fileCrc(fs: FileSystem, p: Path): Long = {
    val crc = new java.util.zip.CRC32
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n > 0) { crc.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    crc.getValue
  }

  /** Snapshot-diff incremental sync — the reference `DistCpSync`
    * capability (`hadoop-tools/hadoop-distcp/.../DistCpSync.java:50`,
    * `DiffInfo.java`: `-diff <s1> <s2>` executes the rename/delete part
    * of an HDFS snapshot diff at the target before copying only the
    * changed files) re-expressed in the engine's listing-table idiom,
    * for filesystems with no snapshot facility: `prevListing` is the
    * [[listingMetaDs]] manifest persisted when the target was last
    * synced (the engine's "snapshot"), and the current source listing
    * diffs against it:
    *
    *  - same rel, same (size, mtime): UNTOUCHED — zero reads, counted
    *    `skipped`;
    *  - same rel, changed (size, mtime): copy, gated by the update-mode
    *    checksum compare (a touched-but-identical file still skips);
    *  - rel gone + rel appeared with the SAME (size, content): inferred
    *    RENAME, executed as a target-side `FileSystem.rename` — ZERO
    *    payload bytes moved (the reference behavior `copy(update=true)`
    *    cannot give: it re-copies the payload under the new name and
    *    leaves the old one). Pairing is (size, source CRC32) against
    *    (size, target CRC32 of the vanished rel), deterministic
    *    (rel-sorted within a fingerprint), and every inferred pair is
    *    VERIFIED byte-for-byte before the rename — a CRC collision
    *    degrades to copy+delete, never a wrong rename;
    *  - rel gone, unmatched: DELETE at the target;
    *  - rel appeared, unmatched: copy.
    *
    * Scale shape: the rel-diff is one full-outer join of two metadata
    * Datasets; fingerprints are computed ONLY for the delta's
    * candidates (appeared × vanished), distributed; renames/deletes/
    * copies execute in executor tasks off bounded delta Datasets —
    * nothing gathers at the driver but the O(delta) rename pairs.
    * With `prevListing` empty (first sync) every file is "appeared":
    * the call degenerates to `copy(update = false)` exactly.
    *
    * Returns [[DiffStats]]; persist `listingMetaDs(spark, srcDir)`
    * AFTER a successful sync as the next call's `prevListing`.
    */
  def copyDiff(spark: SparkSession, srcDir: String, dstDir: String,
               prevListing: org.apache.spark.sql.Dataset[FileMeta],
               excludeRegex: Option[String] = None): DiffStats = {
    import spark.implicits._
    val sc = spark.sparkContext
    val cur = listingMetaDs(spark, srcDir, excludeRegex)
    val joined = cur.toDF("rel", "size", "mtime").as("c")
      .join(prevListing.toDF("rel", "size", "mtime").as("p"),
        Seq("rel"), "full_outer")
      .select(org.apache.spark.sql.functions.col("rel"),
        $"c.size".as("csize"), $"c.mtime".as("cmtime"),
        $"p.size".as("psize"), $"p.mtime".as("pmtime"))
      .persist()
    try {
      val unchanged = joined.filter($"csize".isNotNull &&
        $"psize".isNotNull && $"csize" === $"psize" &&
        $"cmtime" === $"pmtime")
      val modified = joined.filter($"csize".isNotNull &&
        $"psize".isNotNull &&
        ($"csize" =!= $"psize" || $"cmtime" =!= $"pmtime"))
      val appeared = joined.filter($"psize".isNull)
        .select($"rel", $"csize".as("size"))
      val vanished = joined.filter($"csize".isNull)
        .select($"rel", $"psize".as("size"))
      val confBc = sc.broadcast(
        new org.apache.spark.util.SerializableConfiguration(
          sc.hadoopConfiguration))
      // fingerprints over the DELTA only: appeared rels hash at the
      // SOURCE (their new content), vanished rels at the TARGET (the
      // pre-sync copy is the only surviving body of the old content)
      def withCrc(df: DataFrame, baseDir: String) =
        df.as[(String, Long)].map { case (rel, size) =>
          val p = new Path(s"$baseDir/$rel")
          val fs = p.getFileSystem(confBc.value.value)
          // a vanished rel missing at the target (never synced / user
          // deleted) cannot rename-match; fingerprint 0 with size -1
          // keeps it in the delete set without failing the job
          if (fs.exists(p)) (rel, size, fileCrc(fs, p))
          else (rel, -1L, 0L)
        }.toDF("rel", "size", "crc")
      val app = withCrc(appeared, srcDir).persist()
      val van = withCrc(vanished, dstDir).persist()
      try {
        // deterministic pairing: k-th appeared rel of a fingerprint
        // matches k-th vanished rel (rel-sorted both sides)
        import org.apache.spark.sql.expressions.Window
        def ranked(df: DataFrame) = df.withColumn("k",
          org.apache.spark.sql.functions.row_number().over(
            Window.partitionBy("size", "crc").orderBy("rel")))
        val pairs = ranked(app).as("a")
          .join(ranked(van.filter($"size" >= 0)).as("v"),
            Seq("size", "crc", "k"))
          .select($"a.rel".as("newRel"), $"v.rel".as("oldRel"))
        val renamed = sc.longAccumulator("diff_renamed")
        val deleted = sc.longAccumulator("diff_deleted")
        val copied = sc.longAccumulator("diff_copied")
        val skipped = sc.longAccumulator("diff_skipped")
        val bytes = sc.longAccumulator("diff_bytes")
        skipped.add(unchanged.count())
        // 1) RENAMES first (they consume vanished targets the delete
        // pass would otherwise remove); verify content, else fall
        // through to the copy set via the unmatched logic below — the
        // conservative demotion is copy+delete, never a wrong rename.
        // The pairs gather at the driver (bounded O(delta) — the one
        // driver-side set this sync keeps, per the method scaladoc) and
        // the renames run in ONE collect-backed action whose task
        // closure is IDEMPOTENT: a retried task that finds the source
        // gone but the destination already carrying the right content
        // reports success instead of aborting, and the confirmed set
        // downstream deletes/copies read is the action's RESULT — a
        // literal, never a recomputable plan that could re-run the
        // renames (or recompute empty) under cache eviction.
        val pairRows = pairs.as[(String, String)].collect().toSeq
        val confirmedRows: Seq[(String, String)] =
          spark.createDataset(pairRows).mapPartitions { it =>
            val conf = confBc.value.value
            it.flatMap { case (newRel, oldRel) =>
              val from = new Path(s"$srcDir/$newRel")
              val at = new Path(s"$dstDir/$oldRel")
              val to = new Path(s"$dstDir/$newRel")
              val sfs = from.getFileSystem(conf)
              val dfs = at.getFileSystem(conf)
              def doneAlready =
                dfs.exists(to) && contentsEqual(sfs, from, dfs, to)
              if (dfs.exists(at) && contentsEqual(sfs, from, dfs, at)) {
                dfs.mkdirs(to.getParent)
                if (dfs.rename(at, to)) Some((newRel, oldRel))
                else if (doneAlready) {
                  // rename refused because `to` already carries the
                  // right content (a prior attempt landed it) while
                  // `at` still stands — confirming the pair excludes
                  // oldRel from the delete pass, so reap the stale
                  // duplicate HERE or it survives the sync
                  dfs.delete(at, false)
                  Some((newRel, oldRel))
                }
                else None // rename refused, target wrong — demote to copy
              } else if (!dfs.exists(at) && doneAlready) {
                // a prior attempt of THIS task already moved it
                Some((newRel, oldRel))
              } else None
            }
          }.collect().toSeq
        val confirmed = spark.createDataset(confirmedRows)
          .toDF("newRel", "oldRel")
        renamed.add(confirmedRows.size)
        // 2) DELETES: vanished rels not consumed by a confirmed rename
        van.select($"rel").except(
            confirmed.select($"oldRel".as("rel")))
          .as[String].foreachPartition { (it: Iterator[String]) =>
          val conf = confBc.value.value
          it.foreach { rel =>
            val p = new Path(s"$dstDir/$rel")
            val dfs = p.getFileSystem(conf)
            if (dfs.delete(p, false)) deleted.add(1)
          }
        }
        // 3) COPIES: appeared-and-unmatched + modified, checksum-gated
        val toCopy = app.select($"rel", $"size")
          .except(confirmed.select($"newRel".as("rel"))
            .join(app, Seq("rel")).select($"rel", $"size"))
          .unionByName(modified.select($"rel", $"csize".as("size")))
        toCopy.as[(String, Long)].foreachPartition {
          (it: Iterator[(String, Long)]) =>
          val conf = confBc.value.value
          it.foreach { case (rel, size) =>
            val from = new Path(s"$srcDir/$rel")
            val to = new Path(s"$dstDir/$rel")
            val sfs = from.getFileSystem(conf)
            val dfs = to.getFileSystem(conf)
            if (dfs.exists(to) &&
                dfs.getFileStatus(to).getLen == size &&
                contentsEqual(sfs, from, dfs, to)) {
              skipped.add(1)
            } else {
              dfs.mkdirs(to.getParent)
              val in = sfs.open(from)
              try {
                val outS = dfs.create(to, true)
                try org.apache.hadoop.io.IOUtils.copyBytes(
                  in, outS, 65536, false)
                finally outS.close()
              } finally in.close()
              copied.add(1)
              bytes.add(size)
            }
          }
        }
        DiffStats(renamed.value, deleted.value, copied.value,
          skipped.value, bytes.value)
      } finally { app.unpersist(); van.unpersist() }
    } finally joined.unpersist()
  }

  /** Small-file compaction (HadoopArchives/`har` capability,
    * `tools:hadoop-archives`, as SURVEY §2.11 maps it: coalesce+rewrite):
    * read a directory of small text files, rewrite as ~`targetBytes`
    * parts. Content-preserving, metadata-light — the archive-index
    * aspect of har is subsumed by the file-source's listing.
    */
  def compactText(spark: SparkSession, srcDir: String, dstDir: String,
                  targetBytes: Long = 128L * 1024 * 1024): Long = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, lit, sum}
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val fs = src.getFileSystem(conf)
    val totalBytes = listingDs(spark, srcDir)
      .agg(coalesce(sum("size"), lit(0L))).as[Long].head()
    val parts = math.max(1, (totalBytes / math.max(targetBytes, 1)).toInt)
    val df = spark.read.text(srcDir)
    df.coalesce(parts).write.mode("overwrite").text(dstDir)
    fs.listStatus(new Path(dstDir)).count(s =>
      s.isFile && s.getPath.getName.startsWith("part-")).toLong
  }

  /** har-style indexed archive (reference `tools:hadoop-archives` —
    * HarFileSystem's `_index`/`_masterindex` + part-file layout): pack a
    * directory tree of files into ONE parquet dataset of
    * (path, size, chunk, content) rows, range-partitioned and SORTED by
    * (path, chunk), so parquet's per-row-group min/max statistics ARE
    * the index. `size` is the FULL member size on every row; members
    * larger than `chunkBytes` split into consecutive chunk rows, read
    * streaming (one `chunkBytes` buffer per task, never the whole
    * member), so member size is unbounded — the old 2 GB
    * single-row/array ceiling is gone. Members are then read IN PLACE,
    * no extraction:
    *  - [[archiveList]] is a column-pruned metadata scan (content bytes
    *    never leave disk);
    *  - [[archiveGet]] is a pushed path-equality lookup — row groups
    *    whose [min,max] path range excludes the member are skipped, so
    *    a member read costs O(its row groups), not O(archive);
    *  - [[archiveExtract]] streams a member of ANY size back out,
    *    chunk at a time.
    * Packing is planned from METADATA alone: the manifest stays a
    * Dataset end to end (like [[copy]] — a 10⁸-member tree never lands
    * on driver heap; the only driver arrays are O(#partitions) prefix
    * sums), chunk rows are byte-packed into ~`targetBytes` output
    * partitions from their (size, chunkBytes)-derived offsets, and
    * file contents are read exactly ONCE, inside the write pass — the
    * earlier shape range-partitioned the content rows themselves, whose
    * sampling pass re-read every member's bytes a second time.
    */
  def archive(spark: SparkSession, srcDir: String, archiveDir: String,
              excludeRegex: Option[String] = None,
              targetBytes: Long = 128L * 1024 * 1024,
              chunkBytes: Int = 64 * 1024 * 1024): Long = {
    require(chunkBytes > 0, s"chunkBytes must be positive, got $chunkBytes")
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum}
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
    val sc = spark.sparkContext
    val confBc = sc.broadcast(
      new org.apache.spark.util.SerializableConfiguration(sc.hadoopConfiguration))
    val schema = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("size", LongType, nullable = false),
      StructField("chunk", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    // The manifest is a Dataset end to end (copy() parity — the har use
    // case is 10⁸ small files, which must never land as a driver Seq);
    // persisted because the metadata passes below walk it more than
    // once, and each unpersisted walk would re-list the source tree.
    val manifest = listingDs(spark, srcDir, excludeRegex).persist()
    try {
      val (nMembers, totalBytes) = manifest
        .agg(count(lit(1)), coalesce(sum(col("size")), lit(0L)))
        .as[(Long, Long)].head()
      if (nMembers == 0) {
        spark.createDataFrame(sc.emptyRDD[org.apache.spark.sql.Row], schema)
          .write.mode("overwrite").parquet(archiveDir)
        return 0L
      }
      // Chunk-level METADATA rows (rel, size, chunk, chunkLen) — sizes
      // are known from the listing, so the byte-packed output layout is
      // planned WITHOUT touching file contents: the old shape ranged-
      // partitioned the content rows themselves, whose sampling pass
      // read every member's bytes a second time per pack.
      val metaParts = math.min(64L, (nMembers + 99999) / 100000 + 1).toInt
      val chunkMeta = manifest.flatMap { e =>
        val n = math.max(1L, (e.size + chunkBytes - 1) / chunkBytes)
        (0L until n).iterator.map { i =>
          (e.rel, e.size, i,
            math.max(0L, math.min(chunkBytes.toLong, e.size - i * chunkBytes)))
        }
      }.toDF("rel", "size", "chunk", "clen")
        .repartitionByRange(metaParts, col("rel"), col("chunk"))
        .sortWithinPartitions("rel", "chunk")
        .as[(String, Long, Long, Long)]
        .persist()
      try {
        // distributed prefix sum (the Shards pattern): per-partition
        // byte totals are the only driver materialization — O(metaParts)
        val partSums = chunkMeta.rdd
          .mapPartitionsWithIndex { (i, it) =>
            var s = 0L; it.foreach(s += _._4); Iterator((i, s))
          }.collect().sortBy(_._1).map(_._2)
        val offsets = partSums.scanLeft(0L)(_ + _)
        val tb = targetBytes
        val numOut = math.max(1L, (math.max(totalBytes, 1L) - 1) / tb + 1).toInt
        // each chunk's output partition = its global byte offset / target
        val keyed = chunkMeta.rdd.mapPartitionsWithIndex { (pi, it) =>
          var cum = offsets(pi)
          it.map { case (rel, size, chunk, clen) =>
            val pid = (cum / tb).toInt
            cum += clen
            ((pid, rel, chunk), (size, clen))
          }
        }
        val partitioner = new org.apache.spark.Partitioner {
          override def numPartitions: Int = numOut
          override def getPartition(key: Any): Int =
            key.asInstanceOf[(Int, String, Long)]._1
        }
        // shuffle only METADATA; within each output partition rows sort
        // by (rel, chunk), preserving the archive's index property
        val packed = keyed.repartitionAndSortWithinPartitions(partitioner)
        val rows = packed.mapPartitions { it =>
          val conf = confBc.value.value
          var in: org.apache.hadoop.fs.FSDataInputStream = null
          var curRel: String = null
          // a killed/abandoned task (speculative kill, downstream limit)
          // can leave the member stream open mid-run — close it on task
          // completion, not only on the happy path
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
            if (in != null) { in.close(); in = null }
          }
          it.map { case ((_, rel, chunk), (size, clen)) =>
            val buf = new Array[Byte](clen.toInt)
            if (clen > 0) {
              if (rel != curRel) {
                // consecutive chunks of one member share ONE open (an
                // open is a metadata RPC on HDFS/object stores)
                if (in != null) { in.close(); in = null }
                val p = new Path(s"$srcDir/$rel")
                in = p.getFileSystem(conf).open(p)
                curRel = rel
              }
              in.readFully(chunk * chunkBytes, buf)
            }
            org.apache.spark.sql.Row(rel, size, chunk, buf)
          }
        }
        // createDataFrame preserves the packed partitioning and order:
        // contents are read ONCE, in the write pass itself
        spark.createDataFrame(rows, schema)
          .write.mode("overwrite").parquet(archiveDir)
      } finally chunkMeta.unpersist()
      nMembers
    } finally manifest.unpersist()
  }

  /** Open an archive dataset, failing with an actionable message on a
    * pre-chunked-layout archive (no `chunk` column) instead of an
    * unresolved-column error deep in a reader.
    */
  private def readArchive(spark: SparkSession, archiveDir: String): DataFrame = {
    val df = spark.read.parquet(archiveDir)
    require(df.columns.contains("chunk"),
      s"$archiveDir was written by an older graft archive layout " +
        "(no chunk column) — re-pack it with archive()")
    df
  }

  /** Archive member listing — (path, size), one row per member,
    * column-pruned (the content column is never materialized; check
    * `ReadSchema` in the plan — the chunk = 0 predicate is pushed).
    */
  def archiveList(spark: SparkSession, archiveDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    readArchive(spark, archiveDir)
      .filter(col("chunk") === 0L).select("path", "size")
  }

  /** Point lookup of one member's bytes — pushed path predicate +
    * row-group pruning on the sorted layout (`PushedFilters` shows the
    * equality reaching the scan). Reassembles chunked members with one
    * chunk in flight (`toLocalIterator` over the chunk-sorted rows, so
    * driver overhead beyond the result array is one chunk); the result
    * must fit one JVM array — for members ≥ 2 GB use [[archiveExtract]],
    * which streams to a file.
    */
  def archiveGet(spark: SparkSession, archiveDir: String,
                 member: String): Option[Array[Byte]] = {
    import org.apache.spark.sql.functions.col
    val it = readArchive(spark, archiveDir)
      .filter(col("path") === member)
      .select("size", "content").sort("chunk")
      .toLocalIterator()
    if (!it.hasNext) None
    else {
      var out: Array[Byte] = null
      var off = 0
      while (it.hasNext) {
        val r = it.next()
        if (out == null) {
          val size = r.getAs[Long]("size")
          require(size <= Int.MaxValue,
            s"archive member $member is $size bytes — too large for one " +
              "array; use archiveExtract to stream it to a file")
          out = new Array[Byte](size.toInt)
        }
        val b = r.getAs[Array[Byte]]("content")
        System.arraycopy(b, 0, out, off, b.length)
        off += b.length
      }
      Some(out)
    }
  }

  /** Stream one member (any size) out of the archive to `destPath`:
    * chunk rows arrive in order via `toLocalIterator`, so peak driver
    * memory is one chunk, not the member. Returns bytes written, or
    * None if the member is absent.
    */
  def archiveExtract(spark: SparkSession, archiveDir: String,
                     member: String, destPath: String): Option[Long] = {
    import org.apache.spark.sql.functions.col
    val chunks = readArchive(spark, archiveDir)
      .filter(col("path") === member)
      .select("chunk", "content").sort("chunk")
    val it = chunks.toLocalIterator()
    if (!it.hasNext) None
    else {
      val dest = new Path(destPath)
      val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(dest, true)
      var written = 0L
      try {
        while (it.hasNext) {
          val b = it.next().getAs[Array[Byte]]("content")
          out.write(b)
          written += b.length
        }
      } finally out.close()
      Some(written)
    }
  }

  /** Stats as a one-row frame for report-style use. */
  def copyReport(spark: SparkSession, srcDir: String, dstDir: String,
                 update: Boolean = false): DataFrame = {
    import spark.implicits._
    val s = copy(spark, srcDir, dstDir, update)
    Seq((s.copied, s.skipped, s.bytes)).toDF("copied", "skipped", "bytes")
  }
}
