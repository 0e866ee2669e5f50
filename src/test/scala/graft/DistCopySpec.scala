package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DistCopy
import java.nio.file.{Files, Paths}

/** Manifest copy job — reference `tools:hadoop-distcp` (SimpleCopyListing
  * recursive listing, update skip, RegexCopyFilter).
  */
class DistCopySpec extends AnyFunSuite {
  import SharedSpark.spark

  private def mkTree(): String = {
    val root = Files.createTempDirectory("graft-distcp-src").toString
    Files.createDirectories(Paths.get(s"$root/a/b"))
    Files.writeString(Paths.get(s"$root/f1.txt"), "hello")
    Files.writeString(Paths.get(s"$root/a/f2.txt"), "world!")
    Files.writeString(Paths.get(s"$root/a/b/f3.log"), "deep file")
    root
  }

  test("recursive copy preserves tree and contents; stats add up") {
    val src = mkTree()
    val dst = Files.createTempDirectory("graft-distcp-dst").toString + "/out"
    val s = DistCopy.copy(spark, src, dst)
    assert(s.copied == 3 && s.skipped == 0)
    assert(s.bytes == 5 + 6 + 9)
    assert(Files.readString(Paths.get(s"$dst/a/b/f3.log")) == "deep file")
    assert(Files.readString(Paths.get(s"$dst/f1.txt")) == "hello")
  }

  test("update mode skips same-size existing files, recopies changed ones") {
    val src = mkTree()
    val dst = Files.createTempDirectory("graft-distcp-dst").toString + "/out"
    DistCopy.copy(spark, src, dst)
    val s2 = DistCopy.copy(spark, src, dst, update = true)
    assert(s2.copied == 0 && s2.skipped == 3)
    // change a file size upstream → exactly that file recopies
    Files.writeString(Paths.get(s"$src/f1.txt"), "hello, longer")
    val s3 = DistCopy.copy(spark, src, dst, update = true)
    assert(s3.copied == 1 && s3.skipped == 2)
    assert(Files.readString(Paths.get(s"$dst/f1.txt")) == "hello, longer")
  }

  test("update mode recopies a SAME-SIZE changed file (checksum gate)") {
    val src = mkTree()
    val dst = Files.createTempDirectory("graft-distcp-dst").toString + "/out"
    DistCopy.copy(spark, src, dst)
    // same byte count, different contents — a size-only skip would
    // silently leave the stale destination in place
    assert(Files.readString(Paths.get(s"$src/f1.txt")).length == 5)
    Files.writeString(Paths.get(s"$src/f1.txt"), "olleh")
    val s = DistCopy.copy(spark, src, dst, update = true)
    assert(s.copied == 1 && s.skipped == 2)
    assert(Files.readString(Paths.get(s"$dst/f1.txt")) == "olleh")
    // and a second pass is all-skip again
    val s2 = DistCopy.copy(spark, src, dst, update = true)
    assert(s2.copied == 0 && s2.skipped == 3)
  }

  test("copyDiff: rename-only delta moves ZERO payload bytes; deletes " +
       "propagate; modified copies checksum-gated; first sync = full copy") {
    val src = mkTree()
    val dst = Files.createTempDirectory("graft-distcp-dst").toString + "/out"
    // first sync: empty prev listing degenerates to a full copy
    import SharedSpark.spark.implicits._
    val empty = SharedSpark.spark.emptyDataset[DistCopy.FileMeta]
    val s1 = DistCopy.copyDiff(spark, src, dst, empty)
    assert(s1.copied == 3 && s1.renamed == 0 && s1.deleted == 0,
      s"first sync should full-copy, got $s1")
    val snap1 = DistCopy.listingMetaDs(spark, src).collect().toSeq.toDS()
    // no-op sync: everything unchanged, zero reads beyond metadata
    val s2 = DistCopy.copyDiff(spark, src, dst, snap1)
    assert(s2 == DistCopy.DiffStats(0, 0, 0, 3, 0), s"no-op sync got $s2")
    // RENAME at the source (payload untouched) + a DELETE + a NEW file
    Files.move(Paths.get(s"$src/a/f2.txt"), Paths.get(s"$src/a/renamed.txt"))
    Files.delete(Paths.get(s"$src/f1.txt"))
    Files.writeString(Paths.get(s"$src/brand_new.txt"), "fresh content")
    val s3 = DistCopy.copyDiff(spark, src, dst, snap1)
    assert(s3.renamed == 1, s"rename not inferred: $s3")
    assert(s3.deleted == 1, s"delete not propagated: $s3")
    assert(s3.copied == 1 && s3.bytes == "fresh content".length,
      s"rename/delete delta must move only the NEW file's bytes: $s3")
    assert(Files.readString(Paths.get(s"$dst/a/renamed.txt")) == "world!",
      "renamed target content wrong")
    assert(!Files.exists(Paths.get(s"$dst/a/f2.txt")),
      "old rel survived the rename at the target")
    assert(!Files.exists(Paths.get(s"$dst/f1.txt")),
      "deleted rel survived at the target")
    // MODIFIED file: copies; a merely-TOUCHED file (new mtime, same
    // content) is caught by the checksum gate and skipped
    val snap2 = DistCopy.listingMetaDs(spark, src).collect().toSeq.toDS()
    Files.writeString(Paths.get(s"$src/a/b/f3.log"), "deep file CHANGED")
    val f = Paths.get(s"$src/brand_new.txt")
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(f).toMillis + 5000))
    val s4 = DistCopy.copyDiff(spark, src, dst, snap2)
    assert(s4.copied == 1 && s4.renamed == 0 && s4.deleted == 0,
      s"modified-only delta got $s4")
    assert(s4.skipped == 2, // 1 unchanged + the touched-but-identical
      s"touched-but-identical file must checksum-skip: $s4")
    assert(Files.readString(Paths.get(s"$dst/a/b/f3.log"))
      == "deep file CHANGED")
  }

  test("copyDiff rename inference: same-content twins pair " +
       "deterministically; CRC pairing never renames wrong content") {
    val src = Files.createTempDirectory("graft-diff-src").toString
    val dst = Files.createTempDirectory("graft-diff-dst").toString + "/out"
    // two IDENTICAL files (same size + content) both renamed: the
    // (size, crc, k) pairing must consume both without duplicating
    Files.writeString(Paths.get(s"$src/t1.txt"), "same body")
    Files.writeString(Paths.get(s"$src/t2.txt"), "same body")
    Files.writeString(Paths.get(s"$src/other.txt"), "unrelated")
    import SharedSpark.spark.implicits._
    DistCopy.copyDiff(spark, src, dst,
      SharedSpark.spark.emptyDataset[DistCopy.FileMeta])
    val snap = DistCopy.listingMetaDs(spark, src).collect().toSeq.toDS()
    Files.move(Paths.get(s"$src/t1.txt"), Paths.get(s"$src/m1.txt"))
    Files.move(Paths.get(s"$src/t2.txt"), Paths.get(s"$src/m2.txt"))
    val st = DistCopy.copyDiff(spark, src, dst, snap)
    assert(st.renamed == 2 && st.copied == 0 && st.bytes == 0,
      s"twin renames must both resolve with zero payload: $st")
    assert(Files.readString(Paths.get(s"$dst/m1.txt")) == "same body")
    assert(Files.readString(Paths.get(s"$dst/m2.txt")) == "same body")
    assert(!Files.exists(Paths.get(s"$dst/t1.txt")) &&
      !Files.exists(Paths.get(s"$dst/t2.txt")))
    // a vanished rel whose target copy is MISSING (user deleted it at
    // the destination) cannot rename-match: the appeared rel copies
    val snap2 = DistCopy.listingMetaDs(spark, src).collect().toSeq.toDS()
    Files.move(Paths.get(s"$src/other.txt"), Paths.get(s"$src/moved.txt"))
    Files.delete(Paths.get(s"$dst/other.txt"))
    val st2 = DistCopy.copyDiff(spark, src, dst, snap2)
    assert(st2.renamed == 0 && st2.copied == 1 &&
      st2.bytes == "unrelated".length,
      s"missing-target rename candidate must demote to copy: $st2")
    assert(Files.readString(Paths.get(s"$dst/moved.txt")) == "unrelated")
  }

  test("listingDs matches the driver-side listing") {
    val src = mkTree()
    val ds = DistCopy.listingDs(spark, src).collect().toSeq.sortBy(_.rel)
    assert(ds == DistCopy.listing(spark, src))
    assert(ds.map(_.rel) == Seq("a/b/f3.log", "a/f2.txt", "f1.txt"))
    val excl = DistCopy.listingDs(spark, src, Some("\\.log$"))
      .collect().toSeq.sortBy(_.rel)
    assert(excl.map(_.rel) == Seq("a/f2.txt", "f1.txt"))
  }

  test("compactText coalesces many small files, preserving lines") {
    val src = Files.createTempDirectory("graft-compact-src").toString
    val spark2 = spark
    import spark2.implicits._
    (0 until 20).foreach { i =>
      Files.writeString(Paths.get(s"$src/f$i.txt"), s"line-$i\n")
    }
    val dst = Files.createTempDirectory("graft-compact-dst").toString + "/out"
    val nParts = DistCopy.compactText(spark, src, dst, targetBytes = 1L << 20)
    assert(nParts == 1) // 20 tiny files → one part
    val lines = spark.read.text(dst).as[String].collect().toSet
    assert(lines == (0 until 20).map(i => s"line-$i").toSet)
  }

  test("exclude regex filters the listing") {
    val src = mkTree()
    val l = DistCopy.listing(spark, src, excludeRegex = Some("\\.log$"))
    assert(l.map(_.rel) == Seq("a/f2.txt", "f1.txt"))
  }

  test("har-style archive: in-place member read, pruned list, pushed lookup") {
    val src = mkTree()
    val arc = Files.createTempDirectory("graft-har").toString + "/arc"
    assert(DistCopy.archive(spark, src, arc) == 3)

    // member read is byte-exact, in place (no extraction step)
    assert(DistCopy.archiveGet(spark, arc, "a/b/f3.log")
      .map(new String(_)).contains("deep file"))
    assert(DistCopy.archiveGet(spark, arc, "nope.txt").isEmpty)

    // listing never reads content (column pruned off the scan) …
    val listPlan = DistCopy.archiveList(spark, arc)
      .queryExecution.executedPlan.toString
    assert(listPlan.contains("ReadSchema") && !listPlan.contains("content"))
    assert(DistCopy.archiveList(spark, arc).count() == 3)

    // … and the member lookup predicate reaches the parquet scan
    val getPlan = spark.read.parquet(arc)
      .filter(org.apache.spark.sql.functions.col("path") === "f1.txt")
      .queryExecution.executedPlan.toString
    assert(getPlan.contains("PushedFilters") && getPlan.contains("IsNotNull(path)"))
    assert(getPlan.contains("EqualTo(path,f1.txt)"))
  }

  test("chunked archive: members larger than chunkBytes reassemble exactly") {
    val src = Files.createTempDirectory("graft-har-chunk").toString
    val big = Array.tabulate(1000)(i => ((i * 31 + 7) % 256 - 128).toByte)
    val small = "tiny".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Files.write(Paths.get(s"$src/big.bin"), big)
    Files.write(Paths.get(s"$src/small.txt"), small)
    val arc = s"$src-packed"
    assert(DistCopy.archive(spark, src, arc, chunkBytes = 64) == 2)
    // 1000 bytes at 64-byte chunks → 16 rows; small stays single-chunk
    val byPath = spark.read.parquet(arc).groupBy("path").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPath == Map("big.bin" -> 16L, "small.txt" -> 1L))
    // listing stays one row per member, carrying the FULL size
    val l = DistCopy.archiveList(spark, arc).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(l == Map("big.bin" -> 1000L, "small.txt" -> 4L))
    // in-place get reassembles byte-exactly across chunk boundaries
    assert(DistCopy.archiveGet(spark, arc, "big.bin").get.sameElements(big))
    assert(DistCopy.archiveGet(spark, arc, "small.txt").get.sameElements(small))
    // extract streams chunk-at-a-time to a destination file
    val dest = s"$src-out/big.bin"
    assert(DistCopy.archiveExtract(spark, arc, "big.bin", dest).contains(1000L))
    assert(Files.readAllBytes(Paths.get(dest)).sameElements(big))
    assert(DistCopy.archiveExtract(spark, arc, "nope", s"$src-out/x").isEmpty)
  }

  test("pre-chunked-layout archives fail with a re-pack message") {
    val spark2 = spark
    import spark2.implicits._
    val old = Files.createTempDirectory("graft-har-old").toString + "/arc"
    Seq(("f.txt", 2L, Array[Byte](104, 105)))
      .toDF("path", "size", "content").write.parquet(old)
    val e = intercept[IllegalArgumentException](
      DistCopy.archiveList(spark, old).collect())
    assert(e.getMessage.contains("re-pack"))
  }

  test("archive packs a 10⁴-file tree off the Dataset manifest, byte-balanced parts") {
    val src = Files.createTempDirectory("graft-har-many").toString
    Files.createDirectories(Paths.get(s"$src/d0"))
    Files.createDirectories(Paths.get(s"$src/d1"))
    val n = 10000
    for (i <- 0 until n)
      Files.writeString(Paths.get(s"$src/d${i % 2}/f$i.txt"), s"member-$i-payload")
    // one member much larger than targetBytes, chunked small enough that
    // its chunk rows MUST span output partitions
    val big = Array.tabulate(50000)(i => ((i * 13 + 5) % 256 - 128).toByte)
    Files.write(Paths.get(s"$src/big.bin"), big)
    val arc = s"$src-packed"
    assert(DistCopy.archive(spark, src, arc,
      targetBytes = 16 * 1024, chunkBytes = 512) == n + 1)
    // byte-packing must actually split the output (manifest partitions > 1)
    val parts = new java.io.File(arc).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts > 5, s"expected byte-split output parts, got $parts")
    // member accounting identical to the source tree
    val l = DistCopy.archiveList(spark, arc)
    assert(l.count() == n + 1)
    val totalBytes = l.agg(org.apache.spark.sql.functions.sum("size"))
      .head().getLong(0)
    val srcBytes = DistCopy.listing(spark, src).map(_.size).sum
    assert(totalBytes == srcBytes)
    // spot-check contents, including the partition-spanning member
    assert(DistCopy.archiveGet(spark, arc, "d0/f4242.txt")
      .map(new String(_)).contains("member-4242-payload"))
    assert(DistCopy.archiveGet(spark, arc, "big.bin").get.sameElements(big))
  }

  test("archive of an empty tree writes a readable empty archive") {
    val src = Files.createTempDirectory("graft-har-empty").toString
    val arc = s"$src-packed"
    assert(DistCopy.archive(spark, src, arc) == 0)
    assert(DistCopy.archiveList(spark, arc).count() == 0)
    assert(DistCopy.archiveGet(spark, arc, "x").isEmpty)
  }

  test("archive round-trips binary members (NULs, 0xFF, empty)") {
    val src = Files.createTempDirectory("graft-har-bin").toString
    val payload = Array.tabulate(1024)(i => ((i * 7) % 256 - 128).toByte)
    Files.write(Paths.get(s"$src/blob.bin"), payload)
    Files.write(Paths.get(s"$src/empty.bin"), Array.emptyByteArray)
    Files.write(Paths.get(s"$src/nuls.bin"), Array[Byte](0, 0, 0, -1, 0))
    val arc = s"$src-packed"
    assert(DistCopy.archive(spark, src, arc) == 3)
    assert(DistCopy.archiveGet(spark, arc, "blob.bin").get.sameElements(payload))
    assert(DistCopy.archiveGet(spark, arc, "empty.bin").get.isEmpty)
    assert(DistCopy.archiveGet(spark, arc, "nuls.bin").get
      .sameElements(Array[Byte](0, 0, 0, -1, 0)))
  }

  test("-bandwidth throttle: a throttled copy has a wall-clock floor " +
       "the unthrottled copy is far under") {
    val src = Files.createTempDirectory("graft-distcp-bw").toString
    // ONE 300 KB file → one copy task → per-task throttle is the
    // whole-job rate; at 0.1 MB/s the payload needs ~3 s
    Files.write(Paths.get(s"$src/big.bin"), Array.fill(300 * 1024)(7.toByte))
    def timedCopy(bw: Double): Double = {
      val dst = Files.createTempDirectory("graft-distcp-bwd").toString + "/o"
      val t0 = System.nanoTime()
      val s = DistCopy.copy(spark, src, dst, bandwidthMB = bw)
      assert(s.copied == 1 && s.bytes == 300 * 1024)
      (System.nanoTime() - t0) / 1e9
    }
    val fast = timedCopy(0.0)
    val slow = timedCopy(0.1)
    assert(slow >= 2.0, f"throttled copy finished in $slow%.2fs — the " +
      "0.1 MB/s floor for 300 KB is ~3 s")
    assert(fast < slow, f"unthrottled ($fast%.2fs) not under throttled " +
      f"($slow%.2fs)")
  }

  test("-atomic commit: the target appears all-at-once (never partial); " +
       "a failed attempt leaves NO target and the retry heals staging") {
    val src = Files.createTempDirectory("graft-distcp-at").toString
    Files.createDirectories(Paths.get(s"$src/d"))
    Files.write(Paths.get(s"$src/d/big.bin"),
      Array.fill(200 * 1024)(3.toByte))
    Files.writeString(Paths.get(s"$src/small.txt"), "x")
    val dstRoot = Files.createTempDirectory("graft-distcp-atd").toString
    val dst = s"$dstRoot/out"
    // poll WHILE a slow (throttled) atomic copy runs: the target path
    // must never exist before the job returns — the tree builds in the
    // hidden staging sibling and publishes with one rename
    @volatile var sawPartial = false
    @volatile var stop = false
    val poller = new Thread(() => {
      val stagingDir = Paths.get(s"$dstRoot/.out._distcp_staging")
      while (!stop) {
        // the legitimate publish IS Files.exists(dst) flipping true just
        // before copy() returns, so bare existence would race the stop
        // flag and flag a correct run (flaky). A PARTIAL publish is the
        // target being visible while the staging sibling still stands —
        // the commit rename atomically consumes staging, so checking dst
        // FIRST makes a true (dst, staging) coexistence impossible in a
        // correct run, while a direct-to-target writer trips it at once.
        if (Files.exists(Paths.get(dst)) && Files.exists(stagingDir))
          sawPartial = true
        Thread.sleep(20)
      }
    })
    poller.start()
    try DistCopy.copy(spark, src, dst, atomic = true, bandwidthMB = 0.2)
    finally { stop = true; poller.join() }
    assert(!sawPartial, "target was visible before the atomic commit")
    assert(Files.readString(Paths.get(s"$dst/small.txt")) == "x")
    assert(Files.size(Paths.get(s"$dst/d/big.bin")) == 200 * 1024)
    // failure path: an aborted attempt (here: the listing throws — any
    // failure before the final rename behaves identically, since the
    // target path is ONLY ever created by that rename) leaves no target
    val dst2 = s"$dstRoot/out2"
    intercept[Exception] {
      DistCopy.copy(spark, s"$dstRoot/no-such-source", dst2, atomic = true)
    }
    assert(!Files.exists(Paths.get(dst2)),
      "failed atomic attempt published a target")
    // staging debris from a killed prior attempt heals: plant a stale
    // staging tree with junk — the retry clears it and commits clean
    val staging = Paths.get(s"$dstRoot/.out2._distcp_staging")
    Files.createDirectories(staging)
    Files.writeString(staging.resolve("junk.txt"), "stale")
    DistCopy.copy(spark, src, dst2, atomic = true)
    assert(Files.readString(Paths.get(s"$dst2/small.txt")) == "x")
    assert(!Files.exists(Paths.get(s"$dst2/junk.txt")),
      "stale staging debris leaked into the committed target")
    assert(!Files.exists(staging), "staging survived the commit")
    // dial guards: fresh-target + no-update contracts are loud
    intercept[IllegalArgumentException] {
      DistCopy.copy(spark, src, dst2, atomic = true)
    }
    intercept[IllegalArgumentException] {
      DistCopy.copy(spark, src, s"$dstRoot/out3", atomic = true,
        update = true)
    }
  }

  test("-p preserve: permission bits and mtime round-trip") {
    import java.nio.file.attribute.PosixFilePermissions
    val src = Files.createTempDirectory("graft-distcp-p").toString
    val f = Paths.get(s"$src/script.sh")
    Files.writeString(f, "#!/bin/sh\necho hi\n")
    Files.setPosixFilePermissions(f,
      PosixFilePermissions.fromString("rwxr-x---"))
    val mtime = java.nio.file.attribute.FileTime.fromMillis(
      ((System.currentTimeMillis() - 86400000L) / 1000L) * 1000L)
    Files.setLastModifiedTime(f, mtime)
    val dst = Files.createTempDirectory("graft-distcp-pd").toString + "/o"
    DistCopy.copy(spark, src, dst, preserve = true)
    val g = Paths.get(s"$dst/script.sh")
    assert(PosixFilePermissions.toString(Files.getPosixFilePermissions(g))
      == "rwxr-x---", "permission bits did not survive the copy")
    assert(Files.getLastModifiedTime(g).toMillis == mtime.toMillis,
      "mtime did not survive the copy")
    // and WITHOUT the dial the destination gets default bits (the
    // preserve behavior is opt-in, not ambient)
    val dst2 = Files.createTempDirectory("graft-distcp-pd2").toString + "/o"
    DistCopy.copy(spark, src, dst2)
    assert(Files.getLastModifiedTime(Paths.get(s"$dst2/script.sh"))
      .toMillis != mtime.toMillis)
  }
}
