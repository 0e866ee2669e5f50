package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.util.zip.CRC32

/** Teragen-style synthetic source + global sort + computed validation
  * (reference semantics: hadoop-mapreduce-examples `terasort/TeraGen.java:
  * 203-235` — 100-byte records with 10-byte binary keys;
  * `TeraValidate.java:40-120` — prove global order + 128-bit Σ crc32
  * checksum; `TeraSort.java:56-235` — sampled total-order partitioning).
  *
  * Our generator is an original design (seeded SplitMix64 per row id — a
  * public-domain mixing function), NOT a port of GenSort's 128-bit LCG:
  * what matters for the kernel is deterministic, uniformly distributed
  * 10-byte keys at any row count, generated independently per row so the
  * source parallelizes with zero coordination (`spark.range` splits the id
  * space across partitions).
  *
  * The sort itself is `orderBy(key)`: Spark's RangePartitioner performs
  * the same sample-based total-order partitioning as the reference's
  * InputSampler + TotalOrderPartitioner, so at 100 TB the plan is
  * sample → range-shuffle → per-partition sort, with AQE balancing
  * partition sizes.
  */
object TeraSort {

  @inline private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** n deterministic 100-byte records: (key: 10 bytes, value: 90 bytes). */
  def teragen(spark: SparkSession, n: Long, seed: Long = 42L,
              partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
                else spark.sessionState.conf.numShufflePartitions
    spark.range(0L, n, 1L, parts).mapPartitions { it =>
      it.map { i =>
        val h1 = splitmix64(seed ^ i)
        val h2 = splitmix64(h1 ^ 0x5851f42d4c957f2dL)
        val key = new Array[Byte](10)
        var b = 0
        while (b < 8) { key(b) = (h1 >>> (56 - 8 * b)).toByte; b += 1 }
        key(8) = (h2 >>> 56).toByte
        key(9) = (h2 >>> 48).toByte
        // value: 32 ascii digits of the row id + 58 filler bytes
        val value = new Array[Byte](90)
        val digits = f"$i%032d".getBytes("US-ASCII")
        System.arraycopy(digits, 0, value, 0, 32)
        var j = 32
        while (j < 90) { value(j) = ('A' + ((i + j) % 26)).toByte; j += 1 }
        (key, value)
      }
    }.toDF("key", "value")
  }

  /** Global total-order sort on the binary key (unsigned lexicographic —
    * Spark's BinaryType ordering).
    */
  def terasort(records: DataFrame): DataFrame = records.orderBy(col("key"))

  private def crc(k: Array[Byte], v: Array[Byte]): Long = {
    val c = new CRC32(); c.update(k); c.update(v); c.getValue
  }

  /** TeraValidate: checks (a) order within every partition, (b) order
    * across partition boundaries (first/last key per partition — the
    * per-output-file boundary check of the reference), and (c) the
    * Σ crc32(key||value) checksum (exact, as Decimal(38,0) — no overflow
    * at any realistic scale). All heavy work is distributed; only one
    * (first,last,flag) triple per partition reaches the driver.
    */
  final case class ValidateResult(rows: Long, sortedWithin: Boolean,
                                  sortedAcross: Boolean, checksum: java.math.BigDecimal)

  private def unsignedLte(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length <= b.length
  }

  def teravalidate(sorted: DataFrame): ValidateResult = {
    val spark = sorted.sparkSession
    import spark.implicits._
    // Single distributed pass; only one (first, last, ordered, n, partSum)
    // summary per partition reaches the driver.
    val perPart: Array[(Int, Array[Byte], Array[Byte], Boolean, Long, String)] =
      sorted.select("key", "value").as[(Array[Byte], Array[Byte])]
        .mapPartitions { it =>
          if (!it.hasNext) Iterator.empty
          else {
            val (first, fv) = it.next()
            var last = first
            var ordered = true
            var n = 1L
            var sum = BigInt(crc(first, fv))
            while (it.hasNext) {
              val (k, v) = it.next()
              if (!unsignedLte(last, k)) ordered = false
              last = k; n += 1; sum += crc(k, v)
            }
            Iterator((org.apache.spark.TaskContext.getPartitionId(),
              first, last, ordered, n, sum.toString))
          }
        }.collect()

    val byPart = perPart.sortBy(_._1)
    val within = byPart.forall(_._4)
    val across = byPart.sliding(2).forall {
      case Array(a, b) => unsignedLte(a._3, b._2)
      case _           => true
    }
    val total = byPart.map(r => BigInt(r._6)).sum
    ValidateResult(byPart.map(_._5).sum, within, across,
      new java.math.BigDecimal(total.bigInteger))
  }

  /** TeraValidate over WRITTEN output files (the reference's own shape:
    * `TeraValidate.java:40-120` runs one map per TeraSort output file,
    * checking in-file order and emitting the file's first/last key, and
    * one reduce checking boundaries across files in name order).
    *
    * Here: one distributed pass over the written parquet; each task
    * iterates its rows, detects file transitions (`input_file_name`),
    * checks key order within each contiguous file run, and emits one
    * (file, first, last, ordered, n, crcSum) summary per run. The driver
    * merges runs per file and checks cross-file boundaries in file-name
    * order — file names (`part-00000…`) are the sorted partition ids, so
    * name order IS the range-partition order. Only O(#files) summaries
    * reach the driver.
    *
    * Caveat (documented gap, irrelevant at bench scale): a single file
    * larger than maxPartitionBytes splits into several runs whose
    * relative order is unknown; order is then verified within runs and
    * across files, not across chunks of the same file.
    */
  def teravalidateFiles(spark: SparkSession, path: String): ValidateResult = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, input_file_name}
    val perRun: Array[(String, Array[Byte], Array[Byte], Boolean, Long, String)] =
      spark.read.parquet(path)
        .select(input_file_name().as("f"), col("key"), col("value"))
        .as[(String, Array[Byte], Array[Byte])]
        .mapPartitions { it =>
          val runs = scala.collection.mutable.ArrayBuffer
            .empty[(String, Array[Byte], Array[Byte], Boolean, Long, String)]
          var file: String = null
          var first: Array[Byte] = null
          var last: Array[Byte] = null
          var ordered = true
          var n = 0L
          var sum = BigInt(0)
          def flush(): Unit = if (file != null) {
            runs += ((file, first, last, ordered, n, sum.toString))
          }
          for ((f, k, v) <- it) {
            if (f != file) { flush(); file = f; first = k; last = k
                             ordered = true; n = 0L; sum = BigInt(0) }
            if (!unsignedLte(last, k)) ordered = false
            last = k; n += 1; sum += crc(k, v)
          }
          flush()
          runs.iterator
        }.collect()

    // merge runs per file, then check boundaries across name-ordered files
    val byFile = perRun.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, rs) =>
      val ordered = rs.forall(_._4)
      val first = rs.map(_._2).min(Ordering.fromLessThan[Array[Byte]](
        (a, b) => unsignedLte(a, b) && !java.util.Arrays.equals(a, b)))
      val last = rs.map(_._3).max(Ordering.fromLessThan[Array[Byte]](
        (a, b) => unsignedLte(a, b) && !java.util.Arrays.equals(a, b)))
      (f, first, last, ordered, rs.map(_._5).sum, rs.map(r => BigInt(r._6)).sum)
    }
    val within = byFile.forall(_._4)
    val across = byFile.sliding(2).forall {
      case Seq(a, b) => unsignedLte(a._3, b._2)
      case _         => true
    }
    ValidateResult(byFile.map(_._5).sum, within, across,
      new java.math.BigDecimal(byFile.map(_._6).sum.bigInteger))
  }

  /** Checksum of a record stream (SortValidator's input≡output content
    * check, `jc-test:mapred/SortValidator.java:40-75` — sum-of-crc
    * variant): distributed partial sums, one value per partition to the
    * driver.
    */
  def checksumOf(records: DataFrame): java.math.BigDecimal = {
    val spark = records.sparkSession
    import spark.implicits._
    val parts = records.select("key", "value").as[(Array[Byte], Array[Byte])]
      .mapPartitions { it =>
        var sum = BigInt(0)
        for ((k, v) <- it) sum += crc(k, v)
        Iterator(sum.toString)
      }.collect()
    new java.math.BigDecimal(parts.map(BigInt(_)).sum.bigInteger)
  }

  /** Full kernel (generate → total-order sort → WRITE → validate from the
    * written files → input/output checksum equality). No full-dataset
    * cache anywhere: the sort output streams to storage, validation
    * streams over the files, and the input-side checksum re-scans the
    * (deterministic, compute-only) generator.
    */
  def kernel(spark: SparkSession, n: Long, outDir: String = null): DataFrame = {
    import spark.implicits._
    val out = Option(outDir).getOrElse(s"/tmp/graft-terasort/n$n")
    // random 100-byte records don't compress — codec work is pure loss
    terasort(teragen(spark, n)).write.mode("overwrite")
      .option("compression", "uncompressed").parquet(out)
    val r = teravalidateFiles(spark, out)
    val genSum = checksumOf(teragen(spark, n))
    Seq((r.rows, r.sortedWithin, r.sortedAcross, r.checksum.toString,
        r.checksum.compareTo(genSum) == 0))
      .toDF("rows", "sorted_within", "sorted_across", "checksum", "io_checksum_match")
  }
}
