package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Incremental-ANN scale probe — the embedding twin of [[DevInc]]:
  * LSH-index an N-vector corpus ONCE ([[Similarity.lshIndexBuild]],
  * the dedup-ADMISSION structure), then check a 1% batch (half exact
  * resubmissions, half +0.05-nudged near-dups, cos ≈ 0.99994) against
  * the standing index, absorb it ([[Similarity.lshIndexAppend]] and
  * the IVF serving-index [[Similarity.ivfAppend]]), and verify the
  * next batch finds the absorbed vectors. The numbers that matter:
  * lookup and append tracking the BATCH while the corpus grows, and
  * append ≪ rebuild for both indexes.
  *
  * (First version of this probe checked the batch through `ivfQuery`
  * — 230 s for a 4000-vector batch at 2e5, because an IVF check pays
  * O(batch · probeFrac · corpus): the probed lists grow with N. That
  * measurement is what motivated the LSH admission index; the IVF
  * index's role here is absorb-only.)
  * `sbt "Test/runMain graft.DevIncIvf [nVecs...]"`.
  */
object DevIncIvf {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(200000L)
    val spark = SparkSession.builder()
      // 4 task attempts: RawLocalFileSystem.mkdirs races under 32
      // concurrent attempt-dir creations (observed at 1e7), and local
      // mode defaults to maxFailures=1 — one spurious race kills the run
      .master("local[32,4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val dim = 64
    sizes.foreach { n =>
      val dir = s"/tmp/graft-scale/embinc$n"
      spark.range(n).repartition(32).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)), d =>
            pmod(xxhash64(col("id"), d), lit(1000000L)).cast("double") / 500000.0 - 1.0
          ).as("embedding"))
        .write.mode("overwrite").parquet(dir)
      val corpus = spark.read.parquet(dir)
      // nBits tracks log2(N) — the sizing rule of the blocked self-join
      // (frozen-nBits decay is MEASURED: 20 bits at 1e7 = 0.42 ms/doc
      // lookup vs 0.16 at 5e6 — collisions grow once N passes 2^nBits;
      // 24 bits restores the per-doc cost, validating the rule)
      val nBits = if (n >= 8000000) 24
                  else if (n >= 1000000) 20 else 16

      val table = s"devincivf_$n"
      val (_, tBuild) = timed {
        Similarity.lshIndexBuild(corpus, "vec_id", "embedding", table,
          nBits = nBits, buckets = 32)
      }
      val ivfTable = s"${table}_serve"
      val (_, tIvfBuild) = timed {
        Similarity.ivfBuild(corpus, "vec_id", "embedding", ivfTable,
          buckets = 32)
      }
      // 1% batch: even %100 resubmitted verbatim, odd %100 nudged
      val batch = corpus.filter(col("vec_id") % 100 === 0)
        .select((col("vec_id") + n).as("vec_id"), col("embedding"))
        .unionByName(corpus.filter(col("vec_id") % 100 === 1)
          .select((col("vec_id") + n).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + when(i === 0, 0.05).otherwise(0.0)).as("embedding")))
      val nBatch = batch.count()
      val (found, tLookup) = timed {
        val f = Similarity.lshDedupAgainst(spark, table, batch,
          "vec_id", "embedding", 0.999, nBits = nBits).cache()
        f.count(); f
      }
      // every batch vector must rediscover its own source (cos 1.0 for
      // the verbatim half; the nudge keeps cos ≈ 0.99994 ≥ 0.999)
      val selfHits = found
        .filter(col("corpus_id") === col("batch_id") - n)
        .select("batch_id").distinct().count()
      found.unpersist()
      val (_, tAppend) = timed {
        Similarity.lshIndexAppend(spark, table, batch, "vec_id", "embedding",
          nBits = nBits)
      }
      val (_, tIvfAppend) = timed {
        Similarity.ivfAppend(spark, ivfTable, batch, "vec_id", "embedding")
      }
      // absorbed vectors are immediately findable by the NEXT batch
      val probe = corpus.filter(col("vec_id") % 100 === 0).limit(50)
        .select((col("vec_id") + 2 * n).as("vec_id"), col("embedding"))
      val nextHits = Similarity.lshDedupAgainst(spark, table, probe,
          "vec_id", "embedding", 0.999, nBits = nBits)
        .filter(col("corpus_id") >= n)
        .select("batch_id").distinct().count()
      // the O(corpus) alternatives the appends avoid
      val (_, tRebuild) = timed {
        Similarity.lshIndexBuild(corpus.unionByName(batch), "vec_id",
          "embedding", s"${table}_rebuilt", nBits = nBits, buckets = 32)
      }
      println(f"[incivf] n=$n lshBuild=${tBuild}%.1fs ivfBuild=${tIvfBuild}%.1fs " +
        f"batch=$nBatch lookup=${tLookup}%.1fs selfHits=$selfHits/$nBatch " +
        f"lshAppend=${tAppend}%.1fs ivfAppend=${tIvfAppend}%.1fs " +
        f"nextBatchHitsAppended=$nextHits/50 " +
        f"lshRebuild=${tRebuild}%.1fs ratio=${tRebuild / tAppend}%.1fx")
      System.out.flush()
    }
    spark.stop()
  }
}
