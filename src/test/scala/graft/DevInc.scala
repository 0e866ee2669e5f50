package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Incremental-dedup scale probe (the dd5 path): MinHash-index an
  * N-doc corpus ONCE, then check a 1% batch (half exact resubmissions,
  * half near-dup edits) against the standing index. The number that
  * matters is the ratio: batch lookup vs full-corpus pair job — the
  * nightly-refresh cost model. `sbt "Test/runMain graft.DevInc [nDocs...]"`.
  */
object DevInc {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(200000L)
    val spark = SparkSession.builder()
      // 4 task attempts — see DevIncIvf: local-fs mkdirs races under
      // 32 concurrent attempt-dir creations at the 1e7 scale
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

    sizes.foreach { n =>
      val dir = s"/tmp/graft-scale/docs$n"
      val gen = sources.Generators.randomText(spark, n, seed = 11L,
        wordsMin = 30, wordsMax = 80, partitions = 32)
        .select(col("id").as("doc_id"), col("text"))
      gen.write.mode("overwrite").parquet(dir)
      val corpus = spark.read.parquet(dir)

      val table = s"devinc_$n"
      val (_, tBuild) = timed {
        Dedup.minhashIndexBuild(corpus, "text", "doc_id", table, buckets = 32)
      }
      // 1% batch: even ids resubmitted verbatim, odd ids with one edit
      val batch = corpus.filter(col("doc_id") % 100 === 0)
        .select((col("doc_id") + n).as("doc_id"), col("text"))
        .unionByName(corpus.filter(col("doc_id") % 100 === 1)
          .select((col("doc_id") + n).as("doc_id"),
            concat(col("text"), lit(" xq")).as("text")))
      val nBatch = batch.count()
      val (found, tLookup) = timed {
        val f = Dedup.minhashDedupAgainst(spark, table, batch,
          "text", "doc_id").cache()
        f.count(); f
      }
      val nFound = found.count()
      // every batch doc must rediscover its own source (est 1.0 for the
      // verbatim half; the one-token edit keeps est >> threshold)
      val selfHits = found
        .filter(col("corpus_id") === col("batch_id") - n).count()
      found.unpersist()
      // ABSORB the batch (the refresh-loop close): append must cost
      // O(batch) — flat as the corpus grows — not O(corpus) rebuild
      val (_, tAppend) = timed {
        Dedup.minhashIndexAppend(spark, table, batch, "text", "doc_id")
      }
      // the absorbed docs are immediately findable by the NEXT batch
      val probe = corpus.filter(col("doc_id") % 100 === 0).limit(50)
        .select((col("doc_id") + 2 * n).as("doc_id"), col("text"))
      val nextHits = Dedup.minhashDedupAgainst(spark, table, probe,
          "text", "doc_id")
        .filter(col("corpus_id") >= n).count()
      // the standing full-corpus pair job, for the cost ratio
      val (nPairs, tFull) = timed(
        Dedup.minhashLshPairs(corpus, "text", "doc_id").count())
      println(f"[inc] n=$n build=${tBuild}%.1fs batch=$nBatch " +
        f"lookup=${tLookup}%.1fs found=$nFound selfHits=$selfHits/$nBatch " +
        f"append=${tAppend}%.1fs nextBatchHitsAppended=$nextHits " +
        f"fullPairJob=${tFull}%.1fs (pairs=$nPairs) ratio=${tFull / tLookup}%.1fx")
      System.out.flush()
    }
    spark.stop()
  }
}
