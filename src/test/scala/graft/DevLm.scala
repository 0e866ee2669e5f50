package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.LangModel

/** Bigram-LM scale probe (the DevRetrieval protocol for the LM family):
  * lmTrain over the N-doc zipf corpus, score the FULL corpus against
  * the standing model, absorb a 1% batch via append, re-score a 1%
  * slice (the serving read after growth), compact, re-score. The
  * numbers that matter: train sublinear-ish in N (two bucketed writes
  * off one tokenize scan), append flat vs corpus (O(batch) deltas),
  * score tracking the SCORED doc mass with the count fold staying
  * zero-exchange on the index side (plan-pinned in LangModelSpec), and
  * compact O(index) on the slow cadence.
  * `sbt "Test/runMain graft.DevLm [nDocs...]"`.
  */
object DevLm {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(1000000L)
    val spark = SparkSession.builder()
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
      val dir = s"/tmp/graft-scale/zdocs$n"
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        sources.Generators.zipfText(spark, n, seed = 11L, partitions = 32)
          .select(col("id").as("doc_id"), col("text"))
          .write.mode("overwrite").parquet(dir)
      }
      val corpus = spark.read.parquet(dir)
      val table = s"devlm_$n"
      val (_, tTrain) = timed {
        LangModel.train(corpus, "doc_id", "text", table, buckets = 32)
      }
      println(f"[lm] n=$n train=${tTrain}%.1fs")
      System.out.flush()
      // full-corpus score: the batch-filter serving shape (CCNet-style
      // quality pass over everything)
      // force the FULL scoring plan: an agg over the score columns —
      // a bare count() lets Catalyst prune the scoring joins entirely
      val (rowsFull, tFull) = timed {
        LangModel.score(spark, table, corpus, "doc_id", "text")
          .agg(count(lit(1)), sum("logp_micro"), sum("n_bigrams"))
          .head().getLong(0)
      }
      println(f"[lm] n=$n score-full=${tFull}%.1fs rows=$rowsFull " +
        f"(${tFull / n * 1e6}%.1f us/doc)")
      System.out.flush()
      // 1% batch of NEW docs absorbed at O(batch)
      val batch = sources.Generators.zipfText(spark, n / 100, seed = 77L,
          partitions = 32)
        .select((col("id") + n).as("doc_id"), col("text"))
      val (_, tAppend) = timed {
        LangModel.append(spark, table, batch, "doc_id", "text")
      }
      println(f"[lm] n=$n append(1%%)=${tAppend}%.1fs " +
        f"(${tAppend / (n / 100) * 1000}%.2f ms/doc)")
      System.out.flush()
      // grown-model serving read on a 1% slice (delta fold included)
      val slice = corpus.filter(col("doc_id") % 100 === 0)
      val (rowsS, tSlice) = timed {
        LangModel.score(spark, table, slice, "doc_id", "text")
          .agg(count(lit(1)), sum("logp_micro"), sum("n_bigrams"))
          .head().getLong(0)
      }
      println(f"[lm] n=$n score-slice(1%%)=${tSlice}%.1fs rows=$rowsS")
      System.out.flush()
      // interactive-batch serving curve: the round-15 pushdown regime —
      // batches whose distinct w1 fits the cap serve off pruned scans
      // (batch-proportional); corpus-shaped batches fall back (their w1
      // set touches every row group anyway). Report the batch's distinct
      // w1 alongside so the engaged/fallback boundary is visible.
      Seq(100L, 1000L, 10000L).filter(_ <= n / 10).foreach { bs =>
        val step = n / bs
        val batch = corpus.filter(col("doc_id") % step === 0)
        val nw1 = batch
          .select(org.apache.spark.sql.functions.explode(
            graft.operators.TextOps.tokens(lower(col("text")))).as("w"))
          .distinct().count()
        val (rowsB, tBatch) = timed {
          LangModel.score(spark, table, batch, "doc_id", "text")
            .agg(count(lit(1)), sum("logp_micro"), sum("n_bigrams"))
            .head().getLong(0)
        }
        println(f"[lm] n=$n score-batch($bs)=${tBatch}%.2fs rows=$rowsB " +
          f"distinctW1=$nw1 (${tBatch / bs * 1000}%.2f ms/doc)")
        System.out.flush()
      }
      val (_, tCompact) = timed { LangModel.compact(spark, table) }
      val (rowsS2, tSlice2) = timed {
        LangModel.score(spark, table, slice, "doc_id", "text")
          .agg(count(lit(1)), sum("logp_micro"), sum("n_bigrams"))
          .head().getLong(0)
      }
      println(f"[lm] n=$n compact=${tCompact}%.1fs " +
        f"score-slice-after=${tSlice2}%.1fs rows=$rowsS2")
      System.out.flush()
    }
    spark.stop()
  }
}
