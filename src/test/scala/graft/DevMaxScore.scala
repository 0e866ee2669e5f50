package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** MaxScore dynamic-pruning probe (round 17): measure what
  * [[Retrieval.bm25QueryMaxScore]] buys over the exact single-pass
  * [[Retrieval.bm25Query]] on the 1e6-doc zipf corpus (the DevRetrieval
  * fixture), per batch shape:
  *
  *  - `mixed`: every query = two tail terms + the corpus's TOP head
  *    term — the MaxScore sweet spot (the head term's df≈N posting
  *    list is provably prunable against the tail terms' threshold);
  *  - `natural`: DevRetrieval's first-3-tokens batch verbatim — what
  *    zipf text actually serves (some queries verify, some fall back);
  *  - `rare`: tail-only queries — MUST read parity (the all-essential
  *    short-circuit returns bm25Query's plan unchanged);
  *  - `head`: all-head queries — MUST read parity (verification fails,
  *    per-query exact fallback).
  *
  * Each leg also asserts row-set equality exact-vs-pruned — a probe
  * that measured a wrong answer would be worse than no probe.
  * `sbt "Test/runMain graft.DevMaxScore [nDocs] [batches-csv] [nq]"`
  * — batches defaults to all four, nq to 100 (the 1e7 decade run uses
  * `mixed,natural 25`: the exact legs there cost ~10 s/q).
  */
object DevMaxScore {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val batchFilter: Set[String] = if (args.length > 1)
      args(1).split(",").map(_.trim).toSet
    else Set("mixed", "natural", "rare", "head")
    val nqTarget = if (args.length > 2) args(2).toLong else 100L
    val spark = SparkSession.builder()
      .master("local[32,4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._

    def timedMed(body: => Long): (Long, Double) = {
      val r0 = body // warm
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); body
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (r0, ts(1))
    }

    // Spark JOB counter — the round-20 fused-control-plane claim is a
    // reduced per-batch job count on the engaged path (each driver job
    // carries ~0.3-0.5 s of fixed control latency at 1e7, the measured
    // dominant serving cost), so count jobs directly via listener
    // rather than inferring from wall clock.
    val jobCounter = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCounter.incrementAndGet()
      })
    def countJobs(body: => Unit): Int = {
      val b = jobCounter.get(); body
      // listener bus is async — wait until the count stops moving
      var last = -1; var cur = jobCounter.get()
      while (cur != last) { Thread.sleep(300); last = cur; cur = jobCounter.get() }
      cur - b
    }

    val dir = s"/tmp/graft-scale/zdocs$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      sources.Generators.zipfText(spark, n, seed = 11L, partitions = 32)
        .select(col("id").as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(dir)
    }
    val corpus = spark.read.parquet(dir)
    val table = s"devms_$n"
    val t0 = System.nanoTime()
    Retrieval.bm25Build(corpus, "doc_id", "text", table, buckets = 32)
    println(f"[maxscore] n=$n build=${(System.nanoTime() - t0) / 1e9}%.1fs")
    // the round-19 BLOCK-MAX twin: same corpus, blk-sorted layout —
    // serving through it measures what the pushed doc/blk scan skip +
    // block-UB refinement buy over the plain layout's semi-join
    val tableBm = s"devmsbm_$n"
    val t0b = System.nanoTime()
    Retrieval.bm25Build(corpus, "doc_id", "text", tableBm, buckets = 32,
      blockMax = true)
    println(f"[maxscore] n=$n blockMax build=" +
      f"${(System.nanoTime() - t0b) / 1e9}%.1fs")

    // corpus head terms (df desc) and the per-query-term df frame the
    // batch construction reads
    val dict = spark.table(s"${table}_terms")
      .groupBy("term").agg(sum("df").as("df"))
    val headTerms = dict.orderBy(col("df").desc).limit(3)
      .as[(String, Long)].collect()
    val topHead = headTerms.head._1
    println(s"[maxscore] head terms: " +
      headTerms.map { case (t, d) => s"$t(df=$d)" }.mkString(" "))

    // natural batch: DevRetrieval's first-3-tokens protocol
    val natural = corpus.filter(col("doc_id") % (n / nqTarget) === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("qtext"))
      .localCheckpoint()
    // per-query min/max df for the shape-specific batches
    val qdf = natural.select(col("qid"),
        explode(split(col("qtext"), " ")).as("term"))
      .join(dict, Seq("term"), "left").na.fill(0L, Seq("df"))
      .groupBy("qid").agg(min("df").as("mindf"), max("df").as("maxdf"))
    // rare: every term under 0.1% df
    val rare = natural.join(
        qdf.filter(col("maxdf") <= n / 1000).select("qid"), "qid")
      .localCheckpoint()
    // mixed: tail-bearing queries with the corpus's hottest term APPENDED
    val mixed = natural.join(
        qdf.filter(col("mindf") <= n / 1000).select("qid"), "qid")
      .select(col("qid"), concat_ws(" ", col("qtext"), lit(topHead))
        .as("qtext"))
      .localCheckpoint()
    // head: the three hottest terms only
    val head = natural.select(col("qid"),
        lit(headTerms.map(_._1).mkString(" ")).as("qtext"))
      .localCheckpoint()

    for ((tag, q) <- Seq("mixed" -> mixed, "natural" -> natural,
                         "rare" -> rare, "head" -> head)
         if batchFilter(tag)) {
      val nq = q.count()
      if (nq == 0) println(s"[maxscore] $tag: empty batch, skipped")
      else {
        def exactRows() = Retrieval.bm25Query(spark, table, q,
          "qid", "qtext", 5).as[(Long, Long, Long, Int)].collect().toSet
        def msRows(forced: Boolean, t: String = table) = (if (forced)
            Retrieval.bm25QueryMaxScore(spark, t, q, "qid", "qtext",
              5, gateMinHeadMass = 1L, gateCandFrac = 1.0)
          else Retrieval.bm25QueryMaxScore(spark, t, q,
            "qid", "qtext", 5))
          .as[(Long, Long, Long, Int)].collect().toSet
        // ONE exact collection per batch (at 1e7 each costs minutes) —
        // the four serving arms all compare against it
        val ex = exactRows()
        assert(ex == msRows(forced = false),
          s"[maxscore] $tag: gated plan diverged from exact — BUG")
        assert(ex == msRows(forced = true),
          s"[maxscore] $tag: forced plan diverged from exact — BUG")
        assert(ex == msRows(forced = false, t = tableBm),
          s"[maxscore] $tag: blockMax gated plan diverged — BUG")
        assert(ex == msRows(forced = true, t = tableBm),
          s"[maxscore] $tag: blockMax forced plan diverged — BUG")
        val (_, tEx) = timedMed {
          Retrieval.bm25Query(spark, table, q, "qid", "qtext", 5).count()
        }
        val (_, tMs) = timedMed {
          Retrieval.bm25QueryMaxScore(spark, table, q,
            "qid", "qtext", 5).count()
        }
        // forced engagement (cost gate bypassed): what the two-pass
        // machinery costs when the geometry can't repay it
        val (_, tMf) = timedMed {
          Retrieval.bm25QueryMaxScore(spark, table, q, "qid", "qtext",
            5, gateMinHeadMass = 1L, gateCandFrac = 1.0).count()
        }
        // the blockMax layout under the NATURAL dials — the round-19
        // serving claim is this column vs tMs on head-bearing batches
        val (_, tBm) = timedMed {
          Retrieval.bm25QueryMaxScore(spark, tableBm, q,
            "qid", "qtext", 5).count()
        }
        println(f"[maxscore] n=$n $tag nq=$nq exact=${tEx}%.2fs " +
          f"maxscore=${tMs}%.2fs ratio=${tMs / tEx}%.2fx " +
          f"blockmax=${tBm}%.2fs (${tBm / tMs}%.2fx of maxscore) " +
          f"forced=${tMf}%.2fs (${tEx / nq * 1000}%.0f -> " +
          f"${tMs / nq * 1000}%.0f -> ${tBm / nq * 1000}%.0f ms/q)")
        // per-batch Spark JOB counts, one serving call each (the fused
        // control plane's direct claim): forced engagement on the
        // plain and block-max layouts vs the exact single-pass plan
        val jEx = countJobs {
          Retrieval.bm25Query(spark, table, q, "qid", "qtext", 5).count()
        }
        val jMf = countJobs {
          Retrieval.bm25QueryMaxScore(spark, table, q, "qid", "qtext",
            5, gateMinHeadMass = 1L, gateCandFrac = 1.0).count()
        }
        val jBm = countJobs {
          Retrieval.bm25QueryMaxScore(spark, tableBm, q, "qid", "qtext",
            5, gateMinHeadMass = 1L, gateCandFrac = 1.0).count()
        }
        println(s"[maxscore] n=$n $tag jobs/batch: exact=$jEx " +
          s"forced=$jMf forcedBlockmax=$jBm")
        System.out.flush()
      }
    }
    spark.stop()
  }
}
