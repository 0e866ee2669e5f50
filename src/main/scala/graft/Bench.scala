package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bench harness (BASELINE.md kernels): runs the headline kernels on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Protocol: per kernel, 1 warm-up run then median of 3 timed runs.
  * Results are forced with a noop-sink write (count() would let Catalyst
  * drop sorts/projections; noop executes the full physical plan).
  *
  * Adjudication instrumentation (round-18, VERDICT r17 asks #1/#2): the
  * JSON additionally carries, per kernel, the warm-up wall(s), ALL timed
  * run values (a 3-4x median breach must be distinguishable from one
  * poisoned run), and the JVM GC seconds accrued during the kernel's
  * timed runs (the round-17 driver-context divergence's prime suspect
  * is heap/GC geometry: the driver runs this JVM at SPARK_DRIVER_MEM
  * ~89g — 53.2 GiB block manager — while quiet closes used the 8g
  * default). It also re-times the bench_ann calibrator mid-suite
  * (after bench_maxscore's index build, i.e. immediately before the
  * phrase/near block that diverged) and at suite end, and records
  * heap geometry, so a hot/poisoned context is visible in the artifact
  * of record instead of requiring a post-hoc judge re-run.
  *
  * SPARK_GRAFT_BENCH_ONLY (comma-separated kernel names) restricts the
  * run — the adjudication dial for re-measuring one kernel quietly
  * without paying the whole suite (BASELINE.md bench_sort rulings).
  */
object Bench {

  private def force(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def gcSeconds(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum / 1e3
  }

  /** One kernel measurement: warm-up wall(s), timed run walls, median,
    * and GC seconds accrued across the timed runs only. */
  private final case class Timing(median: Double, runs: Seq[Double],
      warmups: Seq[Double], gcSec: Double)

  private def timeKernel(df: => DataFrame, warmups: Int = 1, runs: Int = 3): Timing = {
    val ws = (0 until warmups).map { _ =>
      val t0 = System.nanoTime()
      force(df)
      (System.nanoTime() - t0) / 1e9
    }
    val gc0 = gcSeconds()
    val ts = (0 until runs).map { _ =>
      val t0 = System.nanoTime()
      force(df)
      (System.nanoTime() - t0) / 1e9
    }
    val gc = gcSeconds() - gc0
    Timing(ts.sorted.apply(runs / 2), ts, ws, gc)
  }

  private def fmt(d: Double): String = f"$d%.4f"

  def main(args: Array[String]): Unit = {
    // Every gate/band in BASELINE.md was pinned in an 8 GiB JVM, and at
    // a large -Xmx THREE independent mechanisms move the serving
    // kernels off those bands (round-18 adjudication, each measured):
    // G1's adaptive young gen scales committed heap with Xmx; Spark's
    // unified pool scales with Xmx (big positional aggregates stop
    // spilling and expand the heap into this host's ~80 MB/s
    // page-fault service — multi-second episodic stalls); and
    // Xmx > 32 GiB drops compressed oops (+35% on the pointer-heavy
    // positional kernels even with the first two capped). A benchmark
    // that silently measures a different JVM profile than its gates is
    // not an artifact of record — so if launched with a bigger heap
    // (the driver's SPARK_DRIVER_MEM=89g), re-exec this main in a
    // fresh 8 GiB JVM with the same classpath/module flags/env.
    val launchedGiB = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    if (launchedGiB > 9.0 &&
        !sys.env.contains("SPARK_GRAFT_BENCH_NO_REEXEC")) {
      import scala.jdk.CollectionConverters._
      val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala
        .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms"))
      val javaBin = s"${System.getProperty("java.home")}/bin/java"
      val cmd = (Seq(javaBin, "-Xmx8g") ++ jvmArgs ++
        Seq("-cp", System.getProperty("java.class.path"), "graft.Bench") ++
        args).asJava
      System.err.println(f"[bench] launched at $launchedGiB%.0fg — " +
        "re-exec at the pinned 8g measurement profile " +
        "(set SPARK_GRAFT_BENCH_NO_REEXEC=1 to measure off-profile)")
      val pb = new ProcessBuilder(cmd).inheritIO()
      pb.environment().put("SPARK_GRAFT_BENCH_NO_REEXEC", "1")
      sys.exit(pb.start().waitFor())
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Second line of defense for explicit off-profile runs
    // (SPARK_GRAFT_BENCH_NO_REEXEC with a big heap): pin the unified
    // memory pool to the 8 GiB profile's ~4.6 GiB so the positional
    // aggregates keep the spill behavior the gates were measured with
    // instead of expanding the heap into the slow-fault regime. At
    // Xmx ≤ 9g this leaves the default 0.6 untouched.
    val heapB = Runtime.getRuntime.maxMemory.toDouble
    val poolPin: Option[String] =
      if (heapB <= 9.0 * 1024 * 1024 * 1024) None
      else Some(f"${4.6 * 1024 * 1024 * 1024 /
        (heapB - 300.0 * 1024 * 1024)}%.4f")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = poolPin.fold(builder)(f =>
      builder.config("spark.memory.fraction", f)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val Q = queries.Queries
    import org.apache.spark.sql.functions._
    // Serving-path kernels time the QUERY side over a standing index —
    // the index builds once (lazily, inside the first timed lambda's
    // warm-up) and every run reuses it, so a regression here is a
    // serving-path regression, not build noise.
    lazy val bm25Table = {
      val t = "bench_bm25_idx"
      operators.Retrieval.bm25Build(Tables.documents(spark, sfDir),
        "doc_id", "text", t)
      t
    }
    lazy val bm25Queries = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(operators.TextOps.tokens(lower(col("text"))),
          1, 3)).as("qtext"))
    lazy val maxScoreTable = {
      val t = "bench_ms_idx"
      // the t44 corpus: a guaranteed df=N head term appended to every
      // doc, so the threshold verification passes and the kernel times
      // the TWO-PASS PRUNED plan (on the plain corpus nothing verifies
      // at this scale and the kernel would time pass-1 + the fallback)
      operators.Retrieval.bm25Build(Tables.documents(spark, sfDir)
          .select(col("doc_id"),
            concat(col("text"), lit(" zzhead")).as("text")),
        "doc_id", "text", t)
      t
    }
    lazy val maxScoreQueries = bm25Queries.select(col("qid"),
      concat(col("qtext"), lit(" zzhead")).as("qtext"))
    lazy val phraseTable = {
      val t = "bench_phrase_idx"
      operators.Retrieval.bm25Build(Tables.documents(spark, sfDir),
        "doc_id", "text", t, positions = true)
      t
    }
    lazy val pqTable = {
      val t = "bench_pq_idx"
      // m=16: the sim9 gate floor for hash-uniform embeddings (DevPq r9)
      operators.ProductQuant.ivfPqBuild(Tables.embeddings(spark, sfDir),
        "vec_id", "embedding", t, m = 16)
      t
    }
    lazy val pqQueries = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 100 === 0)
    lazy val hybIvfTable = {
      val t = "bench_hyb_ivf"
      operators.Similarity.ivfBuild(Tables.embeddings(spark, sfDir),
        "vec_id", "embedding", t)
      t
    }
    lazy val lmTable = {
      val t = "bench_lm_idx"
      operators.LangModel.train(Tables.documents(spark, sfDir),
        "doc_id", "text", t)
      t
    }
    lazy val hybridQueries = bm25Queries.join(
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")), "qid")
    lazy val shardTables = {
      val ts = Seq("bench_shard0_idx", "bench_shard1_idx")
      val docs = Tables.documents(spark, sfDir)
      operators.Retrieval.bm25Build(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", ts.head)
      operators.Retrieval.bm25Build(docs.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", ts(1))
      ts
    }
    lazy val vecShardTables = {
      val ts = Seq("bench_vshard0_idx", "bench_vshard1_idx")
      val emb = Tables.embeddings(spark, sfDir)
      operators.Similarity.ivfBuild(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", ts.head)
      operators.Similarity.ivfBuild(emb.filter(col("vec_id") % 2 =!= 0),
        "vec_id", "embedding", ts(1))
      ts
    }
    // BASELINE.md kernels: sort O3, agg A1, grep G1, join J1, 2sort O2,
    // + tiny-job latency probe (MRBench analog) + dedup skew kernel
    // (dd4 with the hot-shingle cap active — the 100 TB skew-guard path).
    val kernels: Seq[(String, () => DataFrame)] = Seq(
      "bench_sort" -> (() => Q.o3_terasort(spark, sfDir)),
      "bench_agg" -> (() => Q.a1_wordcount(spark, sfDir)),
      "bench_grep" -> (() => Q.g1_grep(spark, sfDir)),
      "bench_join" -> (() => Q.j1_join(spark, sfDir)),
      "bench_2sort" -> (() => Q.o2_secsort(spark, sfDir)),
      "bench_dedup" -> (() => Q.dd4_ngram(spark, sfDir)),
      "bench_simhash" -> (() => Q.dd3_simhash(spark, sfDir)),
      "bench_ann" -> (() => Q.sim1_knn(spark, sfDir)),
      "bench_clean" -> (() => Q.p1_clean(spark, sfDir)),
      "bench_bm25" -> (() => operators.Retrieval.bm25Query(spark,
        bm25Table, bm25Queries, "qid", "qtext", 5)),
      // the MaxScore two-pass PRUNED plan (the t44 serving path: t44's
      // zzhead corpus + dials, under which the threshold verification
      // deterministically passes — see maxScoreTable) on the bench
      // batch; comparable to bench_bm25 modulo the appended head term
      "bench_maxscore" -> (() => operators.Retrieval.bm25QueryMaxScore(
        spark, maxScoreTable, maxScoreQueries, "qid", "qtext", 5,
        essentialDfFrac = 0.9, gateMinHeadMass = 1L,
        gateCandFrac = 1000000.0)),
      "bench_phrase" -> (() => operators.Retrieval.bm25PhraseQuery(spark,
        phraseTable, bm25Queries, "qid", "qtext", 5)),
      // NEAR proximity over the same standing positional index (order-
      // free 8-slot window cover — the t21 serving path)
      "bench_near" -> (() => operators.Retrieval.bm25ProximityQuery(spark,
        phraseTable, bm25Queries, "qid", "qtext", 5, window = 8)),
      // bigram-LM quality scoring over a standing model (the t24
      // serving path: zero-exchange count fold + per-doc micro sums)
      "bench_lm" -> (() => operators.LangModel.score(spark, lmTable,
        Tables.documents(spark, sfDir), "doc_id", "text")),
      "bench_pq" -> (() => operators.ProductQuant.ivfPqQuery(spark,
        pqTable, pqQueries, "vec_id", "embedding", 5, refineK = 50)),
      // hybrid serving: BM25 leg + IVF leg over STANDING indexes, RRF
      // fusion on the bounded candidate lists (Fusion.hybridQuery)
      "bench_hybrid" -> (() => operators.Fusion.hybridQuery(spark,
        bm25Table, hybridQueries, "qid", "qtext", "qvec", 5,
        kPerLeg = 20, vecIndex = Some(hybIvfTable))),
      // sharded BM25 serving over two standing parity-shard indexes —
      // the t32 path; expected ≈ Σ shard legs on one box (≈ 2× the
      // single-index bench_bm25; max(shard) + merge on a cluster)
      "bench_sharded" -> (() => operators.Retrieval.bm25ShardedQuery(spark,
        shardTables, bm25Queries, "qid", "qtext", 5)),
      // sharded IVF serving over two standing vec-disjoint shard
      // indexes — the sim13 path at the bench corpus (per-shard probes
      // + bounded top-k merge); expected ≈ Σ shard legs on one box
      "bench_shardedvec" -> (() => operators.Similarity.ivfShardedQuery(
        spark, vecShardTables, pqQueries, "vec_id", "embedding", 5)),
      "bench_latency" -> (() => spark.range(1).toDF("id")))

    // A crashed kernel must be LOUD: it records -1.0 (excluded from the
    // total, visibly negative in the queries map), lands in "failed",
    // and fails the process exit code — a silent drop would read as a
    // speedup.
    val selected = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .map { only =>
        // a typo'd kernel name must be LOUD too: silently dropping it
        // yields a partial run that exits 0 with a tiny total
        val unknown = only -- kernels.map(_._1).toSet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_ONLY names unknown kernels: " +
            s"${unknown.mkString(", ")} — known: " +
            kernels.map(_._1).mkString(", "))
        kernels.filter(k => only(k._1))
      }
      .getOrElse(kernels)
    // Mid-suite calibrator re-reads: the round-17 divergence hit the
    // phrase/near/hybrid block while the SUITE-HEAD calibrator read calm;
    // a calibrator sample taken right where the breach happens is the
    // missing discriminator (box/JVM state vs kernel code).
    val calibKernel: () => DataFrame = () => Q.sim1_knn(spark, sfDir)
    val calibAfter = Set("bench_maxscore", "bench_hybrid")
    val calibReads = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    // SETTLE GUARD (round 19, VERDICT r18 #7): close benches taken
    // minutes after multi-GB dev-probe JVMs read their FIRST kernel at
    // 2-3x with one run in band — host page-cache/reclaim state, not
    // code (the round-18 close read bench_sort [3.32, 1.41, 4.56]
    // while the driver's own artifact read 1.17x). Before the suite
    // counts, the calibrator must read <= 1.2x its pinned gate
    // (bench_ann = 0.422 s at sf0.1, BASELINE rounds 13-18); an
    // unsettled read waits 30 s and re-reads, up to 5 tries, and the
    // artifact records every read plus the final settled verdict — a
    // still-unsettled suite is VISIBLY marked rather than silently
    // scary. Only engages at the pinned sf0.1 profile (or an explicit
    // SPARK_GRAFT_BENCH_SETTLE_SEC gate) on full-suite runs.
    // The settle bar: explicit env override first; else a PER-HOST
    // recorded baseline (the best settled calibrator read of a prior
    // full-suite run at the same sf — written below after any settled
    // run), so a slower host self-calibrates after one run instead of
    // forever burning 5 × 30 s against one machine's pinned constant;
    // else, first-ever run at the pinned sf0.1 profile, the BASELINE.md
    // gate that profile was measured with.
    val sfTag = sfDir.split('/').last
    val settleBaselinePath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_CALIB_BASELINE",
      "/tmp/graft_bench_calib_baseline.txt")
    def recordedBaseline: Option[Double] = try {
      val p = java.nio.file.Paths.get(settleBaselinePath)
      if (!java.nio.file.Files.exists(p)) None
      else java.nio.file.Files.readString(p).trim.split("\\s+") match {
        case Array(tag, v) if tag == sfTag => Some(v.toDouble)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    val settleGate = sys.env.get("SPARK_GRAFT_BENCH_SETTLE_SEC")
      .map(_.toDouble)
      .orElse(recordedBaseline)
      .orElse(if (sfTag == "sf0.1") Some(0.422) else None)
    val settleReads = scala.collection.mutable.ArrayBuffer[Double]()
    var settled = true
    for (gate <- settleGate if selected.size > 3) {
      var tries = 0
      settled = false
      while (!settled && tries < 5) {
        val r = timeKernel(calibKernel(),
          warmups = if (tries == 0) 1 else 0).median
        settleReads += r
        settled = r <= 1.2 * gate
        tries += 1
        if (!settled && tries < 5) {
          System.err.println(f"[bench] settle: calibrator $r%.3fs > " +
            f"1.2x gate ($gate%.3fs) — host not settled, waiting 30s " +
            s"($tries/5)")
          Thread.sleep(30000)
        }
      }
      if (!settled)
        System.err.println("[bench] settle: calibrator never settled " +
          "in 5 tries — artifact records settled:false")
      // record the per-host baseline from the SETTLED read, damped
      // toward the prior record (a plain min would ratchet the bar
      // tighter on every lucky read; a plain overwrite would let one
      // barely-settled read drift it loose): the next run's bar
      // converges on this host's own steady state, not a pinned
      // constant
      if (settled) try {
        val obs = settleReads.last
        val next = recordedBaseline.fold(obs)(prev => (prev + obs) / 2.0)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(settleBaselinePath), s"$sfTag $next\n")
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    val suiteT0 = System.nanoTime()
    val detail = scala.collection.mutable.ArrayBuffer[(String, Timing, Double)]()
    val results = selected.map { case (name, mk) =>
      val at = (System.nanoTime() - suiteT0) / 1e9
      val t = try {
        val tm = timeKernel(mk())
        detail += ((name, tm, at))
        tm.median
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] KERNEL FAILED: $name — $e")
          e.printStackTrace()
          -1.0
      }
      if (calibAfter(name) && selected.size > 3) {
        // median of 3, no extra warm-up: the calibrator's standing state
        // is already hot from the suite head (or deliberately NOT, in
        // which case that is exactly the signal being measured)
        val c = try timeKernel(calibKernel(), warmups = 0).median
                catch { case _: Throwable => -1.0 }
        calibReads += ((s"after_$name", c))
      }
      name -> t
    }
    if (selected.size > 3) {
      val c = try timeKernel(calibKernel(), warmups = 0).median
              catch { case _: Throwable => -1.0 }
      calibReads += (("suite_end", c))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val runsJson = detail.map { case (k, tm, at) =>
      "\"" + k + "\":{\"warmup\":[" + tm.warmups.map(fmt).mkString(",") +
        "],\"timed\":[" + tm.runs.map(fmt).mkString(",") +
        "],\"gc_sec\":" + fmt(tm.gcSec) + ",\"at_sec\":" + fmt(at) + "}"
    }.mkString("{", ",", "}")
    val calibJson = calibReads.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val heapGib = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    // baseline_used: the settle bar this run actually compared against
    // (env override, per-host recorded baseline, or the pinned sf0.1
    // gate) — the recorded-baseline file persists across runs, so the
    // artifact must be self-describing (round 21, VERDICT r20 ask #8)
    val settleJson = "{\"reads\":[" + settleReads.map(fmt).mkString(",") +
      s"],\"settled\":$settled" +
      settleGate.fold("")(g => s""","baseline_used":${fmt(g)}""") + "}"
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","runs":$runsJson,"calibrators":$calibJson,"settle":$settleJson,"heap_max_gib":${fmt(heapGib)},"gc_total_sec":${fmt(gcSeconds())}}"""
    // stdout for humans, a file for the driver (sbt log noise makes the
    // stdout line hard to machine-parse)
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    spark.stop()
    if (results.exists(_._2 < 0)) sys.exit(1)
  }
}
