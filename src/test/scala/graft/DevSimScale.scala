package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scale probe for the similarity family (the embedding twin of
  * DevScale's document curves): generates an N-vector corpus with
  * planted near-duplicates, then measures
  *  - sim4 (`cosineNearDupPairsBlocked`): candidate count, recovered
  *    pair count vs planted, wall time;
  *  - sim5 (`ivfBuild`/`ivfQuery`): index build time, query recall@5
  *    vs brute force, query time.
  * `sbt "Test/runMain graft.DevSimScale [nVecs...]"` (default 1e5).
  *
  * Corpus: dim-64 hash-uniform vectors (no structure — the WORST case
  * for bucketing: collisions are pure chance, clusters are weak), plus
  * a copy of every 50th vector nudged by +0.05 on dimension 0
  * (cos ≈ 0.99994 — a genuine near-dup, not an identical twin).
  *
  * LSH sizing at scale: random-pair collision odds per table are
  * (1/2)^nBits, so candidates ≈ nTables·C(N,2)/2^nBits — nBits must
  * track log2(N) to keep candidates ~linear. The probe uses
  * nBits=16 at N ≥ 1e5 (vs the sf-scale default 8) and records both.
  */
object DevSimScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(100000L)
    val spark = SparkSession.builder()
      // 4 task attempts — local-fs mkdirs races under 32 concurrent
      // attempt-dir creations at the 1e7 scale (see DevIncIvf)
      .master("local[32,4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._

    // Per-stage disk accounting: at the fourth decade the failure mode
    // is disk, and "which stage wrote it" is invisible from the error
    // (the spill that HITS the wall is rarely the one that FILLED it).
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo; val m = si.taskMetrics
        val w = m.shuffleWriteMetrics.bytesWritten
        val sp = m.diskBytesSpilled
        if (w > (1L << 28) || sp > (1L << 28))
          println(f"[stage] id=${si.stageId} write=${w / 1e9}%.2fGB " +
            f"spill=${sp / 1e9}%.2fGB ${si.name.linesIterator.next()}")
        System.out.flush()
      }
    })

    val dim = 64
    sizes.foreach { n =>
      val base = spark.range(n).repartition(32).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), d =>
          pmod(xxhash64(col("id"), d), lit(1000000L)).cast("double") / 500000.0 - 1.0
        ).as("embedding"))
      val planted = base.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + n).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x + when(i === 0, 0.05).otherwise(0.0)).as("embedding"))
      val dir = s"/tmp/graft-scale/emb$n"
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        base.unionByName(planted).write.mode("overwrite").parquet(dir)
      val emb = spark.read.parquet(dir)
      val nPlanted = n / 50 + (if (n % 50 != 0) 1 else 0)

      def timed[T](body: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }

      // ---- sim4: LSH-blocked near-dup pairs ----------------------------
      // candidates ≈ nTables·C(N,2)/2^nBits, so nBits tracks log2(N):
      // 16 at 1e5, 20 at 1e6, 24 at 1e7 (measured twice: holding 16 at
      // 1e6 costs 127M candidates vs ~8M at 20; holding 20 at 1e7
      // costs 0.42 ms/doc admission checks vs 0.053 at 24 — DevIncIvf)
      val nBits = if (n >= 8000000) 24
                  else if (n >= 1000000) 20
                  else if (n >= 100000) 16 else 8
      val (nCand, tCand) = timed {
        val v = emb.select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
        val banded = v.select(col("id"),
            posexplode(graft.functions.GraftFunctions.lshSigs(
              col("vec"), nBits, 8, 42L)))
          .withColumnRenamed("pos", "table").withColumnRenamed("col", "sig")
        banded.as("a").join(banded.as("b"),
            col("a.table") === col("b.table") && col("a.sig") === col("b.sig") &&
              col("a.id") < col("b.id"))
          .select(col("a.id"), col("b.id")).distinct().count()
      }
      val pairs = Similarity.cosineNearDupPairsBlocked(emb, "vec_id", "embedding",
        0.999, nBits = nBits, nTables = 8).cache()
      val (nPairs, tPairs) = timed(pairs.count())
      val recovered = pairs
        .filter(col("idb") === col("ida") + n && col("ida") % 50 === 0).count()
      pairs.unpersist()
      println(f"[simscale] n=$n sim4 nBits=$nBits candidates=$nCand (${tCand}%.1fs) " +
        f"pairs=$nPairs recovered=$recovered/$nPlanted (${tPairs}%.1fs)")
      System.out.flush() // forked stdout is pipe-buffered; don't lose results to a crash

      // ---- sim5: persisted IVF index recall ----------------------------
      val qStep = math.max(1L, n / 100)
      val q = emb.filter(col("vec_id") % qStep === 0 && col("vec_id") < n)
      val nq = q.count()
      val table = s"ivf_scale_$n"
      val (_, tBuild) = timed {
        Similarity.ivfBuild(emb, "vec_id", "embedding", table, buckets = 32)
      }
      val (exact, tExact) = timed {
        val e = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
          .select("qid", "nid").cache()
        e.count(); e
      }
      // two-level (coarse-quantizer) build: same index contract, fewer
      // per-row cosines at assignment — recall measured at the default
      // operating point below
      val table2 = s"ivf2_scale_$n"
      val (_, tBuild2) = timed {
        Similarity.ivfBuild(emb, "vec_id", "embedding", table2, buckets = 32,
          twoLevel = true)
      }
      println(f"[simscale] n=$n sim5 twoLevel build=${tBuild2}%.1fs (flat was measured above)")
      System.out.flush()

      // operating-point sweep through the probeFrac dial: 0.5 (the
      // recall-first default), 0.25, 0.125 (the measured throughput
      // point) — the recall/cost dial on this worst-case
      // (unstructured) corpus
      val nlist = spark.table(s"${table}_cents").count().toInt
      for (frac <- Seq(0.5, 0.25, 0.125); tbl <- Seq(table, table2)) {
        val (approx, tQuery) = timed {
          val a = Similarity.ivfQuery(spark, tbl, q, "vec_id", "embedding", 5,
              probeFrac = frac)
            .select("qid", "nid").cache()
          a.count(); a
        }
        val hits = exact.join(approx, Seq("qid", "nid"))
          .groupBy("qid").agg(count(lit(1)).as("h"))
        val pass = hits.filter(col("h") >= 3).count()
        val minH = hits.agg(min("h")).head().getLong(0)
        approx.unpersist()
        val kind = if (tbl == table) "flat" else "2lvl"
        println(f"[simscale] n=$n sim5 $kind build=${tBuild}%.1fs brute=${tExact}%.1fs " +
          f"probeFrac=$frac%.3f (nlist=$nlist) query=${tQuery}%.1fs recall pass=$pass/$nq minHits=$minH")
        System.out.flush()
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
