package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.RefreshLoop

/** End-to-end probe of the STREAMING refresh loop (the composition the
  * batch probes DevInc/DevIncIvf measure piecewise): MinHash-index an
  * N-doc corpus, then drive `RefreshLoop.minhashRefresh` with
  * `nEpochs` micro-batches of N/50 docs each — half resubmissions of
  * corpus docs, half novel — with compaction every 3rd epoch. The
  * number that matters: per-epoch wall time staying flat across
  * epochs while the index grows (check O(batch), absorb O(novel),
  * plus the visible compaction spike on its cadence).
  * `sbt "Test/runMain graft.DevRefresh [nDocs] [nEpochs] [mode]"`.
  *
  * `mode` selects the twin composition (the round-15 composition
  * probe — the production loop runs every twin together and the
  * per-twin taxes measured in isolation do not automatically add):
  * document loop — `none` (admission only), `bm25`, `lm`, `all`
  * (bm25 + LM together), `shards` (bm25 + LM each routed across 2
  * shard tables — the sharded-twin tax vs `all`), `admshards` (the
  * ADMISSION index itself sharded across 2 tables — the round-16
  * indexShards tax vs `none`); vector loop — `pq` (LSH admission +
  * IVFPQ), `allvec` (LSH + IVF + IVFPQ together), `vecshards` (IVF +
  * IVFPQ each routed across 2 shard tables).
  */
object DevRefresh {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val nEpochs = if (args.length > 1) args(1).toInt else 5
    val mode = if (args.length > 2) args(2) else "none"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    if (mode == "pq" || mode == "allvec" || mode == "vecshards") {
      pqMain(spark, n, nEpochs, mode); return
    }
    import spark.implicits._

    val dir = s"/tmp/graft-scale/docs$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      graft.sources.Generators.randomText(spark, n, seed = 11L,
          wordsMin = 30, wordsMax = 80, partitions = 32)
        .select(col("id").as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(dir)
    }
    val corpus = spark.read.parquet(dir).select("doc_id", "text")
      .filter(col("doc_id") < n) // DevScale corpora carry planted extras

    val table = s"devrefresh_${n}_$mode"
    val t0 = System.nanoTime()
    // admshards: the ADMISSION index itself sharded (round-16
    // indexShards) — `table` anchors only the ledger; the tax vs
    // `none` is the sharded-check + routed-absorb overhead
    val indexShards = if (mode == "admshards") {
      val sh = (0 until 2).map { i =>
        val t = s"${table}_adm$i"
        Dedup.minhashIndexBuild(
          corpus.filter(RefreshLoop.shardOf(col("doc_id"), 2) === i),
          "text", "doc_id", t, buckets = 32)
        t
      }
      Some(sh)
    } else {
      Dedup.minhashIndexBuild(corpus, "text", "doc_id", table, buckets = 32)
      None
    }
    println(f"[refresh] n=$n mode=$mode build=${(System.nanoTime() - t0) / 1e9}%.1fs")
    System.out.flush()

    val batchSize = n / 50
    val resub = corpus.filter(col("doc_id") % 100 === 0)
      .limit((batchSize / 2).toInt)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    @volatile var lastDups = 0L
    @volatile var lastNovel = 0L
    // twin selection: the bigram-LM and/or BM25 twins ride the loop
    // (LangModel.append / Retrieval.bm25Append per epoch under the same
    // ledger) — `lm`/`bm25` measure each absorb's epoch tax alone,
    // `all` the production composition
    val lmTable = if (mode == "lm" || mode == "all") {
      val t = s"${table}_lm"
      val t0 = System.nanoTime()
      graft.operators.LangModel.train(corpus, "doc_id", "text", t,
        buckets = 32)
      println(f"[refresh] n=$n lmTrain=${(System.nanoTime() - t0) / 1e9}%.1fs")
      System.out.flush()
      Some(t)
    } else None
    val bm25Table = if (mode == "bm25" || mode == "all") {
      val t = s"${table}_bm"
      val t0 = System.nanoTime()
      graft.operators.Retrieval.bm25Build(corpus, "doc_id", "text", t,
        buckets = 32)
      println(f"[refresh] n=$n bm25Build=${(System.nanoTime() - t0) / 1e9}%.1fs")
      System.out.flush()
      Some(t)
    } else None
    // mode = shards: the round-15 sharded serving twins — the same
    // bm25 + LM absorb mass as `all`, but routed across 2 shard tables
    // each; the delta vs `all` is the sharded-twin routing tax
    val (bm25Shards, lmShards) = if (mode == "shards") {
      val t0 = System.nanoTime()
      val bs = (0 until 2).map { i =>
        val t = s"${table}_bm$i"
        graft.operators.Retrieval.bm25Build(
          corpus.filter(RefreshLoop.shardOf(col("doc_id"), 2) === i),
          "doc_id", "text", t, buckets = 32)
        t
      }
      val ls = (0 until 2).map { i =>
        val t = s"${table}_lm$i"
        graft.operators.LangModel.train(
          corpus.filter(RefreshLoop.shardOf(col("doc_id"), 2) === i),
          "doc_id", "text", t, buckets = 32)
        t
      }
      println(f"[refresh] n=$n shardBuilds(2bm+2lm)=${(System.nanoTime() - t0) / 1e9}%.1fs")
      System.out.flush()
      (Some(bs), Some(ls))
    } else (None, None)
    val q = RefreshLoop.minhashRefresh(
        ms.toDF().toDF("doc_id", "text"), table,
        "text", "doc_id", bm25Table = bm25Table, lmTable = lmTable,
        compactEvery = 3, bm25Shards = bm25Shards, lmShards = lmShards,
        indexShards = indexShards) {
      (dups, novel, _) =>
      lastDups = dups.select("batch_id").distinct().count()
      lastNovel = novel.count()
    }.start()

    try {
      for (e <- 1 to nEpochs) {
        // novel half: REVERSED generator docs over per-epoch disjoint id
        // slices. Reversal makes the 3-shingle set disjoint from every
        // forward corpus doc (randomText's doc universe is keyed by
        // mix(seed ^ i), so a different seed only PERMUTES the same
        // docs — seed alone does not give novel text); disjoint slices
        // keep epochs from colliding with each other's absorbed docs.
        val half = (batchSize / 2).toInt
        val novelDocs = graft.sources.Generators.randomText(spark,
            half.toLong * (e + 1), seed = 777L, wordsMin = 30, wordsMax = 80,
            partitions = 8)
          .filter(col("id") >= half.toLong * e)
          .select((col("id") + n * 10).as("doc_id"),
            array_join(reverse(split(col("text"), " ")), " ").as("text"))
          .as[(Long, String)].collect()
        val resubEpoch = resub.map { case (id, t) => (id + n * (100 + e), t) }
        val te = System.nanoTime()
        ms.addData(resubEpoch.toSeq ++ novelDocs.toSeq)
        q.processAllAvailable()
        val sec = (System.nanoTime() - te) / 1e9
        val compacted = if (e % 3 == 0) " (compacted)" else ""
        println(f"[refresh] n=$n mode=$mode epoch=$e batch=${resubEpoch.length + novelDocs.length} " +
          f"dupDocs=$lastDups novel=$lastNovel ${sec}%.1fs$compacted")
        System.out.flush()
      }
    } finally q.stop()
    spark.stop()
  }

  /** The IVFPQ-twin leg (`pqTable=` on the embedding loop): LSH-index
    * an N-vector corpus + a standing [[graft.operators.ProductQuant
    * .ivfPqBuild]] serving index, then drive
    * `RefreshLoop.embeddingBatch` with `nEpochs` micro-batches of N/50
    * vectors — half resubmissions (dups), half novel in-distribution
    * draws. Numbers that matter: per-epoch wall FLAT as both indexes
    * grow (the minhash loop's 0.12–0.15 ms/doc standard), and the
    * drift signal QUIESCENT on in-distribution batches (printed per
    * epoch from a post-epoch probe).
    * `sbt "Test/runMain graft.DevRefresh [n] [epochs] pq"`; `allvec`
    * additionally rides a standing IVF serving index
    * ([[graft.operators.Similarity.ivfAppend]]) on the same epochs —
    * the vector loop's full production composition; `vecshards` rides
    * the same IVF + IVFPQ absorb mass but routed across 2 shard tables
    * each (the round-16 sharded vector twins) — the delta vs `allvec`
    * is the sharded-vector routing tax.
    */
  private def pqMain(spark: SparkSession, n: Long, nEpochs: Int,
                     mode: String): Unit = {
    import spark.implicits._
    import graft.operators.{ProductQuant, Similarity}
    val withIvf = mode == "allvec"
    val sharded = mode == "vecshards"
    val dim = 64
    def vecs(ids: org.apache.spark.sql.DataFrame, seed: Long) =
      ids.select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)), d =>
          pmod(xxhash64(col("id"), d, lit(seed)), lit(1000000L))
            .cast("double") / 500000.0 - 1.0).as("embedding"))

    val corpus = vecs(spark.range(n).repartition(32).toDF("id"), 1L)
      .select(col("id").as("vec_id"), col("embedding"))
    val table = s"devpqrefresh_${n}_$mode"
    val pq = s"${table}_pq"
    // nBits ≈ log2(N) — the LSH admission index's documented sizing
    // contract (Similarity.lshIndexBuild scaladoc). The default 16 at
    // N=1e7 leaves ~150 corpus vectors per bucket per table, and the
    // dedup-check candidate join OOMs an 8 GiB heap on ~2·10⁸ pairs;
    // at log2(N) bits occupancy stays O(10) per bucket at every decade.
    val bits = math.max(16, (math.log(n.toDouble) / math.log(2)).ceil.toInt)
    var t0 = System.nanoTime()
    Similarity.lshIndexBuild(corpus, "vec_id", "embedding", table,
      nBits = bits, buckets = 32)
    val tLsh = (System.nanoTime() - t0) / 1e9
    // vecshards: the same IVF + IVFPQ absorb mass as allvec, but the
    // standing serving indexes are 2 doc-disjoint shards per family,
    // routed by the loop's own shardOf
    val (pqSingle, pqShards) = if (sharded) {
      t0 = System.nanoTime()
      val ps = (0 until 2).map { i =>
        val t = s"${pq}$i"
        ProductQuant.ivfPqBuild(
          corpus.filter(graft.streaming.RefreshLoop.shardOf(
            col("vec_id"), 2) === i),
          "vec_id", "embedding", t, m = 8, buckets = 32)
        t
      }
      println(f"[pqrefresh] n=$n pqShardBuilds(2)=${(System.nanoTime() - t0) / 1e9}%.1fs")
      (None, Some(ps))
    } else {
      t0 = System.nanoTime()
      ProductQuant.ivfPqBuild(corpus, "vec_id", "embedding", pq, m = 8,
        buckets = 32)
      println(f"[pqrefresh] n=$n pqBuild=${(System.nanoTime() - t0) / 1e9}%.1fs")
      (Some(pq), None)
    }
    // allvec: a standing IVF serving index rides the same epochs;
    // vecshards: two IVF shard indexes do
    val (ivf, ivfShards) = if (sharded) {
      t0 = System.nanoTime()
      val is = (0 until 2).map { i =>
        val t = s"${table}_ivf$i"
        Similarity.ivfBuild(
          corpus.filter(graft.streaming.RefreshLoop.shardOf(
            col("vec_id"), 2) === i),
          "vec_id", "embedding", t, buckets = 32)
        t
      }
      println(f"[pqrefresh] n=$n ivfShardBuilds(2)=${(System.nanoTime() - t0) / 1e9}%.1fs")
      (None, Some(is))
    } else if (withIvf) {
      val t = s"${table}_ivf"
      t0 = System.nanoTime()
      Similarity.ivfBuild(corpus, "vec_id", "embedding", t, buckets = 32)
      println(f"[pqrefresh] n=$n ivfBuild=${(System.nanoTime() - t0) / 1e9}%.1fs")
      (Some(t), None)
    } else (None, None)
    println(f"[pqrefresh] n=$n nBits=$bits lshBuild=${tLsh}%.1fs")
    System.out.flush()

    val batchSize = (n / 50).toInt
    @volatile var lastDups = 0L
    @volatile var lastNovel = 0L
    val fn = graft.streaming.RefreshLoop.embeddingBatch(table,
        "vec_id", "embedding", nBits = bits, ivfTable = ivf,
        pqTable = pqSingle, compactEvery = 3,
        ivfShards = ivfShards, pqShards = pqShards) { (dups, novel, _) =>
      lastDups = dups.select("batch_id").distinct().count()
      lastNovel = novel.count()
    }
    for (e <- 1 to nEpochs) {
      // resub half: standing corpus vectors under fresh ids (exact
      // dups — must route dup); novel half: fresh in-distribution
      // draws over per-epoch disjoint id slices (must route novel and
      // leave the drift signal quiescent)
      val half = batchSize / 2
      val resub = vecs(spark.range(half).repartition(8)
          .select((col("id") * 97 % n).as("id")), 1L)
        .select((col("id") + n * (100 + e)).as("vec_id"), col("embedding"))
      val novelB = vecs(spark.range(half.toLong * e, half.toLong * (e + 1))
          .repartition(8).toDF("id"), 2L)
        .select((col("id") + n * 10).as("vec_id"), col("embedding"))
      val batch = resub.unionByName(novelB).localCheckpoint()
      val te = System.nanoTime()
      fn(batch, e.toLong)
      val sec = (System.nanoTime() - te) / 1e9
      // drift probe: the signal the epoch computed, reproduced from the
      // standing stats vs a fresh in-distribution sample's assignment
      // (shard 0's reference in sharded mode)
      val statsT = pqSingle.map(t => s"${t}_stats")
        .getOrElse(s"${pqShards.get.head}_stats")
      spark.catalog.refreshTable(statsT)
      val buildMean = spark.table(statsT).head().getDouble(1)
      val compacted = if (e % 3 == 0) " (compacted)" else ""
      println(f"[pqrefresh] n=$n epoch=$e batch=$batchSize " +
        f"dupVecs=$lastDups novel=$lastNovel buildMean=$buildMean%.4f " +
        f"${sec}%.1fs$compacted")
      System.out.flush()
    }
    // drift-signal check: one explicit in-distribution append probe
    // (against shard 0 in sharded mode)
    val probe = vecs(spark.range(n * 20, n * 20 + 200).repartition(4)
        .toDF("id"), 3L)
      .select(col("id").as("vec_id"), col("embedding"))
    val st = ProductQuant.ivfPqAppend(spark,
      pqSingle.getOrElse(pqShards.get.head), probe, "vec_id",
      "embedding")
    println(f"[pqrefresh] drift probe: batchMean=${st.batchMeanTop1Cos}%.4f " +
      f"buildMean=${st.buildMeanTop1Cos}%.4f drifted=${st.drifted}")
    System.out.flush()
    spark.stop()
  }
}
