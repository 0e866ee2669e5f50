package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Fusion, LangModel, ProductQuant, Retrieval, Similarity}

/** Cost-shape probe for the round-15 sharded VECTOR / LM / HYBRID
  * serving family (the [[DevSharded]] lexical probe's second pass):
  * exactness is proven at spec/oracle scale (SimilaritySpec sharded
  * cases, sim12-14 / t35 / t36 gates); this measures the per-shard
  * flatness claim at two shards × N — per-shard build and serving cost
  * must match the single-index band (≈ the cluster story: shards are
  * executor groups, wall-clock ≈ max(shard) + a k-per-shard merge),
  * and the one-box readings show the Σ a single JVM pays.
  * `sbt "Test/runMain graft.DevShardedVec [nPerShard]"` (default 1e6).
  */
object DevShardedVec {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    // skipWhole: at the 1e7/shard decade the whole-2N comparators double
    // the run and the single-index bands are already in BASELINE.md —
    // the per-shard legs ARE the 1e7 comparator.
    val skipWhole = args.contains("skipWhole")
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
    val dim = 64

    // ---- vector corpus: two vec-disjoint hash-uniform shards --------
    def gen(seedOff: Long, idOff: Long) =
      spark.range(n).repartition(32)
        .select((col("id") + idOff).as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)), d =>
            pmod(xxhash64(col("id") + idOff, d + seedOff), lit(1000000L))
              .cast("double") / 500000.0 - 1.0).as("embedding"))
    val dirA = s"/tmp/graft-scale/sembA$n"
    val dirB = s"/tmp/graft-scale/sembB$n"
    if (!new java.io.File(s"$dirA/_SUCCESS").exists())
      gen(0L, 0L).write.mode("overwrite").parquet(dirA)
    if (!new java.io.File(s"$dirB/_SUCCESS").exists())
      gen(7L, n).write.mode("overwrite").parquet(dirB)
    val embA = spark.read.parquet(dirA)
    val embB = spark.read.parquet(dirB)
    val emb = embA.unionByName(embB)
    val queries = embA.filter(col("vec_id") % (n / 50) === 0)
      .localCheckpoint()
    val nq = queries.count()
    println(s"[svec] n/shard=$n shards=2 queries=$nq dim=$dim")
    System.out.flush()

    // ---- sharded IVF: per-shard builds + sharded serving -------------
    val (ivfA, ivfB, ivfW) = (s"dsv_ivf_a_$n", s"dsv_ivf_b_$n", s"dsv_ivf_w_$n")
    val (_, bA) = timed(Similarity.ivfBuild(embA, "vec_id", "embedding", ivfA,
      buckets = 32))
    val (_, bB) = timed(Similarity.ivfBuild(embB, "vec_id", "embedding", ivfB,
      buckets = 32))
    val bW = if (skipWhole) -1.0 else
      timed(Similarity.ivfBuild(emb, "vec_id", "embedding", ivfW,
        buckets = 32))._2
    println(f"[svec] ivf build: shardA=$bA%.1fs shardB=$bB%.1fs whole2N=$bW%.1fs")
    System.out.flush()
    for (pf <- Seq(0.5, 0.125)) {
      val (cS, tS) = timed(Similarity.ivfShardedQuery(spark, Seq(ivfA, ivfB),
        queries, "vec_id", "embedding", 10, probeFrac = pf).count())
      val (cW, tW) = if (skipWhole) (-1L, -1.0) else
        timed(Similarity.ivfQuery(spark, ivfW,
          queries, "vec_id", "embedding", 10, probeFrac = pf).count())
      println(f"[svec] ivf serve pf=$pf: sharded=$tS%.1fs (${tS * 1000 / nq}%.0f ms/q, $cS rows) " +
        f"whole2N=$tW%.1fs (${tW * 1000 / nq}%.0f ms/q, $cW rows)")
      System.out.flush()
    }

    // ---- sharded IVFPQ ------------------------------------------------
    val (pqA, pqB, pqW) = (s"dsv_pq_a_$n", s"dsv_pq_b_$n", s"dsv_pq_w_$n")
    val (_, pbA) = timed(ProductQuant.ivfPqBuild(embA, "vec_id", "embedding",
      pqA, m = 16, buckets = 32))
    val (_, pbB) = timed(ProductQuant.ivfPqBuild(embB, "vec_id", "embedding",
      pqB, m = 16, buckets = 32))
    val pbW = if (skipWhole) -1.0 else
      timed(ProductQuant.ivfPqBuild(emb, "vec_id", "embedding",
        pqW, m = 16, buckets = 32))._2
    println(f"[svec] pq build: shardA=$pbA%.1fs shardB=$pbB%.1fs whole2N=$pbW%.1fs")
    System.out.flush()
    val (pcS, ptS) = timed(ProductQuant.ivfPqShardedQuery(spark, Seq(pqA, pqB),
      queries, "vec_id", "embedding", 10, probeFrac = 0.125, refineK = 50)
      .count())
    val (pcW, ptW) = if (skipWhole) (-1L, -1.0) else
      timed(ProductQuant.ivfPqQuery(spark, pqW,
        queries, "vec_id", "embedding", 10, probeFrac = 0.125, refineK = 50)
        .count())
    println(f"[svec] pq serve pf=0.125 refine=50: sharded=$ptS%.1fs " +
      f"(${ptS * 1000 / nq}%.0f ms/q, $pcS rows) whole2N=$ptW%.1fs " +
      f"(${ptW * 1000 / nq}%.0f ms/q, $pcW rows)")
    System.out.flush()

    // ---- sharded LM: shard-parallel trains, sharded scoring ----------
    val dirDa = s"/tmp/graft-scale/zdocs$n"
    if (!new java.io.File(s"$dirDa/_SUCCESS").exists())
      sources.Generators.zipfText(spark, n, seed = 11L, partitions = 32)
        .select(col("id").as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(dirDa)
    val dirDb = s"/tmp/graft-scale/zdocsB$n"
    if (!new java.io.File(s"$dirDb/_SUCCESS").exists())
      sources.Generators.zipfText(spark, n, seed = 13L, partitions = 32)
        .select((col("id") + n).as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(dirDb)
    val docsA = spark.read.parquet(dirDa)
    val docsB = spark.read.parquet(dirDb)
    val (lmA, lmB, lmW) = (s"dsv_lm_a_$n", s"dsv_lm_b_$n", s"dsv_lm_w_$n")
    val (_, lA) = timed(LangModel.train(docsA, "doc_id", "text", lmA,
      buckets = 32))
    val (_, lB) = timed(LangModel.train(docsB, "doc_id", "text", lmB,
      buckets = 32))
    val lW = if (skipWhole) -1.0 else
      timed(LangModel.train(docsA.unionByName(docsB),
        "doc_id", "text", lmW, buckets = 32))._2
    println(f"[svec] lm train: shardA=$lA%.1fs shardB=$lB%.1fs whole2N=$lW%.1fs")
    System.out.flush()
    val batch = docsA.filter(col("doc_id") % (n / 100) === 0).localCheckpoint()
    val nb = batch.count()
    val (csS, tsS) = timed(LangModel.scoreSharded(spark, Seq(lmA, lmB),
      batch, "doc_id", "text").agg(sum("logp_micro")).head().getLong(0))
    val (csW, tsW) = if (skipWhole) (csS, -1.0) else
      timed(LangModel.score(spark, lmW,
        batch, "doc_id", "text").agg(sum("logp_micro")).head().getLong(0))
    println(f"[svec] lm score $nb-doc batch: sharded=$tsS%.1fs whole2N=$tsW%.1fs " +
      (if (skipWhole) s"(sum $csS; identity proven at gate scale)"
       else s"identical=${csS == csW} (sum $csS vs $csW)"))
    System.out.flush()

    // ---- sharded hybrid: both legs sharded vs both legs whole --------
    val (bmA, bmB, bmW) = (s"dsv_bm_a_$n", s"dsv_bm_b_$n", s"dsv_bm_w_$n")
    val (_, hbA) = timed(Retrieval.bm25Build(docsA, "doc_id", "text", bmA,
      buckets = 32))
    val (_, hbB) = timed(Retrieval.bm25Build(docsB, "doc_id", "text", bmB,
      buckets = 32))
    val hbW = if (skipWhole) -1.0 else
      timed(Retrieval.bm25Build(docsA.unionByName(docsB),
        "doc_id", "text", bmW, buckets = 32))._2
    println(f"[svec] bm25 build: shardA=$hbA%.1fs shardB=$hbB%.1fs whole2N=$hbW%.1fs")
    System.out.flush()
    val hq = docsA.filter(col("doc_id") % (n / 20) === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(operators.TextOps.tokens(lower(col("text"))),
          1, 3)).as("qtext"))
      .join(emb.select(col("vec_id").as("qid"),
        col("embedding").as("qvec")), "qid")
      .localCheckpoint()
    val nhq = hq.count()
    val (hcS, htS) = timed(Fusion.hybridShardedQuery(spark, Seq(bmA, bmB),
      hq, "qid", "qtext", "qvec", 10, kPerLeg = 20,
      vecIndexes = Some(Seq(ivfA, ivfB)), probeFrac = 0.125).count())
    val (hcW, htW) = if (skipWhole) (-1L, -1.0) else
      timed(Fusion.hybridQuery(spark, bmW,
        hq, "qid", "qtext", "qvec", 10, kPerLeg = 20,
        vecIndex = Some(ivfW), probeFrac = 0.125).count())
    println(f"[svec] hybrid serve ($nhq q): sharded=$htS%.1fs " +
      f"(${htS * 1000 / nhq}%.0f ms/q, $hcS rows) whole2N=$htW%.1fs " +
      f"(${htW * 1000 / nhq}%.0f ms/q, $hcW rows)")
    System.out.flush()
    spark.stop()
  }
}
