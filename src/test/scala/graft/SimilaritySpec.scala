package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("cosine_sim native expression computes exact cosine") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0)),
                 (Array(1.0, 1.0), Array(1.0, 1.0)),
                 (Array(1.0, 2.0), Array(2.0, 4.0)),
                 (Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    val r = df.select(GraftFunctions.cosineSim(col("a"), col("b"))).as[Double].collect()
    assert(r(0) == 0.0)
    assert(math.abs(r(1) - 1.0) < 1e-15)
    assert(math.abs(r(2) - 1.0) < 1e-15)
    assert(r(3) == 0.0) // zero-norm guard
  }

  test("hamming_dist popcounts the xor") {
    GraftFunctions.ensureRegistered(spark)
    val r = Seq((0L, -1L), (5L, 1L), (7L, 7L)).toDF("a", "b")
      .select(GraftFunctions.hamming(col("a"), col("b"))).as[Int].collect().toSeq
    assert(r == Seq(64, 1, 0))
  }

  test("bruteForceTopK ranks by cosine, excludes self, respects k") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 0.05f))).toDF("id", "v")
    val q = vecs.filter(col("id") === 0L)
    val r = Similarity.bruteForceTopK(vecs, q, "id", "v", 2)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(r.map(_._2) == Seq(3L, 1L)) // 3 closer than 1; 2 orthogonal; self excluded
  }

  test("lshTopK returns only true-cosine-ranked candidates from buckets") {
    val n = 50
    val vecs = (0 until n).map { i =>
      val ang = i * math.Pi / n
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat, 0.1f, 0.2f))
    }.toDF("id", "v")
    val q = vecs.filter(col("id") === 0L)
    val r = Similarity.lshTopK(vecs, q, "id", "v", 5)
      .select("qid", "nid", "cos", "rank").as[(Long, Long, Double, Int)].collect().toSeq
    assert(r.nonEmpty && r.forall(_._1 == 0L))
    // ranks are contiguous from 1 and cosines non-increasing
    val sorted = r.sortBy(_._4)
    assert(sorted.map(_._4) == (1 to sorted.size))
    assert(sorted.map(_._3).sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
  }

  test("lsh_sigs kernel: deterministic, dim-agnostic, nTables signatures") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((1L, Array.tabulate(768)(i => math.sin(i + 1))),
                 (2L, Array.tabulate(768)(i => math.sin(i + 1))),
                 (3L, Array.tabulate(768)(i => math.cos(i * 3 + 2)))).toDF("id", "v")
    val sigs = df.select(col("id"),
        GraftFunctions.lshSigs(col("v"), 16, 4, 42L).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L).size == 4)
    assert(sigs(1L) == sigs(2L))       // identical vectors → identical sigs
    assert(sigs(1L) != sigs(3L))       // different vectors diverge
    assert(sigs(1L).forall(s => s >= 0 && s < (1L << 16)))
    // determinism across evaluations
    val again = df.select(GraftFunctions.lshSigs(col("v"), 16, 4, 42L))
      .as[Seq[Long]].collect()
    assert(again.toSet == sigs.values.toSet)
  }

  test("ivfTopK: probing all lists reproduces exact top-k") {
    val n = 60
    val vecs = (0 until n).map { i =>
      val ang = i * math.Pi / n
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat))
    }.toDF("id", "v")
    val q = vecs.filter(col("id") === 7L)
    val exact = Similarity.bruteForceTopK(vecs, q, "id", "v", 5)
      .select("nid", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    val ivf = Similarity.ivfTopK(vecs, q, "id", "v", 5, nlist = 4, nprobe = 4)
      .select("nid", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(ivf == exact) // nprobe = nlist → no pruning → identical
  }

  test("ivfTopK: partial probe returns ranked subset of corpus") {
    val vecs = (0 until 100).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat)))
      .toDF("id", "v")
    val q = vecs.filter(col("id") < 3L)
    val r = Similarity.ivfTopK(vecs, q, "id", "v", 5, nlist = 10, nprobe = 3)
      .select("qid", "nid", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(r.nonEmpty)
    r.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4) == (1 to sorted.size))
      assert(sorted.map(_._3).sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true })
    }
  }

  test("ivfTopKAuto: second-scale recall gate (sf0.1) — params derived from N") {
    // The CORRECTNESS gate runs sim3 at sf0.01; this pins the SECOND
    // scale factor so size-derived parameters (nlist=⌈√N⌉, nprobe=
    // ⌈nlist/2⌉, nassign=2) are re-validated whenever N grows — the
    // round-2 failure mode was a fixed nlist=16 whose recall collapsed
    // one scale factor up.
    val sf = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("qid", "nid")
    val approx = Similarity.ivfTopKAuto(emb, q, "vec_id", "embedding", 5)
      .select("qid", "nid")
    val hits = exact.join(approx, Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("h"))
      .as[(Long, Long)].collect().toMap
    val nq = q.count()
    assert(hits.size.toLong == nq, s"queries with ≥1 hit: ${hits.size} of $nq")
    assert(hits.values.forall(_ >= 3),
      s"recall@5 < 3/5 for qids ${hits.filter(_._2 < 3).keys.toSeq.sorted}")
  }

  test("lshTopK: second-scale recall gate (sf0.1) at the sim2 parameters") {
    // sim2's gate runs at sf0.01; this pins nBits=4/nTables=24 at the
    // next scale factor (measured minHits=4/5 there — DevLsh probe), so
    // index-parameter rot at a larger N fails a test first.
    val sf = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("qid", "nid")
    val approx = Similarity.lshTopK(emb, q, "vec_id", "embedding", 5,
      nBits = 4, nTables = 24).select("qid", "nid")
    val hits = exact.join(approx, Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hits.size.toLong == q.count())
    assert(hits.values.forall(_ >= 3),
      s"recall@5 < 3/5 for qids ${hits.filter(_._2 < 3).keys.toSeq.sorted}")
  }

  test("ivf_top_cents kernel matches the compositional sort, both regimes") {
    GraftFunctions.ensureRegistered(spark)
    // 40 vectors scored against 37 centroids (includes duplicated
    // centroid vectors → cosine TIES, exercising the cid tie-break)
    val vecs = spark.range(40).select(col("id"),
      transform(sequence(lit(0), lit(7)), d =>
        pmod(xxhash64(col("id"), d), lit(1000)).cast("double") / 500.0 - 1.0).as("v"))
    val cents = spark.range(37).select(col("id").as("cid"),
      transform(sequence(lit(0), lit(7)), d =>
        pmod(xxhash64(col("id") % 30, d, lit(7L)), lit(1000)).cast("double") / 500.0 - 1.0)
        .as("cvec"))
    val arr = cents.agg(collect_list(struct(col("cid"), col("cvec"))).as("cs"))
    // n=2 exercises the insertion top-n path, n=20 the sort path
    for (n <- Seq(2, 20)) {
      val got = vecs.crossJoin(broadcast(arr))
        .select(col("id"), GraftFunctions.ivfTopCents(col("v"), col("cs"), n).as("top"))
      val expect = vecs.crossJoin(broadcast(arr))
        .select(col("id"),
          slice(array_sort(transform(col("cs"), ct =>
            struct((-GraftFunctions.cosineSim(col("v"), ct("cvec"))).as("ncs"),
              ct("cid").as("cid")))), 1, n).as("sorted"))
        .select(col("id"), transform(col("sorted"), t => t("cid")).as("top"))
      assert(got.as[(Long, Seq[Long])].collect().toMap ==
        expect.as[(Long, Seq[Long])].collect().toMap)
    }
  }

  test("two-level assignment: exhaustive supers equals flat; default recalls dups") {
    GraftFunctions.ensureRegistered(spark)
    val corpus = spark.range(400).select(col("id").as("nid"),
      transform(sequence(lit(0), lit(15)), d =>
        pmod(xxhash64(col("id"), d), lit(1000)).cast("double") / 500.0 - 1.0).as("nvec"))
    val cents = Similarity.seedCentroids(corpus, 20, 400, 42L)
    val flat = Similarity.assignLists(corpus, cents, 2)
      .select("cid", "nid").as[(Long, Long)].collect().toSet
    // nsup ≥ super count (⌈√20⌉ = 5) ⇒ every super is probed ⇒ EXACTLY
    // the flat ranking
    val exhaustive = Similarity.assignListsTwoLevel(corpus, cents, 2, nsup = 20)
      .select("cid", "nid").as[(Long, Long)].collect().toSet
    assert(exhaustive == flat)
    // default nsup: approximate, but every vector still gets nassign
    // lists, and a vector IS its own best match — identical planted
    // copies land in the same top list as their source
    val twoLvl = Similarity.assignListsTwoLevel(corpus, cents, 2)
      .select("cid", "nid").as[(Long, Long)].collect()
    assert(twoLvl.groupBy(_._2).forall(_._2.length == 2))
    val dup = corpus.filter(col("nid") < 20)
      .select((col("nid") + 1000).as("nid"), col("nvec"))
    val both = Similarity.assignListsTwoLevel(corpus.unionByName(dup), cents, 2)
      .select("cid", "nid").as[(Long, Long)].collect()
    val byVec = both.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSet }
    (0L until 20L).foreach { i =>
      assert(byVec(i) == byVec(i + 1000), s"planted copy of $i diverged")
    }
  }

  test("GraftExtensions: config-injected functions resolve in plain SQL") {
    import org.apache.spark.sql.SparkSession
    val shared = spark // force shared context to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // new session over the SAME context, functions injected via the
      // extensions hook — the spark.sql.extensions deployment path
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne shared)
      val r = s2.sql(
        """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
          |  hamming_dist(0L, 7L) AS h, simhash64(array(5L)) AS s,
          |  size(word_shingles(array('a','b','c'), 2)) AS w
          |""".stripMargin).head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getInt(1) == 3)
      assert(r.getLong(2) == 5L) // single hash → sig = the hash's bits
      assert(r.getInt(3) == 2)
      // do NOT s2.stop() — it would stop the shared SparkContext
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("ivfBuild/ivfQuery: persisted index answers match the inline path") {
    val vecs = (0 until 100).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat)))
      .toDF("id", "v")
    val q = vecs.filter(col("id") < 3L)
    Similarity.ivfBuild(vecs, "id", "v", "ivf_spec_idx", nlist = 10, nassign = 2)
    val fromIndex = Similarity.ivfQuery(spark, "ivf_spec_idx", q, "id", "v", 5,
        nprobe = 3)
      .select("qid", "nid", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val inline = Similarity.ivfTopK(vecs, q, "id", "v", 5,
        nlist = 10, nprobe = 3, nassign = 2)
      .select("qid", "nid", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(fromIndex == inline)
    // the index side of the probe join reads the bucketed table — its
    // rows carry the same (cid, nid) assignment the inline path built
    val idx = spark.table("ivf_spec_idx")
    assert(idx.columns.toSeq == Seq("cid", "nid", "nvec"))
    assert(idx.count() == 200) // 100 vectors × nassign 2
  }

  test("ivfAppend: grown index answers identically to a whole-built one") {
    val vecs = (0 until 100).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat)))
      .toDF("id", "v")
    val q = vecs.filter(col("id") < 3L)
    // whole-built reference; grown = build on evens with the SAME
    // centroid universe (seeded from evens), then append odds
    Similarity.ivfBuild(vecs.filter(col("id") % 2 === 0), "id", "v",
      "ivfa_whole", nlist = 10, nassign = 2)
    Similarity.ivfAppend(spark, "ivfa_whole", vecs.filter(col("id") % 2 === 1),
      "id", "v")
    // append assigns against the persisted centroids, so the grown
    // lists must equal assigning the FULL corpus against them in one go
    val cents = spark.table("ivfa_whole_cents")
    val expect = Similarity.assignLists(
        vecs.select(col("id").as("nid"), col("v").cast("array<double>").as("nvec")),
        cents, nassign = 2)
      .select("cid", "nid").as[(Long, Long)].collect().toSet
    val got = spark.table("ivfa_whole").select("cid", "nid")
      .as[(Long, Long)].collect().toSet
    assert(got == expect, "grown lists diverged from one-shot assignment")
    assert(spark.table("ivfa_whole").count() == 200) // 100 vectors × nassign 2
    // queries reach vectors that only exist through the APPEND
    val res = Similarity.ivfQuery(spark, "ivfa_whole", q, "id", "v", 5,
        nprobe = 10)
      .select("nid").as[Long].collect()
    assert(res.exists(_ % 2 == 1), "appended (odd) vectors never surfaced")
  }

  test("ivf drift signal: matched batch quiet, orthogonal batch fires, retrain restores") {
    // build corpus lives entirely in dims 0-3; the drifted batch in
    // dims 4-7 — orthogonal to every trained centroid, the regime where
    // frozen-centroid assignment decorrelates from similarity
    def lowVec(i: Int): Array[Float] =
      Array.tabulate(8)(d => if (d < 4) math.sin(i * 0.7 + d).toFloat else 0.0f)
    def highVec(i: Int): Array[Float] =
      Array.tabulate(8)(d => if (d >= 4) math.cos(i * 0.9 + d).toFloat else 0.0f)
    val corpus = (0 until 200).map(i => (i.toLong, lowVec(i))).toDF("id", "v")
    Similarity.ivfBuild(corpus, "id", "v", "ivfd_idx", nlist = 12, nassign = 2)
    val buildMean = spark.table("ivfd_idx_stats").head().getDouble(1)
    assert(spark.table("ivfd_idx_stats").head().getLong(0) == 200)
    assert(buildMean > 0.5, s"build-time top-1 cosine unexpectedly low: $buildMean")

    // a batch from the SAME distribution: signal quiet
    val matched = (1000 until 1020).map(i => (i.toLong, lowVec(i))).toDF("id", "v")
    val s1 = Similarity.ivfAppend(spark, "ivfd_idx", matched, "id", "v")
    assert(s1.batchN == 20 && !s1.drifted,
      s"matched batch flagged drifted: $s1")
    assert(math.abs(s1.batchMeanTop1Cos - buildMean) < 0.2)

    // the orthogonal batch: every centroid cosine is 0 → signal fires
    val drifted = (2000 until 2020).map(i => (i.toLong, highVec(i))).toDF("id", "v")
    val s2 = Similarity.ivfAppend(spark, "ivfd_idx", drifted, "id", "v")
    assert(s2.drifted, s"orthogonal batch not flagged: $s2")
    assert(s2.batchMeanTop1Cos < 0.1)

    // retrain re-seeds centroids from the grown corpus — the drifted
    // region is covered again and the next such batch is quiet
    Similarity.ivfRetrain(spark, "ivfd_idx")
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier("ivfd_idx_retrainsrc")))
    assert(spark.table("ivfd_idx").count() == 240 * 2)
    assert(spark.table("ivfd_idx_stats").head().getLong(0) == 240)
    val s3 = Similarity.ivfAppend(spark, "ivfd_idx",
      (3000 until 3020).map(i => (i.toLong, highVec(i))).toDF("id", "v"),
      "id", "v", driftTol = 0.3)
    assert(s3.batchMeanTop1Cos > 0.5,
      s"retrain did not restore coverage of the drifted region: $s3")
    assert(!s3.drifted,
      s"post-retrain batch outside the widened tolerance: $s3")
    // and queries from the drifted region now find their true neighbors
    val q = (2000 until 2003).map(i => (i.toLong, highVec(i))).toDF("id", "v")
    val hits = Similarity.ivfQuery(spark, "ivfd_idx", q, "id", "v", 5)
      .select("nid").as[Long].collect()
    assert(hits.nonEmpty && hits.forall(_ >= 2000),
      s"post-retrain probe surfaced low-subspace rows: ${hits.take(5).toSeq}")
  }

  test("lshIndexAppend checkIds: re-appended id fails loudly, fresh ids pass") {
    val corpus = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 1.3 + d).toFloat)))
      .toDF("id", "v")
    Similarity.lshIndexBuild(corpus, "id", "v", "lshguard_idx", nBits = 8)
    val fresh = Seq((100L, Array.tabulate(8)(d => math.cos(d).toFloat)))
      .toDF("id", "v")
    Similarity.lshIndexAppend(spark, "lshguard_idx", fresh, "id", "v",
      nBits = 8, checkIds = true)
    spark.catalog.refreshTable("lshguard_idx_vecs")
    assert(spark.table("lshguard_idx_vecs").count() == 51)
    // same id, DIFFERENT content — exactly the silent-supersede hazard
    val resub = Seq((7L, Array.tabulate(8)(d => (d * 0.5).toFloat)))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException](
      Similarity.lshIndexAppend(spark, "lshguard_idx", resub, "id", "v",
        nBits = 8, checkIds = true))
    assert(e.getMessage.contains("immutable") && e.getMessage.contains("7"))
    // default stays unguarded (admission flows pre-filter) — documented
    Similarity.lshIndexAppend(spark, "lshguard_idx", resub, "id", "v", nBits = 8)
    spark.catalog.refreshTable("lshguard_idx_vecs")
    assert(spark.table("lshguard_idx_vecs").filter(col("id") === 7L).count() == 2)
  }

  test("top-k operators fail loudly on non-integral ids; near-dup rejects loose thresholds") {
    // cast("long") on a string id would null every nid and return an
    // EMPTY result — the require turns that into an error
    val strIds = Seq(("a", Array(1.0f, 2.0f)), ("b", Array(2.0f, 4.0f)))
      .toDF("id", "v")
    val e1 = intercept[IllegalArgumentException](
      Similarity.bruteForceTopK(strIds, strIds, "id", "v", 1).collect())
    assert(e1.getMessage.contains("integral"))
    // the survivor broadcast in the rescore stage is only bounded at
    // near-dup thresholds
    val vecs = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    val e2 = intercept[IllegalArgumentException](
      Similarity.cosineNearDupPairsBlocked(vecs, "id", "v", 0.5))
    assert(e2.getMessage.contains("0.8"))
  }

  test("qcos_upper keeps mixed-dimension pairs (bound undefined, exact pass decides)") {
    val g = graft.functions.GraftFunctions
    val df = Seq((Array(1.0, 0.0), Array(1.0, 0.0, 1000.0))).toDF("a", "b")
    assert(df.select(g.qcosUpper(g.quantizeVec(col("a")), g.quantizeVec(col("b"))))
      .as[Double].head() == 1.0)
  }

  test("cosineNearDupPairsBlocked finds colinear vectors via LSH buckets") {
    val vecs = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(2.0f, 4.0f)),
                   (3L, Array(-1.0f, 1.0f))).toDF("id", "v")
    val r = Similarity.cosineNearDupPairsBlocked(vecs, "id", "v", 0.999)
      .select("ida", "idb").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L)))
  }

  test("cosineNearDupPairsBlocked matches the brute-force pair set") {
    // spec-side brute-force verifier (deliberately NOT a library
    // operator): 120 vectors in 3 tight clusters + noise, threshold .98
    val vecs = (0 until 120).map { i =>
      val base = i % 3
      val jitter = 0.005 * (i / 3)
      (i.toLong, Array.tabulate(16)(d =>
        (math.sin(base * 2.1 + d) + jitter * math.cos(i * 0.37 + d)).toFloat))
    }.toDF("id", "v")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (d <- a.indices) { dot += a(d) * b(d); na += a(d) * a(d); nb += b(d) * b(d) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val raw = vecs.as[(Long, Array[Float])].collect()
    val brute = (for {
      x <- raw; y <- raw if x._1 < y._1
      c = cos(x._2, y._2) if math.floor(c * 1e6 + 0.5) / 1e6 >= 0.98
    } yield (x._1, y._1)).toSet
    assert(brute.nonEmpty)
    val blocked = Similarity.cosineNearDupPairsBlocked(vecs, "id", "v", 0.98)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    // precision is exact (candidates are cosine-verified); recall must
    // cover the full brute-force set at this threshold
    assert(blocked == brute,
      s"missing=${(brute -- blocked).take(5)} extra=${(blocked -- brute).take(5)}")
  }

  test("refineCentroids: one Lloyd step lands each centroid on its list mean") {
    // two tight, well-separated clusters; one seed inside each
    val vecs = (0 until 40).map { i =>
      val base = if (i < 20) Array(10.0, 0.0, 0.0) else Array(0.0, 10.0, 0.0)
      (i.toLong, Array(base(0) + (i % 5) * 0.01, base(1) + (i % 3) * 0.01, base(2)))
    }.toDF("id", "v")
    val c = vecs.select(col("id").as("nid"),
      col("v").cast("array<double>").as("nvec"))
    val seeds = c.filter(col("nid").isin(0L, 25L))
      .select(col("nid").as("cid"), col("nvec").as("cvec"))
    val refined = Similarity.refineCentroids(c, seeds, iters = 1)
      .as[(Long, Array[Double])].collect().toMap
    assert(refined.keySet == Set(0L, 25L))
    // by cosine every cluster-A vector assigns to seed 0, cluster B to 25;
    // the refined centroid must be the exact per-dimension mean of its list
    val raw = c.as[(Long, Array[Double])].collect()
    def mean(rows: Seq[Array[Double]]): Seq[Double] =
      rows.transpose.map(xs => xs.sum / xs.size).toSeq
    val expectA = mean(raw.filter(_._1 < 20).map(_._2).toSeq)
    val expectB = mean(raw.filter(_._1 >= 20).map(_._2).toSeq)
    def close(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-9 }
    assert(close(refined(0L).toSeq, expectA))
    assert(close(refined(25L).toSeq, expectB))
  }

  test("seedCentroids: scale path is a pure filter yielding ~nlist rows") {
    val n = 20000
    val c = spark.range(n).select(col("id").as("nid"),
      array(col("id").cast("double"), lit(1.0)).as("nvec"))
    val nlist = 64 // n >= 64*nlist → hash-threshold sample, no global sort
    val picked = Similarity.seedCentroids(c, nlist, n, 42L)
    val cnt = picked.count()
    assert(cnt > nlist / 2 && cnt < nlist * 2, s"sampled $cnt for nlist=$nlist")
    assert(picked.count() == cnt) // deterministic across evaluations
    // no Sort / TakeOrdered anywhere: the pick is filter-only
    val plan = picked.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrdered") && !plan.contains("Sort"))
  }

  test("lsh admission index: check finds pairs through grown index, index never shuffles") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0)),
      (4L, Seq(0.7, 0.7, 0.0))).toDF("vec_id", "embedding")
    Similarity.lshIndexBuild(vecs.filter(col("vec_id") <= 2),
      "vec_id", "embedding", "lshix_spec", buckets = 4)
    Similarity.lshIndexAppend(spark, "lshix_spec",
      vecs.filter(col("vec_id") > 2), "vec_id", "embedding")
    val batch = vecs.select((col("vec_id") + 100L).as("vec_id"),
      col("embedding"))
    val checked = Similarity.lshDedupAgainst(spark, "lshix_spec", batch,
      "vec_id", "embedding", 0.999)
    // every duplicate finds its source — including 103/104, reachable
    // only through APPENDED rows
    val got = checked.select("batch_id", "corpus_id")
      .as[(Long, Long)].collect().toSet
    assert(Set((101L, 1L), (102L, 2L), (103L, 3L), (104L, 4L)).subsetOf(got))
    // … and no false pairs below threshold (1·4 at cos ≈ 0.707 must not
    // survive verification even if buckets collide)
    assert(!got.contains((101L, 4L)) && !got.contains((104L, 1L)))
    // scale shape: only the BATCH moves — no shuffle exchange sits over
    // an index-table scan (batch rows shuffle TO the bucketed layout).
    // Broadcast is disabled for the check: at gate scale the tiny index
    // sides would broadcast and the assertion would never exercise the
    // big-index (sort-merge) path this pins.
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = Similarity.lshDedupAgainst(spark, "lshix_spec", batch,
        "vec_id", "embedding", 0.999)
      val plan = big.queryExecution.executedPlan
      val offending = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.child.collectLeaves().exists(_.toString.contains("lshix_spec")) => e
      }
      assert(offending.isEmpty,
        s"index-side shuffle found:\n${offending.mkString("\n")}")
      // and the join really is the non-broadcast one over the index
      assert(plan.toString.contains("SortMergeJoin"),
        "expected the sort-merge path once broadcast is off")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("bruteForceShardedTopK == whole-corpus brute force, ties included") {
    val emb = SharedSpark.spark.read
      .parquet(s"${SharedSpark.sfDir}/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 10 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "rank")
        .as[(Long, Long, Double, Int)].collect().toSeq
    val whole = rows(Similarity.bruteForceTopK(emb, q,
      "vec_id", "embedding", 5))
    val sharded = rows(Similarity.bruteForceShardedTopK(
      Seq(emb.filter(col("vec_id") % 3 === 0),
          emb.filter(col("vec_id") % 3 === 1),
          emb.filter(col("vec_id") % 3 === 2)),
      q, "vec_id", "embedding", 5))
    assert(sharded === whole,
      "sharded brute-force merge diverged from the whole-corpus ranking")
  }

  test("ivfShardedQuery at probeFrac=1.0 == exact brute force") {
    val emb = SharedSpark.spark.read
      .parquet(s"${SharedSpark.sfDir}/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 10 === 0)
    val n = System.nanoTime()
    val (t0, t1) = (s"sivf_spec0_$n", s"sivf_spec1_$n")
    Similarity.ivfBuild(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", t0)
    Similarity.ivfBuild(emb.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", t1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "rank")
        .as[(Long, Long, Double, Int)].collect().toSeq
    // full probe makes each shard's list its exact local top-k, so the
    // merge must be exactly the global exact ranking
    assert(rows(Similarity.ivfShardedQuery(spark, Seq(t0, t1), q,
        "vec_id", "embedding", 5, probeFrac = 1.0)) ===
      rows(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)),
      "sharded IVF at full probe diverged from exact brute force")
  }
}
