package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.{ProductQuant, Similarity}

class ProductQuantSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  /** 4 well-separated direction clusters in 8 dims, deterministic
    * per-id jitter — the corpus every recall test here uses.
    */
  private def clustered(n: Int) = (0 until n).map { i =>
    val c = i % 4
    val base = Array.fill(8)(0.05)
    base(c * 2) = 1.0
    base(c * 2 + 1) = 0.7
    val jit = Array.tabulate(8)(j => 0.01 * (((i * 31 + j * 7) % 11) - 5))
    (i.toLong, base.zip(jit).map { case (a, b) => a + b })
  }.toDF("vec_id", "embedding")

  test("l2_argmin picks the euclidean-nearest flat slot, first on ties") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (Array(0.0, 0.0), Array(1.0, 1.0, 0.1, 0.1, -1.0, -1.0)),
      (Array(-0.9, -0.9), Array(1.0, 1.0, 0.1, 0.1, -1.0, -1.0)),
      (Array(1.0, 0.0), Array(1.0, 0.0, 1.0, 0.0))).toDF("v", "cb")
    val r = df.select(GraftFunctions.l2Argmin(col("v"), col("cb")))
      .as[Long].collect().toSeq
    assert(r == Seq(1L, 2L, 0L))
  }

  test("pq_encode recovers exact codes and norm for on-centroid vectors") {
    GraftFunctions.ensureRegistered(spark)
    // m=2 subspaces of dim 2, ksub=2: flat layout [sub][code][dim]
    val cbFlat = Array(
      1.0, 0.0, /* sub0 code0 */ 0.0, 1.0, /* sub0 code1 */
      2.0, 0.0, /* sub1 code0 */ 0.0, 2.0 /* sub1 code1 */)
    val df = Seq(
      (Array(1.0, 0.0, 0.0, 2.0), cbFlat), // codes (0, 1)
      (Array(0.0, 1.0, 2.0, 0.0), cbFlat)) // codes (1, 0)
      .toDF("v", "cb")
    val r = df.select(GraftFunctions.pqEncode(col("v"), col("cb"), 2, 2)
        .as("pq"))
      .select(col("pq.codes"), col("pq.nrm"))
      .as[(Array[Byte], Double)].collect().toSeq
    assert(r(0)._1.toSeq == Seq[Byte](0, 1))
    assert(r(1)._1.toSeq == Seq[Byte](1, 0))
    assert(math.abs(r(0)._2 - math.sqrt(5.0)) < 1e-12)
  }

  test("pq_adc_table + pq_adc_dot reproduce the exact dot for coded vectors") {
    GraftFunctions.ensureRegistered(spark)
    val cbFlat = Array(1.0, 0.0, 0.0, 1.0, 2.0, 0.0, 0.0, 2.0)
    val q = Array(0.5, -0.25, 3.0, 1.0)
    val tab = Seq((q, cbFlat)).toDF("q", "cb")
      .select(GraftFunctions.pqAdcTable(col("q"), col("cb"), 2, 2))
      .as[Seq[Double]].head()
    // table = [dot(q0, c00), dot(q0, c01), dot(q1, c10), dot(q1, c11)]
    assert(tab == Seq(0.5, -0.25, 6.0, 2.0))
    // a vector encoded (0, 1) reconstructs exactly to (1, 0, 0, 2):
    // ADC estimate must equal the exact dot q·x = 0.5 + 2.0
    val d = Seq((Array[Byte](0, 1), tab)).toDF("codes", "tab")
      .select(GraftFunctions.pqAdcDot(col("codes"), col("tab"), 2))
      .as[Double].head()
    assert(math.abs(d - 2.5) < 1e-12)
  }

  test("pqTrain: dense per-sub codes, dsub-length centroids, deterministic") {
    val vecs = clustered(120)
    val cb = ProductQuant.pqTrain(vecs, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 2)
    val rows = cb.select("sub", "code", "cvec")
      .as[(Int, Int, Seq[Double])].collect().toSeq
    assert(rows.size == 8) // 2 subs × 4 codes
    assert(rows.forall(_._3.size == 4))
    for (s <- 0 to 1)
      assert(rows.filter(_._1 == s).map(_._2).sorted == Seq(0, 1, 2, 3))
    val again = ProductQuant.pqTrain(vecs, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 2)
      .select("sub", "code", "cvec").as[(Int, Int, Seq[Double])]
      .collect().toSeq
    assert(rows.sortBy(r => (r._1, r._2)) == again.sortBy(r => (r._1, r._2)))
  }

  test("pqTrain rejects a codebook the sample cannot seed") {
    val tiny = clustered(8)
    val e = intercept[IllegalArgumentException] {
      ProductQuant.pqTrain(tiny, "vec_id", "embedding", m = 2, ksub = 64)
    }
    assert(e.getMessage.contains("sample"))
  }

  test("pqEncode emits m-byte codes with in-range values") {
    val vecs = clustered(60)
    val cb = ProductQuant.pqTrain(vecs, "vec_id", "embedding",
      m = 4, ksub = 4, iters = 1)
    val enc = ProductQuant.pqEncode(vecs, "vec_id", "embedding", cb, 4, 4)
    val rows = enc.select("nid", "codes", "nrm")
      .as[(Long, Array[Byte], Double)].collect()
    assert(rows.length == 60)
    assert(rows.forall(_._2.length == 4))
    assert(rows.forall(_._2.forall(c => (c & 0xFF) < 4)))
    assert(rows.forall(_._3 > 0.0))
  }

  test("pqTopK matches brute force on clustered data (exact refine tail)") {
    val vecs = clustered(80)
    val q = vecs.filter(col("vec_id") % 20 === 0)
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val pq = ProductQuant.pqTopK(vecs, q, "vec_id", "embedding", 3,
      m = 2, ksub = 4, iters = 2)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(pq == exact)
  }

  // Round-8 regression diagnosis (this test + the append twin below):
  // switching to residual encoding made a multi-assigned doc's two list
  // copies carry DIFFERENT ADC estimates (per-copy codes + per-list
  // q·centroid term), and the candidate top-k then deduped only
  // identical (cos, nid) pairs — one doc ate two of the refineK=32
  // slots, halving the distinct candidate pool and dropping true top-3
  // neighbors below the refine cut. A residual-path defect (ADVICE r8
  // item 1), not intrinsic quantization error: fixed by per-nid-max
  // dedup inside TopKScoreAgg, which restores the full rk-wide pool.
  test("ivfPqBuild/ivfPqQuery: full-probe query equals brute force; " +
       "layout persisted; index never shuffles") {
    val vecs = clustered(100)
    val q = vecs.filter(col("vec_id") % 25 === 0)
    val table = "pq_spec_idx"
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", table,
      m = 2, ksub = 4, nlist = 5, buckets = 2)
    // layout: code lists carry binary codes + norm, raw vecs sit aside
    val listSchema = spark.table(table).schema
    assert(listSchema.fieldNames.toSeq ==
      Seq("cid", "nid", "codes", "nrm"))
    assert(listSchema("codes").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(spark.table(s"${table}_vecs").columns.toSeq == Seq("nid", "nvec"))
    assert(spark.table(s"${table}_meta").select("m", "ksub", "built_n", "resid")
      .as[(Int, Int, Long, Boolean)].head() == ((2, 4, 100L, true)))
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = ProductQuant.ivfPqQuery(spark, table, q,
      "vec_id", "embedding", 3, probeFrac = 1.0)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(approx == exact)
    // scale shape: no shuffle exchange over the quantized-list or
    // raw-vec table scans (probes/candidates shuffle TO the bucketed
    // layouts). Broadcast disabled so the big-index path is the one
    // pinned; the explicit broadcast() hints on the query side survive.
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = ProductQuant.ivfPqQuery(spark, table, q,
        "vec_id", "embedding", 3, probeFrac = 1.0)
      val plan = big.queryExecution.executedPlan
      val offending = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.child.collectLeaves().exists(l =>
            l.toString.contains(table) &&
              !l.toString.contains(s"${table}_cents") &&
              !l.toString.contains(s"${table}_pq") &&
              !l.toString.contains(s"${table}_meta")) => e
      }
      assert(offending.isEmpty,
        s"index-side shuffle found:\n${offending.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("sim9 parameters hold gate recall at the second scale (sf0.1)") {
    // the sim3 lesson: parameters tuned to one scale factor silently rot
    // at the next — pin the bigger SF here so rot fails a test, not a
    // bigger cluster. m=16/refineK=50 is the measured floor for the
    // hash-uniform (clusterless, PQ-worst-case) testdata embeddings —
    // re-measured with residual encoding (DevPq round 9): m=16 holds
    // 20/20 at minHits 3; m=8 recovered from its pre-residual 1/20 to
    // 15-17/20 but remains below gate, so the floor stands.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val q = emb.filter(col("vec_id") % 100 === 0)
    val table = "pq_spec_sf01"
    ProductQuant.ivfPqBuild(emb, "vec_id", "embedding", table, m = 16)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("qid", "nid")
    val approx = ProductQuant.ivfPqQuery(spark, table, q,
      "vec_id", "embedding", 5, refineK = 50)
      .select("qid", "nid")
    val hits = exact.join(approx, Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("h"))
    val nq = q.count()
    assert(hits.count() == nq) // every query keeps at least one true hit
    val minHits = hits.agg(min("h")).head().getLong(0)
    assert(minHits >= 3, s"gate recall broke: minHits=$minHits")
  }

  // See the residual-encoding diagnosis comment on the build/query test
  // above — this twin failed for the same multi-assign candidate-slot
  // reason and is pinned by the same per-nid-max dedup fix.
  test("ivfPqBuild twoLevel: full-probe query equals brute force; layout identical") {
    val vecs = clustered(100)
    val q = vecs.filter(col("vec_id") % 25 === 0)
    val table = "pq_spec_2l"
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", table,
      m = 2, ksub = 4, nlist = 5, buckets = 2, twoLevel = true)
    // identical table layout — queries and appends are agnostic to how
    // the assignment pass ranked the coarse centroids
    assert(spark.table(table).schema.fieldNames.toSeq ==
      Seq("cid", "nid", "codes", "nrm"))
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = ProductQuant.ivfPqQuery(spark, table, q,
      "vec_id", "embedding", 3, probeFrac = 1.0)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(approx == exact)
    // an append against the two-level-built index stays exact at full
    // probe (flat batch assignment over the same frozen centroids —
    // placement may differ, probing covers every list)
    val extra = clustered(120).filter(col("vec_id") >= 100)
    val st = ProductQuant.ivfPqAppend(spark, table, extra,
      "vec_id", "embedding")
    assert(st.batchN == 20)
    val all = clustered(120)
    val exact2 = Similarity.bruteForceTopK(all, q, "vec_id", "embedding", 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx2 = ProductQuant.ivfPqQuery(spark, table, q,
      "vec_id", "embedding", 3, probeFrac = 1.0)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(approx2 == exact2)
  }

  test("ivfPqAppend: grown index answers full-probe queries exactly; " +
       "stats row and drift signal sane") {
    val vecs = clustered(100)
    val table = "pq_spec_app"
    // split by RANGE: clusters cycle with i % 4, so an even/odd id split
    // would give the build half only clusters 0 and 2 — real drift, not
    // the same-distribution case this test pins
    ProductQuant.ivfPqBuild(vecs.filter(col("vec_id") < 50),
      "vec_id", "embedding", table, m = 2, ksub = 4, nlist = 5, buckets = 2)
    val st = ProductQuant.ivfPqAppend(spark, table,
      vecs.filter(col("vec_id") >= 50), "vec_id", "embedding")
    assert(st.batchN == 50)
    // same distribution as the build half — the frozen quantizer fits
    assert(!st.drifted)
    assert(!st.buildMeanTop1Cos.isNaN)
    assert(spark.table(s"${table}_vecs").count() == 100)
    val q = vecs.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = ProductQuant.ivfPqQuery(spark, table, q,
      "vec_id", "embedding", 3, probeFrac = 1.0)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(approx == exact)
  }

  test("ivfPqAppend repair=true completes a crashed absorb without dups") {
    val vecs = clustered(60)
    val table = "pq_spec_repair"
    ProductQuant.ivfPqBuild(vecs.filter(col("vec_id") < 40),
      "vec_id", "embedding", table, m = 2, ksub = 4, nlist = 4, buckets = 2)
    val batch = vecs.filter(col("vec_id") >= 40)
    ProductQuant.ivfPqAppend(spark, table, batch, "vec_id", "embedding")
    val codesAfter = spark.table(table).count()
    val vecsAfter = spark.table(s"${table}_vecs").count()
    // replaying the SAME batch through the repair path adds nothing
    ProductQuant.ivfPqAppend(spark, table, batch, "vec_id", "embedding",
      repair = true)
    assert(spark.table(table).count() == codesAfter)
    assert(spark.table(s"${table}_vecs").count() == vecsAfter)
  }

  test("ivfPqAppend flags a drifting batch; ivfPqRetrain cures it") {
    val vecs = clustered(80)
    val table = "pq_spec_drift"
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", table,
      m = 2, ksub = 4, nlist = 4, buckets = 2)
    // flat all-ones vectors sit far from every direction-cluster
    // centroid: mean top-1 cosine drops well past the 0.05 tolerance
    val shifted = (1000 until 1040).map { i =>
      (i.toLong, Array.tabulate(8)(j => 1.0 + 0.01 * ((i + j) % 5)))
    }.toDF("vec_id", "embedding")
    val st = ProductQuant.ivfPqAppend(spark, table, shifted,
      "vec_id", "embedding")
    assert(st.drifted,
      s"expected drift: batch=${st.batchMeanTop1Cos} build=${st.buildMeanTop1Cos}")
    ProductQuant.ivfPqRetrain(spark, table)
    // retrained index serves the grown corpus exactly at full probe,
    // meta m preserved, stats re-anchored to the grown corpus
    assert(spark.table(s"${table}_meta").head().getInt(0) == 2)
    assert(spark.table(s"${table}_stats").head().getLong(0) == 120L)
    val all = vecs.unionByName(shifted)
    val q = all.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopK(all, q, "vec_id", "embedding", 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = ProductQuant.ivfPqQuery(spark, table, q,
      "vec_id", "embedding", 3, probeFrac = 1.0)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(approx == exact)
    assert(spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${table}_vecs")))
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(
        s"${table}_vecs_retrainsrc")))
  }

  test("ivfPqQuery chunks an oversized query frame; chunked union is " +
       "bit-equal to the unchunked result") {
    val vecs = clustered(100)
    val table = "pq_spec_chunk"
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", table,
      m = 2, ksub = 4, nlist = 5, buckets = 2)
    val q = vecs.filter(col("vec_id") % 10 === 0) // 10 queries
    def results(cap: Long) = ProductQuant.ivfPqQuery(spark, table, q,
      "vec_id", "embedding", 3, probeFrac = 1.0,
      maxAdcBroadcastBytes = cap)
      .select("qid", "nid", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    // per-query bytes = (m·ksub + dim)·8 = (8 + 8)·8 = 128; ten queries
    // = 1280 bytes, so a 300-byte cap forces ⌈1280/300⌉ = 5 chunks —
    // the guard must fire, and chunking by qid-hash must be invisible
    // in the output (every scoring row carries exactly one qid)
    val unchunked = results(256L << 20)
    val chunked = results(300L)
    assert(chunked == unchunked)
    assert(unchunked.nonEmpty)
  }

  /** Strongly ANISOTROPIC corpus — the geometry OPQ exists for: all the
    * variance lives in the FIRST four raw coordinates (= exactly the
    * first PQ block at m = 4), the rest is near-noise. Contiguous-block
    * PQ hands the whole signal to subspace 0's lone byte codebook;
    * OPQ's eigen-balanced rotation spreads the four strong directions
    * one per subspace. Deterministic integer-hash jitter.
    */
  /** splitmix64 finalizer → uniform in [-1, 1). Properly MIXED
    * per-(i, j) randomness matters here: an affine integer hash
    * (a·i + b·j mod m) — and even java.util.Random's FIRST draw from
    * sequential seeds (a weakly-scrambled LCG) — make the signal
    * coordinates correlate at 0.99+ across j, collapsing the fixture
    * to rank-1 covariance, a different geometry entirely. */
  private def mix01(z0: Long): Double = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2 - 1
  }

  private def anisoRow(i: Int): Array[Double] = {
    def h(j: Int): Double = mix01(i.toLong * 131071L + j)
    Array.tabulate(16)(j => if (j < 4) 10.0 * h(j) else 0.1 * h(j))
  }

  private def anisotropic(n: Int) =
    (0 until n).map(i => (i.toLong, anisoRow(i))).toDF("vec_id", "embedding")

  test("opqRotation: orthonormal rows; rotated variance balances " +
       "across subspaces") {
    val vecs = anisotropic(500)
    val rot = ProductQuant.opqRotation(vecs, "vec_id", "embedding", m = 4)
    val d = 16
    assert(rot.length == d * d)
    // rows orthonormal: R·Rᵀ = I
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => rot(i * d + k) * rot(j * d + k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9,
        s"R·Rᵀ($i,$j) = $dot, want $want")
    }
    // per-subspace variance mass: raw data is maximally imbalanced
    // (block 0 carries ~everything); the rotated view must spread it
    val xs = vecs.select("embedding").as[Seq[Double]].collect()
      .map(_.toArray)
    def subVars(f: Array[Double] => Array[Double]): Seq[Double] = {
      val ys = xs.map(f)
      val mean = Array.tabulate(d)(j => ys.map(_(j)).sum / ys.length)
      val v = Array.tabulate(d)(j =>
        ys.map(y => (y(j) - mean(j)) * (y(j) - mean(j))).sum / ys.length)
      (0 until 4).map(s => (0 until 4).map(t => v(s * 4 + t)).sum)
    }
    def imbalance(vs: Seq[Double]): Double = vs.max / math.max(vs.min, 1e-12)
    val rawImb = imbalance(subVars(identity))
    val rotImb = imbalance(subVars { x =>
      Array.tabulate(d)(i =>
        (0 until d).map(j => rot(i * d + j) * x(j)).sum)
    })
    assert(rawImb > 100.0, s"fixture lost its anisotropy (raw $rawImb)")
    assert(rotImb < 2.0,
      s"rotation failed to balance subspace variance (rot $rotImb)")
  }

  test("tridiagEigen (the d > 256 path): orthonormal eigenbasis that " +
       "diagonalizes a dense symmetric matrix") {
    val d = 48
    // deterministic dense symmetric matrix with a spread spectrum
    val a = Array.tabulate(d, d) { (i, j) =>
      val lo = math.min(i, j); val hi = math.max(i, j)
      mix01(lo.toLong * 7919L + hi) + (if (i == j) 4.0 + i * 0.1 else 0.0)
    }
    val (eig, v) = ProductQuant.tridiagEigen(a)
    // columns orthonormal: VᵀV = I
    for (p <- 0 until d; q <- p until d) {
      val dot = (0 until d).map(k => v(k)(p) * v(k)(q)).sum
      val want = if (p == q) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"VᵀV($p,$q) = $dot")
    }
    // eigen-equation residual: ‖A·v_e − λ_e·v_e‖ small per pair
    val anorm = math.sqrt(a.map(_.map(x => x * x).sum).sum)
    for (e <- 0 until d) {
      val res = math.sqrt((0 until d).map { i =>
        val av = (0 until d).map(j => a(i)(j) * v(j)(e)).sum
        val r = av - eig(e) * v(i)(e); r * r
      }.sum)
      assert(res < 1e-8 * anorm, s"eigenpair $e residual $res")
    }
    // spectrum conserves the trace
    val tr = (0 until d).map(i => a(i)(i)).sum
    assert(math.abs(eig.sum - tr) < 1e-8 * math.abs(tr),
      s"Σλ = ${eig.sum}, trace = $tr")
  }

  test("opqRotation above the Jacobi cutoff (d = 512 → tridiagEigen): " +
       "orthonormal rows, variance balances") {
    val d = 512
    // the anisotropic geometry at scale: all signal in the first 8
    // coordinates (= the first PQ block at m = 4), noise elsewhere
    val rows = (0 until 600).map { i =>
      (i.toLong, Array.tabulate(d) { j =>
        val h = mix01(i.toLong * 524287L + j)
        if (j < 8) 10.0 * h else 0.1 * h
      })
    }.toDF("vec_id", "embedding")
    val t0 = System.nanoTime()
    val rot = ProductQuant.opqRotation(rows, "vec_id", "embedding", m = 4)
    val wall = (System.nanoTime() - t0) / 1e9
    info(f"opqRotation d=512 wall $wall%.2f s")
    assert(rot.length == d * d)
    // spot-check orthonormality on a deterministic row subset (full
    // d² check is O(d³) of test time for no extra assurance)
    val picks = (0 until 16).map(_ * 31 % d)
    for (i <- picks; j <- picks if i <= j) {
      val dot = (0 until d).map(k => rot(i * d + k) * rot(j * d + k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"R·Rᵀ($i,$j) = $dot")
    }
    // the 8 signal directions must spread across the 4 subspaces: each
    // subspace's projected variance within 4x of the others
    val xs = rows.select("embedding").as[Seq[Double]].collect().map(_.toArray)
    val dsub = d / 4
    val ys = xs.map { x =>
      Array.tabulate(d)(i => {
        var acc = 0.0; var j = 0
        while (j < d) { acc += rot(i * d + j) * x(j); j += 1 }
        acc
      })
    }
    val mean = Array.tabulate(d)(j => ys.map(_(j)).sum / ys.length)
    val vr = Array.tabulate(d)(j =>
      ys.map(y => (y(j) - mean(j)) * (y(j) - mean(j))).sum / ys.length)
    val sub = (0 until 4).map(s2 => (0 until dsub).map(t => vr(s2 * dsub + t)).sum)
    assert(sub.max / sub.min < 4.0,
      s"rotated subspace variance imbalanced: $sub")
  }

  test("OPQ index: covering refine equals brute force and the plain " +
       "index (rotation never touches exactness); _rot persists") {
    val vecs = anisotropic(200)
    val q = vecs.filter(col("vec_id") % 25 === 0)
    val (opqT, plainT) = ("pq_spec_opq", "pq_spec_opq_plain")
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", opqT,
      m = 4, ksub = 8, nlist = 5, buckets = 2, opq = true)
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", plainT,
      m = 4, ksub = 8, nlist = 5, buckets = 2)
    val rotRow = spark.table(s"${opqT}_rot")
      .as[(Int, Seq[Double])].head()
    assert(rotRow._1 == 16 && rotRow._2.length == 256)
    // raw refine table stays UNROTATED — byte-equal to the plain one
    assert(spark.table(s"${opqT}_vecs").orderBy("nid")
        .as[(Long, Seq[Double])].collect().toSeq ==
      spark.table(s"${plainT}_vecs").orderBy("nid")
        .as[(Long, Seq[Double])].collect().toSeq)
    def rows(t: String) = ProductQuant.ivfPqQuery(spark, t, q,
        "vec_id", "embedding", 3, probeFrac = 1.0, refineK = 200)
      .select("qid", "nid", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .select("qid", "nid", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows(opqT) == exact, "OPQ covering refine diverged from exact")
    assert(rows(plainT) == exact, "plain covering refine diverged")
    // a rebuild WITHOUT opq over the same name must drop the rotation
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", opqT,
      m = 4, ksub = 8, nlist = 5, buckets = 2)
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${opqT}_rot")),
      "rebuild without opq left a stale _rot behind")
  }

  test("OPQ beats plain PQ recall at tight refine on anisotropic data; " +
       "frozen-rotation append stays code-valid") {
    val vecs = anisotropic(400)
    val q = vecs.filter(col("vec_id") % 10 === 0)
    val (opqT, plainT) = ("pq_spec_opqr", "pq_spec_opqr_plain")
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", opqT,
      m = 4, ksub = 8, nlist = 4, buckets = 2, opq = true)
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", plainT,
      m = 4, ksub = 8, nlist = 4, buckets = 2)
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // tight refine (refineK = k): the ADC ranking IS the result pool —
    // recall here reads quantization quality directly
    def recall(t: String): Double = {
      val got = ProductQuant.ivfPqQuery(spark, t, q,
          "vec_id", "embedding", 5, probeFrac = 1.0, refineK = 5)
        .select("qid", "nid").as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val (rOpq, rPlain) = (recall(opqT), recall(plainT))
    assert(rOpq > rPlain + 0.05,
      f"OPQ recall $rOpq%.3f did not beat plain $rPlain%.3f on the " +
        "anisotropic fixture — the rotation is not doing its job")
    // frozen-rotation append: absorbed rows encode in the STANDING
    // rotation's space. Re-query each appended id for ITSELF at a tiny
    // refine pool — junk codes (e.g. an unrotated encode) would sink
    // the self-estimate below the pool cut
    val more = (400 until 440).map(i => (i.toLong, anisoRow(i)))
      .toDF("vec_id", "embedding")
    val stats = ProductQuant.ivfPqAppend(spark, opqT, more,
      "vec_id", "embedding")
    // off-space discriminators (tight-pool self-rank rates are ±15%
    // small-sample noise even between two BUILT id groups — measured —
    // so they can't carry this assertion):
    //  1. the drift stat compares the batch's mean top-1 centroid
    //     cosine IN THE ROTATED SPACE against the build's — a batch
    //     assigned unrotated against rotated centroids reads as
    //     catastrophic drift;
    assert(!stats.drifted && stats.batchMeanTop1Cos > 0.5,
      s"appended batch reads as drifted ($stats) — the append path " +
        "lost the standing rotation")
    //  2. a generous 20-candidate ADC pool: quantization noise never
    //     drops a self-match from it, junk (off-space) codes rank
    //     self ~uniformly (P(top-20 of 440) ≈ 5%)
    val self = ProductQuant.ivfPqQuery(spark, opqT, more,
        "vec_id", "embedding", 4, probeFrac = 1.0, refineK = 20,
        excludeSelf = false)
      .filter(col("qid") === col("nid"))
      .select("qid").as[Long].collect().size
    assert(self >= 32,
      s"only $self/40 appended ids rank themselves inside a " +
        "20-candidate ADC pool — appended codes are off-space")
  }

  test("OPQ survives splitShard (rotation copies) and ivfPqRetrain " +
       "(fresh rotation, mode kept)") {
    import graft.operators.BucketedJoin
    val vecs = anisotropic(300)
    val parent = "pq_spec_opqsplit"
    val (c0, c1) = (s"${parent}a", s"${parent}b")
    BucketedJoin.dropWithLocation(spark, s"${parent}_splitdone")
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", parent,
      m = 4, ksub = 8, nlist = 4, buckets = 2, opq = true)
    val parentRot = spark.table(s"${parent}_rot")
      .as[(Int, Seq[Double])].head()
    ProductQuant.splitShard(spark, parent, c0, c1)
    for (c <- Seq(c0, c1)) {
      val childRot = spark.table(s"${c}_rot").as[(Int, Seq[Double])].head()
      assert(childRot == parentRot, s"$c's rotation diverged from parent")
    }
    // children still serve (rotated ADC + raw refine), exactly at cover
    val q = vecs.filter(col("vec_id") % 30 === 0)
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val sharded = ProductQuant.ivfPqShardedQuery(spark, Seq(c0, c1), q,
        "vec_id", "embedding", 3, probeFrac = 1.0, refineK = 300)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(sharded == exact)
    // retrain keeps the OPQ mode with a FRESH rotation
    ProductQuant.ivfPqRetrain(spark, c0)
    assert(spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${c0}_rot")),
      "retrain dropped the OPQ mode")
    for (c <- Seq(c0, c1))
      Seq(c, s"${c}_vecs", s"${c}_cents", s"${c}_pq", s"${c}_meta",
          s"${c}_stats", s"${c}_rot")
        .foreach(BucketedJoin.dropWithLocation(spark, _))
  }

  test("ivfPqQuery excludeSelf=false lets a resubmitted id match itself") {
    val vecs = clustered(40)
    val table = "pq_spec_self"
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", table,
      m = 2, ksub = 4, nlist = 3, buckets = 2)
    val q = vecs.filter(col("vec_id") === 7L)
    val withSelf = ProductQuant.ivfPqQuery(spark, table, q,
      "vec_id", "embedding", 1, probeFrac = 1.0, excludeSelf = false)
      .select("nid").as[Long].collect().toSeq
    assert(withSelf == Seq(7L))
    val noSelf = ProductQuant.ivfPqQuery(spark, table, q,
      "vec_id", "embedding", 1, probeFrac = 1.0)
      .select("nid").as[Long].collect().toSeq
    assert(noSelf.nonEmpty && !noSelf.contains(7L))
  }
}
