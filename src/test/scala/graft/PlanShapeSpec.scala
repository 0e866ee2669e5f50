package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Fusion, Retrieval}

/** Plan-MECHANISM assertions for the flagship serving paths — the t44
  * lesson generalized: a hash-green gate proves the ANSWER, not that
  * the intended machinery produced it (round 17's post-close audit
  * found the first MaxScore gate timing its exact FALLBACK, hash-green
  * and vacuous). These cases pin the mechanism itself in the executed
  * plan, so a refactor that silently reroutes a pruned path to its
  * fallback — same rows, wrong plan — fails a spec instead of waiting
  * for a human plan audit:
  *
  *  - the query-term IN filter must REACH the postings scan (pushdown,
  *    not post-scan filtering — the round-12 serving-cost mechanism);
  *  - the MaxScore candidate gate must appear as a LeftSemi join when
  *    the geometry verifies (single, sharded, and routed through
  *    fusion), and must NOT appear when the entry point correctly
  *    serves the exact leg;
  *  - the candidate-gated plans must still aggregate bounded top-k
  *    (no window sort reintroduced).
  */
class PlanShapeSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  /** The RetrievalSpec MaxScore corpus: head terms aaa/bbb on every
    * doc (df = N, negligible ub), rare w-terms, mid-df x-terms. Query
    * (1, "aaa bbb w3") VERIFIES (tiny head ub under the rare-term
    * threshold) — the pruned two-pass plan, deterministically. */
  private def msCorpus(n: Int = 120) = (0 until n).map { i =>
    (i.toLong, s"aaa bbb w${i % 30} x${i % 7}")
  }.toDF("doc_id", "text")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** AQE wraps the physical plan in AdaptiveSparkPlanExec, whose
    * TreeNode children do not include the inner plan — a `collect`
    * over it silently matches nothing (a trivially-green assertion).
    * Structural assertions build their plans with AQE off. String
    * (`toString`) assertions are AQE-safe either way. */
  private def withNoAqe[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("bm25Query: the query-term IN filter reaches the postings scan") {
    val t = s"plan_push_${System.nanoTime()}"
    Retrieval.bm25Build(msCorpus(), "doc_id", "text", t, buckets = 2)
    val q = Seq((1L, "aaa w3")).toDF("qid", "qtext")
    val plan = planOf(Retrieval.bm25Query(spark, t, q, "qid", "qtext", 5))
    assert(plan.contains(t), "no postings scan found in the plan")
    assert(plan.contains("In(term"),
      s"query-term IN filter not pushed into the postings scan:\n$plan")
  }

  test("bm25QueryMaxScore: verified geometry plans the LeftSemi " +
       "candidate gate; exact routing plans none") {
    val t = s"plan_ms_${System.nanoTime()}"
    Retrieval.bm25Build(msCorpus(), "doc_id", "text", t, buckets = 2)
    val q = Seq((1L, "aaa bbb w3")).toDF("qid", "qtext")
    // forced dials: the two-pass pruned plan must be what's returned,
    // and its head-postings doc-gate is a LeftSemi join
    val pruned = planOf(Retrieval.bm25QueryMaxScore(spark, t, q,
      "qid", "qtext", 3, essentialDfFrac = 0.05,
      gateMinHeadMass = 1L, gateCandFrac = 1.0))
    assert(pruned.contains("LeftSemi"),
      s"MaxScore pruned path lost its candidate semi-join:\n$pruned")
    // defaults at toy scale: the cost gate routes to the exact leg —
    // whose plan must NOT carry a candidate gate (it would be paying
    // semi-join cost with nothing to prune)
    val exact = planOf(Retrieval.bm25QueryMaxScore(spark, t, q,
      "qid", "qtext", 3))
    assert(!exact.contains("LeftSemi"),
      s"exact-routed MaxScore call still plans a semi-join:\n$exact")
    // all-essential dial short-circuits to the single-pass plan too
    val onePass = planOf(Retrieval.bm25QueryMaxScore(spark, t, q,
      "qid", "qtext", 3, essentialDfFrac = 1.0,
      gateMinHeadMass = 1L, gateCandFrac = 1.0))
    assert(!onePass.contains("LeftSemi"),
      "all-essential split has no head terms yet planned a semi-join")
  }

  test("bm25ShardedQueryMaxScore: the candidate gate survives the " +
       "shard union (every shard leg doc-gated)") {
    val stamp = System.nanoTime()
    val (s0, s1) = (s"plan_sms0_$stamp", s"plan_sms1_$stamp")
    val c = msCorpus()
    Retrieval.bm25Build(c.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", s0, buckets = 2)
    Retrieval.bm25Build(c.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", s1, buckets = 2)
    val q = Seq((1L, "aaa bbb w3")).toDF("qid", "qtext")
    val r = withNoAqe(Retrieval.bm25ShardedQueryMaxScore(spark,
      Seq(s0, s1), q, "qid", "qtext", 3, essentialDfFrac = 0.05,
      gateMinHeadMass = 1L, gateCandFrac = 1.0))
    val plan = withNoAqe(planOf(r))
    assert(plan.contains("LeftSemi"),
      s"sharded MaxScore lost its candidate semi-join:\n$plan")
    // the gate applies per shard leg: each shard's postings scan sits
    // under SOME LeftSemi (one gated leg going missing would silently
    // push that shard's head postings ungated)
    val semis = withNoAqe(r.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.joinType.toString == "LeftSemi" => j
    })
    assert(semis.nonEmpty,
      s"no LeftSemi node collected — structural walk found nothing:\n$plan")
    for (shard <- Seq(s0, s1)) {
      assert(semis.exists(_.collectLeaves().exists(
          _.toString.contains(shard))),
        s"shard $shard's postings leg is not candidate-gated:\n$plan")
    }
  }

  test("OPQ serving: the mat_vec rotation reaches the query plan " +
       "exactly when the index is OPQ-built; refine scans the raw table") {
    import graft.operators.ProductQuant
    val vecs = (0 until 80).map { i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 31 + j * 7) % 11) / 10.0))
    }.toDF("vec_id", "embedding")
    val (opqT, plainT) = (s"plan_opq_${System.nanoTime()}",
      s"plan_opqp_${System.nanoTime()}")
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", opqT,
      m = 2, ksub = 4, nlist = 3, buckets = 2, opq = true)
    ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", plainT,
      m = 2, ksub = 4, nlist = 3, buckets = 2)
    // the query frame must come from a SOURCE, not a LocalRelation:
    // Catalyst's ConvertToLocalRelation constant-folds mat_vec over
    // in-memory rows at plan time (rotation applied, node invisible) —
    // reading the index's own parquet raw table keeps the kernel
    // where production query plans have it
    def plan(t: String) = {
      val q = spark.table(s"${t}_vecs")
        .filter(col("nid") % 20 === 0)
        .select(col("nid").as("vec_id"), col("nvec").as("embedding"))
      planOf(ProductQuant.ivfPqQuery(spark, t, q,
        "vec_id", "embedding", 3, probeFrac = 1.0))
    }
    val opqPlan = plan(opqT)
    assert(opqPlan.contains("mat_vec"),
      s"OPQ index served without the rotation kernel:\n$opqPlan")
    assert(opqPlan.contains(s"${opqT}_vecs"),
      "refine leg lost its raw-vector scan")
    // the plain index must NOT pay a rotation it doesn't have
    assert(!plan(plainT).contains("mat_vec"),
      "plain index's query plan grew a rotation kernel")
  }

  test("bm25ShardedQueryMaxScoreGrouped: BOTH mechanisms present — " +
       "per-thread group plans, each pass-2 leg candidate-gated") {
    val stamp = System.nanoTime()
    val (s0, s1) = (s"plan_gms0_$stamp", s"plan_gms1_$stamp")
    val c = msCorpus()
    Retrieval.bm25Build(c.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", s0, buckets = 2)
    Retrieval.bm25Build(c.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", s1, buckets = 2)
    // one safe query per parity: w3 docs are all ODD ids, w4 all EVEN
    // (i % 30 congruences), so each shard group's materialized
    // candidate literal is non-empty — a group with NO candidates
    // constant-folds its gated leg away entirely (also correct, and
    // asserted separately below via the single-parity query)
    val q = Seq((1L, "aaa bbb w3"), (2L, "aaa bbb w4")).toDF("qid", "qtext")
    val probe = new java.util.concurrent.ConcurrentLinkedQueue[
      (Seq[Int], String)]()
    Retrieval.groupPlanProbe.set(probe)
    try {
      Retrieval.bm25ShardedQueryMaxScoreGrouped(spark, Seq(s0, s1), q,
        "qid", "qtext", 3, essentialDfFrac = 0.05,
        gateMinHeadMass = 1L, gateCandFrac = 1.0, parallelism = 2)
    } finally Retrieval.groupPlanProbe.set(null)
    import scala.jdk.CollectionConverters._
    val plans = probe.asScala.toSeq
    // mechanism 1 (plan parallelism): 2 groups × 2 passes = 4 group
    // plans deposited by the per-thread stages — a silent reroute to
    // the single-plan form (or to the exact leg) deposits 2 or 0
    assert(plans.size == 4,
      s"expected 4 thread-group plans (2 groups × 2 passes), got " +
        s"${plans.size}: ${plans.map(_._1)}")
    assert(plans.map(_._1).distinct.size == 2,
      s"expected 2 distinct shard groups, got ${plans.map(_._1).distinct}")
    // mechanism 2 (MaxScore pruning): each group's PASS-2 plan carries
    // the LeftSemi candidate gate over that group's own shard scan
    // (pass 1 is the ungated essential leg, so per group: exactly one
    // of the two deposited plans is gated)
    for ((g, shard) <- Seq(Seq(0) -> s0, Seq(1) -> s1)) {
      val mine = plans.filter(_._1 == g).map(_._2)
      assert(mine.count(_.contains("LeftSemi")) == 1,
        s"group $g: expected exactly one candidate-gated pass over " +
          s"$shard, got ${mine.count(_.contains("LeftSemi"))}")
      assert(mine.forall(_.contains(shard)),
        s"group $g's plans do not scan its shard $shard")
    }
    // and the empty-candidate fold: a single-parity query (w3 = odd
    // docs only) leaves the even shard's group with an EMPTY
    // materialized candidate literal — its pass-2 gated leg must fold
    // away at plan time (no scan of that shard at all), which is the
    // S² fix paying a second dividend: a shard with no candidates
    // costs zero, not a semi-join against nothing
    val probe2 = new java.util.concurrent.ConcurrentLinkedQueue[
      (Seq[Int], String)]()
    Retrieval.groupPlanProbe.set(probe2)
    try {
      Retrieval.bm25ShardedQueryMaxScoreGrouped(spark, Seq(s0, s1),
        Seq((1L, "aaa bbb w3")).toDF("qid", "qtext"),
        "qid", "qtext", 3, essentialDfFrac = 0.05,
        gateMinHeadMass = 1L, gateCandFrac = 1.0, parallelism = 2)
    } finally Retrieval.groupPlanProbe.set(null)
    val plans2 = probe2.asScala.toSeq
    val evenP2 = plans2.filter(_._1 == Seq(0)).map(_._2)
    // pass 1 (essential terms, ungated) scans the shard as it must;
    // pass 2's gated leg must FOLD (no LeftSemi, no second scan)
    assert(evenP2.size == 2 && evenP2.count(_.contains(s0)) == 1 &&
      !evenP2.exists(_.contains("LeftSemi")),
      "the candidate-less even shard's pass-2 leg did not fold away " +
        s"(scans=${evenP2.count(_.contains(s0))}, " +
        s"semis=${evenP2.count(_.contains("LeftSemi"))})")
    val oddP2 = plans2.filter(_._1 == Seq(1)).map(_._2)
    assert(oddP2.count(_.contains("LeftSemi")) == 1,
      "the odd shard (all candidates) lost its gated pass")
  }

  test("blockMax: the verified candidate set reaches the postings scan " +
       "as pushed doc IN (replacing the semi-join); past the per-value " +
       "cap as pushed blk IN under it") {
    val stamp = System.nanoTime()
    val t = s"plan_bm_$stamp"
    Retrieval.bm25Build(msCorpus(), "doc_id", "text", t, buckets = 2,
      blockMax = true, blockWidth = 8)
    val q = Seq((1L, "aaa bbb w3")).toDF("qid", "qtext")
    val pruned = planOf(Retrieval.bm25QueryMaxScore(spark, t, q,
      "qid", "qtext", 3, essentialDfFrac = 0.05,
      gateMinHeadMass = 1L, gateCandFrac = 1.0))
    // the SKIP MECHANISM: the candidate ids are a pushed per-value IN
    // on the doc-sorted files — parquet page stats skip, not post-scan
    // filtering — and the semi-join is GONE (the pushed set IS the
    // exact candidate set, so the join would be a second, redundant
    // application of the same gate)
    assert(pruned.contains("In(doc_id"),
      s"blockMax pruned path did not push the candidate doc IN:\n$pruned")
    assert(!pruned.contains("LeftSemi"),
      s"blockMax doc push should replace the semi-join, not stack on " +
        s"it:\n$pruned")
    // past the per-value cap: 280 identically-scored candidates keep
    // the semi-join and push the coarser blk IN above it — CLUSTERED
    // in the first half of doc space, so the candidate blocks cover
    // under half the corpus blocks (the push's engagement condition:
    // a blk IN that covers most blocks skips nothing and is refused)
    val big = (0 until 600).map(i =>
      (i.toLong, (if (i < 280) "www " else "") + "aaa bbb"))
      .toDF("doc_id", "text")
    val t2 = s"plan_bmblk_$stamp"
    Retrieval.bm25Build(big, "doc_id", "text", t2, buckets = 2,
      blockMax = true, blockWidth = 8)
    val q2 = Seq((1L, "www aaa bbb")).toDF("qid", "qtext")
    val blkPlan = planOf(Retrieval.bm25QueryMaxScore(spark, t2, q2,
      "qid", "qtext", 5, essentialDfFrac = 0.6,
      gateMinHeadMass = 1L, gateCandFrac = 1.0))
    assert(blkPlan.contains("In(blk"),
      s"over-cap candidates did not push the blk IN:\n$blkPlan")
    assert(blkPlan.contains("LeftSemi"),
      s"blk push must keep the exact semi-join under it:\n$blkPlan")
  }

  test("Fusion lexMaxScore: the candidate gate reaches the fused plan " +
       "(the t46 mechanism, asserted not eyeballed)") {
    val t = s"plan_fms_${System.nanoTime()}"
    val c = msCorpus()
    Retrieval.bm25Build(c, "doc_id", "text", t, buckets = 2)
    val emb = c.select(col("doc_id").as("vec_id"),
      array((col("doc_id") % 7).cast("float"), lit(1.0f)).as("embedding"))
    val q = Seq((1L, "aaa bbb w3")).toDF("qid", "qtext")
      .join(emb.select(col("vec_id").as("qid"),
        col("embedding").as("qvec")), "qid")
    val fused = Fusion.hybridQuery(spark, t, q, "qid", "qtext", "qvec",
      3, kPerLeg = 3, vecCorpus = Some(emb),
      lexMaxScore = Some(Retrieval.MaxScoreDials(essentialDfFrac = 0.05,
        gateMinHeadMass = 1L, gateCandFrac = 1.0)))
    val plan = planOf(fused)
    assert(plan.contains("LeftSemi"),
      s"fused plan lost the MaxScore candidate gate:\n$plan")
    // and the fusion tail is still the bounded top-k aggregate, not a
    // window sort over the fused candidates
    assert(!plan.contains("Window"),
      s"fusion tail reintroduced a window sort:\n$plan")
  }
}
