package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "cat cat cat"),
    (4L, "a completely different document entirely"),
    (5L, "")).toDF("doc_id", "text")

  /** Reference BM25 in plain Scala for the hand-check: same formula,
    * same micro-unit rounding.
    */
  private def refScore(terms: Seq[String],
                       docs: Map[Long, Seq[String]]): Map[Long, Long] = {
    val indexed = docs.filter(_._2.nonEmpty)
    val n = indexed.size.toDouble
    val avgdl = indexed.values.map(_.size).sum.toDouble / n
    val dfm = indexed.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toDouble }
    val out = for ((id, toks) <- indexed) yield {
      val s = terms.distinct.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0L
        else {
          val df = dfm(t)
          val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
          val w = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * toks.size / avgdl))
          math.round(idf * w * 1e6)
        }
      }.sum
      id -> s
    }
    out.filter(_._2 != 0L)
  }

  test("bm25Query matches the hand formula; empty docs excluded from N/avgdl") {
    Retrieval.bm25Build(corpus, "doc_id", "text", "bm25_spec", buckets = 2)
    val q = Seq((100L, "cat sat")).toDF("qid", "qtext")
    val got = Retrieval.bm25Query(spark, "bm25_spec", q, "qid", "qtext", 10)
      .select("doc_id", "score_micro", "rnk")
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
    val docsMap = corpus.as[(Long, String)].collect().toMap
      .map { case (k, v) => k -> v.split("\\s+").filter(_.nonEmpty).toSeq }
    val expect = refScore(Seq("cat", "sat"), docsMap)
    assert(got.map(r => r._1 -> r._2).toMap == expect)
    // ranked (score desc, doc_id asc), ranks contiguous from 1
    assert(got.map(_._3) == (1 to got.size))
    assert(got.map(_._2).sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true })
  }

  test("append-built index answers identically to whole-built") {
    Retrieval.bm25Build(corpus.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", "bm25_spec_app", buckets = 2)
    Retrieval.bm25Append(spark, "bm25_spec_app",
      corpus.filter(col("doc_id") % 2 === 1), "doc_id", "text")
    Retrieval.bm25Build(corpus, "doc_id", "text", "bm25_spec_whole",
      buckets = 2)
    val q = Seq((1L, "cat sat"), (2L, "different dog")).toDF("qid", "qtext")
    def run(t: String) =
      Retrieval.bm25Query(spark, t, q, "qid", "qtext", 10)
        .as[(Long, Long, Long, Int)].collect().toSet
    assert(run("bm25_spec_app") == run("bm25_spec_whole"))
  }

  test("unknown query terms score nothing; empty index throws") {
    Retrieval.bm25Build(corpus, "doc_id", "text", "bm25_spec_unk",
      buckets = 2)
    val q = Seq((1L, "zzzz qqqq")).toDF("qid", "qtext")
    assert(Retrieval.bm25Query(spark, "bm25_spec_unk", q,
      "qid", "qtext", 5).count() == 0)
    Retrieval.bm25Build(corpus.filter(col("doc_id") < 0),
      "doc_id", "text", "bm25_spec_empty", buckets = 2)
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25Query(spark, "bm25_spec_empty", q, "qid", "qtext", 5)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("maxDfFrac prunes stop terms; under-cap queries stay exact") {
    Retrieval.bm25Build(corpus, "doc_id", "text", "bm25_spec_prune",
      buckets = 2)
    // "the" has df 2/4; "cat" df 2/4; with maxDfFrac = 0.4 both prune
    // (df cap = floor(0.4·4) = 1) and only df-1 terms score
    val q = Seq((1L, "the cat mat")).toDF("qid", "qtext")
    val exact = Retrieval.bm25Query(spark, "bm25_spec_prune", q,
      "qid", "qtext", 10).select("doc_id").as[Long].collect().toSet
    assert(exact == Set(1L, 2L, 3L)) // the/cat reach docs 1-3
    val pruned = Retrieval.bm25Query(spark, "bm25_spec_prune", q,
      "qid", "qtext", 10, maxDfFrac = 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(pruned == Set(1L)) // only "mat" (df 1) survives the cap
    // a query whose terms are all under the cap is bit-identical
    val rare = Seq((2L, "different entirely")).toDF("qid", "qtext")
    def run(frac: Double) = Retrieval.bm25Query(spark, "bm25_spec_prune",
      rare, "qid", "qtext", 10, maxDfFrac = frac)
      .select("doc_id", "score_micro", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(run(1.0) == run(0.4) && run(1.0).nonEmpty)
  }

  test("bm25QueryMaxScore ≡ bm25Query: safe pruning, per-query fallback, " +
       "sub-k candidates, tombstones, stop-term dial") {
    // every doc carries the head terms aaa/bbb (df = N, near-zero ub),
    // a rare w-term (df 4 — essential at the default dial), and a
    // mid-df x-term (df ~17 — head, but with real upper-bound mass);
    // doc 0 is head-only-heavy (high aaa tf) to catch wrongful pruning
    val n = 120
    val docsMS = (0 until n).map { i =>
      (i.toLong, s"aaa bbb w${i % 30} x${i % 7}" +
        (if (i == 0) " aaa aaa aaa" else ""))
    }.toDF("doc_id", "text")
    Retrieval.bm25Build(docsMS, "doc_id", "text", "bm25_spec_ms",
      buckets = 2)
    val q = Seq(
      (1L, "aaa bbb w3"), // SAFE: tiny head ub < rare-term threshold
      (2L, "aaa x2 x3"),  // unsafe: mid-df heads out-bound the rarest
      (3L, "aaa bbb"),    // all-head boundary probe (rarest forced in)
      (4L, "w5"),         // all-essential — nothing to prune
      (5L, "zzzz aaa")    // unindexed term + head
    ).toDF("qid", "qtext")
    def exact(k: Int, frac: Double = 1.0) =
      Retrieval.bm25Query(spark, "bm25_spec_ms", q, "qid", "qtext", k,
        maxDfFrac = frac).as[(Long, Long, Long, Int)].collect().toSet
    def ms(k: Int, ess: Double = 0.05, frac: Double = 1.0) =
      Retrieval.bm25QueryMaxScore(spark, "bm25_spec_ms", q, "qid",
        "qtext", k, essentialDfFrac = ess, maxDfFrac = frac,
        // toy-scale gate dials: engage on ANY head mass so the pruned
        // path (not the cost gate's exact routing) is what's tested
        gateMinHeadMass = 1L, gateCandFrac = 1.0)
        .as[(Long, Long, Long, Int)].collect().toSet
    assert(ms(3) == exact(3) && ms(3).nonEmpty)
    // k above the candidate counts → the <k-candidates per-query
    // fallback must keep head-only docs (doc 0) rankable
    assert(ms(10) == exact(10))
    // dial extremes: everything essential (short-circuits to the exact
    // single pass) and near-nothing essential (rarest-only sets)
    assert(ms(3, ess = 1.0) == exact(3))
    assert(ms(3, ess = 0.001) == exact(3))
    // the bound must use the tombstone-CORRECTED df (corrections raise
    // idf — a raw-df bound would under-estimate and prune wrongly)
    Retrieval.bm25Delete(spark, "bm25_spec_ms",
      docsMS.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
    assert(ms(3) == exact(3) && ms(3).nonEmpty)
    // stop-term dial drops over-cap terms BEFORE the essential split,
    // exactly bm25Query's contract
    assert(ms(3, frac = 0.5) == exact(3, frac = 0.5))
  }

  test("bm25ShardedQueryMaxScore ≡ bm25ShardedQuery ≡ whole-index " +
       "exact, pruning and shard split both invisible") {
    val n = 120
    val docsMS = (0 until n).map { i =>
      (i.toLong, s"aaa bbb w${i % 30} x${i % 7}" +
        (if (i == 0) " aaa aaa aaa" else ""))
    }.toDF("doc_id", "text")
    Retrieval.bm25Build(docsMS.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", "bm25_spec_sms0", buckets = 2)
    Retrieval.bm25Build(docsMS.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", "bm25_spec_sms1", buckets = 2)
    Retrieval.bm25Build(docsMS, "doc_id", "text", "bm25_spec_smsw",
      buckets = 2)
    val q = Seq((1L, "aaa bbb w3"), (2L, "aaa x2 x3"), (3L, "aaa bbb"),
      (4L, "w5"), (5L, "zzzz aaa")).toDF("qid", "qtext")
    val shards = Seq("bm25_spec_sms0", "bm25_spec_sms1")
    def whole(k: Int) = Retrieval.bm25Query(spark, "bm25_spec_smsw", q,
      "qid", "qtext", k).as[(Long, Long, Long, Int)].collect().toSet
    def sms(k: Int) = Retrieval.bm25ShardedQueryMaxScore(spark, shards,
      q, "qid", "qtext", k, essentialDfFrac = 0.05,
      gateMinHeadMass = 1L, gateCandFrac = 1.0)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(sms(3) == whole(3) && sms(3).nonEmpty)
    assert(sms(10) == whole(10)) // sub-k per-query fallback, sharded
    // per-shard tombstones: the GLOBAL fold must drive bound + scores
    Retrieval.bm25Delete(spark, "bm25_spec_sms0",
      docsMS.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
    Retrieval.bm25Delete(spark, "bm25_spec_smsw",
      docsMS.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
    assert(sms(3) == whole(3) && sms(3).nonEmpty)
  }

  test("bm25ShardedQueryMaxScoreGrouped ≡ lazy sharded MaxScore ≡ " +
       "whole-index exact: grouping, pruning, shard split all invisible") {
    val n = 120
    val docsMS = (0 until n).map { i =>
      (i.toLong, s"aaa bbb w${i % 30} x${i % 7}" +
        (if (i == 0) " aaa aaa aaa" else ""))
    }.toDF("doc_id", "text")
    val stamp = System.nanoTime()
    // 4 shards so parallelism 3 exercises UNEVEN groups (2+2) through
    // both MaxScore passes, not just the degenerate one-shard-per-group
    val shards = (0 until 4).map { i =>
      val t = s"bm25_gms${i}_$stamp"
      Retrieval.bm25Build(docsMS.filter(
          graft.operators.Sharding.shardOf(col("doc_id"), 4) === i),
        "doc_id", "text", t, buckets = 2)
      t
    }
    val w = s"bm25_gmsw_$stamp"
    Retrieval.bm25Build(docsMS, "doc_id", "text", w, buckets = 2)
    val q = Seq((1L, "aaa bbb w3"), (2L, "aaa x2 x3"), (3L, "aaa bbb"),
      (4L, "w5"), (5L, "zzzz aaa")).toDF("qid", "qtext")
    def whole(k: Int) = Retrieval.bm25Query(spark, w, q,
      "qid", "qtext", k).as[(Long, Long, Long, Int)].collect().toSet
    def gms(k: Int, par: Int) =
      Retrieval.bm25ShardedQueryMaxScoreGrouped(spark, shards, q,
        "qid", "qtext", k, essentialDfFrac = 0.05,
        gateMinHeadMass = 1L, gateCandFrac = 1.0, parallelism = par)
        .as[(Long, Long, Long, Int)].collect().toSet
    for (par <- Seq(1, 3, 8)) {
      assert(gms(3, par) == whole(3) && gms(3, par).nonEmpty,
        s"grouped MaxScore (par=$par) diverged from whole-index exact")
      // k above the per-query candidate counts → grouped pass-1 finds
      // no rank-k threshold, the per-query exact fallback must fire
      assert(gms(10, par) == whole(10),
        s"grouped MaxScore sub-k fallback (par=$par) diverged")
    }
    // natural dials at toy scale: the cost gate routes the WHOLE batch
    // to the grouped exact plan — still whole-index rows
    assert(Retrieval.bm25ShardedQueryMaxScoreGrouped(spark, shards, q,
        "qid", "qtext", 3, parallelism = 3)
      .as[(Long, Long, Long, Int)].collect().toSet == whole(3))
    // per-shard tombstones: the GLOBAL fold drives bound + scores
    // through the grouped passes too
    // (ids restricted to shard 0's own docs — the sharding contract)
    val del = docsMS.filter(col("doc_id") % 8 === 0 &&
      graft.operators.Sharding.shardOf(col("doc_id"), 4) === 0)
    Retrieval.bm25Delete(spark, shards.head, del.select("doc_id"), "doc_id")
    Retrieval.bm25Delete(spark, w, del.select("doc_id"), "doc_id")
    assert(gms(3, 3) == whole(3) && gms(3, 3).nonEmpty)
  }

  test("bm25PhraseQuery: consecutive-in-order matches only, scored like bm25Query") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),   // contains "alpha beta gamma"
      (2L, "alpha beta xx gamma"),      // tokens present, NOT consecutive
      (3L, "gamma beta alpha"),         // tokens present, wrong order
      (4L, "zz alpha beta gamma"),      // phrase at a later offset
      (5L, "alpha beta")).toDF("doc_id", "text") // incomplete phrase
    Retrieval.bm25Build(docs, "doc_id", "text", "bm25_ph", buckets = 2,
      positions = true)
    val q = Seq((9L, "alpha beta gamma")).toDF("qid", "qtext")
    val got = Retrieval.bm25PhraseQuery(spark, "bm25_ph", q,
      "qid", "qtext", 10).select("doc_id", "score_micro")
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 4L), s"phrase matched: ${got.keySet}")
    // scores equal the bag-of-words scores of the same docs
    val bag = Retrieval.bm25Query(spark, "bm25_ph", q, "qid", "qtext", 10)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    assert(got == bag.view.filterKeys(got.keySet).toMap)
  }

  test("bm25PhraseSnippets: first occurrence, window clamping, exact token slice") {
    val docs = Seq(
      (1L, "aa bb alpha beta gamma cc dd ee"), // interior match: full ±2 window
      (2L, "alpha beta gamma tail"),           // match at doc head: left-clamped
      (3L, "x y z alpha beta gamma"),          // match at doc tail: right-clamped
      (4L, "alpha beta gamma zz alpha beta gamma")) // two occurrences: FIRST wins
      .toDF("doc_id", "text")
    Retrieval.bm25Build(docs, "doc_id", "text", "bm25_snip", buckets = 2,
      positions = true)
    val q = Seq((9L, "alpha beta gamma")).toDF("qid", "qtext")
    val got = Retrieval.bm25PhraseSnippets(spark, "bm25_snip", q,
        "qid", "qtext", docs, "doc_id", "text", 10, context = 2)
      .select("doc_id", "start", "snippet")
      .as[(Long, Long, String)].collect()
      .map { case (id, s, sn) => id -> ((s, sn)) }.toMap
    assert(got(1L) == ((2L, "aa bb alpha beta gamma cc dd")))
    assert(got(2L) == ((0L, "alpha beta gamma tail")))
    assert(got(3L) == ((3L, "y z alpha beta gamma")))
    assert(got(4L) == ((0L, "alpha beta gamma zz alpha")))
    // ranking identical to bm25PhraseQuery's
    val rank = Retrieval.bm25PhraseQuery(spark, "bm25_snip", q,
        "qid", "qtext", 10)
      .select("doc_id", "score_micro", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val snipRank = Retrieval.bm25PhraseSnippets(spark, "bm25_snip", q,
        "qid", "qtext", docs, "doc_id", "text", 10, context = 2)
      .select("doc_id", "score_micro", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(snipRank == rank)
  }

  test("bm25PhraseQuery: duplicate-term phrases align per-offset") {
    val docs = Seq(
      (1L, "go stop go run"),     // "go stop go" consecutive
      (2L, "go stop run go"),     // both gos present, not aligned
      (3L, "stop go go")).toDF("doc_id", "text")
    Retrieval.bm25Build(docs, "doc_id", "text", "bm25_ph2", buckets = 2,
      positions = true)
    val q = Seq((9L, "go stop go")).toDF("qid", "qtext")
    val got = Retrieval.bm25PhraseQuery(spark, "bm25_ph2", q,
      "qid", "qtext", 10).select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L), s"duplicate-term phrase matched: $got")
  }

  test("bm25PhraseQuery: append + delete maintain the positional table") {
    val base = Seq(
      (1L, "one two three four"),
      (2L, "unrelated text entirely")).toDF("doc_id", "text")
    Retrieval.bm25Build(base, "doc_id", "text", "bm25_ph3", buckets = 2,
      positions = true)
    Retrieval.bm25Append(spark, "bm25_ph3",
      Seq((3L, "zz one two three")).toDF("doc_id", "text"),
      "doc_id", "text")
    val q = Seq((9L, "one two three")).toDF("qid", "qtext")
    def hits() = Retrieval.bm25PhraseQuery(spark, "bm25_ph3", q,
      "qid", "qtext", 10).select("doc_id").as[Long].collect().toSet
    assert(hits() == Set(1L, 3L), "appended doc not phrase-findable")
    // grown ≡ whole-built, including scores
    Retrieval.bm25Build(
      base.unionByName(Seq((3L, "zz one two three")).toDF("doc_id", "text")),
      "doc_id", "text", "bm25_ph3w", buckets = 2, positions = true)
    def full(t: String) = Retrieval.bm25PhraseQuery(spark, t, q,
      "qid", "qtext", 10).as[(Long, Long, Long, Int)].collect().toSet
    assert(full("bm25_ph3") == full("bm25_ph3w"))
    // tombstoned doc leaves phrase results immediately; fold rewrites
    // the positional table physically and answers stay fixed
    Retrieval.bm25Delete(spark, "bm25_ph3",
      Seq(1L).toDF("doc_id"), "doc_id")
    assert(hits() == Set(3L), "tombstoned doc still phrase-matched")
    Retrieval.bm25FoldTombstones(spark, "bm25_ph3")
    assert(spark.table("bm25_ph3_pos")
      .filter(col("doc_id") === 1L).count() == 0,
      "fold did not rewrite the positional table")
    assert(hits() == Set(3L))
  }

  test("bm25PhraseQuery maxDfFrac: under-cap phrases exact, all-head phrases truncate deterministically") {
    // df: the=10, of=10 (head), cat=2, rare=1 (tail), fillers df 1
    val docs = Seq(
      (1L, "the of aa"), (2L, "the of bb"), (3L, "the of cc"),
      (4L, "the of dd"), (5L, "the of ee"), (6L, "the of ff"),
      (7L, "the of gg"), (8L, "of the cat"), (9L, "the xx of cat"),
      (10L, "the of rare")).toDF("doc_id", "text")
    Retrieval.bm25Build(docs, "doc_id", "text", "bm25_ph5", buckets = 2,
      positions = true)
    def run(qtext: String, frac: Double) =
      Retrieval.bm25PhraseQuery(spark, "bm25_ph5",
        Seq((9L, qtext)).toDF("qid", "qtext"), "qid", "qtext", 10,
        maxDfFrac = frac)
        .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    // mixed phrase (rarest term "cat" df 2 ≤ cap 3): dial is a no-op
    assert(run("the cat", 0.3) == run("the cat", 1.0) &&
      run("the cat", 1.0).keySet == Set(8L))
    // tail phrase: likewise exact
    assert(run("of rare", 0.3) == run("of rare", 1.0) &&
      run("of rare", 1.0).keySet == Set(10L))
    // all-head phrase (min df 10 > cap 3): truncated matching — a
    // deterministic SUBSET of the exact matches, scores of returned
    // docs exact
    val exact = run("the of", 1.0)
    assert(exact.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 10L))
    val trunc = run("the of", 0.3)
    assert(trunc.keySet.subsetOf(exact.keySet),
      s"truncated matches ${trunc.keySet} not a subset")
    assert(trunc == run("the of", 0.3), "truncation not deterministic")
    assert(trunc.forall { case (d, s) => exact(d) == s },
      "truncated scores diverge from exact")
  }

  test("bm25ProximityQuery: order-free window matching, scored like bm25Query") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),        // span 2 (adjacent)
      (2L, "gamma xx beta yy alpha"),        // unordered, span 4 → w ≥ 5
      (3L, "alpha beta z1 z2 z3 z4 z5 z6 gamma"), // span 8 → w ≥ 9
      (4L, "alpha beta zz")).toDF("doc_id", "text") // incomplete
    Retrieval.bm25Build(docs, "doc_id", "text", "bm25_nx", buckets = 2,
      positions = true)
    val q = Seq((9L, "alpha beta gamma")).toDF("qid", "qtext")
    def run(w: Int) = Retrieval.bm25ProximityQuery(spark, "bm25_nx", q,
      "qid", "qtext", 10, window = w)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    assert(run(3).keySet == Set(1L), s"w=3: ${run(3).keySet}")
    assert(run(5).keySet == Set(1L, 2L), s"w=5: ${run(5).keySet}")
    assert(run(9).keySet == Set(1L, 2L, 3L), s"w=9: ${run(9).keySet}")
    // matched docs carry their exact bag-of-words scores
    val bag = Retrieval.bm25Query(spark, "bm25_nx", q, "qid", "qtext", 10)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    assert(run(5) == bag.view.filterKeys(run(5).keySet).toMap)
    // every phrase match is a proximity match at window = phrase length
    val ph = Retrieval.bm25PhraseQuery(spark, "bm25_nx", q,
      "qid", "qtext", 10).select("doc_id").as[Long].collect().toSet
    assert(ph.subsetOf(run(3).keySet))
  }

  test("bm25ProximityQuery: duplicate terms collapse; both plans exact; dial no-op under cap") {
    val docs = Seq(
      (1L, "go stop"), (2L, "stop zz go"),
      (3L, "go alone"), (4L, "stop alone")).toDF("doc_id", "text")
    Retrieval.bm25Build(docs, "doc_id", "text", "bm25_nx2", buckets = 2,
      positions = true)
    def run(qtext: String, w: Int, gate: Long = 1L << 22,
            frac: Double = 1.0) =
      Retrieval.bm25ProximityQuery(spark, "bm25_nx2",
        Seq((9L, qtext)).toDF("qid", "qtext"), "qid", "qtext", 10,
        window = w, gateMinPosMass = gate, maxDfFrac = frac)
        .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    // duplicate query terms are one distinct-term requirement
    assert(run("go go stop", 2).keySet == Set(1L))
    assert(run("go go stop", 3).keySet == Set(1L, 2L))
    // single-term query: every doc containing the term, any window
    assert(run("go", 1).keySet == Set(1L, 2L, 3L))
    // forced-gated ≡ forced-direct, and the dial is exact under cap
    val direct = run("go stop", 3, gate = Long.MaxValue)
    assert(direct == run("go stop", 3, gate = 0L))
    assert(direct == run("go stop", 3, frac = 0.9))
  }

  test("bm25ProximitySnippets: leftmost cover start, window+context slice") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "gamma xx beta yy alpha"),
      (5L, "pre1 pre2 alpha beta gamma post1"),
      (6L, "alpha zz zz zz zz zz beta gamma")).toDF("doc_id", "text")
    Retrieval.bm25Build(docs, "doc_id", "text", "bm25_nsn", buckets = 2,
      positions = true)
    val q = Seq((9L, "alpha beta gamma")).toDF("qid", "qtext")
    val got = Retrieval.bm25ProximitySnippets(spark, "bm25_nsn", q,
        "qid", "qtext", docs, "doc_id", "text", 10, window = 3,
        context = 1)
      .select("doc_id", "start", "snippet")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // w=3: docs 1 (cover at 0) and 5 (cover at 2) match; 2 (span 5)
    // and 6 (beta/gamma adjacent but alpha far) don't
    val gotKeys = got.keySet
    assert(gotKeys == Set(1L, 5L), s"matched: $gotKeys")
    // doc 1: start 0, slice [max(0-1,0) .. 0+3+1-1] = tokens 0..3
    assert(got(1L) == (0L, "alpha beta gamma delta"))
    // doc 5: start 2 (leftmost cover anchored at alpha), slice
    // [1 .. 2+3+1-1=5] = "pre2 alpha beta gamma post1"
    assert(got(5L) == (2L, "pre2 alpha beta gamma post1"))
    // ranking identical to bm25ProximityQuery on the same window
    val prox = Retrieval.bm25ProximityQuery(spark, "bm25_nsn", q,
        "qid", "qtext", 10, window = 3)
      .select("doc_id", "score_micro", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val ranked = Retrieval.bm25ProximitySnippets(spark, "bm25_nsn", q,
        "qid", "qtext", docs, "doc_id", "text", 10, window = 3,
        context = 1)
      .select("doc_id", "score_micro", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(ranked == prox)
  }

  test("bm25Snippets: best-scoring term's first occurrence, +-context slice") {
    Retrieval.bm25Build(corpus, "doc_id", "text", "bm25_bsn", buckets = 2,
      positions = true)
    val q = Seq((100L, "cat sat")).toDF("qid", "qtext")
    val got = Retrieval.bm25Snippets(spark, "bm25_bsn", q, "qid", "qtext",
        corpus, "doc_id", "text", 10, context = 1)
      .select("doc_id", "start", "snippet")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // doc 1 "the cat sat on the mat": cat and sat tie on partial
    // (equal df, tf, dl) -> term asc picks "cat", first occurrence 1,
    // slice tokens [0..2]
    assert(got(1L) == (1L, "the cat sat"))
    // doc 2 "the dog sat": only "sat" scores -> start 2, tokens [1..3]
    assert(got(2L) == (2L, "dog sat"))
    // doc 3 "cat cat cat": only "cat" -> start 0, clamped slice [0..1]
    assert(got(3L) == (0L, "cat cat"))
    // ranking identical to bm25Query
    val bag = Retrieval.bm25Query(spark, "bm25_bsn", q, "qid", "qtext", 10)
      .select("doc_id", "score_micro", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val ranked = Retrieval.bm25Snippets(spark, "bm25_bsn", q, "qid",
        "qtext", corpus, "doc_id", "text", 10, context = 1)
      .select("doc_id", "score_micro", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(ranked == bag)
  }

  test("bm25ProximityQuery maxPosMass: over-budget batches auto-route to the truncation dial") {
    // 200 docs all containing the query terms → candBound = 200 for an
    // exact request; a 30-position budget (docs are 3 tokens, so
    // avgdl = 3 ⇒ budgetDocs = 10, window-independent) forces
    // capEff = 10 and the batch must serve the deterministic
    // hash-sampled candidates instead of the full set — bit-identical
    // to an explicit maxDfFrac dial yielding the same cap (0.05·200)
    val docs = (1L to 200L).map(i => (i, s"red blue w$i")).toDF("doc_id", "text")
    Retrieval.bm25Build(docs, "doc_id", "text", "bm25_nab", buckets = 2,
      positions = true)
    val q = Seq((9L, "red blue")).toDF("qid", "qtext")
    def run(posMass: Long = 1L << 31, frac: Double = 1.0) =
      Retrieval.bm25ProximityQuery(spark, "bm25_nab", q, "qid", "qtext",
          300, window = 4, maxPosMass = posMass, maxDfFrac = frac)
        .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    val exact = run()
    assert(exact.keySet == (1L to 200L).toSet)
    val routed = run(posMass = 30L)
    val dialed = run(frac = 0.05)
    assert(routed == dialed,
      "auto-routed batch must equal the equivalent explicit dial")
    assert(routed.nonEmpty && routed.size < exact.size,
      s"expected a strict sampled subset, got ${routed.size}/${exact.size}")
    assert(routed.forall { case (id, s) => exact(id) == s },
      "sampled candidates must keep their exact scores")
    // a roomy budget leaves the batch exact (the bound fits)
    assert(run(posMass = 1L << 20) == exact)
  }

  test("sharded NEAR budget divides across shards: routes exactly when " +
       "the single-index plan routes; perShardBudget restores legacy") {
    // 200 3-token docs split evenly: family budget 30 divides to 15 per
    // shard → capEff 5 over per-shard df 100 — the SAME 5% hash-sample
    // rate the single index derives (capEff 10 over df 200), so the
    // divided route must reproduce the single-index routed output
    // bit-for-bit (the hash sample keys on doc_id alone and each doc
    // lives in exactly one shard)
    val docs = (1L to 200L).map(i => (i, s"red blue w$i")).toDF("doc_id", "text")
    val stamp = System.nanoTime()
    val (whole, s0, s1) =
      (s"bm25_nbw_$stamp", s"bm25_nb0_$stamp", s"bm25_nb1_$stamp")
    Retrieval.bm25Build(docs, "doc_id", "text", whole, buckets = 2,
      positions = true)
    Retrieval.bm25Build(docs.filter($"doc_id" % 2 === 0), "doc_id", "text",
      s0, buckets = 2, positions = true)
    Retrieval.bm25Build(docs.filter($"doc_id" % 2 =!= 0), "doc_id", "text",
      s1, buckets = 2, positions = true)
    val q = Seq((9L, "red blue")).toDF("qid", "qtext")
    def one(posMass: Long) = Retrieval.bm25ProximityQuery(spark, whole, q,
        "qid", "qtext", 300, window = 4, maxPosMass = posMass)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    def sharded(posMass: Long, perShard: Boolean = false) =
      Retrieval.bm25ShardedProximityQuery(spark, Seq(s0, s1), q, "qid",
          "qtext", 300, window = 4, maxPosMass = posMass,
          perShardBudget = perShard)
        .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    val exact = one(1L << 31)
    assert(sharded(1L << 31) == exact, "roomy family budget must stay exact")
    val routedOne = one(30L)
    val routedSharded = sharded(30L)
    assert(routedSharded == routedOne,
      "divided budget must route exactly when the single-index plan routes")
    assert(routedSharded.nonEmpty && routedSharded.size < exact.size,
      s"expected a strict sampled subset, got ${routedSharded.size}/${exact.size}")
    // legacy per-shard budget carries S x the family mass: a 10% rate
    // per shard — a strict superset of the divided sample
    // (hash-threshold samples nest)
    val legacy = sharded(30L, perShard = true)
    assert(routedSharded.keySet.subsetOf(legacy.keySet) &&
      legacy.size > routedSharded.size,
      "perShardBudget must relax the dial to the legacy S x budget")
  }

  test("bm25PhraseQuery requires a positional index; plain build drops a stale one") {
    val docs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    Retrieval.bm25Build(docs, "doc_id", "text", "bm25_ph4", buckets = 2)
    val q = Seq((9L, "aa bb")).toDF("qid", "qtext")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25PhraseQuery(spark, "bm25_ph4", q, "qid", "qtext", 5)
    }
    assert(e.getMessage.contains("positions"))
    // positional build then a positions-less REBUILD: the stale _pos
    // table must not survive to answer for the new corpus
    Retrieval.bm25Build(docs, "doc_id", "text", "bm25_ph4", buckets = 2,
      positions = true)
    assert(Retrieval.bm25PhraseQuery(spark, "bm25_ph4", q,
      "qid", "qtext", 5).count() == 1)
    Retrieval.bm25Build(docs, "doc_id", "text", "bm25_ph4", buckets = 2)
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier("bm25_ph4_pos")),
      "rebuild without positions left the stale positional table")
  }

  test("positional table stores delta-encoded gaps; decode restores exact offsets") {
    import graft.functions.GraftFunctions
    // "rep" occurs at offsets 0, 2, 5 — gaps (0, 2, 3)
    val docs = Seq((1L, "rep xx rep yy zz rep")).toDF("doc_id", "text")
    Retrieval.bm25Build(docs, "doc_id", "text", "bm25_delta", buckets = 2,
      positions = true)
    spark.catalog.refreshTable("bm25_delta_pos")
    val stored = spark.table("bm25_delta_pos")
      .filter($"term" === "rep").select("positions")
      .as[Seq[Int]].head()
    assert(stored == Seq(0, 2, 3),
      s"positions not gap-encoded on disk: $stored")
    val decoded = spark.table("bm25_delta_pos")
      .filter($"term" === "rep")
      .select(GraftFunctions.deltaDec($"positions"))
      .as[Seq[Int]].head()
    assert(decoded == Seq(0, 2, 5))
    // and the phrase intersection reads the decoded offsets: a phrase
    // spanning the gap-encoded occurrences matches at the right starts
    val q = Seq((9L, "zz rep")).toDF("qid", "qtext")
    val hit = Retrieval.bm25PhraseQuery(spark, "bm25_delta", q,
      "qid", "qtext", 5).select("doc_id").as[Long].collect().toSeq
    assert(hit == Seq(1L))
  }

  test("index never shuffles: no exchange over the postings/dictionary scans") {
    Retrieval.bm25Build(corpus, "doc_id", "text", "bm25_spec_plan",
      buckets = 2)
    val q = Seq((1L, "cat sat the")).toDF("qid", "qtext")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val r = Retrieval.bm25Query(spark, "bm25_spec_plan", q,
        "qid", "qtext", 5)
      val plan = r.queryExecution.executedPlan
      val offending = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.child.collectLeaves().exists(l =>
            l.toString.contains("bm25_spec_plan") &&
              !l.toString.contains("bm25_spec_plan_stats")) => e
      }
      assert(offending.isEmpty,
        s"index-side shuffle found:\n${offending.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("sharded serving == one whole-corpus index (bag, phrase, NEAR), tombstones included") {
    // a corpus big enough that shard-local stats would visibly diverge
    // from global ones if the fold were wrong
    val docs = graft.sources.Generators.randomText(spark, 200, seed = 77L,
        wordsMin = 5, wordsMax = 25, partitions = 4)
      .select(col("id").as("doc_id"), col("text"))
    val stamp = System.nanoTime()
    val whole = s"bm25_shard_whole_$stamp"
    val s0 = s"bm25_shard_a_$stamp"
    val s1 = s"bm25_shard_b_$stamp"
    Retrieval.bm25Build(docs, "doc_id", "text", whole, buckets = 2,
      positions = true)
    Retrieval.bm25Build(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", s0, buckets = 2, positions = true)
    Retrieval.bm25Build(docs.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", s1, buckets = 2, positions = true)
    val q = docs.filter(col("doc_id") % 40 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(graft.operators.TextOps.tokens(
          lower(col("text"))), 1, 3)).as("qtext"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "rnk").as[(Long, Long, Long, Int)].collect().toSeq
    // bag of words
    assert(rows(Retrieval.bm25ShardedQuery(spark, Seq(s0, s1), q,
        "qid", "qtext", 5)) ===
      rows(Retrieval.bm25Query(spark, whole, q, "qid", "qtext", 5)),
      "sharded bag-of-words diverged from the whole index")
    // phrase
    assert(rows(Retrieval.bm25ShardedPhraseQuery(spark, Seq(s0, s1), q,
        "qid", "qtext", 5)) ===
      rows(Retrieval.bm25PhraseQuery(spark, whole, q, "qid", "qtext", 5)),
      "sharded phrase diverged from the whole index")
    // NEAR
    assert(rows(Retrieval.bm25ShardedProximityQuery(spark, Seq(s0, s1), q,
        "qid", "qtext", 5, window = 8)) ===
      rows(Retrieval.bm25ProximityQuery(spark, whole, q, "qid", "qtext", 5,
        window = 8)),
      "sharded NEAR diverged from the whole index")
    // tombstones on ONE shard must fold into the global stats exactly
    // like a whole-index delete of the same ids
    val dead = docs.filter(col("doc_id") % 10 === 4).select("doc_id")
    Retrieval.bm25Delete(spark, whole, dead, "doc_id")
    Retrieval.bm25Delete(spark, s0, dead.filter(col("doc_id") % 2 === 0),
      "doc_id")
    Retrieval.bm25Delete(spark, s1, dead.filter(col("doc_id") % 2 =!= 0),
      "doc_id")
    assert(rows(Retrieval.bm25ShardedQuery(spark, Seq(s0, s1), q,
        "qid", "qtext", 5)) ===
      rows(Retrieval.bm25Query(spark, whole, q, "qid", "qtext", 5)),
      "sharded deletion corrections diverged from the whole index")
  }

  test("grouped (plan-parallel) sharded serving == lazy sharded serving " +
       "(bag, phrase, NEAR), uneven groups included") {
    val docs = graft.sources.Generators.randomText(spark, 200, seed = 91L,
        wordsMin = 5, wordsMax = 25, partitions = 4)
      .select(col("id").as("doc_id"), col("text"))
    val stamp = System.nanoTime()
    val shards = (0 until 4).map { i =>
      val t = s"bm25_grp${i}_$stamp"
      Retrieval.bm25Build(docs.filter(
          graft.operators.Sharding.shardOf(col("doc_id"), 4) === i),
        "doc_id", "text", t, buckets = 2, positions = true)
      t
    }
    val q = docs.filter(col("doc_id") % 40 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(graft.operators.TextOps.tokens(
          lower(col("text"))), 1, 3)).as("qtext"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "rnk").as[(Long, Long, Long, Int)].collect().toSeq
    // parallelism 3 over 4 shards → groups of 2+2; parallelism > S and
    // parallelism 1 degenerate correctly
    for (par <- Seq(1, 3, 8)) {
      assert(rows(Retrieval.bm25ShardedQueryGrouped(spark, shards, q,
          "qid", "qtext", 5, parallelism = par)) ===
        rows(Retrieval.bm25ShardedQuery(spark, shards, q, "qid", "qtext", 5)),
        s"grouped bag (par=$par) diverged from the lazy sharded plan")
    }
    assert(rows(Retrieval.bm25ShardedPhraseQueryGrouped(spark, shards, q,
        "qid", "qtext", 5, parallelism = 3)) ===
      rows(Retrieval.bm25ShardedPhraseQuery(spark, shards, q,
        "qid", "qtext", 5)),
      "grouped phrase diverged from the lazy sharded plan")
    assert(rows(Retrieval.bm25ShardedProximityQueryGrouped(spark, shards, q,
        "qid", "qtext", 5, window = 8, parallelism = 3)) ===
      rows(Retrieval.bm25ShardedProximityQuery(spark, shards, q,
        "qid", "qtext", 5, window = 8)),
      "grouped NEAR diverged from the lazy sharded plan")
  }

  test("blockMax layout ≡ plain: bag + MaxScore bit-identical; " +
       "append/delete/fold maintain the layout; plain rebuild retires it") {
    val n = 120
    val docsMS = (0 until n).map { i =>
      (i.toLong, s"aaa bbb w${i % 30} x${i % 7}" +
        (if (i == 0) " aaa aaa aaa" else ""))
    }.toDF("doc_id", "text")
    val stamp = System.nanoTime()
    val (bm, pl) = (s"bm25_bm_$stamp", s"bm25_bmpl_$stamp")
    // blockWidth 8 → ~15 blocks at toy scale (the layout really splits)
    Retrieval.bm25Build(docsMS, "doc_id", "text", bm, buckets = 2,
      blockMax = true, blockWidth = 8)
    Retrieval.bm25Build(docsMS, "doc_id", "text", pl, buckets = 2)
    assert(spark.table(bm).columns.contains("blk"))
    assert(spark.table(s"${bm}_blkmax").count() > 0)
    val q = Seq((1L, "aaa bbb w3"), (2L, "aaa x2 x3"), (3L, "aaa bbb"),
      (4L, "w5"), (5L, "zzzz aaa")).toDF("qid", "qtext")
    def run(t: String, k: Int = 3) =
      Retrieval.bm25Query(spark, t, q, "qid", "qtext", k)
        .as[(Long, Long, Long, Int)].collect().toSet
    def runMs(t: String, k: Int = 3) =
      Retrieval.bm25QueryMaxScore(spark, t, q, "qid", "qtext", k,
        essentialDfFrac = 0.05, gateMinHeadMass = 1L, gateCandFrac = 1.0)
        .as[(Long, Long, Long, Int)].collect().toSet
    assert(run(bm) == run(pl) && run(bm).nonEmpty)
    // forced dials: the pruned path (scan push + block-UB refinement)
    // answers, and must match the plain layout row for row
    assert(runMs(bm) == runMs(pl) && runMs(bm).nonEmpty)
    assert(runMs(bm, 10) == runMs(pl, 10)) // sub-k per-query fallback
    // append + delete maintain the layout twins; fold keeps the sort
    val more = (n until n + 40).map(i =>
      (i.toLong, s"aaa bbb w${i % 30} x${i % 7}")).toDF("doc_id", "text")
    Retrieval.bm25Append(spark, bm, more, "doc_id", "text")
    Retrieval.bm25Append(spark, pl, more, "doc_id", "text")
    assert(runMs(bm) == runMs(pl) && runMs(bm).nonEmpty)
    Retrieval.bm25Delete(spark, bm,
      docsMS.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
    Retrieval.bm25Delete(spark, pl,
      docsMS.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
    assert(runMs(bm) == runMs(pl)) // stale _blkmax bounds stay valid
    Retrieval.bm25FoldTombstones(spark, bm)
    Retrieval.bm25FoldTombstones(spark, pl)
    assert(runMs(bm) == runMs(pl) && runMs(bm).nonEmpty)
    val sortCols = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(bm))
      .bucketSpec.get.sortColumnNames
    assert(sortCols == Seq("term", "blk", "doc_id"),
      s"fold lost the block-max sort layout: $sortCols")
    // sharded serving over blockMax shards ≡ whole plain index
    val (s0, s1) = (s"bm25_bms0_$stamp", s"bm25_bms1_$stamp")
    Retrieval.bm25Build(docsMS.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", s0, buckets = 2, blockMax = true, blockWidth = 8)
    Retrieval.bm25Build(docsMS.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", s1, buckets = 2, blockMax = true, blockWidth = 8)
    val w = s"bm25_bmw_$stamp"
    Retrieval.bm25Build(docsMS, "doc_id", "text", w, buckets = 2)
    def whole(k: Int) = Retrieval.bm25Query(spark, w, q, "qid", "qtext",
      k).as[(Long, Long, Long, Int)].collect().toSet
    assert(Retrieval.bm25ShardedQueryMaxScore(spark, Seq(s0, s1), q,
        "qid", "qtext", 3, essentialDfFrac = 0.05,
        gateMinHeadMass = 1L, gateCandFrac = 1.0)
      .as[(Long, Long, Long, Int)].collect().toSet == whole(3))
    assert(Retrieval.bm25ShardedQueryMaxScoreGrouped(spark, Seq(s0, s1),
        q, "qid", "qtext", 3, essentialDfFrac = 0.05,
        gateMinHeadMass = 1L, gateCandFrac = 1.0, parallelism = 2)
      .as[(Long, Long, Long, Int)].collect().toSet == whole(3))
    // MIXED layouts: refinement disables family-wide, per-leg push
    // stays where available — rows still the whole-index answer
    val s1pl = s"bm25_bms1pl_$stamp"
    Retrieval.bm25Build(docsMS.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", s1pl, buckets = 2)
    assert(Retrieval.bm25ShardedQueryMaxScore(spark, Seq(s0, s1pl), q,
        "qid", "qtext", 3, essentialDfFrac = 0.05,
        gateMinHeadMass = 1L, gateCandFrac = 1.0)
      .as[(Long, Long, Long, Int)].collect().toSet == whole(3))
    // a plain rebuild over the blockMax index retires the layout
    Retrieval.bm25Build(docsMS, "doc_id", "text", bm, buckets = 2)
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${bm}_blkmeta")))
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${bm}_blkmax")))
    assert(run(bm).nonEmpty)
  }

  test("blockMax blk fallback: candidate sets past the per-value cap " +
       "push block IN under the unchanged semi-join, rows identical") {
    // 600 docs; the first 280 carry the essential term www
    // (df = 280 > maxInPushValues) with IDENTICAL essential sums, so
    // tightening keeps all 300 candidates and the doc-value push is
    // over cap — clustered in half the doc space, so the blk fallback
    // branch (sparse-coverage gate) must serve, exactly
    val docs = (0 until 600).map(i =>
      (i.toLong, (if (i < 280) "www " else "") + "aaa bbb"))
      .toDF("doc_id", "text")
    val stamp = System.nanoTime()
    val (bm, pl) = (s"bm25_blkf_$stamp", s"bm25_blkfpl_$stamp")
    Retrieval.bm25Build(docs, "doc_id", "text", bm, buckets = 2,
      blockMax = true, blockWidth = 8)
    Retrieval.bm25Build(docs, "doc_id", "text", pl, buckets = 2)
    val q = Seq((1L, "www aaa bbb")).toDF("qid", "qtext")
    def runMs(t: String) =
      Retrieval.bm25QueryMaxScore(spark, t, q, "qid", "qtext", 5,
        essentialDfFrac = 0.6, gateMinHeadMass = 1L, gateCandFrac = 1.0)
        .as[(Long, Long, Long, Int)].collect().toSet
    assert(runMs(bm) == runMs(pl) && runMs(bm).nonEmpty)
  }

  test("bm25Build(blockMax) refuses non-integral doc ids loudly") {
    val sdocs = Seq(("a", "cat sat"), ("b", "dog sat"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25Build(sdocs, "doc_id", "text",
        s"bm25_bmstr_${System.nanoTime()}", buckets = 2, blockMax = true)
    }
    assert(e.getMessage.contains("integral"))
  }
}
