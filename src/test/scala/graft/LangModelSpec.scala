package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.LangModel

class LangModelSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("train + score: hand-computed add-one bigram log probs, unseen paths, short docs") {
    val train = Seq((0L, "a b a b"), (2L, "b b")).toDF("doc_id", "text")
    // bigram counts: (a,b)=2 (b,a)=1 (b,b)=1; hist: a=2 b=2; V = |{a,b}| = 2
    val table = s"lm_spec_${System.nanoTime()}"
    LangModel.train(train, "doc_id", "text", table, buckets = 2)

    val docs = Seq(
      (10L, "a b c"),  // seen (a,b) + unseen bigram with seen history (b,c)
      (11L, "x y"),    // unseen history entirely
      (12L, "solo"),   // <2 tokens -> (0, 0)
      (13L, "")        // 0 tokens  -> (0, 0)
    ).toDF("doc_id", "text")
    val got = LangModel.score(spark, table, docs, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect()

    def lp(c: Long, ch: Long, v: Long): Long =
      math.round(math.log((c + 1.0) / (ch + v.toDouble)) * 1e6)
    val exp = Seq(
      (10L, 2L, lp(2, 2, 2) + lp(0, 2, 2)),
      (11L, 1L, lp(0, 0, 2)),
      (12L, 0L, 0L),
      (13L, 0L, 0L))
    assert(got.toSeq === exp)
    // sanity on the hand numbers themselves
    assert(lp(2, 2, 2) === math.round(math.log(0.75) * 1e6))
    assert(lp(0, 0, 2) === math.round(math.log(0.5) * 1e6))
  }

  test("score is parallelism-independent (integer micro sums)") {
    val train = graft.sources.Generators.randomText(spark, 200, seed = 5L,
        wordsMin = 5, wordsMax = 30, partitions = 4)
      .select(col("id").as("doc_id"), col("text"))
    val table = s"lm_spec_par_${System.nanoTime()}"
    LangModel.train(train, "doc_id", "text", table, buckets = 4)
    val a = LangModel.score(spark, table, train, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect()
    val b = LangModel.score(spark, table, train.repartition(13),
      "doc_id", "text").orderBy("id").as[(Long, Long, Long)].collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall(_._3 <= 0L), "log probs must be non-positive")
    assert(a.exists(_._2 > 0L))
  }

  test("append: grown model scores identically to whole-built; compact preserves scores") {
    val all = graft.sources.Generators.randomText(spark, 120, seed = 9L,
        wordsMin = 4, wordsMax = 20, partitions = 4)
      .select(col("id").as("doc_id"), col("text"))
    val whole = s"lm_spec_whole_${System.nanoTime()}"
    LangModel.train(all, "doc_id", "text", whole, buckets = 4)
    val grown = s"lm_spec_grown_${System.nanoTime()}"
    LangModel.train(all.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", grown, buckets = 4)
    LangModel.append(spark, grown, all.filter(col("doc_id") % 3 === 1),
      "doc_id", "text")
    LangModel.append(spark, grown, all.filter(col("doc_id") % 3 === 2),
      "doc_id", "text")
    val w = LangModel.score(spark, whole, all, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect()
    val g = LangModel.score(spark, grown, all, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect()
    assert(w.toSeq === g.toSeq, "grown model diverged from whole-built")
    // physical fold: one row per bigram, identical scores after
    val preRows = spark.table(grown).count()
    LangModel.compact(spark, grown)
    assert(spark.table(grown).count() <= preRows)
    val c = LangModel.score(spark, grown, all, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect()
    assert(c.toSeq === w.toSeq, "compaction changed scores")
  }

  test("compact chaos: a kill after EVERY swap boundary heals to exact scores") {
    import graft.operators.BucketedJoin
    val all = graft.sources.Generators.randomText(spark, 90, seed = 21L,
        wordsMin = 4, wordsMax = 18, partitions = 4)
      .select(col("id").as("doc_id"), col("text"))
    // reference scores from a whole-built model (compaction must never
    // change scores, crashed or not)
    val ref = s"lm_chaos_ref_${System.nanoTime()}"
    LangModel.train(all, "doc_id", "text", ref, buckets = 4)
    val expect = LangModel.score(spark, ref, all, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    def exists(t: String) = spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(t))
    // 15 linear boundaries (compactImpl): 0-4 the bigram-table swap,
    // 5-9 the vocab swap, 10-14 the stats swap; within each table:
    // stage write, debris clear, rename-aside, rename-in, old drop —
    // kill after each, then score
    for (b <- 0 to 14) {
      val table = s"lm_chaos_$b"
      LangModel.train(all.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", table, buckets = 4)
      LangModel.append(spark, table,
        all.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
      val e = intercept[BucketedJoin.InjectedRewriteCrash] {
        LangModel.compactImpl(spark, table, failAt = b)
      }
      assert(e.at == b % 5)
      val healed = LangModel.score(spark, table, all, "doc_id", "text")
        .orderBy("id").as[(Long, Long, Long)].collect().toSeq
      assert(healed == expect, s"boundary $b: scores diverge after heal")
      val hit = if (b < 5) table
        else if (b < 10) s"${table}_vocab" else s"${table}_stats"
      assert(exists(hit) && !exists(s"${hit}_old"),
        s"boundary $b: heal left swap debris")
      // a follow-up compact completes and folds to one row per bigram
      LangModel.compact(spark, table)
      val folded = spark.table(table)
      assert(folded.groupBy("w1", "w2").count()
        .filter(col("count") > 1).count() == 0,
        s"boundary $b: compact left unfolded delta rows")
      val after = LangModel.score(spark, table, all, "doc_id", "text")
        .orderBy("id").as[(Long, Long, Long)].collect().toSeq
      assert(after == expect, s"boundary $b: post-compact scores diverge")
    }
  }

  test("score fails loudly on an empty vocabulary instead of emitting +Inf garbage") {
    val table = s"lm_spec_empty_${System.nanoTime()}"
    LangModel.train(Seq((0L, "   "), (1L, "")).toDF("doc_id", "text"),
      "doc_id", "text", table, buckets = 2)
    val e = intercept[IllegalArgumentException] {
      LangModel.score(spark, table,
        Seq((2L, "a b")).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(e.getMessage.contains("empty"))
  }

  test("remove: takedown scores identically to train-without; compact drops the removed rows") {
    val all = graft.sources.Generators.randomText(spark, 140, seed = 31L,
        wordsMin = 4, wordsMax = 20, partitions = 4)
      .select(col("id").as("doc_id"), col("text"))
    val keep = all.filter(col("doc_id") % 3 =!= 0)
    val gone = all.filter(col("doc_id") % 3 === 0)
    val ref = s"lm_spec_rmref_${System.nanoTime()}"
    LangModel.train(keep, "doc_id", "text", ref, buckets = 4)
    val expect = LangModel.score(spark, ref, all, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val t = s"lm_spec_rm_${System.nanoTime()}"
    LangModel.train(all, "doc_id", "text", t, buckets = 4)
    LangModel.remove(spark, t, gone, "doc_id", "text")
    val got = LangModel.score(spark, t, all, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(got == expect, "remove diverged from train-without")
    // physical fold drops zero-sum rows: the compacted table must be
    // row-identical to the train-without table (same folded counts)
    LangModel.compact(spark, t)
    LangModel.compact(spark, ref)
    def rows(tab: String) = spark.table(tab).select("w1", "w2", "c")
      .orderBy("w1", "w2").as[(String, String, Long)].collect().toSeq
    assert(rows(t) == rows(ref), "compacted remove-table != train-without")
    def vocabRows(tab: String) = spark.table(s"${tab}_vocab")
      .select("w", "c").orderBy("w").as[(String, Long)].collect().toSeq
    assert(vocabRows(t) == vocabRows(ref),
      "compacted vocab diverged from train-without")
    val after = LangModel.score(spark, t, all, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(after == expect, "post-compact remove scores diverge")
  }

  test("remove retires words exactly: V shrinks, scores track the smaller vocabulary") {
    // 'unique' appears ONLY in the removed doc: after remove, V must
    // drop from 4 to 3 and hand-computed scores must use the new V
    val t = s"lm_spec_rmv_${System.nanoTime()}"
    LangModel.train(Seq((0L, "a b a"), (1L, "unique c a")).toDF("doc_id", "text"),
      "doc_id", "text", t, buckets = 2)
    LangModel.remove(spark, t,
      Seq((1L, "unique c a")).toDF("doc_id", "text"), "doc_id", "text")
    // remaining counts: (a,b)=1 (b,a)=1; hist a=1 b=1; V = |{a,b}| = 2
    def lp(c: Long, ch: Long, v: Long): Long =
      math.round(math.log((c + 1.0) / (ch + v.toDouble)) * 1e6)
    val got = LangModel.score(spark, t,
        Seq((9L, "a b unique")).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((9L, 2L, lp(1, 1, 2) + lp(0, 1, 2))))
  }

  test("score narrows the delta scan to the batch's w1 terms (pushed IN filter)") {
    val train = graft.sources.Generators.randomText(spark, 150, seed = 41L,
        wordsMin = 5, wordsMax = 25, partitions = 4)
      .select(col("id").as("doc_id"), col("text"))
    val t = s"lm_spec_push_${System.nanoTime()}"
    LangModel.train(train, "doc_id", "text", t, buckets = 4)
    val batch = train.filter(col("doc_id") % 25 === 0)
    val pushed = LangModel.score(spark, t, batch, "doc_id", "text")
    // the delta-table scan carries a pushed In(w1, ...) predicate
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains(t), "no file scan over the delta table found")
    assert(plan.contains("In(w1"),
      s"w1 IN filter not pushed into the delta scan:\n$plan")
    // and the narrowed plan is bit-identical to the full-scan fallback
    // (maxPushTerms = 0 forces every batch past the cap)
    val a = pushed.orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val b = LangModel.score(spark, t, batch, "doc_id", "text",
        maxPushTerms = 0)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(a == b, "pushed plan diverged from full-scan fallback")
  }

  test("score stays exact past the per-value parquet push limit (InSet regime)") {
    // 3000+ distinct first-words: this very batch shape stack-overflowed
    // parquet's per-value IN tree before round 15 capped the pushdown
    // depth — past the cap the list must evaluate as a post-scan InSet
    // (only min/max reaches parquet) and stay exact
    import org.apache.spark.sql.functions.{array_join, transform, sequence,
      lit, format_string}
    val docs = spark.range(60).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(54)),
        j => format_string("w%05d", col("id") * 55 + j)), " ").as("text"))
    val t = s"lm_spec_bigpush_${System.nanoTime()}"
    LangModel.train(docs, "doc_id", "text", t, buckets = 4)
    val pushed = LangModel.score(spark, t, docs, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val full = LangModel.score(spark, t, docs, "doc_id", "text",
        maxPushTerms = 0)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(pushed == full, "range-chunk pushed plan diverged from full scan")
    assert(pushed.forall(_._2 === 54L))
  }

  test("score reads V from the stats ledger, never the vocab table") {
    val train = Seq((0L, "a b c a b")).toDF("doc_id", "text")
    val t = s"lm_spec_stats_${System.nanoTime()}"
    LangModel.train(train, "doc_id", "text", t, buckets = 2)
    LangModel.append(spark, t, Seq((1L, "c d e")).toDF("doc_id", "text"),
      "doc_id", "text")
    val r = LangModel.score(spark, t,
      Seq((5L, "a b")).toDF("doc_id", "text"), "doc_id", "text")
    val vocabScans = r.queryExecution.executedPlan.collectLeaves()
      .filter(_.toString.contains(s"${t}_vocab"))
    assert(vocabScans.isEmpty,
      "score's plan still scans the vocab table for V")
    // and the ledger-served V matches the true distinct live count
    val got = r.orderBy("id").as[(Long, Long, Long)].collect().toSeq
    def lp(c: Long, ch: Long, v: Long): Long =
      math.round(math.log((c + 1.0) / (ch + v.toDouble)) * 1e6)
    // counts: (a,b)=2 (b,c)=1 (c,a)=1 (c,d)=1 (d,e)=1; hist a=2;
    // V = |{a,b,c,d,e}| = 5
    assert(got == Seq((5L, 1L, lp(2, 2, 5))))
  }

  test("score folds counts without exchanging the index scan") {
    val train = Seq((0L, "a b c a b")).toDF("doc_id", "text")
    val table = s"lm_spec_plan_${System.nanoTime()}"
    LangModel.train(train, "doc_id", "text", table, buckets = 2)
    val r = LangModel.score(spark, table,
      Seq((1L, "a b x")).toDF("doc_id", "text"), "doc_id", "text")
    val offending = r.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.child.collectLeaves().exists(l =>
          l.toString.contains(table) &&
            !l.toString.contains(s"${table}_vocab")) => e
    }
    assert(offending.isEmpty,
      s"count-table shuffle found:\n${offending.mkString("\n")}")
  }

  test("scoreSharded == whole-trained score (parity shards; survives " +
      "per-shard remove and compact)") {
    val corpus = graft.sources.Generators.randomText(spark, 240, seed = 11L,
        wordsMin = 4, wordsMax = 20, partitions = 4)
      .select(col("id").as("doc_id"), col("text"))
    val n = System.nanoTime()
    val (whole, s0, s1) = (s"lmsh_w_$n", s"lmsh_0_$n", s"lmsh_1_$n")
    LangModel.train(corpus, "doc_id", "text", whole, buckets = 2)
    LangModel.train(corpus.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", s0, buckets = 2)
    LangModel.train(corpus.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", s1, buckets = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").as[(Long, Long, Long)].collect().toSeq
    // a caller re-enabling the Spark 4.1 union-partitioning conf must
    // not be able to corrupt the fold — the entry point re-asserts the
    // guard (unionGuard), not just ensureRegistered once per session
    spark.conf.set("spark.sql.unionOutputPartitioning", "true")
    assert(rows(LangModel.scoreSharded(spark, Seq(s0, s1), corpus,
        "doc_id", "text")) ===
      rows(LangModel.score(spark, whole, corpus, "doc_id", "text")),
      "sharded fold diverged from the whole-trained model")
    assert(spark.conf.get("spark.sql.unionOutputPartitioning") === "false",
      "scoreSharded must re-assert the union guard")
    // takedown lands on ONE shard (the doc-disjoint contract: a doc's
    // counts live in exactly its own shard) and must keep equality
    val gone = corpus.filter(col("doc_id") % 10 === 0) // even ids -> s0
    LangModel.remove(spark, whole, gone, "doc_id", "text")
    LangModel.remove(spark, s0, gone, "doc_id", "text")
    LangModel.compact(spark, s0) // fold the negative deltas physically
    assert(rows(LangModel.scoreSharded(spark, Seq(s0, s1), corpus,
        "doc_id", "text")) ===
      rows(LangModel.score(spark, whole, corpus, "doc_id", "text")),
      "sharded fold diverged after a per-shard remove + compact")
  }

  test("scoreSharded statsTable: memoized V is bit-identical, survives " +
      "compact (generation preserved), refolds after append/remove") {
    val corpus = graft.sources.Generators.randomText(spark, 160, seed = 13L,
        wordsMin = 4, wordsMax = 16, partitions = 4)
      .select(col("id").as("doc_id"), col("text"))
    val n = System.nanoTime()
    val (s0, s1, st) = (s"lmgen_0_$n", s"lmgen_1_$n", s"lmgen_vstats_$n")
    LangModel.train(corpus.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", s0, buckets = 2)
    LangModel.train(corpus.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", s1, buckets = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").as[(Long, Long, Long)].collect().toSeq
    def memoRow(): (String, Long) = {
      spark.catalog.refreshTable(st)
      spark.table(st).as[(String, Long)].collect().toSeq match {
        case Seq(r) => r
        case other => fail(s"stats cache must hold exactly one row: $other")
      }
    }
    val unmemo = rows(LangModel.scoreSharded(spark, Seq(s0, s1), corpus,
      "doc_id", "text"))
    // first memoized call folds + writes the cache; scores identical
    assert(rows(LangModel.scoreSharded(spark, Seq(s0, s1), corpus,
      "doc_id", "text", statsTable = Some(st))) === unmemo,
      "memoized path diverged from the per-call fold")
    val warm = memoRow()
    // second call HITS: scores identical, cache row untouched
    assert(rows(LangModel.scoreSharded(spark, Seq(s0, s1), corpus,
      "doc_id", "text", statsTable = Some(st))) === unmemo)
    assert(memoRow() === warm, "a cache hit must not rewrite the cache")
    // compact preserves the generation: still a hit on the same row
    LangModel.compact(spark, s0)
    assert(rows(LangModel.scoreSharded(spark, Seq(s0, s1), corpus,
      "doc_id", "text", statsTable = Some(st))) === unmemo,
      "scores moved across a compact")
    assert(memoRow() === warm,
      "compact must preserve the generation (cache stayed valid)")
    // a mutation MOVES the generation: the next memoized call refolds
    // and stays exactly equal to the unmemoized fold
    val extra = Seq((5001L, "entirely fresh vocabulary arrives here now"))
      .toDF("doc_id", "text")
    LangModel.append(spark, s1, extra, "doc_id", "text")
    val grown = corpus.unionByName(extra)
    val after = rows(LangModel.scoreSharded(spark, Seq(s0, s1), grown,
      "doc_id", "text", statsTable = Some(st)))
    assert(memoRow() !== warm, "append must invalidate the cache")
    assert(after === rows(LangModel.scoreSharded(spark, Seq(s0, s1), grown,
      "doc_id", "text")), "post-append memoized scores diverged")
    // remove moves it again and remove ≡ train-without holds through
    // the memoized path
    LangModel.remove(spark, s1, extra, "doc_id", "text")
    assert(rows(LangModel.scoreSharded(spark, Seq(s0, s1), corpus,
      "doc_id", "text", statsTable = Some(st))) === unmemo,
      "remove-through-the-memoized-path diverged from train-without")
  }
}
