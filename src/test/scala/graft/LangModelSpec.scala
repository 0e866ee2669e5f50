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
    // boundaries: 0 stage write, 1 debris clear, 2 rename-aside,
    // 3 rename-in, 4 old-copy drop — kill after each, then score
    for (b <- 0 to 4) {
      val table = s"lm_chaos_$b"
      LangModel.train(all.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", table, buckets = 4)
      LangModel.append(spark, table,
        all.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
      val e = intercept[BucketedJoin.InjectedRewriteCrash] {
        LangModel.compactImpl(spark, table, failAt = b)
      }
      assert(e.at == b)
      val healed = LangModel.score(spark, table, all, "doc_id", "text")
        .orderBy("id").as[(Long, Long, Long)].collect().toSeq
      assert(healed == expect, s"boundary $b: scores diverge after heal")
      assert(exists(table) && !exists(s"${table}_old"),
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
}
