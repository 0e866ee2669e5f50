package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SortSpec, TextOps}
import graft.sources.Jdbc

/** Property-based checks: parser round trips, kernel-vs-composition
  * equivalence, splitter invariants.
  */
class PropertySpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._
  graft.functions.GraftFunctions.ensureRegistered(spark)

  /** Deterministic sampling loop (scalatestplus bridge unavailable —
    * raw scalacheck Gen with fixed seeds).
    */
  private def forAll[T](g: Gen[T], n: Int = 25)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L + i)))
    }

  test("integerSplitPoints: covers [lo,hi] disjointly, ascending, n ranges") {
    forAll(Gen.zip(Gen.chooseNum(-1000L, 1000L), Gen.chooseNum(0L, 5000L),
           Gen.chooseNum(1, 40))) { case (lo, span, n) =>
      val hi = lo + span
      val b = Jdbc.integerSplitPoints(lo, hi, n)
      assert(b.size == n + 1)
      assert(b.head == lo && b.last == hi + 1)
      assert(b.sliding(2).forall { case Seq(a, c) => a <= c; case _ => true })
      // total width preserved
      assert(b.last - b.head == span + 1)
    }
  }

  test("SortSpec.parse: accepts every generated -k spec") {
    val flag = Gen.oneOf("", "n", "r", "nr", "rn")
    val charOff = Gen.oneOf(Gen.const(""), Gen.chooseNum(1, 9).map("." + _))
    val key = for {
      f <- Gen.chooseNum(1, 9); t <- Gen.chooseNum(1, 9); fl <- flag
      fc <- charOff; tc <- charOff
    } yield if (t >= f) s"-k$f$fc,$t$tc$fl" else s"-k$f$fc$fl"
    forAll(Gen.nonEmptyListOf(key)) { keys =>
      val parsed = SortSpec.parse(keys.mkString(" "))
      assert(parsed.size == keys.size)
      assert(parsed.forall(k => k.from >= 1 && k.to >= k.from))
      assert(parsed.forall(k => k.fromChar >= 1 && k.toChar >= 0))
    }
  }

  test("word_shingles kernel ≡ compositional slice/concat/distinct form") {
    val word = Gen.oneOf("a", "bb", "ccc", "dd", "e", "ff")
    val text = Gen.listOfN(12, word).map(_.mkString(" "))
    forAll(Gen.listOfN(8, text)) { texts =>
      val df = texts.toDF("text")
      val kernel = df.select(Dedup.shingles(col("text"), 3).as("s"))
        .as[Seq[String]].collect().map(_.toSet).toSeq
      val toks = TextOps.tokens(col("text"))
      val composed = df.select(
        when(size(toks) < 3, array().cast("array<string>"))
          .otherwise(array_distinct(transform(
            sequence(lit(1), size(toks) - 2),
            i => concat_ws(" ", slice(toks, i, lit(3)))))).as("s"))
        .as[Seq[String]].collect().map(_.toSet).toSeq
      assert(kernel == composed)
    }
  }

  test("simhash64 kernel ≡ per-bit column composition") {
    val text = Gen.listOfN(10, Gen.oneOf("alpha", "beta", "gamma", "delta"))
      .map(_.mkString(" "))
    forAll(Gen.listOfN(6, text)) { texts =>
      val df = texts.toDF("text")
      val hashes = transform(TextOps.tokens(col("text")), w => xxhash64(w))
      val kernel = df.select(
        graft.functions.GraftFunctions.simhash64(hashes)).as[Long].collect().toSeq
      val bits = (0 until 64).map { b =>
        size(filter(hashes, h => h.bitwiseAND(lit(1L << b)) =!= 0L)) * 2 -
          size(hashes)
      }
      val folded = bits.zipWithIndex.map { case (c, i) =>
        when(c > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce[org.apache.spark.sql.Column](_ bitwiseOR _)
      val composed = df.select(folded).as[Long].collect().toSeq
      assert(kernel == composed)
    }
  }

  test("qcos_upper is a sound, tight upper bound on cosine_sim") {
    // Soundness (upper ≥ exact, ALWAYS) is what lets the quantized
    // refine stage of cosineNearDupPairsBlocked discard candidates
    // without ever dropping a true pair; tightness (small gap) is what
    // makes the stage useful. Mixed magnitudes + near-colinear pairs +
    // zero vectors probe the bound's edge cases.
    val comp = Gen.chooseNum(-1.0, 1.0)
    val scaleG = Gen.oneOf(1e-6, 1.0, 1e6)
    val vec = Gen.zip(Gen.listOfN(24, comp), scaleG)
      .map { case (xs, s) => xs.map(_ * s).toArray }
    val pair = Gen.zip(vec, vec, Gen.oneOf(true, false)).map {
      case (a, _, true)  => // near-colinear: nudge one component
        (a, a.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01 else x })
      case (a, b, false) => (a, b)
    }
    forAll(pair, n = 60) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val g = graft.functions.GraftFunctions
      val Array(row) = df.select(
        g.qcosUpper(g.quantizeVec(col("a")), g.quantizeVec(col("b"))),
        g.cosineSim(col("a"), col("b"))).as[(Double, Double)].collect()
      val (upper, exact) = row
      assert(upper >= exact, s"unsound: upper=$upper < exact=$exact")
      assert(upper - exact < 0.05, s"loose: upper=$upper exact=$exact")
    }
    // all-zero vectors: upper keeps the pair (1.0), exact path drops it
    val z = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
    val g = graft.functions.GraftFunctions
    assert(z.select(g.qcosUpper(g.quantizeVec(col("a")), g.quantizeVec(col("b"))))
      .as[Double].head() == 1.0)
  }

  test("sharded ≡ whole for RANDOM corpora and shard counts (BM25 bag + LM)") {
    // The parity-split gates (t32/t35) prove one split; this samples
    // random corpora (skew, empty docs, repeated words) under random
    // 1-4-way splits — the exactness argument (global-stats fold /
    // additive counts) must hold for ANY doc-disjoint partition.
    import graft.operators.{LangModel, Retrieval}
    val word = Gen.oneOf("alpha", "beta", "beta", "gamma", "delta",
      "epsilon", "zeta")
    val docGen = Gen.chooseNum(0, 10)
      .flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    val sample = for {
      n <- Gen.chooseNum(30, 70)
      texts <- Gen.listOfN(n, docGen)
      s <- Gen.chooseNum(1, 4)
    } yield (texts, s)
    forAll(sample, n = 4) { case (texts, nShards) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .localCheckpoint()
      val tag = System.nanoTime()
      val q = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("qid"),
          substring(col("text"), 1, 11).as("qtext"))
      def shardDf(i: Int) = docs.filter(pmod(col("doc_id"), lit(nShards)) === i)

      val bmW = s"prop_bw_$tag"
      Retrieval.bm25Build(docs, "doc_id", "text", bmW, buckets = 2)
      val bmS = (0 until nShards).map { i =>
        val t = s"prop_bs${i}_$tag"
        Retrieval.bm25Build(shardDf(i), "doc_id", "text", t, buckets = 2)
        t
      }
      def brows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("qid", "rnk").as[(Long, Long, Long, Int)].collect().toSeq
      assert(brows(Retrieval.bm25ShardedQuery(spark, bmS, q,
          "qid", "qtext", 3)) ===
        brows(Retrieval.bm25Query(spark, bmW, q, "qid", "qtext", 3)),
        s"bm25 sharded diverged at nShards=$nShards")

      val lmW = s"prop_lw_$tag"
      LangModel.train(docs, "doc_id", "text", lmW, buckets = 2)
      val lmS = (0 until nShards).map { i =>
        val t = s"prop_ls${i}_$tag"
        LangModel.train(shardDf(i), "doc_id", "text", t, buckets = 2)
        t
      }
      def lrows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("id").as[(Long, Long, Long)].collect().toSeq
      assert(lrows(LangModel.scoreSharded(spark, lmS, docs,
          "doc_id", "text")) ===
        lrows(LangModel.score(spark, lmW, docs, "doc_id", "text")),
        s"LM sharded diverged at nShards=$nShards")
    }
  }
}
