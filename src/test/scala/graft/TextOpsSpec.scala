package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._
  graft.functions.GraftFunctions.ensureRegistered(spark)

  test("tokens drop empties; tokenCount counts whitespace words") {
    val r = Seq("  the quick\tbrown\n\nfox  ").toDF("t")
      .select(TextOps.tokens(col("t")).as("w"), TextOps.tokenCount(col("t")).as("n"))
      .as[(Seq[String], Long)].head()
    assert(r._1 == Seq("the", "quick", "brown", "fox") && r._2 == 4L)
    val empty = Seq("").toDF("t").select(TextOps.tokenCount(col("t"))).as[Long].head()
    assert(empty == 0L)
  }

  test("subwordCount splits letter/digit boundaries") {
    val n = Seq("abc123def x-y").toDF("t")
      .select(TextOps.subwordCount(col("t"))).as[Long].head()
    assert(n == 5L) // abc,123,def,x,y
  }

  test("quality metrics on a known sentence") {
    val text = "The cat, the dog!" // 4 tokens; 2 punct; 1 upper; stopwords: The,the
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextOps.qualityMetrics(df, "text", "doc_id")
      .select("n_tokens", "mean_tok_len", "punct_ratio", "upper_ratio", "stopword_ratio")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 == 4L)
    assert(math.abs(r._2 - 14.0 / 4) < 1e-12) // The(3)+cat,(4)+the(3)+dog!(4)
    assert(math.abs(r._3 - 2.0 / 17) < 1e-12)
    assert(math.abs(r._4 - 1.0 / 17) < 1e-12)
    assert(math.abs(r._5 - 2.0 / 4) < 1e-12)
  }

  test("quality metrics zero-safe on empty text") {
    val df = Seq((1L, "")).toDF("doc_id", "text")
    val r = TextOps.qualityMetrics(df, "text", "doc_id")
      .select("n_tokens", "mean_tok_len", "punct_ratio")
      .as[(Long, Double, Double)].head()
    assert(r == ((0L, 0.0, 0.0)))
  }

  test("langId picks the stopword-dominant language, 'und' when none") {
    val r = Seq(
      "the cat is in the house and it is happy",
      "der Hund ist nicht mit der Katze und das ist gut",
      "le chat est dans la maison et il est pour que",
      "el perro es una mascota para la casa y no es",
      "zzz qqq www").toDF("text")
      .select(TextOps.langId(col("text"))).as[String].collect().toSeq
    assert(r == Seq("en", "de", "fr", "es", "und"))
  }

  test("fingerprint is stable under whitespace/case noise") {
    val fps = Seq("Hello  World", "hello world", "HELLO\tWORLD")
      .toDF("t").select(TextOps.fingerprint(col("t"))).as[String].collect().toSeq
    assert(fps.distinct.size == 1 && fps.head.length == 16)
  }

  test("chunk: overlap math, short-text single chunk, empty text no chunks") {
    val df = Seq("a" * 250, "short", "").toDF("t")
    val chunks = df.select(col("t"),
        explode(TextOps.chunk(col("t"), 100, 20)).as("c"))
      .select(length(col("t")).as("len"), col("c.chunk_idx"), col("c.chunk"))
      .as[(Int, Int, String)].collect().toSeq
    val big = chunks.filter(_._1 == 250).sortBy(_._2)
    // starts 1, 81, 161 over 250 chars (241 would be fully contained
    // in the 161-chunk) → lengths 100, 100, 90
    assert(big.map(_._3.length) == Seq(100, 100, 90))
    assert(big.map(_._2) == Seq(0, 1, 2))
    assert(chunks.filter(_._1 == 5).map(_._3) == Seq("short"))
    assert(!chunks.exists(_._1 == 0)) // empty text: no chunks
  }

  test("redact: emails, IPs, long digit runs tagged; short numbers kept") {
    val r = Seq("mail a.b+c@x-y.io ip 192.168.0.1 acct 123456789 year 2026")
      .toDF("t").select(TextOps.redact(col("t"))).as[String].head()
    assert(r == "mail <EMAIL> ip <IP> acct <NUM> year 2026")
  }

  test("splitAssign: deterministic, partition-count independent, ~80/10/10") {
    val a = spark.range(0, 2000, 1, 3)
      .select(col("id"), TextOps.splitAssign(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    val b = spark.range(0, 2000, 1, 13)
      .select(col("id"), TextOps.splitAssign(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(a == b)
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 1450 && counts("train") < 1750)
    assert(counts("val") > 100 && counts("test") > 100)
  }

  test("shingleFingerprint equal for equal text, differs for different") {
    val f = Seq("a b c d e", "a b c d e", "v w x y z").toDF("t")
      .select(TextOps.shingleFingerprint(col("t")).as("f")).as[Long].collect().toSeq
    assert(f(0) == f(1) && f(0) != f(2))
  }
}
