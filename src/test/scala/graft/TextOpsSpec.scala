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

  test("shingleFingerprint equal for equal text, differs for different") {
    val f = Seq("a b c d e", "a b c d e", "v w x y z").toDF("t")
      .select(TextOps.shingleFingerprint(col("t")).as("f")).as[Long].collect().toSeq
    assert(f(0) == f(1) && f(0) != f(2))
  }
}
