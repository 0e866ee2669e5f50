package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.FieldSel
import graft.operators.FieldSel._

/** Spec semantics mirror the reference's FieldSelectionHelper
  * (`mapreduce/lib/fieldsel/FieldSelectionHelper.java:30-118`).
  */
class FieldSelSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("parse single, closed range, open range") {
    assert(parseList("4,3,0") == Seq(Single(4), Single(3), Single(0)))
    assert(parseList("1-3,7-") == Seq(Closed(1, 3), Open(7)))
    assert(parse("4,3:6,5") == (Seq(Single(4), Single(3)), Seq(Single(6), Single(5))))
    assert(parse("2")._2.isEmpty)
  }

  test("reference example spec 4,3,0,1:6,5,1-3,7- over a 10-field line") {
    val line = (0 to 9).map(i => s"f$i").mkString("\t")
    val (k, v) = FieldSel.keyValue(lit(line), "\t", "4,3,0,1:6,5,1-3,7-")
    val Seq((ks, vs)) = Seq(line).toDF("l").select(k, v).as[(String, String)].collect().toSeq
    assert(ks == "f4\tf3\tf0\tf1")
    assert(vs == "f6\tf5\tf1\tf2\tf3\tf7\tf8\tf9")
  }

  test("out-of-range single field yields empty string") {
    val (k, _) = FieldSel.keyValue(lit("a\tb"), "\t", "5:0")
    val got = Seq(1).toDF("x").select(k).as[String].head()
    assert(got == "")
  }

  test("separator is taken literally, not as regex") {
    val (k, _) = FieldSel.keyValue(lit("a|b|c"), "|", "2:0")
    assert(Seq(1).toDF("x").select(k).as[String].head() == "c")
  }
}
