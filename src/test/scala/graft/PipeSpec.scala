package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Pipe

/** Streaming-tool surface (reference `hadoop-streaming` PipeMapper/
  * PipeReducer): external processes over line streams.
  */
class PipeSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("pipeMap through cat is identity (as multiset)") {
    val in = Seq("alpha", "beta", "gamma").toDS()
    val out = Pipe.pipeMap(in, "cat").collect().toSeq
    assert(out.sorted == Seq("alpha", "beta", "gamma"))
  }

  test("pipeMap through an awk transform") {
    val in = Seq("1 2", "3 4").toDS()
    val out = Pipe.pipeMap(in, Seq("awk", "{print $1+$2}")).collect().toSeq
    assert(out.map(_.toInt).sorted == Seq(3, 7))
  }

  test("pipeReduce: key groups arrive contiguous and sorted at the subprocess") {
    // uniq -c style dedup-count only works if identical keys are adjacent —
    // this is exactly the MR reducer contract pipeReduce must reproduce.
    val df = Seq("b\t1", "a\t1", "b\t2", "a\t2", "b\t3").toDF("line")
    val out = Pipe.pipeReduce(df, "line", Seq("awk", "-F\t",
        "{c[$1]++} END {for (k in c) print k\"\\t\"c[k]}"),
        numKeyFields = 1, numPartitions = 2)
      .collect().toSeq.sorted
    assert(out == Seq("a\t2", "b\t3"))
  }

  test("typedbytes codec round-trips every type code") {
    import graft.operators.TypedBytes
    val values: Seq[Any] = Seq(
      Array[Byte](1, 2, -3), 7.toByte, true, 42, 9999999999L, 1.5f, 2.75,
      "héllo\tworld\n", Vector(1, "two"), List(3L, false), Map("k" -> 1))
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    values.foreach(TypedBytes.write(out, _))
    out.close()
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = Iterator.continually(TypedBytes.read(in))
      .takeWhile(_.isDefined).map(_.get).toSeq
    assert(back.size == values.size)
    assert(back(0).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, -3))
    assert(back.drop(1) == values.drop(1))
  }

  test("pipeTypedBytes: binary-clean round trip through cat, tabs/newlines survive") {
    val kv = Seq(("k1", "has\ttab"), ("k2", "has\nnewline"), ("k3", "plain"))
      .toDS()
    val back = Pipe.pipeTypedBytes(kv, Seq("cat")).collect().toSet
    assert(back == Set(("k1", "has\ttab"), ("k2", "has\nnewline"), ("k3", "plain")))
  }

  test("safeMap drops poison records and counts them") {
    val ds = Seq("1", "2", "boom", "4").toDS()
    val out = Pipe.safeMap(ds, "bad")(s => s.toInt)
    assert(out.collect().toSeq.sorted == Seq(1, 2, 4))
    val acc = spark.sparkContext.longAccumulator("bad2")
    // re-run with a fresh accumulator to assert the count
    val counted = ds.flatMap { s =>
      try Some(s.toInt) catch { case _: Throwable => acc.add(1); None }
    }
    counted.collect()
    assert(acc.value == 1L)
  }
}
