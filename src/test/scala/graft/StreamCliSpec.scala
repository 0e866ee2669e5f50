package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The streaming CLI front-end (`StreamCli`) — reference
  * `stream:StreamJob.java:417-495` option surface over the u1/u2 pipe
  * machinery. Subprocesses are coreutils only (cat/uniq/wc/printenv —
  * present wherever the user's streaming scripts could run at all).
  */
class StreamCliSpec extends AnyFunSuite {
  import SharedSpark.spark

  private def mkInput(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-streamcli").toString
    Files.writeString(Paths.get(s"$dir/part0.txt"),
      lines.mkString("", "\n", "\n"))
    dir
  }

  private def outDir(): String =
    Files.createTempDirectory("graft-streamcli-out").toString + "/out"

  private def readOut(dir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq
  }

  test("wordcount shape: identity map + 'uniq -c' reduce over the " +
       "shuffle-sort contract; counts per key exact across 2 reducers") {
    val words = Seq("apple", "banana", "apple", "cherry", "banana", "apple")
    val in = mkInput(words)
    val out = outDir()
    StreamCli.run(spark, StreamCli.parse(Seq(
      "-input", in, "-output", out,
      "-reducer", "uniq -c", "-numReduceTasks", "2")))
    // uniq -c emits "   N word"; the shuffle-sort contract guarantees
    // each key's records are contiguous in exactly one reducer
    val counts = readOut(out).map(_.trim.split("\\s+", 2))
      .map { case Array(n, w) => (w, n.toInt) }.toMap
    assert(counts == Map("apple" -> 3, "banana" -> 2, "cherry" -> 1),
      s"wrong counts: $counts")
  }

  test("map-only job (-reducer NONE): one subprocess per partition, " +
       "outputs pass through unshuffled") {
    val in = mkInput((1 to 100).map(i => s"line$i"))
    val out = outDir()
    StreamCli.run(spark, StreamCli.parse(Seq(
      "-input", in, "-output", out,
      "-mapper", "wc -l", "-reducer", "NONE")))
    // each partition's `wc -l` emits its line count; totals conserve
    val total = readOut(out).map(_.trim.toInt).sum
    assert(total == 100, s"per-partition counts must sum to 100, got $total")
  }

  test("-cmdenv exports into the subprocess; -file warns, not fails") {
    val in = mkInput(Seq("x"))
    val out = outDir()
    StreamCli.run(spark, StreamCli.parse(Seq(
      "-input", in, "-output", out,
      "-mapper", "printenv GRAFT_STREAM_TOKEN",
      "-cmdenv", "GRAFT_STREAM_TOKEN=tok42",
      "-file", "/nonexistent/script.sh",
      "-reducer", "NONE")))
    assert(readOut(out).contains("tok42"),
      "the -cmdenv variable did not reach the subprocess")
  }

  test("existing output fails the job (FileAlreadyExists semantics); " +
       "unknown options and unsupported formats fail loudly at parse") {
    val in = mkInput(Seq("x"))
    val out = outDir()
    Files.createDirectories(Paths.get(out))
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      StreamCli.run(spark, StreamCli.parse(Seq(
        "-input", in, "-output", out, "-mapper", "cat")))
    }
    intercept[IllegalArgumentException] {
      StreamCli.parse(Seq("-input", in, "-output", "/tmp/x",
        "-mystery", "flag"))
    }
    intercept[IllegalArgumentException] {
      StreamCli.parse(Seq("-input", in, "-output", "/tmp/x",
        "-inputformat", "com.example.WeirdInputFormat"))
    }
    intercept[IllegalArgumentException] {
      StreamCli.parse(Seq("-output", "/tmp/x", "-mapper", "cat")) // no input
    }
  }

  test("keyvalue input + multi-field keys: lines shuffle on the first " +
       "stream.num.map.output.key.fields fields") {
    // (k TAB v) lines; 2-field composite keys via an identity mapper —
    // 'uniq -c' then counts exact (key, value) duplicates per group
    val in = mkInput(Seq("a\t1", "a\t1", "a\t2", "b\t1"))
    val out = outDir()
    StreamCli.run(spark, StreamCli.parse(Seq(
      "-input", in, "-inputformat", "KeyValueTextInputFormat",
      "-output", out, "-reducer", "uniq -c",
      "-D", "stream.num.map.output.key.fields=2",
      "-numReduceTasks", "2")))
    val counts = readOut(out).map(_.trim.split("\\s+", 2))
      .map { case Array(n, kv) => (kv.replace('\t', '|'), n.toInt) }.toMap
    assert(counts == Map("a|1" -> 2, "a|2" -> 1, "b|1" -> 1),
      s"wrong composite-key counts: $counts")
  }
}
