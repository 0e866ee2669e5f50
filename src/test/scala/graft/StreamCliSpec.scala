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

  test("-cmdenv exports into the subprocess; -cacheFile warns, not fails; " +
       "a missing -file payload fails loudly at submit") {
    val in = mkInput(Seq("x"))
    val out = outDir()
    StreamCli.run(spark, StreamCli.parse(Seq(
      "-input", in, "-output", out,
      "-mapper", "printenv GRAFT_STREAM_TOKEN",
      "-cmdenv", "GRAFT_STREAM_TOKEN=tok42",
      "-cacheFile", "hdfs:///cache/thing",
      "-reducer", "NONE")))
    assert(readOut(out).contains("tok42"),
      "the -cmdenv variable did not reach the subprocess")
    // a -cacheFile WITH a '#link' names a task-local symlink the engine
    // does not create — loud refusal, not a confusing exec error later
    intercept[IllegalArgumentException] {
      StreamCli.parse(Seq("-input", in, "-output", outDir(),
        "-mapper", "cat", "-cacheFile", "hdfs:///cache/thing#link",
        "-reducer", "NONE"))
    }
    // -cacheArchive changes the task-visible filesystem layout (the
    // reference unpacks it) — always a loud refusal
    intercept[IllegalArgumentException] {
      StreamCli.parse(Seq("-input", in, "-output", outDir(),
        "-mapper", "cat", "-cacheArchive", "hdfs:///cache/tool.zip",
        "-reducer", "NONE"))
    }
    // -file now SHIPS (it is not ignorable): a payload that does not
    // exist on the submitting host is a submit-time error, exactly as
    // the reference's jar packaging would make it
    intercept[IllegalArgumentException] {
      StreamCli.run(spark, StreamCli.parse(Seq(
        "-input", in, "-output", outDir(),
        "-mapper", "cat", "-file", "/nonexistent/script.sh",
        "-reducer", "NONE")))
    }
  }

  test("-file ships the mapper script: executors run a payload that " +
       "lives only in a submit-side temp dir, named by bare name") {
    val in = mkInput(Seq("alpha", "beta", "gamma"))
    val out = outDir()
    // the script lives in a fresh temp dir that is on NO search path;
    // the command names it by bare name — only the shipped copy
    // (SparkFiles task-side resolution) can make this run
    val scriptDir = Files.createTempDirectory("graft-ship")
    val script = scriptDir.resolve("shout.sh")
    Files.writeString(script,
      "#!/bin/sh\nwhile read l; do echo \"$l!\"; done\n")
    script.toFile.setExecutable(true)
    StreamCli.run(spark, StreamCli.parse(Seq(
      "-input", in, "-output", out,
      "-mapper", "shout.sh", "-file", script.toString,
      "-reducer", "NONE")))
    assert(readOut(out).toSet == Set("alpha!", "beta!", "gamma!"),
      "the shipped mapper did not transform the input")
    // and through the reduce side too (the shipped reducer dedups)
    val out2 = outDir()
    val dedup = scriptDir.resolve("dedup.sh")
    Files.writeString(dedup, "#!/bin/sh\nuniq\n")
    dedup.toFile.setExecutable(true)
    StreamCli.run(spark, StreamCli.parse(Seq(
      "-input", mkInput(Seq("x", "x", "y")), "-output", out2,
      "-reducer", "./dedup.sh", "-file", dedup.toString,
      "-numReduceTasks", "2")))
    assert(readOut(out2).sorted == Seq("x", "y"),
      "the shipped reducer did not run over the shuffle-sort contract")
  }

  test("quote-aware command splitting: quoted arguments survive as one " +
       "token (reference splitArgs semantics); unterminated quotes fail") {
    val in = mkInput(Seq("keep me", "drop"))
    val out = outDir()
    // the awk program contains SPACES — bare-whitespace splitting
    // would hand awk a truncated program and emit garbage
    StreamCli.run(spark, StreamCli.parse(Seq(
      "-input", in, "-output", out,
      "-mapper", "awk '{print $1}'",
      "-reducer", "NONE")))
    assert(readOut(out).toSet == Set("keep", "drop"),
      "quoted awk program was mis-split")
    intercept[IllegalArgumentException] {
      StreamCli.parse(Seq("-input", in, "-output", outDir(),
        "-mapper", "awk '{print", "-reducer", "NONE"))
    }
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

  test("-reducer aggregate: a LongValueSum wordcount over the u1-shaped " +
       "fixture matches exact counts (the framework reducer, not an " +
       "executable named 'aggregate')") {
    val words = Seq("apple", "banana", "apple", "cherry", "banana", "apple")
    val in = mkInput(words)
    val out = outDir()
    // the classic aggregate wordcount mapper: emit
    // 'LongValueSum:<word> TAB 1' per token (reference
    // ValueAggregatorBaseDescriptor.generateEntry shape)
    StreamCli.run(spark, StreamCli.parse(Seq(
      "-input", in, "-output", out,
      "-mapper", "awk '{printf \"LongValueSum:%s\\t1\\n\", $1}'",
      "-reducer", "aggregate", "-numReduceTasks", "2")))
    val counts = readOut(out).map(_.split("\t", 2))
      .map { case Array(w, n) => (w, n.toInt) }.toMap
    assert(counts == Map("apple" -> 3, "banana" -> 2, "cherry" -> 1),
      s"wrong aggregate wordcount: $counts")
  }

  test("-reducer aggregate: every descriptor folds per type with the " +
       "reference's report shapes; a user -combiner is superseded") {
    val in = mkInput(Seq(
      "LongValueMax:m\t5", "LongValueMax:m\t9",
      "LongValueMin:n\t5", "LongValueMin:n\t9",
      "DoubleValueSum:d\t1.5", "DoubleValueSum:d\t2.25",
      "StringValueMax:s\tb", "StringValueMax:s\ta",
      "UniqValueCount:u\tx", "UniqValueCount:u\tx", "UniqValueCount:u\ty",
      "ValueHistogram:h\ta", "ValueHistogram:h\ta", "ValueHistogram:h\tb"))
    val out = outDir()
    // no mapper: the fixture lines ARE the map output; the -combiner is
    // superseded by the framework combiner (reference
    // StreamJob.java:858-861 overrides it the same way)
    StreamCli.run(spark, StreamCli.parse(Seq(
      "-input", in, "-output", out,
      "-combiner", "cat", "-reducer", "aggregate")))
    val got = readOut(out).map(_.split("\t", 2))
      .map { case Array(k, r) => (k, r) }.toMap
    assert(got("m") == "9" && got("n") == "5" && got("s") == "b" &&
      got("u") == "2" && got("d") == "3.75",
      s"wrong scalar reports: $got")
    // histogram report: distinct, min/upper-median/max count, mean,
    // population stddev of the value frequencies {a: 2, b: 1}
    assert(got("h") == "2\t1\t2\t2\t1.5\t0.5",
      s"wrong histogram report: ${got("h")}")
  }

  test("-reducer aggregate failure modes are LOUD: unknown descriptor, " +
       "missing prefix, junk numerics, -mapper aggregate, typedbytes") {
    val in = mkInput(Seq("Nope:k\t1"))
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ causes(t.getCause)
    val e1 = intercept[Exception] {
      StreamCli.run(spark, StreamCli.parse(Seq(
        "-input", in, "-output", outDir(), "-reducer", "aggregate")))
    }
    assert(causes(e1).exists(_.contains("unknown aggregator descriptor")),
      s"unknown descriptor did not fail loudly: ${causes(e1)}")
    val e2 = intercept[Exception] {
      StreamCli.run(spark, StreamCli.parse(Seq(
        "-input", mkInput(Seq("noprefix\t1")), "-output", outDir(),
        "-reducer", "aggregate")))
    }
    assert(causes(e2).exists(_.contains("no <aggregator>:<key> prefix")),
      s"missing prefix did not fail loudly: ${causes(e2)}")
    val e3 = intercept[Exception] {
      StreamCli.run(spark, StreamCli.parse(Seq(
        "-input", mkInput(Seq("LongValueSum:k\tjunk")), "-output", outDir(),
        "-reducer", "aggregate")))
    }
    assert(causes(e3).exists(_.contains("junk")),
      s"junk numeric did not fail loudly: ${causes(e3)}")
    intercept[IllegalArgumentException] {
      StreamCli.run(spark, StreamCli.parse(Seq(
        "-input", in, "-output", outDir(), "-mapper", "aggregate",
        "-reducer", "NONE")))
    }
    intercept[IllegalArgumentException] {
      StreamCli.run(spark, StreamCli.parse(Seq(
        "-input", in, "-output", outDir(), "-io", "typedbytes",
        "-reducer", "aggregate")))
    }
  }
}
