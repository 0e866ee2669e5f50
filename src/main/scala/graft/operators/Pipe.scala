package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** External-process UDFs over line streams — the reference's Streaming tool
  * surface (reference: hadoop-tools/hadoop-streaming `PipeMapper.java:38-107`,
  * `PipeReducer.java:40-77`, `PipeMapRed.java`): any executable consumes
  * `key<sep>value` lines on stdin and emits lines on stdout.
  *
  * Spark-first carrier: `RDD.pipe` per partition (the direct analog of one
  * PipeMapper per map task). `pipeReduce` reproduces the reducer-side
  * contract: records routed by the first `numKeyFields` fields and sorted
  * by full key before reaching the subprocess
  * (`stream.num.map.output.key.fields` semantics, `PipeMapper.java:79-81`).
  *
  * Scale: the subprocess runs once per partition, streaming — no
  * materialization; partition count controls process parallelism.
  */
object Pipe {

  /** Map-side pipe: each partition's lines through `cmd` stdin/stdout.
    *
    * `shipped` names files distributed via `SparkContext.addFile` (the
    * streaming `-file` payloads, reference `stream:StreamJob.java:287-296`
    * where they land in the task working directory): command tokens
    * matching a shipped file's bare name resolve to that executor's
    * `SparkFiles.get` copy INSIDE the task — the landing path differs
    * per executor, so a driver-side rewrite cannot work. Empty set =
    * the classic `RDD.pipe` path, untouched.
    */
  def pipeMap(lines: Dataset[String], cmd: Seq[String],
              shipped: Set[String] = Set.empty): Dataset[String] = {
    val spark = lines.sparkSession
    import spark.implicits._
    if (shipped.isEmpty) lines.rdd.pipe(cmd).toDS()
    else lines.mapPartitions(it => pipeLines(resolveShipped(cmd, shipped), it))
  }

  def pipeMap(lines: Dataset[String], cmd: String): Dataset[String] =
    pipeMap(lines, cmd.split("\\s+").toSeq)

  /** Task-side resolution of shipped-file tokens (see [[pipeMap]]): a
    * token equal to a shipped name (optionally `./`-prefixed) rewrites
    * to the executor-local `SparkFiles.get` path, marked executable
    * (DistributedCache preserved the bit; `addFile`'s fetch does not
    * guarantee it).
    */
  private def resolveShipped(cmd: Seq[String],
                             shipped: Set[String]): Seq[String] =
    cmd.map { tok =>
      val base = if (tok.startsWith("./")) tok.drop(2) else tok
      if (!shipped(base)) tok
      else {
        val p = org.apache.spark.SparkFiles.get(base)
        val f = new java.io.File(p)
        if (f.isFile) f.setExecutable(true)
        p
      }
    }

  /** Subprocess leak guard: a task that stops consuming the pipe
    * iterator early (limit/take) or is killed never reaches the
    * EOF-side `waitFor`, leaving the child and its daemon drain/feeder
    * threads alive for the executor's lifetime. Register a
    * task-completion destroy unless the iterator already drained and
    * reaped the child — the cleanup Spark's own PipedRDD performs for
    * exactly this case. Returns the drained flag the reader sets after
    * its normal `waitFor`. No-op outside a task (direct unit-test
    * invocations of the pipe cores).
    */
  private def registerProcCleanup(proc: Process)
      : java.util.concurrent.atomic.AtomicBoolean = {
    val reaped = new java.util.concurrent.atomic.AtomicBoolean(false)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ =>
        if (!reaped.get()) proc.destroyForcibly()
      })
    reaped
  }

  /** The line-protocol subprocess core for the shipped-file path: the
    * [[pipeTypedBytes]] thread discipline (daemon stderr drain +
    * feeder, exit-code check at EOF) over newline-framed text. Used
    * only when task-side command resolution is needed — the no-ship
    * path stays on Spark's own `PipedRDD`.
    */
  private def pipeLines(cmd: Seq[String],
                        it: Iterator[String]): Iterator[String] = {
    val proc = new ProcessBuilder(cmd: _*).start()
    val reaped = registerProcCleanup(proc)
    val errDrain = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getErrorStream))
      try {
        var line = r.readLine()
        while (line != null) {
          System.err.println(s"[pipe-err] $line"); line = r.readLine()
        }
      } catch { case _: java.io.IOException => () }
      finally r.close()
    }, "pipe-lines-stderr-drain")
    errDrain.setDaemon(true)
    errDrain.start()
    val feeder = new Thread(() => {
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(proc.getOutputStream))
      try {
        it.foreach { l => w.write(l); w.newLine() }
        w.close()
      } catch { case _: java.io.IOException => /* child closed early */ }
    }, "pipe-lines-feeder")
    feeder.setDaemon(true)
    feeder.start()
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    new Iterator[String] {
      private var nextLine: String = _
      private var done = false
      private def advance(): Unit = if (nextLine == null && !done) {
        nextLine = in.readLine()
        if (nextLine == null) {
          done = true
          feeder.join()
          val rc = proc.waitFor()
          reaped.set(true)
          if (rc != 0) throw new RuntimeException(s"pipe exited with $rc")
        }
      }
      override def hasNext: Boolean = { advance(); nextLine != null }
      override def next(): String = {
        advance(); val l = nextLine; nextLine = null; l
      }
    }
  }

  /** Reduce-side pipe: repartition by the first `numKeyFields`
    * separator-delimited fields, sort each partition by the full line
    * (MR shuffle-sort contract), then pipe. Each subprocess therefore sees
    * every record of a key group contiguously and in sorted order.
    */
  def pipeReduce(df: DataFrame, lineCol: String, cmd: Seq[String],
                 sep: String = "\t", numKeyFields: Int = 1,
                 numPartitions: Int = 0,
                 shipped: Set[String] = Set.empty): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = java.util.regex.Pattern.quote(sep)
    val keyed = df.select(
      concat_ws(sep, slice(split(col(lineCol), q), 1, numKeyFields)).as("k"),
      col(lineCol).as("line"))
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    val sorted = keyed
      .repartition(parts, col("k"))
      .sortWithinPartitions(col("k"), col("line"))
      .select("line").as[String]
    if (shipped.isEmpty) sorted.rdd.pipe(cmd).toDS()
    else sorted.mapPartitions(it =>
      pipeLines(resolveShipped(cmd, shipped), it))
  }

  /** Binary typedbytes pipe (`-io typedbytes` mode,
    * `stream:io/TypedBytesInputWriter.java`): each partition streams its
    * (k, v) pairs to the subprocess as typedbytes records and decodes
    * typedbytes pairs from its stdout — the binary-clean alternative to
    * the line protocol (values may contain tabs/newlines/raw bytes).
    * A feeder thread writes while the task thread consumes, so neither
    * side buffers the partition.
    */
  def pipeTypedBytes(kv: Dataset[(String, String)],
                     cmd: Seq[String],
                     shipped: Set[String] = Set.empty)
      : Dataset[(String, String)] = {
    val spark = kv.sparkSession
    import spark.implicits._
    kv.mapPartitions { it =>
      val proc = new ProcessBuilder(
        resolveShipped(cmd, shipped): _*).start()
      val reaped = registerProcCleanup(proc)
      // Drain the child's stderr on a daemon thread (forwarded to the task
      // log): a child writing >64KB of stderr would otherwise block on the
      // full OS pipe while the task thread blocks reading stdout —
      // deadlock. redirectErrorStream is NOT an option for a binary
      // protocol (it would interleave stderr bytes into the typedbytes
      // stream). Same design as Spark's PipedRDD stderr-reader thread.
      val errDrain = new Thread(() => {
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getErrorStream))
        try {
          var line = r.readLine()
          while (line != null) { System.err.println(s"[pipe-err] $line"); line = r.readLine() }
        } catch { case _: java.io.IOException => () }
        finally r.close()
      }, "typedbytes-stderr-drain")
      errDrain.setDaemon(true)
      errDrain.start()
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(proc.getOutputStream))
      val feeder = new Thread(() => {
        try {
          it.foreach { case (k, v) =>
            TypedBytes.write(out, k); TypedBytes.write(out, v)
          }
          out.close()
        } catch { case _: java.io.IOException => /* subprocess closed early */ }
      }, "typedbytes-feeder")
      feeder.setDaemon(true)
      feeder.start()
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(proc.getInputStream))
      new Iterator[(String, String)] {
        private var nextPair: (String, String) = _
        private var done = false
        private def advance(): Unit = if (nextPair == null && !done) {
          TypedBytes.read(in) match {
            case None => done = true
              feeder.join()
              val rc = proc.waitFor()
              reaped.set(true)
              if (rc != 0) throw new RuntimeException(s"pipe exited with $rc")
            case Some(k) =>
              val v = TypedBytes.read(in).getOrElse(
                throw new java.io.EOFException("odd typedbytes record count"))
              nextPair = (k.toString, v.toString)
          }
        }
        override def hasNext: Boolean = { advance(); nextPair != null }
        override def next(): (String, String) = {
          advance()
          val p = nextPair; nextPair = null; p
        }
      }
    }
  }

  /** Skip-bad-records analog (reference: `mapred/Task.java` skip ranges,
    * `TestBadRecords.java`): apply `f` per record, drop failures, count
    * them in an accumulator instead of failing the job.
    */
  def safeMap[T, U: org.apache.spark.sql.Encoder](ds: Dataset[T], name: String)(
      f: T => U): Dataset[U] =
    safeMapCounted(ds, name)(f)._1

  /** safeMap exposing the skip counter (the accumulator is populated
    * only after an action runs the plan — MR counter semantics).
    */
  def safeMapCounted[T, U: org.apache.spark.sql.Encoder](
      ds: Dataset[T], name: String)(
      f: T => U): (Dataset[U], org.apache.spark.util.LongAccumulator) = {
    val acc = ds.sparkSession.sparkContext.longAccumulator(name)
    val out = ds.flatMap { t =>
      try Some(f(t))
      catch { case scala.util.control.NonFatal(_) => acc.add(1L); None }
    }
    (out, acc)
  }
}
