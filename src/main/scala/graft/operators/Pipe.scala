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

  /** Map-side pipe: each partition's lines through `cmd` stdin/stdout. */
  def pipeMap(lines: Dataset[String], cmd: Seq[String]): Dataset[String] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.rdd.pipe(cmd).toDS()
  }

  def pipeMap(lines: Dataset[String], cmd: String): Dataset[String] =
    pipeMap(lines, cmd.split("\\s+").toSeq)

  /** Reduce-side pipe: repartition by the first `numKeyFields`
    * separator-delimited fields, sort each partition by the full line
    * (MR shuffle-sort contract), then pipe. Each subprocess therefore sees
    * every record of a key group contiguously and in sorted order.
    */
  def pipeReduce(df: DataFrame, lineCol: String, cmd: Seq[String],
                 sep: String = "\t", numKeyFields: Int = 1,
                 numPartitions: Int = 0): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = java.util.regex.Pattern.quote(sep)
    val keyed = df.select(
      concat_ws(sep, slice(split(col(lineCol), q), 1, numKeyFields)).as("k"),
      col(lineCol).as("line"))
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    keyed
      .repartition(parts, col("k"))
      .sortWithinPartitions(col("k"), col("line"))
      .select("line").as[String]
      .rdd.pipe(cmd).toDS()
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
                     cmd: Seq[String]): Dataset[(String, String)] = {
    val spark = kv.sparkSession
    import spark.implicits._
    kv.mapPartitions { it =>
      val proc = new ProcessBuilder(cmd: _*).start()
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
