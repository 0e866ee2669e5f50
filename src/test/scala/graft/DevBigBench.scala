package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-honesty probe: materialize an sf0.1×M corpus (M = 10 ⇒
  * "sf1-equivalent", M = 100 ⇒ "sf10-equivalent") and run the
  * BASELINE.md bench kernels on it with the exact Bench protocol
  * (noop-sink force, 1 warm-up, median of 3). This converts the
  * "good at 100 TB" plan-reading grades into a measured scaling trend.
  * `sbt "Test/runMain graft.DevBigBench [mult...]"` (default 10;
  * SPARK_DRIVER_MEM=32g recommended for 100).
  *
  * Corpus construction per multiplier M, under /tmp/graft-scale/sfx{M}:
  *  - lineitem/orders: M key-shifted replicas (orderkey + rep·10⁷) —
  *    group sizes and join fan-out are EXACTLY preserved, so o2/j1 do
  *    M× the work with the same per-key profile. custkey is left
  *    untouched (j1 doesn't read it).
  *  - documents: freshly generated (Generators.randomText, the DevScale
  *    shape: ~30-80 words/doc, 2% planted near-dups). NOT replicated:
  *    M identical copies of each doc would push every shingle over the
  *    dd4 hot-shingle cap and hollow the join out — generation keeps
  *    shingle-frequency structure realistic at every scale.
  *  - embeddings: M key-shifted replicas (vec_id + rep·10⁶).
  *
  * Kernel notes at scale:
  *  - bench_sort runs TeraSort.kernel at 200 000·M rows (the sfDir
  *    variant is fixed-size by design).
  *  - bench_ann (sim1 brute force) is the QUADRATIC-BY-DESIGN oracle
  *    verifier: queries = vec_id%100, so work grows M² (M× corpus ×
  *    M× queries). It runs at M ≤ 10 and is skipped above — the scale
  *    path for ANN is sim2/sim3/sim5, measured by DevSimScale/DevIvf.
  *  - j1's join side-size crosses the broadcast threshold as M grows;
  *    the executed plan's join strategy is printed per scale to show
  *    the AQE broadcast→SMJ flip.
  */
object DevBigBench {

  private def force(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def timeMedian(mk: => DataFrame, runs: Int = 3): Double = {
    force(mk)
    val ts = (0 until runs).map { _ =>
      val t0 = System.nanoTime()
      force(mk)
      (System.nanoTime() - t0) / 1e9
    }.sorted
    ts(runs / 2)
  }

  private def joinStrategy(df: DataFrame): String = {
    force(df)
    val plan = df.queryExecution.executedPlan.toString
    if (plan.contains("SortMergeJoin")) "SortMergeJoin"
    else if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
    else "other"
  }

  def materialize(spark: SparkSession, src: String, mult: Int): String = {
    val dir = s"/tmp/graft-scale/sfx$mult"
    val done = new java.io.File(s"$dir/_GRAFT_DONE")
    if (done.exists()) return dir
    val parts = if (mult <= 10) 32 else 128
    val reps = explode(sequence(lit(0L), lit(mult - 1L))).as("rep")

    // Above ×100 the replication itself must not shuffle: split the
    // SOURCE file finely (1 MB splits of the ~11 MB parquet → ~32-way
    // read parallelism) and let each task explode+write its slice
    // directly — no repartition of the 10⁸-row output. Later scans
    // re-split the big output files by maxPartitionBytes as usual.
    val noShuffle = mult > 100
    val prevSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
    if (noShuffle) spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    try {
      for (t <- Seq("lineitem", "orders")) {
        val keyCol = if (t == "lineitem") "l_orderkey" else "o_orderkey"
        val exploded = spark.read.parquet(s"$src/$t.parquet")
          .select(col("*"), reps)
          .withColumn(keyCol, col(keyCol) + col("rep") * 10000000L)
          .drop("rep")
        (if (noShuffle) exploded else exploded.repartition(parts))
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
        .select(col("*"), reps)
        .withColumn("vec_id", col("vec_id") + col("rep") * 1000000L)
        .drop("rep")
      (if (noShuffle) emb else emb.repartition(parts))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prevSplit)

    val nDocs = 5000L * mult
    val base = sources.Generators.randomText(spark, nDocs, seed = 11L,
      wordsMin = 30, wordsMax = 80, partitions = parts)
      .select(col("id").as("doc_id"), col("text"))
    val planted = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + nDocs).as("doc_id"),
        concat(col("text"), lit(" xq")).as("text"))
    base.unionByName(planted)
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("gen"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    done.createNewFile()
    dir
  }

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bigbench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val Q = queries.Queries

    mults.foreach { m =>
      val t0 = System.nanoTime()
      val dir = materialize(spark, "/root/testdata/sf0.1", m)
      println(f"[bigbench] x$m corpus at $dir (${(System.nanoTime() - t0) / 1e9}%.0fs to materialize)")

      val kernels: Seq[(String, () => DataFrame)] = (if (m <= 100)
        Seq("bench_sort" -> (() => sources.TeraSort.kernel(spark, 200000L * m)))
      else {
        println(s"[bigbench] x$m bench_sort skipped: 2e8-row terasort spills " +
          "~40 GB/run beside the corpus; its n·log n trend is measured to x100")
        Nil
      }) ++ Seq(
        "bench_agg" -> (() => Q.a1_wordcount(spark, dir)),
        "bench_grep" -> (() => Q.g1_grep(spark, dir)),
        "bench_join" -> (() => Q.j1_join(spark, dir)),
        "bench_2sort" -> (() => Q.o2_secsort(spark, dir))) ++
        (if (m <= 100) Seq(
          "bench_dedup" -> (() => Q.dd4_ngram(spark, dir)),
          "bench_simhash" -> (() => Q.dd3_simhash(spark, dir)),
          "bench_clean" -> (() => Q.p1_clean(spark, dir)))
        else {
          println(s"[bigbench] x$m dedup/simhash/clean skipped: the doc-family " +
            "curve at 5M docs is measured single-run by DevScale (BASELINE.md)")
          Nil
        }) ++
        (if (m <= 10) Seq("bench_ann" -> (() => Q.sim1_knn(spark, dir))) else Nil)

      val results = kernels.map { case (name, mk) =>
        val t = timeMedian(mk())
        println(f"[bigbench] x$m $name ${t}%.3fs")
        name -> t
      }
      if (m > 10)
        println(s"[bigbench] x$m bench_ann skipped: sim1 is the quadratic-by-design " +
          "brute-force verifier (M^2 work); scaled ANN is sim2/sim3/sim5 (DevSimScale)")
      println(s"[bigbench] x$m bench_join strategy: ${joinStrategy(Q.j1_join(spark, dir))}")
      val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
      println(s"""[bigbench] SUMMARY {"mult":$m,"queries":$qs}""")
    }
    spark.stop()
  }
}
