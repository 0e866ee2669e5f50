package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Third-decade retrieval probe via the sharding dial (the DevScale
  * `shards=S` pattern applied to the positional index): 10⁸ docs
  * un-sharded extrapolates past this box's disk (measured table sizes:
  * postings 2.7 GB + positional 2.8 GB + dictionary per 10⁷ docs →
  * ~73 GB of index + 18 GB corpus at 10⁸ against ~38 GB free), so the
  * scale path is S doc-disjoint shard indexes served through
  * [[Retrieval.bm25ShardedQuery]]/[[Retrieval.bm25ShardedProximityQuery]]
  * — global (N, avgdl, df) folded across shard dictionaries, per-shard
  * scoring, bounded top-k merge. EXACTNESS vs the whole-corpus index is
  * proven at spec/oracle scale (RetrievalSpec sharded case; t32/t33
  * DuckDB gates); this probe measures the COST shape at 2×10⁷: shard
  * builds flat (each is the measured 1e7 build — embarrassingly
  * parallel on a cluster), sharded serving ≈ Σ per-shard serving on one
  * box (≈ max on a cluster where shards are executor groups).
  * `sbt "Test/runMain graft.DevSharded [nPerShard]"`.
  */
object DevSharded {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = SparkSession.builder()
      .master("local[32,4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // shard A = the standing zdocs corpus; shard B = a second draw
    // (different seed) under disjoint ids — together a 2n-doc corpus
    val dirA = s"/tmp/graft-scale/zdocs$n"
    if (!new java.io.File(s"$dirA/_SUCCESS").exists()) {
      sources.Generators.zipfText(spark, n, seed = 11L, partitions = 32)
        .select(col("id").as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(dirA)
    }
    val dirB = s"/tmp/graft-scale/zdocsB$n"
    if (!new java.io.File(s"$dirB/_SUCCESS").exists()) {
      sources.Generators.zipfText(spark, n, seed = 13L, partitions = 32)
        .select((col("id") + n).as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(dirB)
    }
    val corpusA = spark.read.parquet(dirA)
    val corpusB = spark.read.parquet(dirB)

    val tA = s"devshard_a_$n"
    val tB = s"devshard_b_$n"
    val (_, buildA) = timed {
      Retrieval.bm25Build(corpusA, "doc_id", "text", tA, buckets = 32,
        positions = true)
    }
    println(f"[shard] n=$n buildA=${buildA}%.1fs")
    System.out.flush()
    val (_, buildB) = timed {
      Retrieval.bm25Build(corpusB, "doc_id", "text", tB, buckets = 32,
        positions = true)
    }
    println(f"[shard] n=$n buildB=${buildB}%.1fs (flat vs A = parallel on a cluster)")
    System.out.flush()

    // 20 head-drawn queries from shard A's docs (both shards carry the
    // zipf head, so every query probes both shards — the worst case for
    // the merge)
    val queries = corpusA.filter(col("doc_id") % (n / 20) === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(operators.TextOps.tokens(lower(col("text"))),
          1, 3)).as("qtext"))
      .localCheckpoint()
    val nq = queries.count()

    def bench(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val (rows, t) = timed {
        df.write.mode("overwrite").format("noop").save(); ()
      }
      println(f"[shard] n=2x$n $name=${t}%.1fs (${t / nq * 1000}%.0f ms/q)")
      System.out.flush()
    }

    // single-shard reference: the measured 1e7 serving band
    bench("near-singleshard")(Retrieval.bm25ProximityQuery(spark, tA,
      queries, "qid", "qtext", 5, window = 8))
    // sharded serving over both shards = the 2e7 corpus
    bench("bag-sharded")(Retrieval.bm25ShardedQuery(spark, Seq(tA, tB),
      queries, "qid", "qtext", 5))
    bench("phrase-sharded")(Retrieval.bm25ShardedPhraseQuery(spark,
      Seq(tA, tB), queries, "qid", "qtext", 5))
    bench("near-sharded")(Retrieval.bm25ShardedProximityQuery(spark,
      Seq(tA, tB), queries, "qid", "qtext", 5, window = 8))

    // disk adjudication inputs for the 1e8 bound
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    def du(prefix: String): Long = {
      def size(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
      Option(wh.listFiles).getOrElse(Array.empty)
        .filter(_.getName.startsWith(prefix)).map(size).sum
    }
    println(f"[shard] index bytes per $n-doc shard: A=${du(s"devshard_a_$n")}%d B=${du(s"devshard_b_$n")}%d")
    System.out.flush()
    spark.stop()
  }
}
