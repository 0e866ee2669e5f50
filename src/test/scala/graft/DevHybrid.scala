package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Fusion, ProductQuant, Retrieval, Similarity}

/** Hybrid-serving scale probe: a standing BM25 index over the zipf
  * corpus + a standing IVF index over hash-uniform dim-64 vectors
  * (ids aligned), ~100 queries carrying both text and embedding,
  * served through [[Fusion.hybridQuery]] (RRF) — the bench_hybrid
  * kernel at DevRetrieval scale. Legs are measured alone elsewhere
  * (BASELINE round-12/13); this measures the composition: both legs +
  * the fused aggregate in ONE plan, with the BM25 stop-term dial at
  * its serving setting. `sbt "Test/runMain graft.DevHybrid [nDocs]"`.
  */
object DevHybrid {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
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

    val dir = s"/tmp/graft-scale/zdocs$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      sources.Generators.zipfText(spark, n, seed = 11L, partitions = 32)
        .select(col("id").as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(dir)
    }
    val corpus = spark.read.parquet(dir)
    val dim = 64
    val vecs = spark.range(n).repartition(32)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), d =>
          pmod(xxhash64(col("id"), d, lit(1L)), lit(1000000L))
            .cast("double") / 500000.0 - 1.0).as("embedding"))

    val bt = s"devhyb_bm_$n"
    val vt = s"devhyb_ivf_$n"
    val (_, tB) = timed {
      Retrieval.bm25Build(corpus, "doc_id", "text", bt, buckets = 32)
    }
    val (_, tV) = timed {
      Similarity.ivfBuild(vecs, "vec_id", "embedding", vt, buckets = 32)
    }
    println(f"[hyb] n=$n bm25Build=${tB}%.1fs ivfBuild=${tV}%.1fs")
    System.out.flush()

    val q = corpus.filter(col("doc_id") % (n / 100) === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("qtext"))
      .join(vecs.select(col("vec_id").as("qid"),
        col("embedding").as("qvec")), "qid")
      .localCheckpoint()
    val nq = q.count()

    def serve(tag: String, dfFrac: Double, probeFrac: Double): Unit = {
      val (rows, t) = timed {
        Fusion.hybridQuery(spark, bt, q, "qid", "qtext", "qvec", 5,
          kPerLeg = 20, vecIndex = Some(vt), probeFrac = probeFrac,
          maxDfFrac = dfFrac).count()
      }
      println(f"[hyb] n=$n $tag query=${t}%.1fs rows=$rows nq=$nq " +
        f"(${t / nq * 1000}%.0f ms/q)")
      System.out.flush()
    }
    // warm-up, then the serving configuration (pruned lex leg, 10%
    // probes) and the exact-lex bracket
    serve("warmup(df<=1%,probe=0.1)", 0.01, 0.1)
    serve("pruned(df<=1%,probe=0.1)", 0.01, 0.1)
    serve("exact-lex(probe=0.1)", 1.0, 0.1)
    // the PQ-served vector leg (the 100 TB memory-budget config): same
    // lexical leg, IVFPQ probes + exact refine instead of raw IVF —
    // should land in the IVF-served band (the legs dominate; BASELINE
    // round-13 hybrid section)
    val pt = s"devhyb_pq_$n"
    val (_, tP) = timed {
      ProductQuant.ivfPqBuild(vecs, "vec_id", "embedding", pt, m = 16,
        buckets = 32)
    }
    println(f"[hyb] n=$n ivfPqBuild=${tP}%.1fs")
    System.out.flush()
    def servePq(tag: String, dfFrac: Double, probeFrac: Double): Unit = {
      val (rows, t) = timed {
        Fusion.hybridQuery(spark, bt, q, "qid", "qtext", "qvec", 5,
          kPerLeg = 20, pqIndex = Some(pt), probeFrac = probeFrac,
          maxDfFrac = dfFrac).count()
      }
      println(f"[hyb] n=$n $tag query=${t}%.1fs rows=$rows nq=$nq " +
        f"(${t / nq * 1000}%.0f ms/q)")
      System.out.flush()
    }
    servePq("pq-warmup(df<=1%,probe=0.1)", 0.01, 0.1)
    servePq("pq-pruned(df<=1%,probe=0.1)", 0.01, 0.1)
    spark.stop()
  }
}
