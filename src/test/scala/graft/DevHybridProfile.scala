package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Fusion, Retrieval, Similarity}

/** bench_hybrid adjudication probe (round 16): decompose the kernel
  * into its legs ON THE SAME JVM IN THE SAME MINUTE, with bench_ann as
  * an in-run calibrator whose code has not changed since round 7 —
  * box-wide drift shows up in the calibrator, a fusion-tail regression
  * shows up as fused ≫ lex + vec + tail. Same standing indexes and
  * query sets as Bench. `sbt "Test/runMain graft.DevHybridProfile"`.
  */
object DevHybridProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def med(df: => DataFrame): Double = {
      force(df)
      (0 until 3).map { _ =>
        val t0 = System.nanoTime(); force(df)
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    Retrieval.bm25Build(docs, "doc_id", "text", "hybprof_bm")
    Similarity.ivfBuild(emb, "vec_id", "embedding", "hybprof_ivf")
    val bmQ = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(operators.TextOps.tokens(lower(col("text"))),
          1, 3)).as("qtext"))
    val q = bmQ.join(emb.select(col("vec_id").as("qid"),
      col("embedding").as("qvec")), "qid")

    val tAnn = med(queries.Queries.sim1_knn(spark, sfDir))
    val tLex = med(Retrieval.bm25Query(spark, "hybprof_bm", q,
      "qid", "qtext", 20))
    val tVec = med(Similarity.ivfQuery(spark, "hybprof_ivf", q,
      "qid", "qvec", 20))
    val tFused = med(Fusion.hybridQuery(spark, "hybprof_bm", q,
      "qid", "qtext", "qvec", 5, kPerLeg = 20,
      vecIndex = Some("hybprof_ivf")))
    // fusion tail alone: legs pinned so only rrf + rankTopK execute
    val lex = Retrieval.bm25Query(spark, "hybprof_bm", q, "qid", "qtext", 20)
      .select(col("qid"), col("doc_id").as("id"), col("rnk").as("rank"),
        col("score_micro").cast("double").as("score")).localCheckpoint()
    val vec = Similarity.ivfQuery(spark, "hybprof_ivf", q, "qid", "qvec", 20)
      .select(col("qid"), col("nid").as("id"), col("rank"),
        col("cos").as("score")).localCheckpoint()
    val tTail = med(Fusion.rrf(Seq(lex -> 1.0, vec -> 1.0), 5))
    println(f"[hybprof] sf=$sfDir calibrator(bench_ann)=${tAnn}%.3fs " +
      f"lexLeg=${tLex}%.3fs vecLeg=${tVec}%.3fs fused=${tFused}%.3fs " +
      f"fusionTail=${tTail}%.3fs legsSum=${tLex + tVec}%.3fs")
  }
}
