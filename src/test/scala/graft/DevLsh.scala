package graft
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object DevLsh {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, sf)
      val q = emb.filter(col("vec_id") % 100 === 0)
      val nq = q.count()
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select("qid", "nid").cache()
      exact.count()
      for ((nb, nt) <- Seq((4, 24), (4, 32), (3, 24))) {
        val approx = Similarity.lshTopK(emb, q, "vec_id", "embedding", 5, nb, nt)
          .select("qid", "nid")
        val hits = exact.join(approx, Seq("qid", "nid"))
          .groupBy("qid").agg(count(lit(1)).as("h"))
        val pass = hits.filter(col("h") >= 3).count()
        val minH = hits.agg(min("h")).head().getLong(0)
        println(f"[lsh] $sf%-25s nBits=$nb nTables=$nt pass=$pass/$nq minHits=$minH")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
