package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev probe: IVF recall vs parameters at multiple scale factors.
  * Usage: sbt "Test/runMain graft.DevIvf"
  */
object DevIvf {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, sf)
      val n = emb.count()
      val q = emb.filter(col("vec_id") % 100 === 0)
      val nq = q.count()
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select("qid", "nid").cache()
      exact.count()
      val nlist = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
      for (nassign <- Seq(1, 2); frac <- Seq(0.25, 0.4, 0.5, 0.6);
           lloyd <- Seq(0, 1)) {
        val nprobe = math.max(1, math.ceil(frac * nlist).toInt)
        val t0 = System.nanoTime()
        val approx = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
          nlist, nprobe, 42L, nassign, lloydIters = lloyd).select("qid", "nid")
        val hits = exact.join(approx, Seq("qid", "nid"))
          .groupBy("qid").agg(count(lit(1)).as("h"))
        val byHits = hits.groupBy("h").count().orderBy("h")
          .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
        val pass = hits.filter(col("h") >= 3).count()
        val minH = hits.agg(min("h")).head().getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[ivf] $sf%-25s N=$n%5d nlist=$nlist%3d nassign=$nassign frac=$frac%.2f nprobe=$nprobe%3d lloyd=$lloyd pass=$pass/$nq minHits=$minH ${sec}%.1fs hist[$byHits]")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
