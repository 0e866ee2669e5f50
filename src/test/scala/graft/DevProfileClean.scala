package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

/** One-off slice profiler for the p1 cleaning pipeline (bench_clean). */
object DevProfileClean {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val base = Tables.documents(spark, sfDir)

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val r = body
      println(f"[prof] $name: $r in ${(System.nanoTime() - t0) / 1e9}%.2fs")
      System.out.flush()
    }

    time("warmup count")(base.count())
    val winners = base.groupBy(md5(col("text")).as("digest"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val uniq = base.join(winners, "doc_id")
    time("uniq via join")(uniq.count())
    val uniq2 = base.groupBy(md5(col("text")).as("digest"))
      .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.text").as("text"))
    time("uniq via min_by")(uniq2.count())
    val dropped = Dedup.ngramJaccardPairs(uniq, "text", "doc_id",
        k = 3, threshold = 0.8, maxShingleFreq = 5)
      .select(col("idb").as("doc_id")).distinct()
    time("dropped (jaccard on uniq-join)")(dropped.count())
    val dropped2 = Dedup.ngramJaccardPairs(uniq2, "text", "doc_id",
        k = 3, threshold = 0.8, maxShingleFreq = 5)
      .select(col("idb").as("doc_id")).distinct()
    time("dropped (jaccard on uniq-min_by)")(dropped2.count())
    def fullP1(u: org.apache.spark.sql.DataFrame,
               dr: org.apache.spark.sql.DataFrame): Long =
      u.join(dr, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))
        .filter(col("n_tokens") >= 5)
        .orderBy("doc_id").count()
    time("full p1 (join)")(fullP1(uniq, dropped))
    time("full p1 (join) again")(fullP1(uniq, dropped))
    time("full p1 (min_by)")(fullP1(uniq2, dropped2))
    time("full p1 (min_by) again")(fullP1(uniq2, dropped2))
    spark.stop()
  }
}
