package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.LangModel

/** Component timing for the bench_lm serving shape (sf0.1 corpus-wide
  * score): isolates the round-15 control-plane additions — the
  * small-batch doc probe, the stats-ledger read, the triple heal —
  * from the fold itself, so band regressions adjudicate against data
  * instead of suspicion. `sbt "Test/runMain graft.DevLmBench"`.
  */
object DevLmBench {
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
    def timed(label: String)(body: => Unit): Unit = {
      body // warm
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[lmbench] $label=${ts(1)}%.3fs (${ts.mkString(", ")})")
      System.out.flush()
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = Tables.documents(spark, sfDir)
    val t = "devlmbench_idx"
    LangModel.train(docs, "doc_id", "text", t)
    timed("probe-only") {
      docs.limit((1 << 11) + 1).count(); ()
    }
    timed("stats-read") {
      spark.table(s"${t}_stats").agg(coalesce(sum("v"), lit(0L))).head(); ()
    }
    timed("score-noprobe") {
      force(LangModel.score(spark, t, docs, "doc_id", "text",
        maxPushDocs = 0))
    }
    timed("score-default") {
      force(LangModel.score(spark, t, docs, "doc_id", "text"))
    }
    spark.stop()
  }
}
