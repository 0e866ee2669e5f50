package graft

import org.apache.spark.sql.SparkSession

/** Dev loop: run selected declared queries and print row counts (+ first
  * rows with -v). `sbt "Test/runMain graft.DevRun sim2_lsh dd3_simhash"`.
  */
object DevRun {
  def main(args: Array[String]): Unit = {
    val verbose = args.contains("-v")
    val names = args.filterNot(_.startsWith("-"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val explain = args.contains("-e")
    // -o: dump each query's result to /tmp/graft-dev/<name> as parquet
    // (the Verify layout) so a dev-loop DuckDB compare can hash it.
    val dump = args.contains("-o")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = queries.Queries.all(n)(spark, sfDir)
      if (explain) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      if (dump) df.coalesce(1).write.mode("overwrite")
        .parquet(s"/tmp/graft-dev/$n")
      val rows = df.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[dev] $n: ${rows.length} rows in $dt%.1fs")
      if (verbose) rows.take(30).foreach(r => println(s"[dev]   $r"))
    }
    spark.stop()
  }
}
