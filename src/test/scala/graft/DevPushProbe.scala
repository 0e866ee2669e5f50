package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical probe of the parquet IN-pushdown depth limit: Spark
  * translates a pushed `In(col, values)` into parquet-mr's filter tree,
  * and past some value count the predicate's recursive evaluation
  * overflows the executor stack (observed: DevLm round-15, a ~3k-value
  * pushed list killed the scan with StackOverflowError). This probe
  * finds the breaking point on THIS Spark/parquet build so the
  * engine's push caps carry a measured safety margin instead of a
  * guess. `sbt "Test/runMain graft.DevPushProbe"`.
  */
object DevPushProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val table = "devpush_probe"
    if (!spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(table))) {
      val df = spark.range(2000000L)
        .select(concat(lit("w"), format_string("%08d", col("id"))).as("w"),
          (col("id") % 1000).as("v"))
      operators.BucketedJoin.writeBucketed(df, table, "w", 8)
    }
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(256, 512, 1024, 2048, 3072, 4096, 6144, 8192, 12288, 16384)
    sizes.foreach { k =>
      spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
        (k + 1).toString)
      val values = (0 until k).map(i => f"w${i * 97}%08d")
      val t0 = System.nanoTime()
      val r = try {
        val c = spark.table(table).filter(col("w").isin(values: _*))
          .agg(count(lit(1))).head().getLong(0)
        f"ok count=$c time=${(System.nanoTime() - t0) / 1e9}%.2fs"
      } catch {
        case e: Throwable =>
          val root = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).toSeq.last
          s"FAILED ${root.getClass.getSimpleName}"
      }
      println(s"[push] k=$k $r")
      System.out.flush()
    }
    spark.stop()
  }
}
