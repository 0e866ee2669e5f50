package graft
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"===== $n")
      println(queries.Queries.all(n)(spark, "/root/testdata/sf0.01")
        .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
