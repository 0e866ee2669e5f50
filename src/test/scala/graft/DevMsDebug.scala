package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, TextOps}

/** Throwaway diagnostic for the t44 gate: print each query's per-term
  * df, the essential/head split at the gate's dials, the head ub sum,
  * and the 5th-best essential-only score — to see why verification
  * does or doesn't pass at sf0.01. */
object DevMsDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), concat(col("text"), lit(" zzhead")).as("text"))
    Retrieval.bm25Build(docs, "doc_id", "text", "msdbg")
    val q = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("qid"),
        concat(concat_ws(" ",
          slice(TextOps.tokens(lower(col("text"))), 1, 3)), lit(" zzhead"))
          .as("qtext"))
    val qt = q.select(col("qid"),
      explode(TextOps.tokens(lower(col("qtext")))).as("term")).distinct()
    val dict = spark.table("msdbg_terms").groupBy("term")
      .agg(sum("df").as("df"))
    val rows = qt.join(dict, Seq("term"))
      .select("qid", "term", "df").collect()
    val n = spark.table("msdbg_stats").agg(sum("n_docs")).head().getLong(0)
    val essCap = math.max(1L, (0.5 * n).toLong)
    def ub(df: Long): Long = math.ceil(
      math.log((n.toDouble - df + 0.5) / (df + 0.5) + 1.0) * 2.2 * 1e6).toLong
    println(s"[msdbg] n=$n essCap=$essCap")
    rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(r => (r.getLong(2), r.getString(1)))
      val rarest = sorted.head.getString(1)
      val ess = sorted.filter(_.getLong(2) <= essCap)
        .map(_.getString(1)).toSet + rarest
      val ne = sorted.filterNot(r => ess(r.getString(1)))
      val neSum = ne.map(r => ub(r.getLong(2))).sum
      println(s"[msdbg] qid=$qid terms=" +
        sorted.map(r => s"${r.getString(1)}(df=${r.getLong(2)})").mkString(",") +
        s" ess=${ess.mkString("|")} neSum=$neSum")
    }
    // 5th-best essential-only score per query, via the public API on an
    // essential-only query text is awkward — approximate with full BM25
    // minus zzhead from the query:
    val qNoHead = q.select(col("qid"),
      regexp_replace(col("qtext"), " zzhead", "").as("qtext"))
    Retrieval.bm25Query(spark, "msdbg", qNoHead, "qid", "qtext", 5)
      .filter(col("rnk") === 5)
      .orderBy("qid")
      .collect()
      .foreach(r => println(s"[msdbg] qid=${r.get(0)} L1~=${r.get(2)}"))
    spark.stop()
  }
}
