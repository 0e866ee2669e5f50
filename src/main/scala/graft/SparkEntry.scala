package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real registry lives in graft.queries.Queries.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the J1 fact⋈dim join + aggregate (lineitem ⋈ orders) — exercises
    * scan, join, partial agg, and sort in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Queries.j1_join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.all

  /** DuckDB-runnable oracle SQL per query (omissions ⇒ rows-only check).
    * Only the two self-validating compute kernels (o3_terasort, m1_pi)
    * omit an oracle; the approximate operators (dd2/dd3/sim2) are gated
    * through recall queries whose expected output IS SQL-expressible
    * (see the per-query comments in Queries.scala).
    */
  def oracleSql: Map[String, String] = graft.queries.Queries.oracles
}
