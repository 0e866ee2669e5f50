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

  /** DuckDB-runnable oracle SQL per query (omissions ⇒ rows-only check:
    * o3_terasort / m1_pi are self-validating compute kernels;
    * dd2/dd3/sim2/t3 are hash-seeded approximate operators verified in
    * ScalaTest against exact baselines instead).
    */
  def oracleSql: Map[String, String] = graft.queries.Queries.oracles
}
