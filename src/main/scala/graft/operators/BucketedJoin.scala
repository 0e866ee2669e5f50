package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located join — the faithful Spark analog of the
  * reference's map-side merge join precondition
  * (`core:mapreduce/lib/join/CompositeInputFormat.java:120-130`: k
  * datasets identically partitioned AND sorted, split i joined against
  * split i with no shuffle at join time).
  *
  * `bucketBy(n, key).sortBy(key)` persists exactly that invariant in the
  * table layout; a subsequent equi-join of two tables bucketed the same
  * way runs as a sort-merge join with NO Exchange on either side — the
  * shuffle was paid once at write time, like the reference's
  * pre-partitioned inputs. At 100 TB this is the pattern for repeated
  * fact⋈fact joins: bucket both tables on the join key once, join many
  * times shuffle-free.
  */
object BucketedJoin {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The bucket count a shard MERGE should build with: `table0`'s
    * layout wins (the merged tables rebucket `table1`'s rows into it),
    * and a differing `table1` spec is warned about loudly — the merge
    * is correct either way (bucketing is a co-location/file-layout
    * property, never a correctness one), but silently changing a
    * family's bucket profile surprises capacity planning. Shared by
    * every family's mergeShards twin.
    */
  private[operators] def mergedBucketCount(spark: SparkSession,
                                           table0: String,
                                           table1: String): Int = {
    def spec(t: String) = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t))
      .bucketSpec.map(_.numBuckets)
    val (b0, b1) = (spec(table0), spec(table1))
    if (b0 != b1)
      log.warn(s"mergeShards: $table0 (${b0.getOrElse("unbucketed")} " +
        s"buckets) and $table1 (${b1.getOrElse("unbucketed")} buckets) " +
        s"disagree on bucket layout — the merged family keeps $table0's; " +
        s"$table1's rows rebucket into it")
    b0.getOrElse(8)
  }

  /** Drop `table` from the catalog AND delete its warehouse directory:
    * the default in-memory catalog forgets tables across JVMs while
    * their files survive, and saveAsTable/RENAME refuse a fresh managed
    * table over an existing location.
    */
  private[graft] def dropWithLocation(spark: SparkSession,
                                      table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/${table.toLowerCase}")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(loc, true)
  }

  /** Persist `df` as a bucketed, per-bucket-sorted table, replacing any
    * prior table and its files (see [[dropWithLocation]]). `sortCols`
    * appends SECONDARY sort columns after the bucket key — the layout
    * dial behind e.g. the BM25 block-max index (sorted `(term, blk,
    * doc_id)` files make pushed doc/block predicates page-skippable);
    * [[appendBucketed]] and [[rewriteBucketed]] read the sort spec back
    * from the catalog, so the layout survives appends and compactions.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil,
                    options: Map[String, String] = Map.empty): Unit = {
    val spark = df.sparkSession
    dropWithLocation(spark, table)
    df.write.mode("overwrite")
      .options(options)
      .bucketBy(buckets, key).sortBy(key, sortCols: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Append `df` to an existing bucketed table, preserving the layout:
    * rows are re-bucketed by the table's OWN bucket spec (read from the
    * catalog, so a caller can't silently mis-bucket), each append adds
    * one sorted file per bucket, and later co-located joins still see
    * one partition per bucket with NO Exchange — at most a LOCAL
    * per-partition sort re-merges the per-append sorted runs. Append
    * cost is O(df), never O(table): this is the incremental half of the
    * pay-the-shuffle-once contract ([[writeBucketed]] being the
    * build-once half, [[compactBucketed]] the occasional fold of
    * accumulated append files). Falls back to a fresh [[writeBucketed]]
    * when the table doesn't exist yet.
    */
  def appendBucketed(df: DataFrame, table: String, key: String,
                     defaultBuckets: Int = 8,
                     options: Map[String, String] = Map.empty): Unit = {
    val spark = df.sparkSession
    val cat = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    if (!cat.tableExists(ident))
      writeBucketed(df, table, key, defaultBuckets, options = options)
    else {
      val spec = cat.getTableMetadata(ident).bucketSpec
      val n = spec.map(_.numBuckets).getOrElse(defaultBuckets)
      // the table's OWN sort spec (key + any secondary layout columns),
      // so appends preserve e.g. a block-max (term, blk, doc_id) layout
      val sortCols = spec.map(_.sortColumnNames).filter(_.nonEmpty)
        .getOrElse(Seq(key))
      // pre-partition on the bucket hash so each task owns exactly one
      // bucket → exactly n new files per append, not tasks×n
      df.repartition(n, org.apache.spark.sql.functions.col(key))
        .write.mode("append")
        .options(options)
        .bucketBy(n, key).sortBy(sortCols.head, sortCols.tail: _*)
        .format("parquet")
        .saveAsTable(table)
    }
  }

  /** Fold a bucketed table's accumulated append file sets back to one
    * file per bucket. O(table) once, instead of every batch paying it:
    * run on the compaction cadence, not the ingest cadence.
    *
    * Crash-safe swap: the rewrite stages into `<table>_compacting`, the
    * original renames aside to `<table>_old`, the staged table renames
    * in, and ONLY THEN is the original dropped — no step deletes the
    * only copy, so a kill at any point leaves the rows recoverable and
    * [[recoverCompacted]] (run automatically on the next compact)
    * rolls the swap forward or back. The one non-atomic window is the
    * instant between the two renames, where `table` is briefly absent
    * from the catalog (readers in that window retry after recovery);
    * data files are never at risk.
    */
  def compactBucketed(spark: SparkSession, table: String, key: String): Unit =
    rewriteBucketed(spark, table, key)(identity)

  /** The compaction swap, generalized: replace a bucketed table with
    * `transform` of itself through the same crash-safe
    * stage → rename-aside → rename-in → drop-old sequence (see
    * [[compactBucketed]] for the recovery states). Used for
    * filtered rewrites — e.g. retention pruning of an append-only
    * ledger — where the rewrite must never risk the only copy.
    */
  def rewriteBucketed(spark: SparkSession, table: String, key: String)
                     (transform: DataFrame => DataFrame): Unit =
    rewriteBucketedImpl(spark, table, key, failAt = -1)(transform)

  /** Crash injected by [[rewriteBucketedImpl]]'s test seam. */
  private[graft] final class InjectedRewriteCrash(val at: Int)
    extends RuntimeException(s"injected rewrite crash after boundary $at")

  /** [[rewriteBucketed]] with a crash-injection seam: `failAt` ≥ 0
    * throws [[InjectedRewriteCrash]] immediately AFTER the numbered
    * swap boundary — 0 stage write, 1 debris clear, 2 rename-aside,
    * 3 rename-in, 4 old-copy drop (complete). Chaos specs drive every
    * boundary and assert [[recoverCompacted]] (run on the next rewrite,
    * or by heal-on-read callers) restores a consistent table;
    * production calls pass -1 (no injection).
    */
  private[graft] def rewriteBucketedImpl(spark: SparkSession, table: String,
                                         key: String, failAt: Int)
                                        (transform: DataFrame => DataFrame)
      : Unit = {
    def boundary(i: Int): Unit =
      if (failAt == i) throw new InjectedRewriteCrash(i)
    recoverCompacted(spark, table)
    val cat = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val spec = cat.getTableMetadata(ident).bucketSpec
    val n = spec.map(_.numBuckets).getOrElse(8)
    // preserve secondary sort layout columns across the rewrite — but
    // only those the transform's output still carries (a derived-table
    // rewrite may emit a different schema with its own plain layout)
    val outCols = transform(spark.table(table)).columns.toSet
    val sortTail = spec.map(_.sortColumnNames.drop(1)).getOrElse(Nil)
      .filter(outCols)
    val tmp = s"${table}_compacting"
    val old = s"${table}_old"
    writeBucketed(transform(spark.table(table)), tmp, key, n, sortTail)
    boundary(0)
    // clear stale debris (a forgotten catalog entry or orphaned dir
    // would make the rename-aside collide)
    dropWithLocation(spark, old)
    boundary(1)
    spark.sql(s"ALTER TABLE $table RENAME TO $old")
    boundary(2)
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    boundary(3)
    spark.sql(s"DROP TABLE $old")
    boundary(4)
  }

  /** Repair an interrupted [[compactBucketed]] swap. Idempotent; safe
    * to call when no compact ever ran. States and actions:
    *  - `table` present, `<table>_compacting` present (killed before
    *    the rename-aside): the staged copy may be partial — drop it,
    *    the original is untouched;
    *  - `table` absent, `<table>_compacting` present (killed between
    *    the renames): the staged copy is complete (it is only ever
    *    renamed aside AFTER the stage write finishes) — roll FORWARD by
    *    renaming it in;
    *  - `table` absent, only `<table>_old` present: roll BACK by
    *    renaming the original home;
    *  - `table` present, `<table>_old` present (killed before the final
    *    drop): finish the drop.
    */
  def recoverCompacted(spark: SparkSession, table: String): Unit = {
    val cat = spark.sessionState.catalog
    def exists(t: String) =
      cat.tableExists(org.apache.spark.sql.catalyst.TableIdentifier(t))
    val tmp = s"${table}_compacting"
    val old = s"${table}_old"
    if (!exists(table)) {
      if (exists(tmp)) spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
      else if (exists(old)) spark.sql(s"ALTER TABLE $old RENAME TO $table")
    }
    if (exists(table)) {
      if (exists(old)) spark.sql(s"DROP TABLE $old")
      if (exists(tmp)) dropWithLocation(spark, tmp)
    }
  }

  /** Join two same-bucketed tables on their bucket key. The returned
    * plan contains no shuffle for the join itself (verify with
    * `hasJoinShuffle`).
    */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
           key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True if the executed plan still contains an Exchange feeding the
    * join — the assertion hook for the no-shuffle invariant.
    */
  def hasJoinShuffle(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("Exchange hashpartitioning")
  }
}
