package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-way join compositions with the reference's composite-join semantics
  * (reference: hadoop-mapreduce-client-core `mapreduce/lib/join/` —
  * `InnerJoinRecordReader.java:34-53`, `OuterJoinRecordReader.java:34-50`,
  * `OverrideRecordReader.java:42-110`).
  *
  * All inputs are DataFrames with a join-key column `keyCol`; the
  * composition is declarative, so Catalyst is free to pick broadcast vs
  * shuffle joins per side (small dims auto-broadcast under
  * `autoBroadcastJoinThreshold`; AQE can re-plan at runtime).
  */
object OverrideJoin {

  /** `override(s1, …, sN)`: per key, emit rows only from the RIGHTMOST
    * source containing that key — a dedup-priority union, NOT an outer
    * join + coalesce (that would cross-product duplicate keys;
    * `OverrideRecordReader.java:84-110` explicitly skips the cross
    * product). Implemented as anti-join-filtered unions: source i
    * contributes exactly its rows whose key appears in no source j > i.
    *
    * Scale: each anti-join shuffles (or broadcasts) only the *keys* of the
    * higher-priority sources, never their payloads; no row is duplicated.
    */
  def overrideJoin(sources: Seq[DataFrame], keyCol: String): DataFrame = {
    require(sources.nonEmpty, "overrideJoin needs at least one source")
    // Walk right-to-left, tracking the union of higher-priority key sets.
    val (result, _) = sources.reverse.tail.foldLeft(
      (sources.last, sources.last.select(keyCol))) {
      case ((acc, seenKeys), src) =>
        val contrib = src.join(seenKeys.distinct(), Seq(keyCol), "left_anti")
        (acc.unionByName(contrib), seenKeys.unionByName(src.select(keyCol)))
    }
    result
  }

  /** n-way inner composite join (key must appear in ALL sources). */
  def innerJoin(sources: Seq[DataFrame], keyCol: String): DataFrame =
    sources.reduce((a, b) => a.join(b, Seq(keyCol), "inner"))

  /** n-way full-outer composite join: every key from any source, absent
    * slots null (TupleWritable presence-bitmask semantics → nullable
    * struct slots).
    */
  def outerJoin(sources: Seq[DataFrame], keyCol: String): DataFrame =
    sources.reduce((a, b) => a.join(b, Seq(keyCol), "full_outer"))
}
