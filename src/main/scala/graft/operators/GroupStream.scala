package graft.operators

/** Streaming within-group computations for reduce-side group iteration
  * (reference context: the mark/reset value iterator of
  * `core:mapreduce/task/ReduceContextImpl.java:184-210` backed by
  * `core:mapred/BackupStore.java` — the reference spills a re-iterated
  * group to disk; the Spark-first answer is to not re-iterate at all:
  * compute group statistics in ONE forward pass with memory bounded by
  * the statistic, not the group).
  */
object GroupStream {

  /** Count of strictly-ordered pairs (a < b) in one streaming pass:
    * closed form C(n,2) − Σ_v C(m_v,2) over the value counts. O(n) time,
    * O(distinct values) memory — a hot key with 10⁷ rows holds only its
    * value histogram, never the rows. Returns (n, pairs).
    */
  def strictlyOrderedPairs(values: Iterator[Long]): (Long, Long) = {
    val counts = scala.collection.mutable.LongMap.empty[Long]
    var n = 0L
    values.foreach { v => n += 1; counts(v) = counts.getOrElse(v, 0L) + 1L }
    var ties = 0L
    counts.foreachValue(m => ties += m * (m - 1) / 2)
    (n, n * (n - 1) / 2 - ties)
  }
}
