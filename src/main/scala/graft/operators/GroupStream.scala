package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions.col

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

  /** The MR reduce contract as a STREAMING operator: rows route by
    * `keyCols`, arrive at each task sorted by `keyCols ++ sortCols`
    * (shuffle + sortWithinPartitions — the shuffle-sort), and `f` sees
    * each key's rows as a forward-only iterator in sort order. Nothing
    * is materialized per group — unlike `collect_list` (whose group
    * array must fit in memory) a 10⁷-row hot key streams through in
    * O(1), which is what the reference's disk-backed BackupStore exists
    * to approximate (`core:mapred/BackupStore.java`;
    * `ReduceContextImpl.java:184-210`).
    *
    * Contract for `f` (the MR reducer contract): the group iterator is
    * valid until the NEXT group starts — consume it before returning an
    * iterator that outlives the call (aggregate as you go); unconsumed
    * remainder rows are drained automatically.
    */
  def mapSortedGroups[T, K, R: Encoder](
      ds: Dataset[T], keyCols: Seq[String], sortCols: Seq[String],
      numPartitions: Int = 0)(
      key: T => K)(f: (K, Iterator[T]) => Iterator[R]): Dataset[R] = {
    val parts = if (numPartitions > 0) numPartitions
                else ds.sparkSession.sessionState.conf.numShufflePartitions
    val arranged = ds.repartition(parts, keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ sortCols).map(col): _*)
    arranged.mapPartitions { it0 =>
      val it = it0.buffered
      new Iterator[R] {
        private var out: Iterator[R] = Iterator.empty
        private var group: Iterator[T] = Iterator.empty
        private def advance(): Unit =
          while (!out.hasNext && { while (group.hasNext) group.next(); it.hasNext }) {
            val k = key(it.head)
            group = new Iterator[T] {
              override def hasNext: Boolean = it.hasNext && key(it.head) == k
              override def next(): T =
                if (hasNext) it.next() else throw new NoSuchElementException
            }
            out = f(k, group)
          }
        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): R = { advance(); out.next() }
      }
    }
  }
}
