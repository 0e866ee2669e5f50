package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k of (cos, nid) pairs per group — the hot ranking
  * tail of the ANN operators (`Similarity.rankTopK`).
  *
  * Semantics are EXACTLY [[Aggregators.TopKByScore]] (the typed
  * reference implementation, property-pinned in AggregatorsSpec and
  * asserted equal to this one): the k best DISTINCT nids under the
  * strict total order (cos desc, nid asc), each retained at its MAX
  * observed score. Per-nid max dedup (not pair-equality dedup) matters
  * for exactly one caller: residual-encoded ivfPqQuery, where a
  * multi-assigned doc probed via both its lists carries two DIFFERENT
  * ADC estimates — pair dedup would let one nid eat two of the refineK
  * candidate slots and shrink the distinct pool. Every other caller's
  * duplicates carry the same rounded score, for which per-nid max is
  * identical to the old pair dedup. The bounded buffer stays exact:
  * a row is rejected only when k better distinct-nid entries are
  * retained, each of whose final per-nid max only improves, so the
  * admission threshold is monotone and a rejected row can never belong
  * to the final top-k of per-nid maxes.
  *
  * Why not the udaf: `ScalaAggregator` deserializes every input row to
  * a Scala tuple and the immutable buffer reallocates per accepted
  * entry — measured as a ~40% bench_ann tax at sf0.1 and the dominant
  * cost of ranking 10⁹ brute-force rows at 10⁷ corpus. Here update
  * reads two primitive fields and the buffer is two parallel arrays;
  * the common candidate (worse than everything retained) costs two
  * comparisons and no allocation.
  */
case class TopKScoreAgg(nid: Expression, cos: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKScoreAgg.Buf] {
  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(nid, cos)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("nid", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKScoreAgg.Buf =
    new TopKScoreAgg.Buf(k)

  // Null or NaN scores are SKIPPED, in both this and the typed
  // reference: a non-finite score is not a ranking. (The replaced
  // window form ranked NaN first — Spark orders NaN above any double —
  // and primitive NaN != NaN would also break the heap's dedup and
  // sorted-buffer invariants if admitted.)
  override def update(b: TopKScoreAgg.Buf, row: InternalRow): TopKScoreAgg.Buf = {
    val n = nid.eval(row)
    val c = cos.eval(row)
    if (n != null && c != null) {
      val cd = c.asInstanceOf[Double]
      if (!cd.isNaN) b.insert(cd, n.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKScoreAgg.Buf, o: TopKScoreAgg.Buf): TopKScoreAgg.Buf = {
    var i = 0
    while (i < o.size) { b.insert(o.cos(i), o.nid(i)); i += 1 }
    b
  }

  override def eval(b: TopKScoreAgg.Buf): Any = {
    val out = new Array[Any](b.size)
    var i = 0
    while (i < b.size) {
      out(i) = new GenericInternalRow(Array[Any](b.cos(i), b.nid(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKScoreAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.size * 16)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.cos(i)); bb.putLong(b.nid(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKScoreAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKScoreAgg.Buf(k)
    b.size = n
    var i = 0
    while (i < n) { b.cos(i) = bb.getDouble; b.nid(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKScoreAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKScoreAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKScoreAgg =
    copy(nid = newChildren(0), cos = newChildren(1))
  override def prettyName: String = "topk_score"
}

object TopKScoreAgg {
  /** Parallel-array heap, entries sorted best-first under
    * (cos desc, nid asc), size ≤ k.
    */
  final class Buf(k: Int) {
    var size: Int = 0
    val cos: Array[Double] = new Array[Double](k)
    val nid: Array[Long] = new Array[Long](k)

    // strict order on distinct pairs: (c1,n1) before (c2,n2) iff
    // c1 > c2 or (c1 == c2 and n1 < n2)
    private def better(c1: Double, n1: Long, c2: Double, n2: Long): Boolean =
      c1 > c2 || (c1 == c2 && n1 < n2)

    def insert(c: Double, n: Long): Unit = {
      // fast reject: full and the worst retained entry beats (c, n) —
      // if n is already retained, its entry also beats (c, n), so the
      // skip is correct whether or not n is present
      if (size == k && better(cos(size - 1), nid(size - 1), c, n)) return
      var i = 0
      while (i < size && better(cos(i), nid(i), c, n)) {
        if (nid(i) == n) return // n retained with a better entry: keep max
        i += 1
      }
      if (i < size && cos(i) == c && nid(i) == n) return // identical pair
      if (i >= k) return // all retained entries are better, buffer full
      // a WORSE retained entry for n (at or below i) is superseded —
      // shift it out instead of evicting the tail, so size is unchanged
      var dup = -1
      var p = i
      while (p < size && dup < 0) { if (nid(p) == n) dup = p; p += 1 }
      val last = if (dup >= 0) dup else math.min(size, k - 1)
      var j = last
      while (j > i) { cos(j) = cos(j - 1); nid(j) = nid(j - 1); j -= 1 }
      cos(i) = c; nid(i) = n
      if (dup < 0 && size < k) size += 1
    }
  }
}
