package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard packing: assign documents, in a stable global order,
  * to shards of ~`tokenBudget` tokens each — the standard "pack the
  * corpus into fixed-token-size files" step before tokenizer/trainer
  * ingestion.
  *
  * The shard id is a function of the global running token total, i.e. a
  * PREFIX SUM over the ordered corpus. A window
  * `sum() OVER (ORDER BY ...)` computes it on ONE partition — a
  * scale-killer. This implements the classic two-pass distributed
  * prefix sum instead:
  *   1. range-partition by the order column (RangePartitioner — the
  *      same machinery as a global sort, no single-task stage);
  *   2. pass 1: per-partition token totals — one tiny array to the
  *      driver (O(#partitions), not data);
  *   3. pass 2: each partition re-streams with its exclusive prefix
  *      offset, emitting shard = ⌊preceding-total / budget⌋.
  * Deterministic for a given order column regardless of parallelism.
  */
object Shards {

  /** (orderCol ascending) → shard ids. `tokensCol` must be a
    * non-negative integral column. Output: input columns + `shard`
    * (long). Shard boundaries use the EXCLUSIVE running total, so a doc
    * starts a new shard only when the budget is already consumed —
    * every shard holds ≥1 doc even when single docs exceed the budget.
    */
  def packByTokenBudget(df: DataFrame, orderCol: String, tokensCol: String,
                        tokenBudget: Long, numPartitions: Int = 0): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    val arranged = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
    arranged.cache()
    try {
      // pass 1: per-partition totals (index → sum), tiny driver array
      val totals = arranged.select(col(tokensCol).cast("long"))
        .rdd.mapPartitionsWithIndex { (i, it) =>
          var s = 0L
          it.foreach(r => s += r.getLong(0))
          Iterator((i, s))
        }.collect().sortBy(_._1).map(_._2)
      val offsets = totals.scanLeft(0L)(_ + _) // exclusive prefix per partition
      val bOffsets = spark.sparkContext.broadcast(offsets)
      // pass 2: local running total + partition offset → shard id
      val schema = org.apache.spark.sql.types.StructType(
        arranged.schema.fields :+
          org.apache.spark.sql.types.StructField("shard",
            org.apache.spark.sql.types.LongType, nullable = false))
      val tokIdx = arranged.schema.fieldIndex(tokensCol)
      val out = arranged.rdd.mapPartitionsWithIndex { (i, it) =>
        var running = bOffsets.value(i)
        it.map { r =>
          val shard = running / tokenBudget
          running += r.getAs[Number](tokIdx).longValue // widen int token cols
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ shard)
        }
      }
      spark.createDataFrame(out, schema)
    } finally arranged.unpersist(blocking = false)
  }

  /** Deterministic stratified bottom-k sample: the `n` rows with the
    * smallest stable content hashes per stratum — exact-size per-stratum
    * sampling that is reproducible across engines and reshardings
    * (unlike rand()-based sampleBy). Declarative rank ≤ n over a
    * stratum window: Catalyst's WindowGroupLimit rewrites it to a
    * per-partition top-k + merge, so a 10⁹-row stratum never fully
    * sorts. Output: input columns + `rn` (1..n by hash order).
    */
  def stratifiedBottomK(df: DataFrame, strataCol: String, keyCol: String,
                        n: Int): DataFrame = {
    val h = md5(col(keyCol).cast("string"))
    df.withColumn("rn", row_number().over(
        Window.partitionBy(col(strataCol)).orderBy(h, col(keyCol))))
      .filter(col("rn") <= n)
  }

  /** Deterministic per-source corpus mixing: keep a row iff its stable
    * content hash falls under the source's weight (0..1) — the
    * domain-reweighting step of corpus assembly. Hash-threshold
    * sampling (same first-2-hex-digit trick as splitAssign) is stable
    * under resharding and engine-reproducible; sources absent from
    * `weights` default to `defaultWeight`.
    */
  def weightedSampleFilter(key: Column, sourceCol: Column,
                           weights: Map[String, Double],
                           defaultWeight: Double = 1.0): Column = {
    // 4 hex digits = 1/65536 resolution, so sub-percent weights (0.1%)
    // round to a usable threshold instead of collapsing to 0 or 1/256.
    def thresh(w: Double): String = {
      require(w >= 0 && w <= 1, s"weight out of [0,1]: $w")
      if (w >= 1.0) "zzzz" else f"${(65536 * w).toInt}%04x"
    }
    val h = substring(md5(key.cast("string")), 1, 4)
    val cases = weights.toSeq.sortBy(_._1).foldLeft(lit(null).cast("string")) {
      case (acc, (src, w)) => when(sourceCol === src, thresh(w)).otherwise(acc)
    }
    h < coalesce(cases, lit(thresh(defaultWeight)))
  }
}
