package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.{Dedup, Similarity}

/** Continuous corpus refresh — the streaming form of the incremental
  * dedup loop (dd5 check + dd6 absorb), lifted onto Structured
  * Streaming: each micro-batch of documents is
  *
  *  1. near-dup-checked WITHIN the batch (MinHash LSH pairs — a doc
  *     whose near-duplicate with a smaller id arrived in the same
  *     micro-batch is a dup);
  *  2. checked AGAINST the standing persisted MinHash index
  *     ([[Dedup.minhashDedupAgainst]] — O(batch), co-located bucketed
  *     joins, the corpus is never re-scanned);
  *  3. split: dup rows and novel rows hand off to the caller's router
  *     (write to quarantine/clean sinks, metrics, …);
  *  4. the novel rows are absorbed into the index
  *     ([[Dedup.minhashIndexAppend]] — O(novel)), so the NEXT
  *     micro-batch deduplicates against everything admitted so far.
  *
  * At 100 TB standing corpus the per-batch cost tracks the batch
  * (BASELINE.md measures the check flat and the append batch-sized as
  * the corpus grows 5×); run [[graft.operators.BucketedJoin.compactBucketed]]
  * on a slow cadence to fold accumulated append files.
  *
  * Intra-batch policy is pairwise-greedy, matching the batch dedup
  * family: a doc is a dup if it has a near-duplicate with a SMALLER id
  * in the same batch (no transitive closure — for near-dup chains
  * a~b~c with a≁c, both b and c drop; exact duplicates always chain
  * correctly since equality is transitive).
  *
  * The returned writer still needs a checkpoint/trigger/start from the
  * caller. Restart semantics: foreachBatch may REPLAY the last epoch
  * after a crash, and the index append is not idempotent — route with
  * an epoch-keyed sink (e.g. overwrite-by-epoch partition) and dedup
  * replayed ids downstream, or checkpoint after append (accepted
  * at-least-once, the same contract as any foreachBatch side effect).
  *
  * The appends run on the micro-batch's cloned session; any OTHER
  * session reading the index tables afterwards must
  * `spark.catalog.refreshTable` first (standard semantics for a table
  * appended outside the reader's session).
  */
object RefreshLoop {

  /** `onBatch(dups, novel, epoch)`: `dups` is
    * (batch_id, match_id, est_jaccard, source) where source is
    * "corpus" (matched the standing index) or "batch" (matched a
    * smaller-id doc in the same micro-batch); `novel` is the admitted
    * subset of the batch, already absorbed into the index by the time
    * the call returns the next epoch.
    *
    * `compactEvery` > 0 folds the accumulated per-append files back to
    * one per bucket ([[graft.operators.BucketedJoin.compactBucketed]])
    * after every Nth epoch — the slow-cadence maintenance that keeps
    * file counts bounded on a long-running stream (each epoch's append
    * adds one file set per bucket; lookups stay correct either way,
    * compaction is purely about file-count/open-cost hygiene).
    */
  def minhashRefresh(stream: DataFrame, table: String,
                     textCol: String, idCol: String,
                     threshold: Double = 0.5, k: Int = 3,
                     numHashes: Int = 64, bands: Int = 16,
                     compactEvery: Int = 0)
                    (onBatch: (DataFrame, DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val spark = batch.sparkSession
      // micro-batch sources re-read on every action; pin the batch once
      val b = batch.persist()
      try {
        val intra = Dedup.minhashLshPairs(b, textCol, idCol,
            k, numHashes, bands, threshold)
          .select(col("idb").as("batch_id"), col("ida").as("match_id"),
            col("est_jaccard"), lit("batch").as("source"))
        val inter = Dedup.minhashDedupAgainst(spark, table, b,
            textCol, idCol, threshold, k, numHashes, bands)
          .select(col("batch_id"), col("corpus_id").as("match_id"),
            col("est_jaccard"), lit("corpus").as("source"))
        val dups = inter.unionByName(intra).persist()
        try {
          val dupIds = dups.select(col("batch_id").as(idCol)).distinct()
          val novel = b.join(dupIds, Seq(idCol), "left_anti").persist()
          try {
            onBatch(dups, novel, epoch)
            Dedup.minhashIndexAppend(spark, table, novel, textCol, idCol,
              k, numHashes, bands)
            if (compactEvery > 0 && (epoch + 1) % compactEvery == 0) {
              graft.operators.BucketedJoin.compactBucketed(spark,
                s"${table}_sigs", "id")
              graft.operators.BucketedJoin.compactBucketed(spark,
                s"${table}_bands", "bandkey")
            }
          } finally novel.unpersist()
        } finally dups.unpersist()
      } finally b.unpersist()
    }

  /** The embedding twin of [[minhashRefresh]]: micro-batches of
    * vectors dedup against a persisted LSH bucket index
    * ([[Similarity.lshIndexBuild]] — the admission-control structure
    * whose check cost is O(batch + collisions), FLAT as the corpus
    * grows) and within themselves (LSH-blocked cosine pairs), then
    * novel vectors are absorbed with [[Similarity.lshIndexAppend]] so
    * the next micro-batch sees them. An IVF dedup check would pay
    * O(batch · probeFrac · corpus) — the probed lists grow with N —
    * so the loop deliberately does NOT check against IVF; pass
    * `ivfTable` to also absorb admitted vectors into a standing IVF
    * QUERY-serving index ([[Similarity.ivfAppend]], frozen centroids),
    * keeping the serving index fresh as a side effect of admission.
    *
    * `dups` rows are (batch_id, match_id, cos, source ∈ batch|corpus);
    * a resubmitted id matches its own indexed row (no self-filter,
    * like the minhash twin). `nBits`/`nTables`/`seed` must match the
    * index build. Same at-least-once restart contract and
    * `compactEvery` cadence as [[minhashRefresh]].
    */
  def embeddingRefresh(stream: DataFrame, table: String,
                       idCol: String, vecCol: String,
                       threshold: Double = 0.999,
                       nBits: Int = 16, nTables: Int = 8,
                       seed: Long = 42L,
                       ivfTable: Option[String] = None, nassign: Int = 2,
                       compactEvery: Int = 0)
                      (onBatch: (DataFrame, DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val spark = batch.sparkSession
      val b = batch.persist()
      try {
        val intra = Similarity.cosineNearDupPairsBlocked(b, idCol, vecCol,
            threshold, nBits, nTables, seed)
          .select(col("idb").as("batch_id"), col("ida").as("match_id"),
            col("cos"), lit("batch").as("source"))
        val inter = Similarity.lshDedupAgainst(spark, table, b, idCol, vecCol,
            threshold, nBits, nTables, seed)
          .select(col("batch_id"), col("corpus_id").as("match_id"),
            col("cos"), lit("corpus").as("source"))
        val dups = inter.unionByName(intra).persist()
        try {
          val dupIds = dups.select(col("batch_id").as(idCol)).distinct()
          val novel = b.join(dupIds, Seq(idCol), "left_anti").persist()
          try {
            onBatch(dups, novel, epoch)
            // ORDER MATTERS: novel's plan reads the LSH tables (through
            // dups), and Spark uncaches any cached plan whose tables an
            // insert mutates — so the LSH append must be novel's LAST
            // consumer. Appending LSH first would invalidate novel's
            // cache and the IVF absorb would recompute it against the
            // already-grown index, where every novel row self-matches
            // and the recomputed frame is empty.
            ivfTable.foreach(t =>
              Similarity.ivfAppend(spark, t, novel, idCol, vecCol, nassign))
            Similarity.lshIndexAppend(spark, table, novel, idCol, vecCol,
              nBits, nTables, seed)
            if (compactEvery > 0 && (epoch + 1) % compactEvery == 0) {
              graft.operators.BucketedJoin.compactBucketed(spark,
                s"${table}_vecs", "id")
              graft.operators.BucketedJoin.compactBucketed(spark,
                s"${table}_buckets", "bkey")
              ivfTable.foreach(t =>
                graft.operators.BucketedJoin.compactBucketed(spark, t, "cid"))
            }
          } finally novel.unpersist()
        } finally dups.unpersist()
      } finally b.unpersist()
    }
}
