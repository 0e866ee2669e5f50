package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination — the training-data stage that flags
  * documents overlapping a benchmark/eval corpus by long word n-grams
  * (the standard "k-gram collision" contamination test).
  *
  * Shape: inverted-index semi-join on the shingle column — the
  * benchmark's distinct k-grams form a (usually broadcastable) probe
  * set; training docs join on exact shingle match, so cost tracks
  * collisions, never |docs| × |bench|. Shingles come from the native
  * `word_shingles` kernel and are distinct per doc by construction, so
  * `n_hits` counts DISTINCT contaminated k-grams per document.
  */
object Decontaminate {

  /** (doc_id, n_hits) for every training doc sharing ≥1 word `k`-gram
    * with the benchmark corpus; docs with no overlap are absent (inner
    * semantics — compose with a left join for a full report).
    */
  def overlapCounts(docs: DataFrame, docText: String, docId: String,
                    bench: DataFrame, benchText: String,
                    k: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val dSh = docs.select(col(docId).as("doc_id"),
      explode(Dedup.shingles(col(docText), k)).as("sh"))
    val bSh = bench
      .select(explode(Dedup.shingles(col(benchText), k)).as("sh"))
      .distinct()
    dSh.join(bSh, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }
}
