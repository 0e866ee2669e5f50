package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two strategies:
  *  - `bruteForceTopK`: exact cosine top-k — broadcast the (small) query
  *    set against the full corpus; one scan, no shuffle of the corpus,
  *    per-query top-k via window rank. The baseline and the verifier for
  *    the approximate path.
  *  - `lshTopK`: random-hyperplane LSH — corpus and queries hashed to
  *    sign-bit buckets; candidates = same-bucket pairs (multi-probe via
  *    several independent tables); exact cosine only on candidates. At
  *    100 TB this turns a full-corpus scan per query batch into a
  *    bucket-join whose cost tracks collision counts.
  *
  * Embeddings are cast to array<double> once; cosine is the codegen'd
  * native expression (GraftFunctions.cosineSim).
  */
object Similarity {

  /** Exact top-k: (query_id, neighbor_id, cos, rank). `queries` must be
    * small enough to broadcast (it is explicitly hinted).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("nid"),
      col(vecCol).cast("array<double>").as("nvec"))
    val q = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qvec"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        graft.functions.Det.r6(GraftFunctions.cosineSim(col("qvec"), col("nvec"))).as("cos"))
    // Rank on the rounded score with id tie-break → deterministic top-k.
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH: signatures come from ONE native expression
    * (`GraftFunctions.lshSigs` — a codegen'd kernel that derives its
    * hyperplane matrix deterministically from the seed and the observed
    * vector dimension). No driver action anywhere in the plan, no
    * per-dimension expression unrolling: the plan is
    * map(sigs) → posexplode → bucket-join → exact cosine on candidates,
    * identical at dim=8 and dim=768.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nBits: Int = 8,
              nTables: Int = 8, seed: Long = 42L): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)

    def withSigs(df: DataFrame, id: String, out: String) = {
      val v = col(vecCol).cast("array<double>")
      df.select(col(idCol).as(id), v.as(out),
        posexplode(GraftFunctions.lshSigs(v, nBits, nTables, seed)))
        .withColumnRenamed("pos", "table").withColumnRenamed("col", "sig")
    }

    val cBuckets = withSigs(corpus, "nid", "nvec")
    val qBuckets = withSigs(queries, "qid", "qvec")
    val cand = cBuckets.join(broadcast(qBuckets),
        Seq("table", "sig")).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("qvec"), col("nvec"))
      .dropDuplicates("qid", "nid")
    cand
      .select(col("qid"), col("nid"),
        graft.functions.Det.r6(GraftFunctions.cosineSim(col("qvec"), col("nvec"))).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN — the second scale path besides LSH:
    *  1. coarse quantizer = `nlist` centroids picked deterministically
    *     (smallest xxhash64(id, seed) — a seeded sample of the corpus
    *     itself, no training iteration);
    *  2. every corpus vector is assigned to its nearest centroid with
    *     one broadcast pass (`max_by` over the centroid cross product) —
    *     building the inverted lists;
    *  3. each query probes its `nprobe` nearest centroids and ranks
    *     exact cosine ONLY within those lists.
    * Per-query work drops from N to ~(nprobe/nlist)·N; the lists shuffle
    * by centroid id, so the candidate join is a bounded bucket join.
    * Fully declarative — centroid selection is a limit-subplan reused
    * via broadcast, no driver action.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              seed: Long = 42L): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("nid"),
      col(vecCol).cast("array<double>").as("nvec"))
    val cents = c.orderBy(xxhash64(col("nid"), lit(seed)), col("nid"))
      .limit(nlist)
      .select(col("nid").as("cid"), col("nvec").as("cvec"))
    // inverted lists: nearest centroid per corpus vector
    val assigned = c.crossJoin(broadcast(cents))
      .groupBy("nid")
      .agg(max_by(col("cid"),
          struct(GraftFunctions.cosineSim(col("nvec"), col("cvec")),
            col("cid").cast("long") * -1)).as("cid"),
        first(col("nvec")).as("nvec"))
    val q = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qvec"))
    // probe lists: nprobe nearest centroids per query
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid").orderBy(
          GraftFunctions.cosineSim(col("qvec"), col("cvec")).desc, col("cid"))))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col("qvec"), col("cid"))
    probes.join(assigned, Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        graft.functions.Det.r6(GraftFunctions.cosineSim(col("qvec"), col("nvec"))).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (ida < idb, cos ≥ threshold)
    * over a self-comparison — brute-force within the given frame; use an
    * id-hash subset or LSH blocking for the full-corpus variant at scale.
    */
  def cosineNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    GraftFunctions.ensureRegistered(vecs.sparkSession)
    val a = vecs.select(col(idCol).as("ida"),
      col(vecCol).cast("array<double>").as("va"))
    val b = vecs.select(col(idCol).as("idb"),
      col(vecCol).cast("array<double>").as("vb"))
    a.join(b, col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        graft.functions.Det.r6(GraftFunctions.cosineSim(col("va"), col("vb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
