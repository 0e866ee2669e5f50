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

  /** Random-hyperplane signatures: `nBits` sign bits per table,
    * `nTables` independent tables. Hyperplanes are deterministic
    * (seeded per (table, bit, dim) via a hash-based pseudo-random value)
    * so signatures are reproducible without shipping a model.
    */
  private def hyperplane(table: Int, bit: Int, dim: Int, seed: Long): Double = {
    var z = seed ^ (table.toLong << 40) ^ (bit.toLong << 20) ^ dim.toLong
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^= (z >>> 33)
    // map to (-1, 1)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int, nBits: Int = 12,
              nTables: Int = 4, seed: Long = 42L): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)

    def sigCol(vec: org.apache.spark.sql.Column, table: Int) = {
      val bits = (0 until nBits).map { b =>
        val dot = (0 until dim).map(d =>
          element_at(vec, d + 1) * lit(hyperplane(table, b, d, seed)))
          .reduce(_ + _)
        when(dot > 0, lit(1L << b)).otherwise(lit(0L))
      }
      bits.reduce[org.apache.spark.sql.Column](_ bitwiseOR _)
    }

    def withSigs(df: DataFrame, id: String, out: String) = {
      val v = col(vecCol).cast("array<double>")
      df.select(col(idCol).as(id), v.as(out),
        posexplode(array((0 until nTables).map(t => sigCol(v, t)): _*)))
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
