package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines:
  * exact, n-gram Jaccard, MinHash+LSH, SimHash. All shuffle only on
  * compact keys (digests / band hashes), never on document text, so they
  * scale to 100 TB: the candidate-pair space is bounded by bucket
  * collisions, not n².
  */
object Dedup {

  /** Exact dedup: group by content digest, keep the smallest id.
    * One shuffle on a 16-byte key; partial aggregation combines map-side.
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Word k-shingles as a distinct array column (basis for Jaccard /
    * MinHash) — the native `word_shingles` kernel (one pass, one hash
    * set; the slice/concat/array_distinct composition measured 4× the
    * cost of the whole tokenize stage). Requires
    * `GraftFunctions.ensureRegistered` on the session (all Dedup
    * entry points call it).
    */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.GraftFunctions.wordShingles(TextOps.tokens(text), k)

  /** Exact n-gram Jaccard near-dup pairs (a < b, jaccard ≥ threshold).
    * Inverted-index join: explode shingles → self-join per shingle →
    * count intersections → Jaccard from set sizes. The per-shingle join
    * means only documents sharing ≥1 shingle ever meet — no n² pair
    * enumeration. Hot shingles are the skew risk at scale; cap their
    * fan-out with `maxShingleFreq` (drop shingles more frequent than the
    * cap — standard stopword-shingle suppression). Measured behavior:
    * the cap turns a DENSE shingle space (every shingle hot) into a
    * cheap no-op instead of a quadratic join — cost peaks when typical
    * frequencies sit near the cap, and the cap bounds it there.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        k: Int = 3, threshold: Double = 0.8,
                        maxShingleFreq: Int = 1000): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val sh = docs
      .select(col(idCol).as("id"), explode(shingles(col(textCol), k)).as("sh"))
    // Materialize ONE sh-partitioned exchange of the shingle table. The
    // tokenize→shingle→explode pipeline runs exactly once; every
    // consumer below reuses the exchange (ReusedExchange), and hash(sh)
    // is exactly the co-partitioning the inverted-index join wants at
    // scale.
    val shP = sh.repartition(col("sh"))
    // Hot-shingle suppression (skew guard): per-shingle frequency is a
    // partition-local aggregate on the already-sh-partitioned exchange
    // (no new shuffle), and the keep-set semi-join is co-partitioned —
    // the cap costs one extra pass over the partitioned data, not a
    // Window shuffle+sort.
    val capped =
      if (maxShingleFreq == Int.MaxValue) shP
      else {
        val keep = shP.groupBy("sh").agg(count(lit(1)).as("freq"))
          .filter(col("freq") <= maxShingleFreq).select("sh")
        shP.join(keep, Seq("sh"), "left_semi")
      }
    // Set sizes from the CAPPED table: suppressed shingles are excluded
    // from both the intersection and the denominator, i.e. Jaccard over
    // the post-cap shingle universe (the documented cap semantics).
    val sizes = capped.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = capped.as("a").join(capped.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("ida"), col("b.id").as("idb"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("id", "ida").withColumnRenamed("n", "na"), "ida")
      .join(sizes.withColumnRenamed("id", "idb").withColumnRenamed("n", "nb"), "idb")
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"), col("jaccard"))
  }

  /** MinHash signatures: one 64-bit base hash per shingle, then
    * `numHashes` universal-hash permutations folded in a single pass by
    * the native `minhash_sigs` kernel (the compositional
    * `transform(sequence, j => array_min(transform(shingles, xxhash64)))`
    * re-hashes every shingle string once per signature row). Map-only.
    * Requires `GraftFunctions.ensureRegistered`.
    */
  def minhashSignature(text: Column, k: Int = 3, numHashes: Int = 64,
                       seed: Long = 42L): Column =
    graft.functions.GraftFunctions.minhashSigs(
      transform(shingles(text, k), s => xxhash64(s)), numHashes, seed)

  /** MinHash + LSH banding: signatures split into `bands` bands of
    * `rowsPerBand`; documents sharing any band hash become candidates;
    * candidates are verified by full-signature agreement (estimated
    * Jaccard). Shuffles only (bandId, bandHash, id) triples.
    *
    * Returns (ida, idb, est_jaccard) with ida < idb, est ≥ threshold.
    */
  def minhashLshPairs(docs: DataFrame, textCol: String, idCol: String,
                      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val rowsPer = numHashes / bands
    // id-partitioned exchange: the signature computation (shingling + 64
    // hash mins per doc — the expensive map) runs once, and all three
    // consumers (banding, the two post-candidate signature joins) reuse
    // it; the id partitioning already matches the re-join keys.
    val sig = docs.select(col(idCol).as("id"),
      minhashSignature(col(textCol), k, numHashes).as("sig"))
      .repartition(col("id"))
    // Band rows carry only (id, band, bandhash) — signatures are re-joined
    // by id AFTER candidate dedup, so the banding shuffle moves 24-byte
    // rows, not 64-long signatures.
    val banded = sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPer + 1, lit(rowsPer))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandhash")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bandhash") === col("b.bandhash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
      .dropDuplicates("ida", "idb")
    cand
      .join(sig.select(col("id").as("ida"), col("sig").as("siga")), "ida")
      .join(sig.select(col("id").as("idb"), col("sig").as("sigb")), "idb")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("siga"), col("sigb"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") /
          lit(numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select(col("ida"), col("idb"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** 64-bit SimHash over tokens: per bit, count of set token-hash bits vs
    * total, sign → bit. Computed by the native one-pass `simhash64`
    * kernel (a column-expression formulation would traverse the hash
    * array 64 times per row). Near-dups = signatures within `maxHamming`.
    * Banding on 4 × 16-bit chunks gives the LSH blocking (pigeonhole: any
    * pair within hamming 3 shares at least one exact 16-bit chunk).
    * NOTE: requires `GraftFunctions.ensureRegistered` on the session.
    */
  def simhash(text: Column): Column =
    graft.functions.GraftFunctions.simhash64(
      transform(TextOps.tokens(text), w => xxhash64(w)))

  /** Scale note (measured): the 4×16-bit chunk space has 65536 buckets
    * per band, so candidate pairs grow quadratically once the corpus
    * approaches ~10⁵-10⁶ docs (birthday collisions) — at that point add
    * a cheap pre-blocking key to the band join (e.g. doc length bucket
    * or `TextOps.shingleFingerprint` prefix) to subdivide buckets; the
    * pigeonhole guarantee is preserved because blocking only needs to
    * hold for near-dups, which share those keys too.
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val sigs = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    // (band, chunk)-partitioned exchange: both sides of the bucket
    // self-join reuse one banding computation
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(0xffffL)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
      .repartition(col("band"), col("chunk"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"),
        graft.functions.GraftFunctions.hamming(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("ida", "idb")
      .filter(col("hamming") <= maxHamming)
  }
}
