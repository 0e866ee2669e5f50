package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The deterministic doc/vector → shard router shared by the streaming
  * refresh loop ([[graft.streaming.RefreshLoop.shardOf]] delegates
  * here), the sharded serving entry points' callers, and the
  * [[Retrieval.splitShard]]/[[LangModel.splitShard]]/
  * [[Similarity.splitShard]]/[[ProductQuant.splitShard]] reshard path.
  *
  * `shardOf(id, S) = pmod(xxhash64(id), S)`. The family's ONE
  * operational property beyond determinism: it is HIERARCHICAL under
  * doubling — `h mod 2S ∈ {i, i+S}` exactly when `h mod S = i`, so
  * growing a family S → 2S splits every shard LOCALLY into two
  * children (child i keeps `shardOf(id, 2S) = i`, child i+S the rest)
  * with zero cross-shard movement: the reshard cost is O(shard being
  * split), other shards' bytes never move, and splitting all S shards
  * yields exactly the canonical 2S-shard family the router addresses
  * directly. That is what makes a 10⁸ → 10⁹ deployment's migration an
  * incremental per-shard operation instead of a rebuild-everything.
  *
  * Reference lineage: the hash-partitioner contract
  * (`hadoop-mapreduce-client-core:org/apache/hadoop/mapreduce/lib/
  * partition/HashPartitioner.java:36-40` — placement by key hash mod
  * partitions), extended with the doubling property the reference's
  * fixed partition count never needed.
  */
object Sharding {

  /** A row's serving shard in an S-shard family. */
  def shardOf(id: Column, nShards: Int): Column =
    pmod(xxhash64(id), lit(nShards))

  /** The split predicate for growing shard `shardIndex` of an
    * `nShards`-family into its FIRST child (the second child is the
    * negation): true iff the row stays at index `shardIndex` in the
    * doubled 2·nShards family. Rows of shard i can only land at i or
    * i + nShards under doubling (see the object doc), so the two
    * children partition the parent exactly.
    */
  private[operators] def staysInFirstChild(id: Column, shardIndex: Int,
                                           nShards: Int): Column =
    shardOf(id, 2 * nShards) === shardIndex
}
