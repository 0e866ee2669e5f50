package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation (reference analogs: `RehashPartitioner` /
  * `BinaryPartitioner` §2.8 — manual re-spreading of hot keys). Spark's
  * AQE splits skewed sort-merge partitions automatically; explicit
  * salting remains the tool when a hot KEY (not just a hot partition)
  * must spread across reducers — e.g. joining a fact table against a
  * dimension where one key is 30% of the fact rows.
  */
object Skew {

  /** Salted equi-join: the skewed (big) side gets a deterministic salt
    * in [0, salt) from a row discriminator column; the small side is
    * replicated `salt` ways. A hot join key then lands on `salt`
    * different reducers instead of one. Result is exactly the plain
    * equi-join (modulo row order).
    *
    * `discriminator` must be a column of the skewed side with per-row
    * variety (a row id, a line number…) so the salt spreads; it is only
    * hashed, never moved.
    */
  def saltedEquiJoin(skewed: DataFrame, small: DataFrame, key: String,
                     salt: Int, discriminator: String): DataFrame = {
    require(salt > 0, "salt must be positive")
    val l = skewed.withColumn("_salt",
      pmod(xxhash64(col(discriminator)), lit(salt.toLong)).cast("int"))
    val r = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Hot-key report: the keys whose row share exceeds `threshold` — the
    * diagnostic that decides between AQE-only and explicit salting.
    *
    * EXACT and therefore two full passes over `df` (a `count()` plus a
    * full groupBy) — a report, not a sampler. On a 100 TB input prefer
    * [[hotKeysSampled]], which reads a fraction once.
    */
  def hotKeys(df: DataFrame, key: Column, threshold: Double): DataFrame = {
    val total = df.count()
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= lit(total * threshold))
      .orderBy(col("n").desc, col("key"))
  }

  /** Sampled hot-key report (the reference InputSampler spirit): ONE
    * scan of a `fraction` Bernoulli sample, key shares estimated from
    * the sampled counts. A key with true share p appears with sampled
    * count ≈ p·fraction·N; `slack` (default 0.5) lowers the cut-off so
    * borderline-hot keys aren't missed by sampling noise — the report
    * errs toward listing a key that is almost hot, never toward salting
    * being skipped for a truly hot one (for thresholds ≥ ~1e-4·fraction
    * the binomial tail below 0.5·mean is negligible). Reported `share`
    * is the sample estimate.
    */
  def hotKeysSampled(df: DataFrame, key: Column, threshold: Double,
                     fraction: Double = 0.01, seed: Long = 42L,
                     slack: Double = 0.5): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    val sampled = df.sample(withReplacement = false, fraction, seed)
      .groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    // one-row total joined broadcast — NOT an empty-partition window,
    // which would drag every sampled key onto a single partition
    val tot = sampled.agg(sum("n").as("tot"))
    sampled.crossJoin(broadcast(tot))
      .withColumn("share", col("n") / col("tot"))
      .filter(col("share") >= threshold * slack)
      .select(col("key"), col("share"))
      .orderBy(col("share").desc, col("key"))
  }
}
