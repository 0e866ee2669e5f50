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
    */
  def hotKeys(df: DataFrame, key: Column, threshold: Double): DataFrame = {
    val total = df.count()
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= lit(total * threshold))
      .orderBy(col("n").desc, col("key"))
  }
}
