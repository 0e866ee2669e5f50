package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sampled-scan filters (reference: hadoop-mapreduce-client-core
  * `mapreduce/lib/input/SequenceFileInputFilter.java:53-164` — Regex,
  * Percent, and MD5 record filters applied at scan time).
  *
  * Expressed as `Column` predicates so Catalyst pushes them to the scan
  * (check `PushedFilters` for the regex/equality cases) instead of
  * filtering post-read.
  */
object SampleFilters {

  /** RegexFilter: keep records whose key matches the pattern. */
  def regexFilter(key: Column, pattern: String): Column = key.rlike(pattern)

  /** PercentFilter analog: keep ~1/f of records deterministically by key
    * hash. Uses Murmur3 (`hash`) — uniform, engine-native, seed-stable.
    */
  def percentFilter(key: Column, f: Int): Column =
    pmod(hash(key), lit(f)) === 0

  /** MD5Filter analog: digest-based deterministic sampling, reproducible
    * across engines (MD5 is engine-independent — also DuckDB-checkable).
    * Keeps keys whose first hex digit of md5 falls below `hexDigits` of 16.
    */
  def md5Filter(key: Column, hexDigits: Int = 1): Column =
    substring(md5(key.cast("string")), 1, 1) < lit(java.lang.Integer.toHexString(hexDigits))

  /** Exact-fraction Bernoulli sample (superset convenience). */
  def sample(key: Column, num: Int, denom: Int): Column =
    pmod(hash(key), lit(denom)) < num
}
