package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GNU-sort-style key spec translator (reference:
  * hadoop-mapreduce-client-core `mapreduce/lib/partition/
  * KeyFieldBasedComparator.java:36-60`, `KeyFieldHelper.java`): specs like
  * `-k2,2nr -k1,1` mean "sort by field 2 numerically descending, then
  * field 1 lexicographically" over separator-delimited lines (1-based
  * field numbers).
  *
  * Compiles to `Column` sort expressions so `orderBy`/`sortWithinPartitions`
  * stay declarative (RangePartitioner handles the global order; nothing to
  * hand-partition).
  */
object SortSpec {
  /** One `-k` key. Char offsets (`-k f.c[,f.c]`,
    * `KeyFieldBasedComparator.java:36-60` / `KeyFieldHelper.java`):
    * `fromChar` is the 1-based start character within the first field;
    * `toChar` is the last character within the last field, with 0 = "to
    * the end of the field" (the whole-field default).
    */
  final case class Key(from: Int, to: Int, numeric: Boolean, reverse: Boolean,
                       fromChar: Int = 1, toChar: Int = 0)

  private val KeyRe = """-k(\d+)(?:\.(\d+))?(?:,(\d+)(?:\.(\d+))?)?([nr]*)""".r

  def parse(spec: String): Seq[Key] =
    spec.trim.split("\\s+").toSeq.filter(_.nonEmpty).map {
      case KeyRe(f, fc, t, tc, flags) =>
        val from = f.toInt
        val to = Option(t).map(_.toInt).getOrElse(from)
        Key(from, to, flags.contains("n"), flags.contains("r"),
          fromChar = Option(fc).map(_.toInt).getOrElse(1),
          toChar = Option(tc).map(_.toInt).getOrElse(0))
      case other => throw new IllegalArgumentException(s"bad sort key: $other")
    }

  /** The key slice of field `i` under `k`: char offsets apply to the
    * FIRST field (start at fromChar) and the LAST field (stop at
    * toChar); interior fields contribute whole. 1-based, inclusive,
    * matching KeyFieldHelper's field.char addressing.
    */
  private def fieldSlice(k: Key, i: Int, f: Column): Column = {
    val isFirst = i == k.from
    val isLast = i == k.to
    val start = if (isFirst) k.fromChar else 1
    if (isLast && k.toChar > 0) substring(f, start, math.max(0, k.toChar - start + 1))
    else if (start > 1) substring(f, start, Int.MaxValue)
    else f
  }

  /** Partition columns for `repartition` over a line column split on
    * `sep` — the KeyFieldBasedPartitioner twin
    * (`core:mapreduce/lib/partition/KeyFieldBasedPartitioner.java:36-60`:
    * route on the key fields named by the same `-k` spec, ignoring the
    * n/r ordering flags). Rows sharing the named fields land in the same
    * partition, so a downstream `sortWithinPartitions(sortCols(...))`
    * reproduces the streaming partition+comparator contract.
    */
  def partitionCols(line: Column, sep: String, spec: String): Seq[Column] = {
    val fields = split(line, java.util.regex.Pattern.quote(sep))
    parse(spec).flatMap(k => (k.from to k.to).map(i =>
      fieldSlice(k, i, try_element_at(fields, lit(i)))))
  }

  /** Sort columns for `orderBy` over a line column split on `sep`.
    *
    * ANSI-safe on ragged/non-numeric input: a field index past the end of
    * a short line or a non-numeric field under `n` sorts as null instead
    * of raising (GNU sort treats missing/non-numeric as empty/0), via
    * try_element_at/try_cast. Null placement is pinned explicitly
    * (asc → nulls first, desc → nulls last) so plans and oracles agree.
    */
  def sortCols(line: Column, sep: String, spec: String): Seq[Column] = {
    val fields = split(line, java.util.regex.Pattern.quote(sep))
    parse(spec).flatMap { k =>
      (k.from to k.to).map { i =>
        val f = fieldSlice(k, i, try_element_at(fields, lit(i)))
        val c = if (k.numeric) f.try_cast("double") else f
        if (k.reverse) c.desc_nulls_last else c.asc_nulls_first
      }
    }
  }
}
