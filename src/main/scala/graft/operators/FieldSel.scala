package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Field-selection mini-language (projection over separator-delimited lines).
  *
  * Capability parity with the reference's field-selection helpers
  * (reference: hadoop-mapreduce-client-core
  * `mapreduce/lib/fieldsel/FieldSelectionHelper.java:30-118`,
  * `FieldSelectionMapper.java`): a spec like `"4,3,0,1:6,5,1-3,7-"` names
  * key fields (before `:`) and value fields (after `:`) of a line split on
  * a separator. Elements are `n` (single 0-based field), `a-b` (closed
  * range, inclusive), and `n-` (open range to end of line).
  *
  * Spark-first design: the spec compiles to `Column` expressions
  * (`split`/`element_at`/`slice`/`concat_ws`), so the whole projection stays
  * inside whole-stage codegen and Catalyst can prune the source scan to the
  * single line column. No UDF, no RDD.
  */
object FieldSel {
  sealed trait Part
  final case class Single(i: Int) extends Part
  final case class Closed(a: Int, b: Int) extends Part
  final case class Open(a: Int) extends Part

  /** Parse one comma-separated field list (no `:`). */
  def parseList(spec: String): Seq[Part] =
    spec.split(",").toSeq.filter(_.nonEmpty).map { el =>
      if (el.endsWith("-") && !el.contains("--")) Open(el.dropRight(1).toInt)
      else if (el.contains("-")) {
        val Array(a, b) = el.split("-", 2); Closed(a.toInt, b.toInt)
      } else Single(el.toInt)
    }

  /** Parse a full `keyList:valueList` spec. A missing `:` means key-only. */
  def parse(spec: String): (Seq[Part], Seq[Part]) = spec.split(":", 2) match {
    case Array(k)    => (parseList(k), Seq.empty)
    case Array(k, v) => (parseList(k), parseList(v))
  }

  /** One selected part as a string Column over `fields` (array of strings).
    * Out-of-range single fields yield "" (reference: absent fields are
    * skipped / empty).
    */
  private def partCol(fields: Column, sep: String, p: Part): Column = p match {
    // try_element_at: out-of-range must yield null→"" (ANSI element_at throws)
    case Single(i)    => coalesce(try_element_at(fields, lit(i + 1)), lit(""))
    case Closed(a, b) => concat_ws(sep, slice(fields, a + 1, math.max(b - a + 1, 0)))
    case Open(a)      => concat_ws(sep, slice(fields, lit(a + 1), greatest(size(fields) - a, lit(0))))
  }

  /** Compile a field list to one joined string Column. */
  def selectCol(line: Column, sep: String, parts: Seq[Part]): Column =
    if (parts.isEmpty) lit("")
    else {
      val fields = split(line, java.util.regex.Pattern.quote(sep))
      concat_ws(sep, parts.map(partCol(fields, sep, _)): _*)
    }

  /** Full spec → (key Column, value Column). */
  def keyValue(line: Column, sep: String, spec: String): (Column, Column) = {
    val (k, v) = parse(spec)
    (selectCol(line, sep, k), selectCol(line, sep, v))
  }
}
