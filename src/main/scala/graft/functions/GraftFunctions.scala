package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expressions (with `doGenCode`) for the hot paths the
  * built-in function library can't express efficiently:
  *
  *  - `hamming_dist(long, long)` — popcount of xor; SimHash near-dup
  *    verification. A Scala UDF here would box both longs per row.
  *  - `cosine_sim(array<double>, array<double>)` — fused dot/norm loop;
  *    the `aggregate`+`zip_with` composition allocates an intermediate
  *    array per row, this is a single pass with no allocation.
  *
  * Both participate in whole-stage codegen (no CodegenFallback), keeping
  * similarity-search scans inside one generated loop.
  */
object GraftFunctions {

  case class HammingDistance(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "hamming_dist"
  }

  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0
      else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = $a.getDouble($i);
           |  double $yi = $b.getDouble($i);
           |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
           |}
           |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
           |  : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "cosine_sim"
  }

  @volatile private var registered: Set[SparkSession] = Set.empty

  /** Register both functions in the session's FunctionRegistry (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!registered.contains(spark)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "hamming_dist", es => HammingDistance(es.head, es(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "cosine_sim", es => CosineSimilarity(es.head, es(1)), "built-in")
      registered += spark
    }

  /** Column wrappers (session must be registered — queries call
    * `ensureRegistered` on entry).
    */
  def hamming(a: Column, b: Column): Column = call_function("hamming_dist", a, b)
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}
