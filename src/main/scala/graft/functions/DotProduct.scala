package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Σ aᵢ·bᵢ over two `array<double>` columns with full whole-stage
  * codegen — the one place the engine drops below the public function
  * API, and only because Spark's higher-order functions (`aggregate` /
  * `zip_with`) evaluate their lambda per element OUTSIDE generated code,
  * which dominates the embedding hot paths (dedup pair scoring, ANN
  * ranking) where this expression runs millions of times per task.
  *
  * Summation is in index order in double precision — bit-identical to
  * the `aggregate(zip_with(...))` formulation it replaces, so oracle
  * results are unchanged. Shorter-array semantics: the overlap is
  * scored (callers always pass equal-dimension vectors). Array elements
  * must be non-null (embedding vectors by construction).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `SparkSessionExtensions` hook registering `graft_dot` for SQL users:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes
  * `SELECT graft_dot(a, b)` available in any session of the cluster.
  * (The Scala API reaches the expression directly via
  * [[VectorFunctions.dot]] and needs no registration.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      GraftExtensions.dotInfo,
      GraftExtensions.dotBuilder))
}

object GraftExtensions {
  private[functions] val dotInfo =
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")
  private[functions] val dotBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2, "graft_dot takes exactly 2 arguments")
    DotProduct(children.head, children(1))
  }

  /** Register `graft_dot` on an already-running session (for sessions
    * not launched with `spark.sql.extensions`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "graft_dot", dotInfo, dotBuilder)
}
