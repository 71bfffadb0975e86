package newspipe.functions

import org.apache.spark.sql.{Column, NewspipeSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native array math for the similarity hot path.
  *
  * The higher-order-function route (`aggregate(zip_with(a, b, _*_), …)`) is
  * evaluated interpreted, one boxed lambda call per element — at ~n²/2 pairs
  * × vector dim that dominates every all-pairs/top-k scoring stage. This
  * Catalyst expression (SURVEY.md §4's "custom Expression with doGenCode"
  * escalation path, reserved for exactly this case) reads ArrayData
  * primitives in a tight loop and participates in whole-stage codegen.
  *
  * Null handling: null array → null (standard BinaryExpression null
  * propagation). Null ELEMENTS are not expected (embedding vectors are
  * dense); they read as 0.0 via ArrayData's primitive accessor.
  */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
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

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDot =
    copy(left = newLeft, right = newRight)
}

object ArrayMath {
  /** Codegen'd dot product of two numeric-array columns (cast to
    * array<double>; identity casts are erased by SimplifyCasts).
    */
  def dot(a: Column, b: Column): Column =
    NewspipeSqlBridge.column(DoubleDot(
      NewspipeSqlBridge.expression(a.cast("array<double>")),
      NewspipeSqlBridge.expression(b.cast("array<double>"))))
}
