package newspipe

import newspipe.functions.DoubleDot
import org.apache.spark.sql.{NewspipeSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers newspipe's native Catalyst
  * expressions as SQL functions, so `spark.sql` users get the same codegen'd
  * kernels the DataFrame API uses.
  *
  * Deployment: `spark.sql.extensions=newspipe.NewspipeExtensions` (applied at
  * session build). For an already-running session (tests, notebooks) use
  * [[NewspipeExtensions.register]].
  */
class NewspipeExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    NewspipeExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object NewspipeExtensions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      new FunctionIdentifier("double_dot"),
      new ExpressionInfo(classOf[DoubleDot].getName, "double_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "double_dot(a, b) takes exactly 2 arguments")
        DoubleDot(children.head, children(1))
      }))

  /** Register on a live session (the extensions hook only applies at session
    * creation).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      NewspipeSqlBridge.registerFunction(spark, ident, info, builder)
    }
}
