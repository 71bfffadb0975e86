package newspipe.ops

import org.apache.spark.sql.{Column, NewspipeSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static IVF cell-assignment kernel — per-row nlist × dim dot products,
  * the corpus-side hot loop of [[Similarity.ivfTopK]]. Same escalation as
  * the RHP/MinHash kernels: reads the unsafe float array directly, no
  * Seq materialization, and the selection math (max dot, ties by cell id)
  * is identical to the UDF form it replaced.
  */
object IvfKernel {
  def nearestCells(centroids: Array[Array[Double]], arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val nlist = centroids.length
    val scores = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val cent = centroids(c)
      var s = 0.0
      var i = 0
      val len = math.min(cent.length, m)
      while (i < len) { s += cent(i) * arr.getFloat(i); i += 1 }
      scores(c) = s
      c += 1
    }
    // top-n by (-score, cell): selection over the tiny nlist-sized score
    // vector, same ordering as the reference sortBy
    val picked = new Array[Int](math.min(n, nlist))
    val used = new Array[Boolean](nlist)
    var k = 0
    while (k < picked.length) {
      var best = -1
      var c2 = 0
      while (c2 < nlist) {
        if (!used(c2) && (best == -1 || scores(c2) > scores(best))) best = c2
        c2 += 1
      }
      used(best) = true
      picked(k) = best
      k += 1
    }
    new GenericArrayData(picked)
  }
}

/** Top-`n` nearest IVF cells of a float vector as a native expression;
  * centroids ship as a codegen reference object. Null vector → null
  * (call sites layer their own null policy: `coalesce(…[-1])` for the
  * corpus cell, explode-drops-null for query probes — exactly what the
  * two UDFs did).
  */
case class NearestCellsExpr(child: Expression,
    centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_nearest_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    IvfKernel.nearestCells(centroids, input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = newspipe.ops.IvfKernel.nearestCells($ref, $c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

object IvfCells {
  /** Codegen'd top-n-cells column over an array<float> vector column. */
  def nearestCells(vec: Column, centroids: Array[Array[Double]], n: Int): Column =
    NewspipeSqlBridge.column(NearestCellsExpr(
      NewspipeSqlBridge.expression(vec), centroids, n))
}
