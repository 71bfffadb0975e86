package newspipe.functions

import org.apache.spark.sql.{Column, NewspipeSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static random-hyperplane kernels — the per-row hot loop of every
  * embedding-family operator (LSH top-k, knn graph, cosine near-dup,
  * embedding cross-corpus scrub). Shared by interpreted eval and generated
  * code; read the unsafe array's primitives directly.
  *
  * Accumulation types are load-bearing: the single-signature kernel
  * accumulates in FLOAT and the banded kernel in DOUBLE — bit-identical to
  * the Scala-UDF forms they replaced (a sign flip on a near-zero dot would
  * move a vector to a different bucket; SimilaritySpec's recall pins and
  * the q37/q40/q53/q57 oracles all ride on today's bucket assignments).
  */
object RhpKernel {
  /** bit j = sign(v · plane_j), float accumulation over a float array. */
  def signature(planes: Array[Array[Float]], arr: ArrayData): Long = {
    var sig = 0L
    val m = arr.numElements()
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var dot = 0.0f
      var i = 0
      val n = math.min(p.length, m)
      while (i < n) { dot += p(i) * arr.getFloat(i); i += 1 }
      if (dot >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Per-band signatures in one pass, double accumulation over a double
    * array (the banded UDF bound `Seq[Double]`, widening float inputs —
    * callers cast to array<double>, exact for float values).
    */
  def bandSignatures(planes: Array[Array[Array[Float]]], arr: ArrayData): ArrayData = {
    val out = new Array[Long](planes.length)
    val m = arr.numElements()
    var b = 0
    while (b < planes.length) {
      val ps = planes(b)
      var sig = 0L
      var j = 0
      while (j < ps.length) {
        val p = ps(j)
        var dot = 0.0
        var i = 0
        val n = math.min(p.length, m)
        while (i < n) { dot += p(i) * arr.getDouble(i); i += 1 }
        if (dot >= 0) sig |= (1L << j)
        j += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Single RHP signature as a native expression over array<float>. Null
  * vector → null signature (standard unary propagation, matching the UDF).
  */
case class RhpSignatureExpr(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RhpKernel.signature(planes, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rhpPlanes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = newspipe.functions.RhpKernel.signature($ref, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSignatureExpr =
    copy(child = newChild)
}

/** Banded RHP signatures as a native expression over array<double>. */
case class RhpBandSignaturesExpr(child: Expression,
    planes: Array[Array[Array[Float]]])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhp_band_signatures"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RhpKernel.bandSignatures(planes, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rhpBandPlanes", planes, "float[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = newspipe.functions.RhpKernel.bandSignatures($ref, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RhpBandSignaturesExpr =
    copy(child = newChild)
}

object Rhp {
  /** Codegen'd single-signature column (float vectors). */
  def signature(vec: Column, planes: Array[Array[Float]]): Column =
    NewspipeSqlBridge.column(RhpSignatureExpr(
      NewspipeSqlBridge.expression(vec), planes))

  /** Codegen'd banded-signature column; input cast to array<double>
    * (identity for double columns, exact widening for float — the same
    * up-cast the banded UDF's `Seq[Double]` binding performed).
    */
  def bandSignatures(vec: Column, planes: Array[Array[Array[Float]]]): Column =
    NewspipeSqlBridge.column(RhpBandSignaturesExpr(
      NewspipeSqlBridge.expression(vec.cast("array<double>")), planes))
}
