package newspipe.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, NewspipeSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a BROADCAST Bloom filter as a native expression
  * — the codegen'd replacement for the `udf(d => bc.value.mightContainString
  * (d))` probe in [[newspipe.ops.Dedup.bloomScrub]]. The sketch rides the
  * expression as a codegen reference object (the
  * [[newspipe.functions.Rhp]] plane-matrix pattern), so each executor
  * deserializes the broadcast once and the probe is one virtual call inside
  * whole-stage codegen — no ScalaUDF node, no encoder round-trip, and the
  * scan-side placement (below the exchange, PlanSpec-pinned) is unchanged.
  *
  * Spark's own `bloom_filter_agg`/`might_contain` pair was the alternative;
  * it probes xxhash64 LONGS and carries the sketch as a plan literal or
  * scalar subquery — per-task serialization of a filter that can reach GBs,
  * where a broadcast ships it once per executor. Same `putString`/
  * `mightContainString` hash family as the fold, so the sketch bytes and
  * the q62 answer are bit-identical to the UDF form.
  *
  * Null text → null digest → null probe (null-propagating), which the
  * enclosing filter drops — the UDF's `d != null && …` false had the same
  * effect.
  */
case class BloomMightContain(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    bf.value.mightContainString(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bf,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
        $bcRef.value()).mightContainString($c.toString());
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def probe(c: Column, bf: Broadcast[BloomFilter]): Column =
    NewspipeSqlBridge.column(
      BloomMightContain(NewspipeSqlBridge.expression(c), bf))
}

/** Count-Min estimate-at-least probe against a broadcast sketch — the native
  * form of [[newspipe.ops.Boilerplate.frequentNgramsSketch]]'s plausibility
  * filter, same broadcast-reference-object shape as [[BloomMightContain]].
  * Null gram → null (dropped by the enclosing filter, as the UDF's false).
  */
case class CmsAtLeast(child: Expression,
    cms: Broadcast[org.apache.spark.util.sketch.CountMinSketch], minCount: Long)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "cms_at_least"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    cms.value.estimateCount(input.asInstanceOf[UTF8String].toString) >= minCount

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("cmsBc", cms,
      classOf[Broadcast[org.apache.spark.util.sketch.CountMinSketch]].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = ((org.apache.spark.util.sketch.CountMinSketch)
        $bcRef.value()).estimateCount($c.toString()) >= ${minCount}L;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): CmsAtLeast =
    copy(child = newChild)
}

object CmsAtLeast {
  def probe(c: Column,
      cms: Broadcast[org.apache.spark.util.sketch.CountMinSketch],
      minCount: Long): Column =
    NewspipeSqlBridge.column(
      CmsAtLeast(NewspipeSqlBridge.expression(c), cms, minCount))
}
