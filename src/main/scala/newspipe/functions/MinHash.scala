package newspipe.functions

import org.apache.spark.sql.{Column, NewspipeSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static MinHash kernel shared by interpreted eval and generated code.
  *
  * Hash function i ∈ [0, numHashes) is the double-hashing family
  * h_i(s) = h1(s) + i·h2(s) (Kirsch–Mitzenmacher) over two XXH64 string
  * hashes — two hashes per shingle instead of numHashes, with the per-seed
  * independence LSH banding needs. h2 is forced odd so the positions have
  * full period mod 2⁶⁴.
  *
  * Operates on Tungsten `ArrayData`/`UTF8String` directly: no
  * UTF8String→String→Seq materialization per row, which is most of what a
  * Scala UDF pays here (the hash itself reads the UTF8String bytes).
  *
  * Null ELEMENTS are skipped (shingling a null token array yields [null]);
  * an all-null or empty shingle array gets the all-MaxValue "zero"
  * signature, matching the UDF this kernel replaced.
  */
object MinHashKernel {
  def signature(arr: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val u = arr.getUTF8String(j)
        val h1 = XXH64.hashUTF8String(u, 0L)
        val h2 = XXH64.hashUTF8String(u, 1L) | 1L
        var h = h1
        var i = 0
        while (i < numHashes) {
          if (h < sig(i)) sig(i) = h
          h += h2
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
}

/** MinHash signature of a shingle array as a native Catalyst expression —
  * the signature pass is the per-row hot loop of the entire dedup family
  * (every doc, every dedup/scrub/merge operator), so it gets the same
  * doGenCode escalation as [[DoubleDot]]: whole-stage codegen emits one
  * static kernel call on the unsafe array, no closure/encoder boundary.
  *
  * Null input array → null (standard unary null propagation).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = newspipe.functions.MinHashKernel.signature($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHash {
  /** Codegen'd MinHash signature column over an array<string> shingle
    * column.
    */
  def signature(shingles: Column, numHashes: Int = 64): Column =
    NewspipeSqlBridge.column(MinHashSignature(
      NewspipeSqlBridge.expression(shingles), numHashes))
}

/** Static SimHash kernel — same contract as [[MinHashKernel]]: shared by
  * interpreted eval and generated code, reads the unsafe array directly.
  * The per-token hash is MurmurHash3 x2 over the JVM String (bit-identical
  * to the Scala-UDF form this replaced — DedupSpec pins specific hamming
  * distances, so the hash values themselves are load-bearing).
  */
object SimHashKernel {
  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val t = arr.getUTF8String(j).toString
        val h = (scala.util.hashing.MurmurHash3.stringHash(t, 0).toLong << 32) |
          (scala.util.hashing.MurmurHash3.stringHash(t, 1).toLong & 0xffffffffL)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }
}

/** 64-bit SimHash of a token array as a native expression. NOT null-
  * propagating: a null or empty token array gets the ZERO signature
  * (null-text docs still band into buckets instead of dropping out — the
  * contract the UDF form established and DedupSpec's null-text cases pin),
  * so `eval`/codegen handle the null child inline rather than via
  * nullSafeEval.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with Serializable {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHashKernel.simhash(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = ${c.isNull} ? 0L :
        newspipe.functions.SimHashKernel.simhash(${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash {
  /** Codegen'd 64-bit SimHash column over an array<string> token column. */
  def simhash64(tokens: Column): Column =
    NewspipeSqlBridge.column(SimHash64(NewspipeSqlBridge.expression(tokens)))
}
