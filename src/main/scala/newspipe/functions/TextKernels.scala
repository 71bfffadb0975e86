package newspipe.functions

import org.apache.spark.sql.{Column, NewspipeSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static tokenize kernel — one call replaces the
  * `filter(split(lower(text), "[^a-z0-9']+"), length(_) > 0)` higher-order
  * chain that fed every shingle/signature pipeline. The HOF form cannot
  * participate in whole-stage codegen (lambda expressions are
  * interpreted-only), and worse: `InferFiltersFromGenerate` clones the whole
  * chain into a pre-Generate filter, so an `explode(shingles(tokens(text)))`
  * plan re-ran split+filter+transform up to 4× per row in interpreted
  * projections — measured 12 s for a 5 000-doc explode at sf0.1 that this
  * kernel does in ~0.5 s. Semantics are BIT-IDENTICAL to the HOF form
  * (parity property-pinned in TextKernelsSpec): `UTF8String.toLowerCase`
  * (what `lower()` calls), Java regex split with limit −1 (what `split()`
  * calls), drop empty strings.
  */
object TokenizeKernel {
  private val sep = java.util.regex.Pattern.compile("[^a-z0-9']+")

  def tokenize(text: UTF8String): ArrayData = {
    val parts = sep.split(text.toLowerCase.toString, -1)
    val out = new java.util.ArrayList[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) out.add(UTF8String.fromString(parts(i)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Static shingle kernel — distinct word n-grams of a token array in one
  * pass, replacing `array_distinct(transform(sequence(1, greatest(size-n+1,
  * 1)), i => array_join(slice(toks, i, n), " ")))`. Mirrors that form
  * exactly: max(len−n+1, 1) windows (a doc shorter than n words yields its
  * whole token string as one shingle; an empty array yields [""]), slices
  * truncate at the end, null elements are skipped by the join, and distinct
  * keeps first-occurrence order (array_distinct's contract).
  */
object ShinglesKernel {
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val count = math.max(len - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder()
      var wrote = false
      var j = i
      val end = math.min(i + n, len)
      while (j < end) {
        if (!toks.isNullAt(j)) {
          if (wrote) sb.append(' ')
          sb.append(toks.getUTF8String(j).toString)
          wrote = true
        }
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }
}

/** Lowercased word tokens of a string as a native expression (codegen'd
  * static kernel call; null text → null array, the HOF chain's null
  * propagation).
  */
case class TokenizeWords(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize_words"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenizeKernel.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = newspipe.functions.TokenizeKernel.tokenize($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenizeWords =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of a token array as a native expression
  * (codegen'd static kernel call). NOT null-propagating: a null token
  * array yields the singleton `[null]` — the exact value the HOF chain
  * produced (`size(null)` → null, `greatest(null−2, 1)` → 1, one window,
  * `array_join(slice(null))` → null), which [[MinHashKernel]]'s
  * skip-null-elements contract turns into the all-MaxValue "zero"
  * signature. Null-text docs therefore still band into LSH buckets instead
  * of silently dropping out of every dedup pipeline — load-bearing,
  * parity-pinned behavior.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n >= 1, s"n must be >= 1, got $n")
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WordShingles.NullSingleton()
    else ShinglesKernel.shingles(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val tpe = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(code = code"""
      ${c.code}
      $tpe ${ev.value} = ${c.isNull}
        ? newspipe.functions.WordShingles.NullSingleton()
        : newspipe.functions.ShinglesKernel.shingles(${c.value}, $n);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** The HOF chain's value for a null token array: `[null]`. */
  def NullSingleton(): ArrayData =
    new GenericArrayData(Array[AnyRef](null))
}

/** Static winnowing kernel (Schleimer, Wilkerson, Aiken — the MOSS local
  * fingerprinting algorithm): positional k-grams of the token stream, each
  * hashed to 60 bits of its md5 — hex digits 2-16, the engine-replayable
  * `('0x' || substr(md5(gram), 2, 15))::UBIGINT` in ANSI SQL (60 bits
  * rather than 64 so the value is always positive and signed-BIGINT-safe
  * on every engine) — then the MINIMUM hash of every w-wide sliding window
  * is selected. The result is the doc's sorted distinct selected values.
  * At 60 bits, birthday collisions across distinct grams reach ~50% only
  * around 2^30 ≈ 10^9 distinct grams — corpus scale — where a 32-bit
  * prefix (an earlier revision) collided routinely past ~10^5 grams,
  * inflating shared-fingerprint counts between unrelated docs.
  *
  * Guarantee (the reason winnowing beats "every i-th gram" sampling): any
  * shared substring of at least w+k−1 tokens forces BOTH docs to select a
  * common fingerprint, while the expected density is only 2/(w+1) of the
  * gram stream. Docs shorter than k tokens contribute their whole token
  * string as one gram; fewer than w hashes form one window — the same
  * short-doc fallback as [[ShinglesKernel]].
  */
object WinnowKernel {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def fingerprints(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val m = toks.numElements()
    val nGrams = math.max(m - (k - 1), 1)
    val h = new Array[Long](nGrams)
    val md = md5.get()
    var i = 0
    while (i < nGrams) {
      val sb = new java.lang.StringBuilder()
      var wrote = false
      var j = i
      val end = math.min(i + k, m)
      while (j < end) {
        if (!toks.isNullAt(j)) {
          if (wrote) sb.append(' ')
          sb.append(toks.getUTF8String(j).toString)
          wrote = true
        }
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      // hex digits 2-16 of the md5: low nibble of byte 0, then bytes 1-7
      h(i) = ((d(0) & 0x0fL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      i += 1
    }
    val nWin = math.max(h.length - (w - 1), 1)
    val sel = new java.util.TreeSet[java.lang.Long]()
    var s = 0
    while (s < nWin) {
      var mn = Long.MaxValue
      var x = s
      val e = math.min(s + w, h.length)
      while (x < e) { if (h(x) < mn) mn = h(x); x += 1 }
      sel.add(mn)
      s += 1
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

/** Winnowing fingerprint set of a token array as a native expression
  * (codegen'd static kernel call; null token array → null — a null-text doc
  * has no fingerprints and drops out of the explode, unlike the shingle
  * path whose null contract feeds MinHash banding).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Serializable {
  require(k >= 1, s"k must be >= 1, got $k")
  require(w >= 1, s"w must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.fingerprints(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = newspipe.functions.WinnowKernel.fingerprints($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object TextKernels {
  /** Codegen'd tokenizer column (see [[TokenizeKernel]]). */
  def tokens(text: Column): Column =
    NewspipeSqlBridge.column(TokenizeWords(NewspipeSqlBridge.expression(text)))

  /** Codegen'd distinct n-gram shingle column (see [[ShinglesKernel]]). */
  def shingles(toks: Column, n: Int = 3): Column =
    NewspipeSqlBridge.column(WordShingles(NewspipeSqlBridge.expression(toks), n))

  /** Codegen'd winnowing fingerprint column (see [[WinnowKernel]]). */
  def winnow(toks: Column, k: Int = 4, w: Int = 4): Column =
    NewspipeSqlBridge.column(WinnowFingerprints(
      NewspipeSqlBridge.expression(toks), k, w))
}
