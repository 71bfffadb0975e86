package newspipe.ops

import org.apache.spark.sql.{Column, DataFrame, NewspipeSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (Jégou et al., PAMI'11 — the compression half of
  * FAISS's IVF-PQ) for embedding columns: split a `dim`-float vector into
  * `m` subvectors, k-means each subspace to `k ≤ 256` centroids, and store
  * the vector as `m` BYTES of centroid ids — 32× smaller than 64 float32s.
  * Top-k search runs over the codes with ASYMMETRIC DISTANCE (ADC): the
  * query stays un-quantized, one `m×k` lookup table of subspace dot
  * products is built per query, and each corpus row costs `m` table
  * lookups instead of `dim` multiplies.
  *
  * Why this matters at 100 TB: a billion 64-dim float32 embeddings are
  * 256 GB — too big to broadcast, expensive to even scan; their PQ codes
  * are 8 GB, small enough that the scan side of a brute-force search
  * becomes memory-bandwidth-trivial and an executor can hold entire
  * partitions in cache. The scan stays embarrassingly parallel (no
  * shuffle: codes crossJoin a broadcast query side, exactly
  * [[Similarity.bruteForceTopK]]'s shape), and composes with the IVF
  * route for sublinear candidate selection.
  *
  * Training is a bounded driver-side sample (`sampleSize` rows via
  * `limit` — deterministic for a stable input order) running `m`
  * independent Lloyd loops, the same bounded-sample contract as
  * [[Similarity.ivfTopK]]'s default trainer and standard practice for PQ
  * (FAISS trains on samples of this size); the per-row encode/LUT/ADC hot
  * loops are native codegen'd expressions.
  */
object Pq {

  /** Trained codebooks: `m` subspaces × `k` centroids × `dsub` floats,
    * flattened row-major (`[i][j][d]` at `(i*k + j)*dsub + d`) so the
    * kernels index without nested arrays.
    */
  final case class Codebooks(m: Int, k: Int, dsub: Int, flat: Array[Float]) {
    require(flat.length == m * k * dsub, "codebook shape mismatch")
    def dim: Int = m * dsub
  }

  /** Train per-subspace codebooks on a bounded sample of `df`'s `vecCol`
    * (array<float> of length `dim`). `dim` must divide by `m`; `k ≤ 256`
    * so a code fits one byte. Deterministic for a fixed seed and stable
    * input order.
    */
  def train(df: DataFrame, vecCol: String, dim: Int, m: Int = 8,
      k: Int = 256, iters: Int = 10, sampleSize: Int = 16384,
      seed: Long = 42L): Codebooks = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(k >= 1 && k <= 256, s"k=$k must fit one byte (<= 256)")
    val dsub = dim / m
    val sample = df.select(col(vecCol)).na.drop().limit(sampleSize)
      .collect()
      .map(_.getSeq[Float](0).toArray)
      .filter(_.length == dim)
    require(sample.nonEmpty, s"no training vectors of length $dim in $vecCol")
    val flat = new Array[Float](m * k * dsub)
    var i = 0
    while (i < m) {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, i * dsub,
        (i + 1) * dsub))
      val cents = lloyd(sub, k, iters, seed + i)
      var j = 0
      while (j < k) {
        System.arraycopy(cents(j), 0, flat, (i * k + j) * dsub, dsub)
        j += 1
      }
      i += 1
    }
    Codebooks(m, k, dsub, flat)
  }

  /** Standard (L2) Lloyd over one subspace's sample. Seeded shuffle init;
    * an emptied cluster keeps its previous centroid; fewer distinct points
    * than `k` cycles the init (duplicate centroids are harmless — encode
    * tie-breaks to the lowest id).
    */
  private def lloyd(points: Array[Array[Float]], k: Int, iters: Int,
      seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val dsub = points.head.length
    val init = rnd.shuffle(points.toVector).take(k)
    var cents = Array.tabulate(k)(j => init(j % init.size).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dsub))
      val counts = new Array[Int](k)
      points.foreach { p =>
        val c = PqKernel.nearestCentroidOf(cents, p)
        counts(c) += 1
        var t = 0
        while (t < dsub) { sums(c)(t) += p(t); t += 1 }
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(dsub)(t => (sums(c)(t) / counts(c)).toFloat)
      }.toArray
    }
    cents
  }

  /** `vec` (array<float>) → `m`-byte PQ code (binary). */
  def encode(vec: Column, cb: Codebooks): Column =
    NewspipeSqlBridge.column(PqEncodeExpr(
      NewspipeSqlBridge.expression(vec), cb))

  /** Per-query ADC lookup table: array<float> of `m*k` subspace dot
    * products — `lut[i*k + j] = dot(query_sub_i, centroid_ij)`.
    */
  def lut(vec: Column, cb: Codebooks): Column =
    NewspipeSqlBridge.column(PqLutExpr(
      NewspipeSqlBridge.expression(vec), cb))

  /** ADC inner product of a query's LUT and a corpus row's code: `m` table
    * lookups, approximating `dot(query, corpus_vector)`.
    */
  def adcDot(lutCol: Column, codeCol: Column, cb: Codebooks): Column =
    NewspipeSqlBridge.column(PqAdcDotExpr(
      NewspipeSqlBridge.expression(lutCol),
      NewspipeSqlBridge.expression(codeCol), cb.k))

  /** `df` + a `codeCol` byte-code column for `vecCol`. */
  def encodeCorpus(df: DataFrame, vecCol: String, cb: Codebooks,
      codeCol: String = "pq_code"): DataFrame =
    df.withColumn(codeCol, encode(col(vecCol), cb))

  /** Brute-force ADC top-k over an ENCODED corpus: queries (small side)
    * broadcast with their LUTs precomputed once, corpus codes scanned
    * without shuffle, per-query window top-k — [[Similarity
    * .bruteForceTopK]]'s exact plan shape with the float scan replaced by
    * `m` byte-indexed lookups per row.
    */
  /** IVF-PQ — the full FAISS composition: spherical-k-means cells bound
    * the candidate set (each query probes its `nprobe` nearest cells), PQ
    * codes + ADC rank within them. The corpus side of the cell join
    * carries (id, cell, `m` bytes) — VECTORS NEVER CROSS THE JOIN, which
    * at 10⁹ rows is the difference between shuffling 8 GB and 256 GB.
    * Training reuses [[Similarity.sphericalKMeans]]'s bounded-sample
    * contract; the re-rank is ADC (approximate), so recall depends on both
    * nprobe and codebook quality — planted byte-identical twins are exact
    * by construction (PqSpec, q84).
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, cb: Codebooks, k: Int = 10, nlist: Int = 16,
      nprobe: Int = 4, seed: Long = 42L, sampleSize: Int = 4096,
      iters: Int = 8): DataFrame = {
    val sample = corpus.select(col(vecCol)).rdd
      .takeSample(withReplacement = false, sampleSize, seed)
      .map(r => if (r.isNullAt(0)) null
        else Similarity.unitVec(r.getSeq[Any](0).map(Similarity.toDouble).toArray))
      .filter(_ != null)
    val centroids = Similarity.sphericalKMeans(sample, nlist, iters, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      encode(col(vecCol), cb).as("__code"),
      coalesce(element_at(IvfCells.nearestCells(col(vecCol), centroids, 1), 1),
        lit(-1)).as("__cell"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      lut(col(vecCol), cb).as("__lut"),
      explode(IvfCells.nearestCells(col(vecCol), centroids, nprobe))
        .as("__cell")))
    val scored = c.join(q, Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_dot", adcDot(col("__lut"), col("__code"), cb))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("adc_dot"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adc_dot", "rank")
  }

  def adcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, codeCol: String, cb: Codebooks,
      k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      lut(col(vecCol), cb).as("__lut")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(codeCol).as("__code"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_dot", adcDot(col("__lut"), col("__code"), cb))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("adc_dot"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adc_dot", "rank")
  }
}

/** Static hot-loop kernels shared by interpreted eval and generated code. */
object PqKernel {

  private[ops] def nearestCentroidOf(cents: Array[Array[Float]],
      p: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      var d = 0.0
      var t = 0
      while (t < p.length) {
        val diff = p(t) - cents(j)(t); d += diff * diff; t += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /** Encode: per subspace, the L2-nearest centroid id (ties → lowest id). */
  def encode(cb: Array[Float], m: Int, k: Int, dsub: Int,
      v: ArrayData): Array[Byte] = {
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        val base = (i * k + j) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = v.getFloat(i * dsub + t) - cb(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(i) = best.toByte
      i += 1
    }
    out
  }

  /** Query LUT: subspace dot products against every centroid. */
  def lut(cb: Array[Float], m: Int, k: Int, dsub: Int,
      q: ArrayData): ArrayData = {
    val out = new Array[Float](m * k)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < k) {
        val base = (i * k + j) * dsub
        var s = 0f
        var t = 0
        while (t < dsub) { s += q.getFloat(i * dsub + t) * cb(base + t); t += 1 }
        out(i * k + j) = s
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** ADC: m byte-indexed lookups. */
  def adcDot(lut: ArrayData, k: Int, code: Array[Byte]): Float = {
    var s = 0f
    var i = 0
    while (i < code.length) { s += lut.getFloat(i * k + (code(i) & 0xFF)); i += 1 }
    s
  }
}

/** array<float> vector → `m`-byte PQ code; codebooks ship as one codegen
  * reference object. Null vector → null code.
  */
case class PqEncodeExpr(child: Expression, cb: Pq.Codebooks)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PqKernel.encode(cb.flat, cb.m, cb.k, cb.dsub, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", cb.flat, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = newspipe.ops.PqKernel.encode($ref, ${cb.m}, ${cb.k}, " +
        s"${cb.dsub}, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** array<float> query vector → `m*k` ADC lookup table (array<float>). */
case class PqLutExpr(child: Expression, cb: Pq.Codebooks)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PqKernel.lut(cb.flat, cb.m, cb.k, cb.dsub, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", cb.flat, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"newspipe.ops.PqKernel.lut($ref, ${cb.m}, ${cb.k}, ${cb.dsub}, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** ADC inner product: LUT (array<float>, left) × code (binary, right). */
case class PqAdcDotExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = FloatType
  override def prettyName: String = "pq_adc_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, binary), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(lut: Any, code: Any): Any =
    PqKernel.adcDot(lut.asInstanceOf[ArrayData], k,
      code.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, c) =>
      s"${ev.value} = newspipe.ops.PqKernel.adcDot($l, $k, $c);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcDotExpr =
    copy(left = newLeft, right = newRight)
}
