package newspipe.ops

import org.apache.spark.sql.{Column, DataFrame, NewspipeSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton-curve) clustering — the layout half of data skipping.
  *
  * A layer sorted on ONE column gives [[newspipe.io.FileStats]] pruning
  * tight min/max ranges on that column and useless ones on every other; a
  * Z-ordered layout interleaves the bit patterns of k columns so every
  * file covers a small hyper-rectangle of the k-dim space — predicates on
  * ANY subset of the columns prune (Delta's `OPTIMIZE ZORDER BY`, the
  * classic multidimensional-clustering result).
  *
  * Bucketing is RANK-based, not value-based: each column is mapped to a
  * `2^bits`-bucket index through boundaries taken from a seeded sample's
  * empirical quantiles, so skewed distributions still spread across the
  * full bucket range (equal-WIDTH bucketing would collapse a heavy-tailed
  * column into one bucket and the curve would degenerate to a sort on the
  * remaining columns). Strings rank lexicographically by UTF8 byte order —
  * the same comparator parquet uses for their min/max stats, so the
  * pruning intervals line up with the clustering.
  *
  * Scale shape: one sample-collect on the driver (≤ `sampleSize` scalars),
  * then a single `repartitionByRange` + `sortWithinPartitions` over the
  * z-value — the identical shuffle a plain global sort pays, no extra
  * stage. The z-value itself is one codegen'd expression
  * ([[ZValueExpr]]): per row, k binary searches over ≤255 boundaries and
  * one bit interleave.
  */
object ZOrder {

  /** Per-column rank boundaries: exactly one of the two arrays is set.
    * Sorted ascending; bucket(v) = count of boundaries <= v.
    */
  final case class Bounds(num: Array[Double], str: Array[UTF8String]) {
    def size: Int = if (num != null) num.length else str.length
  }

  /** Compute sampled rank boundaries for `cols` of `df` (seeded — two
    * calls on the same data agree). Numeric/date/timestamp/boolean columns
    * rank through a double cast; strings natively. `bits` ≤ 8 keeps the
    * boundary arrays tiny; k·bits must fit a long (≤ 63).
    */
  def boundariesFor(df: DataFrame, cols: Seq[String], bits: Int = 8,
      sampleSize: Int = 8192, seed: Long = 42L): Seq[Bounds] = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"k*bits must be in [1,63], got ${cols.size} cols * $bits bits")
    // the one-pass sample below is cheap ONLY while Catalyst plans
    // orderBy+limit as TakeOrderedAndProject (per-task top-k, no shuffle);
    // past spark.sql.execution.topKSortFallbackThreshold it silently
    // becomes a full global sort of the layer — the exact cost this
    // sampling path exists to avoid. Refuse loudly instead.
    val topK = df.sparkSession.conf
      .get("spark.sql.execution.topKSortFallbackThreshold", "10000").toLong
    require(sampleSize <= topK,
      s"zorder sampleSize=$sampleSize exceeds " +
        s"spark.sql.execution.topKSortFallbackThreshold=$topK: the boundary " +
        "sample would plan as a full global sort of the layer instead of a " +
        "per-task top-k merge. Lower sampleSize or raise the threshold.")
    val schema = df.schema
    val normalized = cols.map(c => normalizeForRank(col(c), schema(c).dataType, c))
    // ONE pass, no count(): seeded per-row priority + bottom-k. Catalyst
    // plans orderBy+limit as TakeOrderedAndProject — each task keeps its
    // own top-k and the driver merges, so the sample costs a single scan
    // with no shuffle (a count()-then-sample() pays the scan twice, which
    // at compaction scale is a full extra read of the layer).
    val prio = org.apache.spark.sql.functions.rand(seed)
    val sampled = df.select((normalized :+ prio.as("__zorder_prio")): _*)
      .orderBy(col("__zorder_prio"))
      .limit(sampleSize)
      .drop("__zorder_prio")
      .collect()
    val nBuckets = 1 << bits
    cols.indices.map { i =>
      schema(cols(i)).dataType match {
        case StringType =>
          val vs = sampled.flatMap(r => Option(r.getString(i)))
            .map(UTF8String.fromString)
          java.util.Arrays.sort(vs.asInstanceOf[Array[AnyRef]])
          Bounds(null, pickQuantiles(vs.length, nBuckets).map(vs).distinct)
        case _ =>
          val vs = sampled.flatMap(r => if (r.isNullAt(i)) None
            else Some(r.getDouble(i))).sorted
          Bounds(pickQuantiles(vs.length, nBuckets).map(vs).distinct, null)
      }
    }
  }

  /** Indices of `nBuckets - 1` evenly spaced order statistics in a sorted
    * array of length `n`; callers dedup the picked values (a
    * low-cardinality column simply uses fewer effective buckets).
    */
  private def pickQuantiles(n: Int, nBuckets: Int): Array[Int] =
    if (n == 0) Array.empty[Int]
    else (1 until nBuckets)
      .map(q => (((q.toLong * n) / nBuckets).toInt).min(n - 1))
      .toArray

  /** The z-value column for `cols` with precomputed `bounds` (null input
    * ranks as bucket 0, the "sorts first" convention).
    */
  def zvalue(df: DataFrame, cols: Seq[String], bounds: Seq[Bounds],
      bits: Int = 8): Column = {
    val schema = df.schema
    val children = cols
      .map(c => normalizeForRank(col(c), schema(c).dataType, c))
      .map(NewspipeSqlBridge.convertedExpression)
    NewspipeSqlBridge.column(ZValueExpr(children, bounds.toArray, bits))
  }

  /** Rank-comparable form of a column: strings natively (UTF8 byte
    * order), everything else through a double (timestamp_ntz first via a
    * session-zone timestamp — the zone cancels out, both the boundaries
    * and the per-row value go through the same mapping).
    */
  private def normalizeForRank(c: Column, dt: DataType, name: String): Column =
    dt match {
      case StringType => c
      case TimestampNTZType => c.cast(TimestampType).cast(DoubleType)
      case _: NumericType | DateType | TimestampType | BooleanType =>
        c.cast(DoubleType)
      case other => throw new IllegalArgumentException(
        s"zorder column '$name' has unsupported type ${other.simpleString}")
    }

  /** Arrange `df` into `nFiles` Z-ordered output tasks: range-partition on
    * the z-value (optionally AFTER hive partition columns, so clustering
    * happens within each partition), sort within partitions, drop the
    * helper column. One shuffle, file count = `nFiles`.
    */
  def arrange(df: DataFrame, cols: Seq[String], nFiles: Int,
      partitionBy: Seq[String] = Nil, bits: Int = 8,
      sampleSize: Int = 8192, seed: Long = 42L): DataFrame = {
    val bounds = boundariesFor(df, cols, bits, sampleSize, seed)
    val z = zvalue(df, cols, bounds, bits)
    df.withColumn("__zvalue", z)
      .repartitionByRange(nFiles, (partitionBy.map(col) :+ col("__zvalue")): _*)
      .sortWithinPartitions((partitionBy.map(col) :+ col("__zvalue")): _*)
      .drop("__zvalue")
  }
}

/** Morton z-value of k pre-normalized columns (strings as-is, everything
  * else cast to double by the builder): per child a rank-bucket binary
  * search over its boundary array, then bit interleave — bit j of column c
  * lands at position j*k + c, so high-order bits of all dimensions
  * dominate jointly (the Morton property that makes range-partitioning on
  * the value cluster every dimension at once). Null children rank as
  * bucket 0; the output is never null.
  */
case class ZValueExpr(children: Seq[Expression],
    bounds: Array[ZOrder.Bounds], bits: Int) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zvalue"

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.zipWithIndex.collect {
      case (c, i) if c.dataType != StringType && c.dataType != DoubleType =>
        s"child $i: ${c.dataType.simpleString}"
    }
    if (children.size != bounds.length)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: ${children.size} children but ${bounds.length} boundary sets")
    else if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName children must be string or double, got ${bad.mkString(", ")}")
  }

  override def eval(input: InternalRow): Any = {
    val buckets = new Array[Int](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      buckets(i) =
        if (v == null) 0
        else if (bounds(i).num != null)
          ZOrderKernel.bucketD(bounds(i).num, v.asInstanceOf[Double])
        else ZOrderKernel.bucketS(bounds(i).str, v.asInstanceOf[UTF8String])
      i += 1
    }
    ZOrderKernel.interleave(buckets, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val k = children.size
    val arr = ctx.freshName("zbuckets")
    val body = children.zipWithIndex.foldLeft(
      code"int[] $arr = new int[$k];") { case (acc, (child, i)) =>
      val c = child.genCode(ctx)
      val bucket = if (bounds(i).num != null) {
        val ref = ctx.addReferenceObj(s"zboundsD$i", bounds(i).num, "double[]")
        s"newspipe.ops.ZOrderKernel.bucketD($ref, ${c.value})"
      } else {
        val ref = ctx.addReferenceObj(s"zboundsS$i", bounds(i).str,
          "org.apache.spark.unsafe.types.UTF8String[]")
        s"newspipe.ops.ZOrderKernel.bucketS($ref, ${c.value})"
      }
      code"""
        $acc
        ${c.code}
        $arr[$i] = ${c.isNull} ? 0 : $bucket;"""
    }
    ev.copy(code = code"""
      $body
      long ${ev.value} = newspipe.ops.ZOrderKernel.interleave($arr, $bits);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValueExpr =
    copy(children = newChildren)
}

/** Static kernels for [[ZValueExpr]] — called from both interpreted eval
  * and generated code.
  */
object ZOrderKernel {
  /** Count of boundaries <= v (standard upper-bound binary search). */
  def bucketD(bounds: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v < bounds(mid)) hi = mid else lo = mid + 1
    }
    lo
  }

  def bucketS(bounds: Array[UTF8String], v: UTF8String): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v.compareTo(bounds(mid)) < 0) hi = mid else lo = mid + 1
    }
    lo
  }

  /** Morton interleave of k `bits`-wide bucket indices: bit j of column c
    * → output bit j*k + c.
    */
  def interleave(buckets: Array[Int], bits: Int): Long = {
    val k = buckets.length
    var z = 0L
    var j = 0
    while (j < bits) {
      var c = 0
      while (c < k) {
        z |= ((buckets(c) >> j) & 1L) << (j * k + c)
        c += 1
      }
      j += 1
    }
    z
  }
}
