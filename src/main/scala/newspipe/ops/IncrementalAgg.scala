package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for sum/count aggregates over a lake
  * change feed — the downstream half of the CDC story: when a 100 TB
  * corpus takes a 1% delete, the maintained per-key aggregate is refreshed
  * from the DELTA ([[newspipe.io.Lake.diff]] / `LakeChangeSource`, cost ∝
  * touched fraction), not recomputed from the corpus.
  *
  * Sum and count are self-maintainable (Gray et al.'s distributive
  * aggregates): an insert adds, a delete subtracts, an update is one of
  * each — so the delta reduces to one signed aggregate over the change
  * rows, joined back to the small maintained table. AVG derives as
  * sum/count downstream; MIN/MAX are NOT maintainable under deletes
  * (a deleted extremum needs a re-scan of its group) and are refused by
  * construction (only sums are expressible here).
  *
  * The maintained table is per-key compact (|keys| rows, not corpus rows),
  * so landing the refreshed state through `writeAtomic` stays cheap even
  * when the corpus is not — incrementality buys the SCAN, not the tiny
  * aggregate rewrite.
  */
object IncrementalAgg {

  val CountCol = "__n"

  /** Full (re)computation — the bootstrap state and the parity anchor the
    * spec compares the incremental path against: per-key row count
    * (`__n`) + one sum per `sumCols` entry (named `sum_<col>`).
    */
  def compute(corpus: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame =
    corpus.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(CountCol),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Apply one change-feed batch (rows tagged `_change_type` — the
    * [[newspipe.io.source.LakeChangeSource]] / [[newspipe.io.Lake.diff]] /
    * [[newspipe.io.Lake.changeFeedKeyed]] shape, all four Delta CDF tags
    * accepted: an `update_postimage` contributes like an insert and its
    * `update_preimage` like a delete, so keyed and unkeyed feeds maintain
    * identical state) to a maintained aggregate. Groups whose count
    * reaches zero are dropped (they no longer exist in the corpus);
    * groups new in the delta appear. One signed aggregate over the delta
    * + one outer join against the maintained table — no corpus access at
    * all.
    */
  def applyDelta(current: DataFrame, delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(delta.columns.contains("_change_type"),
      "delta must carry _change_type (insert|delete|update_pre/postimage)" +
        " — the diff/CDF shape")
    // an unknown tag must FAIL the refresh, not drift it: sum() skips
    // nulls, so a null sign would silently drop the row (and an
    // all-unknown group would read as "no change"). raise_error makes the
    // first unknown tag abort the job with the offending value — zero
    // cost on the valid path, no extra validation scan.
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(raise_error(concat(
        lit("IncrementalAgg: unknown _change_type '"), col("_change_type"),
        lit("' — this consumer maintains sums under the four Delta CDF " +
          "tags (insert|delete|update_preimage|update_postimage) only"))
        ).cast("long"))
    val deltaAgg = delta.withColumn("__sign", sign)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"),
        sumCols.map(c => sum(col(c) * col("__sign")).as(s"__d_$c")): _*)
    val joined = current.join(deltaAgg, keys, "full_outer")
    val merged = joined.select(
      (keys.map(col) :+
        (coalesce(col(CountCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(CountCol)) ++
        sumCols.map(c =>
          (coalesce(col(s"sum_$c"), lit(0L)) + coalesce(col(s"__d_$c"), lit(0L)))
            .as(s"sum_$c")): _*)
    merged.filter(col(CountCol) > 0)
  }

  // ---- incremental APPROX-DISTINCT (HLL sketch columns) --------------------

  /** Bootstrap state for incrementally-maintained per-key approx-distinct:
    * one HLL sketch column per key (datasketches binary form, `lgK`
    * precision) plus the row count. The sketch is the maintainable
    * representation — estimates derive on read via
    * [[distinctEstimates]], and a new batch folds in with one
    * `hll_union_agg` instead of touching the corpus.
    */
  def computeDistinct(corpus: DataFrame, keys: Seq[String],
      distinctCol: String, lgK: Int = 14): DataFrame =
    corpus.groupBy(keys.map(col): _*)
      .agg(expr(s"hll_sketch_agg($distinctCol, $lgK)").as("__sketch"),
        count(lit(1)).as(CountCol))

  /** Fold one INSERT-ONLY change batch into the maintained sketches: the
    * delta's per-key sketches union in (HLL union is lossless), new keys
    * appear. Deletes are REFUSED by construction — an HLL sketch cannot
    * forget (the deleted value's register survives), so a delete-bearing
    * feed must re-bootstrap its groups; silently accepting one would
    * overcount forever. Same loud-refusal principle as MIN/MAX in
    * [[applyDelta]].
    */
  def applyDeltaDistinct(current: DataFrame, delta: DataFrame,
      keys: Seq[String], distinctCol: String, lgK: Int = 14): DataFrame = {
    require(delta.columns.contains("_change_type"),
      "delta must carry _change_type — the diff/CDF shape")
    // ONLY pure inserts are sketch-safe: a delete cannot be forgotten, and
    // an update's preimage value survives in the sketch even if only the
    // postimage were folded — both would overcount forever
    val guarded = delta.withColumn("__ins",
      when(col("_change_type") === "insert", 1L)
        .otherwise(raise_error(concat(
          lit("IncrementalAgg: _change_type '"), col("_change_type"),
          lit("' is not sketch-maintainable — HLL registers cannot forget " +
            "a deleted or pre-update value; re-bootstrap the affected " +
            "groups with computeDistinct instead"))).cast("long")))
      .filter(col("__ins") === 1L)
    val deltaAgg = guarded.groupBy(keys.map(col): _*)
      .agg(expr(s"hll_sketch_agg($distinctCol, $lgK)").as("__dsk"),
        count(lit(1)).as("__dn"))
    current.join(deltaAgg, keys, "full_outer")
      .select((keys.map(col) :+
        when(col("__dsk").isNull, col("__sketch"))
          .when(col("__sketch").isNull, col("__dsk"))
          .otherwise(expr("hll_union(__sketch, __dsk)")).as("__sketch") :+
        (coalesce(col(CountCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(CountCol)): _*)
  }

  /** Read surface of the maintained sketch state: per-key approx-distinct
    * estimate + row count.
    */
  def distinctEstimates(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select((keys.map(col) :+
      expr("CAST(hll_sketch_estimate(__sketch) AS BIGINT)")
        .as("approx_distinct") :+ col(CountCol)): _*)
}
