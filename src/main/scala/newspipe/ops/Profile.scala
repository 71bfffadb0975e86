package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the "analyze table" step that sizes every
  * downstream decision (broadcast thresholds, skew salting, DQ rule
  * candidates, partition column choice). The reference pipeline profiles
  * nothing; production curation starts here.
  *
  * One aggregate computes count / nulls / exact distinct / min / max per
  * requested column, then the single result row unpivots to one row per
  * column (`stack`). Min/max are rendered as strings so heterogeneous
  * column types share one schema; numeric semantics stay intact inside the
  * aggregate (string-rendering happens after).
  *
  * Scale shape: multiple `count(distinct …)` in one Aggregate plan via
  * Spark's Expand — ONE pass over the data, one exchange whose width is
  * the expand factor (#distinct-counted columns + 1). For very wide
  * profiles at 100 TB, split the column list or switch the distinct leg to
  * `approx_count_distinct` (HLL, mergeable — the q32 pattern); the exact
  * form here is the verification anchor.
  */
object Profile {

  /** (column, n_rows, n_nulls, n_distinct, min_value, max_value) — one row
    * per profiled column; NULLs are excluded from distinct/min/max
    * (standard SQL aggregate semantics, identical in the oracle replay).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(c))

  /** [[profile]]'s 100 TB form: the distinct leg is `approx_count_distinct`
    * (HLL++, relative error `rsd`, default 5%). The exact profile plans one
    * Expand row per distinct-counted column — at P profiled columns the
    * exchange carries P+1 copies of the input; the HLL sketches are
    * mergeable accumulators instead, so the plan is ONE ordinary aggregate
    * with map-side partial merge and no Expand, independent of P. Same
    * output schema; `n_distinct` is the estimate.
    */
  def profileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(c, rsd))

  /** Shared five-aggregate builder — the two public forms differ ONLY in
    * the distinct leg. Aggregate aliases are INDEX-based and the unpivot is
    * the typed Column API (array of structs + explode), so a profiled
    * column whose name contains quotes/backticks can never break or inject
    * into generated SQL.
    */
  private def profileWith(df: DataFrame, cols: Seq[String],
      distinctAgg: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(lit(1)).as(s"__n_$i"),
        count(when(df(c).isNull, 1)).as(s"__nulls_$i"),
        distinctAgg(df(c)).as(s"__nd_$i"),
        min(df(c)).cast("string").as(s"__min_$i"),
        max(df(c)).cast("string").as(s"__max_$i"))
    }
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  private def unpivot(one: DataFrame, cols: Seq[String]): DataFrame = {
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"__n_$i").as("n_rows"),
        col(s"__nulls_$i").as("n_nulls"), col(s"__nd_$i").as("n_distinct"),
        col(s"__min_$i").as("min_value"), col(s"__max_$i").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("__r")).select("__r.*")
  }
}
