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
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', `__n_$c`, `__nulls_$c`, `__nd_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stacked) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)")
  }
}
