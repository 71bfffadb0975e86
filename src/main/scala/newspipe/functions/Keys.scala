package newspipe.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Surrogate-key builders.
  *
  * The reference builds every surrogate key as
  * `row_number() OVER (ORDER BY <natural key>)` cast to string and TRUNCATED
  * to 5 chars (03_gold_modeling_news_articles.py:38-39,43-44,58-59). Two
  * documented hazards, preserved in `legacy` and fixed in the safe builders:
  *
  *  1. A global (un-partitioned) window forces ALL rows through a single
  *     partition — a non-starter at 100 TB. Spark itself warns
  *     "No Partition Defined for Window operation".
  *  2. `.substr(1, 5)` collides beyond 99,999 rows ("100000" → "10000").
  *
  * Safe alternatives the reference itself gestures at (it imports `md5` and
  * `monotonically_increasing_id` at 03:3-4 but never calls them):
  * content-addressed `md5(natural key)` (stable, join-reproducible,
  * shuffle-free) and `monotonically_increasing_id` (cheap, partition-local,
  * NOT stable across runs).
  */
object Keys {

  /** Legacy reference semantics: global row_number, cast, 5-char truncate.
    * Correct only below 100k rows; kept as the parity default.
    */
  def legacyRowNumberKey(orderBy: String): Column =
    row_number().over(Window.orderBy(orderBy)).cast(StringType).substr(1, 5)

  /** Zero-padded, non-truncated variant: same ordering semantics, no
    * collisions, still a global window (use only on dimension-sized inputs).
    */
  def paddedRowNumberKey(orderBy: String, width: Int = 12): Column =
    lpad(row_number().over(Window.orderBy(orderBy)).cast(StringType), width, "0")

  /** Scale-safe content-addressed key: md5 over the natural-key columns.
    * Deterministic, shuffle-free, stable across runs — the 100 TB default.
    */
  def md5Key(naturalKey: Column*): Column =
    md5(concat_ws("", naturalKey: _*))

  /** Scale-safe opaque key: partition-local counter. Cheap (no shuffle, no
    * sort) but NOT stable across runs — fine for within-job fact keys.
    */
  def monotonicKey(): Column =
    monotonically_increasing_id().cast(StringType)

  /** Attach a surrogate-key column built from a distinct natural key, using
    * the requested mode. Modes: "legacy" (reference parity), "padded",
    * "md5" (scale default).
    */
  def withSurrogateKey(df: DataFrame, naturalCol: String, keyCol: String,
      mode: String = "legacy"): DataFrame = mode match {
    case "legacy" => df.withColumn(keyCol, legacyRowNumberKey(naturalCol))
    case "padded" => df.withColumn(keyCol, paddedRowNumberKey(naturalCol))
    case "md5"    => df.withColumn(keyCol, md5Key(col(naturalCol)))
    case other    => throw new IllegalArgumentException(s"unknown key mode: $other")
  }
}
