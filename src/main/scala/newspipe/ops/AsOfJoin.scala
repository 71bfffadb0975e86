package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively (SURVEY.md §2.3:
  * none in the reference either; §7 extension surface over the events table).
  *
  * Semantics (match DuckDB `ASOF LEFT JOIN … ON l.k = r.k AND l.ts >= r.ts`):
  * for every left row, attach the LATEST right row of the same key with
  * right.ts ≤ left.ts; no match → nulls.
  *
  * Implementation is preference (a) of the custom-operator ladder — a
  * composition of built-ins: tag sides, union by position, ONE window over
  * (key, ts, side) carrying the last non-null right payload forward, filter
  * back to left rows. Cost = one hash shuffle on the key + a per-key sort —
  * the same budget as a sort-merge join, with no per-row probing and no
  * range explosion. The window is ALWAYS key-partitioned (never global), so
  * it scales with key cardinality.
  */
object AsOfJoin {

  /** @param rightPrefix prefix applied to every right column in the output
    *   (including its timestamp), keeping left columns untouched.
    * @param tolerance optional maximum staleness: a match older than
    *   `left.ts − tolerance` is discarded (nulls instead), the
    *   `merge_asof(tolerance=…)` semantic. Pass a value comparable to
    *   `left.ts − right.ts` — an interval literal for timestamp columns
    *   (`expr("INTERVAL '30' SECOND")`), a number for numeric ones.
    *   Applied as a post-filter on the carried match; the plan shape (one
    *   keyed window) is unchanged.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightPrefix: String = "r_",
      tolerance: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq.filterNot(_ == keyCol)

    val lStruct = struct(lCols.map(col): _*)
    val rStruct = struct(rCols.map(col): _*)
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val lTagged = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val rTagged = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
      lit(null).cast(left.select(lStruct.as("s")).schema("s").dataType).as("__l"),
      rStruct.as("__r"))

    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so an
    // equal-timestamp right row matches — the >= of the ASOF condition
    val w = Window.partitionBy("__k").orderBy("__ts", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined0 = lTagged.unionByName(rTagged)
      .withColumn("__match", last("__r", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val joined = tolerance match {
      case Some(tol) => joined0.withColumn("__match",
        when(col("__match").isNotNull &&
          col("__ts") - col(s"__match.$tsCol") <= tol, col("__match")))
      case None => joined0
    }

    val out = lCols.map(c => col(s"__l.$c").as(c)) ++
      rCols.map(c => col(s"__match.$c").as(s"$rightPrefix$c"))
    joined.select(out: _*)
  }
}
