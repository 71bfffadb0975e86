package newspipe.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state — the "enrich a click stream
  * with the impressions that preceded it" family. A naive stream-stream
  * join buffers BOTH streams forever; the only scale-viable form bounds
  * state with (a) watermarks on both sides and (b) an event-time interval
  * constraint the optimizer can translate into state eviction: a row
  * whose join window has passed the other side's watermark is dropped
  * from the state store instead of accumulating (Spark's
  * StreamingSymmetricHashJoin does exactly this when both bounds are
  * present).
  *
  * 100 TB-day shape: state per executor is `rate × tolerance` rows, not
  * the stream's history; the join itself is a keyed symmetric hash join —
  * one shuffle per side on the key, skew governed by key cardinality like
  * any equi-join.
  */
object StreamJoin {

  /** Watermarked interval inner join: left row at `tsL` matches right rows
    * at `tsR ∈ [tsL − tolerance, tsL]` with equal `key` — "the most recent
    * context no older than `tolerance`". Both inputs may be streaming (the
    * canonical case) or either may be batch.
    *
    * Column name contract: `key` must exist on both sides; every other
    * column name must be unique across the two inputs (rename upstream —
    * ambiguous names fail analysis, deliberately).
    */
  def withinInterval(left: DataFrame, right: DataFrame, key: String,
      tsL: String, tsR: String, tolerance: String,
      watermark: String, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer", "leftOuter").contains(joinType),
      s"stream-stream interval join supports inner/left_outer, got $joinType")
    val l = left.withWatermark(tsL, watermark)
    val r = right.withWatermark(tsR, watermark)
    val cond = l(key) === r(key) &&
      r(tsR) >= l(tsL) - expr(s"INTERVAL $tolerance") &&
      r(tsR) <= l(tsL)
    // left_outer: an unmatched left row emits with nulls only once the
    // right watermark has passed its join window — i.e. when a match has
    // become IMPOSSIBLE, not merely absent-so-far. Until the watermark
    // advances past it, the row sits in state awaiting a late match.
    l.join(r, cond, joinType).drop(r(key))
  }
}
