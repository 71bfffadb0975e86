package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized interval (range) join — another operator Spark lacks a
  * shuffle-parallel plan for: `points JOIN intervals ON start ≤ x ≤ end` is
  * planned as a BroadcastNestedLoopJoin, O(|P| × |I|) work on one pass.
  *
  * Bucketizing turns it into an equi-join: points land in bucket ⌊x/w⌋,
  * intervals explode to every bucket they overlap (⌈len/w⌉ + 1 rows), the
  * join runs hash-partitioned on the bucket, and an exact BETWEEN filter
  * removes same-bucket non-overlaps. Work is O(|P| + |I|·spread + matches),
  * fully shuffle-parallel, with `bucketWidth` trading replication against
  * bucket selectivity (pick ≈ the typical interval length).
  *
  * Each (point, interval) pair meets in exactly ONE bucket (the point's), so
  * no dedup pass is needed.
  */
object RangeJoin {

  /** @param pointCol numeric (long-castable) coordinate of `points`
    * @param startCol/endCol inclusive interval bounds in `intervals`
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
      startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val p = points.withColumn("__b", floor(col(pointCol).cast("long") / w))
    val i = intervals.withColumn("__b",
      explode(sequence(floor(col(startCol).cast("long") / w),
        floor(col(endCol).cast("long") / w))))
    p.join(i, Seq("__b"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__b")
  }
}
