package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared candidate-pair generator for the bucketed near-dup operators
  * (MinHash-LSH, SimHash banding, RHP cosine buckets).
  *
  * Shape: bucket rows with a size-capped `collect_list`, re-`explode`, then
  * SELF-JOIN on the bucket key with `id_a < id_b`. Compared to the obvious
  * "build all C(B,2) pairs as one nested array in the bucket row" form this
  * replaced, the join streams pairs row-parallel through whole-stage codegen
  * instead of materializing a memory-quadratic array in a single task — at
  * 100 TB a near-dup-heavy bucket would otherwise pin one executor with a
  * GB-sized row (and did burn 14.5 s at sf0.1, 42% of the round-1 bench).
  *
  * Shuffle budget: ONE exchange. The aggregate hash-partitions on the bucket
  * key; explode and the projections preserve that partitioning, so both join
  * inputs canonicalize to the same exchange (Spark plans a ReusedExchange)
  * and the join itself adds no shuffle. The aggregate also applies the
  * `maxBucket` skew cap on the true bucket size BEFORE any pair exists.
  */
private[ops] object BucketedPairs {

  /** All unordered row pairs (`idCol`_a < `idCol`_b) sharing a bucket key.
    *
    * @param df          input rows: bucketCols ++ (idCol +: payloadCols)
    * @param bucketCols  bucket key columns (pairs form within a key)
    * @param idCol       orderable id; output keeps `<id>_a`, `<id>_b`
    * @param payloadCols carried columns, emitted as `<col>_a` / `<col>_b`
    * @param maxBucket   buckets larger than this are dropped (skew guard —
    *                    a bucket of B rows yields B²/2 pairs)
    */
  def pairs(df: DataFrame, bucketCols: Seq[String], idCol: String,
      payloadCols: Seq[String], maxBucket: Int): DataFrame = {
    val fields = idCol +: payloadCols
    val bucketed = df
      .groupBy(bucketCols.map(col): _*)
      .agg(collect_list(struct(fields.map(col): _*)).as("__xs"))
      .filter(size(col("__xs")).between(2, maxBucket))
    val exploded = bucketed.select(
      bucketCols.map(col) :+ explode(col("__xs")).as("__x"): _*)
    def side(sfx: String) = exploded.select(
      bucketCols.map(col) ++
        fields.map(f => col(s"__x.$f").as(s"${f}_$sfx")): _*)
    side("a").join(side("b"), bucketCols)
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
      .drop(bucketCols: _*)
  }
}
