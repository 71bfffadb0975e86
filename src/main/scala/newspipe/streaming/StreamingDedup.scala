package newspipe.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the incremental-ingestion form of
  * [[newspipe.ops.Dedup.exact]]: drop any document whose content digest was
  * already seen, across micro-batches.
  *
  * State shape: one entry per distinct digest inside the watermark horizon.
  * A late duplicate arriving after the horizon passes is re-admitted — the
  * documented completeness/state trade, same late-data policy as the
  * windowed aggregations.
  */
object StreamingDedup {

  /** Digest column used for identity — md5 over the key columns, the same
    * NUL-separated form as the batch operator's grouping digest.
    */
  def digest(keyCols: Seq[String]): org.apache.spark.sql.Column =
    md5(concat_ws("\u0000", keyCols.map(col): _*))

  /** Deduplicate a stream by content digest. `tsCol` carries event time;
    * duplicates inside `watermark` of each other collapse to the FIRST
    * arrival (micro-batch order), matching the batch keep-one semantic.
    * `dropDuplicatesWithinWatermark` keys state on the digest alone but
    * still expires entries by the watermark — a plain `dropDuplicates` on
    * the bare digest would grow state forever.
    */
  def exact(stream: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    stream
      .withColumn("__digest", digest(keyCols))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")
}
