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

  /** Streaming NEAR-dedup at signature granularity: drop any document whose
    * full MinHash signature was already seen inside the watermark horizon.
    * Signature-identical means every one of the `numHashes` min-hashes
    * agrees — overwhelmingly J ≈ 1 near-duplicates (mirror pages, trivial
    * re-crawls), the bulk of near-dup mass in a live crawl.
    *
    * This is deliberately NOT banded LSH: banding requires joining
    * candidates back for Jaccard verification, which a streaming state
    * store cannot express incrementally without a stream-stream self-join
    * of unbounded lag. The signature-exact form needs ONE state entry per
    * distinct signature with watermark-bounded lifetime — the same state
    * shape as [[exact]] — and catches the duplicates that matter at ingest
    * time; sub-identical near-dups (edited re-posts) remain the batch
    * pipeline's job ([[newspipe.ops.Dedup.minhashDedup]] over the landed
    * corpus).
    *
    * Null/empty texts share the zero signature and would all collapse onto
    * one state key — they bypass the dedup branch instead (split + union of
    * the one watermarked stream), matching the batch operators' null-key
    * policy.
    */
  def nearBySignature(stream: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour", numHashes: Int = 64): DataFrame = {
    import newspipe.ops.Dedup
    val toks = Dedup.tokens(col(textCol))
    val hasTokens = col(textCol).isNotNull && size(toks) > 0
    val marked = stream.withWatermark(tsCol, watermark)
    val deduped = marked.filter(hasTokens)
      .withColumn("__sigkey", md5(concat_ws(",",
        transform(
          Dedup.minhashSignature(Dedup.shinglesFromTokens(toks), numHashes),
          x => x.cast("string")))))
      .dropDuplicatesWithinWatermark("__sigkey")
      .drop("__sigkey")
    deduped.unionByName(marked.filter(!hasTokens))
  }
}
