package newspipe.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

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

  /** Streaming near-dedup at BAND granularity — the cross-batch analogue of
    * batch [[newspipe.ops.Dedup.minhashCandidates]]: a document is suppressed
    * iff any of its LSH band buckets was already claimed by an earlier
    * document inside the watermark horizon, i.e. iff the batch operator run
    * over the same corpus would emit a candidate pair (earlier, this). That
    * is band-level (Jaccard ≈ threshold) recall, where [[nearBySignature]]
    * only catches full-signature collisions (J ≈ 1).
    *
    * Shape: signatures + banding are per-row projections (the same native
    * kernels as batch); ONE shuffle keys (band, bucket) into
    * `flatMapGroupsWithState` whose state is a single timestamp per bucket
    * ever claimed inside the horizon — watermark-bounded via event-time
    * timeout, O(bands) entries per distinct doc, each a few bytes (no
    * signature, no text — skew-proof by construction: a hot bucket holds
    * ONE state entry regardless of how many docs hash into it). Every
    * arriving doc claims its buckets whether or not it is itself suppressed
    * (the batch-candidate parity semantic: chains a~b~c suppress c even
    * though a,c never shared a bucket). The per-doc combine of the 16 band
    * verdicts (keep iff EVERY band was fresh) is deliberately NOT a second
    * stateful operator — Structured Streaming's global-watermark
    * correctness check rejects stateful-after-flatMapGroupsWithState — but
    * a STATELESS hash exchange on the doc id plus a per-partition in-memory
    * group-by (`mapPartitions`): a doc's band rows always share a
    * micro-batch, so the combine never needs cross-batch state, and its
    * memory is bounded by the micro-batch, not the stream.
    *
    * Differences from the batch pipeline, by design: no Jaccard
    * verification pass (a streaming state store cannot re-join shingle sets
    * without unbounded stream-stream lag), so precision is the banding
    * threshold curve rather than exact-verified — the standard
    * ingest-time-filter / batch-verify split. Rows arriving later than the
    * watermark may be re-admitted once their buckets' state expires — the
    * same late-data trade as [[exact]].
    *
    * @param idCol unique doc id (any atomic type; keyed as its string form)
    */
  def nearBanded(stream: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String = "1 hour", numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    import newspipe.ops.Dedup
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val horizonMs = horizonMillis(watermark)
    val rowsPerBand = numHashes / bands
    val schema = stream.schema

    val toks = Dedup.tokens(col(textCol))
    // null id / null event time rows cannot key state or expire it — they
    // bypass the dedup branch like tokenless rows (the batch operators'
    // null-key exclusion policy, streamed)
    val hasTokens = col(textCol).isNotNull && size(toks) > 0 &&
      col(idCol).isNotNull && col(tsCol).isNotNull
    val marked = stream.withWatermark(tsCol, watermark)

    // (docid, tsms, row, band, bucket) + the watermarked event-time column
    // (carried so EventTimeTimeout sees a watermark attribute downstream).
    // The payload struct rides ONLY the band-0 row — every band row carrying
    // the full document would multiply both shuffles' volume by `bands`;
    // stage 2 coalesces it back (a doc's rows share the micro-batch).
    val banded = marked.filter(hasTokens)
      .withColumn("__sig",
        Dedup.minhashSignature(Dedup.shinglesFromTokens(toks), numHashes))
      .select(
        col(idCol).cast("string").as("__docid"),
        unix_millis(col(tsCol)).as("__tsms"),
        struct(schema.fieldNames.map(col).toSeq: _*).as("__row"),
        explode(Dedup.lshBands(col("__sig"), bands, rowsPerBand)).as("__bb"),
        col(tsCol).as("__evt"))
      .select(col("__docid"), col("__tsms"),
        when(col("__bb.band") === 0, col("__row"))
          .otherwise(lit(null).cast(schema)).as("__row"),
        col("__bb.band").as("__band"), col("__bb.bucket").as("__bucket"),
        col("__evt"))

    val midSchema = StructType(Seq(
      StructField("__docid", StringType),
      StructField("__fresh", IntegerType, nullable = false),
      StructField("__row", schema)))
    val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)

    // Stage 1 — per-(band,bucket) claim state. Greedy within a batch: only
    // the (event time, id)-minimal row into a previously-empty bucket is
    // fresh — exactly the doc the batch operator would pair the rest
    // against. One O(n) pass finds the winner (no sort); the group array is
    // batch-bucket-sized, the only batch-local memory this operator holds
    // (state itself stays one timestamp per bucket).
    val perBand: (((Int, Long), Iterator[Row], GroupState[Long]) => Iterator[Row]) =
      (_, it, state) => {
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val rows = it.toArray
          val wasOccupied = state.exists
          var last = state.getOption.getOrElse(Long.MinValue)
          var minIdx = 0
          var i = 0
          while (i < rows.length) {
            val r = rows(i)
            last = math.max(last, r.getLong(1))
            val m = rows(minIdx)
            val ts = r.getLong(1); val mts = m.getLong(1)
            if (ts < mts || (ts == mts && r.getString(0) < m.getString(0)))
              minIdx = i
            i += 1
          }
          state.update(last)
          state.setTimeoutTimestamp(
            math.max(last + horizonMs, state.getCurrentWatermarkMs() + 1))
          val win = minIdx
          rows.iterator.zipWithIndex.map { case (r, j) =>
            Row(r.getString(0), if (!wasOccupied && j == win) 1 else 0,
              if (r.isNullAt(2)) null else r.getStruct(2))
          }
        }
      }
    val tagged = banded
      .groupByKey(r => (r.getInt(3), r.getLong(4)))(keyEnc)
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(perBand)(
        Encoders.scalaLong, Encoders.row(midSchema))

    // Stage 2 — per-doc combine of the band verdicts: hash exchange on the
    // doc id co-locates a doc's band rows, then a per-partition map combines
    // them within the micro-batch. Stateless, so the single stateful
    // operator above is the query's only state. Keep iff the fresh-band
    // count reaches `bands` — counting (not AND) makes an at-least-once
    // source's SAME-BATCH redelivery keep exactly one copy: the first
    // delivery's bands are all fresh (count = bands), the replay's all
    // stale (adds 0), where a strict every-row AND would drop both.
    val kept = tagged.repartition(col("__docid"))
      .mapPartitions { it =>
        val acc = new java.util.LinkedHashMap[String, (Int, Row)]()
        it.foreach { r =>
          val id = r.getString(0)
          val fresh = r.getInt(1)
          val row = if (r.isNullAt(2)) null else r.getStruct(2)
          val prev = acc.get(id)
          if (prev == null) acc.put(id, (fresh, row))
          else acc.put(id, (prev._1 + fresh, if (prev._2 != null) prev._2 else row))
        }
        import scala.jdk.CollectionConverters._
        acc.values.iterator.asScala
          .collect { case (n, row) if n >= bands && row != null => row }
      }(Encoders.row(schema))

    kept.toDF().unionByName(marked.filter(!hasTokens))
  }

  /** Watermark horizon string → milliseconds (day/time units only — Spark
    * itself rejects month-based watermark delays as non-fixed durations).
    */
  private def horizonMillis(watermark: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    require(iv.months == 0,
      s"watermark horizon must use day/time units, got '$watermark'")
    iv.days * 86400000L + iv.microseconds / 1000L
  }
}
