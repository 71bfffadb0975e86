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
    * Precision: CROSS-batch suppression is band-threshold only, by design —
    * the state store keeps one timestamp per bucket, not the claimant's
    * signature, so there is nothing to verify a later arrival against
    * without unbounded state. WITHIN a micro-batch, though, both members of
    * a candidate pair are present in the same bucket group, so
    * `verifyThreshold = Some(t)` turns on a per-collision MinHash-estimate
    * Jaccard check (matching signature components / numHashes — the
    * standard unbiased estimator): a spurious band collision with estimated
    * J < t no longer suppresses the doc, matching what the batch
    * pipeline's `jaccardVerify` pass would decide for same-batch pairs.
    * The default (None) keeps pure band-threshold semantics — batch
    * `minhashCandidates` parity.
    *
    * Deliveries are keyed by (id, content digest), and a collision with the
    * SAME (id, digest) is ignored as a redelivery of itself — so an
    * at-least-once source's same-batch replay keeps exactly one copy, while
    * two same-id deliveries with DIFFERENT texts are judged each on their
    * own bands (a delivery is kept only if ITS OWN bands are clean, never
    * by pooling fresh bands across variants). Rows arriving later than the
    * watermark may be re-admitted once their buckets' state expires — the
    * same late-data trade as [[exact]].
    *
    * @param idCol unique doc id (any atomic type; keyed as its string form)
    * @param verifyThreshold within-batch estimated-Jaccard verify level;
    *   None = band-threshold-only (batch-candidates parity)
    */
  def nearBanded(stream: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String = "1 hour", numHashes: Int = 64,
      bands: Int = 16, verifyThreshold: Option[Double] = None): DataFrame = {
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

    // (docid, digest, tsms, row, band, bucket, sig) + the watermarked
    // event-time column (carried so EventTimeTimeout sees a watermark
    // attribute downstream). The payload struct rides ONLY the band-0 row —
    // every band row carrying the full document would multiply both
    // shuffles' volume by `bands`; stage 2 coalesces it back (a doc's rows
    // share the micro-batch). The SIGNATURE rides every band row (numHashes
    // ints ≈ a few hundred bytes — small next to document text): it is what
    // lets a bucket group estimate Jaccard between same-batch colliders.
    val banded = marked.filter(hasTokens)
      .withColumn("__sig",
        Dedup.minhashSignature(Dedup.shinglesFromTokens(toks), numHashes))
      .select(
        col(idCol).cast("string").as("__docid"),
        md5(col(textCol)).as("__digest"),
        unix_millis(col(tsCol)).as("__tsms"),
        struct(schema.fieldNames.map(col).toSeq: _*).as("__row"),
        explode(Dedup.lshBands(col("__sig"), bands, rowsPerBand)).as("__bb"),
        col("__sig"),
        col(tsCol).as("__evt"))
      .select(col("__docid"), col("__digest"), col("__tsms"),
        when(col("__bb.band") === 0, col("__row"))
          .otherwise(lit(null).cast(schema)).as("__row"),
        col("__bb.band").as("__band"), col("__bb.bucket").as("__bucket"),
        col("__sig"), col("__evt"))

    val midSchema = StructType(Seq(
      StructField("__docid", StringType),
      StructField("__digest", StringType),
      StructField("__cross", IntegerType, nullable = false),
      StructField("__estj", DoubleType, nullable = false),
      StructField("__row", schema)))
    val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)

    // Stage 1 — per-(band,bucket) claim state. Greedy within a batch: the
    // (event time, id, digest)-minimal delivery into a previously-empty
    // bucket is the claimant — exactly the doc the batch operator would
    // pair the rest against. Each OTHER row in the group is tagged with its
    // estimated Jaccard vs the claimant (NaN when its only collision is a
    // redelivery of itself); rows in a bucket claimed by an EARLIER batch
    // are hard-stale (`__cross` = 1 — no signature survives in state to
    // verify against). One O(n) pass; the group array is batch-bucket-sized,
    // the only batch-local memory this operator holds (state itself stays
    // one timestamp per bucket).
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
            last = math.max(last, r.getLong(2))
            val m = rows(minIdx)
            val ts = r.getLong(2); val mts = m.getLong(2)
            if (ts < mts || (ts == mts && (r.getString(0) < m.getString(0) ||
                (r.getString(0) == m.getString(0) && r.getString(1) < m.getString(1)))))
              minIdx = i
            i += 1
          }
          state.update(last)
          state.setTimeoutTimestamp(
            math.max(last + horizonMs, state.getCurrentWatermarkMs() + 1))
          val win = rows(minIdx)
          val winSig = win.getSeq[Long](6)
          rows.iterator.zipWithIndex.map { case (r, j) =>
            val cross = if (wasOccupied) 1 else 0
            val self = r.getString(0) == win.getString(0) &&
              r.getString(1) == win.getString(1)
            val estj =
              if (wasOccupied || j == minIdx || self) Double.NaN
              else {
                val sig = r.getSeq[Long](6)
                var eq = 0
                var k = 0
                while (k < numHashes) { if (sig(k) == winSig(k)) eq += 1; k += 1 }
                eq.toDouble / numHashes
              }
            Row(r.getString(0), r.getString(1), cross, estj,
              if (r.isNullAt(3)) null else r.getStruct(3))
          }
        }
      }
    val tagged = banded
      .groupByKey(r => (r.getInt(4), r.getLong(5)))(keyEnc)
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(perBand)(
        Encoders.scalaLong, Encoders.row(midSchema))

    // Stage 2 — per-DELIVERY combine of the band verdicts: hash exchange on
    // (doc id, digest) co-locates a delivery's band rows, then a
    // per-partition map combines them within the micro-batch. Stateless, so
    // the single stateful operator above is the query's only state. A
    // delivery is kept iff ITS OWN bands are clean: no cross-batch-claimed
    // bucket, and no same-batch collision that survives the verify rule
    // (any collision when verifyThreshold is None; estimated J ≥ t when
    // Some(t)). Self-collisions are NaN and never suppress — an
    // at-least-once source's same-batch redelivery keeps exactly one copy
    // (the accumulators coincide), while same-id deliveries with different
    // texts are judged independently and never pool their fresh bands.
    val kept = tagged.repartition(col("__docid"), col("__digest"))
      .mapPartitions { it =>
        // (anyCross, maxEstJ, payload) per (docid, digest)
        val acc = new java.util.LinkedHashMap[(String, String), (Boolean, Double, Row)]()
        it.foreach { r =>
          val key = (r.getString(0), r.getString(1))
          val cross = r.getInt(2) == 1
          val estj = r.getDouble(3)
          val row = if (r.isNullAt(4)) null else r.getStruct(4)
          val prev = acc.get(key)
          if (prev == null) acc.put(key, (cross, estj, row))
          else acc.put(key, (prev._1 || cross,
            // NaN-aware max: NaN = "no non-self collision seen"
            if (estj.isNaN) prev._2 else if (prev._2.isNaN) estj else math.max(prev._2, estj),
            if (prev._3 != null) prev._3 else row))
        }
        import scala.jdk.CollectionConverters._
        acc.values.iterator.asScala.collect {
          case (anyCross, maxJ, row)
              if !anyCross && row != null &&
                (maxJ.isNaN || verifyThreshold.exists(maxJ < _)) =>
            row
        }
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
