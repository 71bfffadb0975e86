package newspipe.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Large-scale deduplication operators (extension track, SURVEY.md §7).
  *
  * The reference's dedup surface is `dropDuplicates(subset)` (ref 02:66) —
  * exact, whole-value. A 100 TB training-data pipeline needs near-dup too;
  * everything here is expressed as declarative DataFrame transforms so
  * Catalyst/AQE handle distribution:
  *
  *  - exact:   one hash shuffle on the content digest (minimum possible).
  *  - MinHash: signatures are computed PER ROW with array expressions
  *    (zero shuffle), then one shuffle on (band, bucket) for candidate
  *    generation — the standard MinHash-LSH plan. Bucket size is capped to
  *    guard against degenerate skew (a stop-shingle bucketing every doc).
  *  - SimHash: per-row 64-bit signature, candidates via banded exact-match
  *    on 16-bit chunks (all pairs within hamming distance 3 share ≥1 chunk).
  *  - n-gram Jaccard: exact verification on candidate pairs (array
  *    intersect/union), never all-pairs.
  */
object Dedup {

  // ---- shingling ----------------------------------------------------------

  /** Lowercased word tokens — native codegen'd kernel
    * ([[newspipe.functions.TokenizeKernel]]); SQL replay is
    * `regexp_split_to_array(lower(text), '[^a-z0-9'']+')` minus empties,
    * exactly as before the kernel (parity property-pinned).
    */
  def tokens(text: Column): Column =
    newspipe.functions.TextKernels.tokens(text)

  /** Distinct word n-gram shingles from a token array column — native
    * codegen'd kernel ([[newspipe.functions.ShinglesKernel]]), one pass, no
    * interpreted lambda chain. Replaces the
    * `array_distinct(transform(sequence…, slice+array_join))` HOF form,
    * whose interpreted evaluation dominated every explode-over-shingles
    * plan (`InferFiltersFromGenerate` clones the generator child into a
    * pre-Generate filter, so the chain ran up to 4× per row).
    */
  def shinglesFromTokens(toks: Column, n: Int = 3): Column =
    newspipe.functions.TextKernels.shingles(toks, n)

  /** Distinct word n-gram shingles of `text` (n-gram Jaccard's unit).
    * Docs shorter than n words get their whole token string as one shingle
    * so they still participate. Convenience form for one-shot use; hot paths
    * go through [[shinglesFromTokens]] over a materialized token column.
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** Heavy per-row kernels (minhash signatures, simhash) must not be bound by
    * the source file layout: a single parquet file/row-group reads as ONE
    * partition, serializing the whole signature computation onto one core.
    * Widen to the session's default parallelism when the input is narrower —
    * the shuffled payload (id + text) is tiny next to the compute it spreads.
    */
  private def ensureParallelism(df: DataFrame): DataFrame = Par.ensure(df)

  // ---- exact --------------------------------------------------------------

  /** Exact dedup: keep the row with the smallest `idCol` per digest of
    * `keyCols`. Returns the input columns of the kept rows.
    *
    * Shape: ONE aggregate — `min(struct(id, rest…))` with the id leading,
    * so the lexicographic struct min IS the min-id row (ids are unique, so
    * later fields never decide). The aggregate gets map-side partial
    * combine (physically a SortAggregate — struct min buffers aren't
    * hash-aggregable — but the partial phase is what matters): on a
    * dup-heavy corpus (the reason this operator runs at all) duplicates
    * collapse to one row per map partition BEFORE the exchange. The window
    * form this replaced (`row_number over (partition by digest order by
    * id)`) shipped every duplicate through the shuffle and sorted it in
    * the reducer just to discard it. Plan pinned in PlanSpec.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val digest = md5(concat_ws("\u0000", keyCols.map(col): _*))
    val cols = df.columns
    val ordered = col(idCol) +: cols.filterNot(_ == idCol).map(col).toSeq
    df.groupBy(digest.as("__d"))
      .agg(min(struct(ordered: _*)).as("__r"))
      .select(cols.map(c => col(s"__r.`$c`").as(c)).toSeq: _*)
  }

  /** Exact-dup groups: digest → keeper id + group size (the audit view). */
  def exactGroups(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(md5(concat_ws("\u0000", keyCols.map(col): _*)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("group_size"))

  // ---- MinHash + LSH ------------------------------------------------------

  /** Per-row MinHash signature: the Kirsch–Mitzenmacher double-hashing
    * family over two XXH64 string hashes, computed by the native
    * [[newspipe.functions.MinHashSignature]] Catalyst expression — one
    * static-kernel call per row inside whole-stage codegen, reading the
    * unsafe array's UTF8Strings directly (the Scala-UDF form this replaced
    * paid a UTF8String→String→Seq materialization per row; identical hash
    * math, bit-for-bit equal signatures, parity-pinned in DedupSpec).
    * Computed where the row lives, no shuffle.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int = 64): Column =
    newspipe.functions.MinHash.signature(shingleCol, numHashes)

  /** (bands, rowsPerBand) for a target Jaccard threshold — the standard LSH
    * S-curve tuning: the candidate probability at similarity s is
    * 1 − (1 − s^r)^b, whose inflection sits near (1/b)^(1/r). Picks the
    * divisor pair of `numHashes` whose inflection lands closest to
    * `threshold`, so callers stop hand-guessing band counts:
    * `val (b, r) = Dedup.lshParams(0.8); minhashCandidates(df, id, text,
    * bands = b)`.
    */
  def lshParams(threshold: Double, numHashes: Int = 64): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0, 1), got $threshold")
    require(numHashes > 0, s"numHashes must be positive, got $numHashes")
    val candidates = (1 to numHashes).filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
    candidates.minBy { case (b, r) =>
      math.abs(math.pow(1.0 / b, 1.0 / r) - threshold)
    }
  }

  /** LSH banding: (band_id, bucket_hash) pairs for a signature split into
    * `bands` bands of `rows` rows. Docs sharing any bucket are candidates.
    * `xxhash64` hashes the sliced long array DIRECTLY — no per-band string
    * casting/concatenation; equal slices still map to equal buckets (the
    * only property banding needs) and the rare extra hash collision only
    * ADDS a candidate that exact verification then discards.
    */
  def lshBands(signature: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(signature, b * rows + 1, rows)).as("bucket"))
    }: _*)

  /** Candidate near-dup pairs (idA < idB) via MinHash-LSH.
    *
    * @param maxBucket skew guard: buckets larger than this are dropped
    *                  (a bucket of B docs yields B² pairs; at 100 TB an
    *                  uncapped hot bucket is a job-killer. Dropped buckets
    *                  mean those docs are compared through their OTHER
    *                  bands — with 16 bands the recall loss is negligible.)
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16,
      maxBucket: Int = 1000): DataFrame = {
    // tokens → shingles → signature materialize as separate Projects inside
    // bandedSignatures: each stage's result is a bound reference downstream,
    // evaluated once per row
    val banded = bandedSignatures(df, idCol, textCol, numHashes, bands)
    BucketedPairs.pairs(banded, Seq("band", "bucket"), "id", Nil, maxBucket)
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact n-gram Jaccard verification of candidate pairs: join shingle sets
    * back and compute |∩| / |∪|. `candidates` has (id_a, id_b).
    *
    * Only docs that APPEAR in a candidate pair are re-shingled: a semi-join
    * against the candidate id set (broadcast at runtime — candidates ≪
    * corpus) prunes the corpus before the tokenize/shingle projection, so
    * verification cost scales with the candidate set, not the corpus.
    *
    * The candidate list is materialized once (`localCheckpoint`, eager):
    * it feeds FOUR downstream branches (the id set under both shingle join
    * inputs, plus the pair join itself), and when callers pass the LSH
    * candidate pipeline directly each branch would re-run signatures +
    * banding from the scan. Candidate pairs are small by construction —
    * that is the point of LSH — so the checkpoint is bounded. Its blocks
    * are released by the ContextCleaner when the checkpointed frame is
    * garbage-collected (there is no hook to unpersist eagerly: the returned
    * frame is lazy and keeps consuming the checkpoint); long-lived sessions
    * looping over many corpora hold at most the not-yet-collected candidate
    * frames, each candidate-set-sized.
    *
    * `eager = false` skips the checkpoint and keeps the WHOLE composition
    * lazy: nothing runs until the caller executes, at the price of the
    * candidate subtree re-evaluating per branch (identical exchanges are
    * still collapsed by ReusedExchange where Spark can prove them equal).
    * This is the mode the SQL table function uses — a bare EXPLAIN of
    * `minhash_pairs(...)` must not launch jobs.
    */
  def jaccardVerify(candidates: DataFrame, df: DataFrame, idCol: String,
      textCol: String, n: Int = 3, threshold: Double = 0.8,
      eager: Boolean = true): DataFrame = {
    val cand = if (eager) candidates.localCheckpoint(true) else candidates
    val candIds = cand.select(col("id_a").as("__cid"))
      .union(cand.select(col("id_b").as("__cid")))
      .distinct()
    val needed = df.join(candIds, col(idCol) === col("__cid"), "left_semi")
    val sh = needed.select(col(idCol).as("__id"), tokens(col(textCol)).as("__toks"))
      .select(col("__id"), shinglesFromTokens(col("__toks"), n).as("__sh"))
    cand
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Full MinHash near-dedup: candidates → Jaccard verify → keep-min-id.
    * Returns rows of `df` minus near-duplicate non-keepers.
    */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16)
      : DataFrame = {
    val cand = minhashCandidates(df, idCol, textCol, numHashes, bands)
    val dups = jaccardVerify(cand, df, idCol, textCol, threshold = threshold)
    // a near-dup pair (a < b) removes b; a survives unless removed by a
    // smaller id elsewhere (greedy min-id clustering, one anti-join).
    val losers = dups.select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  // ---- connected-component clustering --------------------------------------

  /** Connected components over an undirected pair list — the transitive
    * closure of near-dup pairs (a~b, b~c ⇒ {a,b,c} one group even when a,c
    * were never compared).
    *
    * Iterative min-label propagation with PATH COMPRESSION (each round a
    * node adopts the min of its neighbors' labels AND its label's label —
    * pointer doubling), so rounds are O(log diameter), not O(diameter).
    * Every round is joins + a min-aggregate — shuffle-parallel — and the
    * frame is `localCheckpoint`ed to truncate lineage: without that, an
    * iterative DataFrame algorithm's plan grows per round until plan
    * stringification alone OOMs the driver (observed on a 40-node chain).
    *
    * Skew posture at 100 TB: a dominant component (one viral doc near-dup
    * of millions) concentrates its edges on few `src` keys. The
    * message-join is a plain equi-join, so AQE's skew-join split
    * (`spark.sql.adaptive.skewJoin.enabled`, on by default) re-chunks the
    * hot partitions at runtime — PINNED by DedupSpec's "AQE skew split"
    * case, which also pins the subtlety that makes it work here: the rule
    * only matches a shuffle DIRECTLY under the join's Sort, so the
    * per-round `localCheckpoint`s below (already needed for lineage
    * truncation) are load-bearing — they collapse each side to a plain
    * scan + shuffle, the one shape OptimizeSkewedJoin rewrites. Keep AQE
    * on for clustered dedup runs; the
    * label min-aggregates are safe regardless (partial aggregation
    * combines hot keys map-side before the shuffle). Upstream,
    * [[BucketedPairs]]' `maxBucket` cap already bounds how many pairs any
    * single bucket can emit, which is what keeps the edge list itself from
    * exploding quadratically.
    *
    * @return (id, component) — component = min id reachable.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 25): DataFrame = {
    val e = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct().localCheckpoint(true)
    // init = min(id, min direct neighbor): the first propagation round folded
    // into ONE aggregate over the edge set — size-≤2 components (the common
    // duplicate shape) start at their fixpoint, so the loop below runs a
    // single verification round instead of two
    var labels = e.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("__mn"))
      .select(col("id"), least(col("id"), col("__mn")).as("comp"))
      .localCheckpoint(true)
    // labels only ever DECREASE, so convergence is one aggregate — the label
    // checksum is strictly smaller after any change — instead of a
    // changed-rows join against the previous round
    def checksum(df: DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("comp").cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s // empty label set
    }
    var converged = false
    var i = 0
    var last = checksum(labels)
    while (!converged && i < maxIter) {
      val msgs = e.join(labels, e("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
      val neighborMin = labels.select("id", "comp").union(msgs)
        .groupBy("id").agg(min("comp").as("comp"))
      // pointer doubling: comp ← min(comp, comp(comp))
      val parents = neighborMin
        .select(col("id").as("__pid"), col("comp").as("__pcomp"))
      val next = neighborMin.join(parents, col("comp") === col("__pid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("__pcomp"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      val cur = checksum(next)
      labels = next
      converged = cur.compareTo(last) == 0
      last = cur
      i += 1
    }
    labels
  }

  /** Near-dedup with TRANSITIVE grouping: MinHash candidates → Jaccard
    * verify → connected components → keep the min id per component. Unlike
    * [[minhashDedup]]'s greedy pair removal, chained duplicates collapse to
    * one keeper even when the endpoints never shared a bucket.
    */
  def minhashDedupClustered(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16)
      : DataFrame = {
    val cand = minhashCandidates(df, idCol, textCol, numHashes, bands)
    val dups = jaccardVerify(cand, df, idCol, textCol, threshold = threshold)
    val comps = connectedComponents(dups)
    val losers = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** [[minhashDedupClustered]] with a KEEPER POLICY: each duplicate cluster
    * keeps its BEST-scoring doc (`scoreCol` max; ties broken by min id)
    * instead of the min id — the FineWeb-style rule "of near-identical
    * pages, keep the highest-quality one". Same candidate/verify/cluster
    * pipeline; the winner pick is ONE aggregate per component — no window
    * (a hot million-member cluster would sort inside one task), map-side
    * combinable.
    *
    * Winner ordering is `min(struct(score IS NULL, -score, id))`: the
    * leading null flag sorts every NULL-scored member AFTER every real
    * score (a bare `-score` would let NULL sort first and "win"), the
    * negated DOUBLE rank realizes score-descending without the
    * `Long.MinValue` overflow of negating an integral column, and the id
    * realizes the min-id tie-break. `scoreCol` must be numeric (checked);
    * scores beyond 2^53 lose sub-ulp distinctions in the double rank and
    * resolve by the id tie-break — documented contract, not silent
    * misordering of finite ranks.
    */
  def minhashDedupClusteredBy(df: DataFrame, idCol: String, textCol: String,
      scoreCol: String, threshold: Double = 0.8, numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    require(df.schema(scoreCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"minhashDedupClusteredBy score column '$scoreCol' must be numeric, " +
        s"got ${df.schema(scoreCol).dataType.simpleString}")
    val cand = minhashCandidates(df, idCol, textCol, numHashes, bands)
    val dups = jaccardVerify(cand, df, idCol, textCol, threshold = threshold)
    val comps = connectedComponents(dups)
    val scored = comps.join(
      df.select(col(idCol).as("id"), col(scoreCol).as("__sc")), Seq("id"))
    val winners = scored.groupBy("comp")
      .agg(min(struct(
        col("__sc").isNull.as("__nul"),
        (-coalesce(col("__sc").cast("double"), lit(0.0))).as("__ns"),
        col("id").as("__wid")))
        .as("__w"))
      .select(col("__w.__wid").as("__winner"))
    val losers = comps
      .join(winners, comps("id") === winners("__winner"), "left_anti")
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  // ---- span-level exact dedup ----------------------------------------------

  /** Exact duplicate-SPAN removal (the Lee et al. "Deduplicating Training
    * Data" unit, applied at k-token granularity): the corpus is chunked into
    * consecutive non-overlapping `span`-token pieces, and every chunk whose
    * exact content already occurred earlier in the corpus — ordered by
    * (id, chunk index) — is dropped. Whole-document dedup misses the
    * boilerplate/quote/license-header duplication INSIDE otherwise-distinct
    * documents; span dedup is the operator that removes it.
    *
    * Scale shape: chunking is a per-row projection (no shuffle); the
    * first-occurrence resolution is ONE hash aggregate on the chunk content
    * (map-side partial aggregation collapses hot chunks before the exchange,
    * so a million-way boilerplate chunk ships one row per map partition, not
    * a million) plus one join of the chunk stream against the winners (AQE
    * handles the hot-chunk join skew); reassembly is one aggregate on the
    * doc id. Nothing is quadratic in corpus or bucket size.
    *
    * Docs with no tokens (null/empty text) are absent from the result —
    * they hold no spans to keep or drop. A doc whose every span occurred
    * earlier survives with `kept_text = ""` and `n_kept = 0`.
    *
    * @return (idCol, n_spans, n_kept, kept_text) — kept chunks re-joined in
    *         original order, space-separated (tokenization is not
    *         reversible, so output text is normalized token text).
    */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      span: Int = 20): DataFrame = {
    require(span > 0, s"span must be positive, got $span")
    // materialized once (eager localCheckpoint): the token stream feeds
    // THREE branches (the chunk stream twice — aggregate side and join-back
    // side — plus the final n_spans join); without the cut each branch
    // re-runs scan + regex tokenization from the source. Same stage-boundary
    // pattern as jaccardVerify/q44 — the checkpoint holds (id, tokens),
    // corpus-sized but written once, vs three full scan+tokenize passes
    val toks = ensureParallelism(df.select(col(idCol).as("id"), col(textCol).as("__t")))
      .withColumn("__toks", tokens(col("__t")))
      .filter(size(col("__toks")) > 0)
      .select(col("id"), col("__toks"),
        ((size(col("__toks")) + (span - 1)) / span).cast("bigint").as("n_spans"))
      .localCheckpoint(true)
    // chunk c (0-based) covers tokens [1 + c·span, 1 + c·span + span);
    // __d = md5(chunk) is the dedup identity — the aggregate and its
    // join-back ship a fixed 32-hex key instead of the chunk text
    val chunks = toks.select(col("id"),
      posexplode(transform(sequence(lit(1), size(col("__toks")), lit(span)),
        i => array_join(slice(col("__toks"), i, lit(span)), " "))).as(Seq("idx", "chunk")))
      .withColumn("__d", md5(col("chunk")))
    // first occurrence of each chunk content wins: min (id, idx) — a hash
    // aggregate with map-side combine, not a window (a window would sort
    // every occurrence of a hot chunk inside one task)
    val firsts = chunks.groupBy("__d")
      .agg(min(struct(col("id"), col("idx"))).as("__first"))
    val kept = chunks.join(firsts, Seq("__d"))
      .filter(struct(col("id"), col("idx")) === col("__first"))
    val reassembled = kept.groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("chunk")))),
            x => x("chunk")), " ").as("kept_text"))
    toks.select(col("id"), col("n_spans"))
      .join(reassembled, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  // ---- cross-corpus dedup --------------------------------------------------

  /** Remove from `corpus` every document that exactly or nearly duplicates a
    * document of `reference` — the dedup-new-crawl-against-existing-training-
    * set operation. Exact matches go through a content-digest anti-join;
    * near matches through MinHash-LSH candidates ACROSS the two corpora
    * (corpus-side bands join reference-side bands — never all-pairs) with
    * exact n-gram Jaccard verification at `threshold`.
    *
    * Scale shape: both sides compute signatures per-row (no shuffle); the
    * candidate join shuffles on (band, bucket); `maxBucket` caps the
    * REFERENCE side of each bucket (a hot bucket of R reference docs × C
    * corpus docs yields R·C candidate pairs). Verification joins shingles
    * back only for docs that appear in a candidate pair.
    */
  def dedupAgainst(corpus: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, threshold: Double = 0.8, numHashes: Int = 64,
      bands: Int = 16, n: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val digest = md5(col(textCol).cast("string"))
    val refDigests = reference.select(digest.as("__refd")).distinct()
    val exactClean = corpus.join(refDigests, digest === col("__refd"), "left_anti")

    val cBands = bandedSignatures(corpus, idCol, textCol, numHashes, bands)
      .withColumnRenamed("id", "__cid")
    // the reference band stream feeds TWO branches of the candidate plan
    // (bucket census + the join itself) — checkpoint the small
    // (id, band, bucket) frame so the reference tokenize/shingle/signature
    // pipeline runs once, not twice (the corpus side is single-consumer)
    val rBands = bandedSignatures(reference, idCol, textCol, numHashes, bands)
      .withColumnRenamed("id", "__rid")
      .localCheckpoint(true)
    val okBuckets = rBands.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__rn_b")).filter(col("__rn_b") <= maxBucket)
      .select("band", "bucket")
    // candidate (corpus, reference) doc pairs — checkpointed once, as in
    // jaccardVerify: the pair set feeds both shingle semi-joins and the
    // verify join, each of which would otherwise re-run both band pipelines
    val cand = cBands
      .join(rBands.join(okBuckets, Seq("band", "bucket")), Seq("band", "bucket"))
      .select("__cid", "__rid").dropDuplicates("__cid", "__rid")
      .localCheckpoint(true)
    def candShingles(df: DataFrame, ids: DataFrame, outId: String) = {
      val needed = df.join(ids, col(idCol) === ids.columns.map(col).head, "left_semi")
      needed.select(col(idCol).as(outId), tokens(col(textCol)).as("__toks"))
        .select(col(outId), shinglesFromTokens(col("__toks"), n).as(s"__sh$outId"))
    }
    val cSh = candShingles(corpus, cand.select(col("__cid").as("__i")), "__cid")
    val rSh = candShingles(reference, cand.select(col("__rid").as("__i")), "__rid")
    val nearIds = cand
      .join(cSh, Seq("__cid")).join(rSh, Seq("__rid"))
      .filter(
        size(array_intersect(col("__sh__cid"), col("__sh__rid"))).cast("double") /
          size(array_union(col("__sh__cid"), col("__sh__rid"))) >= threshold)
      .select(col("__cid").as("__nearid")).distinct()
    exactClean.join(nearIds, col(idCol) === col("__nearid"), "left_anti")
  }

  /** Exact cross-corpus scrub with a Bloom-filter prefilter: remove from
    * `corpus` every doc whose text digest appears in `reference`, probing a
    * Bloom filter of the reference digests BEFORE any join. The corpus side
    * then crosses no shuffle at all: rows failing the probe (the vast
    * majority, when overlap is rare) are dropped inside the scan-side
    * projection, and only the fp-rate-bounded candidate slice pays the exact
    * digest semi-join that removes Bloom false positives. The result is
    * EXACTLY [[dedupAgainst]]'s exact phase (the digest anti-join) — Bloom
    * has no false negatives, so the sketch changes the plan, never the
    * answer.
    *
    * Scale shape: the filter is built by one `treeAggregate` over the
    * reference digests (mergeable sketch, map-side union, no shuffle) and
    * broadcast once — ~1.2 GB for 10⁹ digests at 1% fpp, the practical
    * ceiling of this path; past that, range-partition the digest space and
    * scrub per range. The RDD hop exists only to fold the sketch — the
    * row-level plan stays declarative.
    */
  def bloomScrub(corpus: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val digest = md5(col(textCol).cast("string"))
    val refDigests = reference.select(digest.as("__refd")).na.drop()
    val bf = refDigests.rdd.treeAggregate(
      BloomFilter.create(expectedItems, fpp))(
      (f, r) => { f.putString(r.getString(0)); f },
      (a, b) => { a.mergeInPlace(b); a })
    val bc = corpus.sparkSession.sparkContext.broadcast(bf)
    // native codegen'd probe (no ScalaUDF node): null digest → null → dropped
    // by the filter, same as the UDF's `d != null && …` false
    val dupIds = corpus
      .select(col(idCol).as("__dupid"), digest.as("__d"))
      .filter(newspipe.functions.BloomMightContain.probe(col("__d"), bc))
      .join(refDigests.distinct(), col("__d") === col("__refd"), "left_semi")
      .select("__dupid")
    corpus.join(dupIds, col(idCol) === col("__dupid"), "left_anti")
  }

  /** Per-doc (id, band, bucket) MinHash-LSH band stream — the shared front
    * half of [[minhashCandidates]] and [[dedupAgainst]]: tokenize → shingle
    * → signature (all per-row, no shuffle) → banded bucket ids.
    */
  private def bandedSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val sig = ensureParallelism(df.select(col(idCol).as("id"), col(textCol).as("__t")))
      .withColumn("__toks", tokens(col("__t")))
      .withColumn("__sh", shinglesFromTokens(col("__toks")))
      .select(col("id"), minhashSignature(col("__sh"), numHashes).as("sig"))
    sig.select(col("id"), explode(lshBands(col("sig"), bands, rows)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
  }

  // ---- SimHash -------------------------------------------------------------

  /** 64-bit SimHash of a token array: sum ±1 per bit over token hashes,
    * sign → bit. Computed per row by the native
    * [[newspipe.functions.SimHash64]] Catalyst expression — one static
    * kernel call inside whole-stage codegen, bit-identical MurmurHash3 ×2
    * math to the Scala-UDF form it replaced (parity-pinned in DedupSpec;
    * null/empty token arrays keep the zero signature).
    */
  def simhash(text: Column): Column =
    newspipe.functions.SimHash.simhash64(tokens(text))

  /** SimHash near-dup candidate pairs: band the 64-bit signature into four
    * 16-bit chunks; any pair within hamming distance 3 shares at least one
    * exact chunk (pigeonhole). One shuffle on (chunk_id, chunk_value).
    */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sig = ensureParallelism(df.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"), simhash(col("__t")).as("sig"))
    val chunked = sig.select(col("id"), col("sig"),
        explode(array((0 until 4).map { c =>
          struct(lit(c).as("chunk"),
            shiftrightunsigned(col("sig"), c * 16).bitwiseAND(lit(0xffffL)).as("v"))
        }: _*)).as("cb"))
      .select(col("id"), col("sig"), col("cb.chunk"), col("cb.v"))
    BucketedPairs.pairs(chunked, Seq("chunk", "v"), "id", Seq("sig"), maxBucket)
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}

/** Heavy per-row kernels must not be bound by the source file layout: a
  * single parquet file/row-group reads as ONE partition, serializing whole
  * signature/scoring stages onto one core. Widen to the session's default
  * parallelism when the input is narrower — the shuffled payload is tiny
  * next to the compute it spreads.
  */
private[ops] object Par {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // `inputFiles` is driver-side file-index metadata (the listing the scan
    // needs anyway, cached by the relation) — unlike `df.rdd`, it reads a
    // parallelism estimate without building the physical plan + RDD DAG
    // twice per query. A file can still SPLIT into several scan partitions,
    // so `files >= target` can only under-estimate parallelism — the
    // fallback repartition is skipped exactly when it's provably unneeded.
    // `files == 0` means NOT file-backed (in-memory, post-shuffle, JDBC),
    // not single-partition — for those the RDD partition count is the only
    // honest signal, and paying one plan build beats an unconditional
    // shuffle of an already-parallel input.
    val files = df.inputFiles.length
    if (files >= target) df
    else if (files == 0 && df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
