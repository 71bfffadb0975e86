package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Corpus-level boilerplate detection over word n-grams — the CCNet /
  * RefinedWeb-style "same fragment on thousands of pages" signal. The
  * reference pipeline has no corpus-level text analytics (its silver layer is
  * row-local cleaning only, `notebooks/02_silver_transform_news_articles
  * .py`); these operators extend the engine toward training-data curation,
  * where repeated navigation chrome / license footers are a dominant noise
  * source.
  *
  * Scale shape: everything is n-gram-keyed aggregation — partial (map-side)
  * combine applies, no windows, no driver collection. The per-doc distinct
  * n-gram frame is consumed by two branches in [[boilerplateFraction]], so it
  * is localCheckpoint'd in its COMPACT per-doc array form (one row per doc)
  * rather than exploded form (one row per n-gram occurrence) — the
  * materialized footprint stays proportional to the corpus, not the n-gram
  * stream, and the scan + tokenize + shingle work still runs once.
  */
object Boilerplate {

  /** Per-doc distinct n-gram arrays: (id, grams). Null-id / null-text /
    * token-free rows are excluded — they have no content to match and no
    * stable identity to report.
    */
  private def docGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__id"), Dedup.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("__id"),
        Dedup.shinglesFromTokens(col("__toks"), n).as("__grams"))

  /** N-grams appearing in at least `minDf` DISTINCT documents, with their
    * document frequency. Shingles are distinct within a doc
    * ([[Dedup.shinglesFromTokens]]), so a plain `count(*)` after the explode
    * IS the document frequency — no `count(distinct id)` (and therefore no
    * expand or two-phase distinct aggregate) needed.
    *
    * 100 TB: one shuffle, on the n-gram key, with map-side partial combine;
    * the post-filter output (the boilerplate list) is tiny by construction —
    * frequency thresholds cut the Zipf tail, which is where the mass is.
    */
  def frequentNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minDf: Long = 2L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDf >= 1L, s"minDf must be >= 1, got $minDf")
    docGrams(df, idCol, textCol, n)
      .select(explode(col("__grams")).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDf)
  }

  /** [[frequentNgrams]] through a Count-Min prefilter — the same exact
    * answer, restructured so the corpus-wide shuffle carries only PLAUSIBLE
    * heavy hitters instead of the whole Zipf tail. Two passes over the
    * per-doc gram stream:
    *
    *  1. fold every occurrence into a Count-Min sketch (`treeAggregate`:
    *     map-side partial sketches, log-depth merge, no shuffle — the Bloom
    *     pattern of [[Dedup.bloomScrub]] with counts instead of membership);
    *  2. re-stream the grams, keep only those whose sketch estimate reaches
    *     `minDf`, and exact-count JUST those survivors.
    *
    * Count-Min never under-counts (hash collisions only ADD), so pass 2's
    * candidate set is a strict superset of the true frequent set and the
    * exact recount removes every false positive: the result provably equals
    * [[frequentNgrams]] row for row. What changes is the plan: at a Zipfian
    * 100 TB n-gram stream with a high threshold, the aggregate's shuffle
    * shrinks from the full distinct vocabulary to the tiny slice the sketch
    * can't rule out (fp mass ≤ eps·stream per row of depth), while the
    * sketch itself is a fixed ~`2.7/eps × ln(1/(1-confidence))` counters
    * regardless of corpus size.
    *
    * The compact per-doc gram frame is checkpointed once and feeds both
    * passes, so tokenize + shingle run once (same shape as
    * [[boilerplateFraction]]).
    *
    * Resource lifecycle: the sketch fold runs EAGERLY at call time (the
    * `treeAggregate` is an action), and the broadcast sketch + checkpoint
    * blocks stay live while the RETURNED frame is reachable — the probe
    * UDF's closure holds the broadcast, the frame's lineage holds the
    * checkpoint. Both are released by the ContextCleaner once the caller
    * drops the frame (no eager destroy is possible: the result is lazy and
    * re-executable). Callers looping over many corpora should drop each
    * result frame before building the next. `localCheckpoint` blocks live
    * on executors, not reliable storage — an executor loss invalidates the
    * truncated lineage and fails downstream jobs; on an unreliable cluster
    * prefer re-running the call (the fold is one pass) over checkpoint
    * recovery semantics this operator does not provide.
    */
  def frequentNgramsSketch(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minDf: Long = 2L, eps: Double = 1e-4,
      confidence: Double = 0.99, seed: Int = 1): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDf >= 1L, s"minDf must be >= 1, got $minDf")
    require(eps > 0.0 && eps < 1.0, s"eps must be in (0,1), got $eps")
    require(confidence > 0.0 && confidence < 1.0,
      s"confidence must be in (0,1), got $confidence")
    val grams = docGrams(df, idCol, textCol, n).localCheckpoint(eager = false)
    val stream = grams.select(explode(col("__grams")).as("ngram"))
    val cms = stream.rdd.treeAggregate(
      CountMinSketch.create(eps, confidence, seed))(
      (s, r) => { s.addString(r.getString(0)); s },
      (a, b) => { a.mergeInPlace(b); a })
    val bc = stream.sparkSession.sparkContext.broadcast(cms)
    // native codegen'd probe (no ScalaUDF node), scan-side as before
    stream.filter(newspipe.functions.CmsAtLeast.probe(col("ngram"), bc, minDf))
      .groupBy("ngram").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDf)
  }

  /** Per-document boilerplate fraction: of the doc's DISTINCT n-grams, the
    * share that are corpus-frequent (doc frequency >= `minDf`). A high
    * fraction marks template-dominated pages; feed it to a quality gate the
    * same way as [[TextStats.qualityScore]] components.
    *
    * Returns (idCol, n_ngrams, n_frequent, boilerplate_frac).
    *
    * Shape: the compact per-doc gram frame is checkpointed once (see object
    * doc), then (a) exploded + aggregated into the frequent set and (b)
    * exploded + joined against that set and re-aggregated per doc. The
    * frequent set is NOT assumed broadcast-small — at a low `minDf` it can
    * be a large fraction of the n-gram vocabulary — so the membership probe
    * is a shuffle join on the n-gram key; AQE demotes it to broadcast when
    * the threshold makes the set small. Both branches shuffle on the same
    * key, and the left join keeps every doc n-gram so `count(*)` per doc
    * still counts non-frequent grams.
    */
  def boilerplateFraction(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minDf: Long = 2L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDf >= 1L, s"minDf must be >= 1, got $minDf")
    val grams = docGrams(df, idCol, textCol, n).localCheckpoint(eager = false)
    val exploded = grams.select(col("__id"), explode(col("__grams")).as("ngram"))
    val frequent = exploded
      .groupBy("ngram").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("ngram"), lit(1L).as("__hit"))
    exploded.join(frequent, Seq("ngram"), "left")
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_frequent"))
      .withColumn("boilerplate_frac",
        round(col("n_frequent").cast("double") / col("n_ngrams"), 6))
  }
}
