package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
