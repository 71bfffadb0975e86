package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (extension track, SURVEY.md §7): flag training
  * documents that share any word n-gram with an evaluation/benchmark set —
  * the overlap filter every serious pretraining pipeline runs so eval
  * results aren't inflated by memorized test items (the GPT-3 appendix-C /
  * Llama-2 style n-gram collision rule).
  *
  * Scale shape: the benchmark side is eval-set-sized (thousands of items,
  * not terabytes) — its DISTINCT n-grams are broadcast, so the corpus
  * crosses NO shuffle for the probe: tokenize → shingle → explode streams
  * through whole-stage codegen straight into a broadcast hash join, and the
  * only exchange in the plan is the final per-doc aggregation of surviving
  * (doc, n-gram) hits. Corpus cost is one pass, independent of benchmark
  * count; a bigger benchmark only grows the broadcast table.
  */
object Decontaminate {

  /** Distinct shared-n-gram count per contaminated corpus doc.
    * Docs with no overlap are absent (inner probe); `n` is the collision
    * n-gram length (13 in the GPT-3 rule; use smaller for short documents).
    *
    * @return (idCol, shared_ngrams) — one row per contaminated doc.
    */
  def overlapCounts(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    // zero-token texts shingle to [""] (shinglesFromTokens' short-doc
    // fallback) — dropped on BOTH sides, or an empty/punctuation-only
    // benchmark item would flag every content-free corpus doc as
    // "contaminated" despite sharing no content
    val benchGrams = broadcast(
      benchmark.select(Dedup.tokens(col(benchTextCol)).as("__bt"))
        .select(explode(Dedup.shinglesFromTokens(col("__bt"), n)).as("__gram"))
        .filter(length(col("__gram")) > 0)
        .distinct())
    val corpusGrams = Par.ensure(
        corpus.select(col(idCol), col(textCol).as("__t")))
      .withColumn("__toks", Dedup.tokens(col("__t")))
      .select(col(idCol),
        explode(Dedup.shinglesFromTokens(col("__toks"), n)).as("__gram"))
      .filter(length(col("__gram")) > 0)
    corpusGrams.join(benchGrams, Seq("__gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** The decontaminated corpus: rows of `corpus` minus every doc sharing at
    * least `minOverlap` distinct n-grams with the benchmark (1 = the strict
    * any-collision rule).
    */
  def clean(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13,
      minOverlap: Long = 1L): DataFrame = {
    val contaminated = overlapCounts(corpus, idCol, textCol,
      benchmark, benchTextCol, n)
      .filter(col("shared_ngrams") >= minOverlap)
      .select(col(idCol))
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Per-doc n-gram NOVELTY against a reference corpus: of each doc's
    * distinct n-grams, the share NOT present anywhere in the reference —
    * the memorization/novelty signal ("how much of this doc is new
    * relative to what the model already trained on"). The complement of
    * contamination: [[overlapCounts]] asks "does it collide at all",
    * novelty asks "what fraction is fresh".
    *
    * Scale shape: unlike the benchmark probe above, the reference here is
    * corpus-sized, so its distinct gram set is NOT assumed
    * broadcast-small — the membership probe is a shuffle join on the
    * n-gram key (AQE demotes to broadcast when the reference is small),
    * exactly [[Boilerplate.boilerplateFraction]]'s shape. Both sides ship
    * short gram strings, never document text.
    *
    * @return (idCol, n_ngrams, n_seen, novelty_frac) — one row per
    *         corpus doc with at least one token.
    */
  def noveltyScore(corpus: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def grams(df: DataFrame) =
      df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
        .select(col(idCol).as("__id"), Dedup.tokens(col(textCol)).as("__toks"))
        .filter(size(col("__toks")) > 0)
        .select(col("__id"),
          explode(Dedup.shinglesFromTokens(col("__toks"), n)).as("__gram"))
    val refGrams = grams(reference).select(col("__gram"))
      .distinct().select(col("__gram"), lit(1L).as("__hit"))
    grams(corpus).join(refGrams, Seq("__gram"), "left")
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_seen"))
      .withColumn("novelty_frac",
        round(lit(1.0) - col("n_seen").cast("double") / col("n_ngrams"), 6))
  }
}
