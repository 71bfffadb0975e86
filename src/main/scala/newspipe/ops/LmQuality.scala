package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency language-model quality scoring — the unigram form of
  * the CCNet-style "perplexity filter": score each document by the mean
  * log-probability of its tokens under the corpus's own unigram
  * distribution (add-α smoothed). Documents of common, fluent vocabulary
  * score high; gibberish, rare-token spam and encoding garbage score low —
  * the standard cheap LM gate before an expensive model-based filter.
  *
  * Scale shape: TWO aggregates and one token join, all declarative —
  *  1. token frequencies: explode → hash aggregate on the token (map-side
  *     combine collapses repeats per partition; vocabulary-sized output);
  *  2. corpus totals (N, |V|): a single-row aggregate of the frequency
  *     table (broadcast as a 1-row crossJoin, the q50/BM25 pattern);
  *  3. per-doc score: the token stream joins the frequency table on the
  *     token (vocabulary-sized build side — AQE broadcasts it when it
  *     fits, else a shuffle join on the token; either way the DOC payload
  *     never widens) and one hash aggregate on the doc id takes the mean.
  * Nothing is quadratic; every stage is map-side-combining.
  *
  * Determinism note: the per-doc mean sums doubles in partition order; the
  * oracle replay absorbs the ±ulp associativity drift with round(6), the
  * same contract as every other floating aggregate in the suite.
  *
  * Null/empty-token docs are absent from the result (no tokens → no
  * distribution to score them under) — callers union them back with a
  * sentinel if they must flow through.
  */
object LmQuality {

  /** (idCol, n_tokens, mean_logprob) per non-empty document. `smoothing`
    * is add-α: p(t) = (count(t) + α) / (N + α·|V|) — α > 0 keeps the score
    * finite for tokens unseen in the reference corpus when scoring one
    * corpus under another's table (see [[scoreUnder]]).
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
      smoothing: Double = 1.0): DataFrame = {
    require(smoothing > 0.0, s"smoothing must be positive, got $smoothing")
    val toks = Par.ensure(df.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"), explode(Dedup.tokens(col("__t"))).as("tok"))
      // the token stream feeds BOTH the frequency aggregate and the scoring
      // join — cut it once so tokenization runs once (the spanDedup shape)
      .localCheckpoint(true)
    scoreStream(toks, frequencies(toks), idCol, smoothing)
  }

  /** Score `df`'s documents under a SEPARATE reference corpus's unigram
    * table — the cross-corpus form (score a new crawl under the trusted
    * corpus's distribution). Unseen tokens get the smoothed floor
    * α / (N + α·|V|).
    */
  def scoreUnder(df: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, smoothing: Double = 1.0): DataFrame = {
    require(smoothing > 0.0, s"smoothing must be positive, got $smoothing")
    val toks = Par.ensure(df.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"), explode(Dedup.tokens(col("__t"))).as("tok"))
    val refToks = Par.ensure(
        reference.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"), explode(Dedup.tokens(col("__t"))).as("tok"))
    scoreStream(toks, frequencies(refToks), idCol, smoothing)
  }

  /** Vocabulary-sized (tok, cnt) hash aggregate. */
  private def frequencies(toks: DataFrame): DataFrame =
    toks.groupBy("tok").agg(count(lit(1)).as("__cnt"))

  private def scoreStream(toks: DataFrame, freqs: DataFrame, idCol: String,
      smoothing: Double): DataFrame = {
    val totals = freqs.agg(sum("__cnt").cast("double").as("__n"),
      count(lit(1)).cast("double").as("__v"))
    toks
      .join(freqs, Seq("tok"), "left") // unseen tokens → null cnt → floor
      .crossJoin(broadcast(totals))    // 1-row broadcast, the BM25 pattern
      .select(col("id"),
        log((coalesce(col("__cnt").cast("double"), lit(0.0)) + smoothing) /
          (col("__n") + lit(smoothing) * col("__v"))).as("__lp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), avg("__lp").as("mean_logprob"))
      .withColumnRenamed("id", idCol)
  }
}
