package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus n-gram language model + per-document perplexity scoring — the
  * CCNet/Gopher quality signal: train token statistics on a trusted
  * reference slice (Wikipedia-like), score every candidate document by
  * its average token log-probability (low = out-of-distribution /
  * gibberish / boilerplate), then keep or bucket by the score. This is
  * KenLM's role in the published pipelines, re-expressed as pure
  * relational algebra so it runs where the corpus lives instead of on a
  * single node.
  *
  * Model = EXACT unigram + bigram counts (map-side-combined groupBys).
  * Scoring is stupid backoff (Brants et al. 2007, "Large Language Models
  * in Machine Translation"):
  *
  *   p(w_i | w_{i-1}) = c2(w_{i-1}, w_i) / c1(w_{i-1})   when c2 > 0
  *                    = alpha * p_uni(w_i)                otherwise
  *   p_uni(w)         = (c1(w) + 1) / (N + V + 1)         (Laplace; OOV
  *                                                         gets the +1)
  *
  * A document's first token scores as plain p_uni. Output per doc:
  * token count, average ln p rounded to 1e-6 (the q134 determinism
  * convention — a sub-ulp libm difference between engines can never flip
  * a rounded value), and perplexity exp(-avg).
  *
  * Scale shape: the model is a pair of DataFrames (vocab-sized and
  * bigram-sized) — never hand-broadcast, never collected; only the two
  * scalars N and V come to the driver. Scoring is one posexplode, one
  * per-document window lag (state bounded by document length, the
  * partition key is the doc id — no global window), three equi-joins on
  * token keys that AQE sizes and skew-splits, and one per-doc aggregate.
  * One lazy plan at any corpus size.
  */
object NgramLm {

  /** Trained model: `unigrams` = (w, c1), `bigrams` = (w1, w2, c2). */
  final case class Model(unigrams: DataFrame, bigrams: DataFrame,
      totalTokens: Long, vocabSize: Long, alpha: Double)

  /** Train on a reference corpus. The count tables are MATERIALIZED
    * eagerly (localCheckpoint): scoring joins the unigram table twice
    * (current and previous token) — lazy plans would re-tokenize the
    * whole reference per join, per score call.
    *
    * ONE tokenize + window pass: the `(w1, w)` pair counts (first tokens
    * carry `w1 = null`) are the single materialized aggregate, and both
    * model tables derive from it — `c1(w) = Σ_{w1} c(w1, w)` because
    * every token position contributes exactly one pair row (exact integer
    * sums, bit-identical counts). The previous form ran separate
    * checkpoint jobs for unigrams and bigrams, each re-running scan +
    * tokenization + the lag window over the whole reference.
    */
  def train(reference: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.4): Model = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val pos = tokenPositions(reference, idCol, textCol)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val pairs = pos.withColumn("w1", lag(col("w"), 1).over(w))
      .groupBy(col("w1"), col("w"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val uni = pairs.groupBy(col("w")).agg(sum(col("__c")).as("c1"))
      .localCheckpoint(true) // vocab-sized; consumed by two score joins
    val bi = pairs.filter(col("w1").isNotNull)
      .select(col("w1"), col("w").as("w2"), col("__c").as("c2"))
    val stats = uni.agg(sum(col("c1")), count(lit(1))).head()
    Model(uni, bi, stats.getLong(0), stats.getLong(1), alpha)
  }

  /** Per-document stupid-backoff score against a trained model:
    * (idCol, n_tokens, avg_logprob, ppl). Empty/tokenless docs are
    * absent (nothing to score).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val pos = tokenPositions(docs, idCol, textCol)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val withPrev = pos.withColumn("w1", lag(col("w"), 1).over(w))
    val uniPrev = model.unigrams
      .select(col("w").as("w1"), col("c1").as("__c1_prev"))
    val joined = withPrev
      .join(model.unigrams, Seq("w"), "left")
      .join(uniPrev, Seq("w1"), "left")
      .join(model.bigrams.withColumnRenamed("w2", "w"), Seq("w1", "w"),
        "left")
    val denom = lit((model.totalTokens + model.vocabSize + 1).toDouble)
    val pUni = (coalesce(col("c1"), lit(0L)) + lit(1.0)) / denom
    val p = when(col("w1").isNull, pUni) // first token of the doc
      .when(col("c2").isNotNull, col("c2").cast("double") / col("__c1_prev"))
      .otherwise(lit(model.alpha) * pUni)
    joined.withColumn("__lp", log(p))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("__lp")), 6).as("avg_logprob"))
      .withColumn("ppl", exp(-col("avg_logprob")))
  }

  /** Convenience: train on `reference`, score `docs`, keep the fraction
    * above `minAvgLogprob` — the CCNet keep-the-head filter shape.
    */
  def perplexityFilter(docs: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, minAvgLogprob: Double,
      alpha: Double = 0.4): DataFrame = {
    val scored = score(docs, idCol, textCol,
      train(reference, idCol, textCol, alpha))
    docs.join(scored.filter(col("avg_logprob") >= minAvgLogprob)
      .select(idCol), Seq(idCol))
  }

  /** (idCol, pos, w) for every token of every non-empty document — the
    * house tokenizer ([[Dedup.tokens]]: locale-independent lowercase,
    * split on `[^a-z0-9']+`), positions 0-based within the doc.
    */
  private def tokenPositions(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    Par.ensure(docs.select(col(idCol), col(textCol).as("__t")))
      .withColumn("__toks", Dedup.tokens(col("__t")))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), posexplode(col("__toks")).as(Seq("pos", "w")))
}
