package newspipe.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — importance resampling toward a target
  * domain with hashed bag-of-token features (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"). The standard
  * way to pull a target-looking slice (e.g. "more like Wikipedia") out of
  * a raw web corpus without training a classifier: estimate token-bucket
  * distributions p (target) and q (raw), score every raw document by its
  * log importance weight `Σ_tokens log(p̂[h(tok)]/q̂[h(tok)])`, then take
  * the top slice under deterministic Gumbel noise (without the noise,
  * near-duplicates of the single most target-like page win every slot —
  * the paper resamples for exactly this diversity reason).
  *
  * Everything is engine-replayable: the feature hash is the first 32 bits
  * of `md5(token)` mod `buckets` (the [[Sampling]] convention — any ANSI
  * engine reproduces it), the Gumbel draw is `-ln(-ln(u))` with
  * `u ∈ (0,1)` from `md5(salt ‖ NUL ‖ id)`, and the bucket distributions
  * use add-α smoothing over a FIXED bucket count so the score is a pure
  * function of the two corpora.
  *
  * Scale shape: the bucket tables are ≤ `buckets` rows regardless of
  * corpus size — both distributions reduce via one map-side-combined
  * aggregate and ride a broadcast join back onto the token stream; the
  * per-doc score is one more partial-combined aggregate. Raw corpus
  * crosses the wire twice (token→bucket counts, per-doc score), target
  * once. No driver collect, no vocabulary-sized join.
  */
object Dsir {

  /** First-32-bits-of-md5 token→bucket hash, replayable in any engine:
    * `('0x' || substr(md5(tok),1,8))::UBIGINT % buckets`.
    */
  def tokenBucket(token: Column, buckets: Int): Column =
    pmod(conv(substring(md5(token), 1, 8), 16, 10).cast("bigint"),
      lit(buckets.toLong))

  /** Per-bucket add-α-smoothed log-probability table of a corpus:
    * `(bucket, logp)` with `logp = ln((cnt_b + α) / (total + α·buckets))`.
    * Buckets with zero count are PRESENT (the smoothing floor) so the
    * ratio table below never drops a feature.
    */
  private def bucketLogProbs(docs: DataFrame, textCol: String, buckets: Int,
      alpha: Double): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val counts = Par.ensure(docs.select(col(textCol).as("__t")))
      .select(explode(Dedup.tokens(col("__t"))).as("__tok"))
      .select(tokenBucket(col("__tok"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("__cnt"))
    val all = s.range(buckets).select(col("id").as("bucket"))
    // corpus total as a broadcast scalar (the BM25 stats shape), not a
    // global window — windows with no partition key single-thread the stage
    val tot = counts.agg(coalesce(sum("__cnt"), lit(0L)).as("__tot"))
    all.join(counts, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        log((coalesce(col("__cnt"), lit(0L)) + alpha) /
          (col("__tot") + alpha * buckets)).as("logp"))
  }

  /** Per-bucket log importance ratio `log p̂ − log q̂` of target vs raw —
    * ≤ `buckets` rows, the broadcastable model the scorer applies.
    */
  def logRatios(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int = 1024, alpha: Double = 1.0): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(alpha > 0, s"alpha must be > 0 (smoothing), got $alpha")
    val p = bucketLogProbs(target, textCol, buckets, alpha)
      .withColumnRenamed("logp", "__lp")
    val q = bucketLogProbs(raw, textCol, buckets, alpha)
      .withColumnRenamed("logp", "__lq")
    p.join(q, Seq("bucket"))
      .select(col("bucket"), (col("__lp") - col("__lq")).as("log_ratio"))
  }

  /** Log importance weight of every raw document under a fitted ratio
    * table: `Σ_tokens log_ratio[h(tok)]` (empty docs score 0).
    *
    * @return raw's (idCol) plus `log_weight`.
    */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame, buckets: Int): DataFrame = {
    val hashed = Par.ensure(raw.select(col(idCol), col(textCol).as("__t")))
      .select(col(idCol), explode(Dedup.tokens(col("__t"))).as("__tok"))
      .select(col(idCol), tokenBucket(col("__tok"), buckets).as("bucket"))
    val perDoc = hashed.join(broadcast(ratios), Seq("bucket"))
      .groupBy(idCol).agg(sum("log_ratio").as("__s"))
    raw.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__s"), lit(0.0)).as("log_weight"))
  }

  /** Deterministic Gumbel draw in standard form from the content address:
    * `u = (bucket32 + 0.5) / 2³²` (never 0 or 1), `g = −ln(−ln u)`.
    */
  def gumbel(idCol: Column, salt: String): Column = {
    val u = (conv(substring(md5(concat_ws("\u0000", lit(salt),
      idCol.cast("string"))), 1, 8), 16, 10).cast("double") + 0.5) /
      lit(4294967296.0)
    -log(-log(u))
  }

  /** Full DSIR selection: fit ratios on (target, raw), score raw, keep the
    * top `n` by `log_weight + gumbel` (the paper's importance resampling
    * with deterministic noise; `noiseScale = 0` degrades to hard top-n).
    * Deterministic total order: key desc, id asc.
    *
    * @return (idCol, log_weight, selected-rank `rank`), n rows.
    */
  def select(target: DataFrame, raw: DataFrame, idCol: String,
      textCol: String, n: Int, buckets: Int = 1024, alpha: Double = 1.0,
      salt: String = "dsir", noiseScale: Double = 1.0): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val ratios = logRatios(target, raw, textCol, buckets, alpha)
    importanceWeights(raw, idCol, textCol, ratios, buckets)
      .withColumn("__key",
        col("log_weight") + lit(noiseScale) * gumbel(col(idCol), salt))
      .orderBy(col("__key").desc, col(idCol).asc)
      .limit(n)
      .select(col(idCol), col("log_weight"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__key").desc, col(idCol).asc)).as("rank"))
  }
}
