package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked keyword retrieval over a document corpus (extension track,
  * SURVEY.md §7): BM25 scoring for targeted subset extraction — the tool a
  * training-data pipeline uses to pull topic slices out of a web-scale
  * corpus (quality-classifier seed sets, domain-targeted subsets).
  *
  * Scale shape: the query is a handful of terms. Corpus statistics (N,
  * avgdl) and per-term document frequencies reduce to a FEW SCALARS — both
  * ride broadcast joins, so the corpus crosses exactly two shuffles: the
  * (doc, term) term-frequency aggregate and the per-doc score sum. No
  * driver-side collect; everything stays one lazy plan.
  */
object Retrieval {

  /** BM25 score of every matching doc (score > 0 ⇔ at least one query term
    * present). Standard Robertson/Sparck-Jones idf with the +1 smoothing
    * (`ln(1 + (N - df + 0.5)/(df + 0.5))`), k1/b defaults from the
    * literature.
    *
    * @return (idCol, score) — one row per doc containing ≥1 query term.
    */
  def bm25(corpus: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val terms = queryTerms.distinct

    // ONE tokenize pass over the corpus. The token stream feeds TWO
    // aggregates — corpus stats (N, avgdl) and the (doc, term) term
    // frequencies — and they share no exchange, so the lazy form ran
    // scan + regex tokenization TWICE per call (guide §1.2: don't
    // recompute what a stage boundary can hold). The checkpointed frame
    // is the NARROW projection only: doc id, token count, and the
    // query-term occurrences (a handful per doc) — never the text or the
    // full token array, so the materialization is O(rows), not O(bytes).
    val slim = Par.ensure(corpus.select(col(idCol), col(textCol).as("__t")))
      .withColumn("__toks", Dedup.tokens(col("__t")))
      .select(col(idCol), size(col("__toks")).as("__dl"),
        filter(col("__toks"),
          t => t.isin(terms.map(x => x: Any): _*)).as("__qt"))
      .filter(col("__dl") > 0)
      .localCheckpoint(true)

    // corpus stats: two scalars, broadcast (no driver action — the
    // aggregate rides the plan as a broadcast nested-loop join)
    val stats = slim.agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))

    // (doc, term) term frequencies for query terms only: the explode is
    // pre-filtered to the term set, so its volume is matches, not tokens
    val tf = slim
      .select(col(idCol), col("__dl"), explode(col("__qt")).as("__term"))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))

    // per-term document frequency: ≤ |terms| rows, broadcast back
    val df = tf.groupBy("__term").agg(count(lit(1)).as("__df"))

    tf.join(broadcast(df), Seq("__term"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__contrib",
        col("__idf") * (col("__tf") * (k1 + 1)) /
          (col("__tf") +
            lit(k1) * (lit(1.0) - b + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(idCol)
      .agg(sum("__contrib").as("score"))
  }

  /** Top-k docs for the query, deterministically ordered (score desc, id
    * asc tie-break).
    */
  def search(corpus: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10): DataFrame =
    bm25(corpus, idCol, textCol, queryTerms)
      .orderBy(desc("score"), col(idCol))
      .limit(k)

  /** Top-k TF-IDF terms per document — the per-doc keyword profile used
    * for topic tagging and domain labeling of corpus slices. Smoothed idf
    * `ln((N+1)/(df+1))` (never negative, defined for df=N), score
    * `tf · idf`, deterministic per-doc ranking (score desc, token asc).
    *
    * Scale shape: two aggregation shuffles — (doc, term) term frequency and
    * per-term document frequency — both with map-side partial combine; the
    * tf⋈df equi-join is on `token`, which AQE broadcast-converts when the
    * vocabulary is small and shuffles otherwise (a web-scale vocabulary is
    * NOT broadcastable — don't force it). The final per-doc top-k is a
    * window over (doc) partitions: rank ≤ k prunes before anything wide.
    *
    * @return (idCol, token, tf, df, tfidf, rank), rank 1..k per doc.
    */
  def tfIdf(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val toks = Par.ensure(corpus.select(col(idCol), col(textCol).as("__t")))
      .select(col(idCol), explode(Dedup.tokens(col("__t"))).as("token"))
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = corpus.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("token").asc)
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("__score",
        col("tf") * log((col("__n") + 1.0) / (col("df") + 1.0)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"),
        col("__score").as("tfidf"), col("rank"))
  }

  /** Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al.): fuse a
    * LEXICAL ranking (BM25 over `queryTerms`) and a SEMANTIC ranking
    * (cosine of each row's embedding against one query vector) by
    * `rrf(d) = Σ_legs 1 / (rrfK + rank_leg(d))`, docs absent from a leg
    * contributing nothing — the standard sparse+dense fusion a retrieval
    * pipeline runs ahead of an LLM (rank-based, so the two legs'
    * incomparable score scales never need calibration).
    *
    * Determinism for the oracle: each leg ranks on its score ROUNDED to
    * 1e-6 with the id as tie-break, so a sub-ulp libm difference between
    * engines can never flip adjacent ranks; the fused score is then a sum
    * of exact reciprocals of small integers — bit-identical everywhere.
    *
    * Scale shape: each leg ends in `orderBy(...).limit(legK)` — Spark
    * plans TakeOrderedAndProject (per-partition partial top-k, no global
    * sort); the fusion is a full-outer join of two ≤`legK`-row frames.
    * The semantic leg is ONE scan with the query vector as a broadcast
    * literal — zero shuffles before the top-k.
    *
    * @return (idCol, lex_rank, sem_rank, rrf, rank) — top `topK` by fused
    *   score; leg ranks null where the doc missed that leg's top-`legK`.
    */
  def hybridRrf(corpus: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String],
      embeddings: DataFrame, embIdCol: String, vecCol: String,
      queryVec: Seq[Double], topK: Int = 10, rrfK: Int = 60,
      legK: Int = 50): DataFrame = {
    require(queryVec.nonEmpty, "hybridRrf needs a non-empty query vector")
    // topK may exceed legK: the fused pool holds up to 2·legK distinct docs
    require(topK >= 1 && legK >= 1 && rrfK >= 1,
      s"need positive topK/legK/rrfK; got topK=$topK legK=$legK rrfK=$rrfK")
    import org.apache.spark.sql.expressions.Window

    def ranked(leg: DataFrame): DataFrame = {
      // limit first (distributed partial top-k), then rank the tiny frame
      val top = leg.orderBy(desc("__s"), asc("__id")).limit(legK)
      top.withColumn("__r", row_number().over(
        Window.orderBy(desc("__s"), asc("__id"))))
    }

    val lex = ranked(bm25(corpus, idCol, textCol, queryTerms)
      .select(col(idCol).as("__id"), round(col("score"), 6).as("__s")))
      .select(col("__id"), col("__r").as("lex_rank"))

    val sem = ranked(embeddings
      .select(col(embIdCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .select(col("__id"),
        round(Similarity.cosine(col("__v"), typedLit(queryVec)), 6)
          .as("__s"))
      .filter(col("__s").isNotNull))
      .select(col("__id"), col("__r").as("sem_rank"))

    val fused = lex.join(sem, Seq("__id"), "full_outer")
      .withColumn("__rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rank")), lit(0.0)))
    fused.orderBy(desc("__rrf"), asc("__id")).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("__rrf"), asc("__id"))))
      .select(col("__id").as(idCol), col("lex_rank"), col("sem_rank"),
        round(col("__rrf"), 6).as("rrf"), col("rank"))
  }
}
