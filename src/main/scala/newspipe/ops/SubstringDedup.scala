package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact substring-span deduplication — the Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better") signal at
  * token-span granularity, distributed as pure relational algebra rather
  * than the paper's single-node suffix array:
  *
  *  1. every k-token window of every document becomes one (doc, start,
  *     gram-digest) occurrence — ONE row per token position, not all
  *     pairs;
  *  2. a two-level aggregate finds cross-document duplicated grams and
  *     each gram's CANONICAL occurrence (lexicographic min by (doc,
  *     start)) with full map-side combine — no Expand, no distinct over
  *     the token stream;
  *  3. every position covered by a NON-canonical occurrence of a
  *     duplicated gram is removed; documents reassemble from their
  *     surviving tokens.
  *
  * The canonical exemption keeps one copy of each duplicated span (the
  * paper's posture — dedup, not deletion); positions of the canonical
  * occurrence can still fall to OVERLAPPING duplicated grams whose
  * canonical lives elsewhere, so the rule is position-level and exactly
  * replayable relationally — which is what makes the op oracle-checkable
  * and deterministic across engines, retries and partitionings.
  *
  * Scale shape: token-linear row counts end to end (the span explode is
  * bounded by k × duplicated occurrences), three key-partitioned shuffles
  * (gram agg, removed-position distinct, per-doc rebuild), equi-joins
  * left to AQE. No all-pairs stage anywhere, no driver-side state.
  */
object SubstringDedup {

  // unit separator ("\\u001f", chr(31) in the SQL replay): never in tokens
  private val Sep = "\u001f"

  /** Scrub cross-document duplicated k-token spans from `textCol`
    * (whitespace-tokenized). Output: one row per input row with
    * `scrub_text` (surviving tokens re-joined), `n_kept` (surviving
    * token count; 0 with empty-string text when every span was
    * duplicated elsewhere first).
    */
  def scrubDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"span length k must be >= 2, got $k")
    val id = col(idCol)
    val toks = df.select(id.as("__sd_id"),
      split(col(textCol), " ").as("__sd_toks"))

    // one occurrence per window start (1-based, like the SQL replay)
    val occ = toks
      .withColumn("__sd_p", explode(
        when(size(col("__sd_toks")) >= k,
          sequence(lit(1), size(col("__sd_toks")) - lit(k - 1)))
          .otherwise(array().cast("array<int>"))))
      .select(col("__sd_id"), col("__sd_p"),
        md5(concat_ws(Sep,
          slice(col("__sd_toks"), col("__sd_p"), lit(k)))).as("__sd_g"))

    // two-level: per-(gram, doc) min start first (map-side combinable),
    // then per-gram doc count + canonical = lexicographic min (doc, start)
    val perDoc = occ.groupBy("__sd_g", "__sd_id")
      .agg(min(col("__sd_p")).as("__sd_minp"))
    val canon = perDoc.groupBy("__sd_g")
      .agg(count(lit(1)).as("__sd_docs"),
        min(struct(col("__sd_id"), col("__sd_minp"))).as("__sd_canon"))
      .filter(col("__sd_docs") >= 2)
      .select(col("__sd_g"), col("__sd_canon.__sd_id").as("__sd_cid"),
        col("__sd_canon.__sd_minp").as("__sd_cp"))

    // non-canonical occurrences of duplicated grams cover [p, p+k-1]
    val removed = occ.join(canon, "__sd_g")
      .filter(!(col("__sd_id") === col("__sd_cid") &&
        col("__sd_p") === col("__sd_cp")))
      .select(col("__sd_id"),
        explode(sequence(col("__sd_p"), col("__sd_p") + lit(k - 1)))
          .as("__sd_pos"))
      .distinct()

    val tokPos = toks.select(col("__sd_id"),
        posexplode(col("__sd_toks")).as(Seq("__sd_pos0", "__sd_tok")))
      .select(col("__sd_id"), (col("__sd_pos0") + 1).as("__sd_pos"),
        col("__sd_tok"))
    val rebuilt = tokPos
      .join(removed, Seq("__sd_id", "__sd_pos"), "left_anti")
      .groupBy("__sd_id")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("__sd_pos"), col("__sd_tok")))),
          x => x("__sd_tok")), " ").as("__sd_text"),
        count(lit(1)).as("__sd_kept"))

    df.join(rebuilt, id === rebuilt("__sd_id"), "left")
      .withColumn("scrub_text", coalesce(col("__sd_text"), lit("")))
      .withColumn("n_kept", coalesce(col("__sd_kept"), lit(0L)))
      .drop("__sd_id", "__sd_text", "__sd_kept")
  }

  /** Corpus-level duplicated-span statistics (the report the scrub run
    * starts from): per duplicated gram, how many docs/occurrences carry
    * it. Same aggregation spine as [[scrubDuplicateSpans]].
    */
  def duplicateSpanStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"span length k must be >= 2, got $k")
    val toks = df.select(col(idCol).as("__sd_id"),
      split(col(textCol), " ").as("__sd_toks"))
    val occ = toks
      .withColumn("__sd_p", explode(
        when(size(col("__sd_toks")) >= k,
          sequence(lit(1), size(col("__sd_toks")) - lit(k - 1)))
          .otherwise(array().cast("array<int>"))))
      .select(col("__sd_id"),
        md5(concat_ws(Sep,
          slice(col("__sd_toks"), col("__sd_p"), lit(k)))).as("__sd_g"))
    occ.groupBy("__sd_g", "__sd_id").agg(count(lit(1)).as("__sd_n"))
      .groupBy(col("__sd_g").as("gram"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__sd_n")).as("n_occ"))
      .filter(col("n_docs") >= 2)
  }
}
