package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS algorithm) —
  * the fourth near-dup family next to MinHash, SimHash and embedding
  * cosine, and the one with a LOCALITY guarantee: any shared run of at
  * least `w + k − 1` tokens forces a shared fingerprint, so it catches
  * long verbatim overlaps (quotes, licence blocks, syndicated passages)
  * that whole-doc signatures dilute away. The reference pipeline has no
  * near-dup surface at all (its dedup is `dropDuplicates`, ref 02:66);
  * this extends the engine's curation track.
  *
  * Scale shape: fingerprint selection is one per-row codegen'd kernel
  * ([[newspipe.functions.WinnowKernel]]) — no shuffle; the expected
  * fingerprint density is 2/(w+1) of the gram stream, so the exploded
  * (id, fingerprint) frame is a small fraction of token volume. Pair
  * generation reuses [[BucketedPairs]] on the fingerprint key: one
  * exchange, ReusedExchange self-join, `maxBucket` capping stop-gram
  * buckets before any pair exists.
  */
object Winnow {

  /** Per-doc winnowing fingerprints, exploded to (idCol, fingerprint) rows
    * — sorted distinct 60-bit md5 hashes, replayable in ANSI SQL as
    * `('0x' || substr(md5(gram), 2, 15))::UBIGINT` over sliding-window
    * minima (see [[newspipe.functions.WinnowKernel]] for the width choice).
    * Null-id / null-text / token-free rows are excluded.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    val toks = Par.ensure(
      df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
        .select(col(idCol).as("__id"), Dedup.tokens(col(textCol)).as("__toks")))
      .filter(size(col("__toks")) > 0)
    toks.select(col("__id").as(idCol),
      explode(newspipe.functions.TextKernels.winnow(col("__toks"), k, w))
        .as("fingerprint"))
  }

  /** Candidate near-dup pairs: docs sharing at least `minShared` winnowing
    * fingerprints, with the shared count (the MOSS match score numerator).
    * One [[BucketedPairs]] exchange on the fingerprint key + one pair-keyed
    * count aggregate; `maxBucket` drops degenerate fingerprints shared by
    * more than `maxBucket` docs (the stop-gram guard — at w+k−1 tokens of
    * context such a fingerprint is boilerplate, which the boilerplate
    * operators handle better).
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4, minShared: Long = 2L,
      maxBucket: Int = 1000): DataFrame = {
    require(minShared >= 1L, s"minShared must be >= 1, got $minShared")
    val fps = fingerprints(df, idCol, textCol, k, w)
      .withColumnRenamed(idCol, "id")
    BucketedPairs.pairs(fps, Seq("fingerprint"), "id", Nil, maxBucket)
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
