package newspipe.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) document reordering — Bavarian et al. 2022,
  * "Efficient Training of Language Models to Fill in the Middle": for a
  * deterministic fraction of documents, split the text at two points and
  * emit `<fim_prefix>P<fim_suffix>S<fim_middle>M` (PSM order), leaving
  * the rest unchanged — the pretraining augmentation that teaches
  * infilling without hurting left-to-right quality.
  *
  * Determinism (the [[Sampling]] md5-membership idea applied to
  * augmentation): the APPLY decision and BOTH split points derive from
  * `md5(salt || id)`, so the transform is byte-reproducible across runs,
  * retries and engines — a training run restarted mid-corpus re-derives
  * the exact same augmented documents, and an oracle can replay it.
  *
  * Scale shape: pure column expressions (md5/substr/concat — all
  * codegen'd), zero shuffles, embarrassingly parallel.
  */
object Fim {

  /** Adds `fim_text` (the possibly-reordered text) and `fim_applied`.
    * Split points are CHARACTER positions a ≤ b in [0, len]; prefix =
    * chars [1..a], middle = (a..b], suffix = (b..len]. Null, empty and
    * single-char documents always pass through unchanged.
    */
  def transform(df: DataFrame, idCol: String, textCol: String,
      fraction: Double = 0.5,
      prefixTok: String = "<fim_prefix>",
      middleTok: String = "<fim_middle>",
      suffixTok: String = "<fim_suffix>",
      salt: String = "fim"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1], got $fraction")
    def h(s: String): Column =
      conv(substring(md5(concat(lit(s), col(idCol).cast("string"))), 1, 8),
        16, 10).cast("bigint")
    val len = length(col(textCol))
    val applied = col(textCol).isNotNull && len > lit(1) &&
      h(s"$salt:apply") < lit((fraction * 4294967296.0).toLong)
    val p1 = h(s"$salt:p1") % (len + lit(1))
    val p2 = h(s"$salt:p2") % (len + lit(1))
    val a = least(p1, p2).cast("int")
    val b = greatest(p1, p2).cast("int")
    val reordered = concat(
      lit(prefixTok), col(textCol).substr(lit(1), a),
      lit(suffixTok), col(textCol).substr(b + lit(1), len - b),
      lit(middleTok), col(textCol).substr(a + lit(1), b - a))
    df.withColumn("fim_applied", coalesce(applied, lit(false)))
      .withColumn("fim_text",
        when(col("fim_applied"), reordered).otherwise(col(textCol)))
  }
}
