package newspipe.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (extension track,
  * SURVEY.md §7): token counting, quality scoring, language ID, document
  * fingerprinting. All hot paths are native column expressions (codegen);
  * the only UDF is the rolling-hash fingerprint kernel.
  */
object TextStats {

  // ---- token counting ------------------------------------------------------

  /** Whitespace token count; blank/null-safe (empty → 0). */
  def wordCount(text: Column): Column =
    when(text.isNull, lit(null))
      .otherwise(size(filter(split(text, "\\s+"), t => length(t) > 0)))

  /** BPE-ish token count: counts matches of a GPT-2-style pre-tokenizer
    * regex (word pieces, numbers, punctuation runs, whitespace collapsed).
    * An approximation of LLM token cost that needs no vocabulary.
    */
  val BpeishPattern = "'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^\\sa-zA-Z0-9]+"
  def bpeishTokenCount(text: Column): Column =
    when(text.isNull, lit(null))
      .otherwise(size(regexp_extract_all(text, lit(BpeishPattern), lit(0))))

  // ---- quality scoring -----------------------------------------------------

  /** Fraction of characters that are punctuation/symbols (0 for empty). */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    val punct = len - length(regexp_replace(text, "[^\\p{L}\\p{N}\\s]", ""))
    when(text.isNull, lit(null))
      .otherwise(when(len === 0, 0.0).otherwise(punct.cast("double") / len))
  }

  /** English stopwords used by the quality heuristics + language ID. */
  val EnStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it", "that", "was", "for", "on", "are", "as", "with",
    "at", "by", "this", "be", "from", "not", "but", "they", "his", "her")

  /** Fraction of tokens that are (English) stopwords — prose tends to
    * 0.2-0.5; keyword spam and tables tend to ~0.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val toks = Dedup.tokens(text)
    val hits = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
    when(text.isNull, lit(null))
      .otherwise(when(size(toks) === 0, 0.0)
        .otherwise(hits.cast("double") / size(toks)))
  }

  /** Mean token length (0 for empty). */
  def avgWordLen(text: Column): Column = {
    val toks = Dedup.tokens(text)
    when(text.isNull, lit(null))
      .otherwise(when(size(toks) === 0, 0.0)
        .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t))
          .cast("double") / size(toks)))
  }

  /** Composite quality score in [0, 1]: length band + stopword band +
    * punctuation band + word-length band (a Gopher-rules-style heuristic,
    * weights documented, deterministic).
    */
  def qualityScore(text: Column): Column = {
    val wc = wordCount(text)
    val lenOk = when(wc.between(10, 10000), 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) >= 0.05, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) <= 0.3, 1.0).otherwise(0.0)
    val awl = avgWordLen(text)
    val awlOk = when(awl.between(2.0, 12.0), 1.0).otherwise(0.0)
    when(text.isNull, lit(null))
      .otherwise((lenOk * 0.3 + stopOk * 0.3 + punctOk * 0.2 + awlOk * 0.2))
  }

  // ---- language ID ---------------------------------------------------------

  /** Tiny per-language function-word profiles (public common words). The
    * heuristic: score = fraction of tokens hitting each profile; argmax
    * wins, "und" (undetermined) if nothing hits. Real corpora want a real
    * n-gram model; the operator shape (per-row scoring, no shuffle) is
    * identical.
    */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em", "um", "para"),
    "it" -> Seq("il", "di", "che", "e", "la", "per", "un", "in", "del", "una"))

  /** Predicted language code, or "und". Per-row argmax over profile-hit
    * fractions — pure column expressions, no shuffle, no UDF.
    */
  def langId(text: Column): Column = {
    val toks = Dedup.tokens(text)
    val n = size(toks)
    val scored = LangProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        (size(filter(toks, t => t.isin(words.map(lit): _*))).cast("double") /
          when(n === 0, 1).otherwise(n)).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(text.isNull, lit(null))
      .otherwise(when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(lit("und")))
  }

  // ---- fingerprinting ------------------------------------------------------

  /** Content fingerprint: md5 of whitespace/case-normalized text — the
    * join-key form of exact near-identity (native, codegen).
    */
  def normalizedFingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** 64-bit rolling polynomial hash (Rabin-Karp, base 257, mod 2^64) over
    * the normalized text — order-sensitive, cheap to compute incrementally;
    * the scalar kernel is an in-JVM UDF.
    */
  private val rollingUdf = udf { s: String =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else {
      val norm = s.trim.toLowerCase.replaceAll("\\s+", " ")
      var h = 0L
      var i = 0
      while (i < norm.length) { h = h * 257L + norm.charAt(i); i += 1 }
      java.lang.Long.valueOf(h)
    }
  }
  def rollingFingerprint(text: Column): Column = rollingUdf(text)
}
