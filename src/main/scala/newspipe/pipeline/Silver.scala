package newspipe.pipeline

import newspipe.dq.{DqConfig, DqResult, LegacyDq, NativeDq}
import newspipe.functions.{SentimentAnalyzer, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver stage — ref 02_silver_transformation_news_articles.py:12-105.
  * Flatten → DQ split → quarantine formatting → clean/enrich → rename.
  */
object Silver {

  /** Flatten the nested `source` struct if present (ref 02:32-33). */
  def flattenSource(df: DataFrame): DataFrame =
    if (df.columns.contains("source"))
      df.withColumn("source_name", col("source.name")).drop("source")
    else df

  /** DQ split. `legacy = true` reproduces the reference's join-based split
    * with its quirks (SURVEY.md §2.10 Q1-Q3); default is the one-pass native
    * checker. The caller decides whether to persist the input first; native
    * mode only ever scans it once anyway.
    */
  def dqSplit(df: DataFrame, config: DqConfig, legacy: Boolean = false,
      persistTagged: Boolean = false): DqResult =
    if (legacy) LegacyDq.run(df, config)
    else NativeDq.run(df, config, persistTagged)

  /** Quarantine formatting — ref 02:44-48: whole row as JSON payload +
    * reason + source table + ingestion timestamp. In native mode the per-row
    * `VIOLATIONS` array becomes the reason (the strictly-more-informative
    * joined-issues form of the inline variant, 02:265 and
    * docs/pipeline_overview.md:52); callers of the legacy path pass the
    * joined issue summary instead.
    */
  def toQuarantine(failed: DataFrame, sourceTable: String,
      ingestionTime: java.sql.Timestamp, reason: Option[String] = None): DataFrame = {
    val hasViolations = failed.columns.contains(NativeDq.ViolationsCol)
    val payloadCols = failed.columns.filterNot(_ == NativeDq.ViolationsCol)
    val reasonCol = reason.map(lit).getOrElse {
      if (hasViolations) array_join(col(NativeDq.ViolationsCol), "; ")
      else lit("Failed DQ checks") // ref 02:45 static-string form
    }
    failed
      .withColumn("payload", to_json(struct(payloadCols.map(col).toIndexedSeq: _*)))
      .withColumn("reason", reasonCol)
      .withColumn("source_table", lit(sourceTable))
      .withColumn("ingestion_time", lit(ingestionTime))
      .select("payload", "reason", "source_table", "ingestion_time")
  }

  /** The clean/enrich chain — ref 02:62-96, column for column:
    * dropna(title, publishedAt) → dropDuplicates(title, publishedAt, url,
    * author) → derive published_date/source/domain/char-count → strip HTML →
    * sentiment → upper(country) → 13-col projection → UPPER_SNAKE rename.
    *
    * Differences from the reference, all deliberate and plan-visible:
    * the two Python UDFs become a native regexp_replace (X1) and an in-JVM
    * Scala UDF (X2) — no Python-worker barrier, whole-stage codegen survives
    * everywhere except the single sentiment projection.
    */
  def transform(valid: DataFrame): DataFrame = {
    val cleaned = valid
      .na.drop(Seq("title", "publishedAt"))
      .dropDuplicates(Seq("title", "publishedAt", "url", "author"))
      .withColumn("published_date", to_date(col("publishedAt")))
      .withColumn("source", col("source_name"))
      .withColumn("title_lower", lower(col("title")))
      .withColumn("domain", TextFunctions.extractDomain(col("url")))
      .withColumn("content_word_count", TextFunctions.charCount(col("content")))
      .withColumn("description", TextFunctions.removeHtmlTags(col("description")))
      .withColumn("content", TextFunctions.removeHtmlTags(col("content")))
      .withColumn("sentiment", SentimentAnalyzer.sentiment(col("title")))
      .withColumn("sentiment_score", col("sentiment.polarity"))
      .withColumn("sentiment_label", col("sentiment.label"))
      .withColumn("country", upper(col("country")))
      .select("source", "author", "title", "description", "domain",
        "published_date", "content", "content_word_count", "sentiment_score",
        "sentiment_label", "ingestion_time", "country", "url")
    TextFunctions.toUpperSnakeColumns(cleaned)
  }

  /** Typed view of the silver frame (SURVEY.md §1: `Dataset[T]` at API
    * boundaries) — compile-time field access for downstream Scala consumers.
    */
  def transformTyped(valid: DataFrame): org.apache.spark.sql.Dataset[newspipe.model.SilverArticle] = {
    val spark = valid.sparkSession
    import spark.implicits._
    transform(valid).as[newspipe.model.SilverArticle]
  }

  /** Full bronze→silver: flatten, DQ, transform. Returns (silver, quarantine,
    * dqResult); callers that materialize both branches should call
    * `dqResult.release()` once their writes complete, or the persisted
    * DQ-tagged frame stays pinned in executor memory for the session lifetime.
    * Mirrors `process_bronze_to_silver` (02:12-105) minus the writes, which
    * belong to [[newspipe.io.Lake]] (silver is partitioned-overwritten by
    * COUNTRY at 02:102).
    */
  def process(bronze: DataFrame, config: DqConfig,
      quarantineTime: java.sql.Timestamp,
      legacyDq: Boolean = false): (DataFrame, Option[DataFrame], DqResult) = {
    val flat = flattenSource(bronze)
    // both branches are materialized by the caller's writes → cache the
    // tagged frame so the unique-key shuffle runs once (see NativeDq.run)
    val dq = dqSplit(flat, config, legacyDq, persistTagged = !legacyDq)
    val quarantine = dq.quarantined.map { bad =>
      val reason = if (legacyDq) Some(dq.issues().mkString("; ")) else None
      toQuarantine(bad, s"bronze.${config.table}", quarantineTime, reason)
    }
    (transform(dq.valid), quarantine, dq)
  }
}
