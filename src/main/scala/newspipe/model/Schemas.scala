package newspipe.model

import org.apache.spark.sql.types._

/** Schemas for the news-article medallion pipeline.
  *
  * Mirrors the reference's declared data model
  * (notebooks/01_bronze_ingestion_news_articles.py:26-35 — hand-written bronze
  * StructType; notebooks/02_silver_transformation_news_articles.py:78-96 — silver
  * projection; notebooks/03_gold_modeling_news_articles.py:36-77 — star schema),
  * re-expressed as Scala constants + case classes with Encoders for typed tests.
  */
object Schemas {

  /** Bronze: NewsAPI article shape + ingest metadata.
    * Ref: 01_bronze_ingestion_news_articles.py:26-35 (schema), :40-44 (metadata cols).
    */
  val bronze: StructType = StructType(Seq(
    StructField("source", StructType(Seq(StructField("name", StringType)))),
    StructField("author", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("url", StringType),
    StructField("urlToImage", StringType),
    StructField("publishedAt", TimestampType), // cast from STRING at ingest (01:43)
    StructField("content", StringType),
    StructField("ingestion_time", StringType), // ISO-8601 literal (01:41)
    StructField("country", StringType)         // literal (01:42)
  ))

  /** Raw JSON shape before the publishedAt cast — used when reading fixture JSON. */
  val bronzeRaw: StructType = StructType(
    bronze.fields.map {
      case f if f.name == "publishedAt" => f.copy(dataType = StringType)
      case f => f
    }
  )

  /** Silver: 13 columns, UPPER_SNAKE names.
    * Ref: 02:78-92 (projection) + _lib_dq_helpers.py:68-72 (rename).
    * CONTENT_WORD_COUNT is a CHARACTER count — reference misnomer preserved (02:71).
    */
  val silver: StructType = StructType(Seq(
    StructField("SOURCE", StringType),
    StructField("AUTHOR", StringType),
    StructField("TITLE", StringType),
    StructField("DESCRIPTION", StringType),
    StructField("DOMAIN", StringType),
    StructField("PUBLISHED_DATE", DateType),
    StructField("CONTENT", StringType),
    StructField("CONTENT_WORD_COUNT", IntegerType),
    StructField("SENTIMENT_SCORE", FloatType),
    StructField("SENTIMENT_LABEL", StringType),
    StructField("INGESTION_TIME", StringType),
    StructField("COUNTRY", StringType),
    StructField("URL", StringType)
  ))

  /** Quarantine: full failed row serialized as JSON + audit metadata.
    * Ref: 02:44-48.
    */
  val quarantine: StructType = StructType(Seq(
    StructField("payload", StringType),
    StructField("reason", StringType),
    StructField("source_table", StringType),
    StructField("ingestion_time", TimestampType)
  ))

  /** Gold fact table: 14 columns. Ref: 03:62-77. */
  val factNewsArticles: StructType = StructType(Seq(
    StructField("ARTICLE_ID", StringType),
    StructField("SOURCE_ID", StringType),
    StructField("AUTHOR_ID", StringType),
    StructField("DOMAIN", StringType),
    StructField("COUNTRY", StringType),
    StructField("PUBLISHED_DATE", DateType),
    StructField("INGESTION_TIME", DateType), // to_date at 03:53
    StructField("SENTIMENT_SCORE", FloatType),
    StructField("SENTIMENT_LABEL", StringType),
    StructField("CONTENT_WORD_COUNT", IntegerType),
    StructField("TITLE", StringType),
    StructField("DESCRIPTION", StringType),
    StructField("CONTENT", StringType),
    StructField("URL", StringType)
  ))
}

/** Nested source struct (ref 01:27). */
final case class SourceRef(name: Option[String])

/** Bronze article row (ref 01:26-35, metadata 01:40-44). */
final case class Article(
    source: Option[SourceRef],
    author: Option[String],
    title: Option[String],
    description: Option[String],
    url: Option[String],
    urlToImage: Option[String],
    publishedAt: Option[java.sql.Timestamp],
    content: Option[String],
    ingestion_time: Option[String],
    country: Option[String]
)

/** Sentiment UDF result (ref _lib_dq_helpers.py:84-95). */
final case class Sentiment(polarity: Option[Float], label: Option[String])

/** Silver article row (ref 02:78-96). */
final case class SilverArticle(
    SOURCE: Option[String],
    AUTHOR: Option[String],
    TITLE: Option[String],
    DESCRIPTION: Option[String],
    DOMAIN: Option[String],
    PUBLISHED_DATE: Option[java.sql.Date],
    CONTENT: Option[String],
    CONTENT_WORD_COUNT: Option[Int],
    SENTIMENT_SCORE: Option[Float],
    SENTIMENT_LABEL: Option[String],
    INGESTION_TIME: Option[String],
    COUNTRY: Option[String],
    URL: Option[String]
)

/** Quarantine record (ref 02:44-48). */
final case class QuarantineRecord(
    payload: String,
    reason: String,
    source_table: String,
    ingestion_time: java.sql.Timestamp
)
