package newspipe.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Bronze ingest stage — ref 01_bronze_ingestion_news_articles.py:14-47.
  *
  * Input: NewsAPI-shaped rows (see [[newspipe.io.JsonSource]]) with STRING
  * `publishedAt`. Output: bronze frame with metadata columns and the
  * timestamp cast, ready for the lake append (ref 01:40-44).
  *
  * `ingestionTime` and `country` are injected by the caller rather than read
  * from the wall clock, keeping the stage a pure DataFrame => DataFrame
  * (deterministic, testable); the reference inlines
  * `datetime.now(timezone.utc).isoformat()` at 01:41.
  */
object Bronze {
  def transform(raw: DataFrame, ingestionTime: String, country: String): DataFrame =
    raw
      .withColumn("ingestion_time", lit(ingestionTime))
      .withColumn("country", lit(country))
      .withColumn("publishedAt", col("publishedAt").cast(TimestampType))
}
