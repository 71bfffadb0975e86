package newspipe.pipeline

import newspipe.SparkTestBase
import newspipe.dq.DqConfig
import newspipe.io.JsonSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, FloatType, IntegerType}

/** §3 E1-E3: fixture JSON → bronze → DQ → silver → gold, end to end, with
  * golden assertions on the star schema and the three analytic models.
  */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val fixtures = Seq(
    """{"source":{"name":"BBC"},"author":"Alice","title":"Markets rally on excellent results","description":"<p>Stocks <b>up</b></p>","url":"https://www.bbc.co.uk/1","urlToImage":null,"publishedAt":"2026-01-02T10:00:00Z","content":"<div>Long content here</div>"}""",
    """{"source":{"name":"BBC"},"author":"Bob","title":"Storm causes terrible damage","description":"d2","url":"https://bbc.co.uk/2","urlToImage":null,"publishedAt":"2026-01-02T11:00:00Z","content":"c2"}""",
    """{"source":{"name":"CNN"},"author":"Alice","title":"Committee meets Tuesday","description":"d3","url":"https://edition.cnn.com/3","urlToImage":null,"publishedAt":"2026-01-03T09:00:00Z","content":"c3"}""",
    """{"source":{"name":"CNN"},"author":null,"title":null,"description":"bad row","url":"https://edition.cnn.com/4","urlToImage":null,"publishedAt":"2026-01-03T09:30:00Z","content":"c4"}""",
    """{"source":{"name":"Reuters"},"author":"Eve","title":"Dup url story","description":"d5","url":"https://reuters.com/5","urlToImage":null,"publishedAt":"2026-01-04T08:00:00Z","content":"c5"}""",
    """{"source":{"name":"Reuters"},"author":"Eve2","title":"Dup url story again","description":"d6","url":"https://reuters.com/5","urlToImage":null,"publishedAt":"2026-01-04T08:30:00Z","content":"c6"}"""
  )

  private lazy val bronze = Bronze.transform(
    JsonSource.fromJsonLines(spark, fixtures),
    ingestionTime = "2026-01-05T00:00:00Z", country = "us")

  private lazy val (silver, quarantine, _) = Silver.process(
    bronze, DqConfig.newsArticles,
    quarantineTime = java.sql.Timestamp.valueOf("2026-01-05 00:00:00"))

  test("bronze: metadata columns + timestamp cast (ref 01:40-44)") {
    bronze.schema("publishedAt").dataType.typeName shouldBe "timestamp"
    bronze.select("country").distinct().as[String].collect() shouldBe Array("us")
  }

  test("silver: 13 UPPER_SNAKE columns with the declared types (ref 02:78-96)") {
    silver.columns shouldBe Array("SOURCE", "AUTHOR", "TITLE", "DESCRIPTION",
      "DOMAIN", "PUBLISHED_DATE", "CONTENT", "CONTENT_WORD_COUNT",
      "SENTIMENT_SCORE", "SENTIMENT_LABEL", "INGESTION_TIME", "COUNTRY", "URL")
    silver.schema("PUBLISHED_DATE").dataType shouldBe DateType
    silver.schema("SENTIMENT_SCORE").dataType shouldBe FloatType
    silver.schema("CONTENT_WORD_COUNT").dataType shouldBe IntegerType
  }

  test("silver: DQ removed the null-title row and both dup-url rows") {
    val urls = silver.select("URL").as[String].collect().sorted
    urls shouldBe Array("https://bbc.co.uk/2", "https://edition.cnn.com/3",
      "https://www.bbc.co.uk/1")
  }

  test("silver: quarantine carries payload + per-row reasons (ref 02:44-48)") {
    val q = quarantine.get
    q.columns shouldBe Array("payload", "reason", "source_table", "ingestion_time")
    val reasons = q.select("reason").as[String].collect()
    reasons.count(_.contains("null_or_empty_column:title")) shouldBe 1
    reasons.count(_.contains("duplicate_key:url")) shouldBe 2
    // payload round-trips to the original url
    val urls = q.select(get_json_object($"payload", "$.url").as("u"))
      .as[String].collect().sorted
    urls shouldBe Array("https://edition.cnn.com/4",
      "https://reuters.com/5", "https://reuters.com/5")
  }

  test("silver: enrichment values — domain, HTML strip, char count, sentiment label") {
    val row = silver.filter($"URL" === "https://www.bbc.co.uk/1")
      .select("DOMAIN", "DESCRIPTION", "CONTENT", "CONTENT_WORD_COUNT", "SENTIMENT_LABEL")
      .head()
    row.getString(0) shouldBe "bbc.co.uk"
    row.getString(1) shouldBe "Stocks up"
    row.getString(2) shouldBe "Long content here"
    // char count runs on the ORIGINAL content (pre-strip, ref 02:71 order):
    row.getInt(3) shouldBe "<div>Long content here</div>".length
    row.getString(4) shouldBe "positive"
  }

  test("silver: typed Dataset[SilverArticle] boundary round-trips the frame") {
    val flat = Silver.flattenSource(bronze)
    val valid = Silver.dqSplit(flat, newspipe.dq.DqConfig.newsArticles).valid
    val typed = Silver.transformTyped(valid)
    typed.count() shouldBe silver.count()
    val a = typed.collect().minBy(_.URL)
    a.DOMAIN shouldBe Some("bbc.co.uk")
    a.SENTIMENT_LABEL shouldBe Some("negative")
  }

  test("gold: dims are distinct naturals with surrogate ids (ref 03:36-44)") {
    val (ds, da, _) = Gold.build(silver)
    ds.columns shouldBe Array("SOURCE", "SOURCE_ID")
    ds.count() shouldBe 2 // BBC, CNN
    da.select("AUTHOR").as[String].collect().sorted shouldBe Array("Alice", "Bob")
  }

  test("gold: fact has the 14 declared columns and one row per silver row (ref 03:62-77)") {
    val (_, _, fact) = Gold.build(silver)
    fact.columns shouldBe Array("ARTICLE_ID", "SOURCE_ID", "AUTHOR_ID", "DOMAIN",
      "COUNTRY", "PUBLISHED_DATE", "INGESTION_TIME", "SENTIMENT_SCORE",
      "SENTIMENT_LABEL", "CONTENT_WORD_COUNT", "TITLE", "DESCRIPTION",
      "CONTENT", "URL")
    fact.count() shouldBe silver.count()
    fact.select("ARTICLE_ID").distinct().count() shouldBe silver.count()
  }

  test("gold: md5 key mode produces stable content-addressed ids") {
    val (_, _, f1) = Gold.build(silver, keyMode = "md5")
    val (_, _, f2) = Gold.build(silver, keyMode = "md5")
    f1.select("URL", "ARTICLE_ID").as[(String, String)].collect().sorted shouldBe
      f2.select("URL", "ARTICLE_ID").as[(String, String)].collect().sorted
  }

  test("gold analytics: sentiment trends golden rows (ref 03:140-146)") {
    val rows = Gold.sentimentTrends(silver)
      .select(date_format($"PUBLISHED_DATE", "yyyy-MM-dd"), $"SENTIMENT_LABEL", $"count")
      .as[(String, String, Long)].collect()
    rows shouldBe Array(
      ("2026-01-02", "negative", 1L),
      ("2026-01-02", "positive", 1L),
      ("2026-01-03", "neutral", 1L))
  }

  test("gold analytics: top publishers and country distribution (ref 03:131-153)") {
    Gold.topPublishers(silver).as[(String, Long)].collect() shouldBe
      Array(("BBC", 2L), ("CNN", 1L))
    Gold.countryDistribution(silver).as[(String, Long)].collect() shouldBe
      Array(("US", 3L))
  }

  test("gold: dim_date generator fills the reference's advertised-but-missing table") {
    val dd = Gold.dimDate(spark, "2026-01-01", "2026-01-31")
    dd.count() shouldBe 31
    dd.filter($"DATE_ID" === "20260115")
      .select("YEAR", "MONTH", "DAY").as[(Int, Int, Int)].head() shouldBe ((2026, 1, 15))
  }
}
