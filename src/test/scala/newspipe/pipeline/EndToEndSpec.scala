package newspipe.pipeline

import newspipe.SparkTestBase
import newspipe.io.LakeConfig
import java.nio.file.Files

/** §3 E1-E3 as one runnable flow: JSON in, star schema + quarantine on disk. */
class EndToEndSpec extends SparkTestBase {
  import spark.implicits._

  /** Latest committed snapshot dir of an atomically-written layer. */
  private def latestSnapshot(layerPath: String): java.io.File =
    new java.io.File(s"$layerPath/_v").listFiles()
      .filter(d => new java.io.File(d, "_COMMITTED").exists())
      .maxBy(_.getName)

  private val fixtures = Seq(
    """{"source":{"name":"BBC"},"author":"Alice","title":"Excellent results","description":"d","url":"https://bbc.co.uk/1","publishedAt":"2026-01-02T10:00:00Z","content":"c"}""",
    """{"source":{"name":"CNN"},"author":"Bob","title":null,"description":"bad","url":"https://cnn.com/2","publishedAt":"2026-01-02T11:00:00Z","content":"c"}""",
    """{"source":{"name":"CNN"},"author":"Cara","title":"Committee meets","description":"d","url":"https://cnn.com/3","publishedAt":"2026-01-03T09:00:00Z","content":"c"}"""
  )

  test("Pipeline.run lands every layer with consistent counts") {
    val base = Files.createTempDirectory("e2e").toString
    val result = Pipeline.run(spark, fixtures,
      Pipeline.Config(LakeConfig(base), keyMode = "md5"),
      now = java.time.Instant.parse("2026-01-05T00:00:00Z"))

    result.bronzeRows shouldBe 3
    result.quarantineRows shouldBe 1 // null title
    result.silverRows shouldBe 2
    result.factRows shouldBe 2
    result.dimSourceRows shouldBe 2 // BBC, CNN

    // layers exist on disk; silver's committed snapshot is COUNTRY-partitioned
    val lake = new newspipe.io.Lake(spark, LakeConfig(base))
    latestSnapshot(s"$base/silver").listFiles()
      .map(_.getName).exists(_.startsWith("COUNTRY=")) shouldBe true
    lake.read("gold/fact_news_articles").count() shouldBe 2
    // dim_date spans the fact's published dates (2026-01-02 .. 2026-01-03)
    val dimDate = lake.read("gold/dim_date")
    dimDate.count() shouldBe 2
    dimDate.select("DATE_ID").as[String].collect().sorted shouldBe
      Array("20260102", "20260103")
    // raw landing replay copy present
    new java.io.File(s"$base/raw").listFiles().length shouldBe 1
  }

  test("Pipeline.run does not re-run the silver→gold build for Result counts") {
    // Count Spark jobs across a full run: the Result counts and the
    // dim_date span must come from the written parquet layers, not from
    // re-executing the gold lineage. A recompute shows up as extra jobs
    // (each ds/da/fact count used to replay silver→gold). The ceiling has
    // headroom over the measured count so it only trips on a reintroduced
    // full-pipeline replay, not on minor planning changes.
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val base = Files.createTempDirectory("e2ejobs").toString
    spark.sparkContext.addSparkListener(listener)
    try {
      Pipeline.run(spark, fixtures,
        Pipeline.Config(LakeConfig(base), keyMode = "md5"),
        now = java.time.Instant.parse("2026-01-05T00:00:00Z"))
      // listener delivery is async — drain the bus deterministically (a
      // fixed sleep fails OPEN under load: late events are never counted)
      org.apache.spark.NewspipeTestBridge.waitListenerBusEmpty(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    // measured: 36 jobs with layer-read counts, 43 with the old
    // recompute-the-lineage counts — the ceiling separates the two
    assert(jobs.get() <= 40, s"Pipeline.run launched ${jobs.get()} jobs — " +
      "a jump here means Result counts are recomputing the gold lineage again")
  }

  test("re-running with a new page appends bronze and rebuilds silver/gold (ref modes)") {
    val base = Files.createTempDirectory("e2e2").toString
    val cfg = Pipeline.Config(LakeConfig(base), keyMode = "md5")
    Pipeline.run(spark, fixtures, cfg,
      java.time.Instant.parse("2026-01-05T00:00:00Z"))
    val page2 = Seq(
      """{"source":{"name":"Reuters"},"author":"Eve","title":"New story","description":"d","url":"https://reuters.com/9","publishedAt":"2026-01-06T08:00:00Z","content":"c"}""")
    val second = Pipeline.run(spark, page2, cfg,
      java.time.Instant.parse("2026-01-06T00:00:00Z"))
    second.bronzeRows shouldBe 1 // this run's page
    spark.read.parquet(s"$base/bronze").count() shouldBe 4 // layer appends
    // silver rebuilds from the WHOLE layer (ref 02:29): 4 rows − 1 bad title
    second.silverRows shouldBe 3
    // the bad row is re-quarantined on the second full-layer pass (appended)
    spark.read.parquet(s"$base/quarantine").count() shouldBe 2
    val lake = new newspipe.io.Lake(spark, LakeConfig(base))
    lake.read("gold/fact_news_articles").count() shouldBe 3
    // the first run's silver snapshot is still on disk (both committed)
    new java.io.File(s"$base/silver/_v").listFiles()
      .count(d => new java.io.File(d, "_COMMITTED").exists()) shouldBe 2
  }
}
