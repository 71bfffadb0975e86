package newspipe.io

import newspipe.SparkTestBase
import java.nio.file.Files

/** §2.1 S1 scale path: the partitioned DataSourceV2 article source — one
  * partition per page, executor-side parse, fixed declared schema.
  */
class NewsSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def writeFixtures(nPages: Int): String = {
    val dir = Files.createTempDirectory("newsapi").toString
    (1 to nPages).foreach { p =>
      val arts = (1 to 3).map { i =>
        s"""{"source":{"name":"S$p"},"author":"a$p$i","title":"t$p$i",
           |"url":"https://x.com/$p/$i","publishedAt":"2026-01-0${p}T00:00:00Z"}"""
          .stripMargin.replace("\n", "")
      }.mkString(",")
      Files.writeString(java.nio.file.Paths.get(dir, s"page-$p.json"),
        s"""{"status":"ok","articles":[$arts]}""")
    }
    dir
  }

  private def readPages(dir: String, pages: Int) =
    spark.read.format("newspipe.io.source.NewsSource")
      .option("pages", pages.toString)
      .option("fixtureDir", dir)
      .load()

  test("one partition per page, rows from every page") {
    val df = readPages(writeFixtures(4), 4)
    df.rdd.getNumPartitions shouldBe 4
    df.count() shouldBe 12
    df.select("page").distinct().as[Int].collect().sorted shouldBe Array(1, 2, 3, 4)
  }

  test("fixed bronze schema; missing keys are null, not errors") {
    val df = readPages(writeFixtures(1), 1)
    df.schema.fieldNames.take(10) shouldBe newspipe.model.Schemas.bronzeRaw.fieldNames
    val row = df.select("source.name", "title", "description", "content").head()
    row.getString(0) shouldBe "S1"
    row.getString(1) shouldBe "t11"
    row.isNullAt(2) shouldBe true // description absent in fixture
    row.isNullAt(3) shouldBe true
  }

  test("missing page file yields an empty page, not a failure") {
    val dir = writeFixtures(2)
    readPages(dir, 5).count() shouldBe 6 // pages 3-5 empty
  }

  test("source feeds the real bronze→silver pipeline") {
    val df = readPages(writeFixtures(2), 2).drop("page")
    val bronze = newspipe.pipeline.Bronze.transform(df, "2026-01-05T00:00:00Z", "us")
    val (silver, _, _) = newspipe.pipeline.Silver.process(
      bronze, newspipe.dq.DqConfig.newsArticles,
      java.sql.Timestamp.valueOf("2026-01-05 00:00:00"))
    silver.count() shouldBe 6
  }

  test("RawLanding.put writes the replay copy (S8)") {
    val dir = Files.createTempDirectory("landing").toString
    val p = RawLanding.put(dir, "page-1.json", """{"articles":[]}""")
    Files.readString(p) shouldBe """{"articles":[]}"""
  }
}
