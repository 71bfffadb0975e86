package newspipe.io

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** §2.1 S3-S7: lake writer/reader — append/overwrite modes, partitioned
  * layout, catalog publish — and the bronze-schema JSON source (S1-S2).
  */
class LakeSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpLake(): Lake = {
    val dir = Files.createTempDirectory("lake").toString
    new Lake(spark, LakeConfig(basePath = dir))
  }

  test("write/read round-trips a layer (ref _lib:21-54, 02:29)") {
    val lake = tmpLake()
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    lake.write(df, "bronze", mode = "overwrite")
    lake.read("bronze").as[(Int, String)].collect().sorted shouldBe
      Array((1, "a"), (2, "b"))
  }

  test("append mode accumulates; overwrite replaces (ref writer modes)") {
    val lake = tmpLake()
    val df = Seq((1, "a")).toDF("id", "v")
    lake.write(df, "layer", mode = "overwrite")
    lake.write(df, "layer", mode = "append")
    lake.read("layer").count() shouldBe 2
    lake.write(df, "layer", mode = "overwrite")
    lake.read("layer").count() shouldBe 1
  }

  test("partitionBy produces hive-style directories (ref 02:102 COUNTRY partitioning)") {
    val lake = tmpLake()
    val df = Seq(("x", "US"), ("y", "GB")).toDF("v", "COUNTRY")
    val path = lake.write(df, "silver", partitionBy = Seq("COUNTRY"), mode = "overwrite")
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("COUNTRY="))
    dirs.sorted shouldBe Array("COUNTRY=GB", "COUNTRY=US")
  }

  test("writeAndPublish registers a queryable catalog table (ref _lib:198-233)") {
    val lake = tmpLake()
    val df = Seq((1, "a")).toDF("id", "v")
    lake.writeAndPublish(df, "gold", "t_publish_spec", mode = "overwrite")
    spark.table("news_articles.t_publish_spec").count() shouldBe 1
    spark.sql("DROP TABLE news_articles.t_publish_spec")
  }

  test("publish lands in the REAL Hive metastore (ref S6: Hive catalog, not the in-memory stub)") {
    spark.conf.get("spark.sql.catalogImplementation") shouldBe "hive"
    val lake = tmpLake()
    lake.writeAndPublish(Seq((7, "h")).toDF("id", "v"), "gold", "t_hive_spec",
      mode = "overwrite")
    // the external (metastore-backed) catalog must know the table — this is
    // the API the reference's write_to_datalake_and_hive relies on
    spark.sharedState.externalCatalog
      .tableExists("news_articles", "t_hive_spec") shouldBe true
    val meta = spark.sharedState.externalCatalog
      .getTable("news_articles", "t_hive_spec")
    meta.provider shouldBe Some("parquet")
    spark.sql("DROP TABLE news_articles.t_hive_spec")
  }

  test("JsonSource reads with the EXPLICIT bronze schema — missing keys are null, not errors") {
    val df = JsonSource.fromJsonLines(spark, Seq(
      """{"title":"only title","url":"https://x.com/1"}"""))
    val row = df.select("title", "author", "source.name").head()
    row.getString(0) shouldBe "only title"
    row.isNullAt(1) shouldBe true
    df.schema.fieldNames should contain("publishedAt") // schema fixed, not inferred
  }
}
