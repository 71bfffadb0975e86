package newspipe.io

import java.nio.file.Files

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** DEFAULT column values (`ALTER TABLE … ALTER COLUMN c SET/DROP
  * DEFAULT`, Delta/Spark 4's `DEFAULT expr` clause): fill-at-commit for
  * increments that omit the column, explicit values (including NULL)
  * win, MERGE INSERT fills unlisted default columns, DROP stops the
  * filling, and the declaration refusals.
  */
class LakeDefaultSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLake(): (String, Lake) = {
    val dir = Files.createTempDirectory("lakedef").toString
    (dir, new Lake(spark, LakeConfig(basePath = dir)))
  }

  test("fill on write/append when the column is omitted; explicit " +
      "values (and explicit NULLs) win") {
    val (_, lake) = freshLake()
    lake.setColumnDefault("t", "status", "'new'")
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "t")
    lake.read("t").select("status").as[String].head() shouldBe "new"
    // append WITH the column: values kept verbatim, nulls included
    lake.appendAtomic(Seq((2L, "b", "done"), (3L, "c", null))
      .toDF("id", "text", "status"), "t")
    // append WITHOUT the column again: filled
    lake.appendAtomic(Seq((4L, "d")).toDF("id", "text"), "t")
    lake.read("t").orderBy("id").select("id", "status")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))) shouldBe
      Array((1L, "new"), (2L, "done"), (3L, null), (4L, "new"))
  }

  test("DROP DEFAULT stops filling; existing values untouched") {
    val (_, lake) = freshLake()
    lake.setColumnDefault("t", "q", "CAST(7 AS BIGINT)")
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "t")
    lake.dropColumnDefault("t", "q")
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "text"), "t")
    lake.read("t").orderBy("id").select("q")
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)) shouldBe
      Array(7L, -1L)
  }

  test("mergeApply INSERT (cols): unlisted default columns fill, " +
      "unlisted no-default columns stay NULL") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "a", "old", 5L))
      .toDF("id", "text", "status", "v"), "t")
    lake.setColumnDefault("t", "status", "'inserted'")
    val src = Seq((2L, "b")).toDF("id", "text")
    lake.mergeApply("t", src, Seq("id"),
      notMatched = Seq(Lake.MergeClause(None, Lake.MergeInsert(
        Map("id" -> col("id"), "text" -> col("text"))))))
    val r2 = lake.read("t").filter($"id" === 2L)
      .select("status", "v").collect().head
    r2.getString(0) shouldBe "inserted"
    r2.isNullAt(1) shouldBe true
  }

  test("SQL surface: ALTER COLUMN SET DEFAULT / DROP DEFAULT; INSERT " +
      "oracle shape end-to-end") {
    val (dir, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "t")
    lake.addColumn("t", "status",
      org.apache.spark.sql.types.StringType)
    LakeSql.sql(spark,
      s"ALTER TABLE lake.`$dir`.t ALTER COLUMN status SET DEFAULT " +
        "'pending'").collect().head.getString(0) shouldBe "SET DEFAULT"
    lake.columnDefaults("t") shouldBe Map("status" -> "'pending'")
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "text"), "t")
    lake.read("t").orderBy("id").select("status")
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
      .toSeq shouldBe Seq(null, "pending") // old rows never rewrite
    LakeSql.sql(spark,
      s"ALTER TABLE lake.`$dir`.t ALTER COLUMN status DROP DEFAULT")
      .collect().head.getString(0) shouldBe "DROP DEFAULT"
    lake.columnDefaults("t") shouldBe Map.empty
  }

  test("catalog surface: CREATE TABLE (c T DEFAULT expr); INSERT with a " +
      "column list fills the default via Spark's own analysis") {
    val (dir, lake) = freshLake()
    spark.conf.set("spark.sql.catalog.lakedef", classOf[LakeCatalog].getName)
    spark.sql(s"CREATE TABLE lakedef.`$dir`.d " +
      "(id BIGINT, status STRING DEFAULT 'pending', n BIGINT DEFAULT 42)")
    lake.columnDefaults("d") shouldBe
      Map("status" -> "'pending'", "n" -> "42")
    // column-list INSERT: omitted default columns take their expression
    spark.sql(s"INSERT INTO lakedef.`$dir`.d (id) VALUES (1)")
    // full-row INSERT: explicit values win
    spark.sql(s"INSERT INTO lakedef.`$dir`.d VALUES (2, 'done', 7)")
    // the DEFAULT keyword resolves per column
    spark.sql(s"INSERT INTO lakedef.`$dir`.d VALUES (3, DEFAULT, DEFAULT)")
    lake.read("d").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))) shouldBe
      Array((1L, "pending", 42L), (2L, "done", 7L), (3L, "pending", 42L))
    // ALTER through the v2 catalog path (UpdateColumnDefaultValue)
    spark.sql(s"ALTER TABLE lakedef.`$dir`.d ALTER COLUMN status " +
      "SET DEFAULT 'queued'")
    lake.columnDefaults("d")("status") shouldBe "'queued'"
    spark.sql(s"INSERT INTO lakedef.`$dir`.d (id) VALUES (4)")
    lake.read("d").filter($"id" === 4L).select("status").as[String]
      .head() shouldBe "queued"
    spark.sql(s"ALTER TABLE lakedef.`$dir`.d ALTER COLUMN n DROP DEFAULT")
    lake.columnDefaults("d") shouldBe Map("status" -> "'queued'")
    // CREATE-time refusal: non-constant default fails the CREATE
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE lakedef.`$dir`.bad " +
        "(a BIGINT, b BIGINT DEFAULT a + 1)")
    }
    e.getMessage.toLowerCase should include("default")
  }

  test("refusals: non-constant expression, generated/identity overlap, " +
      "unknown column on a committed layer") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((1L, 2L)).toDF("id", "v"), "t")
    intercept[IllegalArgumentException] {
      lake.setColumnDefault("t", "v", "id + 1")
    }.getMessage should include("constant")
    intercept[IllegalArgumentException] {
      lake.setColumnDefault("t", "nope", "1")
    }.getMessage should include("no column")
    val (_, lake2) = freshLake()
    lake2.addIdentityColumn("g", "rid")
    intercept[IllegalArgumentException] {
      lake2.setColumnDefault("g", "rid", "1")
    }.getMessage should include("IDENTITY")
    lake2.addGeneratedColumn("g", "d", "cast(ts as date)")
    intercept[IllegalArgumentException] {
      lake2.setColumnDefault("g", "d", "date'2020-01-01'")
    }.getMessage should include("GENERATED")
  }

  test("DROP COLUMN takes the DEFAULT with it — the next append must " +
      "not resurrect the dropped column") {
    val (_, lake) = freshLake()
    lake.setColumnDefault("t", "status", "'new'")
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "t")
    lake.setProperties("t", Map("lake.columnMapping.mode" -> "name"))
    lake.dropColumn("t", "status")
    lake.columnDefaults("t") shouldBe empty
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "text"), "t")
    lake.read("t").columns.sorted shouldBe Array("id", "text")
    // compact (prearranged writeAtomic path) must not resurrect either
    lake.compact("t")
    lake.read("t").columns.sorted shouldBe Array("id", "text")
  }

  test("RENAME COLUMN re-keys the DEFAULT — fills under the new name, " +
      "never re-adds the old one") {
    val (_, lake) = freshLake()
    lake.setColumnDefault("t", "status", "'new'")
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "t")
    lake.setProperties("t", Map("lake.columnMapping.mode" -> "name"))
    lake.renameColumn("t", "status", "state")
    lake.columnDefaults("t") shouldBe Map("state" -> "'new'")
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "text"), "t")
    lake.read("t").columns.sorted shouldBe Array("id", "state", "text")
    lake.read("t").orderBy("id").select("state").as[String]
      .collect() shouldBe Array("new", "new")
  }
}
