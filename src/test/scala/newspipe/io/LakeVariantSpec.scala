package newspipe.io

import java.nio.file.Files

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** VARIANT metadata columns (Spark 4's `VariantType`,
  * `parse_json`/`variant_get`) through the lake write/read/row-op path —
  * the semi-structured per-document metadata an LLM pipeline carries.
  * Stats limit, documented: the footer reader keys top-level ATOMIC
  * parquet columns only, and parquet stores a variant as a
  * (metadata, value) binary group — variant columns contribute no
  * min/max pruning; predicates over `variant_get` still execute exactly,
  * and sibling scalar columns keep pruning the files.
  */
class LakeVariantSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLake(): (String, Lake) = {
    val dir = Files.createTempDirectory("lakevar").toString
    (dir, new Lake(spark, LakeConfig(basePath = dir)))
  }

  private def docs = Seq(
    (1L, """{"lang":"en","score":7,"tags":["a","b"]}"""),
    (2L, """{"lang":"de","score":3,"tags":[]}"""),
    (3L, """{"lang":"en","score":9,"nested":{"k":true}}"""))
    .toDF("id", "meta_json")
    .select($"id", expr("parse_json(meta_json)").as("meta"))

  test("variant round-trips through writeAtomic/read; schema records " +
      "VARIANT; variant_get extracts typed fields") {
    val (_, lake) = freshLake()
    lake.writeAtomic(docs, "t")
    lake.layerSchema("t")("meta").dataType shouldBe
      org.apache.spark.sql.types.VariantType
    val out = lake.read("t")
      .select($"id",
        expr("variant_get(meta, '$.lang', 'string')").as("lang"),
        expr("variant_get(meta, '$.score', 'bigint')").as("score"),
        expr("try_variant_get(meta, '$.nested.k', 'boolean')").as("k"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else Boolean.box(r.getBoolean(3))))
    out shouldBe Array((1L, "en", 7L, null), (2L, "de", 3L, null),
      (3L, "en", 9L, Boolean.box(true)))
  }

  test("appends and row ops carry variant columns; predicates over " +
      "variant_get execute exactly") {
    val (_, lake) = freshLake()
    lake.writeAtomic(docs, "t")
    lake.appendAtomic(Seq((4L, """{"lang":"fr","score":1}"""))
      .toDF("id", "meta_json")
      .select($"id", expr("parse_json(meta_json)").as("meta")), "t")
    lake.read("t").count() shouldBe 4L
    // delete WHERE over an extracted field
    lake.deleteWhere("t",
      expr("variant_get(meta, '$.score', 'bigint')") < 5L)
    lake.read("t").select("id").as[Long].collect().sorted shouldBe
      Array(1L, 3L)
    // update keeps the variant intact on carried rows
    lake.updateWhere("t", $"id" === 1L, Map("id" -> lit(10L)))
    lake.read("t")
      .select(expr("variant_get(meta, '$.score', 'bigint')")).as[Long]
      .collect().sorted shouldBe Array(7L, 9L)
  }

  test("sibling scalar columns still stats-prune on a variant-carrying " +
      "layer (variant itself contributes no stats — documented)") {
    val (_, lake) = freshLake()
    val wide = spark.range(200).select($"id",
      expr("parse_json(concat('{\"v\":', id, '}'))").as("meta"))
      .repartitionByRange(4, $"id")
    lake.writeAtomic(wide, "t")
    val info = lake.pruneInfo("t", col("id") === 5L).get
    info.totalFiles shouldBe 4
    info.keptFiles should be < 4
  }

  test("catalog DDL surface: CREATE TABLE … (meta VARIANT), INSERT with " +
      "parse_json, variant_get in SQL") {
    val (dir, lake) = freshLake()
    spark.conf.set("spark.sql.catalog.lakevar", classOf[LakeCatalog].getName)
    spark.sql(s"CREATE TABLE lakevar.`$dir`.d (id BIGINT, meta VARIANT)")
    lake.layerSchema("d")("meta").dataType shouldBe
      org.apache.spark.sql.types.VariantType
    spark.sql(s"INSERT INTO lakevar.`$dir`.d SELECT 1L, " +
      """parse_json('{"k":"a","v":10}')""")
    spark.sql(s"INSERT INTO lakevar.`$dir`.d SELECT 2L, " +
      """parse_json('{"k":"b","v":20}')""")
    spark.sql(
      s"""SELECT id, variant_get(meta, '$$.k', 'string') AS k,
         |       variant_get(meta, '$$.v', 'bigint') AS v
         |FROM lakevar.`$dir`.d ORDER BY id""".stripMargin)
      .as[(Long, String, Long)].collect() shouldBe
      Array((1L, "a", 10L), (2L, "b", 20L))
  }

  test("time travel and CDF serve variant rows") {
    val (_, lake) = freshLake()
    lake.writeAtomic(docs, "t")
    val v1 = lake.listVersions("t").head
    lake.deleteWhere("t",
      expr("variant_get(meta, '$.lang', 'string')") === "de")
    lake.readVersion("t", v1).count() shouldBe 3L
    val head = lake.listVersions("t").head
    val (ins, del) = lake.diff("t", v1, head)
    ins.count() shouldBe 0L
    del.select($"id").as[Long].collect() shouldBe Array(2L)
  }

  test("diff over a variant NESTED in a struct refuses loudly (no " +
      "opaque set-operation analysis error)") {
    val (_, lake) = freshLake()
    val nested = Seq((1L, """{"k":1}"""), (2L, """{"k":2}"""))
      .toDF("id", "j")
      .select($"id", struct(expr("parse_json(j)").as("v")).as("wrap"))
    lake.writeAtomic(nested, "t")
    val v1 = lake.listVersions("t").head
    lake.deleteWhere("t", $"id" === 2L)
    val head = lake.listVersions("t").head
    val e = intercept[IllegalArgumentException] {
      val (ins, del) = lake.diff("t", v1, head)
      ins.count(); del.count()
    }
    e.getMessage should include("nest VARIANT")
  }
}
