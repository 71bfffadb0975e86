package newspipe.io

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Deletion vectors: delete-without-rewrite semantics and their interplay
  * with every other protocol op (reads, skipping, row-op rewrites,
  * compaction, diff/CDF, restore, vacuum).
  */
class LakeDvSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpLake(): Lake = {
    val lake = new Lake(spark,
      LakeConfig(basePath = Files.createTempDirectory("lake_dv").toString))
    // 4 files with disjoint id ranges (0-99, 100-199, 200-299, 300-399)
    val df = spark.range(0, 400).select(
      col("id"),
      (col("id") % 7).cast("double").as("score"),
      concat(lit("doc_"), format_string("%03d", col("id"))).as("name"))
    lake.writeAtomic(df.repartitionByRange(4, col("id"))
      .sortWithinPartitions("id"), "docs")
    lake
  }

  test("deleteWhereDv: zero file rewrites, every read path excludes dead rows") {
    val lake = tmpLake()
    val r = lake.deleteWhereDv("docs", col("id") % 100 === 5) // 5,105,205,305
    r.rewrittenFiles shouldBe 0
    r.carriedFiles shouldBe 4
    r.noop shouldBe false
    lake.deletionVectors("docs").size shouldBe 4 // one entry per file
    val out = lake.read("docs")
    out.count() shouldBe 396
    out.filter(col("id") % 100 === 5).count() shouldBe 0
    // filtered read paths agree (readWhere prunes + filters through DVs)
    lake.readWhere("docs", col("id") < 100).count() shouldBe 99
    lake.read("docs").filter(col("id").between(200, 299))
      .count() shouldBe 99
    // NULL-predicate rows survive (same SQL semantics as deleteWhere)
    val r2 = lake.deleteWhereDv("docs",
      when(col("id") === 7, lit(null).cast("boolean")).otherwise(col("id") === 8))
    lake.read("docs").filter(col("id").isin(7, 8)).select("id")
      .as[Long].collect() shouldBe Array(7L)
  }

  test("cumulative DVs: a second delete unions positions, one payload per file") {
    val lake = tmpLake()
    lake.deleteWhereDv("docs", col("id") === 5)
    lake.deleteWhereDv("docs", col("id") === 6)
    lake.read("docs").count() shouldBe 398
    lake.read("docs").filter(col("id").isin(5, 6)).count() shouldBe 0
    // the file's dv entry points at ONE payload (the newest, holding the
    // union) — readers never chase a chain
    val dvs = lake.deletionVectors("docs")
    dvs.size shouldBe 1 // only file 0-99 has dead rows
    dvs.values.head should include(lake.listVersions("docs").head)
  }

  test("noop and bulk guards: no match commits nothing; maxDvRows refuses") {
    val lake = tmpLake()
    val v0 = lake.listVersions("docs").head
    val r = lake.deleteWhereDv("docs", col("id") === 99999)
    r.noop shouldBe true
    lake.listVersions("docs").head shouldBe v0
    an[IllegalArgumentException] should be thrownBy
      lake.deleteWhereDv("docs", col("id") < 300, maxDvRows = 100)
  }

  test("diff identity is (file, dv): newly-dead rows surface as deletes") {
    val lake = tmpLake()
    val v1 = lake.listVersions("docs").head
    lake.deleteWhereDv("docs", col("id").isin(5, 205))
    val v2 = lake.listVersions("docs").head
    val (ins, del) = lake.diff("docs", v1, v2)
    ins.count() shouldBe 0
    del.select("id").as[Long].collect().sorted shouldBe Array(5L, 205L)
    // a second DV commit diffs incrementally (old DV vs new DV)
    lake.deleteWhereDv("docs", col("id") === 6)
    val v3 = lake.listVersions("docs").head
    val (ins2, del2) = lake.diff("docs", v2, v3)
    ins2.count() shouldBe 0
    del2.select("id").as[Long].collect() shouldBe Array(6L)
    // and the change feed tags them per commit
    val feed = lake.changeFeed("docs", v1, v3)
      .select("id", "_change_type").as[(Long, String)].collect().toSet
    feed shouldBe Set((5L, "delete"), (205L, "delete"), (6L, "delete"))
  }

  test("row-op rewrites read THROUGH DVs and never resurrect dead rows") {
    val lake = tmpLake()
    lake.deleteWhereDv("docs", col("id").isin(5, 205)) // files 1 and 3
    // update touches file 1 only (stats-pruned): its dv materializes in
    // the rewrite; file 3 is carried and keeps its dv entry
    val r = lake.updateWhere("docs", col("id") === 7,
      Map("name" -> lit("updated")))
    r.rewrittenFiles shouldBe 1
    val out = lake.read("docs")
    out.count() shouldBe 398
    out.filter(col("id").isin(5, 205)).count() shouldBe 0 // both still dead
    out.filter(col("id") === 7).select("name").as[String]
      .head() shouldBe "updated"
    val dvs = lake.deletionVectors("docs")
    dvs.size shouldBe 1 // file 1's entry dropped with the rewrite
    dvs.keys.head should not include lake.listVersions("docs").head
  }

  test("compact materializes DVs: map empties, dead rows stay dead") {
    val lake = tmpLake()
    lake.deleteWhereDv("docs", col("id") % 2 === 1 && col("id") < 20)
    lake.compact("docs")
    lake.deletionVectors("docs") shouldBe Map.empty
    val out = lake.read("docs")
    out.count() shouldBe 390
    out.filter(col("id") === 3).count() shouldBe 0
  }

  test("restore carries the target's dv map both directions") {
    val lake = tmpLake()
    val vFull = lake.listVersions("docs").head
    lake.deleteWhereDv("docs", col("id") === 5)
    val vDv = lake.listVersions("docs").head
    lake.restore("docs", vFull)
    lake.read("docs").count() shouldBe 400 // rollback un-deletes
    lake.deletionVectors("docs") shouldBe Map.empty
    lake.restore("docs", vDv)
    lake.read("docs").count() shouldBe 399 // roll forward re-deletes
    lake.deletionVectors("docs").size shouldBe 1
  }

  test("vacuum pins dv payload dirs; appended history stays readable") {
    val lake = tmpLake()
    lake.deleteWhereDv("docs", col("id") === 5)
    lake.appendAtomic(spark.range(1000, 1010).select(col("id"),
      lit(0.0).as("score"), lit("apx").as("name")), "docs")
    lake.vacuum("docs", keep = 1)
    // head manifest references v1's data files AND v2's dv payload — both
    // version dirs survive retention, and the read stays exact
    val out = lake.read("docs")
    out.count() shouldBe 409
    out.filter(col("id") === 5).count() shouldBe 0
    out.filter(col("id") >= 1000).count() shouldBe 10
  }

  test("lake.enableDeletionVectors property routes deleteWhere through DVs, bulk falls back") {
    val lake = tmpLake()
    lake.setProperties("docs", Map(
      "lake.enableDeletionVectors" -> "true",
      "lake.deletionVectors.maxRows" -> "10"))
    lake.properties("docs")("lake.enableDeletionVectors") shouldBe "true"
    // scattered delete (4 rows ≤ cap) → DV commit, zero rewrites
    val r = lake.deleteWhere("docs", col("id") % 100 === 5)
    r.rewrittenFiles shouldBe 0
    lake.deletionVectors("docs").size shouldBe 4
    lake.read("docs").count() shouldBe 396
    // bulk delete (> cap) → silent fallback to the rewrite path
    val r2 = lake.deleteWhere("docs", col("id") < 200)
    r2.rewrittenFiles should be >= 1
    lake.read("docs").count() shouldBe 198 // 200..399 minus 205, 305
    lake.read("docs").filter(col("id").isin(205, 305)).count() shouldBe 0
    // unsetting (empty value removes) restores pure-rewrite behavior
    lake.setProperties("docs", Map("lake.enableDeletionVectors" -> ""))
    lake.properties("docs").contains("lake.enableDeletionVectors") shouldBe false
    val r3 = lake.deleteWhere("docs", col("id") === 210)
    r3.rewrittenFiles should be >= 1
  }

  test("DV payload JSON round-trips") {
    val m = Map("_v/a/f1.parquet" -> Seq(3L, 1L, 2L), "f2.parquet" -> Seq(0L))
    val back = DeletionVectors.fromJson(DeletionVectors.toJson(m))
    back("_v/a/f1.parquet") shouldBe Seq(1L, 2L, 3L) // sorted on write
    back("f2.parquet") shouldBe Seq(0L)
  }

  test("REORG APPLY (PURGE): rewrites ONLY DV-carrying files, drops the " +
      "vectors, data-invisible; noop without DVs") {
    val lake = tmpLake()
    // DVs land on exactly 2 of the 4 range files (ids 5, 105)
    lake.deleteWhereDv("docs", col("id").isin(5L, 105L))
      .rewrittenFiles shouldBe 0
    lake.describeDetail("docs").numDeletionVectors should be >= 1
    val before = lake.read("docs").agg(sum("id")).as[Long].head()
    val r = lake.purgeDeletionVectors("docs")
    r.noop shouldBe false
    r.rewrittenFiles shouldBe 2 // the two DV'd files only
    r.carriedFiles shouldBe 2
    lake.describeDetail("docs").numDeletionVectors shouldBe 0
    lake.read("docs").count() shouldBe 398L
    lake.read("docs").agg(sum("id")).as[Long].head() shouldBe before
    // already clean → noop
    lake.purgeDeletionVectors("docs").noop shouldBe true
    lake.historyRows("docs").last.getString(2) shouldBe "REORG"
  }

  test("REORG statement form; row-tracking ids survive the purge") {
    val dir = Files.createTempDirectory("lake_dvrg").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic(spark.range(100).select(col("id"),
      (col("id") % 5).as("k")).repartitionByRange(2, col("id")), "t")
    lake.enableRowTracking("t")
    lake.setProperties("t", Map("lake.enableDeletionVectors" -> "true"))
    val idsBefore = lake.readWithRowIds("t").select("id", "_row_id")
      .as[(Long, Long)].collect().toMap
    lake.deleteWhereDv("t", col("id") === 7L).rewrittenFiles shouldBe 0
    val m = LakeSql.sql(spark,
      s"REORG TABLE lake.`$dir`.t APPLY (PURGE)").collect().head
    m.getString(0) shouldBe "REORG"
    m.getString(1) should include("rewritten=1")
    lake.describeDetail("t").numDeletionVectors shouldBe 0
    val after = lake.readWithRowIds("t").select("id", "_row_id")
      .as[(Long, Long)].collect().toMap
    after.size shouldBe 99
    after.foreach { case (id, rid) => rid shouldBe idsBefore(id) }
  }
}
