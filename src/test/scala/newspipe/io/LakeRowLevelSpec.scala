package newspipe.io

import java.nio.file.Files

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** Pure-v2 row-level DML ([[LakeRowLevelOperation]]): UPDATE / MERGE INTO /
  * arbitrary-predicate DELETE through Spark's OWN group-based rewrite rules
  * against a session with nothing but a `LakeCatalog` registered — no
  * NewspipeExtensions, no LakeSql parser. The shared test session IS such a
  * session (no extensions are injected at build), so every statement here
  * exercises RewriteUpdateTable / RewriteMergeIntoTable /
  * RewriteDeleteFromTable over [[LakeTable.newRowLevelOperationBuilder]].
  */
class LakeRowLevelSpec extends SparkTestBase {
  import spark.implicits._

  /** Catalog name deliberately NOT "lake": keeps these statements clear of
    * the LakeSql path-based translator (and of other suites' cached `lake`
    * catalog instance — CatalogManager caches per name at first touch).
    */
  private lazy val base: String = {
    val dir = Files.createTempDirectory("lakerowlevel").toString
    spark.conf.set("spark.sql.catalog.rlv", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.rlv.basePath", dir)
    dir
  }
  private lazy val lake = new Lake(spark, LakeConfig(basePath = base))

  private def filesOf(layer: String): Set[String] =
    lake.read(layer).select(input_file_name()).distinct()
      .as[String].collect().toSet

  test("UPDATE rewrites only stats-matching files; values correct") {
    // 4 range-partitioned files by n: the predicate n >= 30 prunes to ~1
    lake.writeAtomic((1L to 40L).map(n => (n, s"d$n")).toDF("n", "text")
      .repartitionByRange(4, col("n")).sortWithinPartitions("n"), "up")
    val before = filesOf("up")
    spark.sql(s"UPDATE rlv.`$base`.up SET text = concat('big:', text) " +
      "WHERE n >= 30")
    val after = filesOf("up")
    // carried files survive BY REFERENCE (identical physical paths)
    (before intersect after).size should be >= 2
    (after -- before).size should be >= 1
    val rows = lake.read("up").orderBy("n").as[(Long, String)].collect()
    rows.length shouldBe 40
    rows.filter(_._1 >= 30).foreach { case (n, t) => t shouldBe s"big:d$n" }
    rows.filter(_._1 < 30).foreach { case (n, t) => t shouldBe s"d$n" }
    lake.historyRows("up").last.getString(2) shouldBe "UPDATE"
  }

  test("UPDATE without WHERE rewrites the whole layer") {
    lake.writeAtomic(Seq((1L, 1L), (2L, 2L)).toDF("id", "v")
      .repartition(2), "upall")
    val before = filesOf("upall")
    spark.sql(s"UPDATE rlv.`$base`.upall SET v = v * 10")
    (filesOf("upall") intersect before) shouldBe empty
    lake.read("upall").orderBy("id").as[(Long, Long)].collect() shouldBe
      Array((1L, 10L), (2L, 20L))
  }

  test("partitioned layer: UPDATE touches one partition, hive layout kept") {
    lake.writeAtomic(
      Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"), (4L, "de", "d"))
        .toDF("id", "lang", "text"),
      "part", partitionBy = Seq("lang"))
    val deBefore = filesOf("part").filter(_.contains("lang=de"))
    spark.sql(s"UPDATE rlv.`$base`.part SET text = upper(text) " +
      "WHERE lang = 'en'")
    val after = filesOf("part")
    // de files carried verbatim; en rewritten, still under lang=en/
    deBefore.subsetOf(after) shouldBe true
    after.filter(_.contains("lang=en")).foreach(p =>
      (deBefore.contains(p)) shouldBe false)
    lake.read("part").orderBy("id").select("text").as[String]
      .collect() shouldBe Array("A", "B", "c", "d")
    // partition values still readable (come from the hive path)
    lake.read("part").filter(col("lang") === "en").count() shouldBe 2
  }

  test("MERGE INTO: conditional actions + DELETE action (richer than " +
    "LakeSql's keyed-upsert form)") {
    lake.writeAtomic(Seq((1L, "keep", 10L), (2L, "upd", 20L),
      (3L, "del", 30L)).toDF("id", "tag", "v"), "mrg")
    Seq((2L, "updated", 200L), (3L, "whatever", 0L), (9L, "new", 90L))
      .toDF("id", "tag", "v").createOrReplaceTempView("rlv_mrg_src")
    spark.sql(
      s"""MERGE INTO rlv.`$base`.mrg AS t USING rlv_mrg_src AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.v = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET t.tag = s.tag, t.v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    lake.read("mrg").orderBy("id").as[(Long, String, Long)]
      .collect() shouldBe Array((1L, "keep", 10L), (2L, "updated", 200L),
        (9L, "new", 90L))
    lake.historyRows("mrg").last.getString(2) shouldBe "MERGE"
  }

  test("MERGE INTO: WHEN NOT MATCHED BY SOURCE UPDATE/DELETE (Spark's " +
    "own group-based rewrite carries the clause)") {
    lake.writeAtomic(Seq((1L, "live", 10L), (2L, "live", 20L),
      (3L, "live", 5L)).toDF("id", "status", "v"), "mrgbs")
    Seq((1L, 100L)).toDF("id", "v")
      .createOrReplaceTempView("rlv_mrgbs_src")
    spark.sql(
      s"""MERGE INTO rlv.`$base`.mrgbs AS t USING rlv_mrgbs_src AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET t.v = s.v
         |WHEN NOT MATCHED BY SOURCE AND t.v < 10 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.status = 'stale'
         |""".stripMargin)
    lake.read("mrgbs").orderBy("id").as[(Long, String, Long)]
      .collect() shouldBe Array((1L, "live", 100L), (2L, "stale", 20L))
  }

  test("DELETE with a non-filter-translatable predicate routes to the " +
    "group rewrite (canDeleteWhere is false for it)") {
    lake.writeAtomic((1L to 10L).map(n => (n, s"t$n")).toDF("n", "text"),
      "delx")
    // n % 2 = 1 has no sources.Filter translation → SupportsDelete refuses,
    // Spark falls back to the row-level ReplaceData plan
    spark.sql(s"DELETE FROM rlv.`$base`.delx WHERE n % 2 = 1")
    lake.read("delx").orderBy("n").as[(Long, String)].collect()
      .map(_._1) shouldBe Array(2L, 4L, 6L, 8L, 10L)
  }

  test("CHECK constraints are enforced inside the row-level write tasks") {
    lake.writeAtomic(Seq((1L, 5L)).toDF("id", "v"), "chk")
    lake.addConstraint("chk", "v_pos", "v > 0")
    val e = intercept[Exception] {
      spark.sql(s"UPDATE rlv.`$base`.chk SET v = -1 WHERE id = 1")
    }
    e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("") should
      include("v_pos")
    lake.read("chk").as[(Long, Long)].head() shouldBe ((1L, 5L))
  }

  test("column-mapped layer: UPDATE after RENAME COLUMN reads and writes " +
    "under physical names") {
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "txt"), "map")
    lake.setProperties("map", Map("lake.columnMapping.mode" -> "name"))
    lake.renameColumn("map", "txt", "body")
    spark.sql(s"UPDATE rlv.`$base`.map SET body = concat(body, '!') " +
      "WHERE id = 2")
    lake.read("map").orderBy("id").as[(Long, String)].collect() shouldBe
      Array((1L, "a"), (2L, "b!"))
  }

  test("affected files carrying deletion vectors are refused loudly; " +
    "unaffected DV files are carried by reference") {
    // one file holding both rows, so the DV'd file IS the affected file
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "text")
      .repartition(1), "dvx")
    lake.setProperties("dvx", Map("lake.enableDeletionVectors" -> "true"))
    lake.deleteWhere("dvx", col("id") === 1L) // lands a DV, not a rewrite
    val e = intercept[Exception] {
      spark.sql(s"UPDATE rlv.`$base`.dvx SET text = 'x' WHERE id = 2")
    }
    e.getMessage should include("deletion")
  }

  test("a DV on an UNaffected file is carried by reference through the " +
    "group rewrite (no resurrection)") {
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "dvcarry")
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "text"), "dvcarry")
    lake.setProperties("dvcarry", Map("lake.enableDeletionVectors" -> "true"))
    lake.deleteWhere("dvcarry", col("id") === 1L) // DV on file 1
    // stats-pruned UPDATE touches only file 2; file 1 + its DV carried
    spark.sql(s"UPDATE rlv.`$base`.dvcarry SET text = 'x' WHERE id = 2")
    lake.read("dvcarry").orderBy("id").as[(Long, String)]
      .collect() shouldBe Array((2L, "x"))
  }

  test("OCC: a commit landing between scan-pin and write fails the rewrite") {
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "occ")
    val ctx = lake.rowLevelSnapshot("occ", None)
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "text"), "occ") // interloper
    val staging = lake.rowLevelStagingDir("occ")
    intercept[java.util.ConcurrentModificationException] {
      lake.rowLevelCommit("occ", ctx.parent, ctx.affected.toSet, staging,
        Set.empty, "UPDATE")
    }
    // the layer still reads consistently (interloper's commit intact)
    lake.read("occ").count() shouldBe 2
  }
}
