package newspipe.io

import java.nio.file.Files

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** ROW TRACKING (Delta's stable row ids): `enableRowTracking` backfill,
  * fresh-file base allocation, id stability across carry / DV deletes /
  * row-level rewrites / compaction / restore / clone / incremental
  * commits, and [[Lake.changeFeedTracked]] update attribution WITHOUT
  * caller-declared key columns.
  */
class LakeRowTrackingSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLake(): (String, Lake) = {
    val dir = Files.createTempDirectory("lakerowtrk").toString
    (dir, new Lake(spark, LakeConfig(basePath = dir)))
  }

  private def idsByKey(lake: Lake, layer: String): Map[Long, Long] =
    lake.readWithRowIds(layer).select("id", "_row_id")
      .as[(Long, Long)].collect().toMap

  test("enable backfills the head; ids unique; appends allocate fresh " +
      "ranges and old rows keep their ids") {
    val (_, lake) = freshLake()
    lake.writeAtomic((1L to 100L).map(i => (i, s"d$i")).toDF("id", "text")
      .repartition(4), "t")
    lake.enableRowTracking("t")
    val before = idsByKey(lake, "t")
    before.size shouldBe 100
    before.values.toSeq.distinct.size shouldBe 100 // unique
    lake.appendAtomic((101L to 120L).map(i => (i, s"d$i"))
      .toDF("id", "text"), "t")
    val after = idsByKey(lake, "t")
    after.size shouldBe 120
    after.values.toSeq.distinct.size shouldBe 120
    // carried rows: identical ids
    before.foreach { case (k, v) => after(k) shouldBe v }
    // fresh rows: allocated ABOVE the old watermark
    (101L to 120L).foreach(k => assert(after(k) >= 100L))
  }

  test("DV delete: survivors keep ids; deleted ids never reappear") {
    val (_, lake) = freshLake()
    lake.writeAtomic((1L to 50L).map(i => (i, s"d$i")).toDF("id", "text")
      .repartition(2), "dv")
    lake.enableRowTracking("dv")
    lake.setProperties("dv", Map("lake.enableDeletionVectors" -> "true"))
    val before = idsByKey(lake, "dv")
    lake.deleteWhere("dv", $"id" % 10 === 0)
    lake.deletionVectors("dv") should not be empty // really the DV path
    val after = idsByKey(lake, "dv")
    after.keySet shouldBe (1L to 50L).filterNot(_ % 10 == 0).toSet
    after.foreach { case (k, v) => before(k) shouldBe v }
  }

  test("updateWhere rewrite: updated AND co-located rows keep ids " +
      "(materialized through the new files)") {
    val (_, lake) = freshLake()
    lake.writeAtomic((1L to 40L).map(i => (i, s"d$i")).toDF("id", "text")
      .repartitionByRange(4, $"id").sortWithinPartitions("id"), "up")
    lake.enableRowTracking("up")
    val before = idsByKey(lake, "up")
    lake.updateWhere("up", $"id" === 7L,
      Map("text" -> lit("UPDATED"))).rewrittenFiles should be >= 1
    val after = idsByKey(lake, "up")
    after shouldBe before // every identity survives the rewrite
    lake.readWithRowIds("up").filter($"id" === 7L).select("text")
      .as[String].head() shouldBe "UPDATED"
  }

  test("compact (OPTIMIZE) and compactSmall preserve every id") {
    val (_, lake) = freshLake()
    lake.writeAtomic((1L to 30L).map(i => (i, s"d$i")).toDF("id", "text")
      .repartition(3), "opt")
    lake.enableRowTracking("opt")
    (31L to 40L).foreach(i => lake.appendAtomic(
      Seq((i, s"d$i")).toDF("id", "text"), "opt"))
    val before = idsByKey(lake, "opt")
    lake.compact("opt")
    idsByKey(lake, "opt") shouldBe before
    // hidden column stays OUT of the logical schema
    lake.read("opt").columns.toSeq shouldBe Seq("id", "text")
    lake.compactSmall("opt")
    idsByKey(lake, "opt") shouldBe before
  }

  test("mergeInto: updated rows INHERIT the target id, inserts get fresh " +
      "ones; restore brings historical ids back") {
    val (_, lake) = freshLake()
    lake.writeAtomic((1L to 20L).map(i => (i, s"d$i")).toDF("id", "text")
      .repartition(2), "mg")
    lake.enableRowTracking("mg")
    val before = idsByKey(lake, "mg")
    val v1 = lake.listVersions("mg").head
    lake.mergeInto("mg", Seq((5L, "UP5"), (99L, "NEW99"))
      .toDF("id", "text"), keys = Seq("id"))
    val after = idsByKey(lake, "mg")
    after(5L) shouldBe before(5L) // update kept identity
    assert(!before.values.toSet.contains(after(99L)), "insert id is fresh")
    after.values.toSeq.distinct.size shouldBe after.size
    // restore to v1: the resurrected inventory carries its old bases
    lake.restore("mg", v1)
    idsByKey(lake, "mg") shouldBe before
  }

  test("changeFeedTracked: update surfaces as pre/postimage PAIR under " +
      "ONE row id — no key columns declared") {
    val (_, lake) = freshLake()
    lake.writeAtomic((1L to 10L).map(i => (i, s"d$i")).toDF("id", "text")
      .repartition(2), "cf")
    lake.enableRowTracking("cf")
    val v1 = lake.listVersions("cf").head
    lake.updateWhere("cf", $"id" === 3L, Map("text" -> lit("X3")))
    lake.appendAtomic(Seq((11L, "d11")).toDF("id", "text"), "cf")
    lake.deleteWhere("cf", $"id" === 9L)
    val head = lake.listVersions("cf").head
    val feed = lake.changeFeedTracked("cf", v1, head)
      .select("id", "_row_id", "_change_type")
      .as[(Long, Long, String)].collect()
    val byTag = feed.groupBy(_._3).view.mapValues(_.toSeq).toMap
    byTag("insert").map(_._1) shouldBe Seq(11L)
    byTag("delete").map(_._1) shouldBe Seq(9L)
    byTag("update_preimage").map(_._1) shouldBe Seq(3L)
    byTag("update_postimage").map(_._1) shouldBe Seq(3L)
    // THE row-tracking property: both images share one identity
    byTag("update_preimage").head._2 shouldBe
      byTag("update_postimage").head._2
  }

  test("incremental (_DELTA.json) commits carry bases; the fold and a " +
      "checkpoint agree") {
    val (root, lake) = freshLake()
    lake.setProperties("inc", Map("lake.checkpointInterval" -> "50"))
    lake.writeAtomic((1L to 10L).map(i => (i, s"d$i")).toDF("id", "text"),
      "inc")
    lake.enableRowTracking("inc")
    (11L to 20L).foreach(i => lake.appendAtomic(
      Seq((i, s"d$i")).toDF("id", "text"), "inc"))
    // the chain really is incremental
    val head = lake.listVersions("inc").head
    assert(new java.io.File(s"$root/inc/_v/$head/_DELTA.json").exists())
    val folded = idsByKey(lake, "inc")
    folded.size shouldBe 20
    folded.values.toSeq.distinct.size shouldBe 20
    lake.checkpoint("inc")
    val fresh = new Lake(spark, LakeConfig(basePath = root)) // cold cache
    idsByKey(fresh, "inc") shouldBe folded
  }

  test("enableRowTracking on a DELTA-ONLY head materializes the folded " +
      "stats (pruning stays on after the refoot)") {
    val (root, lake) = freshLake()
    lake.setProperties("inc", Map("lake.checkpointInterval" -> "50"))
    lake.writeAtomic((1L to 100L).map(i => (i, s"d$i")).toDF("id", "text"),
      "inc")
    (1 to 3).foreach(k => lake.appendAtomic(
      (1L to 10L).map(i => (100L + 30 * k + i, "x")).toDF("id", "text"),
      "inc"))
    val head = lake.listVersions("inc").head
    assert(new java.io.File(s"$root/inc/_v/$head/_DELTA.json").exists())
    // refoot converts the delta-only head to a full manifest; without
    // materializing the FOLDED sidecars first, stats would cover only
    // the head's own increment and pruning would silently turn off
    lake.enableRowTracking("inc")
    assert(!new java.io.File(s"$root/inc/_v/$head/_DELTA.json").exists())
    val fresh = new Lake(spark, LakeConfig(basePath = root)) // cold cache
    val info = fresh.pruneInfo("inc", col("id") === 5L).get
    info.keptFiles should be < info.totalFiles
    fresh.readWithRowIds("inc").select("_row_id").distinct()
      .count() shouldBe 130L
  }

  test("backfill via the DISTRIBUTED footer job (threshold 0) equals " +
      "the driver-pool path") {
    val dir = Files.createTempDirectory("lakerowtrk").toString
    val driverLake = new Lake(spark, LakeConfig(basePath = dir))
    val jobLake = new Lake(spark,
      LakeConfig(basePath = dir, backfillJobThreshold = 0))
    driverLake.writeAtomic((1L to 60L).map(i => (i, s"d$i"))
      .toDF("id", "text").repartition(7), "a")
    jobLake.writeAtomic((1L to 60L).map(i => (i, s"d$i"))
      .toDF("id", "text").repartition(7), "b")
    driverLake.enableRowTracking("a")
    jobLake.enableRowTracking("b") // 7 files > 0 → Spark-job footer counts
    val a = driverLake.readWithRowIds("a").select("_row_id").as[Long]
      .collect().sorted
    val b = jobLake.readWithRowIds("b").select("_row_id").as[Long]
      .collect().sorted
    a.length shouldBe 60
    b shouldBe a // same dense 0..59 identity space, either path
  }

  test("mergeInto refuses a caller-supplied _row_id on the source " +
      "(ids are inherited, never caller-set)") {
    val (_, lake) = freshLake()
    lake.writeAtomic((1L to 10L).map(i => (i, s"d$i")).toDF("id", "text"),
      "t")
    lake.enableRowTracking("t")
    val src = lake.readWithRowIds("t").limit(2)
      .withColumn("text", lit("upd"))
    val e = intercept[IllegalArgumentException] {
      lake.mergeInto("t", src, Seq("id"))
    }
    e.getMessage should include("_row_id")
    // dropping it makes the same merge legal
    lake.mergeInto("t", src.drop("_row_id"), Seq("id"))
    lake.read("t").filter($"text" === "upd").count() shouldBe 2L
  }

  test("clone carries identities; refusals: reserved column, v2 DML") {
    val (root, lake) = freshLake()
    lake.writeAtomic((1L to 15L).map(i => (i, s"d$i")).toDF("id", "text"),
      "src")
    lake.enableRowTracking("src")
    val srcIds = idsByKey(lake, "src")
    lake.clone("src", "fork")
    idsByKey(lake, "fork") shouldBe srcIds
    // reserved column refusals
    intercept[IllegalArgumentException] {
      lake.appendAtomic(Seq((99L, "x", 1L)).toDF("id", "text", "_row_id"),
        "src")
    }
    intercept[IllegalArgumentException] {
      lake.writeAtomic(Seq((99L, "x", 1L)).toDF("id", "text", "_row_id"),
        "src")
    }
    // v2 group-based DML refuses loudly instead of dropping identities
    spark.conf.set("spark.sql.catalog.rtv2", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtv2.basePath", root)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE rtv2.`$root`.src SET text = 'z' WHERE id = 1")
    }
    e.getMessage should include("row ids")
  }

  test("row ids stay history-unique across a REPLACE: the tracked feed " +
      "attributes old deletes and new inserts with disjoint id sets") {
    val (_, lake) = freshLake()
    lake.writeAtomic((1L to 20L).map(i => (i, s"d$i")).toDF("id", "text"),
      "t")
    lake.enableRowTracking("t")
    val v0 = lake.listVersions("t").head
    val oldIds = lake.readWithRowIds("t").select("_row_id")
      .as[Long].collect().toSet
    lake.replaceAtomic((100L to 104L).map(i => (i, s"n$i"))
      .toDF("id", "text"), "t")
    val head = lake.listVersions("t").head
    val newIds = lake.readWithRowIds("t").select("_row_id")
      .as[Long].collect().toSet
    newIds.size shouldBe 5
    oldIds.intersect(newIds) shouldBe empty // watermark never restarts
    val feed = lake.changeFeedTracked("t", v0, head)
    feed.filter($"_change_type" === "delete").select("_row_id")
      .as[Long].collect().toSet shouldBe oldIds
    feed.filter($"_change_type" === "insert").select("_row_id")
      .as[Long].collect().toSet shouldBe newIds
  }
}
