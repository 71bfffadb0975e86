package newspipe.io

import java.nio.file.Files

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** Idempotent `COPY INTO` ([[Lake.copyInto]]): staged parquet loads with
  * a per-commit loaded-file ledger — retries and overlapping listings
  * converge to exactly-once content; new staging files load
  * incrementally; PATTERN filters; the statement form.
  */
class LakeCopyIntoSpec extends SparkTestBase {
  import spark.implicits._

  private def fresh(): (String, String, Lake) = {
    val dir = Files.createTempDirectory("lakecp").toString
    val stage = Files.createTempDirectory("lakecp_stage").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic(Seq.empty[(Long, String)].toDF("id", "v"), "t")
    (dir, stage, lake)
  }

  private def land(stage: String, sub: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite")
      .parquet(s"$stage/$sub")

  test("loads staged files once; re-run is a NOOP; new files load " +
      "incrementally") {
    val (_, stage, lake) = fresh()
    land(stage, "b1", Seq((1L, "a"), (2L, "b")))
    land(stage, "b2", Seq((3L, "c")))
    val r1 = lake.copyInto("t", stage)
    r1.noop shouldBe false
    lake.read("t").count() shouldBe 3L
    // exact same call again: ledger skips every file
    lake.copyInto("t", stage).noop shouldBe true
    lake.read("t").count() shouldBe 3L
    // a new staging batch lands: only IT loads
    land(stage, "b3", Seq((4L, "d"), (5L, "e")))
    lake.copyInto("t", stage).noop shouldBe false
    lake.read("t").orderBy("id").as[(Long, String)].collect() shouldBe
      Array((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
    lake.copyInto("t", stage).noop shouldBe true
  }

  test("PATTERN restricts the load to matching relative paths") {
    val (_, stage, lake) = fresh()
    land(stage, "keep", Seq((1L, "a")))
    land(stage, "skip", Seq((2L, "b")))
    lake.copyInto("t", stage, Some("keep/*")).noop shouldBe false
    lake.read("t").select("id").as[Long].collect() shouldBe Array(1L)
    // widening the pattern later loads the remainder only
    lake.copyInto("t", stage).noop shouldBe false
    lake.read("t").count() shouldBe 2L
  }

  test("COPY INTO statement form; ledger survives other commits between " +
      "loads") {
    val (dir, stage, lake) = fresh()
    land(stage, "b1", Seq((1L, "a")))
    val m = LakeSql.sql(spark,
      s"COPY INTO lake.`$dir`.t FROM '$stage' FILEFORMAT = PARQUET")
      .collect().head
    m.getString(0) shouldBe "COPY INTO"
    m.getString(1) should include("noop=false")
    // unrelated commits between loads must not break the ledger walk
    lake.appendAtomic(Seq((100L, "x")).toDF("id", "v"), "t")
    LakeSql.sql(spark,
      s"COPY INTO lake.`$dir`.t FROM '$stage'").collect()
      .head.getString(1) should include("noop=true")
    land(stage, "b2", Seq((2L, "b")))
    LakeSql.sql(spark,
      s"COPY INTO lake.`$dir`.t FROM '$stage' PATTERN = '*/part-*'")
      .collect().head.getString(1) should include("noop=false")
    lake.read("t").count() shouldBe 3L
  }

  test("hive-partitioned staging: k=v directories surface their " +
      "partition column through the load") {
    val dir = Files.createTempDirectory("lakecp_hv").toString
    val stage = Files.createTempDirectory("lakecp_hvs").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic(Seq.empty[(Long, String)].toDF("id", "lang"), "t")
    Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
      .write.partitionBy("lang").parquet(s"$stage/load1")
    lake.copyInto("t", stage).noop shouldBe false
    lake.read("t").orderBy("id").as[(Long, String)].collect() shouldBe
      Array((1L, "en"), (2L, "de"), (3L, "en"))
    lake.copyInto("t", stage).noop shouldBe true
  }

  test("ledger fold is instance-independent (JVM cache) and a DROPPED " +
      "table's recreation starts with a blank loading history") {
    val (dir, stage, lake) = fresh()
    land(stage, "b1", Seq((1L, "a"), (2L, "b")))
    lake.copyInto("t", stage).noop shouldBe false
    // a FRESH engine instance still skips the loaded files
    val lake2 = new Lake(spark, LakeConfig(basePath = dir))
    lake2.copyInto("t", stage).noop shouldBe true
    // drop + recreate at the same path → the same staged files load again
    spark.conf.set("spark.sql.catalog.cpcat", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.cpcat.basePath", dir)
    spark.sql("DROP TABLE cpcat.t")
    val lake3 = new Lake(spark, LakeConfig(basePath = dir))
    lake3.writeAtomic(Seq.empty[(Long, String)].toDF("id", "v"), "t")
    lake3.copyInto("t", stage).noop shouldBe false
    lake3.read("t").count() shouldBe 2L
  }

  test("OUT-OF-BAND delete + recreate at the same path: the ledger cache " +
      "self-heals (no catalog drop involved) — staged files load again") {
    val (dir, stage, lake) = fresh()
    land(stage, "b1", Seq((1L, "a"), (2L, "b")))
    lake.copyInto("t", stage).noop shouldBe false
    lake.read("t").count() shouldBe 2L
    // delete the layer directly on the filesystem — another tool's drop,
    // which never reaches LakeCatalog.dropTable's cache invalidation
    val lp = new org.apache.hadoop.fs.Path(s"$dir/t")
    lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(lp, true)
    // recreate at the same path: the cached scanned-version names no
    // longer exist in the new incarnation's listing, so the stale
    // 'loaded' set is discarded and the staging files ingest again
    val lake2 = new Lake(spark, LakeConfig(basePath = dir))
    lake2.writeAtomic(Seq.empty[(Long, String)].toDF("id", "v"), "t")
    lake2.copyInto("t", stage).noop shouldBe false
    lake2.read("t").count() shouldBe 2L
  }

  test("vacuum PAST the ledger: the marker relocates to _v/_COPY_LEDGER " +
      "before its version dir is reclaimed — a retried COPY INTO " +
      "re-ingests NOTHING, and the data bytes still vacuum away") {
    val (dir, stage, lake) = fresh()
    land(stage, "b1", Seq((1L, "a"), (2L, "b")))
    lake.copyInto("t", stage).noop shouldBe false
    val copyVersion = lake.listVersions("t").head
    // supersede the COPY INTO version's files so vacuum can reclaim it
    lake.compact("t")
    lake.checkpoint("t")
    lake.vacuum("t", keep = 1, orphanGraceMs = 0L)
    // the ledger-bearing version is GONE (bytes reclaimed, not pinned)…
    lake.listVersions("t") should not contain copyVersion
    // …but its ledger survived, relocated
    val relocated = new java.io.File(
      s"$dir/t/_v/${Lake.CopyLedgerDirName}/$copyVersion")
    assert(relocated.isFile, "vacuum must relocate the _COPY marker")
    // cold-cache retry (a fresh JVM's state): the fold must pick the
    // relocated ledger up and skip every already-loaded staging file
    val lp = new org.apache.hadoop.fs.Path(s"$dir/t")
    Lake.copyLedgerInvalidate(
      lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(lp).toString)
    lake.copyInto("t", stage).noop shouldBe true
    lake.read("t").count() shouldBe 2L
    // and genuinely new staging files still load
    land(stage, "b2", Seq((3L, "c")))
    lake.copyInto("t", stage).noop shouldBe false
    lake.read("t").count() shouldBe 3L
  }

  test("refusals: missing table, missing source dir") {
    val (dir, stage, lake) = fresh()
    intercept[IllegalStateException] {
      lake.copyInto("nope", stage)
    }.getMessage should include("COPY INTO")
    intercept[IllegalArgumentException] {
      lake.copyInto("t", s"$stage/_missing")
    }.getMessage should include("does not exist")
  }
}
