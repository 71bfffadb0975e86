package newspipe.io

import newspipe.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Per-file Bloom index ([[BloomIndex]]): point-predicate file skipping,
  * carry-by-reference maintenance across commits, conservatism (pruning
  * never changes an answer), and the column-mapping interplay.
  */
class LakeBloomSpec extends SparkTestBase {
  import spark.implicits._

  /** 8 files clustered by `grp` so `id` values spread across EVERY file —
    * min/max stats can never prune an id lookup, only the bloom can.
    */
  private def tmpLake(checkpointInterval: Int = 20): Lake = {
    val lake = new Lake(spark,
      LakeConfig(basePath = Files.createTempDirectory("lake_bloom").toString,
        checkpointInterval = checkpointInterval))
    val df = spark.range(0, 800).select(
      col("id"),
      (col("id") % 8).as("grp"),
      concat(lit("tag_"), col("id") % 200).as("tag"))
    lake.writeAtomic(df.repartitionByRange(8, col("grp"))
      .sortWithinPartitions("grp"), "docs")
    lake
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect() // force execution so the scan metric is populated
    df.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
  }

  test("id point lookup scans ~1 file with the index, all files without") {
    val lake = tmpLake()
    val total = lake.describeDetail("docs").numFiles
    assert(total >= 4, s"setup should land several files, got $total")
    // stats can't prune: ids stride by 8, so every file spans the range
    scannedFiles(lake.read("docs").filter(col("id") === 42L)) shouldBe total
    lake.enableBloomIndex("docs", Seq("id", "tag"))
    val pruned = lake.read("docs").filter(col("id") === 42L)
    val n = scannedFiles(pruned)
    assert(n < total, s"bloom should skip files, scanned $n of $total")
    pruned.select("id", "grp").as[(Long, Long)].collect() shouldBe
      Array((42L, 2L))
  }

  test("string equality and IN prune through the bloom; results unchanged") {
    val lake = tmpLake()
    val full = lake.read("docs").filter(col("tag") === "tag_7")
      .select("id").as[Long].collect().sorted
    lake.enableBloomIndex("docs", Seq("id", "tag"), fpp = 0.001)
    val probe = lake.read("docs").filter(col("tag") === "tag_7")
    probe.select("id").as[Long].collect().sorted shouldBe full
    // a value absent from the layer scans (essentially) zero files
    val miss = lake.read("docs").filter(col("tag") === "no_such_tag")
    miss.count() shouldBe 0L
    assert(scannedFiles(
      lake.read("docs").filter(col("tag") === "no_such_tag")) <= 1)
    val in = lake.read("docs").filter(col("id").isin(3L, 700L))
    in.select("id").as[Long].collect().sorted shouldBe Array(3L, 700L)
  }

  test("commits carry entries by reference and index only new files") {
    // checkpointInterval=1 forces FULL sidecars — this test pins the
    // byte-identical carry of the checkpoint form; the incremental form
    // (own-entries-only sidecar + chain fold) is pinned separately below
    val lake = tmpLake(checkpointInterval = 1)
    lake.enableBloomIndex("docs", Seq("id"))
    val head0 = lake.listVersions("docs").head
    val v0 = bloomFilesOf(lake, "docs")
    assert(v0.nonEmpty)
    // a delete rewrites ~1 file, carries ~7: carried entries must be
    // BYTE-identical (proof of carry, not rebuild)
    lake.deleteWhere("docs", col("grp") === 3L)
    val v1 = bloomFilesOf(lake, "docs")
    val carriedKeys = v0.keySet intersect v1.keySet
    assert(carriedKeys.size >= v0.size - 2,
      s"expected carried keys, got $carriedKeys")
    carriedKeys.foreach { k =>
      v1(k)("id").toSeq shouldBe v0(k)("id").toSeq
    }
    // rewritten/new files got fresh entries; lookups still prune + answer
    val probe = lake.read("docs").filter(col("id") === 42L)
    probe.select("id").as[Long].collect() shouldBe Array(42L)
    assert(scannedFiles(lake.read("docs").filter(col("id") === 42L)) < v1.size)
    // version pinning: the old snapshot's sidecar still serves time travel
    lake.readVersion("docs", head0).filter(col("id") === 3L)
      .count() shouldBe 1L
  }

  test("appendAtomic extends the index to appended files only") {
    val lake = tmpLake(checkpointInterval = 1)
    lake.enableBloomIndex("docs", Seq("id"))
    val before = bloomFilesOf(lake, "docs")
    lake.appendAtomic(
      spark.range(10000, 10100).select(col("id"), (col("id") % 8).as("grp"),
        concat(lit("tag_"), col("id") % 200).as("tag")).repartition(1),
      "docs")
    val after = bloomFilesOf(lake, "docs")
    after.keySet.size shouldBe before.keySet.size + 1
    before.keySet.foreach(k => after(k)("id").toSeq shouldBe before(k)("id").toSeq)
    val hit = lake.read("docs").filter(col("id") === 10050L)
    hit.count() shouldBe 1L
    assert(scannedFiles(lake.read("docs").filter(col("id") === 10050L)) <= 2)
  }

  test("incremental commits land O(increment) bloom sidecars; lookups " +
      "fold the chain") {
    val lake = tmpLake() // default interval: row-op commits are deltas
    lake.enableBloomIndex("docs", Seq("id"))
    val v0 = bloomFilesOf(lake, "docs")
    assert(v0.nonEmpty)
    lake.deleteWhere("docs", col("grp") === 3L)
    // the head's OWN sidecar holds only the rewritten file's entry —
    // carried entries live down the chain, never re-serialized
    val own = bloomFilesOf(lake, "docs")
    assert(own.size <= 2, s"incremental sidecar should be O(increment), " +
      s"got ${own.keySet}")
    // folded lookups still prune AND answer correctly
    val probe = lake.read("docs").filter(col("id") === 42L)
    probe.select("id").as[Long].collect() shouldBe Array(42L)
    assert(scannedFiles(lake.read("docs").filter(col("id") === 42L)) <
      v0.size)
    // an appended increment is found through its own (new) entry
    lake.appendAtomic(
      spark.range(10000, 10100).select(col("id"), (col("id") % 8).as("grp"),
        concat(lit("tag_"), col("id") % 200).as("tag")).repartition(1),
      "docs")
    lake.read("docs").filter(col("id") === 10050L).count() shouldBe 1L
    assert(scannedFiles(lake.read("docs").filter(col("id") === 10050L)) <= 2)
  }

  test("RENAME COLUMN keeps carried entries valid (physical-name keying)") {
    val lake = tmpLake()
    lake.enableBloomIndex("docs", Seq("id"))
    lake.setProperties("docs", Map("lake.columnMapping.mode" -> "name"))
    lake.renameColumn("docs", "id", "doc_id")
    // logical predicate on the NEW name prunes through the carried bloom
    val total = lake.describeDetail("docs").numFiles
    val probe = lake.read("docs").filter(col("doc_id") === 42L)
    probe.select("doc_id").as[Long].collect() shouldBe Array(42L)
    assert(scannedFiles(
      lake.read("docs").filter(col("doc_id") === 42L)) < total)
  }

  test("unsupported column types are refused loudly") {
    val lake = new Lake(spark,
      LakeConfig(basePath = Files.createTempDirectory("lake_bloom").toString))
    lake.writeAtomic(spark.range(10).select(col("id"),
      (col("id") * 1.5).as("score")), "t")
    val e = intercept[IllegalArgumentException] {
      lake.enableBloomIndex("t", Seq("score"))
    }
    assert(e.getMessage.contains("unsupported type"))
    intercept[IllegalArgumentException] {
      lake.enableBloomIndex("t", Seq("nope"))
    }
  }

  test("hive-partitioned layers are refused loudly (index would silently " +
      "never build)") {
    val lake = new Lake(spark,
      LakeConfig(basePath = Files.createTempDirectory("lake_bloom").toString))
    lake.writeAtomic(spark.range(20).select(col("id"),
      (col("id") % 2).cast("string").as("part")), "p",
      partitionBy = Seq("part"))
    val e = intercept[IllegalArgumentException] {
      lake.enableBloomIndex("p", Seq("id"))
    }
    assert(e.getMessage.contains("hive-partitioned"))
  }

  test("fpp drives sidecar size; probes stay correct at loose fpp") {
    val lake = tmpLake()
    lake.enableBloomIndex("docs", Seq("id"), fpp = 0.2)
    val loose = bloomFilesOf(lake, "docs").values.map(_("id").length).sum
    lake.enableBloomIndex("docs", Seq("id"), fpp = 0.001)
    val tight = bloomFilesOf(lake, "docs").values.map(_("id").length).sum
    assert(tight > loose, s"tighter fpp must cost more bits: $tight vs $loose")
    lake.read("docs").filter(col("id") === 599L).count() shouldBe 1L
  }

  /** Read the HEAD snapshot's raw bloom sidecar through the public file
    * layout (specs may reach into the layout; library code goes through
    * the reader).
    */
  private def bloomFilesOf(lake: Lake, layer: String)
      : Map[String, Map[String, Array[Byte]]] = {
    val base = lake.describeDetail(layer).location
    val vdir = new java.io.File(s"$base/_v")
    val head = vdir.listFiles().filter(d =>
      new java.io.File(d, "_COMMITTED").exists()).maxBy(_.getName)
    val f = new java.io.File(head, BloomIndex.SidecarName)
    if (!f.exists()) Map.empty
    else BloomIndex.fromJson(
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))._3
      // self-contained snapshots key snapshot-relative, manifest commits
      // layer-root-relative — normalize to the (unique) file name so
      // carry checks compare the same identity across snapshot kinds
      .map { case (rel, m) => rel.split('/').last -> m }
  }
}
