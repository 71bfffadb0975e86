package newspipe.io

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** `_v/_LAST` head pointer: snapshot-head resolution in O(1) commit-count
  * (Delta's `_last_checkpoint` role). Pins the four protocol claims:
  * every commit maintains the pointer; readers verify-then-trust (garbage
  * or missing pointer falls back to the listing scan, never a wrong
  * answer); the COMMIT path resolves its parent by authoritative scan, so
  * a stale pointer can neither fork lineage nor falsely pass the
  * optimistic-concurrency check — and the losing CAS attempt repairs the
  * pointer instead of livelocking the retry loop; vacuum keeps it valid.
  */
class LakeHeadPointerSpec extends SparkTestBase {
  import spark.implicits._

  private def newLake(): (String, Lake) = {
    val base = Files.createTempDirectory("lake_headptr").toString
    (base, new Lake(spark, LakeConfig(basePath = base)))
  }

  private def pointerFile(base: String, layer: String) =
    new java.io.File(s"$base/$layer/_v/_LAST")

  private def readPointer(base: String, layer: String): String =
    new String(Files.readAllBytes(pointerFile(base, layer).toPath),
      "UTF-8").trim

  private def writePointer(base: String, layer: String, s: String): Unit =
    Files.write(pointerFile(base, layer).toPath, s.getBytes("UTF-8"))

  test("every commit kind maintains _LAST = newest committed version") {
    val (base, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "docs")
    assert(readPointer(base, "docs") === lake.listVersions("docs").head)
    lake.appendAtomic(Seq((3L, "c")).toDF("id", "s"), "docs")
    assert(readPointer(base, "docs") === lake.listVersions("docs").head)
    lake.deleteWhere("docs", col("id") === 1L)
    assert(readPointer(base, "docs") === lake.listVersions("docs").head)
    assert(lake.headVersion("docs").contains(readPointer(base, "docs")))
  }

  test("garbage or missing pointer falls back to the scan, never errs") {
    val (base, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "s"), "docs")
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "s"), "docs")
    val head = lake.listVersions("docs").head
    writePointer(base, "docs", "0000-not-a-version")
    assert(lake.headVersion("docs").contains(head), "garbage pointer")
    assert(lake.read("docs").count() === 2)
    assert(pointerFile(base, "docs").delete())
    assert(lake.headVersion("docs").contains(head), "missing pointer")
    // next commit restores the pointer
    lake.appendAtomic(Seq((3L, "c")).toDF("id", "s"), "docs")
    assert(readPointer(base, "docs") === lake.listVersions("docs").head)
  }

  test("crash-window pointer (names an UNCOMMITTED dir) fails CLOSED: " +
      "reads fall back to the true head, never a stale answer") {
    val (base, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "s"), "docs")
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "s"), "docs")
    val head = lake.listVersions("docs").head
    // simulate a writer that crashed AFTER the pointer write and BEFORE
    // the marker: the pointer names a minted-but-uncommitted version dir
    // (the only artifact the pointer-before-marker order can leave)
    val phantom = f"${9999999999999L}%016d-deadbeef"
    new java.io.File(s"$base/docs/_v/$phantom").mkdirs()
    writePointer(base, "docs", phantom)
    // verification fails the marker probe → fallback scan → TRUE head
    assert(lake.headVersion("docs").contains(head))
    assert(lake.read("docs").count() === 2)
    // the next successful commit repairs the pointer
    lake.appendAtomic(Seq((3L, "c")).toDF("id", "s"), "docs")
    assert(readPointer(base, "docs") === lake.listVersions("docs").head)
  }

  test("stale pointer cannot fork lineage: commits resolve parent by scan") {
    val (base, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "s"), "docs")
    val v1 = lake.listVersions("docs").head
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "s"), "docs")
    val v2 = lake.listVersions("docs").head
    // simulate the crash window: pointer left one commit behind the head
    writePointer(base, "docs", v1)
    lake.appendAtomic(Seq((3L, "c")).toDF("id", "s"), "docs")
    val v3 = lake.listVersions("docs").head
    // the new commit's recorded parent is the TRUE head v2, not the
    // stale-pointed v1 — and the pointer is repaired to the new head
    val marker = s"$base/docs/_v/$v3/_COMMITTED"
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(marker)), "UTF-8").trim === v2)
    assert(readPointer(base, "docs") === v3)
    assert(lake.read("docs").count() === 3)
  }

  test("stale pointer + CAS write: conflict repairs the pointer (no livelock)") {
    val (base, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "s"), "docs")
    val v1 = lake.listVersions("docs").head
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "s"), "docs")
    val v2 = lake.listVersions("docs").head
    writePointer(base, "docs", v1) // crash-window stale pointer
    // an optimistic writer that read the (stale) head v1 must be bounced
    // by the authoritative scan — and the bounce must repair the pointer
    intercept[java.util.ConcurrentModificationException] {
      lake.writeAtomicIfLatest(Seq((9L, "z")).toDF("id", "s"), "docs",
        expectedParent = Some(v1))
    }
    assert(readPointer(base, "docs") === v2, "conflict must repair _LAST")
    // the retry (as retryOnConflict would issue) now sees the true head
    lake.writeAtomicIfLatest(Seq((9L, "z")).toDF("id", "s"), "docs",
      expectedParent = Some(v2))
    assert(lake.read("docs").count() === 1)
  }

  test("stale-but-COMMITTED pointer (foreign/old-build writer artifact) " +
      "cannot starve an AvailableNow drain: the latched target overrides " +
      "the idle fast path until the backlog is fully processed") {
    import org.apache.spark.sql.functions.col
    val (base, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "s"), "docs")
    val v1 = lake.listVersions("docs").head
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "s"), "docs")
    lake.appendAtomic(Seq((3L, "c")).toDF("id", "s"), "docs")
    // a writer built BEFORE the pointer-before-marker ordering (or a
    // foreign tool) can crash leaving _LAST one or more commits behind
    // while still naming a COMMITTED dir — it verifies, so the O(1)
    // idle fast path alone would report "nothing new" at anchor v1 and
    // a rate-limited AvailableNow run would terminate mid-backlog
    writePointer(base, "docs", v1)
    val s2 = org.apache.spark.sql.NewspipeSqlBridge.sessionWithExtensions(
      spark, new newspipe.NewspipeExtensions()(_))
    s2.conf.set("spark.sql.catalog.hptr",
      classOf[LakeCatalog].getName)
    s2.conf.set("spark.sql.catalog.hptr.basePath", base)
    val ckpt = Files.createTempDirectory("hptr_ck").toString
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = s2.readStream
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1") // forces idle-path consults
      .table("hptr.docs")
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("id")).collect().foreach(r => rows.add(r.getLong(0)))
        ()
      }
      .start()
    assert(q.awaitTermination(120000), "drain must self-terminate")
    rows.toArray(Array.empty[java.lang.Long]).map(_.longValue).sorted shouldBe
      Array(1L, 2L, 3L)
    assert(readPointer(base, "docs") === v1,
      "no commit ran — the stale pointer artifact is still in place, " +
        "and the drain read THROUGH it via the authoritative listing")
  }

  test("vacuum keeps the pointer valid (head survives, file untouched)") {
    val (base, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "s"), "docs")
    (2 to 6).foreach(i =>
      lake.appendAtomic(Seq((i.toLong, "x")).toDF("id", "s"), "docs"))
    lake.checkpoint("docs") // release delta-chain pins so vacuum can bite
    val headCp = lake.listVersions("docs").head
    lake.vacuum("docs", keep = 1, orphanGraceMs = 0L)
    assert(readPointer(base, "docs") === headCp)
    assert(lake.headVersion("docs").contains(headCp))
    assert(lake.read("docs").count() === 6)
  }
}
