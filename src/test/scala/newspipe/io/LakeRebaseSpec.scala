package newspipe.io

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Logical conflict resolution for maintenance commits: an OPTIMIZE whose
  * rewritten file set is untouched by a racing commit REBASES onto the
  * new head (one staging pass, re-parented marker) instead of retrying
  * the bin-pack from scratch — Delta's conflict-matrix behavior for
  * compaction vs blind appends. Row ops keep strict retry semantics.
  */
class LakeRebaseSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpLake(): Lake = new Lake(spark,
    LakeConfig(basePath = Files.createTempDirectory("lake_rebase").toString))

  /** Arm the seam to run `body` exactly once, self-disarming FIRST so the
    * concurrent commit's own manifest write doesn't recurse.
    */
  private def onceBeforeCommit(lake: Lake)(body: => Unit): () => Int = {
    var fired = 0
    lake.onBeforeManifestCommit = () => {
      lake.onBeforeManifestCommit = () => ()
      fired += 1
      body
    }
    () => fired
  }

  test("OPTIMIZE racing a blind append lands in ONE pass, re-parented") {
    val lake = tmpLake()
    // 4 small files — all become the compaction's rewritten set
    lake.writeAtomic(spark.range(100).toDF("id").repartition(4), "t")
    val fired = onceBeforeCommit(lake) {
      lake.appendAtomic(spark.range(100, 120).toDF("id"), "t")
    }
    val appendVersionAfter = () => lake.listVersions("t")
    val r = lake.compactSmall("t", smallFileBytes = 32L * 1024 * 1024,
      targetFileBytes = 128L * 1024 * 1024)
    fired() shouldBe 1 // one staging pass — the bin-pack never re-ran
    assert(!r.noop)
    r.rewrittenFiles shouldBe 4
    // the union corpus: original 100 rows (compacted) + the racing 20
    lake.read("t").count() shouldBe 120L
    lake.read("t").agg(sum("id")).as[Long].head() shouldBe (0L until 120L).sum
    // history: head is the OPTIMIZE, its parent is the APPEND that won
    // the original race (the rebase re-parented the staged snapshot)
    val hist = lake.historyRows("t").map(r =>
      (r.getString(1), r.getString(2), r.getString(3)))
    hist.map(_._2) shouldBe Seq("WRITE", "APPEND", "OPTIMIZE")
    hist(2)._3 shouldBe hist(1)._1
  }

  test("rebase carries the racer's files by reference (no data rewrite)") {
    val lake = tmpLake()
    lake.writeAtomic(spark.range(50).toDF("id").repartition(2), "t")
    onceBeforeCommit(lake) {
      lake.appendAtomic(spark.range(50, 60).toDF("id"), "t")
    }
    lake.compactSmall("t")
    // the appended version dir's parquet survives un-rewritten and is
    // referenced by the head manifest (carry-by-reference, not a copy)
    val versions = lake.listVersions("t") // newest first
    val appendV = versions(1)
    val base = lake.describeDetail("t").location
    val appendFiles = new java.io.File(s"$base/_v/$appendV").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
    appendFiles should not be empty
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/_v/${versions.head}/_MANIFEST.json")),
      "UTF-8")
    appendFiles.foreach(fn => assert(manifest.contains(fn)))
  }

  test("incompatible racer (rewrote the same files) falls back to conflict") {
    val lake = tmpLake()
    lake.writeAtomic(spark.range(100).toDF("id").repartition(4), "t")
    onceBeforeCommit(lake) {
      // deletes rows from EVERY file → the racer rewrote the compaction's
      // input set; the staged bin-pack is stale and must not land
      lake.deleteWhere("t", col("id") % 2 === 0)
    }
    intercept[java.util.ConcurrentModificationException] {
      lake.compactSmall("t")
    }
    // correctness preserved: the delete's outcome is the head
    lake.read("t").count() shouldBe 50L
    // and a fresh (unraced) compaction applies cleanly on top
    val r = lake.compactSmall("t")
    lake.read("t").count() shouldBe 50L
    assert(!r.noop)
  }

  test("schema-evolving racer falls back to conflict") {
    val lake = tmpLake()
    lake.writeAtomic(spark.range(40).toDF("id").repartition(2), "t")
    onceBeforeCommit(lake) {
      lake.appendAtomic(spark.range(3).select(col("id"),
        lit("x").as("tag")), "t")
    }
    intercept[java.util.ConcurrentModificationException] {
      lake.compactSmall("t")
    }
    // the evolved corpus is intact
    lake.read("t").count() shouldBe 43L
    lake.read("t").schema.fieldNames should contain("tag")
  }

  test("row ops (DELETE) keep strict retry-from-scratch on a race") {
    val lake = tmpLake()
    lake.writeAtomic(spark.range(100).toDF("id").repartition(2), "t")
    onceBeforeCommit(lake) {
      lake.appendAtomic(spark.range(100, 200).toDF("id"), "t")
    }
    // the racing append adds rows the predicate ALSO matches — a rebase
    // would silently miss them; the strict path surfaces the conflict and
    // retryOnConflict re-runs the delete against the union (the appended
    // 100..199 all match and must die too)
    val deleted = lake.retryOnConflict() {
      lake.deleteWhere("t", col("id") >= 50)
    }
    lake.read("t").count() shouldBe 50L
    assert(!deleted.noop)
  }

  test("scoped OPTIMIZE WHERE rebases across an append to another partition") {
    val lake = tmpLake()
    val df = spark.range(60).select(col("id"),
      concat(lit("g"), col("id") % 3).as("p"))
    lake.writeAtomic(df.repartition(6), "t", partitionBy = Seq("p"))
    onceBeforeCommit(lake) {
      lake.appendAtomic(spark.range(60, 70).select(col("id"),
        lit("gz").as("p")), "t")
    }
    val r = lake.compactWhere("t", col("p") === "g1")
    assert(!r.noop)
    lake.read("t").count() shouldBe 70L
    lake.read("t").filter(col("p") === "gz").count() shouldBe 10L
    lake.historyRows("t").last.getString(2) shouldBe "OPTIMIZE"
  }

  test("APPEND losing the race to a sibling append REBASES: one staged " +
      "write, no increment rewrite, both increments land") {
    val lake = tmpLake()
    lake.writeAtomic(spark.range(100).toDF("id").repartition(2), "t")
    val fired = onceBeforeCommit(lake) {
      lake.appendAtomic(spark.range(100, 120).toDF("id"), "t")
    }
    lake.appendAtomic(spark.range(120, 150).toDF("id"), "t")
    fired() shouldBe 1
    lake.read("t").count() shouldBe 150L
    lake.read("t").agg(sum("id")).as[Long].head() shouldBe (0L until 150L).sum
    // history: WRITE, the sibling APPEND that won, then OUR append
    // re-parented onto it — three commits, no fourth (no full retry)
    val hist = lake.historyRows("t").map(r =>
      (r.getString(1), r.getString(2), r.getString(3)))
    hist.map(_._2) shouldBe Seq("WRITE", "APPEND", "APPEND")
    hist(2)._3 shouldBe hist(1)._1 // re-parented onto the winner
  }

  test("append rebase bails to the full retry when identity values were " +
      "allocated on BOTH sides — no id collision") {
    val lake = tmpLake()
    lake.addIdentityColumn("t", "rid")
    lake.writeAtomic(Seq("s1", "s2").toDF("text"), "t")
    onceBeforeCommit(lake) {
      lake.appendAtomic(Seq("w1", "w2", "w3").toDF("text"), "t")
    }
    // without the idHighs guard this would rebase and bake colliding rids;
    // the guard forces ConcurrentModificationException → caller retry
    lake.retryOnConflict() {
      lake.appendAtomic(Seq("l1", "l2").toDF("text"), "t")
    }
    val ids = lake.read("t").select("rid").as[Long].collect()
    ids.length shouldBe 7
    ids.distinct.length shouldBe 7 // every identity value unique
  }

  test("append rebase bails when the winner evolved the schema (the " +
      "retry re-evolves against the new head)") {
    val lake = tmpLake()
    lake.writeAtomic(spark.range(10).toDF("id"), "t")
    onceBeforeCommit(lake) {
      lake.appendAtomic(spark.range(10, 20).toDF("id")
        .withColumn("extra", lit("x")), "t")
    }
    lake.retryOnConflict() {
      lake.appendAtomic(spark.range(20, 30).toDF("id"), "t")
    }
    lake.read("t").count() shouldBe 30L
    lake.read("t").columns.sorted shouldBe Array("extra", "id")
  }
}
