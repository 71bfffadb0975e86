package newspipe.io

import java.nio.file.Files

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** Predicate-scoped atomic overwrite ([[Lake.overwriteWhere]] — Delta's
  * `replaceWhere`) and its SQL spellings (`INSERT INTO … REPLACE WHERE`,
  * `INSERT OVERWRITE … PARTITION (k=v)`): the region's files rewrite,
  * everything else rides the manifest by reference, incoming rows outside
  * the region refuse loudly, and the whole thing is one parent-checked
  * commit.
  */
class LakeReplaceWhereSpec extends SparkTestBase {
  import spark.implicits._

  private def newLake(): (String, Lake) = {
    val base = Files.createTempDirectory("lake_rw").toString
    (base, new Lake(spark, LakeConfig(basePath = base)))
  }

  test("partitioned layer: one partition rewrites, the rest carry; " +
      "result = complement ∪ new data") {
    val (_, lake) = newLake()
    lake.writeAtomic(Seq(
      (1L, "a", 10), (2L, "a", 20),
      (3L, "b", 30), (4L, "b", 40),
      (5L, "c", 50)).toDF("id", "k", "v"),
      "t", partitionBy = Seq("k"))
    val r = lake.overwriteWhere("t",
      Seq((30L, "b", 300), (31L, "b", 310)).toDF("id", "k", "v"),
      col("k") === "b")
    r.noop shouldBe false
    // hive layout: exactly partition b's file(s) rewrite
    r.rewrittenFiles should be >= 1
    r.carriedFiles should be >= 2 // a and c ride by reference
    // hive layout moves the partition column last — select explicitly
    lake.read("t").select("id", "k", "v").orderBy("id")
      .as[(Long, String, Int)].collect() shouldBe
      Array((1L, "a", 10), (2L, "a", 20), (5L, "c", 50),
        (30L, "b", 300), (31L, "b", 310))
    // the layout survives: partition b's new rows sit under k=b
    lake.partitionValues("t").map(_.head).toSet shouldBe
      Set(Some("a"), Some("b"), Some("c"))
  }

  test("non-partition predicate: stats pruning keeps untouched ranges " +
      "by reference") {
    val (_, lake) = newLake()
    lake.writeAtomic((1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartitionByRange(10, $"id").sortWithinPartitions("id"), "t")
    val r = lake.overwriteWhere("t",
      Seq((50L, "NEW")).toDF("id", "v"), col("id").between(1L, 100L))
    r.rewrittenFiles should be <= 2 // ~1 range file holds ids 1-100
    r.carriedFiles should be >= 8
    val out = lake.read("t")
    out.count() shouldBe 901L // 900 untouched + 1 new
    out.filter($"id" <= 100L).as[(Long, String)].collect() shouldBe
      Array((50L, "NEW"))
  }

  test("incoming rows OUTSIDE the predicate refuse loudly (Delta's " +
      "replaceWhere data contract); NULL-predicate rows count as outside") {
    val (_, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), "t")
    intercept[IllegalArgumentException] {
      lake.overwriteWhere("t",
        Seq((9L, "c")).toDF("id", "k"), col("k") === "b")
    }.getMessage should include("violate the replace predicate")
    // NULL evaluates the predicate to NULL → outside the region
    intercept[IllegalArgumentException] {
      lake.overwriteWhere("t",
        Seq((9L, null.asInstanceOf[String])).toDF("id", "k"),
        col("k") === "b")
    }.getMessage should include("violate the replace predicate")
    // nothing landed
    lake.read("t").count() shouldBe 2L
  }

  test("empty source clears the region (REPLACE WHERE … of nothing) and " +
      "existing NULL-predicate rows SURVIVE the delete leg") {
    val (_, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a"), (2L, "b"),
      (3L, null.asInstanceOf[String])).toDF("id", "k"), "t")
    lake.overwriteWhere("t",
      Seq.empty[(Long, String)].toDF("id", "k"), col("k") === "b")
    // SQL delete semantics: only predicate-TRUE rows go; NULL keeps
    lake.read("t").select("id").as[Long].collect().sorted shouldBe
      Array(1L, 3L)
  }

  test("SQL spellings through the catalog: INSERT INTO … REPLACE WHERE, " +
      "INSERT OVERWRITE … PARTITION (k=v), and full INSERT OVERWRITE") {
    val (base, lake) = newLake()
    spark.conf.set("spark.sql.catalog.rwcat", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.rwcat.basePath", base)
    spark.sql("CREATE TABLE rwcat.t (id BIGINT, v INT, k STRING) " +
      "PARTITIONED BY (k)")
    spark.sql("INSERT INTO rwcat.t VALUES (1, 10, 'a'), (2, 20, 'b'), " +
      "(3, 30, 'c')")
    // REPLACE WHERE: only the b region is replaced
    spark.sql("INSERT INTO rwcat.t REPLACE WHERE k = 'b' " +
      "VALUES (20, 200, 'b')")
    spark.sql("SELECT id, v, k FROM rwcat.t ORDER BY id")
      .as[(Long, Int, String)].collect() shouldBe
      Array((1L, 10, "a"), (3L, 30, "c"), (20L, 200, "b"))
    // static-partition INSERT OVERWRITE: the daily re-land idiom
    spark.sql("INSERT OVERWRITE rwcat.t PARTITION (k = 'c') " +
      "SELECT 33L AS id, 333 AS v")
    spark.sql("SELECT id, v, k FROM rwcat.t ORDER BY id")
      .as[(Long, Int, String)].collect() shouldBe
      Array((1L, 10, "a"), (20L, 200, "b"), (33L, 333, "c"))
    // history records the scoped commits distinctly from full overwrites
    lake.historyRows("t").map(_.getString(2))
      .count(_ == "REPLACE WHERE") shouldBe 2
    // full overwrite still truncates the whole table atomically
    spark.sql("INSERT OVERWRITE rwcat.t VALUES (9, 90, 'z')")
    spark.sql("SELECT id, v, k FROM rwcat.t")
      .as[(Long, Int, String)].collect() shouldBe Array((9L, 90, "z"))
  }

  test("REPLACE WHERE rows violating the region refuse through SQL too") {
    val (base, _) = newLake()
    spark.conf.set("spark.sql.catalog.rwcat2", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.rwcat2.basePath", base)
    spark.sql("CREATE TABLE rwcat2.t (id BIGINT, k STRING)")
    spark.sql("INSERT INTO rwcat2.t VALUES (1, 'a')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO rwcat2.t REPLACE WHERE k = 'b' " +
        "VALUES (2, 'zzz')")
    }
    e.getMessage should include("violate the replace predicate")
    spark.sql("SELECT count(*) FROM rwcat2.t").as[Long].head() shouldBe 1L
  }

  test("DYNAMIC partition overwrite: exactly the increment's partitions " +
      "replace; untouched partitions carry; empty increment is a NOOP " +
      "(never a truncate); unpartitioned layers refuse") {
    val (_, lake) = newLake()
    lake.writeAtomic(Seq(
      (1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "k", "v"),
      "t", partitionBy = Seq("k"))
    val r = lake.overwritePartitionsDynamic("t",
      Seq((20L, "b", 200), (40L, "d", 400)).toDF("id", "k", "v"))
    r.noop shouldBe false
    r.carriedFiles should be >= 2 // a and c by reference
    // b replaced, d created, a and c untouched
    lake.read("t").select("id", "k", "v").orderBy("id")
      .as[(Long, String, Int)].collect() shouldBe
      Array((1L, "a", 10), (3L, "c", 30), (20L, "b", 200), (40L, "d", 400))
    lake.historyRows("t").last.getString(2) shouldBe "DYNAMIC OVERWRITE"
    // zero-row increment: Hive's contract — nothing replaced
    lake.overwritePartitionsDynamic("t",
      Seq.empty[(Long, String, Int)].toDF("id", "k", "v")).noop shouldBe true
    lake.read("t").count() shouldBe 4L
    // unpartitioned layer refuses (dynamic has nothing to derive)
    lake.writeAtomic(Seq((1L, "x")).toDF("id", "k"), "flat")
    intercept[IllegalArgumentException] {
      lake.overwritePartitionsDynamic("flat", Seq((2L, "y")).toDF("id", "k"))
    }.getMessage should include("not partitioned")
  }

  test("SQL: INSERT OVERWRITE under partitionOverwriteMode=dynamic " +
      "replaces only the produced partitions; static mode still truncates") {
    val (base, lake) = newLake()
    spark.conf.set("spark.sql.catalog.rwdyn", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.rwdyn.basePath", base)
    spark.sql("CREATE TABLE rwdyn.t (id BIGINT, v INT, k STRING) " +
      "PARTITIONED BY (k)")
    spark.sql("INSERT INTO rwdyn.t VALUES (1, 10, 'a'), (2, 20, 'b'), " +
      "(3, 30, 'c')")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      spark.sql("INSERT OVERWRITE rwdyn.t VALUES (22, 220, 'b')")
      spark.sql("SELECT id, v, k FROM rwdyn.t ORDER BY id")
        .as[(Long, Int, String)].collect() shouldBe
        Array((1L, 10, "a"), (3L, 30, "c"), (22L, 220, "b"))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // static (default) mode: full truncate-and-write, unchanged
    spark.sql("INSERT OVERWRITE rwdyn.t VALUES (9, 90, 'z')")
    spark.sql("SELECT id, v, k FROM rwdyn.t")
      .as[(Long, Int, String)].collect() shouldBe Array((9L, 90, "z"))
  }

  test("row ops compose: overwriteWhere on a deletion-vector-bearing " +
      "region materializes through the parent's DVs (no resurrection)") {
    val (_, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k"),
      "t", partitionBy = Seq("k"))
    lake.setProperties("t", Map("lake.enableDeletionVectors" -> "true"))
    lake.deleteWhere("t", col("id") === 1L) // lands as a DV, no rewrite
    // replace region a: the DV'd row 1 must NOT resurrect into the
    // complement — only row 2 was alive there, and it gets replaced
    lake.overwriteWhere("t", Seq((20L, "a")).toDF("id", "k"),
      col("k") === "a")
    lake.read("t").select("id").as[Long].collect().sorted shouldBe
      Array(3L, 20L)
  }

  test("NONDETERMINISTIC increment (rand()-filtered source): the per-row " +
      "write gate refuses or lands a fully-conforming sample — rows " +
      "outside the region can NEVER land") {
    val (_, lake) = newLake()
    lake.writeAtomic(Seq(
      (1L, "in", 10), (2L, "out", 20)).toDF("id", "k", "v"), "t")
    // violators appear per-EVALUATION with p=0.5 each: a pre-probe could
    // sample an all-conforming frame while the write lands a violator
    // (round-16's double-evaluation hazard); the write-time gate checks
    // exactly the rows being written, so across many attempts the
    // invariant must hold every single time
    val conforming = Seq((10L, "in", 100), (11L, "in", 110))
      .toDF("id", "k", "v")
    val violators = Seq((90L, "out", 900), (91L, "out", 910))
      .toDF("id", "k", "v")
    (1 to 8).foreach { _ =>
      val inc = violators.filter(rand() < 0.5).unionAll(conforming)
      try {
        lake.overwriteWhere("t", inc, col("k") === "in")
        // landed: every written row must be inside the region
        lake.read("t").filter(col("k") =!= "in" && col("id") >= 10L)
          .count() shouldBe 0L
      } catch {
        case e: IllegalArgumentException =>
          e.getMessage should include("replace predicate")
      }
      // in BOTH outcomes the out-of-region base row is intact and no
      // out-of-region increment row ever landed
      lake.read("t").filter(col("k") === "out")
        .select("id").as[Long].collect().sorted shouldBe Array(2L)
    }
  }

  test("NONDETERMINISTIC increment (rand()-filtered partitions): dynamic " +
      "overwrite derives and lands ONE evaluation — a partition is " +
      "either fully replaced or untouched, never blended") {
    val (_, lake) = newLake()
    val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
    (1 to 8).foreach { i =>
      val layer = s"dyn$i"
      lake.writeAtomic(Seq(
        (1L, "a", 10), (2L, "b", 20), (3L, "d", 30)).toDF("id", "k", "v"),
        layer, partitionBy = Seq("k"))
      // the d-partition row appears per-evaluation with p=0.5: deriving
      // {b} then landing {b, d} would blend old and new rows inside d
      val inc = Seq((40L, "d", 400)).toDF("id", "k", "v")
        .filter(rand() < 0.5)
        .unionAll(Seq((20L, "b", 200)).toDF("id", "k", "v"))
      lake.overwritePartitionsDynamic(layer, inc)
      val dIds = lake.read(layer).filter(col("k") === "d")
        .select("id").as[Long].collect().sorted.toSeq
      // replaced entirely (40) or untouched (3) — NEVER both
      Seq(Seq(3L), Seq(40L)) should contain(dIds)
      // b always replaced, a always carried
      lake.read(layer).filter(col("k") === "b")
        .select("id").as[Long].collect().sorted shouldBe Array(20L)
      lake.read(layer).filter(col("k") === "a")
        .select("id").as[Long].collect().sorted shouldBe Array(1L)
    }
    // the 8 materialized increments released their checkpoint blocks —
    // a leak here pins block-manager memory for the session's lifetime
    (spark.sparkContext.getPersistentRDDs.keySet -- rddsBefore) shouldBe
      empty
  }

  test("COMPOSITE partition columns: tuple-digest membership is EXACT — " +
      "cross-product tuples the increment never held stay untouched " +
      "(per-column IN sets alone would clear them)") {
    val (_, lake) = newLake()
    lake.writeAtomic(Seq(
      (1L, "x", 1, 10), (2L, "x", 2, 20),
      (3L, "y", 1, 30), (4L, "y", 2, 40)).toDF("id", "a", "b", "v"),
      "t", partitionBy = Seq("a", "b"))
    // increment touches (x,1) and (y,2): the per-column value sets are
    // a∈{x,y}, b∈{1,2} — a set-conjunction predicate would also clear
    // (x,2) and (y,1); the digest membership must not
    val r = lake.overwritePartitionsDynamic("t", Seq(
      (10L, "x", 1, 100), (40L, "y", 2, 400)).toDF("id", "a", "b", "v"))
    r.noop shouldBe false
    r.carriedFiles should be >= 2 // (x,2) and (y,1) by reference
    lake.read("t").select("id", "a", "b", "v").orderBy("id")
      .as[(Long, String, Int, Int)].collect() shouldBe Array(
      (2L, "x", 2, 20), (3L, "y", 1, 30),
      (10L, "x", 1, 100), (40L, "y", 2, 400))
    // null partition value round-trips through the digest (hive default
    // partition): replacing the (x, null) tuple touches nothing else
    lake.writeAtomic(Seq[(Long, String, Option[Int], Int)](
      (1L, "x", Some(1), 10), (2L, "x", None, 20),
      (3L, "y", Some(1), 30)).toDF("id", "a", "b", "v"),
      "tn", partitionBy = Seq("a", "b"))
    lake.overwritePartitionsDynamic("tn",
      Seq[(Long, String, Option[Int], Int)]((20L, "x", None, 200))
        .toDF("id", "a", "b", "v"))
    lake.read("tn").select("id").as[Long].collect().sorted shouldBe
      Array(1L, 3L, 20L)
  }

  test("concurrent commit bounces with ConcurrentModificationException " +
      "(parent-checked), retryOnConflict lands it") {
    val (_, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), "t")
    // inject a sibling commit between read and commit via the seam
    // (self-disarm FIRST or the sibling's own commit recurses)
    lake.onBeforeManifestCommit = () => {
      lake.onBeforeManifestCommit = () => ()
      lake.appendAtomic(Seq((7L, "x")).toDF("id", "k"), "t")
    }
    try {
      // row ops keep strict retry-from-scratch (no rebase): the retry
      // re-evaluates the predicate against the concurrently added file
      lake.retryOnConflict() {
        lake.overwriteWhere("t", Seq((20L, "b")).toDF("id", "k"),
          col("k") === "b")
      }
    } finally lake.onBeforeManifestCommit = () => ()
    lake.read("t").select("id").as[Long].collect().sorted shouldBe
      Array(1L, 7L, 20L)
  }
}
