package newspipe.io

import newspipe.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Clustering keys (Delta liquid clustering's declaration role):
  * `setClusterBy` / `ALTER TABLE … CLUSTER BY` is metadata-only; every
  * OPTIMIZE form then z-orders what it rewrites by the declared keys, so
  * routine maintenance converges the layout — and stats pruning on the
  * clustered columns actually skips files afterwards.
  */
class LakeClusterBySpec extends SparkTestBase {
  import spark.implicits._

  private def newLake(): (Lake, String) = {
    val dir = Files.createTempDirectory("lake_cluster").toString
    (new Lake(spark, LakeConfig(basePath = dir)), dir)
  }

  /** Rows deliberately ANTI-clustered on x: round-robin partitions put
    * every x range in every file, so min/max stats can never prune until
    * a clustering pass rewrites the layout.
    */
  private def antiClustered: DataFrame =
    spark.range(4000).select(col("id"),
      (col("id") % 97).as("x"), (col("id") % 13).as("y"))
      .repartition(8)

  private def prunedFiles(lake: Lake, layer: String,
      pred: org.apache.spark.sql.Column): (Int, Int) = {
    val info = lake.pruneInfo(layer, pred)
      .getOrElse(fail("layer must carry a stats sidecar"))
    (info.keptFiles, info.totalFiles)
  }

  test("declaration is metadata-only; OPTIMIZE converges the layout and " +
      "stats pruning starts skipping") {
    val (lake, _) = newLake()
    lake.writeAtomic(antiClustered, "docs")
    val versionsBefore = lake.listVersions("docs").size
    lake.setClusterBy("docs", Seq("x"))
    // declaring rewrote nothing
    lake.listVersions("docs").size shouldBe versionsBefore
    lake.clusterByCols("docs") shouldBe Seq("x")
    // anti-clustered: a narrow x predicate keeps every file
    val (keptBefore, totalBefore) = prunedFiles(lake, "docs", col("x") === 5)
    keptBefore shouldBe totalBefore
    // plain OPTIMIZE (no ZORDER BY) picks the declared keys up
    lake.compact("docs", targetFileBytes = 16 * 1024)
    lake.historyRows("docs").last.getString(2) shouldBe "OPTIMIZE ZORDER"
    val (keptAfter, totalAfter) = prunedFiles(lake, "docs", col("x") === 5)
    assert(totalAfter > 1, "need a multi-file layout to prove skipping")
    assert(keptAfter < totalAfter,
      s"clustered layout must prune: kept $keptAfter of $totalAfter")
    lake.read("docs").count() shouldBe 4000L
  }

  test("compactSmall (incremental OPTIMIZE) also arranges by the keys") {
    val (lake, _) = newLake()
    lake.writeAtomic(antiClustered, "docs")
    lake.setClusterBy("docs", Seq("x"))
    // every sliver is "small"; the tight target forces a multi-bin
    // (multi-file) clustered output so skipping is observable
    val r = lake.compactSmall("docs",
      smallFileBytes = 16 * 1024,
      targetFileBytes = 16 * 1024)
    assert(!r.noop && r.rewrittenFiles >= 8)
    val (kept, total) = prunedFiles(lake, "docs", col("x") === 5)
    assert(total > 1 && kept < total,
      s"incremental pass must cluster: kept $kept of $total")
  }

  test("explicit ZORDER BY overrides the declaration; NONE clears it") {
    val (lake, _) = newLake()
    lake.writeAtomic(antiClustered, "docs")
    lake.setClusterBy("docs", Seq("x"))
    lake.compact("docs", targetFileBytes = 16 * 1024, zorderBy = Seq("y"))
    val (keptY, totalY) = prunedFiles(lake, "docs", col("y") === 3)
    assert(keptY < totalY, "explicit keys must win")
    lake.setClusterBy("docs", Nil) // CLUSTER BY NONE
    lake.clusterByCols("docs") shouldBe Nil
    lake.compact("docs", targetFileBytes = 16 * 1024)
    lake.historyRows("docs").last.getString(2) shouldBe "OPTIMIZE"
  }

  test("refusals: unknown column, duplicate keys, partition column") {
    val (lake, _) = newLake()
    lake.writeAtomic(spark.range(40).select(col("id"),
      (col("id") % 2).cast("string").as("p")), "t",
      partitionBy = Seq("p"))
    intercept[IllegalArgumentException] {
      lake.setClusterBy("t", Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      lake.setClusterBy("t", Seq("id", "id"))
    }
    intercept[IllegalArgumentException] {
      lake.setClusterBy("t", Seq("p"))
    }
  }

  test("SQL surface: ALTER TABLE … CLUSTER BY (cols) / CLUSTER BY NONE") {
    val (lake, dir) = newLake()
    lake.writeAtomic(antiClustered, "docs")
    val row = LakeSql.sql(spark,
      s"ALTER TABLE lake.`$dir`.docs CLUSTER BY (x, y)").collect().head
    row.getString(0) shouldBe "CLUSTER BY"
    lake.clusterByCols("docs") shouldBe Seq("x", "y")
    LakeSql.sql(spark,
      s"OPTIMIZE lake.`$dir`.docs").collect()
      .head.getString(0) shouldBe "OPTIMIZE"
    lake.historyRows("docs").last.getString(2) shouldBe "OPTIMIZE ZORDER"
    LakeSql.sql(spark,
      s"ALTER TABLE lake.`$dir`.docs CLUSTER BY NONE").collect()
      .head.getString(1) shouldBe "NONE"
    lake.clusterByCols("docs") shouldBe Nil
  }

  test("lake.targetFileBytes property sizes the SQL OPTIMIZE output " +
      "(delta.targetFileSize role)") {
    val (lake, dir) = newLake()
    lake.writeAtomic(antiClustered, "docs")
    // default 128MB target → everything packs into one file
    LakeSql.sql(spark, s"OPTIMIZE lake.`$dir`.docs").collect()
    lake.describeDetail("docs").numFiles shouldBe 1
    // a tight declared target → multi-file output from the SAME statement
    lake.setProperties("docs", Map("lake.targetFileBytes" -> "16384"))
    LakeSql.sql(spark, s"OPTIMIZE lake.`$dir`.docs").collect()
    assert(lake.describeDetail("docs").numFiles > 1)
    lake.read("docs").count() shouldBe 4000L
  }

  test("catalog surface: CREATE TABLE … CLUSTER BY + TableChange.ClusterBy") {
    val (lake, dir) = newLake()
    spark.conf.set("spark.sql.catalog.clcat", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.clcat.basePath", dir)
    spark.sql(
      "CREATE TABLE clcat.t (id BIGINT, x BIGINT, y BIGINT) CLUSTER BY (x)")
    lake.clusterByCols("t") shouldBe Seq("x")
    spark.sql("ALTER TABLE clcat.t CLUSTER BY (y)")
    lake.clusterByCols("t") shouldBe Seq("y")
  }
}
