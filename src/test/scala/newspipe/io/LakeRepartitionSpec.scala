package newspipe.io

import newspipe.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partition layout evolution ([[Lake.repartitionLayer]] /
  * `ALTER TABLE … SET PARTITIONED BY`): one atomic full-rewrite commit
  * into the new hive layout; pruning works on the NEW columns, history
  * and time travel keep serving the OLD layout, later appends land
  * inside the new directories.
  */
class LakeRepartitionSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpLake(): (Lake, String) = {
    val dir = Files.createTempDirectory("lake_repart").toString
    (new Lake(spark, LakeConfig(basePath = dir)), dir)
  }

  private def corpus: DataFrame =
    spark.range(120).select(col("id"),
      concat(lit("l"), col("id") % 3).as("lang"),
      concat(lit("s"), col("id") % 4).as("source"))

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
  }

  private def headDataDirs(dir: String, lake: Lake,
      layer: String): Seq[String] = {
    val head = new java.io.File(s"$dir/$layer/_v/" +
      lake.listVersions(layer).head)
    head.listFiles().filter(_.isDirectory).map(_.getName).toSeq
  }

  test("flat layer evolves to a partitioned layout; pruning + time travel") {
    val (lake, dir) = tmpLake()
    lake.writeAtomic(corpus.repartition(4), "docs")
    val v1 = lake.listVersions("docs").head
    lake.repartitionLayer("docs", Seq("lang"))
    // the new head is hive-partitioned on lang
    headDataDirs(dir, lake, "docs").count(_.startsWith("lang=")) shouldBe 3
    // pruning on the NEW layout: one lang value scans only its partition
    val total = scannedFiles(lake.read("docs"))
    val pruned = scannedFiles(lake.read("docs").filter(col("lang") === "l1"))
    assert(pruned < total, s"expected partition pruning, $pruned vs $total")
    lake.read("docs").count() shouldBe 120L
    // pre-evolution version still reads through its own (flat) layout
    lake.readVersion("docs", v1).count() shouldBe 120L
    lake.historyRows("docs").last.getString(2) shouldBe "OPTIMIZE"
  }

  test("partitioned layer re-partitions to different columns") {
    val (lake, dir) = tmpLake()
    lake.writeAtomic(corpus, "docs", partitionBy = Seq("lang"))
    lake.repartitionLayer("docs", Seq("source"))
    val dirs = headDataDirs(dir, lake, "docs")
    dirs.count(_.startsWith("source=")) shouldBe 4
    dirs.count(_.startsWith("lang=")) shouldBe 0
    lake.read("docs").count() shouldBe 120L
    lake.read("docs").filter(col("source") === "s2").count() shouldBe 30L
    // subsequent appends land INSIDE the new layout
    lake.appendAtomic(spark.range(120, 130).select(col("id"),
      lit("l9").as("lang"), lit("s9").as("source")), "docs")
    headDataDirs(dir, lake, "docs").count(_ == "source=s9") shouldBe 1
    lake.read("docs").count() shouldBe 130L
  }

  test("partitioned layer flattens with an empty column list") {
    val (lake, dir) = tmpLake()
    lake.writeAtomic(corpus, "docs", partitionBy = Seq("lang"))
    lake.repartitionLayer("docs", Nil)
    headDataDirs(dir, lake, "docs") shouldBe empty
    lake.read("docs").count() shouldBe 120L
    lake.read("docs").schema.fieldNames should contain("lang")
    lake.properties("docs").get("lake.partitionBy") shouldBe None
  }

  test("SET PARTITIONED BY statement + refusals") {
    val (lake, dir) = tmpLake()
    lake.writeAtomic(corpus.repartition(2), "docs")
    val row = LakeSql.sql(spark,
      s"ALTER TABLE lake.`$dir`.docs SET PARTITIONED BY (lang, source)")
      .collect().head
    row.getString(0) shouldBe "REPARTITION"
    headDataDirs(dir, lake, "docs").count(_.startsWith("lang=")) shouldBe 3
    lake.read("docs").filter(col("lang") === "l0" &&
      col("source") === "s0").count() shouldBe 10L
    // already in that layout → loud refusal
    intercept[IllegalArgumentException] {
      lake.repartitionLayer("docs", Seq("lang", "source"))
    }
    // unknown column → loud refusal
    intercept[IllegalArgumentException] {
      lake.repartitionLayer("docs", Seq("nope"))
    }
  }

  test("evolving to partition by a declared clustering key is refused " +
      "with the actual cause") {
    val (lake, _) = tmpLake()
    lake.writeAtomic(corpus.repartition(2), "docs")
    lake.setClusterBy("docs", Seq("lang"))
    val e = intercept[IllegalArgumentException] {
      lake.repartitionLayer("docs", Seq("lang"))
    }
    assert(e.getMessage.contains("lake.clusterBy"))
    // clearing the keys unblocks the evolution
    lake.setClusterBy("docs", Nil)
    lake.repartitionLayer("docs", Seq("lang"))
    lake.read("docs").count() shouldBe 120L
  }
}
