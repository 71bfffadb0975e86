package newspipe.io

import java.nio.file.Files

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** Column mapping (Delta's columnMapping.mode=name): RENAME/DROP COLUMN as
  * metadata-only commits — carried files keep reading correctly through
  * the logical→physical name map, across row ops, restore and time travel.
  */
class LakeColumnMappingSpec extends SparkTestBase {
  import spark.implicits._

  private def mappedLake(): (Lake, String) = {
    val dir = Files.createTempDirectory("lakecm").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic(
      Seq((1L, "alpha", 10), (2L, "beta", 20), (3L, "gamma", 30))
        .toDF("id", "txt", "n"), "docs")
    lake.setProperties("docs", Map("lake.columnMapping.mode" -> "name"))
    (lake, dir)
  }

  test("rename/drop are refused without the mapping flag") {
    val dir = Files.createTempDirectory("lakecm_off").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "txt"), "docs")
    val e = intercept[IllegalArgumentException] {
      lake.renameColumn("docs", "txt", "body")
    }
    e.getMessage should include("lake.columnMapping.mode")
    intercept[IllegalArgumentException] { lake.dropColumn("docs", "txt") }
  }

  test("RENAME COLUMN is metadata-only: zero data files, history reads on") {
    val (lake, dir) = mappedLake()
    val before = lake.listVersions("docs").toSet
    lake.renameColumn("docs", "txt", "body")
    lake.read("docs").columns.toSeq shouldBe Seq("id", "body", "n")
    lake.read("docs").orderBy("id").select("body").as[String].collect() shouldBe
      Array("alpha", "beta", "gamma")
    // the rename commit carries no data files
    val renameV = (lake.listVersions("docs").toSet -- before).head
    val vDir = new java.io.File(s"$dir/docs/_v/$renameV")
    vDir.listFiles().map(_.getName).filter(n =>
      !n.startsWith("_") && !n.startsWith(".")) shouldBe empty
    // time travel: the pre-rename snapshot still answers to the OLD name
    val v1 = lake.listVersions("docs").sorted.head
    lake.readVersion("docs", v1).columns.toSeq shouldBe Seq("id", "txt", "n")
    // DESCRIBE HISTORY labels the commit
    lake.historyRows("docs").map(_.getString(2)).last shouldBe "RENAME COLUMN"
  }

  test("row ops keep working on a renamed column (delete/update/append/merge)") {
    val (lake, _) = mappedLake()
    lake.renameColumn("docs", "txt", "body")
    lake.deleteWhere("docs", col("body") === "beta")
    lake.read("docs").select("body").as[String].collect().sorted shouldBe
      Array("alpha", "gamma")
    lake.updateWhere("docs", col("id") === 1L,
      Map("body" -> concat(col("body"), lit("!"))))
    lake.read("docs").orderBy("id").select("body").as[String].collect() shouldBe
      Array("alpha!", "gamma")
    lake.appendAtomic(Seq((4L, "delta", 40)).toDF("id", "body", "n"), "docs")
    lake.read("docs").count() shouldBe 3L
    lake.mergeInto("docs",
      Seq((3L, "GAMMA", 33), (5L, "eps", 50)).toDF("id", "body", "n"),
      Seq("id"))
    lake.read("docs").orderBy("id").as[(Long, String, Int)].collect() shouldBe
      Array((1L, "alpha!", 10), (3L, "GAMMA", 33), (4L, "delta", 40),
        (5L, "eps", 50))
    // readWhere stays correct (pruning is off under mapping, read+filter)
    lake.readWhere("docs", col("body") === "eps")
      .select("id").as[Long].collect() shouldBe Array(5L)
  }

  test("rename chain and rename-back collapse the mapping") {
    val (lake, _) = mappedLake()
    lake.renameColumn("docs", "txt", "body")
    lake.renameColumn("docs", "body", "content")
    lake.read("docs").columns.toSeq shouldBe Seq("id", "content", "n")
    lake.read("docs").orderBy("id").select("content").as[String]
      .collect() shouldBe Array("alpha", "beta", "gamma")
    lake.renameColumn("docs", "content", "txt") // back to the file name
    lake.read("docs").columns.toSeq shouldBe Seq("id", "txt", "n")
    // name reuse: free the original, then move another column onto it
    lake.renameColumn("docs", "txt", "body")
    lake.renameColumn("docs", "n", "txt") // logical txt now = physical n!
    lake.read("docs").orderBy("id").select("txt").as[Int].collect() shouldBe
      Array(10, 20, 30)
    lake.read("docs").orderBy("id").select("body").as[String]
      .collect() shouldBe Array("alpha", "beta", "gamma")
  }

  test("swap renames: logical name equal to another column's physical name") {
    // Mapping {a->b, c->a}: a sequential rename fold would collide
    // mid-fold (renaming physical b to logical a while physical a is
    // still present duplicates the name); toLogical must be one select.
    val dir = Files.createTempDirectory("lakecm_swap").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic(Seq((1, 10), (2, 20)).toDF("a", "b"), "docs")
    lake.setProperties("docs", Map("lake.columnMapping.mode" -> "name"))
    lake.renameColumn("docs", "a", "c") // mapping {c->a}
    lake.renameColumn("docs", "b", "a") // mapping {a->b, c->a}
    lake.read("docs").columns.toSeq.sorted shouldBe Seq("a", "c")
    lake.read("docs").orderBy("c").select("c", "a")
      .as[(Int, Int)].collect() shouldBe Array((1, 10), (2, 20))
    // full cycle: a->tmp, b->a, tmp->b (the classic swap)
    lake.renameColumn("docs", "a", "tmp") // {tmp->b, c->a}
    lake.renameColumn("docs", "c", "b")   // {tmp->b, b->a}
    lake.renameColumn("docs", "tmp", "c") // {c->b, b->a}
    lake.read("docs").orderBy("b").select("b", "c")
      .as[(Int, Int)].collect() shouldBe Array((1, 10), (2, 20))
    // row ops still function through the swapped mapping
    lake.deleteWhere("docs", col("c") === 20)
    lake.read("docs").select("b").as[Int].collect() shouldBe Array(1)
  }

  test("DROP COLUMN is metadata-only; re-adding the name is refused until compact") {
    val (lake, _) = mappedLake()
    lake.dropColumn("docs", "n")
    lake.read("docs").columns.toSeq shouldBe Seq("id", "txt")
    // re-adding 'n' via evolving append would resurrect old file values
    val e = intercept[IllegalArgumentException] {
      lake.appendAtomic(Seq((9L, "z", 999)).toDF("id", "txt", "n"), "docs")
    }
    e.getMessage should include("resurrect")
    // compact rewrites files (drop materialized) -> re-add is clean
    lake.compact("docs")
    lake.appendAtomic(Seq((9L, "z", 999)).toDF("id", "txt", "n"), "docs")
    lake.read("docs").orderBy("id").select("n").collect().map(r =>
      if (r.isNullAt(0)) -1 else r.getInt(0)) shouldBe Array(-1, -1, -1, 999)
  }

  test("restore across a rename restores the old logical schema") {
    val (lake, _) = mappedLake()
    val preRename = lake.listVersions("docs").sorted.head
    lake.renameColumn("docs", "txt", "body")
    lake.deleteWhere("docs", col("id") === 2L)
    lake.restore("docs", preRename)
    lake.read("docs").columns.toSeq shouldBe Seq("id", "txt", "n")
    lake.read("docs").count() shouldBe 3L
    lake.historyRows("docs").map(_.getString(2)) shouldBe
      Seq("WRITE", "RENAME COLUMN", "DELETE", "RESTORE")
  }

  test("deletion vectors + rename compose") {
    val (lake, _) = mappedLake()
    lake.setProperties("docs", Map("lake.enableDeletionVectors" -> "true"))
    lake.renameColumn("docs", "txt", "body")
    lake.deleteWhere("docs", col("body") === "beta") // DV path, mapped read
    lake.deletionVectors("docs") should not be empty
    lake.read("docs").select("body").as[String].collect().sorted shouldBe
      Array("alpha", "gamma")
    // change feed across the DV delete still attributes the delete
    val vs = lake.listVersions("docs").sorted
    val feed = lake.changeFeed("docs", vs(vs.size - 2), vs.last)
    feed.filter(col("_change_type") === "delete")
      .select("body").as[String].collect() shouldBe Array("beta")
  }

  test("stats pruning stays exact under mapping, incl. physical-name reuse") {
    val dir = Files.createTempDirectory("lakecm_prune").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    // 4 range-clustered files so a selective predicate can prune
    lake.writeAtomic((1 to 100).map(i => (i.toLong, s"t$i", i))
      .toDF("id", "txt", "n")
      .repartitionByRange(4, col("n")).sortWithinPartitions("n"), "docs")
    lake.setProperties("docs", Map("lake.columnMapping.mode" -> "name"))
    lake.renameColumn("docs", "txt", "body")
    lake.renameColumn("docs", "n", "txt") // logical txt = PHYSICAL n (ints)
    // readWhere on the REUSED logical name: must consult physical-n stats
    lake.readWhere("docs", col("txt") <= 10)
      .select("id").as[Long].collect().sorted shouldBe (1L to 10L).toArray
    // ...and actually skip files, not degrade to a full scan
    val info = lake.pruneInfo("docs", col("txt") <= 10)
    info shouldBe defined
    info.get.keptFiles should be < info.get.totalFiles
    // row ops prune on the translated predicate too: a top-range delete
    // must carry the untouched low-range files by reference
    val r = lake.deleteWhere("docs", col("txt") > 90)
    r.carriedFiles should be > 0
    lake.read("docs").count() shouldBe 90L
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN through the recognizer") {
    val (lake, dir) = mappedLake()
    val s2 = org.apache.spark.sql.NewspipeSqlBridge.sessionWithExtensions(
      spark, new newspipe.NewspipeExtensions()(_))
    s2.sql(s"ALTER TABLE lake.`$dir`.docs RENAME COLUMN txt TO body")
    lake.read("docs").columns.toSeq shouldBe Seq("id", "body", "n")
    s2.sql(s"ALTER TABLE lake.`$dir`.docs DROP COLUMN n")
    lake.read("docs").columns.toSeq shouldBe Seq("id", "body")
    lake.read("docs").orderBy("id").select("body")
      .as[String].collect() shouldBe Array("alpha", "beta", "gamma")
  }

  test("catalog surface: ALTER TABLE RENAME/DROP COLUMN via TableChange") {
    val (lake, dir) = mappedLake()
    spark.conf.set("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
    spark.sql(s"ALTER TABLE lake.`$dir`.docs RENAME COLUMN txt TO body")
    lake.read("docs").columns.toSeq shouldBe Seq("id", "body", "n")
    spark.sql(s"ALTER TABLE lake.`$dir`.docs DROP COLUMN n")
    lake.read("docs").columns.toSeq shouldBe Seq("id", "body")
  }

  test("partition columns refuse rename/drop") {
    val dir = Files.createTempDirectory("lakecm_part").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic(Seq((1L, "en", "a"), (2L, "fr", "b"))
      .toDF("id", "lang", "txt"), "docs", partitionBy = Seq("lang"))
    lake.setProperties("docs", Map("lake.columnMapping.mode" -> "name"))
    val e = intercept[IllegalArgumentException] {
      lake.renameColumn("docs", "lang", "language")
    }
    e.getMessage should include("partition")
    intercept[IllegalArgumentException] { lake.dropColumn("docs", "lang") }
  }

  test("ADD COLUMN is metadata-only: old files read null, appends fill") {
    val (lake, dir) = mappedLake()
    val before = lake.listVersions("docs").toSet
    lake.addColumn("docs", "score", org.apache.spark.sql.types.DoubleType)
    lake.read("docs").columns.toSeq shouldBe Seq("id", "txt", "n", "score")
    lake.read("docs").select("score").collect()
      .forall(_.isNullAt(0)) shouldBe true
    // the ADD commit carries no data files
    val addV = (lake.listVersions("docs").toSet -- before).head
    new java.io.File(s"$dir/docs/_v/$addV").listFiles().map(_.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith(".")) shouldBe empty
    lake.historyRows("docs").map(_.getString(2)).last shouldBe "ADD COLUMN"
    // appends fill the new column; carried rows stay null
    lake.appendAtomic(
      Seq((9L, "zeta", 90, 0.5)).toDF("id", "txt", "n", "score"), "docs")
    lake.read("docs").orderBy("id").select("score").collect().map(r =>
      if (r.isNullAt(0)) -1.0 else r.getDouble(0)) shouldBe
      Array(-1.0, -1.0, -1.0, 0.5)
    // row ops keep working through the evolved schema
    lake.deleteWhere("docs", col("score").isNull && col("id") === 2L)
    lake.read("docs").count() shouldBe 3L
    // duplicate name (case-insensitive) refused
    intercept[IllegalArgumentException] {
      lake.addColumn("docs", "TXT", org.apache.spark.sql.types.StringType)
    }
  }

  test("ADD COLUMN of a dropped name is refused until compact materializes") {
    val (lake, _) = mappedLake()
    lake.dropColumn("docs", "n")
    val e = intercept[IllegalArgumentException] {
      lake.addColumn("docs", "n", org.apache.spark.sql.types.IntegerType)
    }
    e.getMessage should include("resurrect")
    lake.compact("docs")
    lake.addColumn("docs", "n", org.apache.spark.sql.types.IntegerType)
    lake.read("docs").select("n").collect()
      .forall(_.isNullAt(0)) shouldBe true // fresh column, not old values
  }

  test("ALTER COLUMN TYPE widening is metadata-only: carried int32 files " +
      "read as long, appends land at either width") {
    import org.apache.spark.sql.types.{IntegerType, LongType, DoubleType}
    val dir = Files.createTempDirectory("lakecm_widen").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("id", "n"),
      "docs")
    val r = lake.widenColumn("docs", "n", LongType)
    r.rewrittenFiles shouldBe 0 // zero files touched — one manifest commit
    lake.read("docs").schema("n").dataType shouldBe LongType
    // the carried int32 parquet reads through the reader's promotion
    lake.read("docs").agg(sum("n")).as[Long].head() shouldBe 60L
    // append at the WIDE type
    lake.appendAtomic(Seq((4L, 4000000000L)).toDF("id", "n"), "docs")
    // append at the NARROW type still lands (promotes on read)
    lake.appendAtomic(Seq((5L, 50)).toDF("id",
      "n").select(col("id"), col("n").cast(IntegerType).as("n")), "docs")
    lake.read("docs").agg(sum("n")).as[Long].head() shouldBe 4000000110L
    lake.read("docs").schema("n").dataType shouldBe LongType
  }

  test("decimal widening: decimal→wider-decimal and integral→decimal are " +
      "metadata-only; lossy decimal changes refused") {
    import org.apache.spark.sql.types.DecimalType
    val dir = Files.createTempDirectory("lakecm_widen_dec").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic(Seq((1L, "12345.67"), (2L, "0.01")).toDF("id", "amt")
      .select(col("id"), col("amt").cast(DecimalType(10, 2)).as("amt")),
      "pay")
    // precision AND scale up: decimal(10,2) → decimal(14,4), zero rewrites
    lake.widenColumn("pay", "amt", DecimalType(14, 4))
      .rewrittenFiles shouldBe 0
    lake.read("pay").schema("amt").dataType shouldBe DecimalType(14, 4)
    lake.read("pay").agg(sum("amt")).as[java.math.BigDecimal].head()
      .compareTo(new java.math.BigDecimal("12345.68")) shouldBe 0
    // append needing the new scale; carried files still promote
    lake.appendAtomic(Seq((3L, "0.0001")).toDF("id", "amt")
      .select(col("id"), col("amt").cast(DecimalType(14, 4)).as("amt")),
      "pay")
    lake.read("pay").agg(sum("amt")).as[java.math.BigDecimal].head()
      .compareTo(new java.math.BigDecimal("12345.6801")) shouldBe 0
    // integral → decimal: the int range must fit the integer digits
    lake.writeAtomic(Seq((1L, 100), (2L, 23)).toDF("id", "n"), "docs")
    intercept[IllegalArgumentException] {
      lake.widenColumn("docs", "n", DecimalType(9, 0)) // int needs p−s ≥ 10
    }
    lake.widenColumn("docs", "n", DecimalType(12, 2))
    lake.read("docs").schema("n").dataType shouldBe DecimalType(12, 2)
    lake.read("docs").agg(sum("n")).as[java.math.BigDecimal].head()
      .compareTo(new java.math.BigDecimal("123.00")) shouldBe 0
    // lossy decimal changes are refused: scale shrink, integer-digit shrink
    intercept[IllegalArgumentException] {
      lake.widenColumn("pay", "amt", DecimalType(20, 2)) // scale 4 → 2
    }
    intercept[IllegalArgumentException] {
      lake.widenColumn("pay", "amt", DecimalType(12, 5)) // digits 10 → 7
    }
    // SQL surface carries decimal types through Spark's own parser
    LakeSql.sql(spark,
      s"ALTER TABLE lake.`$dir`.pay ALTER COLUMN amt TYPE DECIMAL(20,4)")
    lake.read("pay").schema("amt").dataType shouldBe DecimalType(20, 4)
    lake.read("pay").agg(sum("amt")).as[java.math.BigDecimal].head()
      .compareTo(new java.math.BigDecimal("12345.6801")) shouldBe 0
  }

  test("widening refusals: narrowing, long→double, unknown column") {
    import org.apache.spark.sql.types.{IntegerType, LongType, DoubleType}
    val dir = Files.createTempDirectory("lakecm_narrow").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic(Seq((1L, 10, 1.5f)).toDF("id", "n", "score"), "docs")
    val e = intercept[IllegalArgumentException] {
      lake.widenColumn("docs", "id", IntegerType) // long → int narrows
    }
    assert(e.getMessage.contains("not a safe widening"))
    intercept[IllegalArgumentException] {
      lake.widenColumn("docs", "id", DoubleType) // 64-bit → 53-bit mantissa
    }
    intercept[IllegalArgumentException] {
      lake.widenColumn("docs", "nope", LongType)
    }
    // float → double is legal and the old file reads promoted
    lake.widenColumn("docs", "score", DoubleType)
    lake.read("docs").schema("score").dataType shouldBe DoubleType
    lake.read("docs").agg(sum("score")).as[Double].head() shouldBe 1.5
    // widen to the SAME type is a recorded noop
    lake.widenColumn("docs", "n", IntegerType).noop shouldBe true
  }

  test("widening survives time travel, restore, and the SQL + catalog " +
      "surfaces") {
    import org.apache.spark.sql.types.LongType
    val dir = Files.createTempDirectory("lakecm_widen_sql").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic(Seq((1L, 10), (2L, 20)).toDF("id", "n"), "docs")
    val v1 = lake.listVersions("docs").head
    val row = LakeSql.sql(spark,
      s"ALTER TABLE lake.`$dir`.docs ALTER COLUMN n TYPE BIGINT")
      .collect().head
    row.getString(0) shouldBe "ALTER COLUMN TYPE"
    lake.read("docs").schema("n").dataType shouldBe LongType
    // pre-widening version still reads with its own (narrow) schema
    lake.readVersion("docs", v1).schema("n").dataType shouldBe
      org.apache.spark.sql.types.IntegerType
    lake.historyRows("docs").last.getString(2) shouldBe "ALTER COLUMN TYPE"
    // catalog surface (TableChange.UpdateColumnType)
    spark.conf.set("spark.sql.catalog.widecat",
      classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.widecat.basePath", dir)
    lake.writeAtomic(Seq((1L, 2.5f)).toDF("id", "score"), "t2")
    spark.sql("ALTER TABLE widecat.t2 ALTER COLUMN score TYPE DOUBLE")
    lake.read("t2").schema("score").dataType shouldBe
      org.apache.spark.sql.types.DoubleType
  }

  test("RENAME follows the clustering declaration; DROP removes the " +
      "column from it (OPTIMIZE keeps working)") {
    val (lake, _) = mappedLake()
    lake.setClusterBy("docs", Seq("txt", "n"))
    lake.renameColumn("docs", "txt", "body")
    lake.clusterByCols("docs") shouldBe Seq("body", "n")
    lake.dropColumn("docs", "n")
    lake.clusterByCols("docs") shouldBe Seq("body")
    // the maintenance pass resolves the re-keyed declaration
    lake.compact("docs")
    lake.read("docs").columns.sorted shouldBe Array("body", "id")
  }

  test("RENAME/DROP of a column a CHECK constraint or another column's " +
      "generation expression reads is refused loudly, naming the fix") {
    val (lake, _) = mappedLake()
    lake.addConstraint("docs", "n_positive", "n > 0")
    intercept[IllegalArgumentException] {
      lake.renameColumn("docs", "n", "count")
    }.getMessage should include("n_positive")
    intercept[IllegalArgumentException] {
      lake.dropColumn("docs", "n")
    }.getMessage should include("DROP CONSTRAINT")
    lake.dropConstraint("docs", "n_positive")
    lake.addGeneratedColumn("docs", "n", "id * 10")
    intercept[IllegalArgumentException] {
      lake.renameColumn("docs", "id", "doc_id")
    }.getMessage should include("generated")
    lake.dropGeneratedColumn("docs", "n")
    // with the readers gone, the rename proceeds
    lake.renameColumn("docs", "txt", "body")
    lake.read("docs").columns should contain("body")
  }
}
