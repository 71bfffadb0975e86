package newspipe.io

import java.nio.file.Files
import java.sql.Timestamp

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** GENERATED ALWAYS AS columns (Delta's generated-column feature on the
  * layer-property surface): declaration (Scala + `CREATE TABLE` via the
  * catalog capability), the fill-or-validate commit gate on every write
  * path, recompute on row-level ops, partition-on-generated, and the
  * ts-predicate → partition-conjunct pruning derivation.
  */
class LakeGeneratedSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLake(): (String, Lake) = {
    val dir = Files.createTempDirectory("lakegen").toString
    (dir, new Lake(spark, LakeConfig(basePath = dir)))
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("append without the generated column fills it; explicit values " +
      "validate; a mismatch refuses; NULL means fill-for-me") {
    val (_, lake) = freshLake()
    lake.addGeneratedColumn("ev", "d", "CAST(ts AS DATE)")
    // first commit: column omitted → computed (and lands in the schema)
    lake.writeAtomic(Seq((1L, ts("2026-01-05 10:00:00")))
      .toDF("id", "ts"), "ev")
    lake.read("ev").columns.toSeq shouldBe Seq("id", "ts", "d")
    lake.read("ev").select("d").as[java.sql.Date].head() shouldBe
      java.sql.Date.valueOf("2026-01-05")
    // explicit CORRECT value passes
    lake.appendAtomic(Seq((2L, ts("2026-01-06 09:00:00"),
      java.sql.Date.valueOf("2026-01-06"))).toDF("id", "ts", "d"), "ev")
    // explicit NULL fills
    lake.appendAtomic(Seq((3L, ts("2026-01-07 09:00:00"),
      null.asInstanceOf[java.sql.Date])).toDF("id", "ts", "d"), "ev")
    lake.read("ev").filter($"id" === 3L).select("d")
      .as[java.sql.Date].head() shouldBe java.sql.Date.valueOf("2026-01-07")
    // explicit WRONG value refuses with the generation expression named
    val e = intercept[IllegalArgumentException] {
      lake.appendAtomic(Seq((4L, ts("2026-01-08 09:00:00"),
        java.sql.Date.valueOf("1999-01-01"))).toDF("id", "ts", "d"), "ev")
    }
    e.getMessage should include("GENERATED ALWAYS AS")
    lake.read("ev").count() shouldBe 3L
  }

  test("declaring over existing data validates it; missing column and " +
      "bad references refuse") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((1L, ts("2026-02-01 08:00:00"),
      java.sql.Date.valueOf("2026-02-01"))).toDF("id", "ts", "d"), "ok")
    lake.addGeneratedColumn("ok", "d", "CAST(ts AS DATE)") // matches
    lake.generatedColumns("ok") shouldBe Map("d" -> "CAST(ts AS DATE)")
    // existing values that do NOT satisfy the expression refuse
    val (_, lake2) = freshLake()
    lake2.writeAtomic(Seq((1L, ts("2026-02-01 08:00:00"),
      java.sql.Date.valueOf("1999-01-01"))).toDF("id", "ts", "d"), "bad")
    intercept[IllegalArgumentException] {
      lake2.addGeneratedColumn("bad", "d", "CAST(ts AS DATE)")
    }.getMessage should include("existing data")
    // a column the layer does not have refuses (no silent backfill)
    intercept[IllegalArgumentException] {
      lake2.addGeneratedColumn("bad", "nope", "CAST(ts AS DATE)")
    }.getMessage should include("no column")
    // self-reference and generated-on-generated refuse
    intercept[IllegalArgumentException] {
      lake2.addGeneratedColumn("bad", "x", "x + 1")
    }.getMessage should include("reference itself")
    lake2.addGeneratedColumn("fresh", "g1", "id * 2")
    intercept[IllegalArgumentException] {
      lake2.addGeneratedColumn("fresh", "g2", "g1 + 1")
    }.getMessage should include("other generated")
    // drop releases the gate
    lake2.dropGeneratedColumn("fresh", "g1")
    lake2.generatedColumns("fresh") shouldBe Map.empty
  }

  test("row-level ops RECOMPUTE: updateWhere/mergeInto to a source column " +
      "propagate into the generated column") {
    val (_, lake) = freshLake()
    lake.addGeneratedColumn("rw", "d", "CAST(ts AS DATE)")
    lake.writeAtomic(Seq(
      (1L, ts("2026-03-01 10:00:00")),
      (2L, ts("2026-03-02 10:00:00"))).toDF("id", "ts"), "rw")
    // updateWhere moves ts without touching d — the rewrite recomputes
    lake.updateWhere("rw", $"id" === 1L,
      Map("ts" -> lit(ts("2026-03-09 23:00:00"))))
    lake.read("rw").filter($"id" === 1L).select("d")
      .as[java.sql.Date].head() shouldBe java.sql.Date.valueOf("2026-03-09")
    // mergeInto: the source carries a STALE d — recompute overrides it
    lake.mergeInto("rw", Seq(
      (2L, ts("2026-03-15 01:00:00"), java.sql.Date.valueOf("1999-01-01")),
      (3L, ts("2026-03-16 01:00:00"), null.asInstanceOf[java.sql.Date]))
      .toDF("id", "ts", "d"), keys = Seq("id"))
    lake.read("rw").orderBy("id").select("id", "d")
      .as[(Long, java.sql.Date)].collect() shouldBe Array(
        (1L, java.sql.Date.valueOf("2026-03-09")),
        (2L, java.sql.Date.valueOf("2026-03-15")),
        (3L, java.sql.Date.valueOf("2026-03-16")))
  }

  test("pure-v2 SQL UPDATE recomputes through the row-level writer") {
    val dir = Files.createTempDirectory("lakegenv2").toString
    spark.conf.set("spark.sql.catalog.genv2", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.genv2.basePath", dir)
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.addGeneratedColumn("v2", "d", "CAST(ts AS DATE)")
    lake.writeAtomic(Seq(
      (1L, ts("2026-04-01 10:00:00")),
      (2L, ts("2026-04-02 10:00:00"))).toDF("id", "ts"), "v2")
    // UPDATE SET ts only — Spark's group-based rewrite carries the old d;
    // the task-side generated projection recomputes it
    spark.sql(s"UPDATE genv2.`$dir`.v2 " +
      "SET ts = TIMESTAMP '2026-04-20 05:00:00' WHERE id = 1")
    lake.read("v2").orderBy("id").select("id", "d")
      .as[(Long, java.sql.Date)].collect() shouldBe Array(
        (1L, java.sql.Date.valueOf("2026-04-20")),
        (2L, java.sql.Date.valueOf("2026-04-02")))
  }

  test("CREATE TABLE … GENERATED ALWAYS AS, partitioned on the generated " +
      "column: layout lands, ts predicates prune without mentioning it") {
    val dir = Files.createTempDirectory("lakegensql").toString
    spark.conf.set("spark.sql.catalog.gencat", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.gencat.basePath", dir)
    spark.sql(s"CREATE TABLE gencat.`$dir`.ev (id BIGINT, ts TIMESTAMP, " +
      "d DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) PARTITIONED BY (d)")
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.generatedColumns("ev") shouldBe Map("d" -> "CAST(ts AS DATE)")
    // appends OMIT the generated column entirely; three days of data
    (1 to 3).foreach { day =>
      lake.appendAtomic((1L to 20L).map(i =>
        (day * 100L + i, ts(f"2026-05-0$day%d 0${(i % 9) + 1}%d:00:00")))
        .toDF("id", "ts"), "ev")
    }
    // hive layout on the GENERATED column
    val v = lake.listVersions("ev").head
    new java.io.File(s"$dir/ev/_v/$v").listFiles()
      .map(_.getName).filter(_.startsWith("d=")).toSet shouldBe
      Set("d=2026-05-03") // newest append's partition dir
    // ts-only predicate: the derivation adds the d-conjunct, the sidecar
    // prunes to one day's file(s) out of three days
    val info = lake.pruneInfo("ev",
      $"ts" >= lit(ts("2026-05-02 00:00:00")) &&
        $"ts" < lit(ts("2026-05-03 00:00:00"))).get
    assert(info.keptFiles < info.totalFiles,
      s"ts predicate must prune via the generated partition column: $info")
    // …and the pruned read returns exactly the plain filtered rows
    val got = lake.readWhere("ev",
      $"ts" >= lit(ts("2026-05-02 00:00:00")) &&
        $"ts" < lit(ts("2026-05-03 00:00:00")))
      .select("id").as[Long].collect().sorted
    got shouldBe (1L to 20L).map(200L + _).toArray
    // SQL INSERT with every column: correct values pass, the row lands
    spark.sql(s"INSERT INTO gencat.`$dir`.ev VALUES " +
      "(999, TIMESTAMP '2026-05-07 12:00:00', DATE '2026-05-07')")
    lake.read("ev").filter($"id" === 999L).select("d")
      .as[java.sql.Date].head() shouldBe java.sql.Date.valueOf("2026-05-07")
    // CREATE-time reference rules
    intercept[Exception] {
      spark.sql(s"CREATE TABLE gencat.`$dir`.selfref (a BIGINT, " +
        "b BIGINT GENERATED ALWAYS AS (b + 1))")
    }
    intercept[Exception] {
      spark.sql(s"CREATE TABLE gencat.`$dir`.genref (a BIGINT, " +
        "b BIGINT GENERATED ALWAYS AS (a + 1), " +
        "c BIGINT GENERATED ALWAYS AS (b + 1))")
    }
  }

  test("derivation is conservative: non-monotonic shapes and foreign " +
      "columns derive nothing (predicate semantics never change)") {
    val (_, lake) = freshLake()
    lake.addGeneratedColumn("m", "mon", "month(ts)") // NOT monotonic
    lake.writeAtomic(Seq(
      (1L, ts("2025-12-31 23:00:00")),
      (2L, ts("2026-01-01 01:00:00"))).toDF("id", "ts"), "m")
    // month() is excluded from the derivation table — a ts range spanning
    // a year boundary with month(dec)=12 > month(jan)=1 would otherwise
    // prune wrongly. The read must return both rows.
    lake.readWhere("m", $"ts" >= lit(ts("2025-12-31 00:00:00")))
      .count() shouldBe 2L
    // year() IS monotonic and derives; results still exact
    val (_, lake2) = freshLake()
    lake2.addGeneratedColumn("y", "yr", "year(ts)")
    lake2.writeAtomic(Seq(
      (1L, ts("2025-06-01 00:00:00")),
      (2L, ts("2026-06-01 00:00:00"))).toDF("id", "ts"), "y")
    lake2.readWhere("y", $"ts" >= lit(ts("2026-01-01 00:00:00")))
      .select("id").as[Long].collect() shouldBe Array(2L)
  }
}
