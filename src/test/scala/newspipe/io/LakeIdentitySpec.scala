package newspipe.io

import java.nio.file.Files

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** IDENTITY columns (Delta's `GENERATED { ALWAYS | BY DEFAULT } AS
  * IDENTITY`): dense allocation on append/overwrite/merge-insert, the
  * manifest-transactional high watermark (advanced from added files'
  * column stats — explicit BY-DEFAULT values can never collide with a
  * later allocation), ALWAYS-mode refusals, SYNC-style declaration over
  * existing data, negative steps, and the SQL CREATE TABLE surface.
  */
class LakeIdentitySpec extends SparkTestBase {
  import spark.implicits._

  private def freshLake(): (String, Lake) = {
    val dir = Files.createTempDirectory("lakeident").toString
    (dir, new Lake(spark, LakeConfig(basePath = dir)))
  }

  test("appends allocate dense start/step ranges; values unique across " +
      "commits; row ops never reallocate") {
    val (_, lake) = freshLake()
    lake.addIdentityColumn("t", "id", start = 100L, step = 10L)
    lake.writeAtomic(Seq("a", "b", "c").toDF("text"), "t")
    val first = lake.read("t").select("id").as[Long].collect().sorted
    first shouldBe Array(100L, 110L, 120L)
    lake.appendAtomic(Seq("d", "e").toDF("text"), "t")
    val all = lake.read("t").select("id").as[Long].collect().sorted
    all shouldBe Array(100L, 110L, 120L, 130L, 140L)
    // an update keeps existing identities
    lake.updateWhere("t", $"text" === "a", Map("text" -> lit("A")))
    lake.read("t").select("id").as[Long].collect().sorted shouldBe all
  }

  test("ALWAYS refuses explicit values; BY DEFAULT keeps them AND bumps " +
      "the watermark past them") {
    val (_, lake) = freshLake()
    lake.addIdentityColumn("aw", "id", start = 1L, step = 1L)
    lake.writeAtomic(Seq("x").toDF("text"), "aw")
    intercept[IllegalArgumentException] {
      lake.appendAtomic(Seq((99L, "boom")).toDF("id", "text"), "aw")
    }.getMessage should include("IDENTITY")
    // NULL means allocate-for-me even in ALWAYS mode
    lake.appendAtomic(Seq((null.asInstanceOf[java.lang.Long], "y"))
      .toDF("id", "text")
      .select($"id".cast("long").as("id"), $"text"), "aw")
    lake.read("aw").select("id").as[Long].collect().sorted shouldBe
      Array(1L, 2L)
    val (_, lake2) = freshLake()
    lake2.addIdentityColumn("bd", "id", start = 1L, step = 1L,
      allowExplicitInsert = true)
    lake2.writeAtomic(Seq("x").toDF("text"), "bd") // id = 1
    lake2.appendAtomic(Seq((50L, "explicit")).toDF("id", "text"), "bd")
    // next allocation starts BEYOND the explicit 50 — no collision ever
    lake2.appendAtomic(Seq("z").toDF("text"), "bd")
    lake2.read("bd").orderBy("id").select("id", "text")
      .as[(Long, String)].collect() shouldBe Array(
        (1L, "x"), (50L, "explicit"), (51L, "z"))
  }

  test("merge: NOT-MATCHED inserts allocate, matched updates keep ids; " +
      "mixed null/explicit increments fill only the nulls") {
    val (_, lake) = freshLake()
    lake.addIdentityColumn("mg", "id", start = 1L, step = 1L,
      allowExplicitInsert = true)
    lake.writeAtomic(Seq("a", "b").toDF("text"), "mg") // ids 1, 2
    // mixed append leg: one explicit id (kept — BY DEFAULT), one null
    // (allocated); the explicit 100 bumps the watermark so nothing can
    // ever collide with it
    lake.mergeInto("mg",
      Seq((java.lang.Long.valueOf(100L), "A"),
        (null.asInstanceOf[java.lang.Long], "c"))
        .toDF("id", "text").select($"id".cast("long").as("id"), $"text"),
      keys = Seq("text")) // both source keys are new → both insert
    val rows = lake.read("mg").orderBy("id").select("id", "text")
      .as[(Long, String)].collect()
    rows.map(_._2).sorted shouldBe Array("A", "a", "b", "c")
    rows.map(_._1).distinct.length shouldBe 4 // all unique
    rows.find(_._2 == "A").get._1 shouldBe 100L
    lake.appendAtomic(Seq("tail").toDF("text"), "mg")
    lake.read("mg").filter($"text" === "tail").select("id")
      .as[Long].head() shouldBe 101L // past the explicit value
  }

  test("SYNC-style declaration over existing data seeds past the aligned " +
      "max; refusals for non-integral/missing/generated collision") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((7L, "a"), (23L, "b")).toDF("id", "text"), "ex")
    lake.addIdentityColumn("ex", "id", start = 0L, step = 10L)
    lake.appendAtomic(Seq("c").toDF("text"), "ex")
    // aligned beyond 23 on the 0/10 grid = 30
    lake.read("ex").select("id").as[Long].collect().sorted shouldBe
      Array(7L, 23L, 30L)
    intercept[IllegalArgumentException] {
      lake.addIdentityColumn("ex", "text", 1L, 1L)
    }.getMessage should include("integral")
    intercept[IllegalArgumentException] {
      lake.addIdentityColumn("ex", "nope", 1L, 1L)
    }.getMessage should include("no column")
    val (_, lake3) = freshLake()
    lake3.addGeneratedColumn("gx", "g", "length(text)")
    intercept[IllegalArgumentException] {
      lake3.addIdentityColumn("gx", "g", 1L, 1L)
    }.getMessage should include("cannot")
  }

  test("negative step descends; watermark survives restart (manifest, " +
      "not session state) and incremental commits") {
    val (root, lake) = freshLake()
    lake.addIdentityColumn("dn", "id", start = -1L, step = -2L)
    lake.writeAtomic(Seq("a", "b").toDF("text"), "dn")
    lake.read("dn").select("id").as[Long].collect().sorted shouldBe
      Array(-3L, -1L)
    // fresh Lake instance (cold caches): allocation continues, no reuse
    val lake2 = new Lake(spark, LakeConfig(basePath = root))
    lake2.appendAtomic(Seq("c").toDF("text"), "dn")
    lake2.read("dn").select("id").as[Long].collect().sorted shouldBe
      Array(-5L, -3L, -1L)
    // the chain is incremental and the fold carries the watermark
    val head = lake2.listVersions("dn").head
    assert(new java.io.File(s"$root/dn/_v/$head/_DELTA.json").exists())
  }

  test("CREATE TABLE … GENERATED ALWAYS AS IDENTITY through the catalog; " +
      "INSERT allocates; explicit refused") {
    val dir = Files.createTempDirectory("lakeidsql").toString
    spark.conf.set("spark.sql.catalog.idcat", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.idcat.basePath", dir)
    spark.sql(s"CREATE TABLE idcat.`$dir`.t (id BIGINT GENERATED ALWAYS " +
      "AS IDENTITY (START WITH 5 INCREMENT BY 5), text STRING)")
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.identityColumns("t") shouldBe
      Map("id" -> Lake.Identity(5L, 5L, false))
    spark.sql(s"INSERT INTO idcat.`$dir`.t VALUES (NULL, 'a'), (NULL, 'b')")
    lake.read("t").select("id").as[Long].collect().sorted shouldBe
      Array(5L, 10L)
    intercept[Exception] {
      spark.sql(s"INSERT INTO idcat.`$dir`.t VALUES (777, 'boom')")
    }
    // BY DEFAULT form parses and keeps explicit values
    spark.sql(s"CREATE TABLE idcat.`$dir`.d (id BIGINT GENERATED BY " +
      "DEFAULT AS IDENTITY, text STRING)")
    spark.sql(s"INSERT INTO idcat.`$dir`.d VALUES (42, 'x'), (NULL, 'y')")
    lake.read("d").orderBy("id").select("id", "text")
      .as[(Long, String)].collect() shouldBe Array((1L, "y"), (42L, "x"))
  }

  test("identity-only layer (no row tracking): overwrite snapshot keeps " +
      "stats pruning (manifest-rel sidecar keys)") {
    val (_, lake) = freshLake()
    lake.addIdentityColumn("t", "id")
    // overwrite snapshot carries a manifest (idHighs live there) — the
    // stats sidecar must be keyed by MANIFEST rels or pruning silently
    // turns off for the layer head
    lake.writeAtomic((1 to 200).map(i => (i, s"d$i")).toDF("n", "text")
      .repartition(4), "t")
    val info = lake.pruneInfo("t", col("n") === 5).get
    info.totalFiles shouldBe 4
    info.keptFiles should be < 4
    // and the identity values themselves are intact
    lake.read("t").select("id").distinct().count() shouldBe 200L
  }

  test("identity-space exhaustion fails loudly (no silent int wrap)") {
    val (_, lake) = freshLake()
    // int column close to Int.MaxValue; SYNC-style declaration seeds the
    // watermark just past it
    lake.writeAtomic(Seq(Int.MaxValue - 7).toDF("id")
      .select(col("id").cast("int").as("id"), lit("x").as("text")), "t")
    lake.addIdentityColumn("t", "id", start = 1L, step = 10L)
    val e = intercept[Exception] {
      lake.appendAtomic(Seq("a", "b", "c").toDF("text"), "t")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(
        _.contains("exhausted"))))
  }

  test("RENAME COLUMN on an identity column carries the watermark — " +
      "allocations after the rename never reuse pre-rename values") {
    val (_, lake) = freshLake()
    lake.addIdentityColumn("t", "id", start = 1L, step = 1L)
    lake.writeAtomic(Seq("a", "b", "c").toDF("text"), "t") // ids 1..3
    lake.setProperties("t", Map("lake.columnMapping.mode" -> "name"))
    lake.renameColumn("t", "id", "row_id")
    lake.identityColumns("t").keySet shouldBe Set("row_id")
    lake.appendAtomic(Seq("d", "e").toDF("text"), "t")
    val ids = lake.read("t").select("row_id").as[Long].collect().sorted
    ids shouldBe Array(1L, 2L, 3L, 4L, 5L) // NOT 1,1,2,2,3
  }

  test("DROP COLUMN on an identity column removes the declaration — " +
      "the next append does not resurrect it") {
    val (_, lake) = freshLake()
    lake.addIdentityColumn("t", "id")
    lake.writeAtomic(Seq("a").toDF("text")
      .withColumn("note", lit("n")), "t")
    lake.setProperties("t", Map("lake.columnMapping.mode" -> "name"))
    lake.dropColumn("t", "id")
    lake.identityColumns("t") shouldBe empty
    lake.appendAtomic(Seq("b").toDF("text")
      .withColumn("note", lit("n")), "t")
    lake.read("t").columns.sorted shouldBe Array("note", "text")
  }
}
