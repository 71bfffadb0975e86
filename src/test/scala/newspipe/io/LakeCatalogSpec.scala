package newspipe.io

import java.nio.file.Files

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** DSv2 TableCatalog surface: `lake.<base>.<layer>` as first-class SQL
  * tables — SELECT (incl. VERSION/TIMESTAMP AS OF), INSERT INTO/OVERWRITE,
  * DELETE, TRUNCATE, CREATE TABLE/CTAS, SHOW/DESCRIBE/ALTER — all landing
  * on the same commit protocol as the Scala API (ref
  * `03_gold_modeling_news_articles.py:84-103`, metastore-published tables).
  */
class LakeCatalogSpec extends SparkTestBase {
  import spark.implicits._

  /** One shared base dir; catalog conf registered before first use. */
  private lazy val base: String = {
    val dir = Files.createTempDirectory("lakecat").toString
    spark.conf.set("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lake.basePath", dir)
    dir
  }
  private lazy val lake = new Lake(spark, LakeConfig(basePath = base))

  test("SELECT through the catalog matches Lake.read (explicit base)") {
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), "sel")
    spark.sql(s"SELECT id, text FROM lake.`$base`.sel ORDER BY id")
      .as[(Long, String)].collect() shouldBe Array((1L, "a"), (2L, "b"))
  }

  test("SELECT via the two-part basePath form") {
    // a catalog instance is CACHED per session at first use with the confs
    // of that moment — another suite may have loaded `lake` before our
    // basePath conf existed, so the basePath form gets its own catalog name
    spark.conf.set("spark.sql.catalog.lakeb", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakeb.basePath", base)
    lake.writeAtomic(Seq((7L, "x")).toDF("id", "text"), "twopart")
    spark.sql("SELECT id, text FROM lakeb.twopart")
      .as[(Long, String)].collect() shouldBe Array((7L, "x"))
  }

  test("VERSION AS OF: history ordinal and full version id") {
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), "tt")
    lake.appendAtomic(Seq((3L, "c")).toDF("id", "text"), "tt")
    spark.sql(s"SELECT count(*) AS n FROM lake.`$base`.tt VERSION AS OF 1")
      .as[Long].head() shouldBe 2L
    spark.sql(s"SELECT count(*) AS n FROM lake.`$base`.tt VERSION AS OF 2")
      .as[Long].head() shouldBe 3L
    val v1 = lake.listVersions("tt").sorted.head
    spark.sql(s"SELECT id FROM lake.`$base`.tt VERSION AS OF '$v1' ORDER BY id")
      .as[Long].collect() shouldBe Array(1L, 2L)
    // matches the TVF the pre-catalog surface used
    newspipe.NewspipeExtensions.register(spark)
    spark.sql(s"SELECT id FROM lake_read_version('$base', 'tt', '$v1') " +
      "ORDER BY id").as[Long].collect() shouldBe Array(1L, 2L)
  }

  test("TIMESTAMP AS OF resolves like readAsOf") {
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "ts")
    Thread.sleep(30)
    val betwixt = System.currentTimeMillis()
    Thread.sleep(30)
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "text"), "ts")
    spark.sql(s"SELECT id FROM lake.`$base`.ts " +
      s"TIMESTAMP AS OF timestamp_millis(${betwixt}L) ORDER BY id")
      .as[Long].collect() shouldBe Array(1L)
    spark.sql(s"SELECT id FROM lake.`$base`.ts " +
      s"TIMESTAMP AS OF timestamp_millis(${System.currentTimeMillis()}L) " +
      "ORDER BY id").as[Long].collect() shouldBe Array(1L, 2L)
  }

  test("SHOW TBLPROPERTIES and DESCRIBE TABLE reflect layer metadata") {
    spark.sql(s"CREATE TABLE lake.`$base`.meta (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang) TBLPROPERTIES ('team'='pipeline')")
    val props = spark.sql(s"SHOW TBLPROPERTIES lake.`$base`.meta")
      .as[(String, String)].collect().toMap
    props.get("team") shouldBe Some("pipeline")
    props.get("lake.partitionBy") shouldBe Some("lang")
    val desc = spark.sql(s"DESCRIBE TABLE lake.`$base`.meta")
      .as[(String, String, String)].collect()
    desc.map(_._1) should contain allOf ("id", "lang")
    // the partitioning section names the declared column
    desc.map(_._1) should contain("# Partition Information")
  }

  test("option-based time travel: read.option(versionAsOf/timestampAsOf).table") {
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "ott")
    Thread.sleep(30)
    val betwixt = System.currentTimeMillis()
    Thread.sleep(30)
    lake.appendAtomic(Seq((2L, "b")).toDF("id", "text"), "ott")
    spark.read.option("versionAsOf", "1").table(s"lake.`$base`.ott")
      .as[(Long, String)].collect() shouldBe Array((1L, "a"))
    spark.read.option("versionAsOf", "2").table(s"lake.`$base`.ott")
      .count() shouldBe 2L
    val ts = new java.sql.Timestamp(betwixt).toString
    spark.read.option("timestampAsOf", ts).table(s"lake.`$base`.ott")
      .as[(Long, String)].collect() shouldBe Array((1L, "a"))
  }

  test("INSERT INTO appends through the commit protocol") {
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "ins")
    spark.sql(s"INSERT INTO lake.`$base`.ins VALUES (2, 'b'), (3, 'c')")
    lake.read("ins").orderBy("id").as[(Long, String)].collect() shouldBe
      Array((1L, "a"), (2L, "b"), (3L, "c"))
    lake.historyRows("ins").map(_.getString(2)) shouldBe
      Seq("WRITE", "APPEND")
  }

  test("INSERT OVERWRITE replaces the layer content atomically") {
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), "ovr")
    spark.sql(s"INSERT OVERWRITE lake.`$base`.ovr VALUES (9, 'z')")
    lake.read("ovr").as[(Long, String)].collect() shouldBe Array((9L, "z"))
    lake.listVersions("ovr").size shouldBe 2 // old snapshot still restorable
  }

  test("DELETE FROM via the native v2 path (no extension parser involved)") {
    lake.writeAtomic(
      Seq((1L, "en"), (2L, "zh"), (3L, "en")).toDF("id", "lang"), "del")
    spark.sql(s"DELETE FROM lake.`$base`.del WHERE lang = 'zh'")
    lake.read("del").orderBy("id").as[(Long, String)].collect() shouldBe
      Array((1L, "en"), (3L, "en"))
    lake.historyRows("del").map(_.getString(2)).last shouldBe "DELETE"
  }

  test("TRUNCATE TABLE empties but keeps schema and history") {
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "trunc")
    spark.sql(s"TRUNCATE TABLE lake.`$base`.trunc")
    lake.read("trunc").count() shouldBe 0L
    lake.read("trunc").columns.toSeq shouldBe Seq("id", "text")
  }

  test("CREATE TABLE makes an empty readable layer; INSERT fills it") {
    spark.sql(s"CREATE TABLE lake.`$base`.fresh (id BIGINT, text STRING)")
    spark.sql(s"SELECT * FROM lake.`$base`.fresh").count() shouldBe 0L
    spark.sql(s"INSERT INTO lake.`$base`.fresh VALUES (1, 'hello')")
    spark.sql(s"SELECT id, text FROM lake.`$base`.fresh")
      .as[(Long, String)].collect() shouldBe Array((1L, "hello"))
    intercept[Exception] {
      spark.sql(s"CREATE TABLE lake.`$base`.fresh (id BIGINT)")
    }
  }

  test("CTAS lands the query result as the first data commit") {
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), "src")
    spark.sql(s"CREATE TABLE lake.`$base`.ctas AS " +
      s"SELECT id * 10 AS id10 FROM lake.`$base`.src")
    spark.sql(s"SELECT id10 FROM lake.`$base`.ctas ORDER BY id10")
      .as[Long].collect() shouldBe Array(10L, 20L)
  }

  test("SHOW TABLES lists committed layers; DESCRIBE shows the schema") {
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "showme")
    val names = spark.sql(s"SHOW TABLES IN lake.`$base`")
      .select("tableName").as[String].collect().toSet
    names should contain("showme")
    val desc = spark.sql(s"DESCRIBE TABLE lake.`$base`.showme")
      .select("col_name", "data_type").as[(String, String)].collect().toMap
    desc("id") shouldBe "bigint"
    desc("text") shouldBe "string"
  }

  test("ALTER TABLE SET TBLPROPERTIES routes to layer properties") {
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "props")
    spark.sql(
      s"ALTER TABLE lake.`$base`.props SET TBLPROPERTIES ('k1' = 'v1')")
    lake.properties("props").get("k1") shouldBe Some("v1")
  }

  test("ALTER TABLE RENAME moves the layer directory") {
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "oldname")
    spark.sql(s"ALTER TABLE lake.`$base`.oldname RENAME TO " +
      s"lake.`$base`.newname")
    lake.read("newname").count() shouldBe 1L
    intercept[Exception] { spark.sql(s"SELECT * FROM lake.`$base`.oldname") }
  }

  test("extension session: catalog SELECT rewrites to the v1 indexed scan") {
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), "fast")
    val s2 = org.apache.spark.sql.NewspipeSqlBridge.sessionWithExtensions(
      spark, new newspipe.NewspipeExtensions()(_))
    val df = s2.sql(
      s"SELECT id, text FROM lake.`$base`.fast WHERE id = 2")
    val plan = df.queryExecution.executedPlan.toString
    // the rewrite replaced the v2 BatchScan with the Lake.read file scan
    plan should not include "BatchScan"
    plan should include("FileScan")
    df.as[(Long, String)].collect() shouldBe Array((2L, "b"))
    // DML through the SAME session still routes via the statement surface
    s2.sql(s"DELETE FROM lake.`$base`.fast WHERE id = 1")
    s2.sql(s"SELECT count(*) AS n FROM lake.`$base`.fast")
      .as[Long].head() shouldBe 1L
  }

  test("readStream.table over a lake catalog table (extension session)") {
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), "strm")
    val s2 = org.apache.spark.sql.NewspipeSqlBridge.sessionWithExtensions(
      spark, new newspipe.NewspipeExtensions()(_))
    val ckpt = Files.createTempDirectory("strmckpt").toString
    val q = s2.readStream.table(s"lake.`$base`.strm")
      .writeStream.format("memory").queryName("cat_stream")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // batch 0: the current snapshot, as plain rows (no _change_type)
      s2.table("cat_stream").columns.toSeq shouldBe Seq("id", "text")
      s2.table("cat_stream").orderBy("id").as[(Long, String)]
        .collect() shouldBe Array((1L, "a"), (2L, "b"))
      // appends arrive incrementally; delete commits contribute no rows
      // (rows-only stream — the format-based change source carries tags)
      lake.appendAtomic(Seq((3L, "c")).toDF("id", "text"), "strm")
      lake.deleteWhere("strm", $"id" === 1L)
      q.processAllAvailable()
      s2.table("cat_stream").orderBy("id").as[(Long, String)]
        .collect() shouldBe Array((1L, "a"), (2L, "b"), (3L, "c"))
    } finally q.stop()
    // reader options pass through: startingVersion=latest starts empty and
    // sees only commits after stream start
    val ckpt2 = Files.createTempDirectory("strmckpt2").toString
    val q2 = s2.readStream.option("startingVersion", "latest")
      .table(s"lake.`$base`.strm")
      .writeStream.format("memory").queryName("cat_stream2")
      .option("checkpointLocation", ckpt2).start()
    try {
      q2.processAllAvailable()
      s2.table("cat_stream2").count() shouldBe 0L
      lake.appendAtomic(Seq((9L, "z")).toDF("id", "text"), "strm")
      q2.processAllAvailable()
      s2.table("cat_stream2").as[(Long, String)].collect() shouldBe
        Array((9L, "z"))
    } finally q2.stop()
  }

  test("V1Scan fallback pushes filters, prunes columns and SKIPS files " +
      "(extension-less session)") {
    lake.writeAtomic((1L to 40L).map(i => (i, s"t$i", i * 2))
      .toDF("id", "text", "n")
      .repartitionByRange(4, $"id").sortWithinPartitions("id"), "v1scan")
    // a manifest head (not a re-listable self-contained dir) pins the
    // file inventory, so the corruption probe below is meaningful
    lake.appendAtomic(Seq((41L, "t41", 82L)).toDF("id", "text", "n"),
      "v1scan")
    val q = spark.sql(s"SELECT n FROM lake.`$base`.v1scan WHERE id <= 5")
    val plan = q.queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("LessThanOrEqual")
    // column pruning: the scan node no longer carries the text column
    plan should not include "text"
    q.as[Long].collect().sorted shouldBe (1L to 5L).map(_ * 2).toArray
    // file skipping pinned PHYSICALLY: corrupt a file the stats exclude —
    // the pruned fallback read never OPENS it, a full scan fails on it
    val all = lake.read("v1scan").select(input_file_name())
      .distinct().as[String].collect().toSet
    val needed = lake.readWhere("v1scan", $"id" <= 5)
      .select(input_file_name()).distinct().as[String].collect().toSet
    needed.size should be < all.size
    val victim = new java.io.File(new java.net.URI(all.diff(needed).head))
    java.nio.file.Files.write(victim.toPath, Array.fill[Byte](64)(0x5a))
    spark.sql(s"SELECT sum(n) AS s FROM lake.`$base`.v1scan WHERE id <= 5")
      .as[Long].head() shouldBe 2L * (1 to 5).sum
    // …and the same fallback WITHOUT the predicate must open the corrupt
    // file (proof the skip above was real, not a lucky layout)
    intercept[Exception] {
      spark.sql(s"SELECT sum(n) AS s FROM lake.`$base`.v1scan")
        .as[Long].head()
    }
  }

  test("readStream.table with readChangeFeed=true surfaces the tagged CDF") {
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), "cdfstrm")
    val s2 = org.apache.spark.sql.NewspipeSqlBridge.sessionWithExtensions(
      spark, new newspipe.NewspipeExtensions()(_))
    val ckpt = Files.createTempDirectory("cdfck").toString
    val q = s2.readStream.option("readChangeFeed", "true")
      .table(s"lake.`$base`.cdfstrm")
      .writeStream.format("memory").queryName("cat_cdf")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // declared columns keep their ids; the tag appends after them
      s2.table("cat_cdf").columns.toSeq shouldBe
        Seq("id", "text", "_change_type")
      lake.deleteWhere("cdfstrm", $"id" === 1L) // visible, tagged delete
      lake.appendAtomic(Seq((3L, "c")).toDF("id", "text"), "cdfstrm")
      q.processAllAvailable()
      s2.table("cat_cdf").orderBy("id", "_change_type")
        .as[(Long, String, String)].collect() shouldBe Array(
          (1L, "a", "delete"), (1L, "a", "insert"), (2L, "b", "insert"),
          (3L, "c", "insert"))
    } finally q.stop()
  }

  test("readStream.table + readChangeFeed: AvailableNow drains a backlog " +
      "in byte-capped batches THROUGH the catalog path, then stops") {
    // end-to-end pin of the wrapper forwarding (the canon-map drop that
    // once swallowed maxBytesPerTrigger): the catalog streaming plan must
    // hand BOTH the admission cap and the native AvailableNow latch down
    // to LakeChangeSource untouched, or this either runs as one giant
    // batch (cap lost) or never self-terminates (latch lost)
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "cdfcap")
    (2L to 5L).foreach(i =>
      lake.appendAtomic(Seq((i, "a")).toDF("id", "text"), "cdfcap"))
    val s2 = org.apache.spark.sql.NewspipeSqlBridge.sessionWithExtensions(
      spark, new newspipe.NewspipeExtensions()(_))
    val ckpt = Files.createTempDirectory("cdfcapck").toString
    val batches = new java.util.concurrent.atomic.AtomicInteger()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def drain(): Unit = {
      val q = s2.readStream
        .option("readChangeFeed", "true")
        .option("maxBytesPerTrigger", "1") // every commit exceeds 1 byte
        .table(s"lake.`$base`.cdfcap")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = b.select("id", "_change_type")
            .as[(Long, String)].collect()
          if (got.nonEmpty) { batches.incrementAndGet(); got.foreach(rows.add) }
          ()
        }
        .start()
      assert(q.awaitTermination(120000),
        "catalog AvailableNow run must stop itself")
    }
    drain()
    // one commit per batch (byte cap held from the first trigger) and the
    // whole 5-commit backlog arrived tagged
    batches.get() shouldBe 5
    rows.toArray(Array.empty[(Long, String)]).sorted shouldBe
      (1L to 5L).map(_ -> "insert").toArray
    // restart after a delete commit: checkpoint anchors, the CDF tag and
    // the caps both survive the catalog wrapper on the second run too
    lake.deleteWhere("cdfcap", $"id" === 1L)
    drain()
    rows.toArray(Array.empty[(Long, String)]).count(_._2 == "delete") shouldBe 1
    batches.get() shouldBe 6
  }

  test("CREATE TABLE PARTITIONED BY: hive layout from the first INSERT on") {
    spark.sql(s"CREATE TABLE lake.`$base`.part (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    spark.sql(s"INSERT INTO lake.`$base`.part " +
      "VALUES (1, 'en'), (2, 'fr'), (3, 'en')")
    // the declared layout landed as hive k=v directories
    val vDir = new java.io.File(s"$base/part/_v")
    val langDirs = vDir.listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getName).filter(_.startsWith("lang="))
    langDirs.toSet shouldBe Set("lang=en", "lang=fr")
    // further appends and overwrites keep the layout
    spark.sql(s"INSERT INTO lake.`$base`.part VALUES (4, 'de')")
    spark.sql(s"SELECT id FROM lake.`$base`.part WHERE lang = 'en' " +
      "ORDER BY id").as[Long].collect() shouldBe Array(1L, 3L)
    spark.sql(s"INSERT OVERWRITE lake.`$base`.part VALUES (9, 'zh')")
    val lake2 = new Lake(spark, LakeConfig(basePath = base))
    lake2.read("part").as[(Long, String)].collect() shouldBe
      Array((9L, "zh"))
    val newest = new java.io.File(
      s"$base/part/_v/${lake2.listVersions("part").head}")
    newest.listFiles().map(_.getName).filter(_.startsWith("lang=")) should
      contain("lang=zh")
    // non-identity transforms refuse loudly
    intercept[Exception] {
      spark.sql(s"CREATE TABLE lake.`$base`.badpart (id BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts))")
    }
  }

  test("partition pruning: a lang filter on a partitioned table scans only its directories") {
    spark.sql(s"CREATE TABLE lake.`$base`.pp (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    spark.sql(s"INSERT INTO lake.`$base`.pp " +
      "VALUES (1,'en'),(2,'fr'),(3,'de'),(4,'en')")
    spark.sql(s"INSERT INTO lake.`$base`.pp VALUES (5,'fr'),(6,'en')")
    val s2 = org.apache.spark.sql.NewspipeSqlBridge.sessionWithExtensions(
      spark, new newspipe.NewspipeExtensions()(_))
    // AQE off so the executed scan nodes (and their metrics) are directly
    // collectible; pruning itself is planning-time and AQE-independent
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = s2.sql(
        s"SELECT id FROM lake.`$base`.pp WHERE lang = 'en' ORDER BY id")
      df.collect().map(_.getLong(0)) shouldBe Array(1L, 4L, 6L)
      def parquetFilesUnder(langDir: String): Int =
        new java.io.File(s"$base/pp/_v").listFiles.filter(_.isDirectory)
          .flatMap(v => Option(new java.io.File(v, langDir).listFiles)
            .getOrElse(Array.empty[java.io.File]))
          .count(_.getName.endsWith(".parquet"))
      val enFiles = parquetFilesUnder("lang=en")
      val frFiles = parquetFilesUnder("lang=fr")
      val scanned = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.map(_.metrics("numFiles").value).sum
      // the filter reached the partition listing: only lang=en files were
      // opened — a post-scan residual filter would have read fr/de too
      scanned shouldBe enFiles.toLong
      frFiles should be > 0
    } finally s2.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("CTAS PARTITIONED BY lands the declared hive layout") {
    spark.sql(s"CREATE TABLE lake.`$base`.ctp PARTITIONED BY (lang) AS " +
      "SELECT * FROM VALUES (1L,'en'),(2L,'fr'),(3L,'en') AS t(id, lang)")
    spark.sql(s"SHOW PARTITIONS lake.`$base`.ctp")
      .as[String].collect().sorted shouldBe Array("lang=en", "lang=fr")
    spark.sql(s"SELECT id FROM lake.`$base`.ctp WHERE lang='en' ORDER BY id")
      .as[Long].collect() shouldBe Array(1L, 3L)
  }

  test("NOT NULL columns enforce as CHECK constraints on every write") {
    spark.sql(s"CREATE TABLE lake.`$base`.nn " +
      "(id BIGINT NOT NULL, text STRING)")
    spark.sql(s"INSERT INTO lake.`$base`.nn VALUES (1, 'a'), (2, NULL)")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO lake.`$base`.nn VALUES (CAST(NULL AS BIGINT), 'x')")
    }
    e.getMessage should include("CHECK")
    spark.sql(s"SELECT count(*) AS n FROM lake.`$base`.nn")
      .as[Long].head() shouldBe 2L
  }

  test("NOT NULL constraint keys stay distinct for sanitize-colliding names") {
    // `a b` and `a_b` both sanitize to a_b — the property keys must not
    // collide (raw-name hash suffix), so BOTH columns keep enforcement
    spark.sql(s"CREATE TABLE lake.`$base`.nncol " +
      "(`a b` BIGINT NOT NULL, a_b BIGINT NOT NULL, t STRING)")
    val props = lake.properties("nncol")
    props.keys.count(_.startsWith("lake.constraint.notnull_")) shouldBe 2
    intercept[Exception] {
      spark.sql(s"INSERT INTO lake.`$base`.nncol VALUES (NULL, 1, 'x')")
    }.getMessage should include("CHECK")
    intercept[Exception] {
      spark.sql(s"INSERT INTO lake.`$base`.nncol VALUES (1, NULL, 'x')")
    }.getMessage should include("CHECK")
    spark.sql(s"INSERT INTO lake.`$base`.nncol VALUES (1, 2, 'ok')")
    spark.sql(s"SELECT count(*) AS n FROM lake.`$base`.nncol")
      .as[Long].head() shouldBe 1L
  }

  test("createTable lands properties before the first commit") {
    // partition layout + constraints must be visible to any concurrent
    // INSERT from the instant the table exists
    spark.sql(s"CREATE TABLE lake.`$base`.propfirst " +
      "(id BIGINT NOT NULL, lang STRING) PARTITIONED BY (lang)")
    val props = lake.properties("propfirst")
    props("lake.partitionBy") shouldBe "lang"
    props.keys.exists(_.startsWith("lake.constraint.notnull_")) shouldBe true
  }

  test("metadata-only count(*): answered from the stats sidecar, no scan") {
    lake.writeAtomic(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
      .repartition(2), "mc")
    val s2 = org.apache.spark.sql.NewspipeSqlBridge.sessionWithExtensions(
      spark, new newspipe.NewspipeExtensions()(_))
    def plan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect(); df.queryExecution.executedPlan.toString
    }
    val df1 = s2.sql(s"SELECT count(*) AS n FROM lake.`$base`.mc")
    df1.as[Long].head() shouldBe 3L
    plan(df1) should not include "FileScan"
    plan(df1) should include("LocalTableScan")
    // DV'd layers fall back to the scan path (the plan carries the DV
    // filter, breaking the row-preserving shape) and stay correct
    lake.setProperties("mc", Map("lake.enableDeletionVectors" -> "true"))
    lake.deleteWhereDv("mc", $"id" === 2L)
    val df2 = s2.sql(s"SELECT count(*) AS n FROM lake.`$base`.mc")
    df2.as[Long].head() shouldBe 2L
    plan(df2) should include("FileScan")
    // filtered/grouped/derived counts still scan (and stay correct)
    val df3 = s2.sql(
      s"SELECT count(*) AS n FROM lake.`$base`.mc WHERE id > 1")
    df3.as[Long].head() shouldBe 1L
    plan(df3) should include("FileScan")
    // a stats-less layer falls back to the scan path
    val noStats = new Lake(spark,
      LakeConfig(basePath = base, collectStats = false))
    noStats.writeAtomic(Seq((9L, "z")).toDF("id", "text"), "mcns")
    val df4 = s2.sql(s"SELECT count(*) AS n FROM lake.`$base`.mcns")
    df4.as[Long].head() shouldBe 1L
    plan(df4) should include("FileScan")
  }

  test("SHOW PARTITIONS lists live hive partitions; mutation forms refuse") {
    spark.sql(s"CREATE TABLE lake.`$base`.sp (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    // declared but empty: no partitions yet
    spark.sql(s"SHOW PARTITIONS lake.`$base`.sp").count() shouldBe 0L
    spark.sql(s"INSERT INTO lake.`$base`.sp " +
      "VALUES (1,'en'),(2,'fr'),(3,'en')")
    spark.sql(s"SHOW PARTITIONS lake.`$base`.sp")
      .as[String].collect().sorted shouldBe Array("lang=en", "lang=fr")
    // the PARTITION(...) filter form narrows
    spark.sql(s"SHOW PARTITIONS lake.`$base`.sp PARTITION (lang='fr')")
      .as[String].collect() shouldBe Array("lang=fr")
    // a DELETE that empties a partition removes it from the listing
    spark.sql(s"DELETE FROM lake.`$base`.sp WHERE lang = 'fr'")
    spark.sql(s"SHOW PARTITIONS lake.`$base`.sp")
      .as[String].collect() shouldBe Array("lang=en")
    // hive-escaped directory values round-trip: the identifier carries
    // the UNESCAPED value, the listing shows the hive-escaped form
    spark.sql(s"INSERT INTO lake.`$base`.sp VALUES (7, 'a/b')")
    val lakeSp = new Lake(spark, LakeConfig(basePath = base))
    lakeSp.partitionValues("sp").map(_.head) should contain(Some("a/b"))
    spark.sql(s"SHOW PARTITIONS lake.`$base`.sp PARTITION (lang='a/b')")
      .count() shouldBe 1L
    // partitions are data-defined: ADD/DROP PARTITION refuse loudly
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.`$base`.sp ADD PARTITION (lang='zh')")
    }
    e.getMessage should include("data-defined")
  }

  test("four racing SQL INSERT INTO statements all land (OCC retry inside)") {
    lake.writeAtomic(Seq((0L, "base")).toDF("id", "text"), "race")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (1 to 4).map { w =>
      Future {
        spark.sql(s"INSERT INTO lake.`$base`.race VALUES ($w, 'writer$w')")
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    spark.sql(s"SELECT id FROM lake.`$base`.race ORDER BY id")
      .as[Long].collect() shouldBe Array(0L, 1L, 2L, 3L, 4L)
    new Lake(spark, LakeConfig(basePath = base))
      .historyRows("race").map(_.getString(2)) shouldBe
      Seq("WRITE", "APPEND", "APPEND", "APPEND", "APPEND")
  }

  test("deletion-vector layers read correctly through the catalog") {
    lake.writeAtomic(
      (1L to 100L).map(i => (i, s"t$i")).toDF("id", "text"), "dvcat")
    lake.setProperties("dvcat", Map("lake.enableDeletionVectors" -> "true"))
    lake.deleteWhere("dvcat", col("id") <= 10L)
    spark.sql(s"SELECT count(*) AS n FROM lake.`$base`.dvcat")
      .as[Long].head() shouldBe 90L
  }

  test("ALTER TABLE ADD COLUMN: metadata-only DDL through the catalog") {
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "addc")
    spark.sql(s"ALTER TABLE lake.`$base`.addc ADD COLUMN (score DOUBLE)")
    spark.sql(s"SELECT score FROM lake.`$base`.addc").collect()
      .forall(_.isNullAt(0)) shouldBe true
    spark.sql(s"INSERT INTO lake.`$base`.addc VALUES (2, 'b', 0.25)")
    spark.sql(s"SELECT id, score FROM lake.`$base`.addc ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1.0 else r.getDouble(1))) shouldBe
      Array((1L, -1.0), (2L, 0.25))
    // NOT NULL additions are refused (no existing row can satisfy them)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.`$base`.addc ADD COLUMN (x INT NOT NULL)")
    }
    e.getMessage should include("nullable")
  }

  // ---- atomic CREATE OR REPLACE / RTAS (StagingTableCatalog) --------------

  test("REPLACE TABLE AS SELECT: new data and schema visible only after " +
      "the commit; pre-replace versions keep serving (history retained)") {
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), "rtas")
    val preVersions = lake.listVersions("rtas")
    spark.sql(s"REPLACE TABLE lake.`$base`.rtas AS " +
      "SELECT * FROM VALUES (10L, 'x', 1.5D), (20L, 'y', 2.5D) " +
      "AS t(id, label, score)")
    // post-replace: new schema + new rows
    spark.sql(s"SELECT id, label, score FROM lake.`$base`.rtas ORDER BY id")
      .as[(Long, String, Double)].collect() shouldBe
      Array((10L, "x", 1.5), (20L, "y", 2.5))
    // the replacement is ONE new committed version; every pre-replace
    // version still serves the old incarnation via time travel
    val postVersions = lake.listVersions("rtas")
    postVersions.size shouldBe preVersions.size + 1
    spark.sql(s"SELECT id, text FROM lake.`$base`.rtas " +
      s"VERSION AS OF '${preVersions.sorted.last}' ORDER BY id")
      .as[(Long, String)].collect() shouldBe Array((1L, "a"), (2L, "b"))
  }

  test("REPLACE TABLE without AS: schema-only replacement reads empty; " +
      "declaration (partitioning, defaults) wholly superseded") {
    spark.sql(s"CREATE TABLE lake.`$base`.repl " +
      "(id BIGINT, lang STRING, note STRING DEFAULT 'n') " +
      "PARTITIONED BY (lang)")
    spark.sql(s"INSERT INTO lake.`$base`.repl VALUES (1, 'en', 'x')")
    spark.sql(s"REPLACE TABLE lake.`$base`.repl (k BIGINT, v STRING)")
    spark.sql(s"SELECT * FROM lake.`$base`.repl").columns.toSeq shouldBe
      Seq("k", "v")
    spark.sql(s"SELECT count(*) AS n FROM lake.`$base`.repl")
      .as[Long].head() shouldBe 0L
    // the old incarnation's declaration is gone with it
    lake.properties("repl").get("lake.partitionBy") shouldBe None
    lake.columnDefaults("repl") shouldBe empty
    // and the new incarnation accepts writes under the new schema
    spark.sql(s"INSERT INTO lake.`$base`.repl VALUES (5, 'z')")
    spark.sql(s"SELECT k, v FROM lake.`$base`.repl")
      .as[(Long, String)].collect() shouldBe Array((5L, "z"))
  }

  test("REPLACE TABLE on a missing table refuses at stage time; CREATE " +
      "OR REPLACE creates it") {
    intercept[Exception] {
      spark.sql(s"REPLACE TABLE lake.`$base`.ghost (id BIGINT)")
    }
    lake.listVersions("ghost") shouldBe empty
    spark.sql(s"CREATE OR REPLACE TABLE lake.`$base`.corw AS " +
      "SELECT 1L AS id, 'a' AS text")
    spark.sql(s"SELECT id, text FROM lake.`$base`.corw")
      .as[(Long, String)].collect() shouldBe Array((1L, "a"))
    // and again over the existing incarnation
    spark.sql(s"CREATE OR REPLACE TABLE lake.`$base`.corw AS " +
      "SELECT 9L AS id")
    spark.sql(s"SELECT id FROM lake.`$base`.corw")
      .as[Long].collect() shouldBe Array(9L)
  }

  test("failed-staging property rollback is VALUE-CHECKED: keys a racing " +
      "winner overwrote stay the winner's; keys still ours revert") {
    // the race window (prior read → failed CAS) is a timing interleave,
    // so the guard is pinned at the decision function commitStagedChanges
    // restores through: revert exactly the keys whose live value is
    // still what THIS staging wrote, back to their pre-staging values
    val prior = Map("lake.constraint.old" -> "a > 0", "other" -> "v")
    val wrote = Map(
      "lake.constraint.old" -> "", // we cleared the old declaration
      "lake.identity.id" -> "1|1", // we declared identity
      "lake.partitionBy" -> "k") // we declared layout
    // nothing intervened: every written key still holds our value →
    // full rollback (clears what we set, restores what we cleared)
    StagedRestore.revertOwnKeys(
      current = Map("lake.identity.id" -> "1|1",
        "lake.partitionBy" -> "k", "other" -> "v"),
      prior = prior, wrote = wrote) shouldBe Map(
      "lake.constraint.old" -> "a > 0",
      "lake.identity.id" -> "",
      "lake.partitionBy" -> "")
    // a concurrent winner re-declared the constraint and the identity
    // between our prior read and the failed CAS: those keys are the
    // WINNER's now and must survive; only the key still holding our
    // value rolls back
    StagedRestore.revertOwnKeys(
      current = Map("lake.constraint.old" -> "b < 9",
        "lake.identity.id" -> "5|2", "lake.partitionBy" -> "k"),
      prior = prior, wrote = wrote) shouldBe Map("lake.partitionBy" -> "")
    // no-op reverts are dropped (prior value == live value)
    StagedRestore.revertOwnKeys(
      current = Map("x" -> "same"),
      prior = Map("x" -> "same"),
      wrote = Map("x" -> "same")) shouldBe Map.empty
  }

  test("REPLACE TABLE restarts identity numbering (Delta semantics) and " +
      "labels history REPLACE TABLE") {
    spark.sql(s"CREATE TABLE lake.`$base`.rident (" +
      "rid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 " +
      "INCREMENT BY 5), text STRING)")
    spark.sql(s"INSERT INTO lake.`$base`.rident (text) VALUES ('a'), ('b')")
    lake.read("rident").select("rid").as[Long].collect().sorted shouldBe
      Array(10L, 15L)
    spark.sql(s"REPLACE TABLE lake.`$base`.rident (" +
      "rid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 " +
      "INCREMENT BY 5), text STRING)")
    lake.historyRows("rident").last.getString(2) shouldBe "REPLACE TABLE"
    spark.sql(s"INSERT INTO lake.`$base`.rident (text) VALUES ('c')")
    lake.read("rident").select("rid", "text").as[(Long, String)]
      .collect() shouldBe Array((10L, "c")) // numbering restarted
  }

  test("replaceAtomic with rows on a retained identity declaration " +
      "restarts numbering from START") {
    lake.addIdentityColumn("rident2", "rid", start = 1L, step = 1L)
    lake.writeAtomic(Seq("a", "b", "c").toDF("text"), "rident2") // 1..3
    lake.replaceAtomic(Seq("z").toDF("text"), "rident2")
    lake.read("rident2").select("rid").as[Long].collect() shouldBe
      Array(1L) // not 4
    lake.historyRows("rident2").last.getString(2) shouldBe "REPLACE TABLE"
  }

  test("REPLACE over a DV-carrying table: the new head is DV-free; the " +
      "pre-replace version still hides its soft-deleted rows") {
    lake.writeAtomic((1L to 50L).map(i => (i, s"t$i")).toDF("id", "text"),
      "rdv")
    lake.setProperties("rdv", Map("lake.enableDeletionVectors" -> "true"))
    lake.deleteWhereDv("rdv", $"id" <= 10L)
    val preV = lake.listVersions("rdv").head
    spark.sql(s"REPLACE TABLE lake.`$base`.rdv AS SELECT 99L AS id")
    lake.deletionVectors("rdv") shouldBe empty
    spark.sql(s"SELECT id FROM lake.`$base`.rdv").as[Long]
      .collect() shouldBe Array(99L)
    // the pinned pre-replace read applies ITS version's DV map
    lake.readVersion("rdv", preV).count() shouldBe 40L
  }

  test("SHOW CREATE TABLE reproduces schema, partitioning and properties") {
    spark.sql(s"CREATE TABLE lake.`$base`.sct (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang) TBLPROPERTIES ('team'='pipeline')")
    val ddl = spark.sql(s"SHOW CREATE TABLE lake.`$base`.sct")
      .as[String].head()
    ddl should include("id BIGINT")
    ddl should include("lang STRING")
    ddl should include("PARTITIONED BY (lang)")
    ddl should include("'team' = 'pipeline'")
  }

  test("RTAS with PARTITIONED BY lands the new hive layout") {
    lake.writeAtomic(Seq((1L, "en")).toDF("id", "lang"), "rpart")
    spark.sql(s"REPLACE TABLE lake.`$base`.rpart PARTITIONED BY (lang) AS " +
      "SELECT * FROM VALUES (1L, 'en'), (2L, 'de'), (3L, 'en') " +
      "AS t(id, lang)")
    lake.properties("rpart").get("lake.partitionBy") shouldBe Some("lang")
    spark.sql(s"SELECT id FROM lake.`$base`.rpart WHERE lang = 'en' " +
      "ORDER BY id").as[Long].collect() shouldBe Array(1L, 3L)
    // partition dirs really exist in the new snapshot (layout, not just rows)
    val head = lake.listVersions("rpart").sorted.last
    val snapDir = new java.io.File(s"$base/rpart/_v/$head")
    snapDir.listFiles().map(_.getName).count(_.startsWith("lang=")) shouldBe 2
  }
}
