package newspipe.io

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SQL DML over lake layers (LakeSql + the injected LakeDmlParser):
  * statement form == Scala API form on every row op, richer clause shapes
  * refused loudly, and the parser-injection path works on a session built
  * with NewspipeExtensions.
  */
class LakeSqlSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLayer(): (String, Lake) = {
    val dir = Files.createTempDirectory("lakesql").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic((1 to 100).map(i =>
      (i.toLong, s"t$i", if (i % 3 == 0) "en" else "de", i.toLong * 10))
      .toDF("id", "text", "lang", "n")
      .repartitionByRange(4, $"id").sortWithinPartitions("id"), "docs")
    (dir, lake)
  }

  test("DELETE FROM lake.`base`.layer WHERE — statement equals deleteWhere") {
    val (dir, lake) = freshLayer()
    val m = LakeSql.sql(spark,
      s"DELETE FROM lake.`$dir`.docs WHERE lang = 'en' AND n < 500")
      .collect().head
    m.getString(0) shouldBe "DELETE"
    m.getInt(1) should be >= 1 // rewrote at least the matching files
    lake.read("docs").filter($"lang" === "en" && $"n" < 500)
      .count() shouldBe 0
    lake.read("docs").count() shouldBe 100 -
      (1 to 100).count(i => i % 3 == 0 && i * 10 < 500)
  }

  test("UPDATE lake.`base`.layer SET — simultaneous assignments, original-row reads") {
    val (dir, lake) = freshLayer()
    LakeSql.sql(spark,
      s"UPDATE lake.`$dir`.docs SET n = n * 2, text = concat('up:', text) " +
        "WHERE id <= 10")
    val out = lake.read("docs")
    out.filter($"id" === 5L).select("n", "text").as[(Long, String)]
      .head() shouldBe ((100L, "up:t5"))
    out.filter($"id" === 50L).select("n", "text").as[(Long, String)]
      .head() shouldBe ((500L, "t50"))
    out.count() shouldBe 100
  }

  test("MERGE INTO … USING view ON keys WHEN MATCHED UPDATE SET * / NOT MATCHED INSERT *") {
    val (dir, lake) = freshLayer()
    Seq((5L, "patched", "en", -1L), (5000L, "brand-new", "fr", 7L))
      .toDF("id", "text", "lang", "n").createOrReplaceTempView("lakesql_src")
    val m = LakeSql.sql(spark,
      s"""MERGE INTO lake.`$dir`.docs AS t USING lakesql_src AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect().head
    m.getString(0) shouldBe "MERGE"
    val out = lake.read("docs")
    out.count() shouldBe 101
    out.filter($"id" === 5L).select("text").as[String].head() shouldBe "patched"
    out.filter($"id" === 5000L).select("lang").as[String].head() shouldBe "fr"
    // key-clustered layout → narrow source keys rewrite only can-match files
    m.getInt(2) should be >= 3
  }

  test("MERGE WITH SCHEMA EVOLUTION INTO adds source columns") {
    val (dir, lake) = freshLayer()
    Seq((7L, "ev", "en", 1L, 0.9))
      .toDF("id", "text", "lang", "n", "score")
      .createOrReplaceTempView("lakesql_evolve_src")
    LakeSql.sql(spark,
      s"""MERGE WITH SCHEMA EVOLUTION INTO lake.`$dir`.docs AS t
         |USING lakesql_evolve_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = lake.read("docs")
    out.schema.fieldNames should contain("score")
    out.filter($"id" === 7L).select("score").as[Double].head() shouldBe 0.9
    out.filter($"score".isNull).count() shouldBe 99
  }

  test("unsupported DML shapes are refused loudly, not approximated") {
    val (dir, lake) = freshLayer()
    Seq((1L, "x", "en", 1L)).toDF("id", "text", "lang", "n")
      .createOrReplaceTempView("lakesql_bad_src")
    // a MATCHED-DELETE clause ROUTES (round 14: the full clause matrix)
    LakeSql.sql(spark,
      s"""MERGE INTO lake.`$dir`.docs AS t USING lakesql_bad_src AS s
         |ON t.id = s.id WHEN MATCHED THEN DELETE""".stripMargin)
      .collect().head.getString(0) shouldBe "MERGE"
    lake.read("docs").filter($"id" === 1L).count() shouldBe 0L
    // non-equi ON clause stays refused
    an[IllegalArgumentException] should be thrownBy LakeSql.sql(spark,
      s"""MERGE INTO lake.`$dir`.docs AS t USING lakesql_bad_src AS s
         |ON t.id > s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
  }

  test("non-lake statements fall through untouched") {
    LakeSql.sql(spark, "SELECT 1 + 1 AS two").as[Int].head() shouldBe 2
    // DML on a non-lake target keeps Spark's own (v2-table) error path
    a[Throwable] should be thrownBy
      LakeSql.sql(spark, "DELETE FROM some_missing_table WHERE x = 1")
  }

  test("OPTIMIZE statement compacts; ZORDER BY form clusters for skipping") {
    val (dir, lake) = freshLayer()
    val m = LakeSql.sql(spark, s"OPTIMIZE lake.`$dir`.docs").collect().head
    m.getString(0) shouldBe "OPTIMIZE"
    // result = the new head snapshot's version id
    lake.listVersions("docs").head shouldBe m.getString(1)
    lake.read("docs").count() shouldBe 100
    val m2 = LakeSql.sql(spark,
      s"OPTIMIZE lake.`$dir`.docs ZORDER BY (id, n)").collect().head
    m2.getString(0) shouldBe "OPTIMIZE"
    lake.read("docs").count() shouldBe 100
    lake.read("docs").agg(sum($"n")).as[Long].head() shouldBe
      (1 to 100).map(_ * 10L).sum
  }

  test("OPTIMIZE WHERE: scoped compaction rewrites only the matching " +
      "partitions' files; data-invisible") {
    val dir = Files.createTempDirectory("lakesql_ow").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.writeAtomic((1 to 100).map(i =>
        (i.toLong, if (i % 2 == 0) "en" else "de", i.toLong))
      .toDF("id", "lang", "n").repartition(8), "docs",
      partitionBy = Seq("lang"))
    def liveFiles(langV: String): Set[String] =
      lake.read("docs").where($"lang" === langV)
        .select(input_file_name()).distinct().as[String].collect().toSet
    val deBefore = liveFiles("de")
    val enBefore = liveFiles("en")
    enBefore.size should be >= 2 // slivers to consolidate
    val m = LakeSql.sql(spark,
      s"OPTIMIZE lake.`$dir`.docs WHERE lang = 'en'").collect().head
    m.getString(0) shouldBe "OPTIMIZE"
    lake.listVersions("docs").head shouldBe m.getString(1)
    // untouched partition rides the manifest BY REFERENCE — identical
    // physical files; the scoped partition consolidated to fresh ones
    liveFiles("de") shouldBe deBefore
    val enAfter = liveFiles("en")
    enAfter.size shouldBe 1
    enAfter.intersect(enBefore) shouldBe Set.empty
    lake.read("docs").agg(sum($"n")).as[Long].head() shouldBe
      (1 to 100).map(_.toLong).sum
    // no matching partition → explicit noop, head unchanged
    lake.compactWhere("docs", $"lang" === "zz").noop shouldBe true
    // non-partition predicate refused loudly (Delta's rule)
    intercept[IllegalArgumentException] {
      lake.compactWhere("docs", $"n" > 5)
    }.getMessage should include("partition columns")
    // scoped ZORDER form: clusters inside the selected partition only
    LakeSql.sql(spark,
      s"OPTIMIZE lake.`$dir`.docs WHERE lang = 'de' ZORDER BY (n)")
    liveFiles("en") shouldBe enAfter // en untouched this time
    lake.read("docs").count() shouldBe 100
  }

  test("VACUUM statement: KEEP n SNAPSHOTS reclaims; manifests pin their references") {
    val (dir, lake) = freshLayer()
    LakeSql.sql(spark, s"DELETE FROM lake.`$dir`.docs WHERE id <= 10")
    // OPTIMIZE lands a SELF-CONTAINED snapshot — without it, the delete's
    // manifest pins v1's carried files and nothing is reclaimable (the
    // protection Delta gives data files of live versions)
    LakeSql.sql(spark, s"OPTIMIZE lake.`$dir`.docs")
    lake.listVersions("docs").size shouldBe 3
    val mk = LakeSql.sql(spark,
      s"VACUUM lake.`$dir`.docs KEEP 1 SNAPSHOTS").collect().head
    mk.getString(0) shouldBe "VACUUM"
    mk.getString(1) shouldBe "1"
    lake.listVersions("docs").size shouldBe 1
    lake.read("docs").count() shouldBe 90
    // RETAIN form: the post-compaction layer is ONE file, so this delete
    // rewrites it fully (self-contained, no carried pins) and RETAIN 0
    // HOURS trims history to the head alone
    LakeSql.sql(spark, s"DELETE FROM lake.`$dir`.docs WHERE id > 80")
    Thread.sleep(15) // commit instants strictly before the RETAIN cutoff
    val mr = LakeSql.sql(spark,
      s"VACUUM lake.`$dir`.docs RETAIN 0 HOURS").collect().head
    mr.getString(1) shouldBe "1"
    lake.read("docs").count() shouldBe 70
  }

  test("RESTORE statement: TO VERSION AS OF and TO TIMESTAMP AS OF") {
    val (dir, lake) = freshLayer()
    val v1 = lake.listVersions("docs").head
    Thread.sleep(15)
    LakeSql.sql(spark, s"DELETE FROM lake.`$dir`.docs WHERE id <= 50")
    lake.read("docs").count() shouldBe 50
    val m = LakeSql.sql(spark,
      s"RESTORE TABLE lake.`$dir`.docs TO VERSION AS OF '$v1'")
      .collect().head
    m.getString(0) shouldBe "RESTORE"
    lake.listVersions("docs").head shouldBe m.getString(1)
    lake.read("docs").count() shouldBe 100
    // timestamp form resolves through the same readAsOf rule
    Thread.sleep(15)
    LakeSql.sql(spark, s"DELETE FROM lake.`$dir`.docs WHERE id > 50")
    val t1 = v1.take(16).toLong
    LakeSql.sql(spark,
      s"RESTORE lake.`$dir`.docs TO TIMESTAMP AS OF $t1")
    lake.read("docs").count() shouldBe 100
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES flips DV mode for the DELETE statement") {
    val (dir, lake) = freshLayer()
    val m = LakeSql.sql(spark,
      s"""ALTER TABLE lake.`$dir`.docs SET TBLPROPERTIES
         |('lake.enableDeletionVectors'='true')""".stripMargin)
      .collect().head
    m.getString(0) shouldBe "SET TBLPROPERTIES"
    m.getString(1) should include("lake.enableDeletionVectors=true")
    // the DELETE statement now commits a deletion vector — zero rewrites
    val d = LakeSql.sql(spark,
      s"DELETE FROM lake.`$dir`.docs WHERE id = 5").collect().head
    d.getInt(1) shouldBe 0
    lake.read("docs").count() shouldBe 99
    lake.deletionVectors("docs").size shouldBe 1
    // UNSET restores the rewrite path
    LakeSql.sql(spark,
      s"""ALTER TABLE lake.`$dir`.docs UNSET TBLPROPERTIES
         |('lake.enableDeletionVectors')""".stripMargin)
    val d2 = LakeSql.sql(spark,
      s"DELETE FROM lake.`$dir`.docs WHERE id = 6").collect().head
    d2.getInt(1) should be >= 1
    lake.read("docs").count() shouldBe 98
  }

  test("maintenance statements ride the injected parser (plain spark.sql)") {
    val (dir, lake) = freshLayer()
    val s2 = org.apache.spark.sql.NewspipeSqlBridge.sessionWithExtensions(
      spark, new newspipe.NewspipeExtensions()(_))
    val m = s2.sql(s"OPTIMIZE lake.`$dir`.docs ZORDER BY (id)")
      .collect().head
    m.getString(0) shouldBe "OPTIMIZE"
    lake.read("docs").count() shouldBe 100
    // a non-lake OPTIMIZE still fails in Spark's own parser (not silently
    // swallowed by the recognizer)
    a[Throwable] should be thrownBy s2.sql("OPTIMIZE some_table")
  }

  test("parser injection: plain spark.sql DML on a session built with NewspipeExtensions") {
    val (dir, lake) = freshLayer()
    val s2 = org.apache.spark.sql.NewspipeSqlBridge.sessionWithExtensions(
      spark, new newspipe.NewspipeExtensions()(_))
    val m = s2.sql(s"DELETE FROM lake.`$dir`.docs WHERE id <= 25").collect().head
    m.getString(0) shouldBe "DELETE"
    lake.read("docs").count() shouldBe 75
    // the injected parser delegates everything else verbatim
    s2.sql("SELECT 2 + 2 AS four").collect().head.getInt(0) shouldBe 4
    // and the TVF surface rides along on the same session
    s2.sql(s"SELECT count(*) AS n FROM lake_read('$dir', 'docs')")
      .collect().head.getLong(0) shouldBe 75L
  }


  test("DESCRIBE HISTORY: op labels recorded per commit, oldest first, UNKNOWN fallback") {
    val (dir, lake) = freshLayer()
    lake.deleteWhere("docs", $"lang" === "en")
    lake.appendAtomic((200L to 205L).map(i => (i, s"t$i", "fr", i * 10))
      .toDF("id", "text", "lang", "n"), "docs")
    LakeSql.sql(spark, s"OPTIMIZE lake.`$dir`.docs")
    val v1 = lake.listVersions("docs").last
    lake.restore("docs", v1)

    val h = LakeSql.sql(spark, s"DESCRIBE HISTORY lake.`$dir`.docs")
      .orderBy("ordinal").collect()
    h.map(_.getString(2)).toSeq shouldBe
      Seq("WRITE", "DELETE", "APPEND", "OPTIMIZE", "RESTORE")
    h.map(_.getInt(0)).toSeq shouldBe (1 to 5)
    // parent chain: each row's parent is the previous row's version
    h.sliding(2).foreach { case Array(prev, cur) =>
      cur.getString(3) shouldBe prev.getString(1)
    }
    h.head.getString(3) shouldBe "" // first commit has no parent
    // operationMetrics (recorded at commit, O(increment)): every commit
    // of this build carries file deltas + added-row counts
    h.foreach { r =>
      withClue(s"commit ${r.getString(2)}: ") {
        r.isNullAt(4) shouldBe false // num_added_files
        r.isNullAt(5) shouldBe false // num_removed_files
        r.isNullAt(6) shouldBe false // num_added_rows
      }
    }
    val byOp = h.map(r => r.getString(2) ->
      (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    byOp("WRITE")._2 shouldBe 0L // first commit removed nothing
    byOp("APPEND")._2 shouldBe 0L // pure append removes nothing
    byOp("APPEND")._3 shouldBe 6L // the six appended rows
    byOp("DELETE")._1 should be >= 1L // rewrote the matching file(s)
    byOp("DELETE")._2 should be >= 1L
    // operationParameters: the DELETE records its predicate text; the
    // commit instant is recorded wall-clock (non-null on every commit)
    val del = h.find(_.getString(2) == "DELETE").get
    del.getString(8) should include("lang")
    h.foreach(r => r.getTimestamp(7) should not be null)

    // a snapshot missing its _OP (pre-feature / foreign writer) reads UNKNOWN
    val newest = lake.listVersions("docs").head
    val opFile = new org.apache.hadoop.fs.Path(s"$dir/docs/_v/$newest/_OP")
    opFile.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(opFile, false)
    LakeSql.sql(spark, s"DESCRIBE HISTORY lake.`$dir`.docs")
      .orderBy("ordinal").collect().last.getString(2) shouldBe "UNKNOWN"
  }

  test("DESCRIBE HISTORY LIMIT n: only the n newest commits materialize, " +
      "absolute ordinals, oldest-first within the window") {
    val (dir, lake) = freshLayer()
    lake.deleteWhere("docs", $"lang" === "en")
    lake.appendAtomic((200L to 205L).map(i => (i, s"t$i", "fr", i * 10))
      .toDF("id", "text", "lang", "n"), "docs")
    LakeSql.sql(spark, s"OPTIMIZE lake.`$dir`.docs")

    val limited = LakeSql.sql(spark,
      s"DESCRIBE HISTORY lake.`$dir`.docs LIMIT 2")
      .orderBy("ordinal").collect()
    limited.map(_.getString(2)).toSeq shouldBe Seq("APPEND", "OPTIMIZE")
    // ordinals keep their ABSOLUTE positions (4 commits total)
    limited.map(_.getInt(0)).toSeq shouldBe Seq(3, 4)
    // the limited rows are byte-identical to the unlimited tail
    val full = LakeSql.sql(spark, s"DESCRIBE HISTORY lake.`$dir`.docs")
      .orderBy("ordinal").collect()
    full.length shouldBe 4
    limited.toSeq shouldBe full.takeRight(2).toSeq
    // LIMIT larger than history = the whole history; LIMIT 0 refused
    LakeSql.sql(spark, s"DESCRIBE HISTORY lake.`$dir`.docs LIMIT 99")
      .collect().length shouldBe 4
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark, s"DESCRIBE HISTORY lake.`$dir`.docs LIMIT 0")
        .collect()
    }
    // the TVF surface takes the same optional limit
    newspipe.NewspipeExtensions.register(spark)
    spark.sql(s"SELECT operation FROM lake_history('$dir', 'docs', 2) " +
        "ORDER BY ordinal").collect().map(_.getString(0)).toSeq shouldBe
      Seq("APPEND", "OPTIMIZE")
  }

  test("ANALYZE TABLE COMPUTE STATISTICS: a stats-less layer gains file " +
      "skipping and metadata-only counts through ONE metadata commit") {
    val dir = Files.createTempDirectory("lakesql_an").toString
    // collectStats = false: the writes land NO sidecar — the shape of a
    // foreign writer or a soft-failed harvest
    val statless = new Lake(spark,
      LakeConfig(basePath = dir, collectStats = false))
    statless.writeAtomic((1 to 100).map(i => (i.toLong, s"t$i"))
      .toDF("id", "text")
      .repartitionByRange(5, $"id").sortWithinPartitions("id"), "docs")
    val v1 = statless.listVersions("docs").head
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    lake.metadataRowCount("docs") shouldBe None // no stats, no shortcut
    // stats-less delete: every file COULD match — full rewrite (run via
    // the stats-off instance so ITS commit doesn't harvest a sidecar)
    val blind = statless.deleteWhere("docs", $"id" === -1L)
    blind.rewrittenFiles shouldBe 5
    // roll back to the original 5-file range layout (still stats-less)
    statless.restore("docs", v1)
    lake.metadataRowCount("docs") shouldBe None
    val m = LakeSql.sql(spark,
      s"ANALYZE TABLE lake.`$dir`.docs COMPUTE STATISTICS").head()
    m.getString(0) shouldBe "ANALYZE"
    m.getString(1) should startWith("files=5")
    // metadata-only count works now, and a selective delete prunes
    lake.metadataRowCount("docs") shouldBe Some(100L)
    val pruned = lake.deleteWhere("docs", $"id".between(1L, 10L))
    pruned.rewrittenFiles should be <= 2
    pruned.carriedFiles should be >= 3
    lake.read("docs").count() shouldBe 90L
    lake.historyRows("docs").map(_.getString(2)) should contain("ANALYZE")
    // non-lake ANALYZE still reaches Spark's own implementation
    (1 to 3).map(i => (i, s"x$i")).toDF("a", "b")
      .write.mode("overwrite").saveAsTable("an_plain")
    LakeSql.sql(spark, "ANALYZE TABLE an_plain COMPUTE STATISTICS")
    spark.sql("DROP TABLE an_plain")
  }

  test("metrics document round-trips adversarial operation parameters " +
      "(quotes, backslashes, newlines, control chars)") {
    val params = Map(
      "predicate" -> "(text = \"a\\\"b\")",
      "keys" -> "k1,k2",
      "weird" -> "line1\nline2\ttab\r\u0001ctl",
      "path" -> "C:\\tmp\\x")
    val body = Lake.metricsJson(3, 1, Some(42L), params)
    // the document must stay parseable JSON (the driver-side contract)
    val parsed = org.json4s.jackson.JsonMethods.parse(body)
    val back = (parsed \ "params").asInstanceOf[org.json4s.JObject]
      .obj.map { case (k, v) =>
        k -> v.asInstanceOf[org.json4s.JString].s }.toMap
    back shouldBe params
    val (af, rf, ar, ts, raw) = Lake.parseMetrics(body)
    (af, rf, ar) shouldBe ((Some(3L), Some(1L), Some(42L)))
    ts.isDefined shouldBe true
    raw.isDefined shouldBe true
    // and the surfaced raw text is itself valid JSON
    org.json4s.jackson.JsonMethods.parse(raw.get)
  }

  test("runMaintenance rejects the multi-row HISTORY statement loudly") {
    val e = intercept[IllegalArgumentException] {
      LakeSql.runMaintenance(spark, LakeSql.LakeHistory("/tmp/none", "docs"))
    }
    e.getMessage should include("runMaintenanceRows")
  }

  test("CONVERT TO LAKE adopts a flat layer metadata-only; VACUUM DRY RUN deletes nothing") {
    val dir = Files.createTempDirectory("lakesqlcv").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    // a pre-protocol FLAT hive-partitioned parquet layer
    (1 to 50).map(i => (i.toLong, if (i % 2 == 0) "en" else "fr"))
      .toDF("id", "lang").repartition(2)
      .write.partitionBy("lang").parquet(s"$dir/docs")
    def rootDataFiles(): Set[String] = {
      val f = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val it = f.listFiles(new org.apache.hadoop.fs.Path(s"$dir/docs"), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet") &&
            !s.getPath.toString.contains("/_v/"))
          b += s.getPath.toString
      }
      b.result()
    }
    val before = rootDataFiles()
    LakeSql.sql(spark, s"CONVERT TO LAKE lake.`$dir`.docs")
      .collect().head.getString(0) shouldBe "CONVERT"
    // snapshot-managed now: same rows, op recorded, ZERO files moved
    lake.historyRows("docs").map(_.getString(2)) shouldBe Seq("CONVERT")
    lake.read("docs").count() shouldBe 50L
    rootDataFiles() shouldBe before
    // stats sidecar collected at convert: a selective read prunes
    lake.readWhere("docs", $"id" === 1L).count() shouldBe 1L
    // row ops rewrite only affected adopted files, carry the rest
    lake.deleteWhere("docs", $"id" === 2L)
    lake.read("docs").count() shouldBe 49L
    // appends keep the adopted hive layout
    lake.appendAtomic(Seq((100L, "de")).toDF("id", "lang"), "docs")
    lake.read("docs").filter($"lang" === "de").count() shouldBe 1L
    // re-convert refuses
    intercept[IllegalArgumentException] { lake.convertToLake("docs") }
    // DRY RUN: reports the one superseded reclaimable version, deletes none
    val nBefore = lake.listVersions("docs").size
    val m = LakeSql.sql(spark,
      s"VACUUM lake.`$dir`.docs KEEP 1 SNAPSHOTS DRY RUN").collect().head
    m.getString(0) shouldBe "VACUUM DRY RUN"
    m.getString(1) shouldBe "1"
    lake.listVersions("docs").size shouldBe nBefore
    // the real vacuum then reclaims it; reads survive (adopted root files
    // and pinned referenced dirs are never swept)
    LakeSql.sql(spark, s"VACUUM lake.`$dir`.docs KEEP 1 SNAPSHOTS").collect()
    lake.listVersions("docs").size shouldBe (nBefore - 1)
    lake.read("docs").count() shouldBe 50L
  }

  test("DESCRIBE DETAIL: physical metadata of the current snapshot") {
    val (dir, lake) = freshLayer()
    lake.appendAtomic(Seq((200L, "x", "fr", 5L)).toDF("id", "text", "lang", "n"),
      "docs")
    lake.setProperties("docs", Map("owner" -> "pipeline"))
    val d = LakeSql.sql(spark, s"DESCRIBE DETAIL lake.`$dir`.docs").collect()
    d.length shouldBe 1
    val r = d.head
    r.getAs[String]("format") shouldBe "parquet"
    r.getAs[String]("location") shouldBe s"$dir/docs"
    // inventory = 4 write files + 1 append file, all carried live
    r.getAs[Long]("numFiles") shouldBe 5L
    r.getAs[Long]("sizeInBytes") should be > 0L
    r.getAs[Seq[String]]("partitionColumns") shouldBe Seq.empty
    r.getAs[Int]("numVersions") shouldBe 2
    r.getAs[Int]("numDeletionVectors") shouldBe 0
    val created = r.getAs[java.sql.Timestamp]("createdAt").getTime
    val modified = r.getAs[java.sql.Timestamp]("lastModified").getTime
    created should be <= modified
    modified should be <= System.currentTimeMillis()
    r.getAs[Map[String, String]]("properties") shouldBe
      Map("owner" -> "pipeline")
    // partitioned + DV'd layer surfaces both
    lake.writeAtomic(Seq((1L, "en"), (2L, "fr")).toDF("id", "lang"), "pt",
      partitionBy = Seq("lang"))
    lake.deleteWhereDv("pt", $"id" === 1L)
    val r2 = LakeSql.sql(spark, s"DESCRIBE DETAIL lake.`$dir`.pt")
      .collect().head
    r2.getAs[Seq[String]]("partitionColumns") shouldBe Seq("lang")
    r2.getAs[Int]("numDeletionVectors") shouldBe 1
    // API-level refusal parity with HISTORY
    val e = intercept[IllegalArgumentException] {
      LakeSql.runMaintenance(spark, LakeSql.LakeDetail(dir, "docs"))
    }
    e.getMessage should include("runMaintenanceRows")
  }

  test("INSERT INTO … DEDUPED lands only non-duplicates through the " +
      "statement route, equals the API split, and surfaces refusals") {
    val dir = Files.createTempDirectory("lakesql_dd").toString
    val lake = new Lake(spark, LakeConfig(basePath = dir))
    // long distinct texts: different ids never near-dup by accident
    def textOf(i: Int, salt: String): String =
      (0 until 15).map(j => s"$salt${i}w$j").mkString(" ")
    lake.writeAtomic((1 to 40).map(i => (i.toLong, textOf(i, "a")))
      .toDF("doc_id", "text")
      .repartitionByRange(3, $"doc_id").sortWithinPartitions("doc_id"),
      "docs")
    lake.createDedupIndex("docs", "dix", "text", "doc_id")
    // batch: 3 verbatim copies of old docs + 2 fresh + a twin pair
    val twin = (0 until 15).map(j => s"tw${j}z").mkString(" ")
    ((10 to 12).map(i => ((i + 1000).toLong, textOf(i, "a"))) ++
      Seq((2000L, textOf(1, "f")), (2001L, textOf(2, "f")),
        (3000L, twin), (3001L, twin)))
      .toDF("doc_id", "text").createOrReplaceTempView("dd_batch")
    val m = LakeSql.sql(spark,
      s"INSERT INTO lake.`$dir`.docs DEDUPED BY INDEX dix " +
        "SELECT * FROM dd_batch").collect().head
    m.getString(0) shouldBe "INSERT DEDUPED"
    m.getString(1) shouldBe
      "landed=3 dropped_batch=1 dropped_corpus=3"
    lake.read("docs").filter($"doc_id" >= 1000L)
      .select("doc_id").as[Long].collect().toSet shouldBe
      Set(2000L, 2001L, 3000L)
    // replaying the same statement: every row is now a corpus dup
    val m2 = LakeSql.sql(spark,
      s"INSERT INTO lake.`$dir`.docs DEDUPED " +
        "SELECT doc_id + 10000 AS doc_id, text FROM dd_batch")
      .collect().head
    m2.getString(1) should include("landed=0")
    // unknown index surfaces the API's loud refusal
    val e = intercept[Exception] {
      LakeSql.sql(spark, s"INSERT INTO lake.`$dir`.docs DEDUPED " +
        "BY INDEX nope SELECT * FROM dd_batch")
    }
    e.getMessage should include("nope")
    // a PLAIN insert (no DEDUPED) is not claimed by the recognizer
    LakeSql.parseMaintenance(
      s"INSERT INTO lake.`$dir`.docs SELECT * FROM dd_batch") shouldBe None
  }
}
