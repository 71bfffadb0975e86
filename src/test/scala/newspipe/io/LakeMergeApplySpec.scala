package newspipe.io

import java.nio.file.Files

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** Generalized MERGE ([[Lake.mergeApply]] + the full-clause SQL surface):
  * conditional MATCHED actions, MATCHED DELETE, explicit assignment
  * lists, NOT MATCHED BY SOURCE UPDATE/DELETE, first-match-wins clause
  * precedence, file-pruning shape, row-id attribution, and
  * [[Lake.syncFrom]] snapshot reconciliation.
  */
class LakeMergeApplySpec extends SparkTestBase {
  import spark.implicits._

  private def freshLake(): (String, Lake) = {
    val dir = Files.createTempDirectory("lakemrg").toString
    (dir, new Lake(spark, LakeConfig(basePath = dir)))
  }

  test("composite-key pruning: a selective CDC batch rewrites only the " +
      "files its exact key SETS reach — not every file between the " +
      "per-column bounds") {
    val (_, lake) = freshLake()
    // 10 range files on g; a batch touching g∈{0,9} has per-column
    // bounds [0,9] × [id-range] = EVERY file; the exact IN-set
    // conjunction reaches only the two extreme files
    val target = (0 until 10).flatMap(g =>
      (0 until 50).map(i => (g.toLong, (g * 100 + i).toLong, "old")))
      .toDF("g", "id", "v")
      .repartitionByRange(10, $"g").sortWithinPartitions("g", "id")
    lake.writeAtomic(target, "t")
    val src = Seq((0L, 3L, "NEW"), (9L, 947L, "NEW")).toDF("g", "id", "v")
    val r = lake.mergeInto("t", src, Seq("g", "id"))
    r.rewrittenFiles should be <= 2
    r.carriedFiles should be >= 8
    lake.read("t").filter($"v" === "NEW").count() shouldBe 2L
    lake.read("t").count() shouldBe 500L
    // an all-null key column proves NOTHING matches: zero rewrites, the
    // insert leg still lands (nulls never equi-match)
    val nullSrc = Seq((java.lang.Long.valueOf(5L), null.asInstanceOf[java.lang.Long],
      "null-key")).toDF("g", "id", "v")
    val r2 = lake.mergeInto("t", nullSrc, Seq("g", "id"))
    r2.rewrittenFiles shouldBe 0
    lake.read("t").count() shouldBe 501L
    // mergeApply with composite keys prunes the same way
    val r3 = lake.mergeApply("t",
      Seq((0L, 7L, "APPLIED")).toDF("g", "id", "v"), Seq("g", "id"),
      matched = Seq(Lake.MergeClause(None, Lake.MergeUpdateStar)))
    r3.rewrittenFiles should be <= 2
    lake.read("t").filter($"v" === "APPLIED").count() shouldBe 1L
  }

  test("CDC apply: conditional matched delete + update, conditional " +
      "insert, by-source delete — one commit") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq(
      (1L, "keep", 10L), (2L, "upd", 20L), (3L, "del", 30L),
      (4L, "stale", 5L), (5L, "fresh", 100L)).toDF("id", "tag", "v"),
      "t")
    val src = Seq((2L, "updated", 200L), (3L, "whatever", 0L),
      (9L, "new", 90L), (10L, "small", 1L)).toDF("id", "tag", "v")
    val r = lake.mergeApply("t", src, Seq("id"),
      matched = Seq(
        Lake.MergeClause(Some(Lake.srcCol("v") === 0L), Lake.MergeDelete),
        Lake.MergeClause(None, Lake.MergeUpdateStar)),
      notMatched = Seq(
        // insert clauses evaluate against the SOURCE frame — plain names
        Lake.MergeClause(Some(col("v") > 50L), Lake.MergeInsertStar)),
      notMatchedBySource = Seq(
        Lake.MergeClause(Some(col("v") < 10L), Lake.MergeDelete)))
    r.noop shouldBe false
    // id=1 carried (matched by nothing, v>=10); id=2 updated; id=3
    // deleted (matched, s.v=0); id=4 deleted (unmatched, t.v<10);
    // id=5 carried; id=9 inserted (s.v>50); id=10 NOT inserted (s.v<=50)
    lake.read("t").orderBy("id").as[(Long, String, Long)].collect() shouldBe
      Array((1L, "keep", 10L), (2L, "updated", 200L), (5L, "fresh", 100L),
        (9L, "new", 90L))
    lake.historyRows("t").last.getString(2) shouldBe "MERGE"
  }

  test("explicit assignment lists: matched UPDATE SET references both " +
      "sides, by-source UPDATE flags target-only") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((1L, 10L, "live"), (2L, 20L, "live"),
      (3L, 30L, "live")).toDF("id", "v", "status"), "t")
    val src = Seq((1L, 5L)).toDF("id", "delta")
    lake.mergeApply("t", src, Seq("id"),
      matched = Seq(Lake.MergeClause(None,
        Lake.MergeUpdate(Map("v" -> (col("v") + Lake.srcCol("delta")))))),
      notMatchedBySource = Seq(Lake.MergeClause(Some(col("v") >= 30L),
        Lake.MergeUpdate(Map("status" -> lit("stale"))))))
    lake.read("t").orderBy("id").as[(Long, Long, String)]
      .collect() shouldBe Array((1L, 15L, "live"), (2L, 20L, "live"),
        (3L, 30L, "stale"))
  }

  test("first-match-wins precedence within a clause group") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((1L, 100L)).toDF("id", "v"), "t")
    val src = Seq((1L, 100L)).toDF("id", "v")
    // both conditions true — the FIRST clause must win
    lake.mergeApply("t", src, Seq("id"),
      matched = Seq(
        Lake.MergeClause(Some(Lake.srcCol("v") === 100L),
          Lake.MergeUpdate(Map("v" -> lit(1L)))),
        Lake.MergeClause(None, Lake.MergeDelete)))
    lake.read("t").as[(Long, Long)].collect() shouldBe Array((1L, 1L))
  }

  test("insert-only clause set: zero rewrites, append-only commit; " +
      "unlisted INSERT columns get NULL") {
    val (_, lake) = freshLake()
    lake.writeAtomic((1L to 20L).map(i => (i, s"d$i", i * 10))
      .toDF("id", "text", "v"), "t")
    val before = lake.historyRows("t").length
    val src = Seq((21L, 210L), (5L, 999L)).toDF("id", "v")
    val r = lake.mergeApply("t", src, Seq("id"),
      notMatched = Seq(Lake.MergeClause(None,
        Lake.MergeInsert(Map("id" -> col("id"), "v" -> col("v"))))))
    r.rewrittenFiles shouldBe 0
    // matched id=5 untouched (no matched clause); id=21 inserted, text NULL
    lake.read("t").count() shouldBe 21L
    lake.read("t").filter($"id" === 5L).select("v").as[Long]
      .head() shouldBe 50L
    val ins = lake.read("t").filter($"id" === 21L)
      .select("text", "v").collect().head
    ins.isNullAt(0) shouldBe true
    ins.getLong(1) shouldBe 210L
    lake.historyRows("t").length shouldBe before + 1
  }

  test("no by-source clause: only key-can-match files rewrite (carried " +
      "by reference)") {
    val (_, lake) = freshLake()
    lake.writeAtomic((1L to 100L).map(i => (i, i * 10))
      .toDF("id", "v").repartitionByRange(4, $"id")
      .sortWithinPartitions("id"), "t")
    val src = Seq((5L, -1L)).toDF("id", "v")
    val r = lake.mergeApply("t", src, Seq("id"),
      matched = Seq(Lake.MergeClause(None, Lake.MergeUpdateStar)))
    r.rewrittenFiles shouldBe 1
    r.carriedFiles shouldBe 3
    lake.read("t").filter($"id" === 5L).select("v").as[Long]
      .head() shouldBe -1L
  }

  test("row tracking: in-place updates KEEP row ids (update_pre/post " +
      "attribution), inserts get fresh ids, deletes retire them") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "text"), "t")
    lake.enableRowTracking("t")
    val idsBefore = lake.readWithRowIds("t").select("id", "_row_id")
      .as[(Long, Long)].collect().toMap
    val v0 = lake.listVersions("t").head
    val src = Seq((2L, "B"), (9L, "i")).toDF("id", "text")
    lake.mergeApply("t", src, Seq("id"),
      matched = Seq(Lake.MergeClause(None, Lake.MergeUpdateStar)),
      notMatched = Seq(Lake.MergeClause(None, Lake.MergeInsertStar)),
      notMatchedBySource = Seq(Lake.MergeClause(Some(col("id") === 3L),
        Lake.MergeDelete)))
    val after = lake.readWithRowIds("t").select("id", "_row_id")
      .as[(Long, Long)].collect().toMap
    after(1L) shouldBe idsBefore(1L)
    after(2L) shouldBe idsBefore(2L) // updated IN PLACE — id kept
    after.contains(3L) shouldBe false
    assert(!idsBefore.values.toSet.contains(after(9L))) // fresh id
    // tracked change feed sees the update as a pre/post PAIR on one id
    val v1 = lake.listVersions("t").head
    val feed = lake.changeFeedTracked("t", v0, v1)
      .select("id", "_change_type").as[(Long, String)].collect().toSet
    feed should contain ((2L, "update_preimage"))
    feed should contain ((2L, "update_postimage"))
    feed should contain ((3L, "delete"))
    feed should contain ((9L, "insert"))
  }

  test("hive-partitioned target: the full matrix lands inside the " +
      "layout; untouched partitions' files carry") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "de", 30L), (4L, "de", 5L))
      .toDF("id", "lang", "v"), "t", partitionBy = Seq("lang"))
    val src = Seq((2L, "en", 200L), (9L, "fr", 90L)).toDF("id", "lang", "v")
    lake.mergeApply("t", src, Seq("id"),
      matched = Seq(Lake.MergeClause(None, Lake.MergeUpdateStar)),
      notMatched = Seq(Lake.MergeClause(None, Lake.MergeInsertStar)),
      notMatchedBySource = Seq(Lake.MergeClause(Some(col("v") < 10L),
        Lake.MergeDelete)))
    lake.read("t").select("id", "lang", "v").orderBy("id")
      .as[(Long, String, Long)]
      .collect() shouldBe Array((1L, "en", 10L), (2L, "en", 200L),
        (3L, "de", 30L), (9L, "fr", 90L))
    // the inserted row landed under its own lang= directory and the
    // partition column still prunes
    lake.read("t").filter($"lang" === "fr").count() shouldBe 1L
    lake.readWhere("t", $"lang" === "de").select("id", "lang", "v")
      .as[(Long, String, Long)]
      .collect() shouldBe Array((3L, "de", 30L))
  }

  test("syncFrom: layer converges to exactly the source snapshot") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "text"), "dim")
    val snapshot = Seq((2L, "B"), (3L, "c"), (4L, "d")).toDF("id", "text")
    lake.syncFrom("dim", snapshot, Seq("id"))
    lake.read("dim").orderBy("id").as[(Long, String)].collect() shouldBe
      Array((2L, "B"), (3L, "c"), (4L, "d"))
    // idempotent: a second sync with the same snapshot is zero-change
    lake.syncFrom("dim", snapshot, Seq("id"))
    lake.read("dim").orderBy("id").as[(Long, String)].collect() shouldBe
      Array((2L, "B"), (3L, "c"), (4L, "d"))
  }

  test("empty source + by-source delete = full truncate-unmatched; " +
      "empty source with no by-source = noop") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "t")
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    lake.mergeApply("t", empty, Seq("id"),
      matched = Seq(Lake.MergeClause(None, Lake.MergeUpdateStar)),
      notMatched = Seq(Lake.MergeClause(None, Lake.MergeInsertStar)))
      .noop shouldBe true
    lake.syncFrom("t", empty, Seq("id"))
    lake.read("t").count() shouldBe 0L
  }

  test("refusals: dup-key source with rewrite clauses, star with missing " +
      "source columns, non-last unconditioned clause, reserved prefix") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "t")
    intercept[IllegalArgumentException] {
      lake.mergeApply("t", Seq((1L, "x"), (1L, "y")).toDF("id", "text"),
        Seq("id"),
        matched = Seq(Lake.MergeClause(None, Lake.MergeUpdateStar)))
    }.getMessage should include("distinct keys")
    intercept[IllegalArgumentException] {
      lake.mergeApply("t", Seq(1L).toDF("id"), Seq("id"),
        matched = Seq(Lake.MergeClause(None, Lake.MergeUpdateStar)))
    }.getMessage should include("star")
    intercept[IllegalArgumentException] {
      lake.mergeApply("t", Seq((2L, "x")).toDF("id", "text"), Seq("id"),
        matched = Seq(
          Lake.MergeClause(None, Lake.MergeDelete),
          Lake.MergeClause(None, Lake.MergeUpdateStar)))
    }.getMessage should include("condition")
    intercept[IllegalArgumentException] {
      lake.mergeApply("t", Seq((2L, "x")).toDF("id", "__src_text"),
        Seq("id"),
        matched = Seq(Lake.MergeClause(None, Lake.MergeDelete)))
    }.getMessage should include("__src_")
  }

  test("SQL surface: full clause matrix with aliases, qualified refs, " +
      "INSERT (cols) VALUES, BY SOURCE") {
    val (dir, lake) = freshLake()
    lake.writeAtomic(Seq(
      (1L, "keep", 10L), (2L, "upd", 20L), (3L, "del", 30L),
      (4L, "stale", 5L)).toDF("id", "tag", "v"), "docs")
    Seq((2L, "updated", 200L), (3L, "x", 0L), (9L, "new", 90L))
      .toDF("id", "tag", "v").createOrReplaceTempView("mrgfull_src")
    val m = LakeSql.sql(spark,
      s"""MERGE INTO lake.`$dir`.docs AS t USING mrgfull_src AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.v = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET t.v = t.v + s.v, tag = s.tag
         |WHEN NOT MATCHED AND s.v > 50 THEN INSERT (id, tag, v)
         |  VALUES (s.id, s.tag, s.v)
         |WHEN NOT MATCHED BY SOURCE AND t.v < 10 THEN DELETE""".stripMargin)
      .collect().head
    m.getString(0) shouldBe "MERGE"
    lake.read("docs").orderBy("id").as[(Long, String, Long)]
      .collect() shouldBe Array((1L, "keep", 10L),
        (2L, "updated", 220L), (9L, "new", 90L))
  }

  test("SQL surface: BY SOURCE UPDATE; refusals for source refs in " +
      "BY SOURCE and target refs in INSERT") {
    val (dir, lake) = freshLake()
    lake.writeAtomic(Seq((1L, 10L, "live"), (2L, 20L, "live"))
      .toDF("id", "v", "status"), "docs")
    Seq((1L, 1L)).toDF("id", "delta")
      .createOrReplaceTempView("mrgfull_src2")
    LakeSql.sql(spark,
      s"""MERGE INTO lake.`$dir`.docs AS t USING mrgfull_src2 AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = t.v + s.delta
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'stale'
         |""".stripMargin).collect()
    lake.read("docs").orderBy("id").as[(Long, Long, String)]
      .collect() shouldBe Array((1L, 11L, "live"), (2L, 20L, "stale"))
    val e1 = intercept[Exception] {
      LakeSql.sql(spark,
        s"""MERGE INTO lake.`$dir`.docs AS t USING mrgfull_src2 AS s
           |ON t.id = s.id
           |WHEN NOT MATCHED BY SOURCE AND s.delta > 0 THEN DELETE
           |""".stripMargin).collect()
    }
    e1.getMessage should include("BY SOURCE")
    val e2 = intercept[Exception] {
      LakeSql.sql(spark,
        s"""MERGE INTO lake.`$dir`.docs AS t USING mrgfull_src2 AS s
           |ON t.id = s.id
           |WHEN NOT MATCHED THEN INSERT (id, v, status)
           |  VALUES (s.id, t.v, 'x')
           |""".stripMargin).collect()
    }
    e2.getMessage should include("INSERT value")
  }

  test("SQL surface: star/star fast path still routes to mergeInto " +
      "(schema evolution reserved to it)") {
    val (dir, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "docs")
    Seq((1L, "A", 7L)).toDF("id", "text", "extra")
      .createOrReplaceTempView("mrgfull_src3")
    val e = intercept[Exception] {
      LakeSql.sql(spark,
        s"""MERGE WITH SCHEMA EVOLUTION INTO lake.`$dir`.docs AS t
           |USING mrgfull_src3 AS s ON t.id = s.id
           |WHEN MATCHED AND s.extra > 0 THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    }
    e.getMessage should include("SCHEMA EVOLUTION")
  }

  test("a source column literally named 'present' is real data, not the " +
      "match flag — UPDATE SET * writes it through") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "old", "keep"), (2L, "old", "keep"))
      .toDF("id", "present", "text"), "docs")
    val src = Seq((1L, "fresh", "upd")).toDF("id", "present", "text")
    lake.mergeApply("docs", src, Seq("id"),
      matched = Seq(Lake.MergeClause(None, Lake.MergeUpdateStar)))
    lake.read("docs").orderBy("id").select("present").as[String]
      .collect() shouldBe Array("fresh", "old")
  }

  test("source columns in the __merge_ bookkeeping namespace are refused") {
    val (_, lake) = freshLake()
    lake.writeAtomic(Seq((1L, "a")).toDF("id", "text"), "docs")
    val src = Seq((1L, "b", true)).toDF("id", "text", "__merge_present")
    intercept[IllegalArgumentException] {
      lake.mergeApply("docs", src, Seq("id"),
        matched = Seq(Lake.MergeClause(None, Lake.MergeUpdateStar)))
    }.getMessage should include("__merge_")
  }
}
