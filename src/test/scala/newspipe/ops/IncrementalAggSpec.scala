package newspipe.ops

import newspipe.SparkTestBase
import newspipe.io.{Lake, LakeConfig}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental view maintenance over the lake change feed: the
  * incremental path must land on EXACTLY the state a full recompute
  * produces, through arbitrary delete/update/merge chains.
  */
class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private def lakeIn(dir: String) = new Lake(spark, LakeConfig(dir))

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "__n", "sum_x").as[(String, Long, Long)].collect()
      .sortBy(_._1)

  test("applyDelta(diff) == full recompute across a delete + merge chain") {
    val dir = Files.createTempDirectory("incagg").toString
    val lake = lakeIn(dir)
    val base = (1 to 200).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c",
        i.toLong * 10))
      .toDF("id", "k", "x")
    lake.writeAtomic(base.repartitionByRange(4, $"id")
      .sortWithinPartitions("id"), "corpus")
    val v1 = lake.listVersions("corpus").head
    var gold = IncrementalAgg.compute(lake.read("corpus"), Seq("k"), Seq("x"))
      .localCheckpoint(true)

    // op 1: delete a slice
    lake.deleteWhere("corpus", $"id" <= 40)
    val v2 = lake.listVersions("corpus").head
    val (ins1, del1) = lake.diff("corpus", v1, v2)
    gold = IncrementalAgg.applyDelta(gold,
      ins1.withColumn("_change_type", lit("insert"))
        .unionByName(del1.withColumn("_change_type", lit("delete"))),
      Seq("k"), Seq("x")).localCheckpoint(true)
    sortedRows(gold) shouldBe
      sortedRows(IncrementalAgg.compute(lake.read("corpus"), Seq("k"), Seq("x")))

    // op 2: merge (update values of one key range + insert fresh ids)
    lake.mergeInto("corpus",
      (150 to 160).map(i => (i.toLong, "a", 7L)).toDF("id", "k", "x")
        .union((1000 to 1005).map(i => (i.toLong, "z", 1L)).toDF("id", "k", "x")),
      Seq("id"))
    val v3 = lake.listVersions("corpus").head
    val (ins2, del2) = lake.diff("corpus", v2, v3)
    gold = IncrementalAgg.applyDelta(gold,
      ins2.withColumn("_change_type", lit("insert"))
        .unionByName(del2.withColumn("_change_type", lit("delete"))),
      Seq("k"), Seq("x")).localCheckpoint(true)
    sortedRows(gold) shouldBe
      sortedRows(IncrementalAgg.compute(lake.read("corpus"), Seq("k"), Seq("x")))
    // the new key materialized, with the right sum
    sortedRows(gold).find(_._1 == "z") shouldBe Some(("z", 6L, 6L))
  }

  test("a group deleted to zero disappears from the maintained state") {
    val cur = Seq(("a", 2L, 30L), ("b", 1L, 5L)).toDF("k", "__n", "sum_x")
    val delta = Seq(("a", 10L, "delete"), ("a", 20L, "delete"))
      .toDF("k", "x", "_change_type")
    val next = IncrementalAgg.applyDelta(cur, delta, Seq("k"), Seq("x"))
    next.select("k").as[String].collect() shouldBe Array("b")
  }

  test("update pre/post-image tags maintain exactly like their delete+insert pair") {
    val cur = Seq(("a", 2L, 30L)).toDF("k", "__n", "sum_x")
    val updates = Seq(("a", 10L, "update_preimage"),
      ("a", 17L, "update_postimage")).toDF("k", "x", "_change_type")
    val viaUpdates = IncrementalAgg.applyDelta(cur, updates, Seq("k"), Seq("x"))
    viaUpdates.as[(String, Long, Long)].collect() shouldBe Array(("a", 2L, 37L))
    // parity: the same change expressed as delete+insert lands identically
    val viaPairs = IncrementalAgg.applyDelta(cur,
      Seq(("a", 10L, "delete"), ("a", 17L, "insert"))
        .toDF("k", "x", "_change_type"), Seq("k"), Seq("x"))
    viaPairs.as[(String, Long, Long)].collect() shouldBe Array(("a", 2L, 37L))
  }

  test("an unknown change tag fails the refresh loudly instead of silently skewing") {
    val cur = Seq(("a", 1L, 1L)).toDF("k", "__n", "sum_x")
    val delta = Seq(("a", 2L, "upsert")).toDF("k", "x", "_change_type")
    // raise_error: the FIRST unknown tag aborts the job naming the value —
    // sum() would otherwise skip the null sign and the state would drift
    // (a mixed group miscounts; an all-unknown group reads as "no change")
    val ex = intercept[Exception] {
      IncrementalAgg.applyDelta(cur, delta, Seq("k"), Seq("x")).collect()
    }
    ex.getMessage should include("upsert")
    // and a delta missing the tag column entirely is refused at build time
    an[IllegalArgumentException] should be thrownBy
      IncrementalAgg.applyDelta(cur, delta.drop("_change_type"),
        Seq("k"), Seq("x"))
  }

  test("streaming end-to-end: CDF source + foreachBatch maintenance tracks the layer") {
    val dir = Files.createTempDirectory("incaggstream").toString
    val lake = lakeIn(dir)
    lake.writeAtomic((1 to 90).map(i =>
      (i.toLong, if (i % 2 == 0) "even" else "odd", i.toLong))
      .toDF("id", "k", "x").repartitionByRange(3, $"id")
      .sortWithinPartitions("id"), "corpus")
    // maintained state lives in its own lake layer, bootstrapped empty:
    // the CDF's initial batch replays the starting snapshot as inserts
    val goldLake = lakeIn(Files.createTempDirectory("incagg_gold").toString)
    goldLake.writeAtomic(
      IncrementalAgg.compute(lake.read("corpus").limit(0), Seq("k"), Seq("x")),
      "gold")
    val q = spark.readStream
      .format("newspipe.io.source.LakeChangeSource")
      .option("basePath", dir).option("layer", "corpus")
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/_ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val next = IncrementalAgg.applyDelta(
          goldLake.read("gold"), batch, Seq("k"), Seq("x"))
        goldLake.writeAtomic(next, "gold"); ()
      }
      .start()
    try {
      q.processAllAvailable()
      lake.deleteWhere("corpus", $"id" % 10 === 0)
      q.processAllAvailable()
      lake.mergeInto("corpus",
        Seq((7L, "odd", 700L), (91L, "new", 1L)).toDF("id", "k", "x"),
        Seq("id"))
      q.processAllAvailable()
    } finally q.stop()
    sortedRows(goldLake.read("gold")) shouldBe
      sortedRows(IncrementalAgg.compute(lake.read("corpus"), Seq("k"), Seq("x")))
  }


  test("incremental distinct: folding an insert-only delta equals recomputing the sketches") {
    import spark.implicits._
    val base = (1 to 200).map(i => (i % 5, i.toLong)).toDF("grp", "v")
    val state0 = IncrementalAgg.computeDistinct(base, Seq("grp"), "v")
    val delta = (201 to 260).map(i => (i % 7, i.toLong, "insert"))
      .toDF("grp", "v", "_change_type")
    val state1 = IncrementalAgg.applyDeltaDistinct(state0, delta, Seq("grp"), "v")
    val full = base.unionByName(delta.drop("_change_type"))
    val expected = IncrementalAgg.distinctEstimates(
      IncrementalAgg.computeDistinct(full, Seq("grp"), "v"), Seq("grp"))
      .as[(Int, Long, Long)].collect().toSet
    IncrementalAgg.distinctEstimates(state1, Seq("grp"))
      .as[(Int, Long, Long)].collect().toSet shouldBe expected
    // new groups (grp 5, 6) appeared
    expected.map(_._1) should contain allOf (5, 6)
  }

  test("incremental distinct: delete and update tags are refused loudly") {
    import spark.implicits._
    val base = (1 to 50).map(i => (1, i.toLong)).toDF("grp", "v")
    val state = IncrementalAgg.computeDistinct(base, Seq("grp"), "v")
    for (tag <- Seq("delete", "update_preimage", "update_postimage")) {
      val bad = Seq((1, 7L, tag)).toDF("grp", "v", "_change_type")
      val e = intercept[Exception] {
        IncrementalAgg.applyDeltaDistinct(state, bad, Seq("grp"), "v").collect()
      }
      e.getMessage should include ("not sketch-maintainable")
    }
  }
}
