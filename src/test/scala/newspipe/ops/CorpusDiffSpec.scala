package newspipe.ops

import newspipe.SparkTestBase

/** Extension: corpus snapshot diff (incremental dataset versioning). */
class CorpusDiffSpec extends SparkTestBase {
  import spark.implicits._

  private def oldV = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta")
  ).toDF("id", "text")
  // 1 unchanged, 2 edited, 3 removed, 5 added
  private def newV = Seq(
    (1L, "alpha"), (2L, "beta v2"), (4L, "delta"), (5L, "epsilon")
  ).toDF("id", "text")

  test("diff classifies added/removed/changed/unchanged") {
    val d = CorpusDiff.diff(oldV, newV, "id", Seq("text"))
      .select("id", "status").as[(Long, String)].collect().toMap
    d shouldBe Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added")
  }

  test("digests are null exactly on the missing side") {
    val d = CorpusDiff.diff(oldV, newV, "id", Seq("text"))
      .as[(Long, String, Option[String], Option[String])].collect()
      .map(r => r._1 -> (r._3.isDefined, r._4.isDefined)).toMap
    d(3L) shouldBe ((true, false)) // removed: old only
    d(5L) shouldBe ((false, true)) // added: new only
    d(1L) shouldBe ((true, true))
  }

  test("null ids are excluded; null text diffs stably") {
    val o = Seq((Option(1L), Option("x")), (Option.empty[Long], Option("y")),
      (Option(2L), Option.empty[String])).toDF("id", "text")
    val n = Seq((Option(1L), Option("x")), (Option(2L), Option.empty[String]))
      .toDF("id", "text")
    val d = CorpusDiff.diff(o, n, "id", Seq("text"))
      .select("id", "status").as[(Long, String)].collect().toMap
    d shouldBe Map(1L -> "unchanged", 2L -> "unchanged")
  }

  test("multi-column content: any column change flips the digest") {
    val o = Seq((1L, "t", "en")).toDF("id", "text", "lang")
    val n = Seq((1L, "t", "de")).toDF("id", "text", "lang")
    CorpusDiff.diff(o, n, "id", Seq("text", "lang"))
      .select("status").as[String].collect() shouldBe Array("changed")
  }

  test("changedRows returns exactly the added+changed slice of the new version") {
    val rows = CorpusDiff.changedRows(oldV, newV, "id", Seq("text"))
      .select("id").as[Long].collect().sorted
    rows shouldBe Array(2L, 5L)
  }

  test("duplicate ids within a version collapse to the min digest (deterministic)") {
    val o = Seq((1L, "b"), (1L, "a")).toDF("id", "text")
    val n = Seq((1L, "a"), (1L, "b")).toDF("id", "text")
    CorpusDiff.diff(o, n, "id", Seq("text"))
      .select("status").as[String].collect() shouldBe Array("unchanged")
  }
}
