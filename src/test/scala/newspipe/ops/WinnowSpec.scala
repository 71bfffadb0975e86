package newspipe.ops

import newspipe.SparkTestBase

/** Extension: winnowing fingerprints (MOSS) — the locality-guaranteed
  * near-dup family.
  */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  // docs 1 and 2 share a 12-token verbatim run (>> w+k-1 = 7), doc 3 is
  // unrelated, doc 4 is an exact copy of doc 1
  private val sharedRun =
    "the licensed text block appears verbatim in both documents here"
  private def docs = Seq(
    (1L, s"alpha beta gamma $sharedRun delta epsilon"),
    (2L, s"zeta eta theta iota $sharedRun kappa"),
    (3L, "completely unrelated content about something else entirely new today"),
    (4L, s"alpha beta gamma $sharedRun delta epsilon")
  ).toDF("id", "text")

  test("fingerprints are sorted distinct per doc; null/empty rows excluded") {
    val withNulls = docs.unionByName(Seq(
      (Option.empty[Long], Option("x y z w v u t")),
      (Option(9L), Option.empty[String]),
      (Option(10L), Option("!!! ???"))
    ).toDF("id", "text"))
    val fps = Winnow.fingerprints(withNulls, "id", "text")
      .as[(Long, Long)].collect()
    fps.map(_._1).toSet shouldBe Set(1L, 2L, 3L, 4L)
    fps.groupBy(_._1).foreach { case (_, rows) =>
      val vs = rows.map(_._2).toSeq
      vs shouldBe vs.sorted
      vs.distinct.length shouldBe vs.length
      // 60-bit hashes (md5 hex digits 2-16): always in [0, 2^60)
      vs.foreach { v => v should be >= 0L; v should be < (1L << 60) }
    }
  }

  test("the winnowing guarantee: a shared run >= w+k-1 tokens forces a shared fingerprint") {
    val fps = Winnow.fingerprints(docs, "id", "text")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    (fps(1L) intersect fps(2L)) should not be empty
    // exact copies have IDENTICAL fingerprint sets
    fps(4L) shouldBe fps(1L)
    // unrelated doc shares nothing with doc 3's vocabulary-disjoint text
    (fps(1L) intersect fps(3L)) shouldBe empty
  }

  test("fingerprint density is the expected small fraction of the gram stream") {
    // 2/(w+1) expected density: a 60-gram doc at w=4 selects ~24, never 60
    val text = (1 to 63).map(i => s"tok$i").mkString(" ")
    val one = Seq((1L, text)).toDF("id", "text")
    val n = Winnow.fingerprints(one, "id", "text").count()
    n should be < 40L
    n should be > 5L
  }

  test("short docs (< k tokens) yield exactly one whole-string fingerprint") {
    val short = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("id", "text")
    val fps = Winnow.fingerprints(short, "id", "text")
      .as[(Long, Long)].collect()
    fps.length shouldBe 2
    fps.map(_._2).distinct.length shouldBe 1 // same text, same fingerprint
  }

  test("nearDupPairs finds the planted copy and the long-run pair, not the unrelated doc") {
    val pairs = Winnow.nearDupPairs(docs, "id", "text", minShared = 2L)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    pairs.keySet should contain((1L, 4L)) // exact copy
    pairs.keySet should contain((1L, 2L)) // 12-token shared run
    pairs.keySet should contain((2L, 4L))
    pairs.keys.flatMap { case (a, b) => Seq(a, b) } should not contain 3L
  }

  test("maxBucket drops degenerate fingerprints before pair counting") {
    // 5 docs all sharing one short text: bucket of 5 > maxBucket 4 → no pairs
    val same = (1L to 5L).map(i => (i, "common tiny")).toDF("id", "text")
    Winnow.nearDupPairs(same, "id", "text", minShared = 1L, maxBucket = 4)
      .count() shouldBe 0L
    Winnow.nearDupPairs(same, "id", "text", minShared = 1L, maxBucket = 5)
      .count() shouldBe 10L // C(5,2)
  }
}
