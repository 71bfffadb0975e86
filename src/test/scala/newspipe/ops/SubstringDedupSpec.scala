package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** [[SubstringDedup]]: hand-computed span-scrub cases (k=3 for
  * tractability), the canonical-keeps rule, erosion by overlapping
  * duplicated grams, sub-k pass-through, and partitioning invariance.
  */
class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def scrub(rows: Seq[(Long, String)], k: Int = 3) =
    SubstringDedup.scrubDuplicateSpans(rows.toDF("id", "text"), "id", "text", k)
      .select("id", "scrub_text", "n_kept")
      .as[(Long, String, Long)].collect().sortBy(_._1)

  test("cross-doc duplicated span: canonical doc keeps it, the other loses it") {
    val out = scrub(Seq(1L -> "a b c d e", 2L -> "x a b c y"))
    out shouldBe Array(
      (1L, "a b c d e", 5L), // canonical occurrence of "a b c" survives
      (2L, "x y", 2L)) // positions 2..4 covered by the non-canonical one
  }

  test("within-one-doc repeats are NOT duplicated spans (needs >= 2 docs)") {
    val out = scrub(Seq(1L -> "p q r s p q r", 2L -> "z z z"))
    out.head shouldBe ((1L, "p q r s p q r", 7L))
  }

  test("identical docs: the later one scrubs to empty, the first survives") {
    val out = scrub(Seq(5L -> "m n o p", 9L -> "m n o p"))
    out shouldBe Array(
      (5L, "m n o p", 4L),
      (9L, "", 0L))
  }

  test("documents shorter than k pass through untouched") {
    val out = scrub(Seq(1L -> "u v", 2L -> "u v"))
    out shouldBe Array((1L, "u v", 2L), (2L, "u v", 2L))
  }

  test("canonical erosion: overlapping grams canonical elsewhere still remove") {
    // doc 1 owns "a b c" (canonical); doc 2's copy extends into "b c d"
    // shared with doc 3, whose canonical is doc 2 — so doc 3 loses its
    // copy even though doc 3 never matched doc 1 directly
    val out = scrub(Seq(
      1L -> "a b c",
      2L -> "a b c d",
      3L -> "q b c d"))
    // doc 1: canonical of "a b c" → intact
    out(0) shouldBe ((1L, "a b c", 3L))
    // doc 2: non-canonical "a b c"@1 removes 1..3; canonical "b c d"@2
    //        survives only where not covered → position 4 ('d') remains
    out(1) shouldBe ((2L, "d", 1L))
    // doc 3: non-canonical "b c d"@2 removes 2..4 → "q"
    out(2) shouldBe ((3L, "q", 1L))
  }

  test("duplicateSpanStats counts docs and occurrences per duplicated gram") {
    val df = Seq(1L -> "a b c a b c", 2L -> "a b c", 3L -> "x y z")
      .toDF("id", "text")
    val stats = SubstringDedup.duplicateSpanStats(df, "id", "text", k = 3)
      .select("n_docs", "n_occ").as[(Long, Long)].collect()
    // only "a b c" spans two docs: twice in doc 1 (positions 1 and 4), once in doc 2
    stats shouldBe Array((2L, 3L))
  }

  test("result is invariant to input partitioning") {
    val rows = (0L until 40L).map(i =>
      i -> s"w${i % 5} w${(i + 1) % 5} w${(i + 2) % 5} w${i % 7} w${(i + 3) % 5}")
    val a = scrub(rows)
    val b = SubstringDedup.scrubDuplicateSpans(
      rows.toDF("id", "text").repartition(13), "id", "text", 3)
      .select("id", "scrub_text", "n_kept")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    b shouldBe a
  }
}
