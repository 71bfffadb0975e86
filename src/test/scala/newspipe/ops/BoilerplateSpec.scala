package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** Extension: corpus-level boilerplate n-gram detection and the per-doc
  * boilerplate fraction built on it.
  */
class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  // "the same footer" appears in 3 docs; each doc also has unique content.
  private def docs = Seq(
    (1L, "alpha beta gamma COMMON FOOTER TEXT HERE"),
    (2L, "delta epsilon zeta common footer text here"),
    (3L, "eta theta iota common footer text here"),
    (4L, "kappa lambda mu nu xi omicron")
  ).toDF("id", "text")

  test("frequentNgrams counts DISTINCT docs and honors minDf") {
    val freq = Boilerplate.frequentNgrams(docs, "id", "text", n = 3, minDf = 3L)
      .as[(String, Long)].collect().toMap
    // the footer contributes 4 distinct 3-grams present in docs 1,2,3
    freq("common footer text") shouldBe 3L
    freq("footer text here") shouldBe 3L
    // nothing doc-unique survives minDf=3
    freq.keys.foreach(g => g should include("footer"))
  }

  test("within-doc repetition does not inflate doc frequency") {
    val rep = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "ham eggs toast jam tea milk")
    ).toDF("id", "text")
    val freq = Boilerplate.frequentNgrams(rep, "id", "text", n = 3, minDf = 1L)
      .as[(String, Long)].collect().toMap
    freq("spam spam spam") shouldBe 1L // 4 occurrences in doc 1, ONE doc
  }

  test("boilerplateFraction: frac = frequent distinct grams / all distinct grams") {
    val out = Boilerplate
      .boilerplateFraction(docs, "id", "text", n = 3, minDf = 3L)
      .orderBy("id")
      .as[(Long, Long, Long, Double)].collect()
    // doc 1: 7 tokens → 5 distinct 3-grams, of which "common footer text",
    // "footer text here" are shared with docs 2,3 (case-folded)
    val (id1, n1, f1, frac1) = out(0)
    id1 shouldBe 1L
    n1 shouldBe 5L
    f1 shouldBe 2L
    frac1 shouldBe 0.4 +- 1e-9
    // doc 4 shares nothing: fraction 0, still present in the output
    val (id4, _, f4, frac4) = out(3)
    id4 shouldBe 4L
    f4 shouldBe 0L
    frac4 shouldBe 0.0
  }

  test("null id / null text / token-free rows are excluded") {
    val withNulls = docs.unionByName(Seq(
      (Option.empty[Long], Option("x y z")),
      (Option(9L), Option.empty[String]),
      (Option(10L), Option("!!! ???"))
    ).toDF("id", "text"))
    val out = Boilerplate
      .boilerplateFraction(withNulls, "id", "text", n = 3, minDf = 3L)
    out.select("id").as[Long].collect().sorted shouldBe Array(1L, 2L, 3L, 4L)
  }

  test("short docs fall back to a whole-text shingle and still participate") {
    val short = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other text"))
      .toDF("id", "text")
    val freq = Boilerplate.frequentNgrams(short, "id", "text", n = 5, minDf = 2L)
      .as[(String, Long)].collect().toMap
    freq shouldBe Map("tiny doc" -> 2L)
  }

  test("frequentNgramsSketch = frequentNgrams exactly (CMS has no false negatives)") {
    val withNulls = docs.unionByName(Seq(
      (Option.empty[Long], Option("common footer text here")),
      (Option(9L), Option.empty[String])
    ).toDF("id", "text"))
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long)].collect().sortBy(_._1).toSeq
    for (minDf <- Seq(1L, 2L, 3L, 4L)) {
      sorted(Boilerplate.frequentNgramsSketch(withNulls, "id", "text", 3, minDf)) shouldBe
        sorted(Boilerplate.frequentNgrams(withNulls, "id", "text", 3, minDf))
    }
  }

  test("frequentNgramsSketch survives a deliberately colliding (tiny) sketch") {
    // eps 0.5 → width 6: heavy collisions guaranteed; the exact recount
    // must still strip every false positive the sketch lets through
    val out = Boilerplate.frequentNgramsSketch(docs, "id", "text", 3, 3L,
      eps = 0.5, confidence = 0.5)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val exact = Boilerplate.frequentNgrams(docs, "id", "text", 3, 3L)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    out shouldBe exact
  }
}
