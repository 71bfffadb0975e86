package newspipe.functions

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** Unicode normalization kernel: the pre-dedup canonicalization step.
  * Closed-form codepoint cases per form (all non-ASCII inputs written as
  * explicit unicode escapes -- composed vs decomposed sequences are
  * indistinguishable to the eye), identity/null/empty contracts,
  * idempotence, and the SQL registration. Codegen-vs-interpreted parity
  * lives in CodegenParitySpec with the other custom expressions.
  */
class UnicodeNormSpec extends SparkTestBase {
  import spark.implicits._

  private val Composed = "caf\u00e9"    // e-acute precomposed U+00E9
  private val Decomposed = "cafe\u0301" // e + COMBINING ACUTE U+0301

  private def norm(s: String, form: String): String =
    Seq(s).toDF("t")
      .select(UnicodeNormalize($"t", form).as("n")).as[String].head()

  test("NFC composes a decomposed accent: e + U+0301 -> U+00E9") {
    norm(Decomposed, "NFC") shouldBe Composed
  }

  test("NFD decomposes a precomposed accent: U+00E9 -> e + U+0301") {
    norm(Composed, "NFD") shouldBe Decomposed
  }

  test("NFKC folds compatibility forms: fi ligature, fullwidth A, superscript 2") {
    norm("\ufb01\uff21\u00b2", "NFKC") shouldBe "fiA2"
  }

  test("NFKD folds AND decomposes: ligature + precomposed accent") {
    norm("\ufb01\u00e9", "NFKD") shouldBe "fie\u0301"
  }

  test("pure ASCII is the identity under every form (fast path)") {
    for (f <- Seq("NFC", "NFD", "NFKC", "NFKD"))
      norm("plain ascii text 123", f) shouldBe "plain ascii text 123"
  }

  test("null propagates, empty string survives") {
    val out = Seq(Some("x\u0301"), None, Some("")).toDF("t")
      .select(UnicodeNormalize($"t", "NFC").as("n"))
      .collect().map(r => Option(r.getString(0)))
    out.toSeq shouldBe Seq(Some("x\u0301"), None, Some(""))
  }

  test("normalization is idempotent over a mixed corpus") {
    val df = Seq(Decomposed + " bar", "\ufb01n", "ascii",
      "\u212b\u00c5").toDF("t")
    val once = df.select(UnicodeNormalize($"t", "NFKC").as("n"))
    val twice = once.select(UnicodeNormalize($"n", "NFKC").as("n"))
    once.as[String].collect().toSeq shouldBe twice.as[String].collect().toSeq
  }

  test("angstrom sign unifies with A-ring under NFC (the classic dedup miss)") {
    // U+212B ANGSTROM SIGN and U+00C5 A WITH RING render identically but
    // carry distinct exact-dedup digests until normalized
    norm("\u212b", "NFC") shouldBe "\u00c5"
    norm("\u00c5", "NFC") shouldBe "\u00c5"
  }

  test("invalid form is rejected eagerly at construction") {
    an[IllegalArgumentException] should be thrownBy
      UnicodeNormalize(lit("x"), "NFX")
  }

  test("SQL surface: unicode_normalize(text, form) after register()") {
    newspipe.NewspipeExtensions.register(spark)
    Seq(Decomposed).toDF("t").createOrReplaceTempView("un_sql")
    spark.sql("SELECT unicode_normalize(t, 'NFC') AS n FROM un_sql")
      .as[String].head() shouldBe Composed
  }
}
