package newspipe.functions

import newspipe.SparkTestBase
import newspipe.model.Sentiment

/** §2.9 X2: label-level parity with the reference's sentiment UDF
  * (sign(polarity) → positive/negative/neutral, _lib:84-95) + null safety.
  */
class SentimentSpec extends SparkTestBase {
  import spark.implicits._

  test("clearly positive text → positive") {
    SentimentAnalyzer.score("An excellent and wonderful result").label shouldBe Some("positive")
  }

  test("clearly negative text → negative") {
    SentimentAnalyzer.score("A terrible, disastrous failure").label shouldBe Some("negative")
  }

  test("no lexicon hit → polarity 0.0 → neutral (TextBlob unmatched semantics)") {
    val s = SentimentAnalyzer.score("The committee convened on Tuesday")
    s.polarity shouldBe Some(0.0f)
    s.label shouldBe Some("neutral")
  }

  test("null → (null, null) (ref _lib:85-86)") {
    SentimentAnalyzer.score(null) shouldBe Sentiment(None, None)
  }

  test("negation flips polarity (TextBlob negation rule)") {
    val pos = SentimentAnalyzer.score("good").polarity.get
    val neg = SentimentAnalyzer.score("not good").polarity.get
    pos should be > 0f
    neg should be < 0f
  }

  test("intensifier boosts magnitude") {
    val base = SentimentAnalyzer.score("good").polarity.get
    val boosted = SentimentAnalyzer.score("very good").polarity.get
    boosted should be > base
  }

  test("polarity is clamped to [-1, 1]") {
    SentimentAnalyzer.score("extremely excellent").polarity.get should be <= 1f
  }

  test("label mapping is exactly sign-based (ref _lib:88-94)") {
    SentimentAnalyzer.label(0.001) shouldBe "positive"
    SentimentAnalyzer.label(-0.001) shouldBe "negative"
    SentimentAnalyzer.label(0.0) shouldBe "neutral"
  }

  test("UDF returns STRUCT<polarity FLOAT, label STRING> (ref 02:21-24 shape)") {
    val df = Seq("great win", null).toDF("t")
      .select(SentimentAnalyzer.sentiment($"t").as("s"))
      .select($"s.polarity", $"s.label")
    val rows = df.collect()
    rows(0).getFloat(0) should be > 0f
    rows(0).getString(1) shouldBe "positive"
    rows(1).isNullAt(0) shouldBe true
    rows(1).isNullAt(1) shouldBe true
  }
}
