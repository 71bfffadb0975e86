package newspipe.functions

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** Float-equality table for the TextBlob-parity sentiment mode: every
  * expectation below is the pattern-library arithmetic computed BY HAND from
  * the fixture lexicon (per-sense averaging, modifier-chain clamp, inverse
  * intensity under negation, -0.5 negation damp, unweighted mean). The port
  * must reproduce these exact doubles — not just the labels. Expected values
  * are written as the same-associativity expressions so the comparison is
  * bit-exact, not approximate.
  */
class PatternSentimentSpec extends SparkTestBase {
  import PatternSentiment._

  // Fixture lexicon in the public en-sentiment.xml format. "good" has TWO
  // JJ senses (0.8, 0.6) plus one NN sense (0.5), pinning both averaging
  // levels of the loader: untagged p = mean(mean(0.8, 0.6), 0.5).
  private val lex = Lexicon.fromXmlString(
    """<sentiment language="en">
      |  <word form="good"   pos="JJ" polarity="0.8"  subjectivity="0.6" intensity="1.0" />
      |  <word form="good"   pos="JJ" polarity="0.6"  subjectivity="0.4" intensity="1.0" />
      |  <word form="good"   pos="NN" polarity="0.5"  subjectivity="0.5" intensity="1.0" />
      |  <word form="bad"    pos="JJ" polarity="-0.7" subjectivity="0.7" intensity="1.0" />
      |  <word form="great"  pos="JJ" polarity="0.8"  subjectivity="0.75" intensity="1.0" />
      |  <word form="really" pos="RB" polarity="0.2"  subjectivity="0.2" intensity="1.3" />
      |  <word form="very"   pos="RB" polarity="0.2"  subjectivity="0.3" intensity="1.3" />
      |</sentiment>""".stripMargin)

  // sense-averaged then POS-averaged "good", same op order as the loader
  private val pGood = ((0.8 + 0.6) / 2 + 0.5) / 2
  private val sGood = ((0.6 + 0.4) / 2 + 0.5) / 2

  private def pol(s: String): Double = polaritySubjectivity(s, lex)._1

  test("loader: sense averaging per POS, then across POS") {
    assert(lex.words("good").p === pGood)
    assert(lex.words("good").s === sGood)
    assert(lex.words("good").i === 1.0)
    assert(lex.words("really") === Psi(0.2, 0.2, 1.3))
    assert(lex.modifiers === Set("really", "very"))
    assert(!lex.modifiers("good"))
  }

  test("single word: lexicon polarity verbatim") {
    assert(pol("good") === pGood)
    assert(pol("Bad") === -0.7)
    assert(pol("unknown words only") === 0.0)
  }

  test("unweighted mean over assessments") {
    assert(pol("good but bad") === (pGood + -0.7) / 2)
    assert(pol("good good bad") === (pGood + pGood + -0.7) / 3)
  }

  test("modifier chain: 'really good' merges into one clamped assessment") {
    // "really" appends (p=0.2, i=1.3); "good" merges: p = clamp(pGood * 1.3)
    assert(pol("really good") === pGood * 1.3)
    // clamp at +1: really great = 0.8 * 1.3 = 1.04 → 1.0
    assert(pol("really great") === 1.0)
    // modifier chain carries the NEW word's intensity: "very really good"
    // → "very"(0.2, i=1.3); "really" merges p=clamp(0.2*1.3), i:=1.3;
    // "good" merges p=clamp(pGood*1.3). Still ONE assessment.
    assert(pol("very really good") === pGood * 1.3)
  }

  test("negation: -0.5 damp, inverse intensity under a modifier") {
    assert(pol("not good") === pGood * -0.5)
    assert(pol("n't good") === pGood * -0.5)
    // "not really good" = -(pGood / 1.3) * 0.5 — the famous TextBlob shape
    assert(pol("not really good") === (pGood * (1.0 / 1.3)) * -0.5)
    // contraction tokenizer: "isn't good" → "is n't good"
    assert(pol("isn't good") === pGood * -0.5)
    // negation survives a 1-letter token: "not a good ..." still negates
    assert(pol("not a good sign") === pGood * -0.5)
    // ...but dies across a longer unknown word
    assert(pol("not the good sign") === pGood)
  }

  test("'really not good': negation attaches to the modifier's assessment") {
    // "really" appends (p=0.2, i=1.3); the unknown-branch sees n="not" with
    // m="really" → marks THAT assessment negated and resets m, so "good"
    // starts a FRESH assessment (the documented pattern-library behavior —
    // "really not good" scores mildly positive with a positive lexicon).
    assert(pol("really not good") === (0.2 * -0.5 + pGood) / 2)
  }

  test("punctuation peeling and emoticons") {
    assert(pol("good!") === pGood)
    assert(pol("good, bad.") === (pGood + -0.7) / 2)
    assert(pol("happy :)") === 0.5) // ":)" smile family; "happy" not in fixture
    assert(pol("bad :(") === (-0.7 + -0.75) / 2)
  }

  test("score(): null row semantics and sign → label parity") {
    assert(PatternSentiment.score(null) === newspipe.model.Sentiment(None, None))
    assert(PatternSentiment.score("good").label === Some("positive"))
    assert(PatternSentiment.score("zzz").label === Some("neutral"))
  }

  test("bundled lexicon resource loads and flags intensifier adverbs") {
    val b = Lexicon.bundled
    assert(b.words("good").p === 0.7)
    assert(b.modifiers("very") && b.modifiers("really"))
    assert(b.words("very").i === 1.3)
    // the whole parity pipeline over the bundled resource
    assert(polaritySubjectivity("not really good")._1 === (0.7 * (1.0 / 1.3)) * -0.5)
  }

  test("column mode: expression equals scalar, default mode untouched") {
    import spark.implicits._
    val df = Seq("really good news", "not good at all", null.asInstanceOf[String])
      .toDF("text")
    val got = df.select(SentimentAnalyzer.sentiment(col("text"), textblobParity = true).as("s"))
      .select("s.polarity", "s.label").collect()
    val want = Seq("really good news", "not good at all", null)
      .map(PatternSentiment.score)
    got.zip(want).foreach { case (row, exp) =>
      assert(Option(row.get(0)).map(_.asInstanceOf[Float]) === exp.polarity)
      assert(Option(row.getString(1)) === exp.label)
    }
    // flag off → legacy scorer (different lexicon arithmetic, same surface)
    val def1 = df.select(SentimentAnalyzer.sentiment(col("text")).as("s"))
      .select("s.polarity").collect()
    val defWant = Seq("really good news", "not good at all", null).map(SentimentAnalyzer.score)
    def1.zip(defWant).foreach { case (row, exp) =>
      assert(Option(row.get(0)).map(_.asInstanceOf[Float]) === exp.polarity)
    }
  }
}
