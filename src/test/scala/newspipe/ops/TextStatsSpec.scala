package newspipe.ops

import newspipe.SparkTestBase

/** §7 extension: text analysis — token counting, quality bands, language ID,
  * fingerprinting.
  */
class TextStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T: org.apache.spark.sql.Encoder](text: String,
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): T =
    Seq(text).toDF("t").select(f($"t").as("v")).as[T].head()

  test("wordCount: whitespace tokens, blank-safe") {
    one[Int]("a  b\tc\nd", TextStats.wordCount) shouldBe 4
    one[Int]("", TextStats.wordCount) shouldBe 0
    one[Int]("   ", TextStats.wordCount) shouldBe 0
  }

  test("bpeishTokenCount: GPT-2-style pre-tokenizer pieces") {
    // "don't" → don + 't ; "2026" → one number run ; "!!" → one punct run
    one[Int]("don't stop 2026 !!", TextStats.bpeishTokenCount) shouldBe 5
  }

  test("punctRatio: punctuation fraction of characters") {
    one[Double]("ab!!", TextStats.punctRatio) shouldBe 0.5 +- 1e-9
    one[Double]("", TextStats.punctRatio) shouldBe 0.0
  }

  test("stopwordRatio: prose scores well above keyword spam") {
    val prose = "the cat sat on the mat and it was happy with this"
    val spam = "buy cheap widgets best widgets cheap buy widgets"
    one[Double](prose, c => TextStats.stopwordRatio(c)) should be > 0.3
    one[Double](spam, c => TextStats.stopwordRatio(c)) shouldBe 0.0
  }

  test("avgWordLen") {
    one[Double]("ab abcd", c => TextStats.avgWordLen(c)) shouldBe 3.0 +- 1e-9
  }

  test("qualityScore: clean prose in band > degenerate text") {
    val prose = ("the quick brown fox jumps over the lazy dog and then it runs " +
      "into the forest with great speed and joy for all of the animals there")
    val junk = "$$$ !!! ### @@@ %%% ^^^ &&& *** ((( )))"
    one[Double](prose, c => TextStats.qualityScore(c)) shouldBe 1.0 +- 1e-9
    one[Double](junk, c => TextStats.qualityScore(c)) should be <= 0.3
  }

  test("langId: function-word argmax on clear samples") {
    val samples = Seq(
      ("the house is in the village and it was good for them", "en"),
      ("el perro y el gato de la casa en los campos", "es"),
      ("le chien et le chat de la maison dans les champs", "fr"),
      ("der Hund und die Katze in den Feldern von dem Haus", "de"),
      ("o cachorro e o gato da casa para um campo", "pt"),
      ("il cane e il gatto della casa per un campo", "it"))
    val out = samples.map(_._1).toDF("t")
      .select(TextStats.langId($"t").as("l")).as[String].collect()
    out shouldBe samples.map(_._2).toArray
  }

  test("langId: gibberish → und; null → null") {
    one[String]("zzz qqq xxx www", TextStats.langId) shouldBe "und"
    Seq[Option[String]](None).toDF("t")
      .select(TextStats.langId($"t")).as[Option[String]].head() shouldBe None
  }

  test("normalizedFingerprint: case/whitespace-invariant, content-sensitive") {
    val fp = (s: String) => one[String](s, TextStats.normalizedFingerprint)
    fp("Hello  World") shouldBe fp("hello world")
    fp("  hello world \n") shouldBe fp("hello world")
    fp("hello world") should not be fp("hello worlds")
  }

  test("rollingFingerprint: order-sensitive (unlike a bag-of-words hash)") {
    val fp = (s: String) => one[Long](s, TextStats.rollingFingerprint)
    fp("a b") should not be fp("b a")
    fp("A  b") shouldBe fp("a b") // normalization applies first
  }

  test("duplicateTokenRatio: repeats score, prose doesn't, empty is 0") {
    one[Double]("spam spam spam ham", TextStats.duplicateTokenRatio) shouldBe 0.5 +- 1e-9
    one[Double]("all tokens here differ", TextStats.duplicateTokenRatio) shouldBe 0.0
    one[Double]("", TextStats.duplicateTokenRatio) shouldBe 0.0
  }

  test("topBigramFraction: dominant bigram share; short docs are 0") {
    // bigrams of "a b a b a": [a b, b a, a b, b a] → top share 2/4
    one[Double]("a b a b a", TextStats.topBigramFraction) shouldBe 0.5 +- 1e-9
    one[Double]("one", TextStats.topBigramFraction) shouldBe 0.0
  }

  test("redactPii removes urls, emails and phone runs; counts match") {
    val s = "mail me@corp.example.com or call +1 (555) 010-1234, " +
      "docs at https://docs.example.com/a/b now"
    one[String](s, TextStats.redactPii(_)) shouldBe
      "mail [REDACTED] or call [REDACTED], docs at [REDACTED] now"
    one[Int](s, TextStats.piiMatchCount) shouldBe 3
    one[String]("no contact info here", TextStats.redactPii(_)) shouldBe
      "no contact info here"
  }

  test("vocab: term and document frequency over the shared tokenizer") {
    val docs = Seq(
      (1L, "The cat sat. The CAT!"),
      (2L, "a cat"),
      (3L, null.asInstanceOf[String]),
      (4L, "...")                       // tokenizes to nothing
    ).toDF("doc_id", "text")
    val out = TextStats.vocab(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    out shouldBe Array(("a", 1L, 1L), ("cat", 3L, 2L), ("sat", 1L, 1L),
      ("the", 2L, 1L))
  }

  test("cleanText: control strip (newline survives), run collapse, trim") {
    val bell = 0x07.toChar
    val vt = 0x0b.toChar
    one[String](s"  a$bell\tb$vt c\nd  ", TextStats.cleanText) shouldBe
      "a b c\nd"
  }

  test("cleanText: CR dies — CRLF corpora clean to bare LF") {
    val cr = 0x0d.toChar
    one[String](s"a$cr\nb${cr}c", TextStats.cleanText) shouldBe "a\nbc"
  }

  test("gopherRules: each rule trips on its own pathology") {
    def rules(s: String): Map[String, Boolean] = {
      val row = Seq(s).toDF("t")
        .select(TextStats.gopherRules($"t").as("g")).select("g.*")
        .collect().head
      row.schema.fieldNames.zipWithIndex
        .map { case (n, i) => n -> row.getBoolean(i) }.toMap
    }
    // a healthy paragraph: 60 varied words incl. required stopwords
    val good = (1 to 60).map(i => s"word$i").mkString(" ") +
      " the data goes to one of the nodes and that will have with it"
    val g = rules(good)
    assert(g("gopher_pass"), s"healthy text must pass: $g")
    // too short
    rules("the of and short")("word_count_ok") shouldBe false
    // symbol spam
    rules(good + " " + ("# " * 40))("symbol_ratio_ok") shouldBe false
    // numeric tables: words without an alphabetic char
    rules((1 to 80).map(_.toString).mkString(" "))("alpha_words_ok") shouldBe
      false
    // keyword spam: no required stopwords
    rules((1 to 60).map(i => s"kw$i").mkString(" "))("stopwords_ok") shouldBe
      false
    // duplicate lines
    val lined = (("the data goes to of and that line\n" * 10) +
      (1 to 60).map(i => s"w$i").mkString(" "))
    rules(lined)("dup_lines_ok") shouldBe false
    // one bigram dominating
    rules(("spam ham " * 60).trim)("top_bigram_ok") shouldBe false
    // bullet-led lines
    val bullets = (1 to 20).map(i => s"- item $i").mkString("\n")
    rules(bullets)("bullet_lines_ok") shouldBe false
    // ellipsis-terminated lines
    val ell = (1 to 10).map(i => s"line $i trails off...").mkString("\n")
    rules(ell)("ellipsis_lines_ok") shouldBe false
    // null propagates
    Seq(Option.empty[String]).toDF("t")
      .select(TextStats.gopherRules($"t").as("g"))
      .collect().head.isNullAt(0) shouldBe true
    // stopword rule counts OCCURRENCES (DataTrove), not distinct members:
    // two "the"s alone satisfy it
    val oneStopTwice = (1 to 60).map(i => s"kw$i").mkString(" ") +
      " the kwx the"
    rules(oneStopTwice)("stopwords_ok") shouldBe true
    // symbol ratio is PER SYMBOL CLASS: 6 hashes + 6 ellipses over 80
    // words is ≤0.1 for each class (combined 12/92 would have failed)
    val perClass = (1 to 80).map(i => s"w$i").mkString(" ") +
      (" #" * 6) + (" ..." * 6)
    rules(perClass)("symbol_ratio_ok") shouldBe true
    rules(good + (" #" * 40))("symbol_ratio_ok") shouldBe false
    rules(good + (" ..." * 40))("symbol_ratio_ok") shouldBe false
  }

  test("cleanText: NFC leg composes decomposed accents") {
    val combiningAcute = 0x0301.toChar
    one[String](s"cafe$combiningAcute x", TextStats.cleanText) shouldBe
      "caf" + 0xe9.toChar + " x"
  }

  test("cleanText: null propagates; idempotent") {
    Seq(Option.empty[String]).toDF("t")
      .select(TextStats.cleanText($"t").as("v"))
      .collect().head.isNullAt(0) shouldBe true
    val messy = "  x\t\ty  z "
    val once = one[String](messy, TextStats.cleanText)
    one[String](once, TextStats.cleanText) shouldBe once
  }
}
