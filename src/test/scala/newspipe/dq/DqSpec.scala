package newspipe.dq

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §2.10: the DQ framework — native one-pass semantics, legacy reference
  * parity, and explicit differential tests of quirks Q1-Q3.
  */
class DqSpec extends SparkTestBase {
  import spark.implicits._

  // (title, url) rows: one null title, one empty title, one duplicated url
  private def sample = Seq(
    (Some("ok one"), Some("u1")),
    (None, Some("u2")),          // null title
    (Some(""), Some("u3")),      // empty title
    (Some("dup a"), Some("u4")), // u4 duplicated
    (Some("dup b"), Some("u4")),
    (Some("ok two"), Some("u5"))
  ).toDF("title", "url")

  private val cfg = DqConfig("t", requiredColumns = Seq("title", "url"),
    notNull = Seq("title"), uniqueKeys = Seq("url"))

  test("native: violations are tagged per row in one pass") {
    val tagged = NativeDq.tag(sample, cfg)
    val byUrl = tagged.select($"url", col(NativeDq.ViolationsCol))
      .as[(String, Seq[String])].collect().toMap
    byUrl("u1") shouldBe Seq.empty
    byUrl("u2") shouldBe Seq("null_or_empty_column:title")
    byUrl("u3") shouldBe Seq("null_or_empty_column:title")
    byUrl("u4") shouldBe Seq("duplicate_key:url")
    byUrl("u5") shouldBe Seq.empty
  }

  test("native: valid ∪ quarantined partitions the input exactly") {
    val r = NativeDq.run(sample, cfg)
    r.valid.count() + r.quarantined.get.count() shouldBe sample.count()
    r.valid.select("url").as[String].collect().sorted shouldBe Array("u1", "u5")
  }

  test("native: validOnly fast path == tagged-filter valid, rule for rule") {
    // every rule kind + nulls + empties + null-keyed dup pairs, so the
    // direct-predicate plan and the violations-array filter are compared
    // where their three-valued-logic edges live
    val rows = Seq(
      (Some("a"), Some("u1"), Some(5.0), Some("ab12"), Some("en")),
      (None, Some("u2"), Some(5.0), Some("ab12"), Some("en")),      // null title
      (Some(""), Some("u3"), Some(5.0), Some("ab12"), Some("en")),  // empty
      (Some("d"), Some("u4"), Some(5.0), Some("ab12"), Some("en")), // dup u4
      (Some("d"), Some("u4"), Some(5.0), Some("ab12"), Some("en")),
      (Some("e"), None, Some(5.0), Some("ab12"), Some("en")),       // null key (dup'd)
      (Some("f"), None, Some(5.0), Some("ab12"), Some("en")),
      (Some("g"), Some("u5"), Some(99.0), Some("ab12"), Some("en")), // range
      (Some("h"), Some("u6"), None, Some("ab12"), Some("en")),       // null range col: passes
      (Some("i"), Some("u7"), Some(5.0), Some("XX"), Some("en")),    // regex
      (Some("j"), Some("u8"), Some(5.0), Some("ab12"), Some("zz"))   // set
    ).toDF("title", "url", "score", "code", "lang")
    val full = DqConfig("t", requiredColumns = Seq("title", "url"),
      notNull = Seq("title"), uniqueKeys = Seq("url"),
      inRange = Map("score" -> (0.0, 10.0)),
      matchesRegex = Map("code" -> "[a-z]+[0-9]+"),
      allowedValues = Map("lang" -> Seq("en", "de")))
    val viaTag = NativeDq.tag(rows, full)
      .filter(org.apache.spark.sql.functions.size(
        col(NativeDq.ViolationsCol)) === 0)
      .drop(NativeDq.ViolationsCol)
    val fast = NativeDq.validOnly(rows, full)
    fast.columns shouldBe viaTag.columns
    fast.collect().map(_.toString).sorted shouldBe
      viaTag.collect().map(_.toString).sorted
    fast.select("title").as[String].collect().sorted shouldBe Array("a", "h")
    // run() without persistTagged routes valid through the fast path and
    // the partition property still holds exactly
    val r = NativeDq.run(rows, full)
    r.valid.count() + r.quarantined.get.count() shouldBe rows.count()
  }

  test("native: issues summary lists each violation kind once") {
    val r = NativeDq.run(sample, cfg)
    r.issues() shouldBe Seq("duplicate_key:url", "null_or_empty_column:title")
  }

  test("native: missing required column fails fast") {
    an[IllegalArgumentException] should be thrownBy
      NativeDq.tag(sample.drop("url"), cfg)
  }

  test("legacy quirk Q3: NULL-keyed rows are NOT quarantined (equi-join skips nulls)") {
    val r = LegacyDq.run(sample, cfg)
    val quarantinedTitles = r.quarantined.get.select("title").as[Option[String]].collect()
    // empty-string title IS quarantined; null title is NOT (survives to valid)
    quarantinedTitles should contain(Some(""))
    quarantinedTitles should not contain None
    r.valid.filter($"title".isNull).count() shouldBe 1
  }

  test("legacy quirk Q2: bad keys from different columns pollute one positional union") {
    // title value "poison" fails not-null? No — make a title value that EQUALS
    // a duplicated url value: the legacy union joins url-dup values against
    // the title column (first rule's name), quarantining an innocent row.
    val df = Seq(
      (Some(""), Some("x1")),      // empty title → bad key "" under 'title'
      (Some("u9"), Some("x2")),    // innocent row whose TITLE equals the dup URL value
      (Some("a"), Some("u9")),     // u9 duplicated
      (Some("b"), Some("u9"))
    ).toDF("title", "url")
    val r = LegacyDq.run(df, cfg)
    // the innocent ("u9", "x2") row is quarantined because the url-dup value
    // "u9" was joined against the title column — the reference's latent bug
    r.quarantined.get.filter($"url" === "x2").count() shouldBe 1
    // native mode routes it correctly
    val n = NativeDq.run(df, cfg)
    n.valid.filter($"url" === "x2").count() shouldBe 1
  }

  test("legacy: issue strings mirror the reference's wording") {
    val r = LegacyDq.run(sample, cfg)
    r.issues() shouldBe Seq(
      "Null or empty values in column 'title'",
      "Duplicate keys detected on: url")
  }

  test("legacy quirk Q2 corollary: with a not-null rule first, url dups ESCAPE quarantine") {
    // the bad-key union is joined on the FIRST rule's column name (title), so
    // url-duplicate values never match their own column — u4 rows sail through
    val r = LegacyDq.run(sample, cfg)
    r.quarantined.get.filter($"url" === "u4").count() shouldBe 0
    r.valid.filter($"url" === "u4").count() shouldBe 2
  }

  test("legacy: inner join re-multiplies duplicate keys (uniqueKeys-only config)") {
    // with only the unique-keys rule, the key frame keeps the url column name
    // and both u4 rows match the single bad key → 2 quarantined rows
    val r = LegacyDq.run(sample, DqConfig("t", uniqueKeys = Seq("url")))
    r.quarantined.get.filter($"url" === "u4").count() shouldBe 2
    r.valid.count() shouldBe 4
  }

  test("no rules → passthrough, no quarantine frame") {
    val r = NativeDq.run(sample, DqConfig("t"))
    r.valid.count() shouldBe sample.count()
    r.quarantined.get.count() shouldBe 0
  }

  test("extension rules: range, regex, allowed-set — one pass, null-tolerant") {
    val df = Seq(
      (Some(5.0), Some("https://x.com/a"), Some("us")),
      (Some(99.0), Some("ftp://bad"), Some("zz")),     // all three violated
      (None, None, None)                               // nulls: not these rules' business
    ).toDF("score", "url", "country")
    val cfg = DqConfig("t",
      inRange = Map("score" -> (0.0, 10.0)),
      matchesRegex = Map("url" -> "https?://.*"),
      allowedValues = Map("country" -> Seq("us", "gb")))
    val tagged = NativeDq.tag(df, cfg)
    val v = tagged.select(col(NativeDq.ViolationsCol)).as[Seq[String]].collect()
    v(0) shouldBe Seq.empty
    v(1).sorted shouldBe Seq("disallowed_value:country", "out_of_range:score",
      "regex_mismatch:url")
    v(2) shouldBe Seq.empty
  }

  test("extension rules compose with the reference rules in one config") {
    val df = Seq(
      (Some("t1"), Some("u1"), Some(3.0)),
      (Some(""), Some("u2"), Some(50.0))
    ).toDF("title", "url", "score")
    val cfg = DqConfig("t", notNull = Seq("title"), uniqueKeys = Seq("url"),
      inRange = Map("score" -> (0.0, 10.0)))
    val r = NativeDq.run(df, cfg)
    r.valid.count() shouldBe 1
    r.issues() shouldBe Seq("null_or_empty_column:title", "out_of_range:score")
  }

  test("shipped news_articles config mirrors the reference (_lib:105-111)") {
    DqConfig.newsArticles.uniqueKeys shouldBe Seq("url")
    DqConfig.newsArticles.notNull shouldBe Seq("title", "publishedAt", "url")
    DqConfig.newsArticles.requiredColumns shouldBe Seq("title", "publishedAt", "url")
  }
}
