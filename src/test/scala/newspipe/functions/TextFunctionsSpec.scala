package newspipe.functions

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §2.8 F6-F7 + §2.9 X1/X3: native replacements for the reference's text
  * Python UDFs must preserve its exact regex semantics.
  */
class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.removeHtmlTags($"t")).as[String].head()

  test("removeHtmlTags strips simple tags (ref _lib:78-82 semantics)") {
    strip("<p>Hello <b>world</b></p>") shouldBe "Hello world"
  }

  test("removeHtmlTags is non-greedy: adjacent tags don't swallow text") {
    strip("<a>x</a> keeps <i>y</i>") shouldBe "x keeps y"
  }

  test("removeHtmlTags has NO DOTALL: a tag spanning a newline survives (quirk preserved)") {
    strip("<div\nclass=x>inside</div>") shouldBe "<div\nclass=x>inside"
  }

  test("removeHtmlTags: null in, null out") {
    Seq[Option[String]](None).toDF("t")
      .select(TextFunctions.removeHtmlTags($"t")).as[Option[String]].head() shouldBe None
  }

  private def domain(u: String): String =
    Seq(u).toDF("u").select(TextFunctions.extractDomain($"u")).as[String].head()

  test("extractDomain: https + www stripped (ref 02:70 pattern)") {
    domain("https://www.bbc.co.uk/news/article-1") shouldBe "bbc.co.uk"
  }

  test("extractDomain: http, no www, with port kept (group is [^/]+)") {
    domain("http://example.com:8080/x") shouldBe "example.com:8080"
  }

  test("extractDomain: no protocol → empty string (Spark non-match semantics)") {
    domain("www.nope.com/path") shouldBe ""
  }

  test("charCount preserves the reference's character-count misnomer (02:71)") {
    Seq("two words").toDF("t")
      .select(TextFunctions.charCount($"t")).as[Int].head() shouldBe 9
  }

  test("wordCount (extension) counts words; blank → 0") {
    val df = Seq("two words", "  ", "one").toDF("t")
    df.select(TextFunctions.wordCount($"t")).as[Int].collect() shouldBe Array(2, 0, 1)
  }

  test("toUpperSnakeColumns renames all columns in one Project (ref _lib:68-72)") {
    val df = Seq((1, "x")).toDF("published date", "source")
    TextFunctions.toUpperSnakeColumns(df).columns shouldBe Array("PUBLISHED_DATE", "SOURCE")
  }

  test("rowPayload round-trips through from_json (quarantine identity)") {
    val df = Seq(("a", 1), ("b", 2)).toDF("s", "i")
    val payload = df.select(TextFunctions.rowPayload(df).as("p"))
    val back = payload.select(
      from_json($"p", org.apache.spark.sql.types.StructType.fromDDL("s STRING, i INT"))
        .as("r")).select("r.s", "r.i")
    back.as[(String, Int)].collect().sorted shouldBe Array(("a", 1), ("b", 2))
  }
}
