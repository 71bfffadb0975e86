package newspipe

/** The SparkSessionExtensions surface: native expressions as SQL functions. */
class ExtensionsSpec extends SparkTestBase {

  test("double_dot is callable from SQL after registration") {
    NewspipeExtensions.register(spark)
    val v = spark.sql(
      "SELECT double_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    v shouldBe 11.0 +- 1e-12
  }

  test("double_dot participates in a SQL aggregation over a table") {
    NewspipeExtensions.register(spark)
    import spark.implicits._
    Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.5, 0.5))).toDF("id", "v")
      .createOrReplaceTempView("vecs")
    val n = spark.sql(
      "SELECT count(*) AS n FROM vecs WHERE double_dot(v, v) > 0.4")
      .head().getLong(0)
    n shouldBe 2L
  }

  test("extension class applies cleanly to a SparkSessionExtensions instance") {
    // builder-path smoke: the injection list is well-formed
    new NewspipeExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("the curation surface is callable from SQL (same kernels as the DataFrame API)") {
    NewspipeExtensions.register(spark)
    val row = spark.sql(
      """SELECT quality_score('the cat sat on the mat and it was good for the day is here now') AS q,
        |  redact_pii('mail me@x.example.com now') AS r,
        |  word_count('a b c') AS wc,
        |  lang_id('the cat and the dog in the house that was of it') AS l,
        |  dup_token_ratio('spam spam spam ham') AS d""".stripMargin).head()
    row.getDouble(0) should be > 0.5
    row.getString(1) shouldBe "mail [REDACTED] now"
    row.getInt(2) shouldBe 3
    row.getString(3) shouldBe "en"
    row.getDouble(4) shouldBe 0.5 +- 1e-9
  }

  test("SQL sentiment returns the struct form (polarity + label)") {
    NewspipeExtensions.register(spark)
    val row = spark.sql(
      "SELECT sentiment('excellent wonderful great').label AS l").head()
    row.getString(0) shouldBe "positive"
  }
}
