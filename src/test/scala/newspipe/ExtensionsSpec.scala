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
}
