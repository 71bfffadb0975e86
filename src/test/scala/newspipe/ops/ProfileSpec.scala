package newspipe.ops

import newspipe.SparkTestBase

/** Extension: one-pass column profiling. */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (Option(1L), Option("a")), (Option(2L), Option("b")),
    (Option(2L), Option.empty[String]), (Option.empty[Long], Option("a"))
  ).toDF("id", "s")

  test("count/nulls/distinct/min/max per column, one row each") {
    val p = Profile.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    p("id") shouldBe (("id", 4L, 1L, 2L, Some("1"), Some("2")))
    p("s") shouldBe (("s", 4L, 1L, 2L, Some("a"), Some("b")))
  }

  test("an all-null column profiles with null min/max and zero distinct") {
    val allNull = Seq.fill(3)(Option.empty[Long]).toDF("x")
    val p = Profile.profile(allNull, Seq("x"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().head
    p shouldBe (("x", 3L, 3L, 0L, None, None))
  }

  test("the profile is ONE job over the data (single aggregate plan)") {
    val plan = Profile.profile(df, Seq("id", "s"))
      .queryExecution.optimizedPlan.toString
    // multiple count-distincts plan through one Expand + Aggregate — never
    // a per-column union of scans
    plan should not include "Union"
  }

  test("empty column list rejected") {
    intercept[IllegalArgumentException](Profile.profile(df, Nil))
  }
}
