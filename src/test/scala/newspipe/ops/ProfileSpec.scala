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
    intercept[IllegalArgumentException](Profile.profileApprox(df, Nil))
  }

  test("profileApprox matches exact within HLL error and plans with NO Expand") {
    val wide = (1 to 2000).map(i => (i.toLong, s"v${i % 97}", i % 13))
      .toDF("id", "s", "m")
    val cols = Seq("id", "s", "m")
    def asMap(p: org.apache.spark.sql.DataFrame) =
      p.as[(String, Long, Long, Long, Option[String], Option[String])]
        .collect().map(r => r._1 -> r).toMap
    val exact = asMap(Profile.profile(wide, cols))
    val approx = asMap(Profile.profileApprox(wide, cols, rsd = 0.02))
    cols.foreach { c =>
      // counts/nulls/min/max are exact in both forms
      approx(c)._2 shouldBe exact(c)._2
      approx(c)._3 shouldBe exact(c)._3
      approx(c)._5 shouldBe exact(c)._5
      approx(c)._6 shouldBe exact(c)._6
      // distinct estimate within 3x the declared rsd (generous CI bound)
      val (e, a) = (exact(c)._4.toDouble, approx(c)._4.toDouble)
      math.abs(a - e) / e should be <= 0.06
    }
    // the exact form pays an Expand (one input copy per distinct-counted
    // column); the HLL form must NOT — that is its reason to exist
    Profile.profile(wide, cols)
      .queryExecution.executedPlan.toString should include("Expand")
    Profile.profileApprox(wide, cols)
      .queryExecution.executedPlan.toString should not include "Expand"
  }
}
