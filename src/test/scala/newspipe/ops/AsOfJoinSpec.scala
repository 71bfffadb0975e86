package newspipe.ops

import newspipe.SparkTestBase

/** §7 extension: as-of join — DuckDB ASOF LEFT JOIN semantics. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val clicks = Seq(
    (1L, ts("2026-01-01 10:00:00"), "c1"),
    (1L, ts("2026-01-01 12:00:00"), "c2"),
    (2L, ts("2026-01-01 08:00:00"), "c3"), // before any purchase → null
    (2L, ts("2026-01-01 11:00:00"), "c4")
  ).toDF("user", "ts", "click_id")

  private val purchases = Seq(
    (1L, ts("2026-01-01 09:00:00"), 10.0),
    (1L, ts("2026-01-01 11:00:00"), 20.0),
    (2L, ts("2026-01-01 11:00:00"), 30.0)  // equal ts → matches (>=)
  ).toDF("user", "ts", "amount")

  test("each left row gets the latest right row at-or-before its timestamp") {
    val out = AsOfJoin.asOf(clicks, purchases, "user", "ts")
      .select("click_id", "r_amount").as[(String, Option[Double])].collect().toMap
    out("c1") shouldBe Some(10.0)
    out("c2") shouldBe Some(20.0)
    out("c3") shouldBe None      // left semantics: no match → null
    out("c4") shouldBe Some(30.0) // equality included
  }

  test("left columns pass through untouched; right columns are prefixed") {
    val out = AsOfJoin.asOf(clicks, purchases, "user", "ts")
    out.columns shouldBe Array("user", "ts", "click_id", "r_ts", "r_amount")
    out.count() shouldBe clicks.count()
  }

  test("matched right timestamp is the as-of time, not the nearest") {
    val row = AsOfJoin.asOf(clicks, purchases, "user", "ts")
      .filter($"click_id" === "c2").select("r_ts").head()
    row.getTimestamp(0) shouldBe ts("2026-01-01 11:00:00")
  }

  test("tolerance discards matches staler than the bound (merge_asof semantics)") {
    // c1 at 10:00 matched 09:00 (1h stale) — a 30-minute tolerance drops it;
    // c2 at 12:00 matched 11:00 (1h) — also dropped; c4's equal-ts match stays
    val out = AsOfJoin.asOf(clicks, purchases, "user", "ts",
        tolerance = Some(org.apache.spark.sql.functions.expr("INTERVAL '30' MINUTE")))
      .select("click_id", "r_amount").as[(String, Option[Double])].collect().toMap
    out("c1") shouldBe None
    out("c2") shouldBe None
    out("c3") shouldBe None
    out("c4") shouldBe Some(30.0) // staleness 0 ≤ 30 min
  }

  test("numeric timestamps accept a numeric tolerance") {
    val l = Seq((1L, 100L, "a"), (1L, 200L, "b")).toDF("k", "t", "lv")
    val r = Seq((1L, 90L, "x"), (1L, 120L, "y")).toDF("k", "t", "rv")
    val out = AsOfJoin.asOf(l, r, "k", "t",
        tolerance = Some(org.apache.spark.sql.functions.lit(15L)))
      .select("lv", "r_rv").as[(String, Option[String])].collect().toMap
    out("a") shouldBe Some("x")  // 100-90 = 10 ≤ 15
    out("b") shouldBe None       // 200-120 = 80 > 15
  }
}
