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
}
