package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 scale: bucketized interval join ≡ the naive theta join. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def points = (0L until 500L).map(x => (x, s"p$x")).toDF("x", "pid")
  private def intervals = Seq(
    (0L, 10L, "i1"), (5L, 25L, "i2"), (100L, 100L, "i3"),
    (490L, 600L, "i4"), (700L, 800L, "i5") // i5 matches nothing
  ).toDF("s", "e", "iid")

  test("bucketized join equals the naive range join, for several widths") {
    val naive = points.join(intervals, $"x".between($"s", $"e"))
      .select("pid", "iid").as[(String, String)].collect().sorted
    for (width <- Seq(1L, 7L, 16L, 1000L)) {
      val fast = RangeJoin.intervalJoin(points, intervals, "x", "s", "e", width)
        .select("pid", "iid").as[(String, String)].collect().sorted
      fast shouldBe naive
    }
  }

  test("inclusive bounds: both endpoints match; point-width intervals work") {
    val out = RangeJoin.intervalJoin(points, intervals, "x", "s", "e", 8L)
    out.filter($"iid" === "i3").select("x").as[Long].collect() shouldBe Array(100L)
    out.filter($"iid" === "i1").count() shouldBe 11 // 0..10 inclusive
  }

  test("overlapping intervals produce one row per covering interval") {
    val out = RangeJoin.intervalJoin(points, intervals, "x", "s", "e", 8L)
    out.filter($"x" === 7L).select("iid").as[String].collect().sorted shouldBe
      Array("i1", "i2")
  }
}
