package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 scale: salted join correctness — identical rows to the plain join. */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 90% of left rows share one hot key
  private def left = (1 to 1000).map(i =>
    (if (i <= 900) "hot" else s"k${i % 17}", i)).toDF("k", "lv")
  private def right = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "rv")

  test("salted inner join ≡ plain inner join") {
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .as[(String, Int, String)].collect().sorted
    val salted = Skew.saltedEquiJoin(left, right, Seq("k"), saltBuckets = 8)
      .select("k", "lv", "rv").as[(String, Int, String)].collect().sorted
    salted shouldBe plain
  }

  test("hot key is spread across salt buckets") {
    val salted = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(8)))
    val buckets = salted.filter($"k" === "hot")
      .select("__salt").distinct().count()
    buckets should be >= 6L // 900 rows over 8 buckets hit nearly all
  }

  test("left join preserves unmatched rows exactly once per salt") {
    val plain = left.join(right, Seq("k"), "left").count()
    val salted = Skew.saltedEquiJoin(left, right, Seq("k"), 8, "left").count()
    salted shouldBe plain
  }

  test("left_semi and left_anti are supported and row-identical") {
    // "semi"/"anti" are Spark's own aliases for the left-flavored forms
    for (jt <- Seq("left_semi", "left_anti", "semi", "anti")) {
      val plain = left.join(right, Seq("k"), jt)
        .as[(String, Int)].collect().sorted
      val salted = Skew.saltedEquiJoin(left, right, Seq("k"), 8, jt)
        .as[(String, Int)].collect().sorted
      withClue(jt) { salted shouldBe plain }
    }
  }

  test("right/full joins are rejected (replication would duplicate unmatched right rows)") {
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedEquiJoin(left, right, Seq("k"), 8, jt)
      }
      e.getMessage should include(jt)
    }
  }
}
