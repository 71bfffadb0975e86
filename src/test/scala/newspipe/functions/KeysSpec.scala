package newspipe.functions

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §2.5 W1-W4: surrogate-key fidelity — the reference's 5-char truncation
  * collides beyond 99,999 rows; legacy mode preserves that, safe modes fix it.
  */
class KeysSpec extends SparkTestBase {
  import spark.implicits._

  test("legacy key reproduces reference semantics: row_number cast substr(1,5)") {
    val df = Seq("b", "a", "c").toDF("k")
    val out = df.withColumn("id", Keys.legacyRowNumberKey("k"))
      .orderBy("k").as[(String, String)].collect()
    out shouldBe Array(("a", "1"), ("b", "2"), ("c", "3"))
  }

  test("legacy key COLLIDES at 100k rows (documented hazard, SURVEY §1)") {
    val n = 100001
    val df = spark.range(n).select(format_string("k%07d", $"id").as("k"))
    val distinctIds = df.withColumn("id", Keys.legacyRowNumberKey("k"))
      .select("id").distinct().count()
    distinctIds should be < n.toLong // "100000".substr(1,5) == "10000"
  }

  test("padded key has no collisions at the same scale") {
    val n = 100001
    val df = spark.range(n).select(format_string("k%07d", $"id").as("k"))
    df.withColumn("id", Keys.paddedRowNumberKey("k"))
      .select("id").distinct().count() shouldBe n.toLong
  }

  test("md5 key is deterministic and content-addressed (stable across runs)") {
    val df = Seq("x", "y").toDF("k")
    val a = df.withColumn("id", Keys.md5Key($"k")).orderBy("k").as[(String, String)].collect()
    val b = df.withColumn("id", Keys.md5Key($"k")).orderBy("k").as[(String, String)].collect()
    a shouldBe b
    a.map(_._2).distinct.length shouldBe 2
  }

  test("withSurrogateKey rejects unknown modes") {
    val df = Seq("x").toDF("k")
    an[IllegalArgumentException] should be thrownBy
      Keys.withSurrogateKey(df, "k", "id", mode = "bogus")
  }
}
