package newspipe.ops

import newspipe.SparkTestBase

/** §7 extension: deterministic content-addressed sampling — stability,
  * independence across salts, and disjoint splits.
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def ids = (1L to 2000L).toDF("id")

  test("hashSample is deterministic and roughly proportional") {
    val a = Sampling.hashSample(ids, "id", 0.25, "s1").as[Long].collect().toSet
    val b = Sampling.hashSample(ids, "id", 0.25, "s1").as[Long].collect().toSet
    a shouldBe b // pure function of the data, not of rand()/partitioning
    a.size.toDouble shouldBe (500.0 +- 100.0) // ~binomial around 25%
  }

  test("different salts draw (near-)independent samples") {
    val a = Sampling.hashSample(ids, "id", 0.5, "s1").as[Long].collect().toSet
    val b = Sampling.hashSample(ids, "id", 0.5, "s2").as[Long].collect().toSet
    a should not be b
    val overlap = (a intersect b).size.toDouble
    overlap shouldBe (a.size * 0.5 +- a.size * 0.2) // ≈ independent draws
  }

  test("a sample is a subset of a larger-fraction sample (same salt): nested splits") {
    val small = Sampling.hashSample(ids, "id", 0.1, "s").as[Long].collect().toSet
    val large = Sampling.hashSample(ids, "id", 0.4, "s").as[Long].collect().toSet
    small.subsetOf(large) shouldBe true // buckets nest — growing a sample keeps it
  }

  test("hashSplit partitions the data disjointly and completely") {
    val Seq(train, valid, test) =
      Sampling.hashSplit(ids, "id", Seq(0.8, 0.1, 0.1), "sp")
    val t = train.as[Long].collect().toSet
    val v = valid.as[Long].collect().toSet
    val te = test.as[Long].collect().toSet
    (t intersect v) shouldBe empty
    (t intersect te) shouldBe empty
    (v intersect te) shouldBe empty
    (t ++ v ++ te).size shouldBe 2000 // fractions sum to 1 ⇒ full coverage
  }

  test("mixture blends sources at their own rates, deterministically tagged") {
    val big = (1L to 1000L).toDF("id")
    val small = (5000L to 5499L).toDF("id")
    val mix = Sampling.mixture(
      Seq(("web", big, 0.2), ("books", small, 0.8)), "id", salt = "m1")
    val counts = mix.groupBy("mixture_source").count()
      .as[(String, Long)].collect().toMap
    counts("web").toDouble shouldBe (200.0 +- 60.0)
    counts("books").toDouble shouldBe (400.0 +- 60.0)
    // pure function of the data: a second evaluation is identical
    mix.as[(Long, String)].collect().toSet shouldBe
      Sampling.mixture(Seq(("web", big, 0.2), ("books", small, 0.8)),
        "id", salt = "m1").as[(Long, String)].collect().toSet
  }

  test("invalid fractions are rejected") {
    intercept[IllegalArgumentException](Sampling.hashSample(ids, "id", 1.5))
    intercept[IllegalArgumentException](
      Sampling.hashSplit(ids, "id", Seq(0.8, 0.4)))
  }
}
