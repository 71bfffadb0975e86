package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** N-gram LM perplexity scoring (CCNet/Gopher quality-filter shape):
  * closed-form stupid-backoff arithmetic, filter behavior, plan shape.
  */
class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("stupid-backoff arithmetic on a closed-form corpus") {
    val ref = Seq((1L, "a b a c"), (2L, "a b")).toDF("id", "text")
    val m = NgramLm.train(ref, "id", "text")
    m.totalTokens shouldBe 6L
    m.vocabSize shouldBe 3L
    m.unigrams.as[(String, Long)].collect().toMap shouldBe
      Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
    m.bigrams.as[(String, String, Long)].collect().toSet shouldBe
      Set(("a", "b", 2L), ("b", "a", 1L), ("a", "c", 1L))
    // "a b z": p(a)=p_uni(a)=(3+1)/10, p(b|a)=2/3, p(z|b)=0.4*p_uni(z)
    //          with p_uni(z)=(0+1)/10 (OOV Laplace)
    val scored = NgramLm.score(Seq((10L, "a b z")).toDF("id", "text"),
      "id", "text", m).collect().head
    scored.getAs[Long]("n_tokens") shouldBe 3L
    val expect =
      (math.log(0.4) + math.log(2.0 / 3.0) + math.log(0.4 * 0.1)) / 3
    scored.getAs[Double]("avg_logprob") shouldBe round6(expect)
    scored.getAs[Double]("ppl") shouldBe
      (math.exp(-round6(expect)) +- 1e-9)
  }

  test("empty and tokenless docs are absent from the scoring output") {
    val ref = Seq((1L, "a b")).toDF("id", "text")
    val m = NgramLm.train(ref, "id", "text")
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "!!! ???"), (4L, null))
      .toDF("id", "text")
    NgramLm.score(docs, "id", "text", m).select("id")
      .as[Long].collect() shouldBe Array(1L)
  }

  test("perplexityFilter keeps in-distribution docs, drops gibberish") {
    val ref = (1 to 50).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val docs = Seq((100L, "the quick brown fox"),
      (101L, "zz qq xx yy ww")).toDF("id", "text")
    NgramLm.perplexityFilter(docs, ref, "id", "text",
        minAvgLogprob = -5.0)
      .select("id").as[Long].collect() shouldBe Array(100L)
  }

  test("scoring is partitioning-invariant (exact counts, windowed lag)") {
    val ref = (1 to 40).map(i =>
      (i.toLong, s"tok${i % 5} tok${(i + 1) % 5} tok${(i + 2) % 5}"))
      .toDF("id", "text")
    val docs = (100 to 140).map(i =>
      (i.toLong, s"tok${i % 5} tok${(i + 3) % 5} novel$i"))
      .toDF("id", "text")
    val a = NgramLm.score(docs, "id", "text",
        NgramLm.train(ref, "id", "text"))
      .orderBy("id").as[(Long, Long, Double, Double)].collect()
    val b = NgramLm.score(docs.repartition(13), "id", "text",
        NgramLm.train(ref.repartition(7), "id", "text"))
      .orderBy("id").as[(Long, Long, Double, Double)].collect()
    a.map(r => (r._1, r._2, r._3)) shouldBe b.map(r => (r._1, r._2, r._3))
  }
}
