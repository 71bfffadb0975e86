package newspipe.ops

import newspipe.SparkTestBase

/** §7 extension: unigram LM quality scoring — hand-computed probabilities
  * on a tiny corpus, cross-corpus floor for unseen tokens, degenerate docs.
  */
class LmQualitySpec extends SparkTestBase {
  import spark.implicits._

  // corpus: "a a b" + "b c" → freqs a:2 b:2 c:1, N=5, V=3, denom = 5+3 = 8
  private def docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")

  test("unigramLogProb: hand-computed smoothed means on a tiny corpus") {
    val out = LmQuality.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, lp) => id -> ((n, lp)) }.toMap
    val pA = 3.0 / 8; val pB = 3.0 / 8; val pC = 2.0 / 8
    out(1L)._1 shouldBe 3L
    out(1L)._2 shouldBe (math.log(pA) * 2 + math.log(pB)) / 3 +- 1e-12
    out(2L)._1 shouldBe 2L
    out(2L)._2 shouldBe (math.log(pB) + math.log(pC)) / 2 +- 1e-12
  }

  test("common-vocabulary docs outscore rare-token docs (the gate's point)") {
    val corpus = (Seq.fill(20)("the common words appear here") ++
      Seq("zxqj vvkw qqpi")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val scores = LmQuality.unigramLogProb(corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    scores(20L) should be < scores(0L) // gibberish scores strictly lower
  }

  test("scoreUnder: unseen tokens get the smoothed floor, not -inf") {
    val reference = Seq((10L, "a a b b")).toDF("doc_id", "text")
    val crawl = Seq((1L, "a zzz")).toDF("doc_id", "text")
    // ref freqs: a:2 b:2, N=4, V=2, denom 4+2 = 6; p(a)=3/6, p(zzz)=1/6
    val out = LmQuality.scoreUnder(crawl, reference, "doc_id", "text")
      .as[(Long, Long, Double)].head()
    out._3 shouldBe (math.log(3.0 / 6) + math.log(1.0 / 6)) / 2 +- 1e-12
  }

  test("tokenless docs are absent; empty corpus yields empty") {
    val mixed = Seq((1L, "real text"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    LmQuality.unigramLogProb(mixed, "doc_id", "text")
      .select("doc_id").as[Long].collect() shouldBe Array(1L)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    LmQuality.unigramLogProb(empty, "doc_id", "text").count() shouldBe 0L
  }
}
