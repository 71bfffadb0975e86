package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 extension: BM25 ranked retrieval — ranking semantics and plan shape. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark query planning and spark shuffles in spark"),
    (2L, "query planning for databases"),
    (3L, "cooking recipes with garlic and onions"),
    (4L, "a very long document about gardens " + ("filler words here " * 50) +
      "with one mention of spark"),
    (5L, "spark")
  ).toDF("doc_id", "text")

  test("only docs containing a query term score; ranking follows tf and length norm") {
    val out = Retrieval.bm25(corpus, "doc_id", "text", Seq("spark", "query"))
      .as[(Long, Double)].collect().toMap
    out.keySet shouldBe Set(1L, 2L, 4L, 5L)
    // doc 1 has both terms with high tf in a short doc — top score
    out(1L) should be > out(2L)
    // one 'spark' in a tiny doc beats one 'spark' drowned in a long doc
    out(5L) should be > out(4L)
    out.values.foreach(_ should be > 0.0)
  }

  test("search returns k docs deterministically ordered") {
    val top = Retrieval.search(corpus, "doc_id", "text", Seq("spark"), k = 2)
      .select("doc_id").as[Long].collect()
    top.length shouldBe 2
    top.head shouldBe 1L // highest tf, short doc
  }

  test("no term matches → empty result, not an error") {
    Retrieval.bm25(corpus, "doc_id", "text", Seq("zzzz")).count() shouldBe 0L
  }

  test("stats and df ride broadcast joins — the corpus is never shuffled for them") {
    val out = Retrieval.bm25(corpus, "doc_id", "text", Seq("spark", "query"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    plan should include("Broadcast")
  }

  test("idf ordering: rarer terms contribute more for equal tf") {
    // 'query' appears in 2 docs, 'spark' in 4 — a doc with only 'query'
    // must outscore an otherwise-identical doc with only 'spark'
    val tiny = Seq(
      (1L, "spark alpha"), (2L, "spark beta"), (3L, "spark gamma"),
      (4L, "query alpha"), (5L, "query beta"),
      (6L, "spark filler"), (7L, "query filler")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25(tiny, "doc_id", "text", Seq("spark", "query"))
      .as[(Long, Double)].collect().toMap
    out(7L) should be > out(6L)
  }

  test("tfIdf: k terms per doc, ubiquitous terms rank below distinctive ones") {
    val out = Retrieval.tfIdf(corpus, "doc_id", "text", k = 2)
      .select("doc_id", "token", "rank").as[(Long, String, Int)].collect()
    out.groupBy(_._1).values.foreach { rows =>
      rows.length should be <= 2
      rows.map(_._3).sorted shouldBe (1 to rows.length)
    }
    // doc 3's profile is its distinctive cooking vocabulary, never 'and'
    // ('and' is in 4/5 docs — low idf)
    val doc3 = out.filter(_._1 == 3L).map(_._2).toSet
    doc3.intersect(Set("garlic", "onions", "cooking", "recipes")) should not be empty
    doc3 should not contain "and"
  }

  test("tfIdf rank is deterministic: ties on score break by token") {
    // two tokens with identical (tf, df) in the same doc → identical score;
    // rank must order them lexicographically, stably across partitionings
    val tiny = Seq((1L, "zeta alpha"), (2L, "beta other")).toDF("doc_id", "text")
    val r = Retrieval.tfIdf(tiny.repartition(3), "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank")
      .select("token").as[String].collect()
    r shouldBe Array("alpha", "zeta")
  }

  test("hybridRrf: fusion arithmetic, leg-miss nulls, deterministic order") {
    // doc 1 dominates the lexical leg; doc 3 dominates the semantic leg;
    // doc 2 places mid-table in both; doc 4 appears ONLY semantically
    val docs = Seq(
      (1L, "spark spark spark engine"),
      (2L, "spark shuffle"),
      (3L, "unrelated words entirely")).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(0.1f, 0.9f)),
      (2L, Array(0.6f, 0.4f)),
      (3L, Array(1.0f, 0.0f)),
      (4L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val out = Retrieval.hybridRrf(docs, "doc_id", "text", Seq("spark"),
      emb, "vec_id", "embedding", queryVec = Seq(1.0, 0.0),
      topK = 4, rrfK = 60, legK = 3)
      .orderBy("rank")
      .collect()
    // lexical leg: 1 (tf 3) then 2 (tf 1); doc 3/4 score no terms.
    // semantic leg (cos vs [1,0], legK=3): 3 (1.0), 4 (≈.994), 2 (≈.832).
    val byId = out.map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toMap
    byId(1L)._1 shouldBe Some(1) // lex rank 1
    byId(1L)._2 shouldBe None    // missed the semantic top-3
    byId(3L)._1 shouldBe None
    byId(3L)._2 shouldBe Some(1)
    byId(2L)._1 shouldBe Some(2)
    byId(2L)._2 shouldBe Some(3)
    byId(4L)._2 shouldBe Some(2)
    // rrf is the exact reciprocal sum
    byId(2L)._3 shouldBe (math.rint((1.0 / 62 + 1.0 / 63) * 1e6) / 1e6)
    byId(1L)._3 shouldBe (math.rint((1.0 / 61) * 1e6) / 1e6)
    // doc 2 (both legs) outranks every single-leg doc here
    out.head.getLong(0) shouldBe 2L
    out.map(_.getInt(4)).toSeq shouldBe Seq(1, 2, 3, 4)
  }
}
