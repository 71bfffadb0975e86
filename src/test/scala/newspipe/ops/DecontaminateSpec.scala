package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 extension: benchmark decontamination — n-gram collision semantics and
  * the broadcast-probe plan shape.
  */
class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "completely unrelated text about spark query planning internals"),
    (3L, "what does the quick brown fox jumps over mean exactly"),
    (4L, "short doc")
  ).toDF("doc_id", "text")

  private val bench = Seq(
    "the quick brown fox jumps over a fence",
    "evaluation item about nothing shared"
  ).toDF("q")

  test("flags exactly the docs sharing an n-gram; counts distinct collisions") {
    val out = Decontaminate.overlapCounts(corpus, "doc_id", "text", bench, "q", n = 5)
      .as[(Long, Long)].collect().toMap
    // "the quick brown fox jumps" and "quick brown fox jumps over" (5-grams)
    // appear in docs 1 and 3 and in the first benchmark item
    out.keySet shouldBe Set(1L, 3L)
    out(1L) shouldBe 2L
    out(3L) shouldBe 2L
  }

  test("clean removes contaminated docs and keeps the rest intact") {
    val kept = Decontaminate.clean(corpus, "doc_id", "text", bench, "q", n = 5)
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(2L, 4L)
  }

  test("no benchmark overlap → corpus passes through unchanged") {
    val none = Seq("zz yy xx ww vv uu tt ss rr qq").toDF("q")
    Decontaminate.clean(corpus, "doc_id", "text", none, "q", n = 5)
      .count() shouldBe 4L
  }

  test("minOverlap raises the collision threshold") {
    // with minOverlap = 3, two shared 5-grams are not enough to drop a doc
    Decontaminate.clean(corpus, "doc_id", "text", bench, "q", n = 5,
      minOverlap = 3L).count() shouldBe 4L
  }

  test("the corpus probe is a broadcast join (no corpus shuffle before the probe)") {
    val plan = Decontaminate.overlapCounts(corpus, "doc_id", "text", bench, "q", n = 5)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("content-free texts never collide: an empty/punct-only benchmark flags nothing") {
    val weird = corpus.union(Seq((9L, "!!! ???")).toDF("doc_id", "text"))
    val emptyBench = Seq("...", "").toDF("q")
    Decontaminate.overlapCounts(weird, "doc_id", "text", emptyBench, "q", n = 5)
      .count() shouldBe 0L
  }

  test("docs shorter than n tokens participate via their whole-token shingle") {
    val shortBench = Seq("short doc").toDF("q")
    val out = Decontaminate.overlapCounts(corpus, "doc_id", "text",
      shortBench, "q", n = 13).as[(Long, Long)].collect().toMap
    out shouldBe Map(4L -> 1L)
  }

  test("noveltyScore: fully-seen docs score 0, fully-fresh docs score 1, mixed in between") {
    val reference = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")
    val out = Decontaminate.noveltyScore(corpus, reference,
        "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 is verbatim in the reference: every 3-gram seen → novelty 0
    out(1L)._4 shouldBe 0.0
    // doc 2 shares nothing → novelty 1
    out(2L)._4 shouldBe 1.0
    // doc 3 shares a run but has fresh grams too
    out(3L)._4 should (be > 0.0 and be < 1.0)
    out(3L)._2 shouldBe (out(3L)._3 +
      (out(3L)._2 * out(3L)._4).round)
    // short doc 4: whole-token shingle unseen → novelty 1
    out(4L)._4 shouldBe 1.0
  }

  test("noveltyScore excludes null/token-free rows on both sides") {
    val weird = corpus.unionByName(Seq(
      (Option.empty[Long], Option("x y z")),
      (Option(9L), Option.empty[String]),
      (Option(10L), Option("!!!"))
    ).toDF("doc_id", "text"))
    val out = Decontaminate.noveltyScore(weird, weird, "doc_id", "text", n = 3)
    out.select("doc_id").as[Long].collect().sorted shouldBe
      Array(1L, 2L, 3L, 4L)
    // corpus == reference → everything fully seen
    out.select("novelty_frac").as[Double].collect().foreach(_ shouldBe 0.0)
  }
}
