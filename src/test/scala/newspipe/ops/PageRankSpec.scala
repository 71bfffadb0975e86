package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 extension: PageRank — closed-form fixpoints, mass semantics,
  * determinism, and the per-round plan shape.
  */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Double] =
    PageRank.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .as[(Long, Double)].collect().toMap

  test("two-node cycle converges to rank 1.0 each (the symmetric fixpoint)") {
    val r = ranks(Seq((1L, 2L), (2L, 1L)), iters = 10)
    r(1L) shouldBe 1.0 +- 1e-9
    r(2L) shouldBe 1.0 +- 1e-9
  }

  test("a sink node accumulates more than its sources; sources with no in-links sit at 1-d") {
    // star: 1,2,3 all point at 4; nothing points back
    val r = ranks(Seq((1L, 4L), (2L, 4L), (3L, 4L)))
    r(1L) shouldBe 0.15 +- 1e-12 // no in-links: (1-d) exactly after round 1
    r(2L) shouldBe r(1L)
    // closed-form fixpoint: 0.15 + 0.85·(3·0.15) = 0.5325
    r(4L) shouldBe 0.5325 +- 1e-12
    r(4L) should be > r(1L)
  }

  test("duplicate edges collapse (link-graph, not multigraph semantics)") {
    val once = ranks(Seq((1L, 2L), (2L, 1L)))
    val dup = ranks(Seq((1L, 2L), (1L, 2L), (2L, 1L)))
    dup shouldBe once
  }

  test("chain ordering: closer to the flow's end = higher rank") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    r(2L) should be > r(1L)
    r(3L) should be > r(1L)
    r(4L) should be > r(1L)
  }

  test("deterministic across runs and partitionings") {
    val edges = (1L to 200L).map(i => (i, i * 7 % 97 + 1))
    val a = ranks(edges)
    val b = PageRank.pageRank(edges.toDF("src", "dst").repartition(13),
      iterations = 3).as[(Long, Double)].collect().toMap
    a.keys.foreach(k => a(k) shouldBe b(k) +- 1e-12)
  }

  test("every node on either edge side gets a rank; nulls are dropped") {
    val df = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None))
      .toDF("src", "dst")
    val r = PageRank.pageRank(df).as[(Long, Double)].collect().toMap
    r.keySet shouldBe Set(1L, 2L)
  }

  test("lineage is truncated per round (checkpointed plan, not an iteration tower)") {
    val edges = (1L to 50L).map(i => (i, i % 10 + 1))
    val out = PageRank.pageRank(edges.toDF("src", "dst"), iterations = 8)
    // with per-round localCheckpoint the final plan hangs off a scan of
    // checkpointed blocks — 8 rounds of join/agg must NOT be visible
    val plan = out.queryExecution.optimizedPlan.toString
    plan should include("LogicalRDD")
    out.count() shouldBe 50 // srcs 1..50 ∪ dsts 1..10
  }
}
