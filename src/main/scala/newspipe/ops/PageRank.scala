package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge DataFrame — link-graph authority scoring for
  * corpus curation (rank web documents by the crawl's link structure and
  * keep the authoritative tail, the classic quality prior OpenWebText-style
  * pipelines use; ref has no graph ops — extension track, SURVEY.md §7).
  *
  * Semantics are the standard unnormalized power iteration (the GraphX
  * convention): every node starts at 1.0 and per round
  * `rank(v) ← (1−d) + d·Σ_{u→v} rank(u)/outdeg(u)`; mass arriving at a
  * dangling node (no out-edges) is retained by it and not redistributed.
  * Deterministic — no RNG, no order dependence beyond float-sum
  * associativity (callers comparing across engines round).
  *
  * Scale shape: per iteration exactly one shuffle pair — the rank⋈edges
  * equi-join (AQE skew-splittable, same shape as
  * [[Dedup.connectedComponents]]'s message join) and the per-dst sum with
  * map-side partial aggregation. Ranks are `localCheckpoint`ed per round so
  * the lineage stays one round deep (an unbounded iteration chain would
  * re-execute every prior round on any retry and overflow the planner at
  * ~30 rounds). Edges and degrees are checkpointed once and reused by every
  * round — at 100 TB the edge list is the big side and it never moves; only
  * the (node, rank) table (one long + one double per node) re-shuffles.
  */
object PageRank {

  /** @param edges directed edges; duplicate (src,dst) rows are collapsed
    *              (this is link-graph PageRank, not multigraph)
    * @return (id, rank) — one row per distinct node on either edge side.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", iterations: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iterations) {
      // contribution of every ranked node along its out-edges; nodes with
      // no out-edges simply emit nothing (mass retained, GraphX-style)
      val contribs = ranks.join(e, ranks("id") === e("src"))
        .join(deg, e("src") === deg("src"))
        .select(e("dst").as("id"), (col("rank") / col("__deg")).as("__c"))
        .groupBy("id").agg(sum("__c").as("__m"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("__m"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
