package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** HNSW graph ANN ([[Hnsw.hnswTopK]]): recall against the exact
  * brute-force ranking, planted-twin exactness, shard-path equivalence,
  * and run-to-run determinism (hash-derived levels, ordered insertion).
  */
class HnswSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic synthetic corpus: `n` vectors in `dim` dims from a
    * splitmix-ish hash — no Random, identical across runs/JVMs.
    */
  private def corpus(n: Int, dim: Int) = {
    def h(i: Long, j: Long): Double = {
      var z = i * 1000003L + j + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) & 0xffffffL).toDouble / 0xffffffL.toDouble - 0.5
    }
    (0 until n).map(i => (i.toLong,
      (0 until dim).map(j => h(i, j)).toArray)).toDF("id", "vec")
  }

  test("recall@10 >= 0.9 against brute force on a 600-vector corpus") {
    val c = corpus(600, 16).cache()
    val q = c.filter($"id" < 20)
    val exact = Similarity.bruteForceTopK(q, c, "id", "vec", k = 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val approx = Hnsw.hnswTopK(q, c, "id", "vec", k = 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 = $recall")
    c.unpersist()
  }

  test("planted twin is rank 1 (exact-match reachability), single and " +
      "multi-shard") {
    val base = corpus(500, 16)
    val q = base.filter($"id" < 8)
    val planted = q.select(($"id" + 100000L).as("id"), $"vec")
    val c = base.union(planted)
    for (shards <- Seq(0, 4)) {
      val top = Hnsw.hnswTopK(q, c, "id", "vec", k = 3, shards = shards)
        .filter($"rank" === 1)
        .select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().toMap
      (0L until 8L).foreach { i =>
        withClue(s"shards=$shards query $i: ") {
          top(i) shouldBe (i + 100000L)
        }
      }
    }
  }

  /** Multi-cluster corpus: `k` well-separated centroids (near-orthogonal
    * axis bumps), `per` points jittered around each — the shape that
    * fragments a plain-top-M HNSW graph into per-cluster islands.
    * Deterministic (same hash source as [[corpus]]).
    */
  private def clustered(k: Int, per: Int, dim: Int)
      : Seq[(Long, Array[Double])] = {
    def h(i: Long, j: Long): Double = {
      var z = i * 1000003L + j + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) & 0xffffffL).toDouble / 0xffffffL.toDouble - 0.5
    }
    (0 until k).flatMap { c =>
      (0 until per).map { p =>
        val id = (c * per + p).toLong
        val v = (0 until dim).map(j => h(id, j) * 0.15).toArray
        v(c % dim) += 2.0 // the cluster's axis bump dominates
        (id, v)
      }
    }
  }

  test("clustered corpus: level-0 graph stays CONNECTED (every node " +
      "reachable from the entry point) and recall@10 >= 0.9 — the " +
      "Algorithm-4 diversity heuristic's job") {
    val rows = clustered(k = 8, per = 75, dim = 16)
    // connectivity: one shard graph over all 8 clusters
    val (size, reachable) = Hnsw.localGraphStats(rows.toArray)
    size shouldBe 600
    reachable shouldBe size // no islands: search can reach every node
    // recall on the SAME clustered shape through the distributed path,
    // queries drawn from every cluster
    val c = rows.toDF("id", "vec").cache()
    val q = c.filter($"id" % 75 < 3) // 3 queries per cluster
    val exact = Similarity.bruteForceTopK(q, c, "id", "vec", k = 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val approx = Hnsw.hnswTopK(q, c, "id", "vec", k = 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered recall@10 = $recall")
    c.unpersist()
  }

  test("deterministic: two runs return identical rows") {
    val c = corpus(400, 8)
    val q = c.filter($"id" < 10)
    def run() = Hnsw.hnswTopK(q, c, "id", "vec", k = 5, shards = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sorted.toSeq
    run() shouldBe run()
  }

  test("empty corpus partitions and k > corpus size degrade gracefully") {
    val c = corpus(5, 8).repartition(8, $"id") // most partitions empty
    val q = corpus(5, 8).filter($"id" === 0L)
    val rows = Hnsw.hnswTopK(q, c, "id", "vec", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    rows.map(_._1).distinct shouldBe Array(0L)
    rows.length shouldBe 4 // the 4 other vectors; self excluded
  }
}
