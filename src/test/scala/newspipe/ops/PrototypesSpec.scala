package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 extension: prototype pruning — assignment correctness, per-cluster
  * keep arithmetic, and the farthest-first keep policy.
  */
class PrototypesSpec extends SparkTestBase {
  import spark.implicits._

  // two tight clusters around orthogonal axes + per-vector jitter
  private val vecs = Seq(
    (1L, Array(1.0, 0.0, 0.0)),       // cluster A seed
    (2L, Array(0.0, 1.0, 0.0)),       // cluster B seed
    (3L, Array(0.99, 0.14, 0.0)),     // near A
    (4L, Array(0.95, 0.31, 0.0)),     // A-ish, farther
    (5L, Array(0.10, 0.99, 0.0)),     // near B
    (6L, Array(0.31, 0.95, 0.0))      // B-ish, farther
  ).toDF("vec_id", "v")

  private def run(keep: Double) = {
    val cents = Prototypes.seedCentroids(vecs, "vec_id", "v", k = 2)
    Prototypes.prune(vecs, "vec_id", "v", cents, keepFraction = keep)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("every vector lands in its max-cosine cluster") {
    val m = run(0.5)
    m(1L)._1 shouldBe 1L; m(3L)._1 shouldBe 1L; m(4L)._1 shouldBe 1L
    m(2L)._1 shouldBe 2L; m(5L)._1 shouldBe 2L; m(6L)._1 shouldBe 2L
    m(1L)._2 shouldBe 1.0 +- 1e-12 // the seed is its own prototype
  }

  test("keep policy: the FARTHEST ceil(n·f) per cluster survive — prototypes are dropped") {
    val m = run(0.5)
    // cluster A = {1,3,4}: keep ceil(1.5)=2 farthest → 4 and 3 stay, seed 1 dropped
    m(4L)._3 shouldBe true
    m(3L)._3 shouldBe true
    m(1L)._3 shouldBe false
    // cluster B = {2,5,6}: 6 and 5 stay, seed 2 dropped
    m(6L)._3 shouldBe true
    m(5L)._3 shouldBe true
    m(2L)._3 shouldBe false
  }

  test("keepFraction = 1.0 keeps everything; every row carries its proximity") {
    val m = run(1.0)
    m.values.forall(_._3) shouldBe true
    m.values.foreach(v => v._2 should (be >= -1.0 and be <= 1.0))
  }

  test("seed centroids are the k smallest ids, deterministically") {
    val c = Prototypes.seedCentroids(vecs.repartition(5), "vec_id", "v", 3)
      .select("centroid_id").as[Long].collect().sorted
    c shouldBe Array(1L, 2L, 3L)
  }

  test("centroids ride a broadcast — no shuffle of the corpus for assignment") {
    val cents = Prototypes.seedCentroids(vecs, "vec_id", "v", k = 2)
    val out = Prototypes.prune(vecs, "vec_id", "v", cents, 0.5)
    out.collect()
    out.queryExecution.executedPlan.toString should include("Broadcast")
  }
}
