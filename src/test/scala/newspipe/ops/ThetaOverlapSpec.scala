package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 extension: theta-sketch corpus overlap — exact-mode equality below
  * saturation, set algebra, partition invariance.
  */
class ThetaOverlapSpec extends SparkTestBase {
  import spark.implicits._

  test("below 2^lgK the sketch is exact: estimates equal true counts") {
    val a = (1L to 600L).toDF("id")
    val b = (401L to 1000L).toDF("id") // overlap = 401..600 = 200 ids
    val (ae, be, ie, cf) = ThetaOverlap.overlapOf(
      ThetaOverlap.sketchOf(a, "id"), ThetaOverlap.sketchOf(b, "id"))
    ae shouldBe 600.0 +- 1e-9
    be shouldBe 600.0 +- 1e-9
    ie shouldBe 200.0 +- 1e-9
    cf shouldBe (200.0 / 600.0) +- 1e-9
  }

  test("duplicates don't inflate: sketches see distinct values") {
    val a = ((1L to 100L) ++ (1L to 100L)).toDF("id")
    ThetaOverlap.sketchOf(a, "id").getEstimate shouldBe 100.0 +- 1e-9
  }

  test("partition layout never changes the estimate") {
    val a = (1L to 5000L).toDF("id")
    val e1 = ThetaOverlap.sketchOf(a, "id").getEstimate
    val e2 = ThetaOverlap.sketchOf(a.repartition(17), "id").getEstimate
    e1 shouldBe e2 +- 1e-9 // exact mode: both are the true count
    e1 shouldBe 5000.0 +- 1e-9
  }

  test("empty and null-only corpora give empty sketches, zero containment") {
    val empty = Seq.empty[Long].toDF("id")
    val nulls = Seq[Option[Long]](None, None).toDF("id")
    ThetaOverlap.sketchOf(empty, "id").getEstimate shouldBe 0.0
    ThetaOverlap.sketchOf(nulls, "id").getEstimate shouldBe 0.0
    val (_, _, _, cf) = ThetaOverlap.overlapOf(
      ThetaOverlap.sketchOf((1L to 10L).toDF("id"), "id"),
      ThetaOverlap.sketchOf(empty, "id"))
    cf shouldBe 0.0
  }

  test("report returns one row with the four columns") {
    val a = (1L to 300L).toDF("id")
    val b = (201L to 500L).toDF("id")
    val r = ThetaOverlap.report(a, b, "id").collect()
    r.length shouldBe 1
    r.head.getDouble(2) shouldBe 100.0 +- 1e-9 // 201..300
  }

  test("estimation mode stays within the documented rse at 10x saturation") {
    val n = 200000L
    val est = ThetaOverlap.sketchOf((1L to n).toDF("id"), "id", lgK = 12)
      .getEstimate
    // lgK=12 ⇒ rse ≈ 1/sqrt(2^12) ≈ 1.6%; allow 3 sigma
    math.abs(est - n) should be < (n * 0.05)
  }
}
