package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 extension: trainable quality classifier — separability, scoring
  * semantics, determinism, and the no-shuffle scoring shape.
  */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // linearly separable by vocabulary: "good" docs use one lexicon,
  // "bad" docs another
  private val labeled = (1 to 60).map { i =>
    if (i % 2 == 0)
      (i.toLong, s"thoughtful rigorous prose paragraph $i citations evidence", 1.0)
    else
      (i.toLong, s"buy now click here winner $i free prize", 0.0)
  }.toDF("id", "text", "label")

  test("separable corpus trains to perfect accuracy; scores are probabilities") {
    val m = QualityClassifier.train(labeled, "text", "label",
      buckets = 1024, epochs = 40)
    val scored = labeled.select($"label",
      QualityClassifier.score(m)($"text").as("p"))
      .as[(Double, Double)].collect()
    scored.foreach { case (_, p) => p should (be >= 0.0 and be <= 1.0) }
    val acc = scored.count { case (y, p) =>
      (p >= 0.5) == (y >= 0.5) }.toDouble / scored.length
    acc shouldBe 1.0
  }

  test("model generalizes to unseen docs from the same vocabularies") {
    val m = QualityClassifier.train(labeled, "text", "label",
      buckets = 1024, epochs = 40)
    val p1 = QualityClassifier.score(m)
    val holdout = Seq(
      (1L, "rigorous evidence and citations in careful prose", 1.0),
      (2L, "click here free winner prize now", 0.0)).toDF("id", "text", "label")
    val got = holdout.select($"label", p1($"text").as("p"))
      .as[(Double, Double)].collect().toMap
    got(1.0) should be > 0.5
    got(0.0) should be < 0.5
  }

  test("training is partition-order robust (full-batch gradient is a pure sum)") {
    val a = QualityClassifier.train(labeled, "text", "label",
      buckets = 256, epochs = 10)
    val b = QualityClassifier.train(labeled.repartition(13), "text", "label",
      buckets = 256, epochs = 10)
    // identical up to float-add reassociation across partitions
    a.weights.zip(b.weights).foreach { case (x, y) =>
      math.abs(x - y) should be < 1e-9
    }
  }

  test("null labels are excluded; null text scores through the bias only") {
    val withNulls = labeled
      .withColumn("label", when($"id" === 2L, lit(null)).otherwise($"label"))
    val m = QualityClassifier.train(withNulls, "text", "label",
      buckets = 256, epochs = 5)
    val p = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(QualityClassifier.score(m)($"text").as("p"))
      .as[Double].head()
    p should (be >= 0.0 and be <= 1.0)
  }

  test("scoring plan is shuffle-free (a projection over the scan)") {
    val m = QualityClassifier.train(labeled, "text", "label",
      buckets = 256, epochs = 3)
    val out = labeled.select(QualityClassifier.score(m)($"text").as("p"))
    out.collect()
    out.queryExecution.executedPlan.toString should not include "Exchange"
  }
}
