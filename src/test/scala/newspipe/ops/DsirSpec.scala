package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 extension: DSIR importance resampling — model semantics (target-like
  * docs outweigh off-target ones), smoothing, determinism, and the
  * broadcast plan shape.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  // target domain talks about astronomy; raw mixes astronomy and cooking
  private val target = Seq(
    (1L, "stars galaxies telescopes and orbital mechanics"),
    (2L, "galaxies nebulae stars and supernova remnants"),
    (3L, "telescopes observe stars and distant galaxies")
  ).toDF("doc_id", "text")

  private val raw = Seq(
    (10L, "stars and galaxies seen through telescopes"),
    (11L, "garlic onions and braising recipes for dinner"),
    (12L, "supernova remnants orbital mechanics stars galaxies"),
    (13L, "dinner recipes with onions garlic and butter"),
    (14L, "")
  ).toDF("doc_id", "text")

  test("astronomy docs outweigh cooking docs under an astronomy target") {
    val ratios = Dsir.logRatios(target, raw, "text", buckets = 64)
    val w = Dsir.importanceWeights(raw, "doc_id", "text", ratios, buckets = 64)
      .as[(Long, Double)].collect().toMap
    w(10L) should be > w(11L)
    w(12L) should be > w(13L)
    w(14L) shouldBe 0.0 // empty doc: no features, weight exactly 0
    w.keySet shouldBe Set(10L, 11L, 12L, 13L, 14L) // every raw doc scored
  }

  test("select keeps n rows, ranked deterministically, astronomy first") {
    // empty docs score exactly 0 (no evidence = neutral), which outranks
    // weak negatives — exclude them to rank on content; 4096 buckets keep
    // the toy vocabulary collision-free
    val nonEmpty = raw.filter("length(text) > 0")
    val sel = Dsir.select(target, nonEmpty, "doc_id", "text", n = 2,
      buckets = 4096, noiseScale = 0.0) // hard top-n: pure weight order
    val got = sel.select("doc_id").as[Long].collect().toSet
    got shouldBe Set(10L, 12L)
    // identical on recomputation and under a different partitioning
    val again = Dsir.select(target, nonEmpty.repartition(7), "doc_id", "text",
      n = 2, buckets = 4096, noiseScale = 0.0)
      .select("doc_id").as[Long].collect().toSet
    again shouldBe got
  }

  test("gumbel noise is a pure function of (salt, id) and shifts selection reproducibly") {
    val a = Dsir.select(target, raw, "doc_id", "text", n = 3, buckets = 64,
      salt = "s1").select("doc_id").as[Long].collect().toSeq
    val b = Dsir.select(target, raw, "doc_id", "text", n = 3, buckets = 64,
      salt = "s1").select("doc_id").as[Long].collect().toSeq
    a shouldBe b
  }

  test("smoothing: ratios exist for every bucket, even ones neither corpus hits") {
    val ratios = Dsir.logRatios(target, raw, "text", buckets = 64)
    ratios.count() shouldBe 64
    // an unhit bucket's ratio is ln(α/(T+αB)) − ln(α/(R+αB)) — finite
    ratios.agg(max(abs(col("log_ratio")))).as[Double].head().isInfinite shouldBe false
  }

  test("the ratio model rides a broadcast join — the corpus is never shuffled against it") {
    val ratios = Dsir.logRatios(target, raw, "text", buckets = 64)
    val w = Dsir.importanceWeights(raw, "doc_id", "text", ratios, buckets = 64)
    w.collect()
    w.queryExecution.executedPlan.toString should include("Broadcast")
  }
}
