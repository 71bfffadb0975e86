package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §2.9 extension UDAF: corpus-level MinHash signature merge. */
class MinHashMergeSpec extends SparkTestBase {
  import spark.implicits._

  private val corpusA = Seq(
    "the quick brown fox jumps over the lazy dog today",
    "a completely different second document about spark engines",
    "yet another piece of text to widen the corpus a bit more")
  private val corpusB = corpusA // identical corpus
  private val corpusC = Seq(
    "unrelated words entirely disjoint from anything else written",
    "nothing shared with the first corpus at all in these tokens")

  private def signatures(name: String, texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (name, i.toLong, t) }
      .toDF("corpus", "id", "text")
      .withColumn("__toks", Dedup.tokens($"text"))
      .withColumn("__sh", Dedup.shinglesFromTokens($"__toks"))
      .select($"corpus", Dedup.minhashSignature($"__sh").as("sig"))

  test("merged signature equals the element-wise min of member signatures") {
    val sigs = signatures("a", corpusA)
    val merged = sigs.groupBy("corpus")
      .agg(MinHashMerge.mergeSignatures($"sig").as("msig"))
      .select("msig").as[Seq[Long]].head()
    val manual = sigs.select("sig").as[Seq[Long]].collect()
      .reduce((x, y) => x.zip(y).map { case (p, q) => math.min(p, q) })
    merged shouldBe manual
  }

  test("estimated Jaccard: identical corpora → 1.0, disjoint corpora ≈ 0") {
    val all = signatures("a", corpusA)
      .union(signatures("b", corpusB))
      .union(signatures("c", corpusC))
    val merged = all.groupBy("corpus")
      .agg(MinHashMerge.mergeSignatures($"sig").as("msig"))
      .as[(String, Seq[Long])].collect().toMap
    MinHashMerge.estimatedJaccard(merged("a"), merged("b")) shouldBe 1.0
    MinHashMerge.estimatedJaccard(merged("a"), merged("c")) should be < 0.2
  }

  test("merge distributes: many-partition aggregation equals single-partition") {
    val sigs = signatures("a", corpusA).repartition(8)
    val wide = sigs.groupBy("corpus")
      .agg(MinHashMerge.mergeSignatures($"sig").as("m")).select("m").as[Seq[Long]].head()
    val narrow = signatures("a", corpusA).coalesce(1).groupBy("corpus")
      .agg(MinHashMerge.mergeSignatures($"sig").as("m")).select("m").as[Seq[Long]].head()
    wide shouldBe narrow
  }
}
