package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the extension operators: empty corpora and
  * empty candidate sets must yield empty results, never crash — at scale an
  * empty partition/source is routine, not exceptional.
  */
class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")

  test("dedup operators on an empty corpus return empty") {
    Dedup.exact(emptyDocs, "doc_id", Seq("text")).count() shouldBe 0
    Dedup.minhashCandidates(emptyDocs, "doc_id", "text").count() shouldBe 0
    Dedup.simhashCandidates(emptyDocs, "doc_id", "text").count() shouldBe 0
    Dedup.minhashDedup(emptyDocs, "doc_id", "text").count() shouldBe 0
    Dedup.spanDedup(emptyDocs, "doc_id", "text").count() shouldBe 0
  }

  test("cross-corpus dedup with empty sides: empty corpus → empty; empty reference → identity") {
    val docs = Seq((1L, "some real document text here")).toDF("doc_id", "text")
    Dedup.dedupAgainst(emptyDocs, docs, "doc_id", "text").count() shouldBe 0
    Dedup.dedupAgainst(docs, emptyDocs, "doc_id", "text").count() shouldBe 1
  }

  test("packing/gating on an empty frame return empty, not a crash") {
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "grp", "w")
    Sampling.packBins(empty, "id", "w", budget = 100L, Seq("grp")).count() shouldBe 0
    Sampling.topFractionByGroup(empty, "grp", "w", 0.5, "id").count() shouldBe 0
    Sampling.topFractionByGroupApprox(empty, "grp", "w", 0.5).count() shouldBe 0
    Sampling.stratifiedSample(empty, "id", "grp", Map("a" -> 0.5)).count() shouldBe 0
  }

  test("knnJoin degenerate corpora: empty and single-row inputs yield no pairs") {
    Similarity.knnJoin(emptyVecs, "vec_id", "embedding", dim = 8).count() shouldBe 0
    val one = Seq((1L, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    Similarity.knnJoin(one, "vec_id", "embedding", dim = 8).count() shouldBe 0
  }

  test("jaccardVerify with an empty candidate list returns empty") {
    val docs = Seq((1L, "some real document text here")).toDF("doc_id", "text")
    val noCand = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    Dedup.jaccardVerify(noCand, docs, "doc_id", "text").count() shouldBe 0
  }

  test("similarity operators on an empty corpus return empty") {
    Similarity.allPairsCosine(
      emptyVecs.select($"vec_id", $"embedding".cast("array<double>").as("v")),
      "vec_id", "v", 0.5).count() shouldBe 0
    Similarity.cosineNearDupPairs(emptyVecs, "vec_id", "embedding",
      dim = 4, bands = 2, nbits = 4).count() shouldBe 0
    val queries = Seq((1L, Seq(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    Similarity.bruteForceTopK(queries, emptyVecs, "vec_id", "embedding", k = 3)
      .count() shouldBe 0
    Similarity.lshTopK(queries, emptyVecs, "vec_id", "embedding",
      dim = 4, k = 3, nbits = 4).count() shouldBe 0
  }

  test("sampling on an empty frame returns empty splits") {
    val empty = Seq.empty[Long].toDF("id")
    Sampling.hashSample(empty, "id", 0.5).count() shouldBe 0
    Sampling.hashSplit(empty, "id", Seq(0.5, 0.5)).map(_.count()).sum shouldBe 0
  }

  test("connectedComponents on an empty pair list returns empty labels") {
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    Dedup.connectedComponents(noPairs).count() shouldBe 0
  }

  test("round-5 operators on an empty corpus return empty, not a crash") {
    val emptyW = Seq.empty[(Long, String, Long)].toDF("id", "grp", "w")
    Winnow.fingerprints(emptyDocs, "doc_id", "text").count() shouldBe 0
    Winnow.nearDupPairs(emptyDocs, "doc_id", "text").count() shouldBe 0
    Chunker.chunk(emptyDocs, "doc_id", "text", size = 10).count() shouldBe 0
    Boilerplate.frequentNgrams(emptyDocs, "doc_id", "text").count() shouldBe 0
    Boilerplate.frequentNgramsSketch(emptyDocs, "doc_id", "text").count() shouldBe 0
    Decontaminate.noveltyScore(emptyDocs, emptyDocs, "doc_id", "text").count() shouldBe 0
    Sampling.takePerGroup(emptyW, "grp", "id", n = 3).count() shouldBe 0
    Sampling.packSequences(emptyW, "id", "grp", "w", budget = 10L).count() shouldBe 0
    Sampling.qualityBins(emptyW, "grp", "w", numBins = 4, tieCol = "id").count() shouldBe 0
    Sampling.resampleToBudget(emptyW, "id", "w", "grp", Map("a" -> 5L)).count() shouldBe 0
    Dedup.minhashDedupClusteredBy(
      emptyW.withColumnRenamed("grp", "text"), "id", "text", "w").count() shouldBe 0
  }

  test("CorpusDiff with an empty side classifies everything one way") {
    val docs = Seq((1L, "x")).toDF("id", "text")
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    CorpusDiff.diff(empty, docs, "id", Seq("text"))
      .select("status").as[String].collect() shouldBe Array("added")
    CorpusDiff.diff(docs, empty, "id", Seq("text"))
      .select("status").as[String].collect() shouldBe Array("removed")
    CorpusDiff.diff(empty, empty, "id", Seq("text")).count() shouldBe 0
  }

  test("Profile on an empty table reports zero counts and null min/max") {
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val rows = Profile.profile(empty, Seq("id", "s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    rows("id") shouldBe (("id", 0L, 0L, 0L, None, None))
    rows("s") shouldBe (("s", 0L, 0L, 0L, None, None))
  }

  test("noveltyScore with an empty reference: everything is fully novel") {
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Decontaminate.noveltyScore(docs, emptyDocs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
    out.length shouldBe 1
    out.head._3 shouldBe 0L
    out.head._4 shouldBe 1.0
  }

  test("multimodal features feed the ANN operators end to end") {
    // the integration path a real pipeline runs: binary media → fixed-dim
    // features → cosine top-k over the feature space
    val media = newspipe.multimodal.Media.synthetic(spark, 40L)
    val feats = newspipe.multimodal.Media.extractFeatures(media, dim = 8)
      .toDF().select($"media_id", $"feature")
    val queries = feats.filter($"media_id" < 3)
    val nn = Similarity.bruteForceTopK(queries, feats, "media_id", "feature", k = 5)
    nn.count() shouldBe 15 // 3 queries × k
    nn.groupBy("query_id").count().as[(Long, Long)].collect()
      .foreach { case (_, n) => n shouldBe 5L }
  }


  test("round-9 ops on an empty corpus return empty (or refuse loudly where a model needs data)") {
    // tfIdf / Dsir scoring / PageRank / Prototypes: empty in → empty out
    Retrieval.tfIdf(emptyDocs, "doc_id", "text").count() shouldBe 0
    val ratios = Dsir.logRatios(emptyDocs, emptyDocs, "text", buckets = 16)
    ratios.count() shouldBe 16 // pure smoothing: the model always exists
    Dsir.importanceWeights(emptyDocs, "doc_id", "text", ratios, 16)
      .count() shouldBe 0
    PageRank.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst"))
      .count() shouldBe 0
    val noCents = Prototypes.seedCentroids(
      Seq.empty[(Long, Array[Double])].toDF("vec_id", "v"), "vec_id", "v", 3)
    noCents.count() shouldBe 0
    // classifier training on an empty corpus is a loud error, not a model
    intercept[IllegalArgumentException] {
      QualityClassifier.train(
        Seq.empty[(String, Double)].toDF("text", "label"), "text", "label",
        buckets = 16, epochs = 1)
    }
  }

  test("round-9 ops on single-row / null-text inputs behave sanely") {
    val one = Seq((1L, "solo words here")).toDF("doc_id", "text")
    // single doc: its terms all have df=1, rank ladder still total
    Retrieval.tfIdf(one, "doc_id", "text", k = 10).count() shouldBe 3
    // null text rows contribute nothing to tf-idf, everything else survives
    val withNull = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    Retrieval.tfIdf(withNull, "doc_id", "text").select("doc_id")
      .distinct().as[Long].collect() shouldBe Array(1L)
    // self-loop-only graph: rank = fixpoint of r = 0.15 + 0.85 r = 1
    val self = PageRank.pageRank(Seq((7L, 7L)).toDF("src", "dst"),
      iterations = 20).as[(Long, Double)].collect()
    self.length shouldBe 1
    self.head._2 shouldBe 1.0 +- 1e-9
    // BPE on an empty vocab trains an empty table; encode degrades to chars
    Bpe.train(Seq.empty[(String, Long)].toDF("word", "cnt"), 5) shouldBe Nil
    Bpe.encodeWord("ab", Map.empty) shouldBe Seq("a", "b", Bpe.EndOfWord)
  }
}
