package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 extension: embedding similarity — exact cosine math, brute-force top-k
  * ranking, and LSH recall against the exact baseline.
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("nbitsFor tracks the ScaleBench density rule: occupancy-constant bucket sizing") {
    // expected occupancy n / 2^nbits stays within [target/2, target]
    for (n <- Seq(100L, 10000L, 1000000L, 100000000L)) {
      val b = Similarity.nbitsFor(n)
      val occ = n.toDouble / math.pow(2.0, b)
      occ should be <= 8.0
      if (b < 30) occ should be >= 4.0
    }
    // 10x the corpus adds ~log2(10) bits — the validated rule's shape
    (Similarity.nbitsFor(1000000L) - Similarity.nbitsFor(100000L)) shouldBe 3 +- 1
    Similarity.nbitsFor(1L) shouldBe 4          // clamped floor
    Similarity.nbitsFor(Long.MaxValue) shouldBe 30 // clamped ceiling
    an[IllegalArgumentException] should be thrownBy Similarity.nbitsFor(0L)
  }

  test("native dot equals the interpreted aggregate(zip_with) reference form") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(50)((Seq.fill(16)(rnd.nextDouble()), Seq.fill(16)(rnd.nextDouble()))) :+
      ((Seq.empty[Double], Seq.empty[Double]))
    val df = rows.toDF("a", "b")
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val out = df.select(Similarity.dot($"a", $"b").as("native"), hof.as("ref"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, r) => n shouldBe r +- 1e-12 }
  }

  test("cosine: known vectors") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),   // identical → 1
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),   // orthogonal → 0
      (Seq(1.0, 0.0), Seq(-1.0, 0.0)),  // opposite → -1
      (Seq(1.0, 0.0), Seq(0.0, 0.0))    // zero norm → null
    ).toDF("a", "b")
    val out = df.select(Similarity.cosine($"a", $"b").as("c"))
      .as[Option[Double]].collect()
    out(0).get shouldBe 1.0 +- 1e-9
    out(1).get shouldBe 0.0 +- 1e-9
    out(2).get shouldBe -1.0 +- 1e-9
    out(3) shouldBe None
  }

  // clustered corpus: 3 tight clusters of 10 vectors each in 8 dims
  private def clustered = {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(3)(Array.fill(8)(rnd.nextGaussian()))
    val rows = for (c <- centers.indices; i <- 0 until 10) yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      ((c * 10 + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("bruteForceTopK: neighbors of a clustered point are its own cluster") {
    val corpus = clustered
    val queries = corpus.filter($"vec_id" === 0L)
    val nn = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 9)
      .select("neighbor_id").as[Long].collect().toSet
    nn shouldBe (1L to 9L).toSet // the rest of cluster 0
  }

  test("bruteForceTopK: ranks are dense 1..k ordered by cosine desc") {
    val corpus = clustered
    val queries = corpus.filter($"vec_id" < 2L)
    val out = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 5)
      .select("query_id", "rank", "cos").as[(Long, Int, Double)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      rows.map(_._2).sorted shouldBe (1 to 5).toArray
      val byRank = rows.sortBy(_._2).map(_._3)
      byRank.zip(byRank.tail).foreach { case (hi, lo) => hi should be >= lo }
    }
  }

  test("lshTopK recall ≥ 0.8 vs exact baseline on the clustered corpus") {
    val corpus = clustered
    val queries = corpus.filter($"vec_id" % 10 === 0L) // one per cluster
    val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(queries, corpus, "vec_id", "embedding",
        dim = 8, k = 5, nbits = 8, probes = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    recall should be >= 0.8
  }

  test("ivfTopK recall ≥ 0.8 vs exact baseline (adaptive cells beat oblivious planes)") {
    val corpus = clustered
    val queries = corpus.filter($"vec_id" % 10 === 0L)
    val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
        k = 5, nlist = 6, nprobe = 2, sampleSize = 30)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    recall should be >= 0.8
  }

  test("ivfTopK with k-means|| training: recall ≥ 0.8 at 100 clusters, deterministic") {
    // 100-copy-scale corpus: 100 tight clusters × 30 vectors in 16 dims —
    // the regime where a fixed driver sample starts missing clusters but
    // full-corpus k-means|| training must not
    val rnd = new scala.util.Random(11)
    val centers = Seq.fill(100)(Array.fill(16)(rnd.nextGaussian()))
    val rows = for (c <- centers.indices; i <- 0 until 30) yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      ((c * 30 + i).toLong, v.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 300 === 0L) // one per 10th cluster
    val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def run() = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
        k = 5, nlist = 32, nprobe = 8, iters = 4, distributedTrain = true)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = run()
    val recall = (exact intersect approx).size.toDouble / exact.size
    recall should be >= 0.8 // the documented bound (SCALE.md)
    // fixed seed + fixed partitioning → reproducible result set
    run() shouldBe approx
  }

  test("kMeansParallel: nlist unit-norm centroids from executor-side aggregates") {
    val rnd = new scala.util.Random(3)
    val data = Seq.fill(400)(Array.fill(8)(rnd.nextGaussian()))
    val vecs = spark.sparkContext.parallelize(data, 4)
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      }.cache()
    val cents = Similarity.kMeansParallel(vecs, nlist = 8, iters = 3, seed = 5L)
    cents.length shouldBe 8
    cents.foreach { c =>
      math.sqrt(c.map(x => x * x).sum) shouldBe 1.0 +- 1e-9
    }
    vecs.unpersist(blocking = false)
  }

  test("lshTopK: ranks are gap-free and neighbors unique per query") {
    val corpus = clustered
    val queries = corpus.filter($"vec_id" < 3L)
    val out = Similarity.lshTopK(queries, corpus, "vec_id", "embedding",
        dim = 8, k = 5, nbits = 8, probes = 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      rows.map(_._3).sorted shouldBe (1 to rows.length).toArray // dense ranks
      rows.map(_._2).distinct.length shouldBe rows.length       // unique neighbors
    }
  }

  test("cosineNearDupPairs finds planted high-cosine pairs") {
    val rnd = new scala.util.Random(11)
    val v = Array.fill(8)(rnd.nextGaussian().toFloat)
    val vDup = v.map(x => x * 1.001f) // cosine ~1
    val other = Array.fill(8)(rnd.nextGaussian().toFloat)
    val df = Seq((1L, v.toSeq), (2L, vDup.toSeq), (3L, other.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
        dim = 8, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    pairs shouldBe Array((1L, 2L))
  }

  test("banded cosineNearDupPairs: recall on the clustered corpus matches brute force") {
    // 16 bands × 6 bits: a ≥0.9-cosine pair misses all bands w.p. < 1e-5 —
    // on this seeded corpus recall is exactly total (asserted, not assumed)
    val corpus = clustered
    val exact = Similarity.allPairsCosine(
        corpus.select($"vec_id", $"embedding".cast("array<double>").as("v")),
        "vec_id", "v", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding",
        dim = 8, threshold = 0.9, nbits = 6, bands = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    exact should not be empty
    lsh shouldBe exact
  }

  test("native RHP signatures = the reference UDF forms, bit for bit") {
    import org.apache.spark.sql.functions.udf
    val planes = Similarity.hyperplanes(8, 12, 42L)
    val refSig = udf { v: Seq[Float] =>
      if (v == null) null.asInstanceOf[java.lang.Long]
      else {
        var sig = 0L
        var j = 0
        while (j < planes.length) {
          val p = planes(j)
          var dot = 0.0f
          var i = 0
          val n = math.min(p.length, v.length)
          while (i < n) { dot += p(i) * v(i); i += 1 }
          if (dot >= 0) sig |= (1L << j)
          j += 1
        }
        java.lang.Long.valueOf(sig)
      }
    }
    val bandPlanes = Array.tabulate(4)(b => Similarity.hyperplanes(8, 6, 42L + b))
    val refBands = udf { v: Seq[Double] =>
      if (v == null) null
      else bandPlanes.map { ps =>
        var sig = 0L
        var j = 0
        while (j < ps.length) {
          val p = ps(j)
          var dot = 0.0
          var i = 0
          val n = math.min(p.length, v.length)
          while (i < n) { dot += p(i) * v(i); i += 1 }
          if (dot >= 0) sig |= (1L << j)
          j += 1
        }
        sig
      }.toSeq
    }
    val out = clustered.select(
        newspipe.functions.Rhp.signature($"embedding", planes).as("nSig"),
        refSig($"embedding").as("rSig"),
        newspipe.functions.Rhp.bandSignatures($"embedding", bandPlanes).as("nBands"),
        refBands($"embedding".cast("array<double>")).as("rBands"))
      .as[(Long, Long, Seq[Long], Seq[Long])].collect()
    out.length shouldBe 30
    out.foreach { case (n, r, nb, rb) => n shouldBe r; nb shouldBe rb }
  }

  test("knnJoin recall ≥ 0.8 vs per-query brute force on the clustered corpus") {
    val corpus = clustered
    val exact = Similarity.bruteForceTopK(corpus, corpus, "vec_id", "embedding",
        k = 9).filter($"neighbor_id" =!= $"query_id")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.knnJoin(corpus, "vec_id", "embedding", dim = 8,
        k = 9, nbits = 4, probes = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    recall should be >= 0.8
  }

  test("knnJoin: ranks are dense, neighbors unique, self excluded") {
    val out = Similarity.knnJoin(clustered, "vec_id", "embedding", dim = 8,
        k = 5, nbits = 4, probes = 4)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    out.foreach { case (q, n, _) => q should not be n }
    out.groupBy(_._1).foreach { case (_, rows) =>
      rows.map(_._3).sorted shouldBe (1 to rows.length).toArray
      rows.map(_._2).distinct.length shouldBe rows.length
    }
  }

  test("dedupAgainstByEmbedding scrubs planted reference twins, keeps the rest") {
    val corpus = clustered // clusters 0/1/2, ids 0..29
    // reference = cluster 0's first 5 vectors re-keyed: corpus rows 0..4
    // are verbatim twins of the reference (cos 1.0); rows 5..9 are same-
    // cluster neighbors (cos ≈ 0.999 — also above a 0.99 threshold); the
    // other clusters are far away
    val reference = corpus.filter($"vec_id" < 5L)
      .select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
    val kept = Similarity.dedupAgainstByEmbedding(corpus, reference,
        "vec_id", "embedding", dim = 8, threshold = 0.9999)
      .select("vec_id").as[Long].collect().toSet
    kept should not contain 0L // exact twin of a reference row
    (10L to 29L).foreach(id => kept should contain(id)) // other clusters survive
  }

  test("dedupAgainstByEmbedding: empty reference removes nothing; hot-bucket cap disables near stage") {
    val corpus = clustered
    val none = corpus.filter($"vec_id" < 0L)
    Similarity.dedupAgainstByEmbedding(corpus, none, "vec_id", "embedding",
      dim = 8).count() shouldBe 30L
    // 50 identical reference rows share one bucket; cap 10 drops it → no
    // candidates → nothing removed even though cosines are 1.0
    val hot = (1L to 50L).map(i => (i + 1000L,
      corpus.filter($"vec_id" === 0L).select("embedding")
        .as[Seq[Float]].head())).toDF("vec_id", "embedding")
    Similarity.dedupAgainstByEmbedding(corpus, hot, "vec_id", "embedding",
      dim = 8, maxBucket = 10).count() shouldBe 30L
  }

  test("knnJoin: hot buckets are capped (skew guard)") {
    // 50 identical vectors share one signature bucket; maxBucket=10 drops
    // it before any of the 50×49 candidate pairs exists
    val v = Seq.fill(8)(0.5f)
    val many = (1L to 50L).map(i => (i, v)).toDF("vec_id", "embedding")
    Similarity.knnJoin(many, "vec_id", "embedding", dim = 8, k = 3,
      maxBucket = 10).count() shouldBe 0L
  }

  test("semanticDedup keeps the min id of each exact-duplicate group") {
    val a = Seq(1.0, 0.0, 0.0, 0.0)
    val b = Seq(0.0, 1.0, 0.0, 0.0)
    val c = Seq(0.0, 0.0, 1.0, 0.0)
    val df = Seq(1L -> a, 2L -> a, 3L -> a, 10L -> b, 11L -> b, 20L -> c)
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding", dim = 4)
      .select("vec_id").as[Long].collect().sorted
    kept shouldBe Array(1L, 10L, 20L)
  }

  test("semanticDedup collapses transitive chains the endpoints never pair on") {
    // u0–u1 and u1–u2 are 15° apart (cos ≈ 0.966 ≥ 0.95) but u0–u2 is 30°
    // (cos ≈ 0.866 < 0.95): only connected components can merge all three
    def at(deg: Double) = {
      val r = math.toRadians(deg); Seq(math.cos(r), math.sin(r))
    }
    val df = Seq(1L -> at(0), 2L -> at(15), 3L -> at(30), 9L -> at(120))
      .toDF("vec_id", "embedding")
    // nbits=1/bands=16: per-band collision for a 15° pair is 1 − 15/180,
    // so the chance any adjacent pair misses all 16 bands is ~2e-18
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding", dim = 2,
        threshold = 0.95, nbits = 1, bands = 16)
      .select("vec_id").as[Long].collect().sorted
    kept shouldBe Array(1L, 9L)
  }
}
