package newspipe.ops

import newspipe.SparkTestBase

/** §7 extension: deterministic content-addressed sampling — stability,
  * independence across salts, and disjoint splits.
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def ids = (1L to 2000L).toDF("id")

  test("hashSample is deterministic and roughly proportional") {
    val a = Sampling.hashSample(ids, "id", 0.25, "s1").as[Long].collect().toSet
    val b = Sampling.hashSample(ids, "id", 0.25, "s1").as[Long].collect().toSet
    a shouldBe b // pure function of the data, not of rand()/partitioning
    a.size.toDouble shouldBe (500.0 +- 100.0) // ~binomial around 25%
  }

  test("different salts draw (near-)independent samples") {
    val a = Sampling.hashSample(ids, "id", 0.5, "s1").as[Long].collect().toSet
    val b = Sampling.hashSample(ids, "id", 0.5, "s2").as[Long].collect().toSet
    a should not be b
    val overlap = (a intersect b).size.toDouble
    overlap shouldBe (a.size * 0.5 +- a.size * 0.2) // ≈ independent draws
  }

  test("a sample is a subset of a larger-fraction sample (same salt): nested splits") {
    val small = Sampling.hashSample(ids, "id", 0.1, "s").as[Long].collect().toSet
    val large = Sampling.hashSample(ids, "id", 0.4, "s").as[Long].collect().toSet
    small.subsetOf(large) shouldBe true // buckets nest — growing a sample keeps it
  }

  test("hashSplit partitions the data disjointly and completely") {
    val Seq(train, valid, test) =
      Sampling.hashSplit(ids, "id", Seq(0.8, 0.1, 0.1), "sp")
    val t = train.as[Long].collect().toSet
    val v = valid.as[Long].collect().toSet
    val te = test.as[Long].collect().toSet
    (t intersect v) shouldBe empty
    (t intersect te) shouldBe empty
    (v intersect te) shouldBe empty
    (t ++ v ++ te).size shouldBe 2000 // fractions sum to 1 ⇒ full coverage
  }

  test("mixture blends sources at their own rates, deterministically tagged") {
    val big = (1L to 1000L).toDF("id")
    val small = (5000L to 5499L).toDF("id")
    val mix = Sampling.mixture(
      Seq(("web", big, 0.2), ("books", small, 0.8)), "id", salt = "m1")
    val counts = mix.groupBy("mixture_source").count()
      .as[(String, Long)].collect().toMap
    counts("web").toDouble shouldBe (200.0 +- 60.0)
    counts("books").toDouble shouldBe (400.0 +- 60.0)
    // pure function of the data: a second evaluation is identical
    mix.as[(Long, String)].collect().toSet shouldBe
      Sampling.mixture(Seq(("web", big, 0.2), ("books", small, 0.8)),
        "id", salt = "m1").as[(Long, String)].collect().toSet
  }

  test("invalid fractions are rejected") {
    intercept[IllegalArgumentException](Sampling.hashSample(ids, "id", 1.5))
    intercept[IllegalArgumentException](
      Sampling.hashSplit(ids, "id", Seq(0.8, 0.4)))
  }

  // independent JVM-side replay of hashBucket: first 32 bits of md5(s)
  private def bucketOf(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  test("stratifiedSample: membership = md5(salt\\0stratum\\0key) per-stratum draw") {
    val rows = (for (i <- 1L to 600L)
      yield (i, Seq("web", "books", "code")((i % 3).toInt))).toDF("id", "src")
    val rates = Map("web" -> 0.5, "books" -> 0.1)
    val got = Sampling.stratifiedSample(rows, "id", "src", rates,
      defaultRate = 0.9, salt = "st").as[(Long, String)].collect().toSet
    val want = (for (i <- 1L to 600L) yield {
      val src = Seq("web", "books", "code")((i % 3).toInt)
      val rate = rates.getOrElse(src, 0.9)
      (i, src, bucketOf("st\u0000" + src + "\u0000" + i) < (rate * 4294967296.0).toLong)
    }).collect { case (i, s, true) => (i, s) }.toSet
    got shouldBe want // exact membership, replayed independently
  }

  test("stratifiedSample excludes null-stratum and null-key rows") {
    val rows = Seq((Some(1L), Some("a")), (None, Some("a")), (Some(2L), None))
      .toDF("id", "src")
    val out = Sampling.stratifiedSample(rows, "id", "src",
      Map("a" -> 1.0), defaultRate = 1.0)
    out.count() shouldBe 1L // only the fully-keyed row, despite rate 1.0
  }

  test("packBins: exact greedy packing, replayed from the hash order") {
    val rnd = new scala.util.Random(11)
    val rows = (for (i <- 1L to 300L)
      yield (i, Seq("a", "b", "c")((i % 3).toInt), 10L + rnd.nextInt(90)))
      .toDF("id", "grp", "w")
    val got = Sampling.packBins(rows, "id", "w", budget = 200L,
        partitionCols = Seq("grp"), salt = "bp")
      .select("id", "bin").as[(Long, Long)].collect().toMap
    val data = rows.as[(Long, String, Long)].collect()
    val want = data.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      var cum = 0L
      g.sortBy { case (id, _, _) => (bucketOf(s"bp$id"), id) }.toSeq.map {
        case (id, _, w) =>
          val bin = cum / 200L // start offset over budget
          cum += w
          id -> bin
      }
    }.toMap
    got shouldBe want
  }

  test("packBins: an oversized row gets its own bin; later rows shift, none drop") {
    // weights 500,50,50 against budget 100 in hash order — whatever the
    // order, the 500-row occupies [s, s+500) alone: no other row's start
    // can fall inside it (starts are cumulative), and everything ships
    val rows = Seq((1L, 500L), (2L, 50L), (3L, 50L)).toDF("id", "w")
    val out = Sampling.packBins(rows, "id", "w", budget = 100L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    out.keySet shouldBe Set(1L, 2L, 3L)
    out.values.count(_ == out(1L)) shouldBe 1 // nobody shares the big row's bin
  }

  test("packBins excludes null-weight and null-key rows") {
    val rows = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(3L), None))
      .toDF("id", "w")
    Sampling.packBins(rows, "id", "w", budget = 100L).count() shouldBe 1L
  }

  test("topFractionByGroup keeps exactly ceil(n·fraction) per group, highest first") {
    val rows = (for (i <- 1L to 100L)
      yield (i, if (i <= 10) "small" else "big", i)).toDF("id", "grp", "score")
    val out = Sampling.topFractionByGroup(rows, "grp", "score", 0.3, "id")
      .as[(Long, String, Long)].collect()
    val byGrp = out.groupBy(_._2)
    byGrp("small").map(_._1).toSet shouldBe (8L to 10L).toSet   // ceil(10·0.3)=3
    byGrp("big").map(_._1).toSet shouldBe (74L to 100L).toSet   // ceil(90·0.3)=27
  }

  test("topFractionByGroupApprox tracks the exact gate within sketch error") {
    val rnd = new scala.util.Random(13)
    val rows = (for (i <- 1L to 2000L)
      yield (i, Seq("a", "b")((i % 2).toInt), rnd.nextInt(100000).toLong))
      .toDF("id", "grp", "score")
    val exact = Sampling.topFractionByGroup(rows, "grp", "score", 0.25, "id")
      .select("id").as[Long].collect().toSet
    val approx = Sampling.topFractionByGroupApprox(rows, "grp", "score", 0.25,
        relativeError = 0.01).select("id").as[Long].collect().toSet
    // per-group n = 1000, ε = 0.01 ⇒ the kept-count drift is bounded by
    // ~ε·n per group; allow 3ε·n slack across both groups
    math.abs(approx.size - exact.size) should be <= 60
    // the approximate gate must agree with the exact one away from the
    // threshold: the exact top 20% (well inside 25% − ε) is all kept
    val core = Sampling.topFractionByGroup(rows, "grp", "score", 0.20, "id")
      .select("id").as[Long].collect().toSet
    (core -- approx) shouldBe empty
  }

  test("topFractionByGroupApprox boundaries and null scores") {
    val rows = Seq((1L, "g", Some(5L)), (2L, "g", Some(7L)), (3L, "g", None))
      .toDF("id", "grp", "score")
    Sampling.topFractionByGroupApprox(rows, "grp", "score", 0.0).count() shouldBe 0L
    // null scores never pass the threshold comparison
    Sampling.topFractionByGroupApprox(rows, "grp", "score", 1.0)
      .select("id").as[Long].collect().toSet shouldBe Set(1L, 2L)
  }

  test("topFractionByGroup boundaries: fraction 0 keeps nothing, 1 keeps all; ties deterministic") {
    val rows = Seq((1L, "g", 5L), (2L, "g", 5L), (3L, "g", 5L)).toDF("id", "grp", "score")
    Sampling.topFractionByGroup(rows, "grp", "score", 0.0, "id").count() shouldBe 0L
    Sampling.topFractionByGroup(rows, "grp", "score", 1.0, "id").count() shouldBe 3L
    // all-tied scores: the tie column decides — lowest ids survive
    Sampling.topFractionByGroup(rows, "grp", "score", 0.5, "id")
      .select("id").as[Long].collect().toSet shouldBe Set(1L, 2L)
  }

  test("qualityBins: ANSI ntile per group on a deterministic order") {
    val rows = (1L to 10L).map(i => (i, "g", i * 10L)).toDF("id", "grp", "score")
    val bins = Sampling.qualityBins(rows, "grp", "score", numBins = 4, tieCol = "id")
      .select("id", "bin").as[(Long, Long)].collect().toMap
    // order: score desc → ids 10..1; ntile(4) over 10 rows = sizes 3,3,2,2
    bins(10L) shouldBe 1L; bins(9L) shouldBe 1L; bins(8L) shouldBe 1L
    bins(7L) shouldBe 2L; bins(6L) shouldBe 2L; bins(5L) shouldBe 2L
    bins(4L) shouldBe 3L; bins(3L) shouldBe 3L
    bins(2L) shouldBe 4L; bins(1L) shouldBe 4L
  }

  test("resampleToBudget: targeted groups hit ~budget, over-budgeted and untargeted kept whole") {
    val rows = (1L to 3000L).map(i =>
      (i, Seq("a", "b", "c")((i % 3).toInt), 10L)).toDF("id", "grp", "w")
    // group totals are 10000 each; a=2000 (rate .2), b=50000 (rate clamps
    // to 1), c untargeted (kept whole)
    val out = Sampling.resampleToBudget(rows, "id", "w", "grp",
        budgets = Map("a" -> 2000L, "b" -> 50000L), salt = "rb")
      .select("id", "grp").as[(Long, String)].collect()
    val byGrp = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    byGrp("b") shouldBe 1000L
    byGrp("c") shouldBe 1000L
    // kept weight of a ≈ budget: 200 rows ± sampling noise
    byGrp("a").toDouble shouldBe 200.0 +- 60.0
    // deterministic: second run identical
    Sampling.resampleToBudget(rows, "id", "w", "grp",
        budgets = Map("a" -> 2000L, "b" -> 50000L), salt = "rb")
      .select("id").as[Long].collect().sorted shouldBe
      out.map(_._1).sorted
  }

  test("resampleToBudget: zero budget empties the group; nulls excluded") {
    val rows = Seq((Some(1L), Some("a"), Some(10L)), (Some(2L), Some("a"), Some(10L)),
      (Some(3L), Some("b"), Some(10L)), (None, Some("a"), Some(10L)),
      (Some(5L), None, Some(10L)), (Some(6L), Some("a"), None))
      .toDF("id", "grp", "w")
    val kept = Sampling.resampleToBudget(rows, "id", "w", "grp",
        budgets = Map("a" -> 0L), salt = "z")
      .select("id").as[Long].collect().toSet
    kept shouldBe Set(3L) // group a zeroed out, b untargeted, null rows gone
  }

  test("takePerGroup: first n of each group in (hash, key) order; null keys excluded") {
    val rows = (1L to 90L).map(i => (i, Seq("a", "b", "c")((i % 3).toInt)))
      .toDF("id", "grp")
      .unionByName(Seq((Option.empty[Long], Option("a"))).toDF("id", "grp"))
    val got = Sampling.takePerGroup(rows, "grp", "id", n = 5, salt = "tk")
      .select("id", "grp", "pos").as[(Long, String, Long)].collect()
    got.length shouldBe 15
    val byGrp = got.groupBy(_._2)
    byGrp.keySet shouldBe Set("a", "b", "c")
    val data = (1L to 90L).map(i => (i, Seq("a", "b", "c")((i % 3).toInt)))
    byGrp.foreach { case (g, rs) =>
      val want = data.filter(_._2 == g)
        .sortBy { case (id, _) => (bucketOf(s"tk$id"), id) }.take(5).map(_._1)
      rs.sortBy(_._3).map(_._1).toSeq shouldBe want
      rs.map(_._3).sorted.toSeq shouldBe Seq(1L, 2L, 3L, 4L, 5L)
    }
  }

  test("takePerGroup: n past the group size keeps the whole group") {
    val rows = Seq((1L, "g"), (2L, "g")).toDF("id", "grp")
    Sampling.takePerGroup(rows, "grp", "id", n = 10).count() shouldBe 2L
  }

  test("packSequences: one row per bin, texts joined in pack order, weights summed") {
    val rows = Seq(
      (1L, "g", "one", 60L), (2L, "g", "two", 60L),
      (3L, "g", "three", 60L), (4L, "g", "four", 60L))
      .toDF("id", "grp", "txt", "w")
    val out = Sampling.packSequences(rows, "id", "txt", "w", budget = 100L,
        partitionCols = Seq("grp"), salt = "ps")
      .select("bin", "n_docs", "total_weight", "packed_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // replay: hash order, starts 0,60,120,180 → bins 0,0,1,1
    val order = Seq(1L, 2L, 3L, 4L)
      .sortBy(id => (bucketOf(s"ps$id"), id))
    val txt = Map(1L -> "one", 2L -> "two", 3L -> "three", 4L -> "four")
    out.length shouldBe 2
    out.map(_._2).toSeq shouldBe Seq(2L, 2L)
    out.map(_._3).toSeq shouldBe Seq(120L, 120L)
    out(0)._4 shouldBe order.take(2).map(txt).mkString(" ")
    out(1)._4 shouldBe order.drop(2).map(txt).mkString(" ")
  }
}
