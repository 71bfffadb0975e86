package newspipe.ops

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._

/** §7 extension: dedup operators — exact, MinHash-LSH recall on planted
  * near-dups, Jaccard verification, SimHash banding.
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the deep green forest tonight"
  private val nearDup = base.replace("tonight", "today") // ~0.9 shingle Jaccard
  private val unrelated = "completely different text about spark query engines and distributed columnar execution at scale"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated),
    (4L, base), // exact dup of 1
    (5L, "short doc"), (6L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("exact keeps the min-id row per identical content") {
    val kept = Dedup.exact(docs, "doc_id", Seq("text"))
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(1L, 2L, 3L, 5L, 6L) // 4 dropped (dup of 1)
  }

  test("exactGroups reports group sizes") {
    val g = Dedup.exactGroups(docs, "doc_id", Seq("text"))
    g.filter($"group_size" === 2).select("keeper_id").as[Long].head() shouldBe 1L
    g.count() shouldBe 5 // 5 distinct contents (null+empty digest counts once)
  }

  test("lshParams picks the divisor pair whose S-curve inflection is nearest the threshold") {
    // brute-force the optimum over divisors of 64 and compare
    def inflection(b: Int, r: Int) = math.pow(1.0 / b, 1.0 / r)
    for (t <- Seq(0.5, 0.7, 0.8, 0.9, 0.95)) {
      val (b, r) = Dedup.lshParams(t, 64)
      b * r shouldBe 64
      val best = (1 to 64).filter(64 % _ == 0)
        .map(bb => math.abs(inflection(bb, 64 / bb) - t)).min
      math.abs(inflection(b, r) - t) shouldBe best +- 1e-12
    }
    // the operator default (16 bands of 4) corresponds to a mid-0.3s
    // inflection — intentionally recall-heavy for 0.8-threshold verify
    an[IllegalArgumentException] should be thrownBy Dedup.lshParams(0.0)
    an[IllegalArgumentException] should be thrownBy Dedup.lshParams(1.0)
  }

  test("minhash candidates find the planted near-dup and exact-dup pairs") {
    val cand = Dedup.minhashCandidates(docs.filter($"text".isNotNull), "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    cand should contain((1L, 4L)) // exact dup: identical signatures
    cand should contain((1L, 2L)) // near dup: most bands agree
    cand should not contain ((1L, 3L)) // unrelated
  }

  test("jaccardVerify computes exact n-gram Jaccard and filters by threshold") {
    val cand = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val verified = Dedup.jaccardVerify(cand, docs, "doc_id", "text", threshold = 0.5)
    val m = verified.as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    m((1L, 4L)) shouldBe 1.0 // identical
    m((1L, 2L)) should (be >= 0.5 and be < 1.0)
    m.get((1L, 3L)) shouldBe None // filtered: below threshold
  }

  test("minhashDedup removes near-dup losers, keeps min ids") {
    val kept = Dedup.minhashDedup(docs.filter($"text".isNotNull), "doc_id", "text",
      threshold = 0.8).select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(1L, 3L, 5L) // 2 and 4 are near/exact dups of 1
  }

  test("connectedComponents: transitive closure with min-id labels") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 5L), (9L, 9L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    comps(1L) shouldBe 1L
    comps(2L) shouldBe 1L
    comps(3L) shouldBe 1L // chained: 3 reaches 1 through 2
    comps(5L) shouldBe 5L
    comps(7L) shouldBe 5L
    comps(9L) shouldBe 9L
  }

  test("connectedComponents converges on a long chain") {
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(chain).as[(Long, Long)].collect()
    comps.map(_._2).distinct shouldBe Array(1L)
  }

  test("connectedComponents: a dominant component holding half the corpus converges") {
    // caterpillar: 8 hubs chained, each with 150 spokes — 1208 nodes in ONE
    // component (diameter 9, so pointer doubling needs real rounds beyond
    // the folded-in first aggregate) — plus 604 isolated pairs (1208
    // nodes): the dominant component is exactly 50% of the corpus, the
    // viral-doc shape the Scaladoc's skew posture describes.
    val chain = (0L until 7L).map(h => (h * 1000L, (h + 1) * 1000L))
    val spokes = for { h <- 0L until 8L; s <- 1L to 150L }
      yield (h * 1000L, h * 1000L + s)
    val pairs = (0 until 604).map(i => (100000L + 2 * i, 100001L + 2 * i))
    val edges = (chain ++ spokes ++ pairs).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(edges).as[(Long, Long)].collect()
    comps.length shouldBe 2416
    val big = comps.filter(_._1 < 100000L)
    big.length shouldBe 1208
    all(big.map(_._2)) shouldBe 0L // every caterpillar node reaches min id 0
    // isolated pairs untouched by the dominant component: even member wins
    comps.filter(_._1 >= 100000L).foreach { case (id, comp) =>
      comp shouldBe (id - id % 2)
    }
  }

  test("CC message join: AQE skew split re-chunks a hot src key (pinned, not assumed)") {
    // The Scaladoc at Dedup.connectedComponents claims AQE's skew-join
    // split covers a hot hub's message join. Pin it: reproduce the exact
    // join shape (edges.src ⋈ labels.id) with one key owning ~all edges,
    // force SMJ, and assert the ADAPTIVE executed plan marked the join
    // skew-handled rather than leaving one straggler partition.
    val keep = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // hub 0 near-dups 60k docs; a handful of cold keys for a median.
      // BOTH sides localCheckpointed — the shape connectedComponents
      // actually produces (edges once, labels every round), and a
      // REQUIREMENT for the skew split: OptimizeSkewedJoin matches only
      // a shuffle directly under the join's Sort, so an un-checkpointed
      // aggregate between Sort and Exchange disables it entirely
      val edges = ((1L to 60000L).map(d => (0L, d)) ++
        (1L to 8L).map(i => (i * 1000000L, i * 1000000L + 1)))
        .toDF("src", "dst").localCheckpoint(true)
      val labels = edges.select($"src".as("id")).distinct()
        .select($"id", $"id".as("comp")).localCheckpoint(true)
      val msgs = edges.join(labels, edges("src") === labels("id"))
        .select($"dst".as("id"), $"comp")
      msgs.collect().length shouldBe 60008
      val plan = msgs.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not skew-split the hot message join; executed plan:\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("minhashDedupClustered keeps one doc per transitive dup group") {
    val kept = Dedup.minhashDedupClustered(docs.filter($"text".isNotNull),
      "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(1L, 3L, 5L) // {1,2,4} collapse to 1
  }

  test("minhashDedupClusteredBy keeps the best-scoring doc per cluster") {
    // cluster {1,2,4}: give doc 2 the top score — it must win over min-id 1
    val scored = docs.filter($"text".isNotNull)
      .withColumn("score", when($"doc_id" === 2, 100L).otherwise($"doc_id"))
    val kept = Dedup.minhashDedupClusteredBy(scored, "doc_id", "text",
      "score", threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(2L, 3L, 5L)
    // all-tied scores: min id wins — identical to minhashDedupClustered
    val tied = docs.filter($"text".isNotNull).withColumn("score", lit(7L))
    Dedup.minhashDedupClusteredBy(tied, "doc_id", "text", "score",
        threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 3L, 5L)
  }

  test("minhashDedupClusteredBy: NULL scores never beat a real score; all-NULL falls back to min id") {
    // cluster {1,2,4}: doc 2 has NULL score, doc 4 the top real score —
    // 4 must win (a bare min(struct(-score,…)) would crown the NULL)
    val withNull = docs.filter($"text".isNotNull)
      .withColumn("score", when($"doc_id" === 2, lit(null).cast("long"))
        .otherwise(when($"doc_id" === 4, 100L).otherwise($"doc_id")))
    Dedup.minhashDedupClusteredBy(withNull, "doc_id", "text", "score",
        threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(3L, 4L, 5L)
    // every score NULL: keeper degrades to the min-id policy
    val allNull = docs.filter($"text".isNotNull)
      .withColumn("score", lit(null).cast("double"))
    Dedup.minhashDedupClusteredBy(allNull, "doc_id", "text", "score",
        threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 3L, 5L)
    // Long extremes survive the double rank (no unary-minus overflow)
    val extreme = docs.filter($"text".isNotNull)
      .withColumn("score", when($"doc_id" === 4, Long.MinValue)
        .otherwise(lit(0L)))
    Dedup.minhashDedupClusteredBy(extreme, "doc_id", "text", "score",
        threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 3L, 5L)
    // non-numeric score column is rejected loudly, not silently misordered
    an[IllegalArgumentException] should be thrownBy
      Dedup.minhashDedupClusteredBy(
        docs.filter($"text".isNotNull), "doc_id", "text", "text")
  }

  test("simhash: identical docs share signatures; near-dups within hamming 3") {
    val pairs = Dedup.simhashCandidates(docs.filter($"text".isNotNull), "doc_id", "text")
      .as[(Long, Long, Int)].collect()
    val m = pairs.map { case (a, b, h) => (a, b) -> h }.toMap
    m((1L, 4L)) shouldBe 0 // identical text → same 64-bit signature
    m.get((1L, 3L)) shouldBe None // unrelated text far in hamming space
  }

  test("shingles of a doc shorter than n words fall back to the whole token string") {
    val sh = Seq((1L, "two words")).toDF("id", "t")
      .select(Dedup.shingles($"t", 3).as("s")).as[Seq[String]].head()
    sh shouldBe Seq("two words")
  }

  test("null-text docs get the zero signature instead of crashing minhash") {
    // no isNotNull pre-filter: doc 6 (null text) must flow through candidate
    // generation and dedup unharmed (it can never near-dup a real doc)
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    cand should contain((1L, 4L))
    cand.flatMap(p => Set(p._1, p._2)) should not contain 6L
    val kept = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(1L, 3L, 5L, 6L)
  }

  test("null-text docs don't crash simhash candidates") {
    val pairs = Dedup.simhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long, Int)].collect()
    pairs.map { case (a, b, h) => (a, b) -> h }.toMap.apply((1L, 4L)) shouldBe 0
  }

  test("simhash join-form candidates = brute-force hamming pairs on a seeded corpus") {
    // pigeonhole: hamming ≤ 3 on a 4×16-bit banding ⇒ some chunk matches, so
    // the complete oracle is ALL pairs within hamming 3 of each other
    val rnd = new scala.util.Random(13)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val corpus = (1L to 40L).map { i =>
      if (i % 4 == 0) (i, base + " tail" + (i % 3)) // planted near-dup clusters
      else (i, Seq.fill(14)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val fast = Dedup.simhashCandidates(corpus, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sigs = corpus.select($"doc_id", Dedup.simhash($"text"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    brute should not be empty
    fast shouldBe brute
  }

  test("minhash join-form candidates = pairs sharing ≥1 LSH bucket (independent pairing)") {
    val corpus = docs.filter($"text".isNotNull)
    val fast = Dedup.minhashCandidates(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    // reference path: same signature/banding expressions, pairing done
    // driver-side over the collected (band, bucket) assignments
    val banded = corpus
      .select(col("doc_id").as("id"), Dedup.tokens(col("text")).as("tk"))
      .select(col("id"), Dedup.shinglesFromTokens(col("tk")).as("sh"))
      .select(col("id"), Dedup.minhashSignature(col("sh")).as("sig"))
      .select(col("id"), explode(Dedup.lshBands(col("sig"), 16, 4)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
      .as[(Long, Int, Long)].collect()
    val brute = banded.groupBy(r => (r._2, r._3)).values.flatMap { grp =>
      val ids = grp.map(_._1).distinct.sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.toSet
    brute should not be empty
    fast shouldBe brute
  }

  test("minhash candidate generation caps degenerate buckets (skew guard)") {
    // 50 identical docs: one bucket of 50 → pairs capped out by maxBucket=10;
    // with maxBucket high enough we'd get 50*49/2 pairs — the guard drops them
    val many = (1L to 50L).map(i => (i, base)).toDF("doc_id", "text")
    val capped = Dedup.minhashCandidates(many, "doc_id", "text", maxBucket = 10)
    capped.count() shouldBe 0
  }

  test("native minhash signature = the reference UDF form, bit for bit") {
    import org.apache.spark.sql.functions.udf
    // the Scala-UDF form the codegen Expression replaced, kept as the
    // semantic reference (same double-hashing math over boxed Seqs)
    val refUdf = udf { shingles: Seq[String] =>
      if (shingles == null) null
      else {
        val sig = Array.fill(64)(Long.MaxValue)
        shingles.foreach { s =>
          if (s != null) {
            val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
            val h1 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(u, 0L)
            val h2 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(u, 1L) | 1L
            var h = h1
            var i = 0
            while (i < 64) { if (h < sig(i)) sig(i) = h; h += h2; i += 1 }
          }
        }
        sig.toSeq
      }
    }
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val out = sh.select(
        Dedup.minhashSignature(col("sh"), 64).as("native"), refUdf(col("sh")).as("ref"))
      .as[(Option[Seq[Long]], Option[Seq[Long]])].collect()
    out.length shouldBe 6
    out.foreach { case (n, r) => n shouldBe r }
  }

  test("native simhash = the reference UDF form, bit for bit (incl. zero signature)") {
    import org.apache.spark.sql.functions.udf
    val refUdf = udf { toks: Seq[String] =>
      if (toks == null || toks.isEmpty) 0L
      else {
        val counts = new Array[Int](64)
        toks.foreach { t =>
          if (t != null) {
            val h = (scala.util.hashing.MurmurHash3.stringHash(t, 0).toLong << 32) |
              (scala.util.hashing.MurmurHash3.stringHash(t, 1).toLong & 0xffffffffL)
            var i = 0
            while (i < 64) {
              if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
              i += 1
            }
          }
        }
        var sig = 0L
        var i = 0
        while (i < 64) { if (counts(i) > 0) sig |= (1L << i); i += 1 }
        sig
      }
    }
    val out = docs.select(
        Dedup.simhash(col("text")).as("native"),
        refUdf(Dedup.tokens(col("text"))).as("ref"))
      .as[(Long, Long)].collect()
    out.length shouldBe 6 // includes the null-text doc → both sides 0L
    out.foreach { case (n, r) => n shouldBe r }
  }

  test("spanDedup: shared chunks keep only their first (doc, idx) occurrence") {
    val d = Seq(
      (1L, "a b c d e f"),   // chunks: "a b c", "d e f"
      (2L, "a b c x y z"),   // "a b c" already seen in doc 1 → only "x y z"
      (3L, "d e f"),         // whole doc seen → kept_text empty
      (4L, "p q r p q r"),   // same-doc repeat → second occurrence dropped
      (5L, "")               // no tokens → absent from result
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(d, "doc_id", "text", span = 3)
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, ns, nk, t) => id -> ((ns, nk, t)) }.toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L)
    out(1L) shouldBe ((2L, 2L, "a b c d e f"))
    out(2L) shouldBe ((2L, 1L, "x y z"))
    out(3L) shouldBe ((1L, 0L, ""))
    out(4L) shouldBe ((2L, 1L, "p q r"))
  }

  test("spanDedup: a trailing partial chunk is its own span") {
    val d = Seq((1L, "a b c d")).toDF("doc_id", "text") // span 3 → "a b c", "d"
    val out = Dedup.spanDedup(d, "doc_id", "text", span = 3)
      .as[(Long, Long, Long, String)].head()
    out shouldBe ((1L, 2L, 2L, "a b c d"))
  }

  test("dedupAgainst scrubs exact and near reference dups, keeps the rest") {
    val reference = Seq((100L, base), (101L, "reference only material nothing else")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, base),        // exact dup of ref 100 → dropped at the digest stage
      (2L, nearDup),     // near dup of ref 100 → dropped at the Jaccard stage
      (3L, unrelated),   // kept
      (4L, null.asInstanceOf[String]) // null text: no digest, no shingles → kept
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(corpus, reference, "doc_id", "text",
      threshold = 0.8).select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(3L, 4L)
  }

  test("dedupAgainst: threshold gates the near stage; corpus-internal dups survive") {
    val reference = Seq((100L, unrelated)).toDF("doc_id", "text")
    val corpus = Seq((1L, base), (2L, nearDup), (3L, base)).toDF("doc_id", "text")
    // docs 1/2/3 duplicate EACH OTHER but nothing in the reference — this is
    // not intra-corpus dedup, so all three survive
    Dedup.dedupAgainst(corpus, reference, "doc_id", "text", threshold = 0.8)
      .count() shouldBe 3L
    // threshold 0 would catch any nonzero overlap with the reference; base
    // shares no 3-gram with `unrelated`, so even then everything survives
    Dedup.dedupAgainst(corpus, reference, "doc_id", "text", threshold = 0.01)
      .count() shouldBe 3L
  }

  test("dedupAgainst: hot reference buckets are capped (skew guard)") {
    // 50 identical reference docs bucket together; maxBucket=10 drops the
    // bucket, so the near stage finds nothing — but the EXACT stage still
    // scrubs the identical corpus doc via its digest
    val reference = (100L to 149L).map(i => (i, base)).toDF("doc_id", "text")
    val corpus = Seq((1L, base), (2L, nearDup)).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(corpus, reference, "doc_id", "text",
        threshold = 0.8, maxBucket = 10)
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(2L) // 1 caught exactly; 2's near-dup candidates capped away
  }

  test("bloomScrub equals the exact digest anti-join even at fpp 0.5") {
    val reference = Seq((100L, base), (101L, "ref only text")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, base),                      // exact dup of ref 100 → dropped
      (2L, nearDup),                   // NEAR dup only → exact scrub keeps it
      (3L, unrelated),                 // kept
      (4L, null.asInstanceOf[String])  // null digest: never probed → kept
    ).toDF("doc_id", "text")
    // fpp 0.5 forces Bloom false positives through the probe; the exact
    // semi-join must still strip them, leaving precisely the digest matches
    val kept = Dedup.bloomScrub(corpus, reference, "doc_id", "text",
        expectedItems = 10L, fpp = 0.5)
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(2L, 3L, 4L)
  }

  test("bloomScrub: empty reference removes nothing") {
    val corpus = Seq((1L, base), (2L, nearDup)).toDF("doc_id", "text")
    Dedup.bloomScrub(corpus, corpus.filter($"doc_id" < 0L), "doc_id", "text",
      expectedItems = 10L).count() shouldBe 2L
  }
}
