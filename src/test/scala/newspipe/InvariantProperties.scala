package newspipe

import newspipe.dq.{DqConfig, NativeDq}
import newspipe.functions.{SentimentAnalyzer, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants (SURVEY.md §5.3) — ScalaCheck Properties run by
  * sbt's native ScalaCheck framework (no scalatest bridge in the offline
  * cache). Spark-bound properties use few, small cases; pure-function
  * properties use the full default case count.
  */
object InvariantProperties extends Properties("newspipe") {

  private lazy val spark = SparkTestBase.session
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  // --- generators -----------------------------------------------------------

  private val cell: Gen[String] =
    Gen.oneOf(Gen.const(null: String), Gen.const(""),
      Gen.oneOf("a", "b", "c", "dd", "ee"))

  private val rows: Gen[List[(String, String)]] =
    Gen.listOfN(20, Gen.zip(cell, cell))

  private def toDf(data: List[(String, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.map { case (t, u) => Row(t, u) }, 2),
      StructType(Seq(StructField("title", StringType), StructField("url", StringType))))

  private val cfg = DqConfig("t", notNull = Seq("title"), uniqueKeys = Seq("url"))

  // --- DQ invariants --------------------------------------------------------

  property("dq: valid ∪ quarantined partitions the input exactly") =
    Prop.forAll(rows) { data =>
      val r = NativeDq.run(toDf(data), cfg)
      r.valid.count() + r.quarantined.get.count() == data.size
    }

  property("dq: no violation survives into valid") =
    Prop.forAll(rows) { data =>
      val r = NativeDq.run(toDf(data), cfg)
      val valid = r.valid.collect()
      val urlCounts = data.groupBy(_._2).view.mapValues(_.size).toMap
      valid.forall { row =>
        val t = row.getString(0); val u = row.getString(1)
        t != null && t.nonEmpty && (u == null || urlCounts(u) == 1)
      }
    }

  property("dq: running valid through DQ again is a fixpoint") =
    Prop.forAll(rows) { data =>
      val once = NativeDq.run(toDf(data), cfg).valid
      NativeDq.run(once, cfg).valid.count() == once.count()
    }

  // --- operator invariants --------------------------------------------------

  property("rename: toUpperSnakeColumns is idempotent") =
    Prop.forAll(Gen.listOfN(3, Gen.oneOf("a b", "c", "D e", "f_g"))) { names0 =>
      val names = names0.zipWithIndex.map { case (n, i) => s"$n$i" } // unique
      val df = spark.range(1).toDF().select(names.map(n => lit(1).as(n)): _*)
      val once = TextFunctions.toUpperSnakeColumns(df)
      val twice = TextFunctions.toUpperSnakeColumns(once)
      once.columns.sameElements(twice.columns)
    }

  property("exact dedup is idempotent and keeps ≥1 row per distinct content") =
    Prop.forAll(Gen.listOfN(15, Gen.oneOf("x", "y", "z"))) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val once = newspipe.ops.Dedup.exact(df, "id", Seq("text"))
      val twice = newspipe.ops.Dedup.exact(once, "id", Seq("text"))
      once.count() == twice.count() &&
        once.count() == texts.distinct.size.toLong
    }

  property("quarantine payload round-trips through from_json") =
    Prop.forAll(rows) { data =>
      import spark.implicits._
      val df = toDf(data)
      val payload = df.select(TextFunctions.rowPayload(df).as("p"))
        .select(from_json(col("p"),
          StructType(Seq(StructField("title", StringType), StructField("url", StringType)))).as("r"))
        .select("r.title", "r.url")
      // to_json drops null fields; empty strings and values must survive
      val back = payload.as[(Option[String], Option[String])].collect().toList
        .map { case (a, b) => (a.orNull, b.orNull) }
      back.groupBy(identity).view.mapValues(_.size).toMap ==
        data.groupBy(identity).view.mapValues(_.size).toMap
    }

  property("asOf join: one row per left row; matches are at-or-before") =
    Prop.forAll(
      Gen.listOfN(12, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 50L))),
      Gen.listOfN(8, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 50L)))) {
      (l, r) =>
        import spark.implicits._
        val left = l.zipWithIndex.map { case ((k, t), i) => (k, t, i) }
          .toDF("k", "ts", "lid")
        val right = r.distinct.map { case (k, t) => (k, t, s"v$k-$t") }
          .toDF("k", "ts", "rv")
        val out = newspipe.ops.AsOfJoin.asOf(left, right, "k", "ts")
          .select("lid", "ts", "r_ts").collect()
        out.length == l.size && out.forall { row =>
          row.isNullAt(2) || row.getLong(2) <= row.getLong(1)
        }
    }

  property("range join: bucketized equals naive for random widths") =
    Prop.forAll(
      Gen.listOfN(30, Gen.chooseNum(0L, 100L)),
      Gen.listOfN(6, Gen.zip(Gen.chooseNum(0L, 90L), Gen.chooseNum(0L, 30L))),
      Gen.chooseNum(1L, 40L)) { (ps, ivs, width) =>
      import spark.implicits._
      val points = ps.zipWithIndex.map { case (x, i) => (x, i) }.toDF("x", "pid")
      val intervals = ivs.zipWithIndex
        .map { case ((s, len), i) => (s, s + len, i) }.toDF("s", "e", "iid")
      val naive = points.join(intervals, col("x").between(col("s"), col("e")))
        .select("pid", "iid").as[(Int, Int)].collect().sorted.toSeq
      val fast = newspipe.ops.RangeJoin
        .intervalJoin(points, intervals, "x", "s", "e", width)
        .select("pid", "iid").as[(Int, Int)].collect().sorted.toSeq
      fast == naive
    }

  property("hashSample: a smaller fraction is always a subset of a larger one (same salt)") =
    Prop.forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) { (a, b) =>
      import spark.implicits._
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val ids = (1L to 200L).toDF("id")
      val small = newspipe.ops.Sampling.hashSample(ids, "id", lo, "p")
        .as[Long].collect().toSet
      val large = newspipe.ops.Sampling.hashSample(ids, "id", hi, "p")
        .as[Long].collect().toSet
      small.subsetOf(large)
    }

  property("mixture: every source lands within a binomial band of its rate") =
    Prop.forAll(Gen.chooseNum(0.1, 0.9), Gen.chooseNum(0.1, 0.9)) { (ra, rb) =>
      import spark.implicits._
      val n = 300
      val a = (1L to n.toLong).toDF("id")
      val b = (10001L to (10000L + n)).toDF("id")
      val counts = newspipe.ops.Sampling
        .mixture(Seq(("a", a, ra), ("b", b, rb)), "id", salt = "acc")
        .groupBy("mixture_source").count()
        .as[(String, Long)].collect().toMap
      Seq(("a", ra), ("b", rb)).forall { case (src, r) =>
        val expected = n * r
        // 5σ binomial band (+5 for tiny-n edges): deterministic md5 buckets
        // behave like uniform draws, so rate accuracy is a hard invariant
        val tol = 5 * math.sqrt(n * r * (1 - r)) + 5
        math.abs(counts.getOrElse(src, 0L).toDouble - expected) <= tol
      }
    }

  property("hashSplit: random fraction vectors produce pairwise-disjoint splits") =
    Prop.forAll(Gen.chooseNum(1, 4)
        .flatMap(n => Gen.listOfN(n, Gen.chooseNum(0.05, 0.2)))) { fs =>
      import spark.implicits._
      val ids = (1L to 200L).toDF("id")
      val sets = newspipe.ops.Sampling.hashSplit(ids, "id", fs, "q")
        .map(_.as[Long].collect().toSet)
      val disjoint = sets.combinations(2).forall { case Seq(x, y) =>
        (x intersect y).isEmpty
      }
      disjoint && sets.map(_.size).sum <= 200
    }

  property("spanDedup: kept chunks = distinct chunk contents; spans conserved") =
    Prop.forAll(Gen.listOfN(12,
        Gen.listOfN(9, Gen.oneOf("aa", "bb", "cc", "dd")))) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val out = newspipe.ops.Dedup.spanDedup(df, "doc_id", "text", span = 3)
        .as[(Long, Long, Long, String)].collect()
      // every 3-token chunk content survives exactly once corpus-wide…
      val allChunks = docs.map(_.grouped(3).map(_.mkString(" ")).toSeq)
      val distinctChunks = allChunks.flatten.distinct.size
      val keptTotal = out.map(_._3).sum
      // …and per doc, n_spans counts its own chunks regardless of dedup
      val spansOk = out.forall { case (id, nSpans, _, _) =>
        nSpans == allChunks(id.toInt).size
      }
      keptTotal == distinctChunks && spansOk
    }

  property("packBins: per group, bins are contiguous from 0 and weights conserved") =
    Prop.forAll(Gen.listOfN(30,
        Gen.zip(Gen.oneOf("g1", "g2"), Gen.chooseNum(1L, 120L)))) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((g, w), i) => (i.toLong, g, w) }.toDF("id", "grp", "w")
      val out = newspipe.ops.Sampling
        .packBins(df, "id", "w", budget = 100L, Seq("grp"))
        .select("grp", "bin", "w").as[(String, Long, Long)].collect()
      out.length == rows.length && out.groupBy(_._1).forall { case (_, g) =>
        val bins = g.map(_._2)
        // the first row of every group starts at offset 0 → bin 0; the max
        // bin is reachable only if enough weight precedes it (a row may SKIP
        // a bin by straddling two budget boundaries — that's the documented
        // oversized-row spillover, so contiguity is NOT an invariant); and
        // occupancy can never exceed one bin per row
        bins.min == 0L && g.map(_._3).sum > bins.max * 100L &&
          bins.distinct.size <= g.length
      }
    }

  property("topFractionByGroup keeps exactly ceil(n·f) of every group") =
    Prop.forAll(Gen.chooseNum(0.05, 0.95),
        Gen.listOfN(40, Gen.oneOf("x", "y", "z"))) { (f, grps) =>
      import spark.implicits._
      val df = grps.zipWithIndex
        .map { case (g, i) => (i.toLong, g, (i * 37 % 11).toLong) }
        .toDF("id", "grp", "score")
      val kept = newspipe.ops.Sampling
        .topFractionByGroup(df, "grp", "score", f, "id")
        .groupBy("grp").count().as[(String, Long)].collect().toMap
      grps.groupBy(identity).forall { case (g, members) =>
        kept.getOrElse(g, 0L) == math.ceil(members.size * f).toLong
      }
    }

  // --- pure-function properties (full case count) ---------------------------

  property("sentiment: label always matches polarity sign") =
    Prop.forAll(Gen.listOf(Gen.oneOf("good", "bad", "not", "very", "the", "cat"))) { words =>
      val s = SentimentAnalyzer.score(words.mkString(" "))
      val p = s.polarity.getOrElse(0f)
      s.label.contains(SentimentAnalyzer.label(p.toDouble))
    }

  property("legacy surrogate key truncation: ids are ≤ 5 chars") =
    Prop.forAll(Gen.chooseNum(1, 30)) { n =>
      import spark.implicits._
      val df = (1 to n).map(i => s"k$i").toDF("k")
      df.withColumn("id", newspipe.functions.Keys.legacyRowNumberKey("k"))
        .select("id").collect().forall(_.getString(0).length <= 5)
    }

  // random text incl. unicode, punctuation and quote runs — the native
  // tokenize/shingle kernels must match the HOF chain they replaced on
  // EVERY input, since the DuckDB oracles replay the HOF semantics
  private val noisyText: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.oneOf("cat", "DOG", "x1", "2y", "o'neill", "''", "Straße", "ÅÉÎ"),
      Gen.oneOf(" ", "  ", ", ", "!?", "\t", "\n", "--")
    )).map(_.mkString)

  property("tokenize/shingle kernels = HOF chain on arbitrary noisy text") =
    Prop.forAll(Gen.listOfN(6, noisyText)) { texts =>
      import spark.implicits._
      val F = org.apache.spark.sql.functions
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val native = df.select($"id",
          newspipe.ops.Dedup.tokens($"text").as("t"),
          newspipe.ops.Dedup.shinglesFromTokens(
            newspipe.ops.Dedup.tokens($"text"), 3).as("sh"))
        .collect().map(_.toString).sorted.toSeq
      val hof = df
        .select($"id", filter(split(lower($"text"), "[^a-z0-9']+"),
          t => F.length(t) > 0).as("t"))
        .select($"id", $"t", array_distinct(transform(
          sequence(lit(1), greatest(F.size($"t") - 2, lit(1))),
          i => array_join(slice($"t", i, lit(3)), " "))).as("sh"))
        .collect().map(_.toString).sorted.toSeq
      native == hof
    }

  property("Ppm: decode(encode(img)) == img, same-dims resample is identity, resize dims honored") =
    Prop.forAll(Gen.choose(1, 16), Gen.choose(1, 16), Gen.long) { (w, h, seed) =>
      import newspipe.multimodal.Ppm
      val rnd = new scala.util.Random(seed)
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val img = Ppm.Image(w, h, rgb)
      val round = Ppm.decode(Ppm.encode(img))
      val nw = math.max(1, w / 2); val nh = math.max(1, h / 2)
      val small = Ppm.resizeNearest(img, nw, nh)
      round.exists(r => r.width == w && r.height == h &&
        java.util.Arrays.equals(r.rgb, rgb)) &&
        java.util.Arrays.equals(Ppm.resizeNearest(img, w, h).rgb, rgb) &&
        small.width == nw && small.height == nh &&
        small.rgb.length == nw * nh * 3
    }

  property("winnow: fingerprint set is invariant under token-preserving reformatting") =
    Prop.forAll(Gen.listOfN(40, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))) { ws =>
      import spark.implicits._
      // same token stream, different separators/case → same fingerprints
      val a = ws.mkString(" ")
      val b = ws.map(_.toUpperCase).mkString("  ,  ")
      val df = Seq((1L, a), (2L, b)).toDF("id", "text")
      val fps = newspipe.ops.Winnow.fingerprints(df, "id", "text")
        .as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      fps(1L) == fps(2L)
    }


  // --- round-9 op invariants ------------------------------------------------

  property("bpe: encoding under a trained merge table never increases token count") =
    Prop.forAll(Gen.listOfN(8,
        Gen.oneOf("low", "lower", "lowest", "newer", "newest", "wide"))) { ws =>
      val vocab = ws.groupBy(identity).map { case (w, g) =>
        (w.map(_.toString).toArray :+ newspipe.ops.Bpe.EndOfWord, g.size.toLong)
      }.toArray
      val merges = newspipe.ops.Bpe.trainLocal(vocab, 6)
      val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
      ws.forall { w =>
        val enc = newspipe.ops.Bpe.encodeWord(w, ranks)
        enc.length <= w.length + 1 && enc.mkString == w + newspipe.ops.Bpe.EndOfWord
      }
    }

  property("bpe: the merge table is invariant under vocab order") =
    Prop.forAll(Gen.listOfN(6,
        Gen.oneOf("abc", "abd", "bcd", "cde"))) { ws =>
      val vocab = ws.groupBy(identity).map { case (w, g) =>
        (w.map(_.toString).toArray :+ newspipe.ops.Bpe.EndOfWord, g.size.toLong)
      }.toArray
      newspipe.ops.Bpe.trainLocal(vocab, 4) ==
        newspipe.ops.Bpe.trainLocal(vocab.reverse, 4)
    }

  property("pagerank: every rank >= 1-d and dangling-free cycles conserve total mass") =
    Prop.forAll(Gen.chooseNum(3, 12)) { n =>
      import spark.implicits._
      // a pure n-cycle: every node out-degree 1, no dangling mass loss
      val edges = (0L until n.toLong).map(i => (i, (i + 1) % n)).toDF("src", "dst")
      val ranks = newspipe.ops.PageRank.pageRank(edges, iterations = 4)
        .as[(Long, Double)].collect()
      val total = ranks.map(_._2).sum
      ranks.forall(_._2 >= 0.1499999) && math.abs(total - n) < 1e-6
    }

  property("dsir: empty-target smoothing still yields finite weights for any raw corpus") =
    Prop.forAll(Gen.listOfN(5, Gen.oneOf("aa bb", "cc dd", ""))) { texts =>
      import spark.implicits._
      val raw = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val target = raw.filter("id < 0") // empty target: pure smoothing
      val ratios = newspipe.ops.Dsir.logRatios(target, raw, "text", buckets = 16)
      val w = newspipe.ops.Dsir.importanceWeights(raw, "id", "text", ratios,
        buckets = 16).as[(Long, Double)].collect()
      w.length == texts.length && w.forall(x => !x._2.isNaN && !x._2.isInfinite)
    }

  property("prototypes: exactly ceil(n*f) keepers per cluster, every vector assigned once") =
    Prop.forAll(Gen.chooseNum(2, 10), Gen.chooseNum(1, 4)) { (n, k0) =>
      import spark.implicits._
      val k = math.min(k0, n)
      val vecs = (1 to n).map(i =>
        (i.toLong, Array(math.cos(i * 0.7), math.sin(i * 0.7), 0.1 * i)))
        .toDF("id", "v")
      val cents = newspipe.ops.Prototypes.seedCentroids(vecs, "id", "v", k)
      val out = newspipe.ops.Prototypes.prune(vecs, "id", "v", cents, 0.5)
        .as[(Long, Long, Double, Boolean)].collect()
      val perCluster = out.groupBy(_._2)
      out.length == n && out.map(_._1).distinct.length == n &&
        perCluster.forall { case (_, rows) =>
          rows.count(_._4) == math.ceil(rows.length * 0.5).toInt
        }
    }

  // --- manifest protocol round-trip ----------------------------------------

  private val relPath: Gen[String] = for {
    v <- Gen.choose(1000L, 9999L)
    n <- Gen.choose(0, 99)
  } yield f"_v/$v%04d-aaaa/part-$n%05d.parquet"

  private val manifests: Gen[newspipe.io.SnapshotManifest] = for {
    files <- Gen.choose(0, 40).flatMap(k =>
      Gen.listOfN(k, relPath)).map(_.distinct)
    nDv <- Gen.choose(0, math.min(3, files.size))
    nMap <- Gen.choose(0, 3)
    watermark <- Gen.oneOf(Gen.const(0L), Gen.choose(1L, 1000000L))
    tracked <- Gen.oneOf(true, false)
    nId <- Gen.choose(0, 2)
    variant <- Gen.oneOf(true, false)
  } yield newspipe.io.SnapshotManifest(
    files = files,
    schemaDdl =
      if (variant) "`id` BIGINT,`meta` VARIANT" else "`id` BIGINT",
    dvs = files.take(nDv).map(f => f -> s"${f}_dv.json").toMap,
    mapping = (1 to nMap).map(i => s"col$i" -> s"phys$i").toMap,
    dropped = (1 to nMap).map(i => s"gone$i"),
    rowBases =
      if (tracked && files.nonEmpty)
        files.zipWithIndex.map { case (f, i) => f -> i * 100L }.toMap
      else Map.empty,
    rowWatermark = if (tracked) watermark else 0L,
    idHighs = (1 to nId).map(i => s"rid$i" -> (i * 7L)).toMap)

  property("manifest: toJson/fromJson round-trips every field (incl. " +
      "derived protocol features) at both inline and sharded sizes") =
    Prop.forAll(manifests, Gen.oneOf(3, 1 << 20)) { (m, shardSize) =>
      val (head, shards) =
        newspipe.io.SnapshotManifest.toJsonSharded(m, shardSize)
      val back = newspipe.io.SnapshotManifest.read(head, shards(_))
      val expectedFeatures =
        newspipe.io.ProtocolFeatures.derive(m).distinct.sorted
      back.copy(features = Nil) == m.copy(features = Nil) &&
        back.features.sorted == expectedFeatures
    }

  private val deltaDocs: Gen[newspipe.io.DeltaDoc] = for {
    add <- Gen.choose(0, 10).flatMap(k =>
      Gen.listOfN(k, relPath)).map(_.distinct)
    remove <- Gen.choose(0, 10).flatMap(k =>
      Gen.listOfN(k, relPath)).map(_.distinct.filterNot(add.contains))
    chain <- Gen.choose(1, 8)
    count <- Gen.choose(0, 1000)
    nDv <- Gen.choose(0, math.min(2, add.size))
    nMap <- Gen.choose(0, 2)
    tracked <- Gen.oneOf(true, false)
    wm <- Gen.choose(1L, 100000L)
    nId <- Gen.choose(0, 2)
  } yield newspipe.io.DeltaDoc(
    parent = "0000000000001000-aaaa", chain = chain, count = count,
    schemaDdl = "`id` BIGINT,`text` STRING",
    add = add, remove = remove,
    dvSet = add.take(nDv).map(f => f -> s"${f}_dv.json").toMap,
    dvUnset = remove.take(1),
    mapping = (1 to nMap).map(i => s"c$i" -> s"p$i").toMap,
    dropped = (1 to nMap).map(i => s"g$i"),
    addBases =
      if (tracked && add.nonEmpty)
        add.zipWithIndex.map { case (f, i) => f -> i * 10L }.toMap
      else Map.empty,
    rowWatermark = if (tracked) wm else 0L,
    idHighs = (1 to nId).map(i => s"rid$i" -> (i * 3L)).toMap)

  property("delta doc: toJson/fromJson round-trips every field") =
    Prop.forAll(deltaDocs) { d =>
      newspipe.io.DeltaDoc.fromJson(newspipe.io.DeltaDoc.toJson(d)) == d
    }

  // --- persisted vector-index kernels ---------------------------------------

  private val vecRows: Gen[List[(Long, List[Double])]] =
    Gen.choose(2, 40).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 1000L),
        Gen.listOfN(6, Gen.choose(-4, 4).map(_.toDouble))))
    }.map(_.distinctBy(_._1)) // one vector per id (files key rows by id)

  property("hnsw shard: serialize/deserialize round-trip searches " +
      "IDENTICALLY to the freshly-built graph (any ids, zero vectors " +
      "included)") = Prop.forAll(vecRows) { data =>
    val rows = data.map { case (id, v) => (id, v.toArray) }.toArray
    val bytes = newspipe.ops.Hnsw.buildGraphBytes(rows, m = 4,
      efConstruction = 16)
    val persisted = newspipe.ops.Hnsw
      .searchGraphBytes(bytes, rows.take(3), k = 5, efSearch = 16).toSet
    val rebuilt = newspipe.ops.Hnsw
      .searchGraphBytes(newspipe.ops.Hnsw.buildGraphBytes(rows, 4, 16),
        rows.take(3), k = 5, efSearch = 16).toSet
    persisted == rebuilt && bytes.sameElements(
      newspipe.ops.Hnsw.buildGraphBytes(rows, 4, 16)) // byte-determinism
  }

  property("ivf shard: exhaustive probes (nprobe >= nlist) return the " +
      "exact global top-k (sim + id tie-break), matching a naive scan") =
    Prop.forAll(vecRows) { data =>
      val rows = data.map { case (id, v) => (id, v.toArray) }.toArray
      val bytes = newspipe.ops.IvfFlat.buildShardBytes(rows, nlist = 4)
      val qs = rows.take(2)
      val k = 3
      qs.forall { case (qid, qraw) =>
        val q = newspipe.ops.Hnsw.unitOrZero(qraw)
        val naive = rows.map { case (id, v) =>
          val u = newspipe.ops.Hnsw.unitOrZero(v)
          (id, u.zip(q).map { case (a, b) => a * b }.sum)
        }.sortBy { case (id, s) => (-s, id) }.take(k)
          .map { case (id, s) => (qid, id, s) }.toSet
        val got = newspipe.ops.IvfFlat
          .searchShardBytes(bytes, Array((qid, qraw)), k, nprobe = 99)
          .toSet
        got.map(t => (t._1, t._2)) == naive.map(t => (t._1, t._2))
      }
    }

  property("threshold scan (hnsw + ivf shards): exactly the naive " +
      "unit-dot pairs >= t — the vectorNearDups recall-1.0 contract, " +
      "zero vectors included") =
    Prop.forAll(vecRows, Gen.choose(-1.0, 1.0)) { (data, t) =>
      val rows = data.map { case (id, v) => (id, v.toArray) }.toArray
      val qs = rows.take(3)
      def naivePairs: Set[(Long, Long)] = (for {
        (qid, qraw) <- qs.toSeq
        q = newspipe.ops.Hnsw.unitOrZero(qraw)
        (id, vraw) <- rows.toSeq
        v = newspipe.ops.Hnsw.unitOrZero(vraw)
        s = {
          var acc = 0.0; var j = 0
          val n = math.min(q.length, v.length)
          while (j < n) { acc += q(j) * v(j); j += 1 }
          acc
        }
        if s >= t
      } yield (qid, id)).toSet
      val hnsw = newspipe.ops.Hnsw.scanGraphBytes(
        newspipe.ops.Hnsw.buildGraphBytes(rows, 4, 16), qs, t)
        .map(r => (r._1, r._2)).toSet
      val ivf = newspipe.ops.IvfFlat.scanShardBytes(
        newspipe.ops.IvfFlat.buildShardBytes(rows, nlist = 4), qs, t)
        .map(r => (r._1, r._2)).toSet
      hnsw == naivePairs && ivf == naivePairs
    }

  property("pq shard: build is byte-deterministic (input-order-free), an " +
      "exhaustive-fetch ADC shortlist covers every row, and search is " +
      "repeatable — the shortlist contract the exact refine relies on") =
    Prop.forAll(vecRows) { data =>
      val rows = data.map { case (id, v) => (id, v.toArray) }.toArray
      val bytes = newspipe.ops.PqShard.buildShardBytes(rows, mWant = 3,
        kWant = 8)
      val deterministic = bytes.sameElements(
        newspipe.ops.PqShard.buildShardBytes(rows.reverse, 3, 8))
      val q = rows.head
      def run() = newspipe.ops.PqShard
        .searchShardBytes(bytes, Array(q), fetch = rows.length + 5).toSeq
      val all = run()
      val complete = all.map(_._2).toSet == rows.map(_._1).toSet
      deterministic && complete && all == run()
    }

  // --- persisted dedup-index serde -----------------------------------------

  private val sigTriples: Gen[List[(Long, Int, Long)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(-500L, 500L), Gen.choose(0, 15),
      Gen.choose(Long.MinValue, Long.MaxValue)))
      .map(_.distinctBy(t => (t._1, t._2))) // one bucket per (id, band)

  property("dedup sig artifact: deserialize(serialize) round-trips every " +
      "triple and bytes are input-order-insensitive (deterministic " +
      "artifacts make maintenance races benign)") =
    Prop.forAll(sigTriples) { ts =>
      val triples = ts.toArray
      val bytes = newspipe.io.DedupIndex.serialize(triples)
      newspipe.io.DedupIndex.deserialize(bytes).toSet == triples.toSet &&
        bytes.sameElements(newspipe.io.DedupIndex.serialize(triples.reverse))
    }

  property("cap-bound exclusion is SOUND: when capExcludes says a shard " +
      "cannot reach the threshold, no member within the shard's angular " +
      "radius ever does (the exact-pruning law vectorNearDups relies on)") =
    Prop.forAll(
      Gen.choose(4, 16),                 // dim
      Gen.choose(0L, Long.MaxValue),     // seed
      Gen.choose(0.0, math.Pi / 2),      // member max angle to centroid
      Gen.choose(0.5, 0.999)) {          // threshold
      (dim, seed, maxA, threshold) =>
      val rnd = new scala.util.Random(seed)
      def unit(v: Array[Double]): Array[Double] = {
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0) v else v.map(_ / n)
      }
      def dot(a: Array[Double], b: Array[Double]): Double =
        a.zip(b).map { case (x, y) => x * y }.sum
      val c = unit(Array.fill(dim)(rnd.nextGaussian()))
      // members: rotate the centroid by angles <= maxA toward random
      // orthogonal directions — their min cosine to c is the radius
      val members = (0 until 12).map { _ =>
        val r = Array.fill(dim)(rnd.nextGaussian())
        val proj = dot(r, c)
        val orth0 = r.zip(c).map { case (x, ci) => x - proj * ci }
        val on = math.sqrt(orth0.map(x => x * x).sum)
        if (on < 1e-12) c.clone()
        else {
          val u = orth0.map(_ / on)
          val a = rnd.nextDouble() * maxA
          c.zip(u).map { case (ci, ui) =>
            math.cos(a) * ci + math.sin(a) * ui }
        }
      }
      val minCos = members.map(dot(_, c)).min
      val q = unit(Array.fill(dim)(rnd.nextGaussian()))
      val excluded = newspipe.ops.Hnsw.capExcludes(dot(q, c), minCos,
        threshold)
      // soundness: excluded ⇒ every member is below the threshold
      !excluded || members.forall(m => dot(q, unit(m)) < threshold)
    }

  property("dedup sig artifact bucket Bloom: a probe sharing any " +
      "(band, bucket) with the artifact NEVER prunes (no false " +
      "negatives — pair recall is exact), and a pruned read implies " +
      "the probe truly shares no bucket") =
    Prop.forAll(sigTriples, sigTriples) { (ts, other) =>
      val triples = ts.toArray
      val bytes = newspipe.io.DedupIndex.serialize(triples)
      def read(probe: Array[Long]) =
        newspipe.io.DedupIndex.readPruned(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(bytes)), Some(probe))
      val ownKeys = triples.map { case (_, b, bk) =>
        newspipe.io.DedupIndex.bucketKey(b, bk) }
      val otherKeys = other.map { case (_, b, bk) =>
        newspipe.io.DedupIndex.bucketKey(b, bk) }.toArray
      val neverFalseNegative =
        triples.isEmpty || read(ownKeys).exists(_.toSet == triples.toSet)
      val pruneIsSound = read(otherKeys) match {
        case None => otherKeys.toSet.intersect(ownKeys.toSet).isEmpty
        case Some(got) => got.toSet == triples.toSet
      }
      neverFalseNegative && pruneIsSound
    }

  property("dedup index meta: toJson/fromJson round-trips every field, " +
      "quotes and backslashes in names included") =
    Prop.forAll(
      Gen.oneOf("dix", "a_b", "x\"y", "p\\q", "m\\\"n"),
      Gen.oneOf("doc_id", "id\"col"), Gen.oneOf("text", "t\\xt"),
      Gen.choose(1, 256), Gen.choose(1, 64), Gen.choose(1, 8),
      Gen.choose(0.01, 0.99)) { (name, idc, txc, nh, b, sh, thr) =>
      val m = newspipe.io.DedupIndex.Meta(name, idc, txc,
        numHashes = nh, bands = b, rows = math.max(1, nh / math.max(1, b)),
        shingle = sh, threshold = thr)
      newspipe.io.DedupIndex.fromJson(newspipe.io.DedupIndex.toJson(m)) == m
    }

  property("identity alignBeyond: result is on the start/step grid, " +
      "strictly beyond seen, and minimally so") =
    Prop.forAll(
      Gen.choose(-100000L, 100000L),
      Gen.choose(-1000L, 1000L),
      Gen.oneOf(Gen.choose(1L, 97L), Gen.choose(-97L, -1L))) {
      (seen, start, step) =>
      val next = newspipe.io.Lake.alignBeyond(seen, start, step)
      val onGrid = (next - start) % step == 0
      val beyond = if (step > 0) next > seen else next < seen
      // minimal: stepping BACK one lands at-or-behind seen (or behind
      // start — the grid never allocates before its declared origin)
      val prev = next - step
      val minimal =
        if (step > 0) prev <= seen || prev < start
        else prev >= seen || prev > start
      onGrid && beyond && minimal
    }
}
