package graft

import newspipe.ops.{Dedup, Similarity, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-growth evidence beyond sf0.1 (SCALE.md): build an N× corpus derived
  * from the sf0.1 tables, run the three heaviest oracle-verified pipelines
  * (q26 minhash near-dup, q40 bucketed cosine pairs, q44 curation) with
  * per-stage timing at 1× and N×, and print one JSON line per scale so the
  * growth ratio of every stage is measurable.
  *
  * Corpus construction — copies must be mutually INDEPENDENT or the
  * measurement is dishonest: verbatim copies would make every doc a 10-way
  * near-dup, growing pair volume quadratically in copies rather than
  * linearly in corpus size. So:
  *  - documents: each copy RE-ALPHABETS the vocabulary — every non-stopword
  *    token of ≥4 chars is replaced by a copy-salted hash truncated to the
  *    token's own length (shorter tokens keep their identity: a ≤3-hex-char
  *    image is too small to be injective). The map is injective per copy up
  *    to ≥4-hex-char md5-prefix collisions (≤1/65536 per token pair), so
  *    within-copy shingle sets — and every near/exact-dup relationship —
  *    are preserved, while copies share no content words: cross-copy
  *    overlap needs 3 consecutive stop/short tokens, far below any
  *    candidate threshold. Token count, token lengths and stopword ratio
  *    are preserved, so the q44 quality gate behaves identically in every
  *    copy.
  *  - embeddings: copy k ROTATES each vector's coordinates by k. A
  *    rotation is orthogonal, so all within-copy cosines are preserved
  *    exactly (each copy re-plants q40's ±5% twins for its first 50
  *    vectors — the true pair count grows linearly by construction), while
  *    cross-copy cosines are shifted autocorrelations of pseudo-random
  *    vectors: far below the 0.95 threshold.
  *
  * Run: `sbt "runMain graft.ScaleBench [copies]"` (default 10); env
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as graft.Bench.
  */
object ScaleBench {

  private def timed(f: => Long): (Long, Double) = {
    val t0 = System.nanoTime()
    val n = f
    (n, (System.nanoTime() - t0) / 1e9)
  }

  /** Time an eagerly-checkpointed stage ONCE and hand the materialized frame
    * to the next stage — building the checkpoint a second time outside the
    * timed block would re-pay the whole stage.
    */
  private def timedStage(df: => DataFrame): (DataFrame, Long, Double) = {
    val t0 = System.nanoTime()
    val out = df.localCheckpoint(true)
    val n = out.count()
    (out, n, (System.nanoTime() - t0) / 1e9)
  }

  /** Per-copy vocabulary re-alphabeting: non-stopword tokens become a
    * copy-salted hash truncated to the token's own length (hex stays inside
    * the tokenizer's [a-z0-9] alphabet, so re-tokenizing the joined text
    * reproduces the token array). Pure column expressions; tokens
    * materialized once.
    */
  private def scrambledDocs(spark: SparkSession, dir: String, copies: Int): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("__toks", Dedup.tokens(col("text")))
    (0 until copies).map { k =>
      // tokens of ≤3 chars keep their identity (a 1-3 hex-char hash image
      // is too small to be injective — colliding tokens would silently
      // perturb within-copy shingle sets); short tokens behave like
      // stopwords, and 3 consecutive short/stop tokens are too rare to
      // create cross-copy candidates
      val mapped = transform(col("__toks"), t =>
        when(t.isin(TextStats.EnStopwords: _*) || length(t) <= 3, t)
          .otherwise(concat(md5(concat(t, lit(s"#c$k"))), t)
            .substr(lit(1), length(t))))
      docs.select(
        (col("doc_id") + k.toLong * 10000000L).as("doc_id"),
        array_join(mapped, " ").as("text"))
    }.reduce(_ union _)
  }

  /** Copy-transformed embeddings with q40-style planted near-dups per copy.
    * Copy k applies a SIGNED ROTATION: rotate coordinates by k mod dim, then
    * multiply coordinate j by a deterministic ±1 drawn from md5(k/dim, j).
    * Both factors are orthogonal, so within-copy cosines (and the planted
    * twins) are preserved exactly; the relative transform between any two
    * copies is a signed permutation with a copy-specific sign pattern, so
    * cross-copy cosines stay shifted/sign-scrambled autocorrelations of
    * pseudo-random vectors — far below threshold. The sign factor is what
    * lifts the old `copies <= dim` rotation-wrap cap: copies k and k+dim
    * share the rotation but differ in ~half the signs.
    */
  private def scrambledEmbeddings(spark: SparkSession, dir: String, copies: Int): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    (0 until copies).map { k =>
      val signSalt = k / 64 // pure rotation for k < 64 (back-compat with the 10x runs)
      val rotated = emb.select(
        (col("vec_id") + k.toLong * 10000000L).as("vec_id"),
        transform(col("v"), (x, i) => {
          val r = element_at(col("v"), pmod(i + lit(k % 64), size(col("v"))) + 1)
          if (signSalt == 0) r
          else r * when(
            conv(substring(md5(concat_ws("_", lit(signSalt), i)), 1, 4), 16, 10)
              .cast("int") % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
        }).as("v"))
      val planted = rotated.filter(col("vec_id") % 10000000L < 50)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("v"), (x, i) =>
            x * when(pmod(i, lit(2)) === 0, lit(1.05)).otherwise(lit(0.95)))
            .as("v"))
      rotated.union(planted)
    }.reduce(_ union _)
  }

  private def runAt(spark: SparkSession, dir: String, copies: Int): Map[String, (Long, Double)] = {
    // materialize the corpora so construction cost is not charged to stages,
    // widened to full parallelism (each source copy is one parquet file =
    // one partition; without this the per-stage numbers measure partition
    // starvation, not operator scaling)
    val par = spark.sparkContext.defaultParallelism
    val docs = scrambledDocs(spark, dir, copies).repartition(par)
      .localCheckpoint(true)
    val emb = scrambledEmbeddings(spark, dir, copies).repartition(par)
      .localCheckpoint(true)
    val out = scala.collection.mutable.LinkedHashMap[String, (Long, Double)]()
    out("corpus_docs") = (docs.count(), 0.0)
    out("corpus_vecs") = (emb.count(), 0.0)

    // q26 shape: minhash-LSH candidates, then exact Jaccard verify
    val (cand, nCand, tCand) =
      timedStage(Dedup.minhashCandidates(docs, "doc_id", "text"))
    out("q26_candidates") = (nCand, tCand)
    val (nVer, tVer) = timed {
      Dedup.jaccardVerify(cand, docs, "doc_id", "text", threshold = 0.8).count()
    }
    out("q26_verify") = (nVer, tVer)

    // q40 shape: banded-RHP cosine near-dup pairs (id-only candidates).
    // nbits grows with the corpus (log2 of the copy factor): with a FIXED
    // bucket space, 10x the vectors makes every bucket 10x denser and the
    // per-bucket pair volume 100x — measured 19.6x wall growth before this.
    // Growing the bucket space with the corpus is the standard LSH density
    // rule; recall for the planted twins stays total (miss probability
    // (1-(1-θ/π)^12)^16 ≈ 1e-12 at θ ≈ 0.051 rad).
    val nbits = 8 + (math.log(copies.toDouble) / math.log(2.0)).ceil.toInt
    val (nCos, tCos) = timed {
      Similarity.cosineNearDupPairs(emb, "vec_id", "v", dim = 64,
        threshold = 0.95, nbits = nbits, bands = 16).count()
    }
    out("q40_cosine_pairs") = (nCos, tCos)

    // q44 shape: quality gate → exact dedup → minhash near-dedup
    val (quality, nQ, tQ) =
      timedStage(docs.filter(TextStats.qualityScore(col("text")) >= 0.5))
    out("q44_quality") = (nQ, tQ)
    val (exact, nEx, tEx) = timedStage(Dedup.exact(quality, "doc_id", Seq("text")))
    out("q44_exact_dedup") = (nEx, tEx)
    val (nNd, tNd) = timed {
      Dedup.minhashDedup(exact, "doc_id", "text", threshold = 0.8).count()
    }
    out("q44_near_dedup") = (nNd, tNd)

    // q51 shape: span dedup — chunk stream and first-occurrence aggregate
    // both grow linearly with total tokens (re-alphabeting preserves every
    // within-copy chunk-repeat relationship)
    val (nSpan, tSpan) = timed {
      Dedup.spanDedup(docs, "doc_id", "text", span = 20).count()
    }
    out("q51_span_dedup") = (nSpan, tSpan)

    // q52 shape: cross-corpus scrub — reference is the doc_id%3=0 third of
    // each copy, so reference-side bucket census and candidate volume both
    // scale linearly with copies
    val (nAg, tAg) = timed {
      Dedup.dedupAgainst(docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text").count()
    }
    out("q52_dedup_against") = (nAg, tAg)

    // q53 shape: knn graph over the full corpus — same LSH bucket-density
    // rule as q40 (nbits grows with log2(copies) or per-bucket pair volume
    // squares); output rows = k per bucketed vector, linear by construction.
    // The signature kernel is float-typed like the embeddings table; the
    // rotation math above runs in double, so cast at the boundary
    val fEmb = emb.select(col("vec_id"), col("v").cast("array<float>").as("v"))
    val (nKnn, tKnn) = timed {
      Similarity.knnJoin(fEmb, "vec_id", "v", dim = 64, k = 5,
        nbits = nbits, probes = 4).count()
    }
    out("q53_knn_join") = (nKnn, tKnn)

    // q57 shape: embedding cross-corpus scrub — reference = the planted
    // near-dup rows (vec_id % 10000000 ≥ 100000, one set per copy), corpus
    // = the naturals; every copy contributes its own removals, so survivors
    // grow linearly. Same growing-nbits density rule
    val (nEsc, tEsc) = timed {
      Similarity.dedupAgainstByEmbedding(
        fEmb.filter(col("vec_id") % 10000000L < 100000L),
        fEmb.filter(col("vec_id") % 10000000L >= 100000L),
        "vec_id", "v", dim = 64, threshold = 0.95,
        nbits = nbits, probes = 4).count()
    }
    out("q57_embed_scrub") = (nEsc, tEsc)

    // q71 shape: winnowing fingerprint pairs — re-alphabeting is injective
    // per copy, so within-copy shared token runs (and their fingerprints)
    // are preserved exactly; cross-copy shared fingerprints would need 4
    // consecutive stop/short tokens. Pair volume grows linearly
    val (nWin, tWin) = timed {
      newspipe.ops.Winnow.nearDupPairs(docs, "doc_id", "text",
        minShared = 2L).count()
    }
    out("q71_winnow_pairs") = (nWin, tWin)

    // q74 shape: fixed-size chunking — pure per-row generate over the
    // native tokenizer; rows and wall both linear in total tokens
    val (nCh, tCh) = timed {
      newspipe.ops.Chunker.chunk(docs, "doc_id", "text",
        size = 30, overlap = 10).count()
    }
    out("q74_chunk") = (nCh, tCh)

    // q107 shape: TF-IDF top-3 — two partial-combined aggregates + a
    // (doc)-partitioned window; rows = 3·docs by construction (every doc
    // has ≥3 distinct tokens at every copy factor)
    val (nTf, tTf) = timed {
      newspipe.ops.Retrieval.tfIdf(docs, "doc_id", "text", k = 3).count()
    }
    out("q107_tfidf") = (nTf, tTf)

    // q108 shape: DSIR scoring — the model stays 1024 rows at ANY corpus
    // size (the broadcast invariant the op is built around); scored rows
    // = docs. Target = the doc_id%5 fifth of each copy
    val (nDs, tDs) = timed {
      val tgt = docs.filter(col("doc_id") % 5 === 0)
      val ratios = newspipe.ops.Dsir.logRatios(tgt, docs, "text",
        buckets = 1024)
      newspipe.ops.Dsir.importanceWeights(docs, "doc_id", "text", ratios,
        buckets = 1024).count()
    }
    out("q108_dsir_weights") = (nDs, tDs)

    // q109 shape: PageRank, 3 rounds over a deterministic 2-out-degree
    // modular graph on the doc id space — nodes ≈ 3·docs (srcs + mostly
    // distinct synthetic dsts), per-round join+agg cost linear
    val idSpace = copies.toLong * 10000000L
    val (nPr, tPr) = timed {
      val edges = docs.select(col("doc_id").as("src"),
          ((col("doc_id") * 7919L) % idSpace).as("dst"))
        .union(docs.select(col("doc_id").as("src"),
          ((col("doc_id") * 104729L) % idSpace).as("dst")))
      newspipe.ops.PageRank.pageRank(edges, iterations = 3).count()
    }
    out("q109_pagerank") = (nPr, tPr)

    // q114 shape: theta sketch of the doc-id sets of two corpus slices +
    // driver-side overlap — per-partition fold, log-depth bytes reduce;
    // the driver receives one ~128 KB sketch regardless of corpus size
    val (nTh, tTh) = timed {
      val a = newspipe.ops.ThetaOverlap.sketchOf(
        docs.filter(col("doc_id") % 3 =!= 0), "doc_id")
      val b = newspipe.ops.ThetaOverlap.sketchOf(
        docs.filter(col("doc_id") % 2 === 0), "doc_id")
      val (_, _, inter, _) = newspipe.ops.ThetaOverlap.overlapOf(a, b)
      inter.toLong
    }
    out("q114_theta_overlap") = (nTh, tTh)

    // q116 shape: classifier training cost — featurize-once persisted
    // sparse vectors, then 10 full-batch treeAggregate epochs; the
    // per-epoch cost is corpus-linear, the model is weights-only
    val (nCl, tCl) = timed {
      val labeled = docs.withColumn("label",
        (col("doc_id") % 2 === 0).cast("double"))
      val m = newspipe.ops.QualityClassifier.train(labeled, "text", "label",
        buckets = 2048, epochs = 10, binaryFeatures = true)
      m.weights.length.toLong
    }
    out("q116_classifier_train") = (nCl, tCl)

    // q123 shape: incremental HLL distinct — bootstrap per-group sketches
    // (untimed: that is the one-off full pass), then time the FOLD of a
    // 1/7 insert-only delta; the fold's cost must track the delta
    val docsG = docs.withColumn("doc_id_mod", col("doc_id") % 10)
    val state0 = newspipe.ops.IncrementalAgg.computeDistinct(
      docsG, Seq("doc_id_mod"), "doc_id").localCheckpoint(true)
    val (nFold, tFold) = timed {
      val delta = docsG.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 900000000L)
        .withColumn("_change_type", org.apache.spark.sql.functions.lit("insert"))
      newspipe.ops.IncrementalAgg.applyDeltaDistinct(
        state0, delta, Seq("doc_id_mod"), "doc_id").count()
    }
    out("q123_incr_distinct_fold") = (nFold, tFold)

    // q134 shape: hybrid RRF — the lexical leg tokenizes the whole corpus
    // (the honest linear cost), both legs end in distributed partial
    // top-k, fusion joins two <=50-row frames
    val (nHy, tHy) = timed {
      val qv = emb.filter(col("vec_id") === 0L).head().getSeq[Double](1)
      newspipe.ops.Retrieval.hybridRrf(docs, "doc_id", "text",
        Seq("vector", "stream", "window"), emb, "vec_id", "v",
        qv, topK = 20, legK = 50).count()
    }
    out("q134_hybrid_rrf") = (nHy, tHy)

    // q132 shape: column mapping. File count grows with the corpus (the
    // metadata dimension a rename actually touches); the read pays one
    // extra Project under mapping — measured against the unmapped read.
    val lakeDir = java.nio.file.Files.createTempDirectory("scale_cm").toString
    val lake = new newspipe.io.Lake(spark,
      newspipe.io.LakeConfig(basePath = lakeDir))
    lake.writeAtomic(docs.repartition(math.max(8, 8 * copies)), "docs")
    val (nUr, tUr) = timed {
      lake.read("docs").agg(sum(length(col("text")))).count()
    }
    out("q132_unmapped_read") = (nUr, tUr)
    lake.setProperties("docs", Map("lake.columnMapping.mode" -> "name"))
    val (nRen, tRen) = timed {
      lake.renameColumn("docs", "text", "body"); 8L * copies
    }
    out("q132_rename_commit") = (nRen, tRen)
    val (nMr, tMr) = timed {
      lake.read("docs").agg(sum(length(col("body")))).count()
    }
    out("q132_mapped_read") = (nMr, tMr)
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(lakeDir), true)

    // q137 shape: optimized partitioned writes — the metric that matters
    // is the landed FILE COUNT (the `rows` slot records files, not rows):
    // without the rebalance every task emits one file per partition value
    // it holds (~par × values), with it ~one per value. Wall includes the
    // extra shuffle — the cost that buys footer-count linearity on every
    // subsequent read.
    val owDir = java.nio.file.Files.createTempDirectory("scale_ow").toString
    def countFiles(sub: String): Long =
      newspipe.io.FsListing.filesRecursive(
        org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration),
        new org.apache.hadoop.fs.Path(s"$owDir/$sub"))
        .count(_.getPath.getName.endsWith(".parquet")).toLong
    val owDocs = docs.withColumn("lang", (col("doc_id") % 16).cast("string"))
    val owOff = new newspipe.io.Lake(spark,
      newspipe.io.LakeConfig(basePath = owDir))
    val (nOwOff, tOwOff) = timed {
      owOff.writeAtomic(owDocs, "off", partitionBy = Seq("lang"))
      countFiles("off")
    }
    out("q137_part_write_plain_files") = (nOwOff, tOwOff)
    val owOn = new newspipe.io.Lake(spark,
      newspipe.io.LakeConfig(basePath = owDir, optimizeWrite = true))
    val (nOwOn, tOwOn) = timed {
      owOn.writeAtomic(owDocs, "on", partitionBy = Seq("lang"))
      countFiles("on")
    }
    out("q137_part_write_optimized_files") = (nOwOn, tOwOn)
    // q138 shape: DESCRIBE DETAIL on the sliver-heavy layer — metadata
    // only, bounded by inventory size (one listing per version dir)
    val (nDd, tDd) = timed { owOff.describeDetail("off").numFiles }
    out("q138_describe_detail") = (nDd, tDd)
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(owDir), true)

    // q141 shape: n-gram LM — train on a third of the corpus, score all
    // of it (joins on token keys + per-doc window; model stays
    // distributed)
    val (nLm, tLm) = timed {
      val model = newspipe.ops.NgramLm.train(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
      newspipe.ops.NgramLm.score(docs, "doc_id", "text", model).count()
    }
    out("q141_ngram_lm") = (nLm, tLm)

    // q142 shape: metadata-only count — the sidecar-sum answer vs the
    // full scan it replaces (the `rows` slot records the counted rows)
    val mcDir = java.nio.file.Files.createTempDirectory("scale_mc").toString
    val mcLake = new newspipe.io.Lake(spark,
      newspipe.io.LakeConfig(basePath = mcDir))
    mcLake.writeAtomic(docs.repartition(math.max(8, 8 * copies)), "docs")
    val (nMc, tMc) = timed { mcLake.metadataRowCount("docs").get }
    out("q142_metadata_count") = (nMc, tMc)
    val (nSc, tSc) = timed { mcLake.read("docs").count() }
    out("q142_scan_count") = (nSc, tSc)
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(mcDir), true)

    // q131 shape: JPEG decode→resample→re-encode→decode, corpus-linear,
    // embarrassingly parallel (per-row JDK codec work, zero shuffles)
    val (nJp, tJp) = timed {
      newspipe.multimodal.Media.imagePixelSums(
        newspipe.multimodal.Media.resizeImages(
          newspipe.multimodal.Media.syntheticRealJpeg(spark, 500L * copies)
            .repartition(par), 8, 8)).count()
    }
    out("q131_jpeg_roundtrip") = (nJp, tJp)

    // q151 shape: per-file bloom index. Build cost ∝ files × rows (ONE
    // indexed-columns-only pass over the layer); payoff: the point
    // lookup's planned scan collapses from every file to ~1 regardless
    // of layer size (the `rows` slot records SCANNED files from the
    // executed plan's metric, wall includes the driver-side probe)
    val blDir = java.nio.file.Files.createTempDirectory("scale_bl").toString
    val blLake = new newspipe.io.Lake(spark,
      newspipe.io.LakeConfig(basePath = blDir))
    blLake.writeAtomic(docs.repartition(math.max(8, 8 * copies)), "docs")
    val probeId = docs.agg(min(col("doc_id"))).head().getLong(0) + 7L
    def scannedFiles(df: DataFrame): Long = {
      // collect() (NOT foreach — that runs on a separate deserialized
      // QueryExecution and leaves these metrics untouched) so numFiles
      // lands on THIS plan's scan node
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    val (nBp, tBp) = timed {
      scannedFiles(blLake.read("docs").filter(col("doc_id") === probeId))
    }
    out("q151_point_lookup_plain_files") = (nBp, tBp)
    val (nBb, tBb) = timed {
      blLake.enableBloomIndex("docs", Seq("doc_id"))
      math.max(8L, 8L * copies)
    }
    out("q151_bloom_build") = (nBb, tBb)
    val (nBl, tBl) = timed {
      scannedFiles(blLake.read("docs").filter(col("doc_id") === probeId))
    }
    out("q151_point_lookup_bloom_files") = (nBl, tBl)
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(blDir), true)

    // q152 shape: substring-span scrub — occurrence volume is
    // token-linear (re-alphabeting keeps duplicated spans WITHIN copies,
    // so dup volume also grows linearly), three key-partitioned shuffles,
    // no all-pairs stage
    // force the rebuilt text (a bare count() lets Catalyst elide the
    // scrub's final left join and under-measures the op)
    val (nSs, tSs) = timed {
      newspipe.ops.SubstringDedup.scrubDuplicateSpans(
        docs, "doc_id", "text", k = 8)
        .agg(sum(length(col("scrub_text"))), sum(col("n_kept")))
        .head().getLong(1)
    }
    out("q152_substring_scrub") = (nSs, tSs)

    // q153 shape: WAV decode → radix-2 FFT features over 4 windows of
    // 512 samples per clip — corpus-linear per-row codec+DSP work, zero
    // shuffles
    val (nAu, tAu) = timed {
      import spark.implicits._
      val media = spark.range(500L * copies).as[Long].repartition(par)
        .mapPartitions { it =>
          it.map { id =>
            val b = (8 + id % 100).toInt
            val samples = Array.tabulate(2048)(i =>
              (9000.0 * StrictMath.sin(
                2.0 * StrictMath.PI * b * i / 512)).toShort)
            newspipe.multimodal.Media.MediaRow(id, "audio",
              newspipe.multimodal.Wav.encode(
                newspipe.multimodal.Wav.Audio(8000, 1, samples)),
              newspipe.multimodal.Media.MediaMeta(None, None, Some("wav"),
                None))
          }
        }.toDF()
      newspipe.multimodal.Media.audioSpectral(media, 512).count()
    }
    out("q153_audio_fft") = (nAu, tAu)

    // ---- round-12 lake lifecycle ops. The scale claims under test:
    // CLONE and ALTER COLUMN TYPE are METADATA-ONLY (flat wall while the
    // corpus grows N×); the raced OPTIMIZE (rebase) and the layout
    // evolution are full rewrites whose wall tracks the corpus — linear by
    // design, what matters is ONE pass each.
    {
      val lakeRoot =
        java.nio.file.Files.createTempDirectory("scale_lake").toString
      val lake = new newspipe.io.Lake(spark,
        newspipe.io.LakeConfig(basePath = lakeRoot))
      val lakeDocs = docs.select(col("doc_id"), col("text"),
        (col("doc_id") % 5).cast("string").as("lang"),
        (col("doc_id") % 1000).cast("int").as("rating"))
      val (nLw, tLw) = timed {
        lake.writeAtomic(lakeDocs.repartition(par), "docs")
        lake.describeDetail("docs").numFiles
      }
      out("r12_lake_write") = (nLw, tLw) // the linear baseline
      val (nCl, tCl) = timed {
        lake.clone("docs", "fork")
        lake.listVersions("fork").size.toLong
      }
      out("r12_clone") = (nCl, tCl) // must stay FLAT at N×
      val (nWd, tWd) = timed {
        lake.widenColumn("docs", "rating",
          org.apache.spark.sql.types.LongType)
        1L
      }
      out("r12_widen_column") = (nWd, tWd) // must stay FLAT at N×
      // raced OPTIMIZE: an append lands mid-compaction; the rebase keeps
      // it ONE bin-pack pass (retry-from-scratch would double the wall)
      val (nRb, tRb) = timed {
        lake.onBeforeManifestCommit = () => {
          lake.onBeforeManifestCommit = () => ()
          lake.appendAtomic(lakeDocs.limit(100), "docs")
        }
        val r = lake.compactSmall("docs",
          smallFileBytes = 512L * 1024 * 1024,
          targetFileBytes = 512L * 1024 * 1024)
        r.rewrittenFiles.toLong
      }
      out("r12_rebase_optimize") = (nRb, tRb) // linear (one rewrite pass)
      val (nRp, tRp) = timed {
        lake.repartitionLayer("fork", Seq("lang"))
        lake.describeDetail("fork").numFiles
      }
      out("r12_repartition_layer") = (nRp, tRp) // linear (full rewrite)
      // best-effort cleanup — lifecycle dirs are sized like the corpus
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(lakeRoot))
          .iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }

    // ---- round-13: incremental commit log. The scale claim: a small
    // append's COMMIT metadata cost is O(increment) regardless of the
    // inventory size — flat wall while the FILE COUNT grows N× — where
    // the full-manifest protocol (checkpointInterval=1, the pre-round-13
    // behavior, kept as the measured baseline) re-serializes the whole
    // inventory + stats every commit, O(total files). checkpoint() is
    // the O(files) cost paid once per interval instead of per commit.
    {
      val root = java.nio.file.Files.createTempDirectory("scale_dl").toString
      val incLake = new newspipe.io.Lake(spark,
        newspipe.io.LakeConfig(basePath = root))
      val fullLake = new newspipe.io.Lake(spark,
        newspipe.io.LakeConfig(basePath = root, checkpointInterval = 1))
      val files = math.max(64, 64 * copies) // inventory grows with scale
      incLake.writeAtomic(docs.repartition(files), "inc")
      fullLake.writeAtomic(docs.repartition(files), "full")
      val one = docs.limit(50).repartition(1)
      val (nIa, tIa) = timed {
        incLake.appendAtomic(one, "inc"); 1L
      }
      out("r13_incremental_append_commit") = (nIa, tIa) // FLAT at N× files
      val (nFa, tFa) = timed {
        fullLake.appendAtomic(one, "full"); files.toLong
      }
      out("r13_full_append_commit") = (nFa, tFa) // the O(files) baseline
      val (nCp, tCp) = timed {
        incLake.checkpoint("inc"); files.toLong
      }
      out("r13_checkpoint") = (nCp, tCp) // O(files), once per interval
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(root))
          .iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }

    // ---- round-14: distributed row-tracking backfill. The scale claim:
    // enableRowTracking's one-time exact-row-count backfill runs the
    // parquet-footer reads as a SPARK JOB over the file list (above
    // backfillJobThreshold), so DRIVER wall grows with job latency, not
    // with 16-driver-threads × files — at 10⁶ files the thread pool is
    // the bottleneck, the job is not. Threshold forced to 0 here so the
    // job path is what's measured at both scales.
    {
      val root = java.nio.file.Files.createTempDirectory("scale_rt").toString
      val lake = new newspipe.io.Lake(spark,
        newspipe.io.LakeConfig(basePath = root, backfillJobThreshold = 0))
      val files = math.max(64, 64 * copies)
      lake.writeAtomic(docs.repartition(files), "rt")
      val (nRt, tRt) = timed {
        lake.enableRowTracking("rt"); files.toLong
      }
      out("r14_rowtracking_backfill_job") = (nRt, tRt)
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(root))
          .iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }

    // ---- round-15: O(1) snapshot-head resolution. The scale claim: a
    // table's HEAD resolves through the `_v/_LAST` pointer in one read +
    // one (cached) marker probe — FLAT while the COMMIT COUNT grows N× —
    // where the pre-round-15 behavior (still measurable as the full
    // history listing, listVersions) pays one `_v` listing plus marker
    // probes per resolution, O(versions). Version history is fabricated
    // (older committed dirs minted directly — head resolution reads only
    // dir names + markers, never manifests) so the stage measures
    // resolution, not commit cost. 200 reps per metric: head resolution
    // is paid on EVERY read/commit/stream trigger, so per-call wall is
    // the number that matters.
    {
      val root = java.nio.file.Files.createTempDirectory("scale_hr").toString
      val lake = new newspipe.io.Lake(spark,
        newspipe.io.LakeConfig(basePath = root))
      lake.writeAtomic(docs.limit(50).repartition(1), "hr")
      val versions = math.max(64, 64 * copies)
      val vdir = java.nio.file.Paths.get(s"$root/hr/_v")
      (1 to versions).foreach { i =>
        val d = vdir.resolve(f"${1000000000000L + i}%016d-fabr${i}%04d")
        java.nio.file.Files.createDirectories(d)
        java.nio.file.Files.write(d.resolve("_COMMITTED"),
          Array.empty[Byte])
      }
      val (nHd, tHd) = timed {
        var n = 0L
        (1 to 200).foreach(_ => if (lake.headVersion("hr").isDefined) n += 1)
        n
      }
      out("r15_head_resolution_x200") = (nHd, tHd) // FLAT at N× versions
      val (nFl, tFl) = timed {
        var n = 0L
        (1 to 200).foreach(_ => n += lake.listVersions("hr").size.toLong)
        n
      }
      out("r15_full_history_listing_x200") = (nFl, tFl) // O(versions)
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(root))
          .iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }

    // ---- round-15: APPEND COMMIT REBASE. The scale claim: an append
    // that loses the parent race to a compatible sibling re-parents its
    // staged commit (dir rename + restaged metadata) instead of
    // re-running the increment write — so the raced append's wall tracks
    // the PLAIN append's wall as the increment grows N× (retry-from-
    // scratch would track ~2× plain: the increment is written twice).
    // The race is injected via the onBeforeManifestCommit seam.
    {
      val root = java.nio.file.Files.createTempDirectory("scale_ar").toString
      val lake = new newspipe.io.Lake(spark,
        newspipe.io.LakeConfig(basePath = root))
      val increment = docs.select(col("doc_id"), col("text"))
      lake.writeAtomic(increment.limit(10), "ar")
      val (nPl, tPl) = timed {
        lake.appendAtomic(increment, "ar"); increment.count()
      }
      out("r15_append_plain") = (nPl, tPl)
      val (nRb, tRb) = timed {
        lake.onBeforeManifestCommit = () => {
          lake.onBeforeManifestCommit = () => ()
          lake.appendAtomic(increment.limit(100), "ar")
        }
        try lake.appendAtomic(increment, "ar")
        finally lake.onBeforeManifestCommit = () => ()
        increment.count()
      }
      out("r15_append_raced_rebase") = (nRb, tRb)
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(root))
          .iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }

    // ---- round-16: COMPOSITE-KEY MERGE PRUNING. The scale claim: a
    // selective CDC batch on a COMPOSITE key rewrites the files its
    // exact per-column IN sets reach — FLAT while the layer's file count
    // grows N× — where per-column [min,max] bounds (the pre-round-16
    // composite path) reach every file between the batch's extreme key
    // values, O(files). The batch deliberately touches the two extreme
    // g values so its bounds span the whole layer: the metric VALUE is
    // the rewritten-file count (flat ≈ 2), wall is the merge cost.
    {
      val root = java.nio.file.Files.createTempDirectory("scale_cm").toString
      val lake = new newspipe.io.Lake(spark,
        newspipe.io.LakeConfig(basePath = root))
      val nFiles = 8 * copies
      val target = spark.range(nFiles.toLong * 200)
        .select((col("id") / 200).cast("long").as("g"), col("id"),
          org.apache.spark.sql.functions.md5(col("id").cast("string"))
            .as("v"))
        .repartitionByRange(nFiles, col("g"))
        .sortWithinPartitions("g", "id")
      lake.writeAtomic(target, "cm")
      val src = spark.range(2).select(
        org.apache.spark.sql.functions
          .when(col("id") === 0, 0L).otherwise(nFiles.toLong - 1).as("g"),
        org.apache.spark.sql.functions
          .when(col("id") === 0, 3L).otherwise(nFiles.toLong * 200 - 3)
          .as("id"),
        org.apache.spark.sql.functions.lit("NEW").as("v"))
      val (nCm, tCm) = timed {
        lake.mergeInto("cm", src, Seq("g", "id")).rewrittenFiles.toLong
      }
      out("r16_composite_merge_rewritten") = (nCm, tCm) // FLAT at N× files
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(root))
          .iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }

    // ---- round-17: PERSISTED VECTOR INDEX. The scale claims: (build)
    // createVectorIndex pays one pass over the corpus ONCE — the cost a
    // per-query rebuild (hnswTopK, measured as the contrast) pays on
    // EVERY search call; (search) vectorSearch reads index artifacts
    // only — per-call wall stays near-FLAT while the corpus grows N×
    // (one tiny task per shard graph vs a full corpus re-read+rebuild).
    {
      val root = java.nio.file.Files.createTempDirectory("scale_vi").toString
      val lake = new newspipe.io.Lake(spark,
        newspipe.io.LakeConfig(basePath = root))
      val nFiles = 4 * copies
      val corpus = spark.range(nFiles.toLong * 500)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(15)), j =>
            (pmod(xxhash64(col("id"), j), lit(2001L)) - lit(1000L))
              .cast("double") / 1000.0).as("vec"))
        .repartitionByRange(nFiles, col("vec_id"))
        .sortWithinPartitions("vec_id")
      lake.writeAtomic(corpus, "vi")
      val (nB, tB) = timed {
        lake.createVectorIndex("vi", "idx", "vec", "vec_id").toLong
      }
      out("r17_vindex_build") = (nB, tB) // O(corpus), paid ONCE
      val queries = lake.read("vi").filter(col("vec_id") < 16)
      val (nS, tS) = timed {
        (1 to 5).map(_ =>
          lake.vectorSearch("vi", queries, k = 10).count()).sum
      }
      out("r17_vindex_search_x5") = (nS, tS) // near-FLAT at N× corpus
      val (nR, tR) = timed {
        newspipe.ops.Hnsw.hnswTopK(queries, lake.read("vi"),
          "vec_id", "vec", k = 10).count()
      }
      out("r17_rebuild_search_x1") = (nR, tR) // O(corpus) EVERY call
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(root))
          .iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }

    // ---- round-18: COARSE SHARD ROUTING. The scale claim: a selective
    // shardProbe search touches ~probe·files shard artifacts per query
    // (plus a tiny routing-segment read) while the full-probe search
    // touches EVERY artifact — so on a cluster-coherent corpus the
    // routed wall stays near-FLAT as the file count grows N× and the
    // full-probe wall grows with it. Corpus: one cluster per data file
    // (the CLUSTER BY layout routing is designed for), 64-dim centers
    // hash-derived (near-orthogonal), members = center + 0.15·noise.
    {
      val root = java.nio.file.Files.createTempDirectory("scale_vr").toString
      val lake = new newspipe.io.Lake(spark,
        newspipe.io.LakeConfig(basePath = root))
      val nFiles = 4 * copies
      val dim = 64
      // 2000 vectors per shard: big enough that reading+searching a
      // shard artifact is the visible cost, not per-task fixed overhead
      // (500-row shards measured job-launch noise, not the probe win)
      val corpus = spark.range(nFiles.toLong * 2000)
        .select(col("id").as("vec_id"), (col("id") / 2000L).as("cl"))
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)), j =>
            (pmod(xxhash64(col("cl"), j), lit(2001L)) - lit(1000L))
              .cast("double") / 1000.0 +
            (pmod(xxhash64(col("vec_id"), j, lit(7)), lit(2001L))
              - lit(1000L)).cast("double") / 1000.0 * 0.15).as("vec"))
        .repartitionByRange(nFiles, col("vec_id"))
        .sortWithinPartitions("vec_id")
      lake.writeAtomic(corpus, "vr")
      lake.createVectorIndex("vr", "idx", "vec", "vec_id")
      val queries = lake.read("vr")
        .filter(pmod(col("vec_id"), lit(2000L)) === 0 &&
          col("vec_id") < 16000L)
      val (nF, tF) = timed {
        (1 to 5).map(_ =>
          lake.vectorSearch("vr", queries, k = 10).count()).sum
      }
      out("r18_vroute_full_x5") = (nF, tF) // touches EVERY shard: O(files)
      val probe = 2.0 / nFiles // ~2 shards per query at any scale
      val (nP, tP) = timed {
        (1 to 5).map(_ => lake.vectorSearch("vr", queries, k = 10,
          shardProbe = probe).count()).sum
      }
      out("r18_vroute_probed_x5") = (nP, tP) // ~2 shards/query: FLAT at N×
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(root))
          .iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }

    // ---- round-17 cont.: PERSISTED DEDUP INDEX. The scale claims:
    // (sign) the shingle+hash pass over text runs once per file EVER —
    // an append signs its own files only; (incremental) nearDups(since)
    // joins the batch's signatures against the PERSISTED corpus
    // signatures, so per-batch dedup cost stays near-FLAT while the
    // corpus grows N× — the from-scratch pipeline (the contrast)
    // re-shingles the WHOLE corpus on every batch.
    {
      val root = java.nio.file.Files.createTempDirectory("scale_di").toString
      val lake = new newspipe.io.Lake(spark,
        newspipe.io.LakeConfig(basePath = root))
      val nFiles = 4 * copies
      // 120-word documents: long enough that the shingle+hash pass over
      // text (what the index amortizes away) is the visible cost, not
      // the per-job fixed overheads
      def textOf(idc: org.apache.spark.sql.Column) =
        concat_ws(" ", transform(sequence(lit(0), lit(119)), j =>
          pmod(xxhash64(idc, j), lit(1000L)).cast("string")))
      val corpus = spark.range(nFiles.toLong * 500)
        .select(col("id").as("doc_id"), textOf(col("id")).as("text"))
        .repartitionByRange(nFiles, col("doc_id"))
        .sortWithinPartitions("doc_id")
      lake.writeAtomic(corpus, "di")
      val (nSign, tSign) = timed {
        lake.createDedupIndex("di", "dix", "text", "doc_id").toLong
      }
      out("r17_dindex_sign") = (nSign, tSign) // O(corpus), paid ONCE
      val v1 = lake.listVersions("di").head
      // the daily batch: 100 near-dups of old docs + 100 fresh docs
      val batch = spark.range(100)
        .select((col("id") * 7 + 3).as("src"))
        .select((col("src") + 10000000L).as("doc_id"),
          textOf(col("src")).as("text"))
        .union(spark.range(100).select(
          (col("id") + 20000000L).as("doc_id"),
          textOf(col("id") + 20000000L).as("text")))
      lake.appendAtomic(batch.coalesce(1), "di")
      val (nInc, tInc) = timed {
        lake.nearDups("di", sinceVersion = Some(v1)).count()
      }
      out("r17_dindex_incremental") = (nInc, tInc) // near-FLAT at N×
      val (nFs, tFs) = timed {
        val all = lake.read("di")
        Dedup.jaccardVerify(
          Dedup.minhashCandidates(all, "doc_id", "text"),
          all, "doc_id", "text").count()
      }
      out("r17_dindex_scratch_x1") = (nFs, tFs) // O(corpus) EVERY batch
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(root))
          .iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }

    // ---- round-17: IN-SET PREDICATES (the dynamic-overwrite shape). The
    // scale claims: (stat filter) a 1000-value IN-set over per-file stats
    // costs ONE hash probe per file — wall stays tiny while the file
    // count grows N× (the pre-round-17 OR chain evaluated O(values)
    // comparison nodes per file); (e2e) overwritePartitionsDynamic
    // touching 2 of N× hive partitions rewrites exactly 2 files — FLAT —
    // with the replaced set derived from path metadata, not a predicate
    // chain.
    {
      val root = java.nio.file.Files.createTempDirectory("scale_is").toString
      val lake = new newspipe.io.Lake(spark,
        newspipe.io.LakeConfig(basePath = root))
      val nFiles = 16 * copies
      val target = spark.range(nFiles.toLong * 200)
        .select((col("id") / 200).cast("long").as("g"), col("id"),
          md5(col("id").cast("string")).as("v"))
        .repartitionByRange(nFiles, col("g"))
        .sortWithinPartitions("g", "id")
      lake.writeAtomic(target, "is")
      // 1000-value IN set, 2 values real (files 3 and nFiles-2): the
      // stats pass must prune to 2 files however many files exist
      val vals: Seq[Long] = Seq(3L, nFiles.toLong - 2) ++
        (0 until 998).map(i => 10000000L + i)
      val (nIs, tIs) = timed {
        (1 to 5).map(_ =>
          lake.readWhere("is", col("g").isin(vals: _*)).count()).sum
      }
      out("r17_inset_stat_filter_1k_x5") = (nIs, tIs)
      // hive-partitioned dynamic overwrite: 2 of nParts partitions turn
      // over (metric VALUE = rewritten files, flat ≈ 2; wall = op cost)
      val nParts = 8 * copies
      val pt = spark.range(nParts.toLong * 40)
        .select(pmod(col("id"), lit(nParts.toLong)).as("p"), col("id"),
          md5(col("id").cast("string")).as("v"))
      lake.writeAtomic(pt, "dyn", partitionBy = Seq("p"))
      val inc = spark.range(2).select(
        when(col("id") === 0, 0L).otherwise(nParts.toLong - 1).as("p"),
        (col("id") + 900000L).as("id"), lit("NEW").as("v"))
      val (nDo, tDo) = timed {
        lake.overwritePartitionsDynamic("dyn", inc).rewrittenFiles.toLong
      }
      out("r17_dynamic_overwrite_rewritten") = (nDo, tDo) // FLAT at N×
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(root))
          .iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
    out.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm pass at 1× (JIT + codegen), then measured 1× and N×
    runAt(spark, sfDir, 1)
    for (c <- Seq(1, copies)) {
      val r = runAt(spark, sfDir, c)
      val body = r.map { case (k, (n, t)) =>
        s"""\"$k\":{\"rows\":$n,\"sec\":${math.rint(t * 1000) / 1000}}"""
      }.mkString(",")
      println(s"""{"scale_copies":$c,$body}""")
    }
    spark.stop()
  }
}
