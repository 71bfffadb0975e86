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
  *    token is replaced by a copy-salted hash truncated to the token's own
  *    length. The map is injective per copy, so within-copy shingle sets
  *    (and therefore every near/exact-dup relationship and its Jaccard
  *    value) are preserved EXACTLY, while copies share no content words —
  *    cross-copy overlap is only stray all-stopword shingles, far below
  *    any candidate threshold. Token count, token lengths and stopword
  *    ratio are preserved, so the q44 quality gate behaves identically in
  *    every copy.
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
      val mapped = transform(col("__toks"), t =>
        when(t.isin(TextStats.EnStopwords: _*), t)
          .otherwise(concat(md5(concat(t, lit(s"#c$k"))), t)
            .substr(lit(1), length(t))))
      docs.select(
        (col("doc_id") + k.toLong * 10000000L).as("doc_id"),
        array_join(mapped, " ").as("text"))
    }.reduce(_ union _)
  }

  /** Copy-rotated embeddings with q40-style planted near-dups per copy. */
  private def scrambledEmbeddings(spark: SparkSession, dir: String, copies: Int): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    (0 until copies).map { k =>
      // rotation by k: orthogonal, so within-copy cosines are exact
      val rotated = emb.select(
        (col("vec_id") + k.toLong * 10000000L).as("vec_id"),
        transform(col("v"), (x, i) =>
          element_at(col("v"), pmod(i + lit(k), size(col("v"))) + 1)).as("v"))
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
    val (nCand, tCand) = timed {
      Dedup.minhashCandidates(docs, "doc_id", "text").localCheckpoint(true).count()
    }
    out("q26_candidates") = (nCand, tCand)
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text").localCheckpoint(true)
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
    val (nQ, tQ) = timed {
      docs.filter(TextStats.qualityScore(col("text")) >= 0.5)
        .localCheckpoint(true).count()
    }
    out("q44_quality") = (nQ, tQ)
    val quality = docs.filter(TextStats.qualityScore(col("text")) >= 0.5)
      .localCheckpoint(true)
    val (nEx, tEx) = timed {
      Dedup.exact(quality, "doc_id", Seq("text")).localCheckpoint(true).count()
    }
    out("q44_exact_dedup") = (nEx, tEx)
    val exact = Dedup.exact(quality, "doc_id", Seq("text")).localCheckpoint(true)
    val (nNd, tNd) = timed {
      Dedup.minhashDedup(exact, "doc_id", "text", threshold = 0.8).count()
    }
    out("q44_near_dedup") = (nNd, tNd)
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
