package newspipe.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column `array<float>` (extension
  * track, SURVEY.md §7).
  *
  * Two paths, per the 100 TB design brief:
  *  - [[bruteForceTopK]] — exact cosine top-k, the correctness baseline.
  *    Queries are broadcast (a query set is dim-table-sized); the corpus is
  *    scanned once, k survivors per query via window rank. Scales linearly
  *    in corpus size — the right tool up to "queries × corpus" flops budget.
  *  - [[lshTopK]] — random-hyperplane LSH: per-row bit signature (no
  *    shuffle), candidates = same-bucket rows (one shuffle on bucket),
  *    exact cosine re-rank of candidates only. The scale path: cost is
  *    per-bucket, not per-corpus.
  *
  * All dot products are native `aggregate`/`zip_with` expressions —
  * codegen-friendly, no UDF in the brute-force hot path.
  */
object Similarity {

  /** Cosine similarity of two float-array columns (null-safe: null if
    * either side is null or zero-norm).
    */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0 || nb === 0, lit(null)).otherwise(d / (na * nb))
  }

  /** Dot product of two array columns — a codegen'd native expression
    * ([[newspipe.functions.ArrayMath.dot]]); the interpreted
    * `aggregate(zip_with(…))` form it replaces is kept under test as the
    * semantic reference.
    */
  def dot(a: Column, b: Column): Column = newspipe.functions.ArrayMath.dot(a, b)

  /** L2 norm of an array column: one native self-dot pass. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact all-pairs cosine pairs (id_a < id_b, cos ≥ threshold).
    *
    * Scale shape: vectors are unit-normalized ONCE per row (norm is
    * materialized as a column first — inlining it into the transform lambda
    * would re-evaluate the norm aggregate per element), so each of the
    * O(n²/2) pairs costs one dot product instead of three array reductions.
    * The quadratic candidate space is the point of this operator (exact
    * verification / oracle baseline); [[cosineNearDupPairs]] is the bucketed
    * scale path.
    */
  def allPairsCosine(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val unit = Par.ensure(df.select(col(idCol).as("id"), col(vecCol).as("v")))
      .withColumn("__n", l2Norm(col("v")))
      .filter(col("__n") > 0)
      .withColumn("u", transform(col("v"), x => x / col("__n")))
      .select("id", "u")
    val a = unit.select(col("id").as("id_a"), col("u").as("ua"))
    val b = unit.select(col("id").as("id_b"), col("u").as("ub"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("ua"), col("ub")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Exact top-k neighbors for every row of `queries` against `corpus`.
    *
    * @param queries (idCol, vecCol) — small; broadcast to every executor.
    * @param corpus  (idCol, vecCol) — arbitrarily large; scanned once.
    * @return (query_id, neighbor_id, cos) with rank ≤ k per query,
    *         self-matches excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** RHP bucket-space sizing for a corpus of `n` vectors — the LSH density
    * rule the 10×/100× ScaleBench validated (SCALE.md): expected bucket
    * occupancy is n / 2^nbits per band, and per-bucket pair volume grows
    * with occupancy SQUARED, so a fixed nbits turns a 10× corpus into 100×
    * the pair work. Pick nbits so the expected occupancy stays at
    * `targetBucketDocs` (default 8 — small enough that a bucket's pair
    * fan-out is trivial, large enough that near neighbors still collide):
    * `nbits = ceil(log2(n / targetBucketDocs))`, clamped to [4, 30].
    * Callers: `cosineNearDupPairs(..., nbits = Similarity.nbitsFor(n))`.
    */
  def nbitsFor(n: Long, targetBucketDocs: Int = 8): Int = {
    require(n > 0, s"corpus size must be positive, got $n")
    require(targetBucketDocs > 0,
      s"targetBucketDocs must be positive, got $targetBucketDocs")
    val raw = math.ceil(
      math.log(n.toDouble / targetBucketDocs) / math.log(2.0)).toInt
    math.min(30, math.max(4, raw))
  }

  /** Deterministic random hyperplanes: `nbits × dim` floats in [-1, 1],
    * seeded — identical on every executor and across runs.
    */
  private[ops] def hyperplanes(dim: Int, nbits: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nbits)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  /** Random-hyperplane signature: bit j = sign(v · plane_j). The plane
    * matrix is tiny (nbits × dim floats), generated deterministically from
    * the seed and shipped as a codegen reference object into the native
    * [[newspipe.functions.RhpSignatureExpr]] — one static kernel call per
    * row inside whole-stage codegen, float accumulation bit-identical to
    * the Scala-UDF form it replaced (parity-pinned in SimilaritySpec).
    */
  def rhpSignature(dim: Int, nbits: Int = 16, seed: Long = 42L): Column => Column = {
    val planes = hyperplanes(dim, nbits, seed)
    (c: Column) => newspipe.functions.Rhp.signature(c, planes)
  }

  /** LSH-bucketed ANN: bucket by RHP signature, exact cosine within the
    * union of each query's probe buckets, top-k re-rank. `probes` flips of
    * the lowest bits trade recall for cost (multi-probe LSH).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int = 10, nbits: Int = 12,
      probes: Int = 4, seed: Long = 42L): DataFrame = {
    val sigOf = rhpSignature(dim, nbits, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      sigOf(col(vecCol)).as("__bucket"))
    // query probe set: its own bucket + single-bit flips of the lowest bits
    val q = broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("__qv"), sigOf(col(vecCol)).as("__qsig"))
      .withColumn("__bucket", explode(probeBuckets(probes)(col("__qsig")))))
    val scored = c.join(q, Seq("__bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      // a neighbor reachable through several probe buckets must count ONCE —
      // deduplicate before ranking or it consumes multiple of the k slots
      // and leaves rank gaps (rows differ only in __bucket, so keep-any is safe)
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Bulk k-nearest-neighbor SELF-join: top-k cosine neighbors for EVERY row
    * of `df` — the knn-graph build behind embedding-space dedup, clustering
    * prep, and semantic-coverage audits. Unlike [[lshTopK]] there is no
    * bounded broadcast query set: BOTH sides are the corpus, so the
    * candidate generation must be (and is) the bucketed form — rows meet
    * only inside shared RHP probe buckets, one shuffle join on the bucket
    * id, never corpus × corpus.
    *
    * Scale shape: signatures and probe sets are per-row projections; the
    * bucket join is id-only (vectors do NOT ride the probe explode — the
    * deduped candidate pair set joins them back, the
    * [[cosineNearDupPairs]] shape); `maxBucket` drops degenerate hot
    * buckets (a bucket of B rows is B² candidate pairs) before any pair
    * exists. Re-rank cost is per-candidate, recall is tuned by
    * (nbits, probes) exactly as in [[lshTopK]].
    *
    * @return (query_id, neighbor_id, cos, rank ≤ k) for every non-null,
    *         bucketed row.
    */
  def knnJoin(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int = 10, nbits: Int = 8, probes: Int = 4, seed: Long = 42L,
      maxBucket: Int = 4096, eager: Boolean = true): DataFrame = {
    val sigOf = rhpSignature(dim, nbits, seed)
    val vecs = Par.ensure(df.select(col(idCol).as("id"), col(vecCol).as("v")))
    // (id, 64-bit signature) — tiny — but consumed by THREE branches (query
    // probes, neighbor buckets, hot-bucket census); checkpoint so the
    // vector scan + hyperplane projection run once, not three times.
    // `eager = false` (the SQL table-function mode) keeps the composition
    // fully lazy instead — no jobs at plan/EXPLAIN time, the narrow
    // signature projection re-evaluates per branch at execution.
    val sig0 = vecs.select(col("id"), sigOf(col("v")).as("__sig"))
    val sig = if (eager) sig0.localCheckpoint(true) else sig0
    val qb = sig.select(col("id").as("query_id"),
      explode(probeBuckets(probes)(col("__sig"))).as("__bucket"))
    val cb = sig.select(col("id").as("neighbor_id"), col("__sig").as("__bucket"))
    val okBuckets = cb.groupBy("__bucket").agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucket).select("__bucket")
    val cand = qb.join(cb.join(okBuckets, Seq("__bucket")), Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand
      .join(vecs.select(col("id").as("query_id"), col("v").as("__qv")), Seq("query_id"))
      .join(vecs.select(col("id").as("neighbor_id"), col("v").as("__cv")), Seq("neighbor_id"))
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Remove from `corpus` every row whose embedding near-duplicates a row
    * of `reference` (cosine ≥ `threshold`) — the embedding-space form of
    * [[newspipe.ops.Dedup.dedupAgainst]]: scrub a new crawl against the
    * training set when duplication is semantic (re-encodes, paraphrases)
    * rather than textual.
    *
    * Scale shape: mirrors [[knnJoin]] — per-row RHP signatures on BOTH
    * corpora (no shuffle), corpus side multi-probes, reference side keeps
    * its exact bucket; candidates meet in one (bucket) equi-join with the
    * REFERENCE side of each bucket capped at `maxBucket`; the id-only
    * candidate pairs join vectors back for the exact cosine verify, and the
    * survivors anti-join the corpus. Never corpus × reference.
    */
  def dedupAgainstByEmbedding(corpus: DataFrame, reference: DataFrame,
      idCol: String, vecCol: String, dim: Int, threshold: Double = 0.95,
      nbits: Int = 8, probes: Int = 4, seed: Long = 42L,
      maxBucket: Int = 4096): DataFrame = {
    val sigOf = rhpSignature(dim, nbits, seed)
    val cVec = Par.ensure(corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cv")))
    val rVec = Par.ensure(reference.select(col(idCol).as("__rid"), col(vecCol).as("__rv")))
    // the REFERENCE signature frame is read twice (bucket census + candidate
    // join) — checkpoint it as in knnJoin so its signatures compute once.
    // The corpus side feeds ONLY the probe stream: single-consumer, so a
    // checkpoint there would be pure materialization overhead
    val cSig = cVec.select(col("__cid"), sigOf(col("__cv")).as("__sig"))
    val rSig = rVec.select(col("__rid"), sigOf(col("__rv")).as("__sig"))
      .localCheckpoint(true)
    val cb = cSig.select(col("__cid"),
      explode(probeBuckets(probes)(col("__sig"))).as("__bucket"))
    val rb = rSig.select(col("__rid"), col("__sig").as("__bucket"))
    val okBuckets = rb.groupBy("__bucket").agg(count(lit(1)).as("__rn"))
      .filter(col("__rn") <= maxBucket).select("__bucket")
    val cand = cb.join(rb.join(okBuckets, Seq("__bucket")), Seq("__bucket"))
      .select("__cid", "__rid").dropDuplicates("__cid", "__rid")
    val nearIds = cand
      .join(cVec, Seq("__cid")).join(rVec, Seq("__rid"))
      .filter(cosine(col("__cv"), col("__rv")) >= threshold)
      .select(col("__cid")).distinct()
    corpus.join(nearIds, col(idCol) === col("__cid"), "left_anti")
  }

  /** Multi-probe bucket set of a signature: the bucket itself plus
    * single-bit flips of the `probes − 1` lowest bits (null-signature rows
    * probe nothing). Native column expression — `probes` is known at plan
    * time, so the probe array is a literal-XOR fan-out that stays inside
    * whole-stage codegen (the UDF form this replaced broke the codegen span
    * at every probe explode).
    */
  private def probeBuckets(probes: Int)(sig: Column): Column = {
    val flips = (0 until probes - 1).map(b => sig.bitwiseXOR(lit(1L << b)))
    when(sig.isNull, array().cast("array<bigint>"))
      .otherwise(array(sig +: flips: _*))
  }

  /** IVF (inverted-file) ANN top-k: spherical k-means centroids quantize the
    * corpus into `nlist` cells; each query probes its `nprobe` nearest cells
    * and re-ranks exactly (cosine) within them.
    *
    * Scale shape: two training modes, both ending in centroids that are
    * dimension-table sized (nlist × dim doubles) and shipped by closure —
    * the corpus-side pass is one narrow projection assigning each vector to
    * its cell (no shuffle), then one join on cell id. Compared to
    * [[lshTopK]], IVF adapts its partitioning to the data distribution
    * instead of using data-oblivious hyperplanes.
    *
    *   - default: driver-side spherical k-means over a BOUNDED `takeSample`
    *     (sampleSize rows). Zero extra cluster passes; at extreme corpus
    *     scale the fixed sample stops seeing distribution tails, degrading
    *     centroid quality (recall, never correctness — the re-rank inside
    *     probed cells stays exact).
    *   - `distributedTrain = true`: k-means|| ([[kMeansParallel]]) — init
    *     and every Lloyd iteration are executor-side aggregates over the
    *     FULL vector column; the driver only ever holds O(nlist) centroids
    *     and candidates. Costs ~(2·initRounds + 1 + iters) narrow passes
    *     over the (cached) vector column — the 100-TB form.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int = 10, nlist: Int = 16, nprobe: Int = 4,
      seed: Long = 42L, sampleSize: Int = 4096, iters: Int = 8,
      distributedTrain: Boolean = false): DataFrame = {
    val centroids = if (distributedTrain) {
      val vecs = corpus.select(col(vecCol)).rdd
        .map(r => if (r.isNullAt(0)) null
          else unitVec(r.getSeq[Any](0).map(toDouble).toArray))
        .filter(_ != null)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try kMeansParallel(vecs, nlist, iters, seed)
      finally { vecs.unpersist(blocking = false); () }
    } else {
      val sample = corpus.select(col(vecCol)).rdd
        .takeSample(withReplacement = false, sampleSize, seed)
        .map(r => unitVec(r.getSeq[Any](0).map(toDouble).toArray))
        .filter(_ != null)
      sphericalKMeans(sample, nlist, iters, seed)
    }

    // native cell assignment (IvfCells.nearestCells — the corpus-side hot
    // loop); null-vector policy layered per site exactly as the UDFs did:
    // corpus rows keep cell -1, query rows probe nothing (explode of null)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      coalesce(element_at(IvfCells.nearestCells(col(vecCol), centroids, 1), 1),
        lit(-1)).as("__cell"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        explode(IvfCells.nearestCells(col(vecCol), centroids, nprobe)).as("__cell")))
    val scored = c.join(q, Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  private[ops] def toDouble(a: Any): Double = a match {
    case f: Float => f.toDouble
    case d: Double => d
    case n: Number => n.doubleValue()
  }

  private[ops] def unitVec(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0) null else v.map(_ / n)
  }

  /** Driver-side spherical k-means (max-dot assignment, mean + renormalize
    * update) over a bounded sample. Deterministic for a fixed seed.
    */
  private[ops] def sphericalKMeans(sample: Array[Array[Double]], nlist: Int,
      iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty centroid training sample")
    val rnd = new scala.util.Random(seed)
    val dim = sample.head.length
    var centroids = rnd.shuffle(sample.toVector).take(nlist).toArray
    if (centroids.length < nlist) centroids = Array.tabulate(nlist)(i =>
      centroids(i % centroids.length))
    for (_ <- 0 until iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        val c = nearestCells(centroids, v, 1).head
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else {
          val u = unitVec(sums(c).map(_ / counts(c)))
          if (u == null) centroids(c) else u
        }
      }.toArray
    }
    centroids
  }

  /** Distributed spherical k-means with k-means|| initialization (Bahmani et
    * al., VLDB'12 — the public algorithm MLlib's KMeans also implements):
    *
    *  1. seed with one sampled vector; for `initRounds` rounds, every point
    *     joins the candidate set independently with probability
    *     `oversample · d²(x) / Σd²` (d² = squared chordal distance to the
    *     nearest current candidate) — an executor-side filter whose expected
    *     yield is `oversample` per round, never a driver-side corpus sample;
    *  2. weight each candidate by the number of corpus points nearest to it
    *     (one `countByValue` pass) and reduce the ~`oversample·initRounds`
    *     weighted candidates to `nlist` seeds with a driver-side WEIGHTED
    *     lloyd (driver memory stays O(candidates · dim));
    *  3. refine with `iters` distributed Lloyd rounds: one `treeAggregate`
    *     of (per-cell vector sums, counts) per round — map-side combined,
    *     O(nlist · dim) per task, the exact shape MLlib uses at cluster
    *     scale.
    *
    * Deterministic for a fixed seed AND a fixed partitioning of `vecs` (the
    * per-partition RNG is seeded with the partition index; re-partitioning
    * the input may pick different — equally valid — candidates).
    * Pass `vecs` already unit-normalized and cached: every round re-scans it.
    */
  private[ops] def kMeansParallel(vecs: org.apache.spark.rdd.RDD[Array[Double]],
      nlist: Int, iters: Int, seed: Long, initRounds: Int = 4): Array[Array[Double]] = {
    val sc = vecs.sparkContext
    val oversample = 2.0 * nlist
    val first = vecs.takeSample(withReplacement = false, 1, seed)
    require(first.nonEmpty, "empty centroid training corpus")
    var candidates = first
    var round = 0
    var degenerate = false
    while (round < initRounds && !degenerate) {
      val bc = sc.broadcast(candidates)
      val total = vecs.map(v => minDist2(bc.value, v)).sum()
      if (total <= 0.0) degenerate = true // every point already a candidate
      else {
        val fresh = vecs.mapPartitionsWithIndex { (pi, it) =>
          val rnd = new java.util.Random(seed ^ (round * 2654435761L + pi))
          val cs = bc.value
          it.filter(v => rnd.nextDouble() < oversample * minDist2(cs, v) / total)
        }.collect()
        candidates = candidates ++ fresh
      }
      bc.destroy()
      round += 1
    }
    // candidate weights: how much corpus mass each candidate represents
    val bcCand = sc.broadcast(candidates)
    val counts = vecs.map(v => nearestCells(bcCand.value, v, 1).head).countByValue()
    bcCand.destroy()
    val weights = candidates.indices.map(i => counts.getOrElse(i, 0L).toDouble.max(1.0)).toArray
    var centroids = weightedKMeans(candidates, weights, nlist, seed)
    // distributed Lloyd refinement
    val dim = centroids.head.length
    for (_ <- 0 until iters) {
      val bc = sc.broadcast(centroids)
      val (sums, cnts) = vecs.treeAggregate(
        (Array.fill(nlist)(new Array[Double](dim)), new Array[Long](nlist)))(
        seqOp = { case ((s, c), v) =>
          val cell = nearestCells(bc.value, v, 1).head
          val row = s(cell)
          var i = 0
          while (i < dim && i < v.length) { row(i) += v(i); i += 1 }
          c(cell) += 1
          (s, c)
        },
        combOp = { case ((s1, c1), (s2, c2)) =>
          var j = 0
          while (j < nlist) {
            val a = s1(j); val b = s2(j)
            var i = 0
            while (i < dim) { a(i) += b(i); i += 1 }
            c1(j) += c2(j)
            j += 1
          }
          (s1, c1)
        })
      bc.destroy()
      centroids = centroids.indices.map { c =>
        if (cnts(c) == 0) centroids(c)
        else {
          val u = unitVec(sums(c).map(_ / cnts(c)))
          if (u == null) centroids(c) else u
        }
      }.toArray
    }
    centroids
  }

  /** Driver-side weighted spherical lloyd over the k-means|| candidate set
    * (a few hundred vectors): seeds = top-`nlist` candidates by weight,
    * then 20 weighted mean/renormalize rounds.
    */
  private def weightedKMeans(cands: Array[Array[Double]], w: Array[Double],
      nlist: Int, seed: Long): Array[Array[Double]] = {
    val dim = cands.head.length
    var centroids = cands.indices.sortBy(i => (-w(i), i)).take(nlist)
      .map(cands(_)).toArray
    if (centroids.length < nlist)
      centroids = Array.tabulate(nlist)(i => centroids(i % centroids.length))
    for (_ <- 0 until 20) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Double](nlist)
      cands.indices.foreach { ci =>
        val v = cands(ci)
        val c = nearestCells(centroids, v, 1).head
        counts(c) += w(ci)
        var i = 0
        while (i < dim) { sums(c)(i) += v(i) * w(ci); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else {
          val u = unitVec(sums(c).map(_ / counts(c)))
          if (u == null) centroids(c) else u
        }
      }.toArray
    }
    centroids
  }

  /** Squared chordal distance to the nearest candidate (2 − 2·maxdot on the
    * unit sphere), floored at 0 against rounding.
    */
  private def minDist2(cands: Array[Array[Double]], v: Array[Double]): Double = {
    var best = Double.NegativeInfinity
    var c = 0
    while (c < cands.length) {
      val cent = cands(c)
      var s = 0.0
      var i = 0
      val len = math.min(cent.length, v.length)
      while (i < len) { s += cent(i) * v(i); i += 1 }
      if (s > best) best = s
      c += 1
    }
    math.max(0.0, 2.0 - 2.0 * best)
  }

  /** Indices of the `n` centroids with the largest dot product against `v`. */
  private def nearestCells(centroids: Array[Array[Double]], v: Array[Double],
      n: Int): Array[Int] = {
    val scored = centroids.indices.map { c =>
      val cent = centroids(c)
      var s = 0.0; var i = 0
      val len = math.min(cent.length, v.length)
      while (i < len) { s += cent(i) * v(i); i += 1 }
      (c, s)
    }
    scored.sortBy { case (c, s) => (-s, c) }.take(n).map(_._1).toArray
  }

  /** Per-band RHP signatures: band b gets its own hyperplane set (seed + b),
    * all bands computed in ONE pass over the vector (bands × nbits planes in
    * a single codegen reference object — native
    * [[newspipe.functions.RhpBandSignaturesExpr]]). Band 0 reproduces the
    * DOUBLE-accumulation form of [[rhpSignature]]'s math; inputs are cast
    * to array<double> (identity for double columns, exact widening for
    * float — the same up-cast the old UDF's `Seq[Double]` binding did).
    */
  private[ops] def rhpBandSignatures(dim: Int, bands: Int, nbits: Int,
      seed: Long): Column => Column = {
    val planes: Array[Array[Array[Float]]] =
      Array.tabulate(bands)(b => hyperplanes(dim, nbits, seed + b))
    (c: Column) => newspipe.functions.Rhp.bandSignatures(c, planes)
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold):
    * banded RHP LSH buckets → in-bucket candidate pairs (join form, see
    * [[BucketedPairs]]) → exact cosine filter. The embedding-space analog of
    * [[Dedup.minhashCandidates]]: a pair is a candidate if ANY of its `bands`
    * nbits-bit signatures collide, so the miss probability for a pair at
    * angle θ is (1 − (1 − θ/π)^nbits)^bands — bands buy recall at high
    * thresholds, nbits prunes the candidate volume.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95, nbits: Int = 12, bands: Int = 1,
      seed: Long = 42L, maxBucket: Int = 2000): DataFrame = {
    val sigOf = rhpBandSignatures(dim, bands, nbits, seed)
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // candidate generation is ID-ONLY: carrying the vectors through the
    // band explode would replicate the corpus payload `bands`× through the
    // bucket shuffle and again through the pair dedup. Instead the (small)
    // deduped candidate set joins the vectors back — the same
    // verify-joins-payload-back shape as Dedup.jaccardVerify, and AQE
    // broadcasts the candidate side so the corpus never reshuffles.
    val sigd = vecs.select(col("id"),
      posexplode(sigOf(col("v"))).as(Seq("band", "bucket")))
    val cand = BucketedPairs.pairs(sigd, Seq("band", "bucket"), "id", Nil, maxBucket)
      .dropDuplicates("id_a", "id_b")
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Within-corpus semantic (embedding-space) dedup — the SemDeDup pattern
    * (Abbas et al. 2023, arXiv:2303.09540): near-duplicate pairs from banded
    * RHP LSH + exact cosine verification ([[cosineNearDupPairs]]), transitive
    * grouping by connected components, one keeper (the min id) per semantic
    * cluster. The embedding-space analog of [[Dedup.minhashDedupClustered]] —
    * it collapses paraphrase/re-render duplicates that share no exact n-gram.
    *
    * Scale shape: inherits the pair generator's — id-only banded candidates
    * with hot buckets capped at `maxBucket`, vectors joined back once for the
    * exact verify — and the component step runs pointer-doubling label
    * propagation over the near-pair EDGE set (duplicate-volume-sized, not
    * corpus-sized). The corpus itself pays one signature projection and one
    * final anti-join.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, nbits: Int = 12, bands: Int = 1,
      seed: Long = 42L, maxBucket: Int = 2000): DataFrame = {
    val pairs = cosineNearDupPairs(df, idCol, vecCol, dim, threshold, nbits,
      bands, seed, maxBucket)
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
