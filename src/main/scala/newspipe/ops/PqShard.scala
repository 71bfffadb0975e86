package newspipe.ops

/** Per-file product-quantization shard kernel for the persisted vector
  * index (`kind = pq`) — the memory-compressed third kind beside the
  * HNSW graph and the IVF-Flat cells. Each IMMUTABLE data file trains
  * its OWN codebooks (`m` subspaces × `k ≤ 256` centroids over the
  * file's unit vectors — per-file training needs no global pass and,
  * like every shard artifact, never invalidates) and stores ONLY
  * codebooks + `m`-byte codes: the per-vector footprint drops from
  * `dim × 8` bytes to `m` bytes (~64× at dim=64, m=8). Search builds
  * one ADC lookup table per query per shard and scans the codes for a
  * SHORTLIST; [[newspipe.io.Lake.vectorSearch]] then re-ranks the
  * shortlist EXACTLY against the candidates' true vectors (a bounded,
  * column-pruned id scan — FAISS's refine step), so final ranks are
  * exact-cosine while the corpus-wide scan cost stays on the
  * compressed codes.
  *
  * At 100 TB: a billion 64-dim float64 embeddings are 512 GB of shard
  * bytes under hnsw/ivf kinds but 8 GB of PQ codes — shards an
  * executor can hold entirely in page cache; the refine step touches
  * only `shortlist × dim` floats per query batch.
  *
  * DETERMINISM: ascending-id insertion, centroid init = the first `k`
  * rows of the sorted input cycled ([[IvfFlat]]'s rule), fixed
  * iteration count, assignment ties break to the lowest centroid id —
  * identical artifacts and shortlists run to run.
  */
object PqShard {

  private val Magic = 0x4c4b5051 // "LKPQ"

  /** The effective subspace count: the largest divisor of `dim` that is
    * `<= want` — a 17-dim corpus under the default m=8 degrades to m=1
    * (coarser compression) rather than refusing; coverage beats tuning.
    */
  private[newspipe] def mFor(dim: Int, want: Int): Int = {
    var m = math.max(1, math.min(want, dim))
    while (m > 1 && dim % m != 0) m -= 1
    m
  }

  private def nearest(cents: Array[Array[Double]], p: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      var d = 0.0
      var t = 0
      while (t < p.length) { val x = p(t) - cents(j)(t); d += x * x; t += 1 }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /** Deterministic Lloyd: first-k-cycled init, fixed iterations, emptied
    * clusters keep their centroid — no randomness anywhere.
    */
  private def lloydDet(points: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    val dsub = points.head.length
    var cents = Array.tabulate(k)(i => points(i % points.length).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dsub))
      val counts = new Array[Int](k)
      points.foreach { p =>
        val c = nearest(cents, p)
        counts(c) += 1
        var t = 0
        while (t < dsub) { sums(c)(t) += p(t); t += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
      it += 1
    }
    cents
  }

  private[newspipe] def buildShardBytes(rows: Array[(Long, Array[Double])],
      mWant: Int = 8, kWant: Int = 256, iters: Int = 8): Array[Byte] = {
    val sorted = rows.sortBy(_._1)
    val ids = sorted.map(_._1)
    val vecs = sorted.map(r => Hnsw.unitOrZero(r._2))
    val dim = if (vecs.isEmpty) 0 else vecs(0).length
    val m = if (dim == 0) 1 else mFor(dim, mWant)
    val dsub = if (dim == 0) 0 else dim / m
    val k = math.max(1, math.min(math.min(kWant, 256),
      math.max(1, vecs.length)))
    val cents: Array[Array[Array[Double]]] =
      if (vecs.isEmpty || dim == 0) Array.empty
      else Array.tabulate(m) { i =>
        val sub = vecs.map(v =>
          java.util.Arrays.copyOfRange(v, i * dsub, (i + 1) * dsub))
        lloydDet(sub, k, iters)
      }
    val bos = new java.io.ByteArrayOutputStream(
      64 + m * k * dsub * 8 + ids.length * (8 + m))
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(m); out.writeInt(k); out.writeInt(dsub)
    out.writeInt(ids.length)
    cents.foreach(_.foreach(_.foreach(out.writeDouble)))
    var i = 0
    while (i < ids.length) {
      out.writeLong(ids(i))
      val v = vecs(i)
      var s = 0
      while (s < m) {
        out.writeByte(
          if (dsub == 0) 0
          else nearest(cents(s),
            java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub)))
        s += 1
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Routing summary of a serialized PQ shard — (row count, mean of the
    * RECONSTRUCTED vectors, minCos = -1): the stored codes are lossy,
    * so the centroid is approximate, which SEARCH routing tolerates by
    * design — but an approximate radius is NOT a sound pruning bound,
    * so minCos stays -1 (never pruned; the threshold-scan leg does not
    * use pq artifacts anyway). Computed as the code-histogram-weighted
    * mean of the codebook entries — O(n·m + m·k·dsub), no per-row
    * reconstruction.
    */
  private[newspipe] def centroidOfShardBytes(
      bytes: Array[Byte]): (Int, Array[Double], Double) = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == Magic,
      "not a serialized PQ shard (bad magic)")
    val m = in.readInt(); val k = in.readInt(); val dsub = in.readInt()
    val n = in.readInt()
    val flat = new Array[Double](m * k * dsub)
    var fi = 0
    while (fi < flat.length) { flat(fi) = in.readDouble(); fi += 1 }
    if (n == 0 || dsub == 0) return (n, Array.empty, -1.0)
    val hist = Array.ofDim[Int](m, k)
    var r = 0
    val code = new Array[Byte](m)
    while (r < n) {
      in.readLong()
      in.readFully(code)
      var s = 0
      while (s < m) { hist(s)(code(s) & 0xff) += 1; s += 1 }
      r += 1
    }
    val mean = new Array[Double](m * dsub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < k) {
        val w = hist(s)(j).toDouble / n
        if (w > 0) {
          val base = (s * k + j) * dsub
          var t = 0
          while (t < dsub) { mean(s * dsub + t) += w * flat(base + t); t += 1 }
        }
        j += 1
      }
      s += 1
    }
    (n, mean, -1.0)
  }

  /** ADC shortlist per query — (query_id, member_id, adc_score), the
    * local top-`fetch` by (score desc, id asc). Scores are APPROXIMATE
    * (quantized); the caller re-ranks them exactly.
    */
  private[newspipe] def searchShardBytes(bytes: Array[Byte],
      queries: Array[(Long, Array[Double])], fetch: Int)
      : Iterator[(Long, Long, Double)] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == Magic,
      "not a serialized PQ shard (bad magic)")
    val m = in.readInt(); val k = in.readInt(); val dsub = in.readInt()
    val n = in.readInt()
    val flat = new Array[Double](m * k * dsub)
    var fi = 0
    while (fi < flat.length) { flat(fi) = in.readDouble(); fi += 1 }
    val ids = new Array[Long](n)
    val codes = new Array[Byte](n * m)
    var r = 0
    while (r < n) {
      ids(r) = in.readLong()
      in.readFully(codes, r * m, m)
      r += 1
    }
    queries.iterator.flatMap { case (qid, qraw) =>
      val q = Hnsw.unitOrZero(qraw)
      // LUT: lut(i*k + j) = dot(query subvector i, centroid ij)
      val lut = new Array[Double](m * k)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < k) {
          var s = 0.0
          var t = 0
          val base = (i * k + j) * dsub
          val qBase = i * dsub
          while (t < dsub && qBase + t < q.length) {
            s += q(qBase + t) * flat(base + t); t += 1
          }
          lut(i * k + j) = s
          j += 1
        }
        i += 1
      }
      // worst-first bounded heap, ties to the lower id (IvfFlat's rule)
      val heap = new java.util.PriorityQueue[(Double, Long)](
        (a: (Double, Long), b: (Double, Long)) => {
          val s = java.lang.Double.compare(a._1, b._1)
          if (s != 0) s else java.lang.Long.compare(b._2, a._2)
        })
      var row = 0
      while (row < n) {
        var s = 0.0
        var sub = 0
        while (sub < m) {
          s += lut(sub * k + (codes(row * m + sub) & 0xff))
          sub += 1
        }
        if (heap.size < fetch) heap.add((s, ids(row)))
        else if (s > heap.peek()._1 ||
            (s == heap.peek()._1 && ids(row) < heap.peek()._2)) {
          heap.poll(); heap.add((s, ids(row)))
        }
        row += 1
      }
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      while (!heap.isEmpty) {
        val (s, id) = heap.poll()
        buf += ((qid, id, s))
      }
      buf.iterator
    }
  }
}
