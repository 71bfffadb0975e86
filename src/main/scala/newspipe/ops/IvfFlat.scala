package newspipe.ops

/** IVF-Flat shard kernel for the persisted vector index
  * ([[newspipe.io.VectorIndex]] `kind = ivf`): per data file, a local
  * k-means partitions the file's unit vectors into `nlist` cells; the
  * artifact stores the centroids plus the FULL vectors grouped by cell,
  * and a search probes only the `nprobe` nearest cells with EXACT dot
  * products — recall loss comes solely from cell selection, never from
  * quantized distances (the honest small-shard trade: PQ's lossy codes
  * buy memory at 10⁹-vector single-index scale, but per-file shards are
  * bounded by file size, so exact in-cell distances cost little and keep
  * planted-twin determinism provable).
  *
  * vs the HNSW kind: build is a few k-means passes (cheaper than graph
  * insertion), search scans nprobe/nlist of the shard (more work than a
  * graph walk at high recall). Pick ivf for write-heavy corpora, hnsw
  * for read-heavy ones; both ride the same content-addressed artifact
  * and maintenance machinery.
  *
  * DETERMINISM: rows are inserted ascending-id, initial centroids are
  * the first `nlist` rows of the sorted input, iteration count is
  * fixed, assignment ties break to the lowest cell index — identical
  * artifacts and search results run to run.
  */
object IvfFlat {

  private val Magic = 0x4c4b4931 // "LKI1"

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Assign each vector to its max-dot centroid (ties → lowest cell). */
  private def assign(vecs: Array[Array[Double]],
      centroids: Array[Array[Double]]): Array[Int] =
    vecs.map { v =>
      var best = 0; var bestS = Double.NegativeInfinity
      var c = 0
      while (c < centroids.length) {
        val s = dot(v, centroids(c))
        if (s > bestS) { bestS = s; best = c }
        c += 1
      }
      best
    }

  /** Deterministic k-means over UNIT vectors for callers beyond the
    * shard builder ([[newspipe.io.Lake]]'s vector-clustering OPTIMIZE):
    * same rules as the artifact build — first-k init over the given
    * order, fixed iterations, max-dot assignment with ties to the
    * lowest cell, emptied cells keep their centroid. Input vectors must
    * already be unit ([[Hnsw.unitOrZero]]).
    */
  private[newspipe] def trainCentroids(vecs: Array[Array[Double]],
      k0: Int, iters: Int = 8): Array[Array[Double]] = {
    require(vecs.nonEmpty, "trainCentroids needs at least one vector")
    val k = math.max(1, math.min(k0, vecs.length))
    val dim = vecs(0).length
    var centroids = Array.tabulate(k)(i => vecs(i).clone())
    var it = 0
    while (it < iters) {
      val cells = assign(vecs, centroids)
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      var i = 0
      while (i < vecs.length) {
        val c = cells(i); counts(c) += 1
        val v = vecs(i); val s = sums(c)
        var j = 0
        while (j < dim) { s(j) += v(j); j += 1 }
        i += 1
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c)
        else Hnsw.unitOrZero(sums(c).map(_ / counts(c))))
      it += 1
    }
    centroids
  }

  /** One vector's max-dot cell (ties → lowest index) — the assignment
    * rule [[trainCentroids]] and the clustering rewrite share.
    */
  private[newspipe] def assignOne(v: Array[Double],
      centroids: Array[Array[Double]]): Int = {
    var best = 0; var bestS = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val s = dot(v, centroids(c))
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  /** Build one shard artifact over `(id, rawVector)` rows. */
  private[newspipe] def buildShardBytes(rows: Array[(Long, Array[Double])],
      nlist: Int = 64, iters: Int = 8): Array[Byte] = {
    val sorted = rows.sortBy(_._1)
    val ids = sorted.map(_._1)
    val vecs = sorted.map(r => Hnsw.unitOrZero(r._2))
    val k = math.max(1, math.min(nlist, vecs.length))
    val dim = if (vecs.isEmpty) 0 else vecs(0).length
    // deterministic seeding: the first k rows of the sorted input
    var centroids = Array.tabulate(k)(i => vecs(i).clone())
    var it = 0
    while (it < iters && vecs.nonEmpty) {
      val cells = assign(vecs, centroids)
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      var i = 0
      while (i < vecs.length) {
        val c = cells(i); counts(c) += 1
        val v = vecs(i); val s = sums(c)
        var j = 0
        while (j < dim) { s(j) += v(j); j += 1 }
        i += 1
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c) // empty cell keeps its centroid
        else Hnsw.unitOrZero(sums(c).map(_ / counts(c))))
      it += 1
    }
    val cells = if (vecs.isEmpty) Array.empty[Int] else assign(vecs, centroids)
    val byCell = Array.fill(k)(Vector.newBuilder[Int])
    var i = 0
    while (i < cells.length) { byCell(cells(i)) += i; i += 1 }
    val bos = new java.io.ByteArrayOutputStream(
      64 + k * dim * 8 + vecs.length * (8 + dim * 8))
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(k); out.writeInt(dim); out.writeInt(vecs.length)
    centroids.foreach(c => c.foreach(out.writeDouble))
    byCell.foreach { b =>
      val members = b.result()
      out.writeInt(members.length)
      members.foreach { m =>
        out.writeLong(ids(m))
        vecs(m).foreach(out.writeDouble)
      }
    }
    out.flush()
    bos.toByteArray
  }

  /** Search a serialized shard: per query, rank centroids by dot, scan
    * the `nprobe` nearest cells with exact dot products, emit the local
    * top-k (query_id, neighbor_id, cos) — the caller merges globally and
    * filters self-matches, same contract as [[Hnsw.searchGraphBytes]].
    */
  private[newspipe] def searchShardBytes(bytes: Array[Byte],
      queries: Array[(Long, Array[Double])], k: Int,
      nprobe: Int = 8): Iterator[(Long, Long, Double)] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == Magic,
      "not a serialized IVF-Flat shard (bad magic)")
    val nlist = in.readInt(); val dim = in.readInt(); val n = in.readInt()
    val centroids = Array.fill(nlist) {
      val c = new Array[Double](dim)
      var j = 0
      while (j < dim) { c(j) = in.readDouble(); j += 1 }
      c
    }
    val cellIds = new Array[Array[Long]](nlist)
    val cellVecs = new Array[Array[Array[Double]]](nlist)
    var c = 0
    while (c < nlist) {
      val cnt = in.readInt()
      val ids = new Array[Long](cnt)
      val vs = new Array[Array[Double]](cnt)
      var m = 0
      while (m < cnt) {
        ids(m) = in.readLong()
        val v = new Array[Double](dim)
        var j = 0
        while (j < dim) { v(j) = in.readDouble(); j += 1 }
        vs(m) = v
        m += 1
      }
      cellIds(c) = ids; cellVecs(c) = vs
      c += 1
    }
    val _ = n
    queries.iterator.flatMap { case (qid, qraw) =>
      val q = Hnsw.unitOrZero(qraw)
      // rank cells by centroid dot (ties → lowest cell), probe the best
      val order = centroids.indices
        .sortBy(ci => (-dot(q, centroids(ci)), ci))
        .take(math.max(1, nprobe))
      // local top-k: bounded worst-first heap
      val heap = new java.util.PriorityQueue[(Double, Long)](
        (a: (Double, Long), b: (Double, Long)) => {
          val s = java.lang.Double.compare(a._1, b._1)
          if (s != 0) s else java.lang.Long.compare(b._2, a._2)
        })
      order.foreach { ci =>
        val ids = cellIds(ci); val vs = cellVecs(ci)
        var m = 0
        while (m < ids.length) {
          val s = dot(q, vs(m))
          if (heap.size < k) heap.add((s, ids(m)))
          else if (s > heap.peek()._1 ||
              (s == heap.peek()._1 && ids(m) < heap.peek()._2)) {
            heap.poll(); heap.add((s, ids(m)))
          }
          m += 1
        }
      }
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      while (!heap.isEmpty) {
        val (s, id) = heap.poll()
        buf += ((qid, id, s))
      }
      buf.iterator
    }
  }

  /** Routing summary of a serialized shard — (row count, unnormalized
    * mean of the stored unit vectors, min member cosine to the
    * normalized mean): [[Hnsw.centroidOfGraphBytes]]' contract for the
    * ivf kind.
    */
  private[newspipe] def centroidOfShardBytes(
      bytes: Array[Byte]): (Int, Array[Double], Double) = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == Magic,
      "not a serialized IVF-Flat shard (bad magic)")
    val nlist = in.readInt(); val dim = in.readInt(); in.readInt()
    var skip = 0
    while (skip < nlist * dim) { in.readDouble(); skip += 1 }
    val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var c = 0
    while (c < nlist) {
      val cnt = in.readInt()
      var m = 0
      while (m < cnt) {
        in.readLong()
        val v = new Array[Double](dim)
        var j = 0
        while (j < dim) { v(j) = in.readDouble(); j += 1 }
        vecs += v
        m += 1
      }
      c += 1
    }
    if (vecs.isEmpty) (0, Array.empty, -1.0)
    else {
      val (mean, minCos) = Hnsw.meanAndMinCos(vecs)
      (vecs.length, mean, minCos)
    }
  }

  /** EXACT cosine-threshold scan of a serialized shard: every
    * (query_id, member_id, cos) with `cos >= threshold`, visiting ALL
    * cells — no probe selection, so recall is 1.0 by construction (the
    * semantic-near-dup leg; [[Hnsw.scanGraphBytes]]'s contract for the
    * ivf kind).
    */
  private[newspipe] def scanShardBytes(bytes: Array[Byte],
      queries: Array[(Long, Array[Double])],
      threshold: Double): Iterator[(Long, Long, Double)] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == Magic,
      "not a serialized IVF-Flat shard (bad magic)")
    val nlist = in.readInt(); val dim = in.readInt(); in.readInt()
    var skip = 0
    while (skip < nlist * dim) { in.readDouble(); skip += 1 }
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var c = 0
    while (c < nlist) {
      val cnt = in.readInt()
      var m = 0
      while (m < cnt) {
        ids += in.readLong()
        val v = new Array[Double](dim)
        var j = 0
        while (j < dim) { v(j) = in.readDouble(); j += 1 }
        vecs += v
        m += 1
      }
      c += 1
    }
    queries.iterator.flatMap { case (qid, qraw) =>
      val q = Hnsw.unitOrZero(qraw)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var i = 0
      while (i < vecs.length) {
        val s = dot(q, vecs(i))
        if (s >= threshold) out += ((qid, ids(i), s))
        i += 1
      }
      out.iterator
    }
  }
}
