package newspipe.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HNSW approximate nearest neighbor (Malkov & Yashunin 2016,
  * "Efficient and robust approximate nearest neighbor search using
  * Hierarchical Navigable Small World graphs") — the graph-ANN standard
  * beside the IVF/PQ family ([[Similarity.ivfTopK]], [[Pq]]).
  *
  * Spark shape — the Lucene-segment arrangement, not a single global
  * graph: the corpus is hash-sharded, each partition builds its own
  * in-memory HNSW over its shard inside ONE `mapPartitions` pass and
  * immediately searches it for the (broadcast) query batch; per-shard
  * top-k candidates then merge to the global top-k with one
  * small-keyspace window. Build cost O((n/P)·log(n/P)·M) per shard IN
  * PARALLEL, search cost O(P·ef·log) per query — at 100 TB the graphs
  * never leave executor memory, nothing all-pairs, and the shuffle is
  * only the (queries × P × k)-row candidate set. Queries ride a
  * broadcast (the [[Similarity.bruteForceTopK]] contract: queries are
  * the small side).
  *
  * DETERMINISM: node levels derive from a splitmix64 hash of the vector
  * id (not a Random), shards are hash-of-id, and each shard inserts in
  * ascending-id order — two runs build byte-identical graphs, so the
  * driver's hash-compare contract holds.
  *
  * Reference: the reference pipeline has no ANN (790-line demo); this is
  * part of the LLM-training-data extension track (SemDeDup/retrieval
  * need a fast neighbor primitive at corpus scale).
  */
object Hnsw {

  /** splitmix64 → uniform in (0, 1]; the deterministic level source. */
  private def levelOf(id: Long, mL: Double): Int = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    // map to (0,1]: top 53 bits as a double, never exactly 0
    val u = ((z >>> 11) + 1).toDouble / (1L << 53).toDouble
    (-math.log(u) * mL).toInt
  }

  /** One shard's HNSW graph over unit vectors; similarity = dot product
    * (cosine on unit vectors), higher is nearer. Members are
    * object-default-visible (the class itself is Hnsw-private) so the
    * companion-style [[Hnsw.readGraph]] can restore state byte-exactly.
    */
  private final class ShardGraph(val m: Int, val efConstruction: Int) {
    private val mL = 1.0 / math.log(m.toDouble)
    val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val levels = scala.collection.mutable.ArrayBuffer.empty[Int]
    // adjacency(node)(level) = neighbor node indexes
    val adj = scala.collection.mutable.ArrayBuffer
      .empty[Array[scala.collection.mutable.ArrayBuffer[Int]]]
    var entry: Int = -1
    var topLevel: Int = -1

    private def sim(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }

    /** Beam search one layer: the ef most similar nodes to q reachable
      * from `eps`, standard candidate/result double heap.
      */
    private def searchLayer(q: Array[Double], eps: Seq[Int], ef: Int,
        level: Int): Array[Int] = {
      val visited = new java.util.HashSet[Integer]()
      // candidates: BEST first; results: WORST first (bounded to ef)
      val cand = new java.util.PriorityQueue[(Double, Int)](
        (a: (Double, Int), b: (Double, Int)) => java.lang.Double.compare(b._1, a._1))
      val res = new java.util.PriorityQueue[(Double, Int)](
        (a: (Double, Int), b: (Double, Int)) => java.lang.Double.compare(a._1, b._1))
      eps.foreach { e =>
        if (visited.add(e)) {
          val s = sim(q, vecs(e)); cand.add((s, e)); res.add((s, e))
          if (res.size > ef) res.poll()
        }
      }
      var done = false
      while (!done && !cand.isEmpty) {
        val (cs, c) = cand.poll()
        if (res.size >= ef && cs < res.peek()._1) done = true
        else {
          val ns = adj(c)(level)
          var i = 0
          while (i < ns.length) {
            val n = ns(i)
            if (visited.add(n)) {
              val s = sim(q, vecs(n))
              if (res.size < ef || s > res.peek()._1) {
                cand.add((s, n)); res.add((s, n))
                if (res.size > ef) res.poll()
              }
            }
            i += 1
          }
        }
      }
      val out = new Array[Int](res.size)
      var i = out.length - 1
      while (i >= 0) { out(i) = res.poll()._2; i -= 1 } // best first
      out
    }

    /** Malkov & Yashunin Algorithm 4 (SELECT-NEIGHBORS-HEURISTIC, the
      * diversity heuristic): walk `cands` nearest-to-base first and keep
      * a candidate only if it is closer to the base than to every
      * already-kept neighbor. Plain top-M selection drops all of a
      * node's degree budget inside its own cluster — on clustered
      * corpora the shard graph fragments into islands and recall
      * collapses for cross-cluster queries; the heuristic forces kept
      * edges to point in DIFFERENT directions, so inter-cluster bridges
      * survive. Skipped candidates backfill to `cap` nearest-first
      * (keepPrunedConnections) so easy corpora keep full degree.
      * Deterministic: `cands` arrives sorted by (-sim, node).
      */
    private def selectDiverse(base: Array[Double], cands: Array[Int],
        cap: Int): Array[Int] = {
      if (cands.length <= cap) return cands
      val kept = new scala.collection.mutable.ArrayBuffer[Int](cap)
      var i = 0
      while (i < cands.length && kept.length < cap) {
        val e = cands(i)
        val toBase = sim(base, vecs(e))
        var diverse = true
        var j = 0
        while (diverse && j < kept.length) {
          if (sim(vecs(e), vecs(kept(j))) > toBase) diverse = false
          j += 1
        }
        if (diverse) kept += e
        i += 1
      }
      if (kept.length < cap) { // backfill with the best skipped
        i = 0
        while (i < cands.length && kept.length < cap) {
          if (!kept.contains(cands(i))) kept += cands(i)
          i += 1
        }
      }
      kept.toArray
    }

    /** Keep a node's neighbor list at its cap via the diversity
      * heuristic over the (-sim, node)-ordered list.
      */
    private def prune(node: Int, level: Int, cap: Int): Unit = {
      val ns = adj(node)(level)
      if (ns.length <= cap) return
      val v = vecs(node)
      val ordered = ns.map(n => (sim(v, vecs(n)), n))
        .sortBy(t => (-t._1, t._2)).map(_._2).toArray
      val kept = selectDiverse(v, ordered, cap)
      ns.clear(); ns ++= kept
    }

    def insert(id: Long, vec: Array[Double]): Unit = {
      val node = vecs.length
      val level = levelOf(id, mL)
      vecs += vec; ids += id; levels += level
      adj += Array.fill(level + 1)(
        scala.collection.mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = node; topLevel = level; return }
      var ep = entry
      // greedy descent through layers above the node's level
      var l = topLevel
      while (l > level) {
        var improved = true
        while (improved) {
          improved = false
          val best = sim(vec, vecs(ep))
          val ns = adj(ep)(l)
          var i = 0
          while (i < ns.length) {
            if (sim(vec, vecs(ns(i))) > best + 0.0) {
              ep = ns(i); improved = true; i = ns.length
            } else i += 1
          }
        }
        l -= 1
      }
      // connect on layers min(level, topLevel)..0 — new-node edges pick
      // by the diversity heuristic, not plain top-M (Algorithm 4)
      var eps: Seq[Int] = Seq(ep)
      l = math.min(level, topLevel)
      while (l >= 0) {
        val cands = searchLayer(vec, eps, efConstruction, l)
        val cap = if (l == 0) 2 * m else m
        val chosen = selectDiverse(vec, cands, m)
        chosen.foreach { n =>
          adj(node)(l) += n
          adj(n)(l) += node
          prune(n, l, cap)
        }
        eps = cands.take(math.max(1, m)).toSeq
        l -= 1
      }
      if (level > topLevel) { topLevel = level; entry = node }
    }

    def size: Int = vecs.length

    /** Nodes reachable from the entry point following level-0 edges
      * (directed — prune can drop one direction): the searchable set. A
      * healthy graph reaches every node; fragmentation here is exactly
      * what the diversity heuristic prevents on clustered corpora.
      */
    def reachableAtLevel0: Int = {
      if (entry < 0) return 0
      val seen = new java.util.BitSet(vecs.length)
      var stack: List[Int] = entry :: Nil
      seen.set(entry)
      var count = 0
      while (stack.nonEmpty) {
        val n = stack.head; stack = stack.tail; count += 1
        val ns = adj(n)(0)
        var i = 0
        while (i < ns.length) {
          if (!seen.get(ns(i))) { seen.set(ns(i)); stack = ns(i) :: stack }
          i += 1
        }
      }
      count
    }

    /** Top-k (id, similarity) for a query vector; the query's own id is
      * the CALLER's concern (global filter). */
    def search(q: Array[Double], k: Int, efSearch: Int): Array[(Long, Double)] = {
      if (entry < 0) return Array.empty
      var ep = entry
      var l = topLevel
      while (l > 0) {
        var improved = true
        while (improved) {
          improved = false
          val best = sim(q, vecs(ep))
          val ns = adj(ep)(l)
          var i = 0
          while (i < ns.length) {
            if (sim(q, vecs(ns(i))) > best) {
              ep = ns(i); improved = true; i = ns.length
            } else i += 1
          }
        }
        l -= 1
      }
      val found = searchLayer(q, Seq(ep), math.max(efSearch, k), 0)
      found.take(k).map(n => (ids(n), sim(q, vecs(n))))
    }
  }

  /** Diagnostic/spec hook: build ONE in-memory shard graph exactly the
    * way a shard task does (unit-normalize, ascending-id insertion) and
    * report (size, nodes reachable from the entry point at level 0).
    */
  private[ops] def localGraphStats(rows: Array[(Long, Array[Double])],
      m: Int = 16, efConstruction: Int = 128): (Int, Int) = {
    val g = new ShardGraph(m, efConstruction)
    rows.sortBy(_._1).foreach { case (id, v) =>
      g.insert(id, Similarity.unitVec(v)) }
    (g.size, g.reachableAtLevel0)
  }

  // ---- persisted-index (de)serialization -----------------------------------
  //
  // The [[newspipe.io.Lake]] vector-index layer stores ONE serialized
  // shard graph per immutable data file (content-addressed — a data file
  // never changes, so its graph never invalidates). Build and search are
  // exposed as byte-level functions so the lake side never touches graph
  // internals. Format (all big-endian via DataOutputStream):
  //   magic 'LKG1', m, efConstruction, n, dim,
  //   ids[n], levels[n], vecs[n*dim] (unit-normalized doubles — the exact
  //   values the in-memory path computes, so persisted and rebuilt
  //   searches return identical results), adjacency (per node, per level
  //   0..levels(node): count + neighbor indexes), entry, topLevel.

  private val GraphMagic = 0x4c4b4731 // "LKG1"

  /** All-zero vectors normalize to themselves (cos 0 against everything,
    * never a top-k hit) instead of unitVec's null — a corpus row with a
    * zero embedding must not poison its file's shard build.
    */
  private[newspipe] def unitOrZero(v: Array[Double]): Array[Double] = {
    val u = Similarity.unitVec(v)
    if (u == null) new Array[Double](v.length) else u
  }

  /** Build one shard graph over `(id, rawVector)` rows (any numeric array
    * element type; unit-normalized and inserted ascending-id exactly like
    * the in-memory path) and serialize it.
    */
  private[newspipe] def buildGraphBytes(rows: Array[(Long, Array[Double])],
      m: Int = 16, efConstruction: Int = 128): Array[Byte] = {
    val g = new ShardGraph(m, efConstruction)
    rows.sortBy(_._1).foreach { case (id, v) =>
      g.insert(id, unitOrZero(v)) }
    val bos = new java.io.ByteArrayOutputStream(
      64 + rows.length * (8 + 4) + rows.map(_._2.length).sum * 8)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(GraphMagic)
    out.writeInt(g.m); out.writeInt(g.efConstruction)
    out.writeInt(g.vecs.length)
    out.writeInt(if (g.vecs.isEmpty) 0 else g.vecs(0).length)
    g.ids.foreach(out.writeLong)
    g.levels.foreach(out.writeInt)
    g.vecs.foreach(v => v.foreach(out.writeDouble))
    var n = 0
    while (n < g.vecs.length) {
      var l = 0
      while (l <= g.levels(n)) {
        val ns = g.adj(n)(l)
        out.writeInt(ns.length)
        ns.foreach(out.writeInt)
        l += 1
      }
      n += 1
    }
    out.writeInt(g.entry); out.writeInt(g.topLevel)
    out.flush()
    bos.toByteArray
  }

  private def readGraph(bytes: Array[Byte]): ShardGraph = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == GraphMagic,
      "not a serialized HNSW shard graph (bad magic)")
    val m = in.readInt(); val efC = in.readInt()
    val g = new ShardGraph(m, efC)
    val n = in.readInt(); val dim = in.readInt()
    var i = 0
    while (i < n) { g.ids += in.readLong(); i += 1 }
    i = 0
    while (i < n) { g.levels += in.readInt(); i += 1 }
    i = 0
    while (i < n) {
      val v = new Array[Double](dim)
      var j = 0
      while (j < dim) { v(j) = in.readDouble(); j += 1 }
      g.vecs += v
      i += 1
    }
    i = 0
    while (i < n) {
      val lvls = new Array[scala.collection.mutable.ArrayBuffer[Int]](
        g.levels(i) + 1)
      var l = 0
      while (l <= g.levels(i)) {
        val cnt = in.readInt()
        val buf = new scala.collection.mutable.ArrayBuffer[Int](cnt)
        var c = 0
        while (c < cnt) { buf += in.readInt(); c += 1 }
        lvls(l) = buf
        l += 1
      }
      g.adj += lvls
      i += 1
    }
    g.entry = in.readInt(); g.topLevel = in.readInt()
    g
  }

  /** Search a serialized shard graph for every query in the batch —
    * (query_id, neighbor_id, cos) candidates, the query's own id
    * filtered by the CALLER (global concern, same as [[hnswTopK]]).
    */
  private[newspipe] def searchGraphBytes(bytes: Array[Byte],
      queries: Array[(Long, Array[Double])], k: Int,
      efSearch: Int = 96): Iterator[(Long, Long, Double)] = {
    val g = readGraph(bytes)
    queries.iterator.flatMap { case (qid, qv) =>
      g.search(unitOrZero(qv), k, efSearch).iterator
        .map { case (nid, s) => (qid, nid, s) }
    }
  }

  /** Mean of unit vectors + the shard's angular radius as min member
    * cosine to the normalized mean (-1 when degenerate) — the routing
    * summary both backfill legs share. O(n·dim), two passes.
    */
  private[newspipe] def meanAndMinCos(
      vecs: scala.collection.Seq[Array[Double]])
      : (Array[Double], Double) = {
    if (vecs.isEmpty) return (Array.empty, -1.0)
    val dim = vecs.head.length
    val sum = new Array[Double](dim)
    vecs.foreach { v =>
      var j = 0
      while (j < dim) { sum(j) += v(j); j += 1 }
    }
    val mean = sum.map(_ / vecs.length)
    var n2 = 0.0
    mean.foreach(x => n2 += x * x)
    if (n2 == 0.0) return (mean, -1.0)
    val inv = 1.0 / math.sqrt(n2)
    var minCos = 1.0
    vecs.foreach { v =>
      var s = 0.0
      var j = 0
      while (j < dim) { s += v(j) * mean(j); j += 1 }
      val c = s * inv
      if (c < minCos) minCos = c
    }
    (mean, minCos)
  }

  /** Spherical cap-bound exclusion test — the exact-pruning kernel for
    * threshold scans over routed shards: every shard member lies within
    * `acos(minCos)` of the shard centroid, so a query at angle
    * `acos(cosQC)` from the centroid is at least `acos(cosQC) −
    * acos(minCos)` from EVERY member (triangle inequality on the
    * sphere). When that lower bound exceeds `acos(threshold)` no member
    * can reach the threshold — returns true = sound to skip the shard
    * (recall 1.0 preserved; a small slack keeps float rounding on the
    * conservative side). InvariantProperties pins the soundness law.
    */
  private[newspipe] def capExcludes(cosQC: Double, minCos: Double,
      threshold: Double): Boolean = {
    def c1(x: Double): Double = math.max(-1.0, math.min(1.0, x))
    math.acos(c1(cosQC)) - math.acos(c1(minCos)) >
      math.acos(c1(threshold)) + 1e-6
  }

  /** Routing summary of a serialized shard graph — (row count, mean of
    * the stored unit vectors unnormalized, min member cosine to the
    * normalized mean): the coarse-routing backfill for artifacts built
    * before their routing segment existed (or whose segment write
    * crashed). One deserialization, O(n·dim).
    */
  private[newspipe] def centroidOfGraphBytes(
      bytes: Array[Byte]): (Int, Array[Double], Double) = {
    val g = readGraph(bytes)
    if (g.vecs.isEmpty) return (0, Array.empty, -1.0)
    val (mean, minCos) = meanAndMinCos(g.vecs)
    (g.vecs.length, mean, minCos)
  }

  /** EXACT cosine-threshold scan of a serialized shard graph: every
    * (query_id, node_id, cos) with `cos >= threshold` — one linear pass
    * over the shard's stored (already unit-normalized) vectors, NO graph
    * traversal, so recall is 1.0 by construction. The semantic-near-dup
    * leg: a threshold join cannot ride a top-k walk (a query may have
    * more than k qualifying partners in one shard), and per-file shards
    * are small enough that the exact pass costs little.
    */
  private[newspipe] def scanGraphBytes(bytes: Array[Byte],
      queries: Array[(Long, Array[Double])],
      threshold: Double): Iterator[(Long, Long, Double)] = {
    val g = readGraph(bytes)
    queries.iterator.flatMap { case (qid, qv) =>
      val q = unitOrZero(qv)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var i = 0
      while (i < g.vecs.length) {
        val v = g.vecs(i)
        var s = 0.0
        var j = 0
        val n = math.min(q.length, v.length)
        while (j < n) { s += q(j) * v(j); j += 1 }
        if (s >= threshold) out += ((qid, g.ids(i), s))
        i += 1
      }
      out.iterator
    }
  }

  /** Raw double extraction from a Spark array value (float or double
    * elements) — NO normalization; [[buildGraphBytes]]/[[searchGraphBytes]]
    * normalize exactly once, the same single normalization the in-memory
    * path applies, so persisted and rebuilt searches agree bit-for-bit.
    */
  private[newspipe] def toRaw(a: Any): Array[Double] = a match {
    case s: scala.collection.Seq[_] =>
      s.iterator.map(Similarity.toDouble).toArray
    case arr: Array[_] => arr.iterator.map(Similarity.toDouble).toArray
  }

  private def toUnit(a: Any): Array[Double] = Similarity.unitVec(toRaw(a))

  /** ANN top-k over `corpus` for each row of `queries` — HNSW per shard,
    * global merge; output (query_id, neighbor_id, cos, rank), the
    * [[Similarity.bruteForceTopK]] shape. `shards` 0 = one graph per
    * existing corpus partition (the scale default: graphs build where
    * the data sits); > 0 forces a hash re-shard.
    */
  def hnswTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 16, efConstruction: Int = 128, efSearch: Int = 96,
      shards: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // queries are the SMALL side (bruteForce's broadcast contract):
    // collected once, shipped to every shard as one broadcast
    val qRows: Array[(Long, Array[Double])] = queries
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), toUnit(r.get(1))))
      .sortBy(_._1)
    val qB = spark.sparkContext.broadcast(qRows)
    val c0 = corpus.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
    val sharded = if (shards > 0) c0.repartition(shards, col("__id")) else c0
    val perShard = sharded.mapPartitions { it =>
      // ascending-id insertion: byte-identical graphs run to run
      val rows = it.map(r => (r.getLong(0), toUnit(r.get(1)))).toArray
        .sortBy(_._1)
      if (rows.isEmpty) Iterator.empty
      else {
        val g = new ShardGraph(m, efConstruction)
        rows.foreach { case (id, v) => g.insert(id, v) }
        qB.value.iterator.flatMap { case (qid, qv) =>
          // k+1: the query's own row may occupy one slot in its shard
          g.search(qv, k + 1, efSearch).iterator
            .filter(_._1 != qid)
            .map { case (nid, s) => (qid, nid, s) }
        }
      }
    }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    perShard.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }
}
