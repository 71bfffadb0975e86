package newspipe.ops

import org.apache.datasketches.common.ResizeFactor
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-overlap estimation via theta sketches (Apache DataSketches, on
  * Spark's own classpath) — answer "how much of corpus B is already in
  * corpus A?" WITHOUT the join. HLL (q32/q113) only unions; theta sketches
  * support set INTERSECTION and difference, which is exactly the
  * contamination / coverage question a training-data pipeline asks before
  * paying for a full anti-join scrub ([[Dedup.dedupAgainst]] is the exact
  * follow-up on the slice the estimate says is worth scrubbing).
  *
  * Build shape mirrors the house sketch pattern ([[Dedup.bloomScrub]] /
  * [[Boilerplate.frequentNgramsSketch]]): one `treeAggregate` per corpus —
  * map-side per-partition sketches, log-depth merge, NO shuffle of keys —
  * then set algebra on two ~`2^lgK`-entry sketches at the driver. Each
  * corpus crosses the wire as one sketch regardless of size; estimates
  * carry the standard theta relative standard error (~1/√(2^lgK) ≈ 0.78%
  * at the default lgK=14, zero error below saturation).
  */
object ThetaOverlap {

  /** Compact theta sketch of a column's distinct values (values are
    * sketched as UTF-8 strings — cast upstream decides identity).
    *
    * Sketch objects are not Java-serializable, so unlike the CMS/Bloom
    * `treeAggregate`s this runs bytes-reduced: each partition folds its
    * rows into a local UpdateSketch and emits ONE compact byte array
    * (≤ ~8·2^lgK bytes), then a depth-2 `treeReduce` unions the byte
    * forms — log-depth, executor-side, the driver receives a single
    * sketch no matter how many partitions the corpus has.
    */
  def sketchOf(df: DataFrame, keyCol: String, lgK: Int = 14): CompactSketch = {
    require(lgK >= 4 && lgK <= 26, s"lgK must be in [4,26], got $lgK")
    val keys = Par.ensure(df.select(col(keyCol).cast("string").as("__k")))
      .filter(col("__k").isNotNull)
    val parts = keys.rdd.mapPartitions { it =>
      val sk = UpdateSketch.builder().setLogNominalEntries(lgK)
        .setResizeFactor(ResizeFactor.X8).build()
      it.foreach(r => sk.update(r.getString(0)))
      Iterator.single(sk.compact().toByteArray)
    }
    if (parts.isEmpty())
      UpdateSketch.builder().setLogNominalEntries(lgK).build().compact()
    else {
      val merged = parts.treeReduce((a, b) => {
        val u: Union = SetOperation.builder().setLogNominalEntries(lgK)
          .buildUnion()
        u.union(Sketches.heapifyCompactSketch(
          org.apache.datasketches.memory.Memory.wrap(a)))
        u.union(Sketches.heapifyCompactSketch(
          org.apache.datasketches.memory.Memory.wrap(b)))
        u.getResult.toByteArray
      }, depth = 2)
      Sketches.heapifyCompactSketch(
        org.apache.datasketches.memory.Memory.wrap(merged))
    }
  }

  /** Overlap report of two corpora from their sketches: distinct
    * estimates, intersection estimate, and the containment fraction
    * `|A∩B| / |B|` (how much of B is already covered by A).
    */
  def overlapOf(a: CompactSketch, b: CompactSketch): (Double, Double, Double, Double) = {
    val inter: Intersection = SetOperation.builder().buildIntersection()
    inter.intersect(a)
    inter.intersect(b)
    val i = inter.getResult.getEstimate
    val bEst = b.getEstimate
    (a.getEstimate, bEst, i, if (bEst == 0.0) 0.0 else i / bEst)
  }

  /** One-call report as a 1-row DataFrame (driver-computed scalars — the
    * corpora were already reduced to sketches; nothing further to
    * distribute).
    *
    * @return (a_distinct, b_distinct, intersection, containment_b_in_a)
    */
  def report(a: DataFrame, b: DataFrame, keyCol: String,
      lgK: Int = 14): DataFrame = {
    val (ae, be, ie, cf) = overlapOf(sketchOf(a, keyCol, lgK),
      sketchOf(b, keyCol, lgK))
    val spark = a.sparkSession
    import spark.implicits._
    Seq((ae, be, ie, cf)).toDF(
      "a_distinct", "b_distinct", "intersection", "containment_b_in_a")
  }
}
