package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prototype-based diversity pruning of an embedding corpus — the
  * cluster-then-drop-the-prototypical-core selection of Sorscher et al.
  * 2022 ("Beyond neural scaling laws: beating power law scaling via data
  * pruning"): assign every vector to its nearest centroid, then per
  * cluster KEEP the least prototypical fraction (farthest from the
  * centroid — the hard/diverse examples) and drop the redundant core the
  * cluster already represents. The batch complement to [[Similarity]]'s
  * SemDeDup (which removes near-identical pairs; this thins whole dense
  * regions).
  *
  * Centroids are a caller-supplied DataFrame: pass
  * [[Similarity.ivfTopK]]'s k-means centroids for trained prototypes, or
  * [[Prototypes.seedCentroids]] for a deterministic Lloyd-free pass that
  * any engine can replay (the oracle form). Either way the centroid table
  * is k rows — broadcast by construction.
  *
  * Scale shape: one broadcast nested-loop pass scores corpus × k (the
  * same per-row k-way argmax IVF assignment costs — embarrassingly
  * parallel, no shuffle), then two windows partitioned by cluster (argmax
  * dedupe is folded into the first). The corpus crosses the wire once,
  * keyed by cluster; k ≪ corpus so cluster partitions are the skew
  * hazard — a pathological single-cluster corpus degenerates to one
  * partition's sort, which AQE cannot split (windows pin their
  * partitioning); pick k to bound cluster size at the source.
  */
object Prototypes {

  /** Deterministic centroid seeds: the k smallest-id vectors. Not trained
    * — the replayable baseline; swap in k-means centroids for quality.
    */
  def seedCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    embeddings.select(col(idCol).as("centroid_id"), col(vecCol).as("__cvec"))
      .orderBy(col("centroid_id")).limit(k)
  }

  /** Nearest-centroid assignment + per-cluster prototypicality rank.
    *
    * @return (idCol, cluster, proximity, keep) — `cluster` = centroid id
    *         of the max-cosine centroid (ties → smaller centroid id),
    *         `proximity` = that cosine, `keep` = true for the
    *         `ceil(clusterSize · keepFraction)` rows FARTHEST from the
    *         centroid (proximity asc, id asc tie-break).
    */
  def prune(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, keepFraction: Double): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1,
      s"keepFraction must be in (0,1], got $keepFraction")
    val scored = Par.ensure(embeddings.select(col(idCol), col(vecCol)))
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col("centroid_id"),
        Similarity.cosine(col(vecCol), col("__cvec")).as("proximity"))
    val byVec = Window.partitionBy(col(idCol))
      .orderBy(col("proximity").desc, col("centroid_id").asc)
    val assigned = scored
      .withColumn("__rn", row_number().over(byVec))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("centroid_id").as("cluster"), col("proximity"))
    val byCluster = Window.partitionBy(col("cluster"))
      .orderBy(col("proximity").asc, col(idCol).asc)
    val size = Window.partitionBy(col("cluster"))
    assigned
      .withColumn("__rank", row_number().over(byCluster))
      .withColumn("__n", count(lit(1)).over(size))
      .select(col(idCol), col("cluster"), col("proximity"),
        (col("__rank") <= ceil(col("__n") * keepFraction)).as("keep"))
  }
}
