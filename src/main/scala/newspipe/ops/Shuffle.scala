package newspipe.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling + sharding — the "write the training set
  * in a reproducible random order, split into fixed shards" step at the end
  * of a data pipeline. `orderBy(rand())` is non-reproducible across retries
  * and cluster layouts; hashing the row key gives an order that is a pure
  * function of the data (same md5-prefix formula as [[Sampling]], so one
  * salt namespace governs all content-addressed draws, and any engine can
  * replay the permutation in ANSI SQL).
  *
  * Beyond the reference's surface (its gold layer writes unordered,
  * `notebooks/03_gold_modeling_news_articles.py`); a training-data engine
  * needs this for epoch-stable example order.
  */
object Shuffle {

  /** Full md5 hex of (salt ‖ key) — the shuffle sort key — and its first 32
    * bits as an unsigned bucket (identical to [[Sampling]]'s membership
    * formula; SQL replay: `md5(salt || CAST(key AS VARCHAR))`).
    */
  private def hashHex(keyCol: Column, salt: String): Column =
    md5(concat(lit(salt), keyCol.cast("string")))

  /** Assign every row a shard in [0, numShards) and a position within its
    * shard, both deterministic in (salt, key): shard is the hash bucket mod
    * numShards, position is the rank of the full hash hex within the shard
    * (ties — only possible on md5 collision — broken by the key itself, so
    * the permutation is total). Appends `shard` (long) and `pos` (long,
    * 1-based) to the input columns. Null-key rows are excluded: a null key
    * has no stable content address (the [[Sampling]] determinism contract).
    *
    * 100 TB: ONE shuffle — the per-shard `row_number` window repartitions by
    * `shard`, and each shard sorts locally. Per-shard state is bounded by
    * the caller's shard sizing (numShards is chosen so a shard fits an
    * executor — for a 100 TB corpus at 1 GiB shards that is ~100k shards,
    * each a trivial sort). The degenerate hazard is numShards ≪ cluster
    * cores (a 1-shard call serializes the corpus through one task) — that is
    * caller-visible, documented here, and the write path below avoids
    * needing positions at all. When only shard FILES are needed (not
    * explicit positions), skip this and write
    * `df.repartitionByRange(numShards, col("shard"), hex)` sorted within
    * partitions — same order, no row-number state.
    */
  def shuffleShard(df: DataFrame, keyCol: String, numShards: Int,
      salt: String = ""): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val hex = hashHex(col(keyCol), salt)
    val bucket = conv(substring(hex, 1, 8), 16, 10).cast("bigint")
    df.filter(col(keyCol).isNotNull)
      .withColumn("__hex", hex)
      .withColumn("shard", pmod(bucket, lit(numShards.toLong)))
      .withColumn("pos", row_number()
        .over(Window.partitionBy(col("shard"))
          .orderBy(col("__hex"), col(keyCol)))
        .cast("long"))
      .drop("__hex")
  }

  /** The WRITE path of the deterministic shuffle — what [[shuffleShard]]'s
    * doc promises: when only shard FILES are needed (not explicit row
    * positions), skip the row-number window entirely. One
    * `repartitionByRange(shard, hex)` + `sortWithinPartitions` places every
    * row in its shard file in exactly [[shuffleShard]]'s (hex, key) order
    * with ZERO per-shard rank state, and `partitionBy("shard")` lays the
    * lake out as `shard=N/` directories a training loader streams in
    * order.
    *
    * 100 TB: the range exchange is the only shuffle; each shard sorts
    * locally (caller sizes numShards so a shard fits an executor — ~100k
    * shards at 1 GiB for 100 TB). No window, no global sort, no driver
    * state.
    */
  def writeShards(df: DataFrame, keyCol: String, numShards: Int,
      path: String, salt: String = ""): Unit = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val hex = hashHex(col(keyCol), salt)
    val bucket = conv(substring(hex, 1, 8), 16, 10).cast("bigint")
    df.filter(col(keyCol).isNotNull)
      .withColumn("__hex", hex)
      .withColumn("shard", pmod(bucket, lit(numShards.toLong)))
      .repartitionByRange(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__hex"), col(keyCol))
      .drop("__hex")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
