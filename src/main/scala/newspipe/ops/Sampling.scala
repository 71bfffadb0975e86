package newspipe.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling — the reproducible form of
  * train/val splitting and corpus downsampling a training-data pipeline
  * needs. `df.sample()`/`rand()` draws differ across retries, partition
  * layouts and cluster sizes; hashing the row KEY makes membership a pure
  * function of the data: stable under replay, shuffle-free (a per-row
  * filter, pushed to the scan where possible), and consistent across jobs
  * that sample the same keys.
  */
object Sampling {

  /** Uniform bucket in [0, 2³²) from the first 32 bits of md5(salt ‖ key).
    * md5 (not xxhash) so any engine can reproduce membership — the same
    * expression runs in ANSI SQL.
    *
    * A NULL key hashes to NULL, which fails every bucket comparison: null-key
    * rows are excluded from every sample and every [[hashSplit]] bucket (even
    * when fractions sum to 1). This is deliberate — a null key has no stable
    * content address, and silently assigning it a bucket would break the
    * determinism contract; coalesce or filter keys upstream if null-key rows
    * must participate.
    */
  private def hashBucket(keyCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), keyCol.cast("string"))), 1, 8), 16, 10)
      .cast("bigint")

  /** Keep a row iff its key hashes below fraction·2³². Different salts give
    * independent samples of the same data. Null-key rows are never sampled
    * (see [[hashBucket]]).
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    df.filter(hashBucket(col(keyCol), salt) <
      (fraction * 4294967296.0).toLong)
  }

  /** Deterministic corpus mixture: each source is hash-sampled at its own
    * rate (salted by the source name, so co-occurring keys draw
    * independently per source) and tagged — the reproducible way to hit
    * target mixture proportions in a training-data blend without a global
    * shuffle or RNG. Sources must be union-compatible by name.
    *
    * External SQL replay of a source's membership concatenates the NUL
    * separator explicitly: `md5(salt || chr(0) || name || CAST(key AS
    * VARCHAR))` — the separator is a control character precisely so no
    * (salt, name) pair can reproduce another pair's draws.
    */
  def mixture(sources: Seq[(String, DataFrame, Double)], keyCol: String,
      salt: String = "", tagCol: String = "mixture_source"): DataFrame = {
    require(sources.nonEmpty, "mixture needs at least one source")
    sources.map { case (name, df, rate) =>
      // NUL-joined so (salt, name) pairs can't collide by concatenation
      // (e.g. salt="a",name="bc" vs salt="ab",name="c" must draw
      // independently)
      hashSample(df, keyCol, rate, salt + "\u0000" + name)
        .withColumn(tagCol, lit(name))
    }.reduce(_ unionByName _)
  }

  /** Disjoint deterministic split (train/val/test …): `fractions` must sum
    * to ≤ 1; row i of the result holds keys whose bucket falls in the i-th
    * cumulative range. Every NON-NULL-keyed row lands in AT MOST one split
    * (exactly one if the fractions sum to 1); null-key rows land in none
    * (see [[hashBucket]]).
    */
  def hashSplit(df: DataFrame, keyCol: String, fractions: Seq[Double],
      salt: String = ""): Seq[DataFrame] = {
    require(fractions.nonEmpty && fractions.forall(_ >= 0.0) &&
      fractions.sum <= 1.0 + 1e-9,
      s"fractions must be non-negative and sum to ≤ 1, got $fractions")
    val bounds = fractions.scanLeft(0.0)(_ + _)
      .map(f => (f * 4294967296.0).toLong)
    val bucket = hashBucket(col(keyCol), salt)
    bounds.sliding(2).map { case Seq(lo, hi) =>
      df.filter(bucket >= lo && bucket < hi)
    }.toSeq
  }
}
