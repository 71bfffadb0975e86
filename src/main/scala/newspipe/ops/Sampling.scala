package newspipe.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Per-stratum deterministic sampling in ONE pass: each row draws against
    * the rate of ITS stratum value (e.g. downsample web 10×, keep books
    * whole). The hash is salted with the stratum value — NUL-joined on both
    * sides, so no (salt, stratum, key) concatenation is ambiguous — which
    * makes each stratum an independent draw, and the whole thing one
    * shuffle-free filter (no per-stratum union, no groupBy).
    *
    * External SQL replay of membership:
    * `md5(salt || chr(0) || stratum || chr(0) || CAST(key AS VARCHAR))`.
    *
    * Rows with a NULL stratum or NULL key hash to NULL and are never
    * sampled (the [[hashBucket]] determinism contract).
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = ""): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      s"rates must be in [0,1], got $rates / default $defaultRate")
    val bucket = conv(substring(md5(concat_ws("\u0000",
      lit(salt), col(strataCol).cast("string"), col(keyCol).cast("string"))),
      1, 8), 16, 10).cast("bigint")
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(
      lit((defaultRate * 4294967296.0).toLong)) { case (acc, (stratum, rate)) =>
      when(col(strataCol) === stratum, lit((rate * 4294967296.0).toLong))
        .otherwise(acc)
    }
    // concat_ws skips nulls (so 'a',NULL,'b' would collide with 'a','b',
    // NULL) — exclude null stratum/key rows explicitly before the draw
    df.filter(col(strataCol).isNotNull && col(keyCol).isNotNull &&
      bucket < threshold)
  }

  /** Deterministic token-budget packing: rows are ordered by their content
    * hash (stable under replay and partition layout, like every sampler
    * here), weights are cumulatively summed, and each row is assigned the
    * zero-based bin its cumulative START offset falls in — the greedy
    * sequential packing a training run uses to cut a corpus into
    * fixed-token-budget shards. A row larger than `budget` gets a bin of
    * its own (plus spillover shifting later starts), never silently drops.
    *
    * Scale shape: ONE running-sum window per `partitionCols` group — pass
    * the natural sharding column (source, language, date bucket) so each
    * group packs independently and no global sort exists. With empty
    * `partitionCols` the window is global: exact but single-partition —
    * fine for bounded slices, a documented hazard at corpus scale.
    *
    * Rows with a NULL weight or NULL key are excluded (no stable pack
    * position exists for them).
    *
    * @return input columns + `bin` (0-based, per partition group).
    */
  def packBins(df: DataFrame, keyCol: String, weightCol: String, budget: Long,
      partitionCols: Seq[String] = Nil, salt: String = ""): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(hashBucket(col(keyCol), salt).asc, col(keyCol).asc)
    df.filter(col(weightCol).isNotNull && col(keyCol).isNotNull)
      .withColumn("__cum", sum(col(weightCol)).over(w))
      .withColumn("bin",
        ((col("__cum") - col(weightCol)) / budget).cast("bigint"))
      .drop("__cum")
  }

  /** Deterministic fixed-size per-group sample: the first `n` rows of each
    * group in content-hash order — "exactly 200 eval docs per source",
    * reproducible across runs, retries, partition layouts and engines
    * (the fixed-COUNT complement of [[hashSample]]'s fixed-RATE draw; same
    * md5 ordering, ties broken by the key itself).
    *
    * Scale shape: one window rank per group — right when groups are
    * bounded. For groups far larger than `n`, prefilter with
    * [[hashSample]] at a rate comfortably above `n/|group|` first: the
    * hash order is IDENTICAL in both operators, so a rate prefilter keeps
    * a superset of the final `n` (any row it drops ranks below every row
    * it keeps) and the window then sorts only the surviving sliver.
    *
    * Null-key rows are excluded (no stable hash position); a NULL group
    * value forms its own group, as in every grouped operator here.
    *
    * @return input columns + `pos` (1-based rank within the group).
    */
  def takePerGroup(df: DataFrame, groupCol: String, keyCol: String, n: Int,
      salt: String = ""): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val w = Window.partitionBy(groupCol)
      .orderBy(hashBucket(col(keyCol), salt).asc, col(keyCol).asc)
    df.filter(col(keyCol).isNotNull)
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("pos") <= n)
  }

  /** Per-group quantile binning (curriculum buckets): every row gets the
    * 1-based ntile of its score within its group — "split each source into
    * quality quartiles", feeding curriculum schedules and quality-stratified
    * mixtures. ANSI `ntile` semantics on a fully deterministic order
    * (score desc, tie asc), so any engine reproduces the exact assignment.
    *
    * Scale shape: one window rank per group, same boundedness contract as
    * [[topFractionByGroup]] — for unbounded groups, bin by broadcast
    * `approx_percentile` thresholds instead (the
    * [[topFractionByGroupApprox]] pattern, one threshold per bin edge).
    *
    * @return input columns + `bin` (1..numBins).
    */
  def qualityBins(df: DataFrame, groupCol: String, scoreCol: String,
      numBins: Int, tieCol: String): DataFrame = {
    require(numBins >= 1, s"numBins must be >= 1, got $numBins")
    val w = Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    df.withColumn("bin", ntile(numBins).over(w).cast("long"))
  }

  /** Exact per-group rank gate: keep the top `fraction` of each group by
    * `scoreCol` (descending; ties broken by `tieCol` ascending so the kept
    * set is deterministic). ceil rounding — a non-empty group always keeps
    * at least one row. This is the quantile-style quality filter ("keep the
    * top 75% per source") in its EXACT form: one window rank per group.
    *
    * Scale shape: ranking sorts within each group partition — right when
    * groups are bounded (per-source, per-language). For groups too large to
    * sort, compute an approximate threshold per group
    * (`approx_percentile`) and broadcast-join it back instead; this
    * operator is the exact anchor of that pattern.
    */
  def topFractionByGroup(df: DataFrame, groupCol: String, scoreCol: String,
      fraction: Double, tieCol: String): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    val rankW = Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val countW = Window.partitionBy(groupCol)
    df.withColumn("__rn", row_number().over(rankW))
      .withColumn("__n", count(lit(1)).over(countW))
      // fraction·n is exact in IEEE for dyadic fractions (0.75, 0.5, …);
      // for others both engines evaluate the same double product, so the
      // ceil agrees as long as the replay writes the identical expression
      .filter(col("__rn") <= ceil(col("__n") * fraction))
      .drop("__rn", "__n")
  }

  /** Scale path of [[topFractionByGroup]]: instead of ranking every row
    * inside its group (a per-group sort), compute each group's approximate
    * score threshold in ONE aggregate (`approx_percentile`, mergeable GK
    * sketch — map-side partial merge, no sort) and broadcast the tiny
    * per-group threshold table back. Keeps every row whose score meets its
    * group's (1 − fraction) quantile: rank error bounded by the sketch's
    * `relativeError`, so the kept share is fraction ± O(relativeError).
    *
    * Use this form when groups are too large to sort (the exact operator is
    * the anchor its results are tested against). Null scores never pass the
    * threshold comparison; a null group forms its own threshold group as in
    * the exact form.
    */
  def topFractionByGroupApprox(df: DataFrame, groupCol: String,
      scoreCol: String, fraction: Double,
      relativeError: Double = 0.01): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    require(relativeError > 0.0 && relativeError < 1.0,
      s"relativeError must be in (0,1), got $relativeError")
    if (fraction == 0.0) return df.filter(lit(false))
    val accuracy = math.max(100, math.ceil(1.0 / relativeError).toLong)
    val thresholds = df.groupBy(col(groupCol)).agg(
      percentile_approx(col(scoreCol), lit(1.0 - fraction), lit(accuracy))
        .as("__thr"))
    df.join(broadcast(thresholds),
        df(groupCol) <=> thresholds(groupCol), "inner")
      .drop(thresholds(groupCol))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /** [[packBins]] taken to its consumer: materialize each bin as ONE packed
    * training sequence — documents concatenated in pack order with
    * `sep` between them, plus the doc count and total weight the loader
    * needs to budget-check the shard. This is the "sequence packing" step
    * that turns a curated corpus into fixed-token-budget training rows.
    *
    * Determinism carries through: pack order inside a bin is the same
    * (hash, key) order [[packBins]] assigned bins by, so the packed text is
    * a pure function of the data — `collect_list` + `array_sort` rather
    * than an ordered window, because the aggregate's map-side partial
    * combine ships per-bin slices, not every row, through the shuffle.
    *
    * Scale shape: one window (the packBins running sum) + one hash
    * aggregate on (partitionCols, bin). A bin holds at most
    * ~`budget` tokens by construction (plus one spillover row), so the
    * per-bin collect is bounded by the budget, never by the corpus.
    *
    * @return partitionCols + `bin`, `n_docs`, `total_weight`, `packed_text`.
    */
  def packSequences(df: DataFrame, keyCol: String, textCol: String,
      weightCol: String, budget: Long, partitionCols: Seq[String] = Nil,
      salt: String = "", sep: String = " "): DataFrame = {
    val binned = packBins(df, keyCol, weightCol, budget, partitionCols, salt)
      .withColumn("__h", hashBucket(col(keyCol), salt))
    binned.groupBy((partitionCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol)).as("total_weight"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__h"), col(keyCol).as("__k"),
              col(textCol).as("__t")))),
            x => x("__t")), sep).as("packed_text"))
  }

  /** Downsample each group to a WEIGHT BUDGET (e.g. per-source token
    * budgets in a training mixture): the kept fraction of group g is
    * min(1, budget_g / actual_g) and per-row membership is the same
    * md5(salt \u2016 NUL \u2016 group \u2016 NUL \u2016 key) draw as
    * [[stratifiedSample]] \u2014 so the expected kept weight of a targeted
    * group is \u2248 min(budget, actual), groups WITHOUT a target are kept
    * whole, and membership stays a pure replayable function of the data.
    *
    * Scale shape: ONE aggregate for the per-group totals (map-side combine,
    * group-cardinality output, broadcast back) + the shuffle-free per-row
    * filter. No sort, no window; the corpus crosses no exchange.
    *
    * SQL replay of membership for a targeted group:
    * `('0x' || substr(md5(salt || chr(0) || grp || chr(0) || CAST(key AS
    * VARCHAR)), 1, 8))::UBIGINT < floor(least(1.0, budget / actual) *
    * 4294967296)` \u2014 floor() EXPLICIT on both engines (CAST rounds in
    * some engines; q43's precomputed thresholds never hit this, a
    * data-dependent rate does).
    *
    * Rows with a NULL group, key or weight are excluded (no stable draw /
    * no budget contribution).
    */
  def resampleToBudget(df: DataFrame, keyCol: String, weightCol: String,
      groupCol: String, budgets: Map[String, Long],
      salt: String = ""): DataFrame = {
    require(budgets.nonEmpty, "resampleToBudget needs at least one budget")
    require(budgets.values.forall(_ >= 0L),
      s"budgets must be >= 0, got $budgets")
    val target = budgets.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("long")) { case (acc, (g, b)) =>
        when(col(groupCol) === g, lit(b)).otherwise(acc)
      }
    val totals = df.filter(col(groupCol).isNotNull && col(keyCol).isNotNull &&
        col(weightCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(sum(col(weightCol)).as("__actual"))
    val bucket = conv(substring(md5(concat_ws("\u0000",
      lit(salt), col(groupCol).cast("string"), col(keyCol).cast("string"))),
      1, 8), 16, 10).cast("bigint")
    df.join(broadcast(totals), col(groupCol) === col("__g"), "left")
      .withColumn("__rate",
        when(target.isNull, lit(1.0))
          .otherwise(least(lit(1.0), target.cast("double") / col("__actual"))))
      .filter(col(groupCol).isNotNull && col(keyCol).isNotNull &&
        col(weightCol).isNotNull &&
        bucket < floor(col("__rate") * 4294967296.0).cast("bigint"))
      .drop("__g", "__actual", "__rate")
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
