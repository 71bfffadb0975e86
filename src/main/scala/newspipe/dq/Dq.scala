package newspipe.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Config-driven data-quality framework — the reference's only "engine-like"
  * component (`DataQualityChecker` + `run_dq_from_config`,
  * _lib_dq_helpers.py:105-190), rebuilt twice:
  *
  *  - [[NativeDq]] — the scale design: ONE pass tags every row with a
  *    `VIOLATIONS array<string>` column; valid/quarantined are filters over
  *    the tagged frame. No per-rule `.count()` actions (reference quirk Q1:
  *    each rule re-scans the input), no bad-key union/join round-trip
  *    (quirk Q2: keys from different columns pollute one positional union),
  *    and null keys are flagged rather than silently surviving the equi-join
  *    (quirk Q3).
  *  - [[LegacyDq]] — behavioral parity with the reference, quirks included,
  *    kept for differential tests.
  */
sealed trait DqRule
/** Schema must contain these columns (_lib:133-136). */
final case class RequiredColumns(columns: Seq[String]) extends DqRule
/** Per column: null OR empty string is a violation (_lib:123-131). */
final case class NotNull(columns: Seq[String]) extends DqRule
/** Rows sharing a key tuple that occurs more than once are violations (_lib:138-145). */
final case class UniqueKeys(columns: Seq[String]) extends DqRule

/** Non-null values must fall in [lo, hi] (extension rule — the natural
  * Great-Expectations-style widening of the reference's 3-rule surface;
  * nulls are the NotNull rule's business).
  */
final case class InRange(column: String, lo: Double, hi: Double) extends DqRule
/** Non-null values must match the (Java) regex in full (extension rule). */
final case class MatchesRegex(column: String, pattern: String) extends DqRule
/** Non-null values must come from the allowed set (extension rule). */
final case class AllowedValues(column: String, values: Seq[String]) extends DqRule

/** Typed mirror of the reference's `dq_config` dict (_lib:105-111), plus the
  * extension rules. All rules fold into the same one-pass tagger.
  */
final case class DqConfig(
    table: String,
    requiredColumns: Seq[String] = Nil,
    notNull: Seq[String] = Nil,
    uniqueKeys: Seq[String] = Nil,
    inRange: Map[String, (Double, Double)] = Map.empty,
    matchesRegex: Map[String, String] = Map.empty,
    allowedValues: Map[String, Seq[String]] = Map.empty) {
  def rules: Seq[DqRule] =
    (if (requiredColumns.nonEmpty) Seq(RequiredColumns(requiredColumns)) else Nil) ++
    (if (notNull.nonEmpty) Seq(NotNull(notNull)) else Nil) ++
    (if (uniqueKeys.nonEmpty) Seq(UniqueKeys(uniqueKeys)) else Nil) ++
    inRange.map { case (c, (lo, hi)) => InRange(c, lo, hi) } ++
    matchesRegex.map { case (c, p) => MatchesRegex(c, p) } ++
    allowedValues.map { case (c, v) => AllowedValues(c, v) }
}

object DqConfig {
  /** The reference's shipped config for news_articles (_lib:105-111). */
  val newsArticles: DqConfig = DqConfig(
    table = "news_articles",
    requiredColumns = Seq("title", "publishedAt", "url"),
    notNull = Seq("title", "publishedAt", "url"),
    uniqueKeys = Seq("url"))
}

/** Split result. `issues` materializes lazily (one agg job) in native mode.
  * `release()` unpersists the shared tagged frame if the run persisted one.
  */
final case class DqResult(
    valid: DataFrame,
    quarantined: Option[DataFrame],
    issues: () => Seq[String],
    release: () => Unit = () => ())

object NativeDq {

  val ViolationsCol = "VIOLATIONS"

  /** The reference's null-or-empty predicate (_lib:125) compares every column
    * to "" regardless of type; under Spark 4 ANSI mode casting "" to a
    * timestamp/number throws, so the empty-string arm applies to STRING
    * columns only (identical behavior for strings, well-defined for the rest).
    */
  private[dq] def nullOrEmpty(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.StringType => col(c).isNull || col(c) === ""
      case _ => col(c).isNull
    }

  /** Tag every row with its violations in one declarative plan.
    *
    * Shuffle budget: zero for not-null rules. Duplicate detection aggregates
    * the key columns FIRST (partial map-side combine, so only distinct keys
    * cross the wire), keeps keys with count > 1, and joins the usually-tiny
    * dup-key set back null-safely — AQE turns that into a broadcast join at
    * runtime, so the full rows never shuffle. A window count over the raw
    * rows (the obvious formulation) would shuffle + sort the ENTIRE input on
    * the keys; at 100 TB the difference is the whole job. If the dup set is
    * genuinely huge AQE falls back to a shuffled join, which is never worse
    * than the window.
    */
  def tag(df: DataFrame, config: DqConfig): DataFrame = {
    val missing = config.requiredColumns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Missing required columns: ${missing.mkString(", ")}")

    val notNullChecks: Seq[Column] = config.notNull
      .filter(df.columns.contains)
      .map(c => when(nullOrEmpty(df, c), lit(s"null_or_empty_column:$c")))

    val keys = config.uniqueKeys
    val base = if (keys.nonEmpty) {
      val dupKeys = df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__kc"))
        .filter(col("__kc") > 1)
        .select(keys.map(c => col(c).as(s"__dk_$c")) :+ lit(true).as("__is_dup"): _*)
      // null-safe equality: null keys group together, exactly like the
      // groupBy above (and like a window partition) treats them
      val cond = keys.map(c => col(c) <=> col(s"__dk_$c")).reduce(_ && _)
      df.join(dupKeys, cond, "left").drop(keys.map(c => s"__dk_$c"): _*)
    } else df

    val dupCheck: Seq[Column] =
      if (keys.nonEmpty)
        Seq(when(col("__is_dup"),
          lit(s"duplicate_key:${keys.mkString(",")}")))
      else Nil

    val rangeChecks: Seq[Column] = config.inRange.toSeq.collect {
      case (c, (lo, hi)) if df.columns.contains(c) =>
        when(col(c).isNotNull && !col(c).cast("double").between(lo, hi),
          lit(s"out_of_range:$c"))
    }
    val regexChecks: Seq[Column] = config.matchesRegex.toSeq.collect {
      case (c, p) if df.columns.contains(c) =>
        when(col(c).isNotNull && !col(c).rlike(s"^(?:$p)$$"),
          lit(s"regex_mismatch:$c"))
    }
    val setChecks: Seq[Column] = config.allowedValues.toSeq.collect {
      case (c, vs) if df.columns.contains(c) =>
        when(col(c).isNotNull && !col(c).isin(vs: _*),
          lit(s"disallowed_value:$c"))
    }

    val all = notNullChecks ++ dupCheck ++ rangeChecks ++ regexChecks ++ setChecks
    val violations =
      if (all.isEmpty) array().cast("array<string>")
      else filter(array(all: _*), _.isNotNull)

    base.withColumn(ViolationsCol, violations).drop("__is_dup")
  }

  /** Run the config: returns valid rows (violations stripped), quarantined
    * rows (violations kept for the quarantine `reason`), and a lazy issue
    * summary (one distinct-collect over the quarantined slice).
    */
  /** @param persistTagged cache the tagged frame when BOTH outputs will be
    *   materialized (the full silver pipeline writes valid AND quarantine —
    *   without the cache each branch re-runs the unique-key shuffle, a 2×
    *   input re-scan at scale; reference quirk Q1 re-scanned per RULE).
    *   Callers that consume one branch (or stream) leave it off — the
    *   `valid` branch then takes [[validOnly]]'s direct-predicate plan.
    */
  def run(df: DataFrame, config: DqConfig,
      persistTagged: Boolean = false): DqResult = {
    val tagged0 = tag(df, config)
    val tagged = if (persistTagged) tagged0.persist() else tagged0
    // persisted: both branches MUST filter the one cached tagged frame
    // (that sharing is the point of the cache). Un-persisted: the valid
    // branch skips the per-row violation-LABEL array entirely — a
    // valid-only consumer (the q19 shape) pays for row routing, not for
    // quarantine reasons it never reads (measured 1.6× at sf0.1).
    val valid =
      if (persistTagged)
        tagged.filter(size(col(ViolationsCol)) === 0).drop(ViolationsCol)
      else validOnly(df, config)
    val bad = tagged.filter(size(col(ViolationsCol)) > 0)
    val issues = () => bad
      .select(explode(col(ViolationsCol)).as("v"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    DqResult(valid, Some(bad), issues,
      release = () => if (persistTagged) { tagged.unpersist(); () })
  }

  /** The valid slice as a DIRECT conjunction of pass-predicates + one
    * LEFT ANTI join against the dup-key set — row-identical to
    * `tag(df).filter(size(VIOLATIONS) = 0)` but with no per-row label
    * array to build and no join-output column to post-filter; the scalar
    * predicates also reach the parquet scan as pushed filters. This is
    * the plan a valid-only consumer wants at 100 TB: quarantine REASONS
    * are the tagged path's business.
    */
  def validOnly(df: DataFrame, config: DqConfig): DataFrame = {
    val missing = config.requiredColumns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Missing required columns: ${missing.mkString(", ")}")
    val passes: Seq[Column] =
      config.notNull.filter(df.columns.contains)
        .map(c => !nullOrEmpty(df, c)) ++
      config.inRange.toSeq.collect {
        case (c, (lo, hi)) if df.columns.contains(c) =>
          col(c).isNull || col(c).cast("double").between(lo, hi)
      } ++
      config.matchesRegex.toSeq.collect {
        case (c, p) if df.columns.contains(c) =>
          col(c).isNull || col(c).rlike(s"^(?:$p)$$")
      } ++
      config.allowedValues.toSeq.collect {
        case (c, vs) if df.columns.contains(c) =>
          col(c).isNull || col(c).isin(vs: _*)
      }
    val scalarPass = passes.reduceOption(_ && _).map(df.filter).getOrElse(df)
    val keys = config.uniqueKeys
    if (keys.isEmpty) scalarPass
    else {
      // same dup-key aggregate as tag (distinct keys cross the wire, AQE
      // broadcasts the usually-tiny result); anti instead of left+filter
      val dupKeys = df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__kc"))
        .filter(col("__kc") > 1)
        .select(keys.map(c => col(c).as(s"__dk_$c")): _*)
      val cond = keys.map(c => col(c) <=> col(s"__dk_$c")).reduce(_ && _)
      scalarPass.join(dupKeys, cond, "left_anti")
    }
  }
}

/** Reference-parity implementation, quirks and all:
  *
  *  - per-rule eager `.count()` (quirk Q1 — kept so differential tests can
  *    observe identical issue strings and row routing);
  *  - bad keys accumulated by POSITIONAL union of single-column frames from
  *    different rules, joined back on the first rule's column name (quirk Q2);
  *  - null keys never match the inner equi-join, so null-keyed rows are NOT
  *    quarantined — only empty strings are (quirk Q3).
  *
  * Cites _lib_dq_helpers.py:116-163 and the inline duplicate at
  * 02_silver_transformation_news_articles.py:174-222.
  */
final class LegacyDq(df: DataFrame, tableName: String = "") {
  private var issues = Vector.empty[String]
  private var badKeys: Option[DataFrame] = None

  /** _lib:123-131 — null-or-empty per column; bad VALUES become keys. */
  def checkNotNull(columns: Seq[String]): this.type = {
    columns.foreach { c =>
      val bad = df.filter(NativeDq.nullOrEmpty(df, c))
      if (bad.count() > 0) { // eager, per rule — quirk Q1, preserved
        issues :+= s"Null or empty values in column '$c'"
        val keys = bad.select(c).dropDuplicates()
        badKeys = badKeys match {
          case None       => Some(keys)
          case Some(prev) => Some(prev.union(keys).dropDuplicates()) // positional — quirk Q2
        }
      }
    }
    this
  }

  /** _lib:133-136 — schema-only check, contributes no bad keys. */
  def checkColumnExists(columns: Seq[String]): this.type = {
    val missing = columns.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      issues :+= s"Missing required columns: ${missing.mkString(", ")}"
    this
  }

  /** _lib:138-145 — groupBy-count duplicate keys. */
  def checkDuplicates(subset: Seq[String]): this.type = {
    val dupKeys = df.groupBy(subset.map(col): _*).count()
      .filter("count > 1").drop("count")
    if (dupKeys.count() > 0) {
      badKeys = badKeys match {
        case None       => Some(dupKeys)
        case Some(prev) => Some(prev.union(dupKeys).dropDuplicates())
      }
      issues :+= s"Duplicate keys detected on: ${subset.mkString(", ")}"
    }
    this
  }

  def reportedIssues: Seq[String] = issues

  /** _lib:157-163 — inner join (bad) / left-anti join (valid) on the bad-key
    * frame's column names. Inner (not semi) join preserved: duplicate keys
    * re-multiply matching rows exactly as the reference does.
    */
  def validInvalid(): (DataFrame, Option[DataFrame]) = badKeys match {
    case Some(keys) =>
      val keyCols = keys.columns.toSeq
      val bad = df.join(keys, keyCols, "inner")
      val valid = df.join(keys, keyCols, "left_anti")
      (valid, Some(bad))
    case None => (df, None)
  }
}

object LegacyDq {
  /** _lib:171-190 `run_dq_from_config`, same rule order. */
  def run(df: DataFrame, config: DqConfig): DqResult = {
    val dq = new LegacyDq(df, config.table)
    if (config.requiredColumns.nonEmpty) dq.checkColumnExists(config.requiredColumns)
    if (config.notNull.nonEmpty) dq.checkNotNull(config.notNull)
    if (config.uniqueKeys.nonEmpty) dq.checkDuplicates(config.uniqueKeys)
    val (valid, bad) = dq.validInvalid()
    DqResult(valid, bad, () => dq.reportedIssues)
  }
}
