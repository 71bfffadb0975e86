package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — classify every document across two versions of a
  * corpus (yesterday's crawl vs today's) as `added`, `removed`, `changed`
  * or `unchanged`. Dataset versioning is how an incremental training-data
  * pipeline avoids re-curating 100 TB per refresh: downstream stages
  * (dedup, scoring, packing) re-run only on `added` + `changed`, and
  * `removed` ids propagate as tombstones.
  *
  * Scale shape: each side reduces to (id, digest) in its scan projection
  * (content never crosses the network), then ONE full-outer shuffle join on
  * the id. Both columns of the digest comparison ship 32-hex strings, so
  * the exchange volume is rows, not text.
  *
  * Content digest: md5 over the NUL-joined content columns (the repo-wide
  * replayable digest idiom; `concat_ws` skips NULLs in Spark and in ANSI
  * SQL alike, so engines agree — with the documented caveat that
  * ('a', NULL) and (NULL, 'a') collide; include a not-null marker column
  * if that distinction matters).
  *
  * Duplicate ids within one version are collapsed to their MIN digest
  * before the join (deterministic; a versioned corpus should be id-unique,
  * and a stable tie-break beats a nondeterministic pick).
  */
object CorpusDiff {

  /** (idCol, status, old_digest, new_digest); null-id rows are excluded
    * (no identity to diff). `old_digest`/`new_digest` are null for
    * `added`/`removed` rows respectively.
    */
  def diff(oldV: DataFrame, newV: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "diff needs at least one content column")
    def digests(df: DataFrame, out: String) =
      df.filter(col(idCol).isNotNull)
        .select(col(idCol).as("__id"),
          md5(concat_ws("\u0000",
            contentCols.map(c => col(c).cast("string")): _*)).as(out))
        .groupBy("__id").agg(min(col(out)).as(out))
    val o = digests(oldV, "old_digest")
    val n = digests(newV, "new_digest")
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("old_digest").isNull, lit("added"))
          .when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest") === col("new_digest"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_digest"), col("new_digest"))
  }

  /** The incremental work set: `added` + `changed` rows of the NEW version,
    * by anti/semi-joining the diff back — what downstream curation re-runs.
    */
  def changedRows(oldV: DataFrame, newV: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    val d = diff(oldV, newV, idCol, contentCols)
      .filter(col("status").isin("added", "changed"))
      .select(col(idCol).as("__did"))
    newV.join(d, col(idCol) === col("__did"), "left_semi")
  }
}
