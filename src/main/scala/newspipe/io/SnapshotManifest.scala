package newspipe.io

import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Inventory of a MANIFEST (row-op) snapshot: the explicit list of data
  * files the snapshot consists of, paths RELATIVE TO THE LAYER ROOT — a
  * row-level delete rewrites only the files holding matching rows, so the
  * snapshot's untouched files keep living in OLDER version directories and
  * a directory walk of the snapshot dir would see only the rewritten
  * fraction. The recorded schema (as Catalyst DDL) makes the zero-files
  * snapshot (every row deleted) readable as an empty frame instead of a
  * schema-inference failure.
  *
  * Written as `_MANIFEST.json` beside `_STATS.json` inside the version
  * directory, BEFORE the `_COMMITTED` marker — same commit discipline as
  * the stats sidecar, so a committed snapshot either has a complete
  * manifest or none (self-contained). The `_` prefix hides it from Spark's
  * file listing and from [[Lake]]'s own inventory walks.
  *
  * This is the lake's delta-log-lite: Delta records add/remove actions per
  * commit and replays the log; here each manifest IS the fully-resolved
  * file set (no replay, one JSON read), trading log compaction machinery
  * for a driver-side file list — at 10⁵ files and ~100 bytes/path that is
  * a ~10 MB sidecar, acceptable where a full-layer rewrite is not.
  */
final case class SnapshotManifest(files: Seq[String], schemaDdl: String) {
  /** Read schema for the empty-manifest case. */
  def schema: StructType = StructType.fromDDL(schemaDdl)
}

object SnapshotManifest {
  val FileName = "_MANIFEST.json"

  def toJson(m: SnapshotManifest): String =
    JsonMethods.compact(JsonMethods.render(JObject(List(
      "version" -> JInt(1),
      "schemaDdl" -> JString(m.schemaDdl),
      "files" -> JArray(m.files.toList.map(JString(_)))))))

  def fromJson(json: String): SnapshotManifest = {
    val root = JsonMethods.parse(json)
    val ddl = (root \ "schemaDdl") match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(
        s"$FileName missing schemaDdl (got $other)")
    }
    val files = (root \ "files") match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case other => throw new IllegalArgumentException(
        s"$FileName missing files array (got $other)")
    }
    SnapshotManifest(files, ddl)
  }
}
