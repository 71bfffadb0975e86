package newspipe.io

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Deletion-vector payload codec (Delta's deletion-vector idea in the
  * lake's JSON-sidecar idiom): a DELETE can mark row POSITIONS dead
  * instead of rewriting files — O(matched rows) to commit instead of
  * O(touched files) to rewrite, the economics that make small scattered
  * deletes (GDPR erasure, spot corrections) affordable on a 100 TB layer.
  *
  * One payload document per DV commit, `_DV-00000.json` inside the new
  * version dir, mapping data-file rel path → SORTED deleted row positions
  * (`_metadata.row_index` values — stable because snapshot files are
  * immutable). A file's entry is CUMULATIVE: a second DV delete writes the
  * union of old and new positions into its own payload and repoints the
  * manifest's dv entry, so a reader resolves exactly ONE payload per file,
  * never a chain.
  *
  * Size discipline: positions are driver-materialized (like the manifest's
  * path list) — [[Lake.deleteWhereDv]] refuses past `maxDvRows` and
  * directs large deletes to the rewrite path, and compaction materializes
  * DVs (rewrites survivors, empties the map), which is the escape hatch
  * that keeps both the payloads and the read-side anti-join bounded.
  */
object DeletionVectors {

  def payloadName(i: Int): String = f"_DV-$i%05d.json"

  def toJson(positions: Map[String, Seq[Long]]): String =
    JsonMethods.compact(JsonMethods.render(JObject(List(
      "version" -> JInt(1),
      "files" -> JObject(positions.toList.sortBy(_._1).map { case (k, v) =>
        k -> JArray(v.sorted.toList.map(JLong(_)))
      })))))

  def fromJson(json: String): Map[String, Seq[Long]] =
    (JsonMethods.parse(json) \ "files") match {
      case JObject(fields) => fields.map {
        case (k, JArray(xs)) => k -> xs.collect {
          case JInt(n) => n.toLong
          case JLong(n) => n
        }
        case (k, other) => throw new IllegalArgumentException(
          s"DV payload entry '$k' is not a position array (got $other)")
      }.toMap
      case other => throw new IllegalArgumentException(
        s"DV payload missing files object (got $other)")
    }
}
