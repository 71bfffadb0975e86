package newspipe.io

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.Base64

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, In, InSet, Literal, Or}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-file Bloom-filter index sidecar — the Delta `bloomFilterIndex` /
  * Parquet bloom role for the lake: point-predicate file skipping on
  * columns whose values are spread across every file, where min/max stats
  * ([[FileStats]]) can never prune (a `doc_id = K` lookup against a layer
  * range-clustered by anything else touches every file under stats-only
  * skipping; with a per-file bloom it touches ~1).
  *
  * Shape and lifecycle mirror the stats sidecar exactly:
  *
  *  - `_BLOOM.json` lives inside the snapshot/version dir beside
  *    `_STATS.json`, keyed by the same base-relative data-file paths, so
  *    carry-by-reference commits CARRY bloom entries by key — a commit
  *    pays the build cost only for its OWN new files (the Delta write-time
  *    property: index cost ∝ commit increment, never layer size).
  *  - Entries are keyed by PHYSICAL column names (what the parquet files
  *    carry and what alias-pushed scan filters reference under column
  *    mapping), so RENAME COLUMN keeps every carried entry valid.
  *  - Probing is tri-state conservative: a file with no entry, a column
  *    with no bloom, a non-point predicate, or an un-indexable literal
  *    type always KEEPS the file. Pruning can only shrink the scanned
  *    set, never the answer. Deleted rows of DV-carrying files stay in
  *    their bloom — over-inclusion is the safe direction.
  *
  * At 100 TB: the build is one distributed pass over the new files'
  * indexed columns (map-side per-file partial sketches, merged by key —
  * no shuffle of data rows); probes are driver-side bit tests during
  * planning. A very large deployment shards the sidecar per column and
  * lazy-loads only the columns a query's predicates name — the JSON head
  * already records `cols`, so that split is a storage refactor, not a
  * format change.
  */
object BloomIndex {

  val SidecarName = "_BLOOM.json"

  /** Layer property naming the indexed (logical) columns, comma-joined. */
  val ColsProp = "lake.bloomIndex.cols"

  /** Layer property overriding the false-positive probability. */
  val FppProp = "lake.bloomIndex.fpp"

  val DefaultFpp = 0.01

  /** One file's blooms by physical column name. */
  type FileBlooms = Map[String, BloomFilter]

  // ------------------------------------------------------------- put/probe

  /** Feed one non-null JVM value (external Row representation) into a
    * bloom. Supported: strings and integral types — the point-lookup
    * column kinds. Integrals widen to long so an INT build matches a
    * BIGINT probe and vice versa.
    */
  def put(bf: BloomFilter, v: Any): Unit = v match {
    case s: String => bf.putString(s)
    case n: java.lang.Long => bf.putLong(n.longValue)
    case n: java.lang.Integer => bf.putLong(n.longValue)
    case n: java.lang.Short => bf.putLong(n.longValue)
    case n: java.lang.Byte => bf.putLong(n.longValue)
    case _ => ()
  }

  /** Can a column be bloom-indexed? (Gate for `enableBloomIndex`.) */
  def indexableType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.StringType => true
      case org.apache.spark.sql.types.LongType => true
      case org.apache.spark.sql.types.IntegerType => true
      case org.apache.spark.sql.types.ShortType => true
      case org.apache.spark.sql.types.ByteType => true
      case _ => false
    }

  /** Might the bloom for `name` contain Catalyst-internal value `v`?
    * Unknown shapes answer true (keep).
    */
  private def probe(blooms: FileBlooms, name: String, v: Any): Boolean =
    blooms.get(name) match {
      case None => true
      case Some(bf) => v match {
        case null => true
        case s: UTF8String => bf.mightContainBinary(s.getBytes)
        case n: java.lang.Long => bf.mightContainLong(n.longValue)
        case n: java.lang.Integer => bf.mightContainLong(n.longValue)
        case n: java.lang.Short => bf.mightContainLong(n.longValue)
        case n: java.lang.Byte => bf.mightContainLong(n.longValue)
        case _ => true
      }
    }

  /** Conservative may-match of one scan filter against one file's blooms:
    * false ONLY when the filter provably selects nothing from the file.
    * Handles the point shapes (=, <=>, IN, optimizer InSet) and their
    * boolean combinations; everything else answers true.
    */
  def mayMatch(blooms: FileBlooms, e: Expression): Boolean = e match {
    case And(l, r) => mayMatch(blooms, l) && mayMatch(blooms, r)
    case Or(l, r) => mayMatch(blooms, l) || mayMatch(blooms, r)
    case EqualTo(a: AttributeReference, Literal(v, _)) => probe(blooms, a.name, v)
    case EqualTo(Literal(v, _), a: AttributeReference) => probe(blooms, a.name, v)
    case EqualNullSafe(a: AttributeReference, Literal(v, _)) =>
      probe(blooms, a.name, v)
    case EqualNullSafe(Literal(v, _), a: AttributeReference) =>
      probe(blooms, a.name, v)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.isEmpty || vs.exists { case Literal(v, _) => probe(blooms, a.name, v) }
    case InSet(a: AttributeReference, vs) =>
      vs.isEmpty || vs.exists(v => probe(blooms, a.name, v))
    case _ => true
  }

  // ----------------------------------------------------------------- codec

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Sidecar JSON: `{"fpp":…,"cols":[…],"files":{rel:{col:base64}}}`.
    * `cols` records the PHYSICAL names the entries were built over, so a
    * later commit can tell a carried entry covering the current index
    * spec from one that predates an index-column change.
    */
  def toJson(fpp: Double, cols: Seq[String],
      files: Map[String, Map[String, Array[Byte]]]): String = {
    val enc = Base64.getEncoder
    JsonMethods.compact(JsonMethods.render(JObject(List(
      "fpp" -> JDouble(fpp),
      "cols" -> JArray(cols.sorted.map(c => JString(c)).toList),
      "files" -> JObject(files.toList.sortBy(_._1).map { case (rel, m) =>
        rel -> (JObject(m.toList.sortBy(_._1).map { case (c, b) =>
          c -> (JString(enc.encodeToString(b)): JValue)
        }): JValue)
      })))))
  }

  def fromJson(json: String):
      (Double, Seq[String], Map[String, Map[String, Array[Byte]]]) = {
    val dec = Base64.getDecoder
    val root = JsonMethods.parse(json)
    val fpp = root \ "fpp" match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case _ => DefaultFpp
    }
    val cols = root \ "cols" match {
      case JArray(vs) => vs.collect { case JString(s) => s }
      case _ => Nil
    }
    val files = root \ "files" match {
      case JObject(fs) => fs.map { case (rel, v) =>
        rel -> (v match {
          case JObject(cs) => cs.collect {
            case (c, JString(b64)) => c -> dec.decode(b64)
          }.toMap
          case _ => Map.empty[String, Array[Byte]]
        })
      }.toMap
      case _ => Map.empty[String, Map[String, Array[Byte]]]
    }
    (fpp, cols, files)
  }
}
