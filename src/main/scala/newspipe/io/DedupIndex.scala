package newspipe.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** Persisted near-dedup index metadata and artifact serde — the MinHash
  * sibling of [[VectorIndex]], sharing [[IndexArtifacts]]' per-data-file
  * content-addressed layout (`layer/_dindex/<name>/`).
  *
  * Each artifact holds the banded MinHash signatures of ONE immutable
  * data file: `(id, band, bucket)` triples, where bucket is the xxhash64
  * of the band's signature slice ([[newspipe.ops.Dedup.lshBands]]).
  * Shingling + hashing — the expensive pass over the text — therefore
  * runs ONCE per file ever: an append signs its new files only
  * (O(increment)), and [[Lake.nearDups]] joins artifact against artifact
  * on `(band, bucket)` without re-reading a byte of text; document text
  * is touched again only to exact-verify the candidate pairs.
  *
  * At 100 TB: signatures are ~3 orders of magnitude smaller than the
  * text they summarize, so the steady-state dedup cost of landing a new
  * batch is [sign the batch] + [join its signatures against the
  * persisted corpus signatures] + [verify candidates] — the corpus text
  * is never re-shingled.
  */
object DedupIndex {

  /** A declared index. `numHashes`/`bands`/`rows` are the LSH S-curve
    * parameters (rows = numHashes / bands), `shingle` the n-gram size,
    * `threshold` the exact-Jaccard verification floor — all baked into
    * every artifact's semantics; changing them means a new index.
    */
  final case class Meta(name: String, idCol: String, textCol: String,
      numHashes: Int, bands: Int, rows: Int, shingle: Int,
      threshold: Double)

  val DirName = "_dindex"
  val Ext = ".sig"
  val MetaFile: String = IndexArtifacts.MetaFile

  private val Magic = 0x44534731 // "DSG1"

  def indexRoot(layerPath: String, name: String): Path =
    IndexArtifacts.indexRoot(DirName, layerPath, name)

  def shardsDir(layerPath: String, name: String): Path =
    IndexArtifacts.shardsDir(DirName, layerPath, name)

  def existingShards(f: FileSystem, layerPath: String,
      name: String): Set[String] =
    IndexArtifacts.existingShards(DirName, Ext, f, layerPath, name)

  def writeShard(f: FileSystem, layerPath: String, name: String,
      digest: String, bytes: Array[Byte]): Unit =
    IndexArtifacts.writeShard(DirName, Ext, f, layerPath, name, digest,
      bytes)

  def toJson(m: Meta): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    s"""{"name": ${q(m.name)}, "idCol": ${q(m.idCol)}, """ +
      s""""textCol": ${q(m.textCol)}, "numHashes": ${m.numHashes}, """ +
      s""""bands": ${m.bands}, "rows": ${m.rows}, """ +
      s""""shingle": ${m.shingle}, "threshold": ${m.threshold}}"""
  }

  def fromJson(s: String): Meta = {
    def str(k: String): String = {
      val re = ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      re.findFirstMatchIn(s).map(_.group(1)
          .replace("\\\"", "\"").replace("\\\\", "\\"))
        .getOrElse(throw new IllegalStateException(
          s"dedup index metadata missing '$k': $s"))
    }
    def num(k: String): String = {
      val re = ("\"" + k + "\"\\s*:\\s*([0-9.eE+-]+)").r
      re.findFirstMatchIn(s).map(_.group(1))
        .getOrElse(throw new IllegalStateException(
          s"dedup index metadata missing '$k': $s"))
    }
    Meta(str("name"), str("idCol"), str("textCol"),
      num("numHashes").toInt, num("bands").toInt, num("rows").toInt,
      num("shingle").toInt, num("threshold").toDouble)
  }

  /** Serialize one file's `(id, band, bucket)` triples. Sorted before
    * writing so the artifact bytes are DETERMINISTIC for a given data
    * file — the property that makes a lost maintenance rename race
    * benign (both writers produced the same bytes).
    */
  def serialize(triples: Array[(Long, Int, Long)]): Array[Byte] = {
    val sorted = triples.sortBy { case (id, band, _) => (id, band) }
    val bos = new java.io.ByteArrayOutputStream(16 + 20 * sorted.length)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(sorted.length)
    sorted.foreach { case (id, band, bucket) =>
      out.writeLong(id); out.writeInt(band); out.writeLong(bucket)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Array[(Long, Int, Long)] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val magic = in.readInt()
    require(magic == Magic,
      f"not a dedup-index artifact (magic 0x$magic%08x)")
    val n = in.readInt()
    Array.fill(n)((in.readLong(), in.readInt(), in.readLong()))
  }
}
