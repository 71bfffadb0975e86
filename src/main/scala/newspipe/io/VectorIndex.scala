package newspipe.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** Persisted vector-index metadata and artifact naming — the declarative
  * half of [[Lake]]'s `createVectorIndex`/`vectorSearch` family.
  *
  * === Layout ===
  *
  * {{{
  * layer/_vindex/<name>/_INDEX.json        — the declaration (this doc)
  * layer/_vindex/<name>/shards/<digest>.ann — one serialized HNSW graph
  *                                            PER DATA FILE, digest =
  *                                            md5(qualified file path)
  * }}}
  *
  * The design is CONTENT-ADDRESSED per data file: lake data files are
  * immutable, so a file's shard graph never invalidates — append adds
  * graphs for the new files only (O(increment)), OPTIMIZE's rewritten
  * outputs get fresh graphs while the inputs' graphs become unreferenced
  * debris that VACUUM reclaims, and time-travel reads of older snapshots
  * could search the same artifacts. Coverage is evaluated per search
  * against the CURRENT inventory: a file without an artifact (crashed
  * maintenance, fresh OPTIMIZE output, foreign writer) falls back to an
  * exact brute-force scan OF THAT FILE ONLY — search degrades in cost,
  * never in correctness. Underscore-prefixed, so data listings and
  * partition discovery never see the index.
  *
  * At 100 TB: graphs build where the data sits (one pass over NEW files
  * per maintenance call), searches read ONLY the index artifacts (the
  * corpus is never re-scanned), and the artifact set is embarrassingly
  * parallel — one task per shard graph, queries ride a broadcast.
  */
object VectorIndex {

  /** A declared index. `kind` is `hnsw` (per-file graphs; `m` /
    * `efConstruction` are the build parameters), `ivf` (per-file
    * IVF-Flat cells — [[newspipe.ops.IvfFlat]]; `nlist` cells at build,
    * `nprobe` probed at search), or `pq` (per-file product-quantization
    * codes — [[newspipe.ops.PqShard]]; `pqM` subspaces × `pqK ≤ 256`
    * centroids; search = ADC shortlist + exact refine). Parameters are
    * baked into every shard — changing them means a new index.
    */
  final case class Meta(name: String, kind: String, idCol: String,
      vecCol: String, m: Int, efConstruction: Int,
      nlist: Int = 64, nprobe: Int = 8, pqM: Int = 8, pqK: Int = 256)

  val Kinds: Set[String] = Set("hnsw", "ivf", "pq")

  val DirName = "_vindex"
  val MetaFile: String = IndexArtifacts.MetaFile

  def indexRoot(layerPath: String, name: String): Path =
    IndexArtifacts.indexRoot(DirName, layerPath, name)

  def shardsDir(layerPath: String, name: String): Path =
    IndexArtifacts.shardsDir(DirName, layerPath, name)

  /** Content address of a data file's shard artifact — see
    * [[IndexArtifacts.digestOf]].
    */
  def digestOf(qualifiedPath: String): String =
    IndexArtifacts.digestOf(qualifiedPath)

  def toJson(m: Meta): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"name": ${q(m.name)}, "kind": ${q(m.kind)}, """ +
      s""""idCol": ${q(m.idCol)}, "vecCol": ${q(m.vecCol)}, """ +
      s""""m": ${m.m}, "efConstruction": ${m.efConstruction}, """ +
      s""""nlist": ${m.nlist}, "nprobe": ${m.nprobe}, """ +
      s""""pqM": ${m.pqM}, "pqK": ${m.pqK}}"""
  }

  def fromJson(s: String): Meta = {
    def str(k: String): String = {
      val re = ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      re.findFirstMatchIn(s).map(_.group(1)
          .replace("\\\"", "\"").replace("\\\\", "\\"))
        .getOrElse(throw new IllegalStateException(
          s"vector index metadata missing '$k': $s"))
    }
    def num(k: String, default: Option[Int] = None): Int = {
      val re = ("\"" + k + "\"\\s*:\\s*(\\d+)").r
      re.findFirstMatchIn(s).map(_.group(1).toInt)
        .orElse(default)
        .getOrElse(throw new IllegalStateException(
          s"vector index metadata missing '$k': $s"))
    }
    Meta(str("name"), str("kind"), str("idCol"), str("vecCol"),
      num("m"), num("efConstruction"),
      nlist = num("nlist", Some(64)), nprobe = num("nprobe", Some(8)),
      pqM = num("pqM", Some(8)), pqK = num("pqK", Some(256)))
  }

  /** Digests of the artifacts currently present (one listing). */
  def existingShards(f: FileSystem, layerPath: String,
      name: String): Set[String] =
    IndexArtifacts.existingShards(DirName, ".ann", f, layerPath, name)

  /** Write one shard artifact crash-safely (temp + rename; content is
    * deterministic per data file — ascending-id insertion over immutable
    * bytes — so a lost rename race is benign): see
    * [[IndexArtifacts.writeShard]].
    */
  def writeShard(f: FileSystem, layerPath: String, name: String,
      digest: String, bytes: Array[Byte]): Unit =
    IndexArtifacts.writeShard(DirName, ".ann", f, layerPath, name, digest,
      bytes)
}
