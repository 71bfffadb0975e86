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
    * `efConstruction` are the build parameters) or `ivf` (per-file
    * IVF-Flat cells — [[newspipe.ops.IvfFlat]]; `nlist` cells at build,
    * `nprobe` probed at search). Parameters are baked into every shard —
    * changing them means a new index.
    */
  final case class Meta(name: String, kind: String, idCol: String,
      vecCol: String, m: Int, efConstruction: Int,
      nlist: Int = 64, nprobe: Int = 8)

  val Kinds: Set[String] = Set("hnsw", "ivf")

  val DirName = "_vindex"
  val MetaFile = "_INDEX.json"

  def indexRoot(layerPath: String, name: String): Path =
    new Path(s"$layerPath/$DirName/$name")

  def shardsDir(layerPath: String, name: String): Path =
    new Path(indexRoot(layerPath, name), "shards")

  /** Content address of a data file's shard artifact: md5 of the
    * FS-qualified absolute path (stable across snapshots — a carried
    * file keeps its path; scheme+authority qualified so two lakes on
    * different stores never alias).
    */
  def digestOf(qualifiedPath: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(qualifiedPath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  def toJson(m: Meta): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"name": ${q(m.name)}, "kind": ${q(m.kind)}, """ +
      s""""idCol": ${q(m.idCol)}, "vecCol": ${q(m.vecCol)}, """ +
      s""""m": ${m.m}, "efConstruction": ${m.efConstruction}, """ +
      s""""nlist": ${m.nlist}, "nprobe": ${m.nprobe}}"""
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
      nlist = num("nlist", Some(64)), nprobe = num("nprobe", Some(8)))
  }

  /** Digests of the artifacts currently present (one listing). */
  def existingShards(f: FileSystem, layerPath: String,
      name: String): Set[String] = {
    val dir = shardsDir(layerPath, name)
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).iterator.map(_.getPath.getName)
      .filter(_.endsWith(".ann")).map(_.stripSuffix(".ann")).toSet
  }

  /** Write one shard artifact crash-safely: temp file + rename. The
    * content is DETERMINISTIC for a given data file (ascending-id
    * insertion over immutable bytes), so a lost rename race with a
    * concurrent maintainer is benign — whoever wins wrote the same
    * bytes; the loser just drops its temp.
    */
  def writeShard(f: FileSystem, layerPath: String, name: String,
      digest: String, bytes: Array[Byte]): Unit = {
    val dir = shardsDir(layerPath, name)
    f.mkdirs(dir)
    val tmp = new Path(dir,
      s".$digest.ann.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    val dst = new Path(dir, s"$digest.ann")
    if (!f.rename(tmp, dst)) f.delete(tmp, false)
  }
}
