package newspipe.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared layout + IO for per-data-file index artifacts — the mechanics
  * both persisted index families ride ([[VectorIndex]]: `_vindex`/`.ann`
  * HNSW/IVF shards; [[DedupIndex]]: `_dindex`/`.sig` MinHash band
  * signatures).
  *
  * {{{
  * layer/<dirName>/<name>/_INDEX.json          — the declaration
  * layer/<dirName>/<name>/shards/<digest><ext> — one artifact PER DATA
  *                                               FILE, digest =
  *                                               md5(qualified file path)
  * }}}
  *
  * Content addressing is the load-bearing idea: lake data files are
  * immutable, so an artifact never invalidates — appends add artifacts
  * for their new files only (O(increment)), rewrites leave the inputs'
  * artifacts as debris VACUUM reclaims, time travel reads a carried
  * file's artifact unchanged, and a SHALLOW CLONE borrows the source's
  * artifacts byte-for-byte (the digest keys the qualified DATA-file
  * path, which the clone's rels resolve to). Underscore-prefixed dirs,
  * so data listings and partition discovery never see an index.
  */
object IndexArtifacts {

  val MetaFile = "_INDEX.json"

  def indexRoot(dirName: String, layerPath: String, name: String): Path =
    new Path(s"$layerPath/$dirName/$name")

  def shardsDir(dirName: String, layerPath: String, name: String): Path =
    new Path(indexRoot(dirName, layerPath, name), "shards")

  /** Content address of a data file's artifact: md5 of the FS-qualified
    * absolute path (stable across snapshots — a carried file keeps its
    * path; scheme+authority qualified so two lakes on different stores
    * never alias).
    */
  def digestOf(qualifiedPath: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(qualifiedPath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Digests of the artifacts currently present (one listing). */
  def existingShards(dirName: String, ext: String, f: FileSystem,
      layerPath: String, name: String): Set[String] = {
    val dir = shardsDir(dirName, layerPath, name)
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).iterator.map(_.getPath.getName)
      .filter(_.endsWith(ext)).map(_.stripSuffix(ext)).toSet
  }

  /** Write one artifact crash-safely: temp file + rename. Artifact
    * content is DETERMINISTIC for a given data file (a pure function of
    * immutable bytes), so a lost rename race with a concurrent
    * maintainer is benign — whoever wins wrote the same bytes; the
    * loser just drops its temp.
    */
  def writeShard(dirName: String, ext: String, f: FileSystem,
      layerPath: String, name: String, digest: String,
      bytes: Array[Byte]): Unit = {
    val dir = shardsDir(dirName, layerPath, name)
    f.mkdirs(dir)
    val tmp = new Path(dir,
      s".$digest$ext.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    val dst = new Path(dir, s"$digest$ext")
    if (!f.rename(tmp, dst)) f.delete(tmp, false)
  }
}
