package newspipe.io

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Recursive file listing that is CHEAP on every filesystem.
  *
  * `FileSystem.listFiles(dir, recursive = true)` materializes
  * `LocatedFileStatus` entries; on the LOCAL filesystem each one loads
  * its permission fields eagerly, and `RawLocalFileSystem`'s deprecated
  * status implementation does that by FORKING `ls` once per file
  * (~5 ms): a 640-file snapshot listing measured ~4 s of subprocess
  * churn — 100× the raw directory walk — and every commit/read of the
  * snapshot protocol paid it. Object stores are the opposite: their
  * recursive listFiles is ONE flat LIST round-trip, while a
  * per-directory walk costs one round-trip per directory. So: manual
  * `listStatus` walk (no permission access → no fork) on `file:`,
  * the native recursive listing everywhere else.
  */
object FsListing {
  /** Scheme via the FS URI: `FileSystem.getScheme`'s base implementation
    * throws UnsupportedOperationException, so FilterFileSystem/custom
    * wrappers that don't override it would crash every listing. The URI
    * scheme is always populated. */
  private def scheme(fs: FileSystem): String = {
    val s = fs.getUri.getScheme
    if (s == null) "" else s
  }

  def filesRecursive(fs: FileSystem, dir: Path): Seq[FileStatus] =
    if (scheme(fs) == "file") {
      val out = Seq.newBuilder[FileStatus]
      def walk(d: Path): Unit = fs.listStatus(d).foreach { s =>
        if (s.isDirectory) walk(s.getPath) else out += s
      }
      walk(dir)
      out.result()
    } else {
      val it = fs.listFiles(dir, true)
      val out = Seq.newBuilder[FileStatus]
      while (it.hasNext) out += it.next()
      out.result()
    }
}
