package newspipe.io

import newspipe.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Version-name ordering under writer clock skew: names ARE the lineage
  * order (history, "newest", restore targets and the rebase re-id all
  * sort by name), so a writer whose clock runs behind the head's writer
  * must still mint ABOVE the head. Pins the mint floor
  * (`newVersionIdAfterHead`) and the commit-time ordering guard's
  * retry-heals contract.
  */
class LakeVersionOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def newLake(): (String, Lake) = {
    val base = Files.createTempDirectory("lake_vord").toString
    (base, new Lake(spark, LakeConfig(basePath = base)))
  }

  /** Clone the current head version dir to a FUTURE-dated name and mark
    * it committed — the artifact a badly forward-skewed foreign writer
    * leaves (a committed head whose name is hours ahead of wall clock).
    */
  private def plantFutureHead(base: String, layer: String,
      lake: Lake): String = {
    val head = lake.listVersions(layer).head
    val future = f"${System.currentTimeMillis() + 3600L * 1000}%016d-ffffffff"
    val src = java.nio.file.Paths.get(s"$base/$layer/_v/$head")
    val dst = java.nio.file.Paths.get(s"$base/$layer/_v/$future")
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      val n = p.getFileName.toString
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      // skip the marker (rewritten below) and every Hadoop .crc sidecar
      // (stale checksums against rewritten content throw ChecksumException)
      else if (n != "_COMMITTED" && !(n.startsWith(".") && n.endsWith(".crc")))
        java.nio.file.Files.copy(p, t)
    }
    // pointer then marker (content = parent), as the protocol writes them
    val lastP = java.nio.file.Paths.get(s"$base/$layer/_v/_LAST")
    java.nio.file.Files.write(lastP, future.getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      lastP.resolveSibling("._LAST.crc"))
    java.nio.file.Files.write(dst.resolve("_COMMITTED"),
      head.getBytes("UTF-8"))
    future
  }

  test("mint floor: a commit over a FUTURE-named head still sorts above " +
      "it — the new commit is unambiguously newest") {
    val (base, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "docs")
    val future = plantFutureHead(base, "docs", lake)
    lake.headVersion("docs") shouldBe Some(future)
    lake.appendAtomic(Seq((3L, "c")).toDF("id", "s"), "docs")
    val head = lake.listVersions("docs").head
    assert(head > future,
      s"new commit '$head' must sort above the future head '$future'")
    lake.headVersion("docs") shouldBe Some(head)
    // parent lineage records the future head, content is its rows + ours
    lake.read("docs").count() shouldBe 3L
    lake.historyRows("docs").last.getString(3) shouldBe future
  }

  test("mid-flight future commit: the ordering is healed by the OCC " +
      "retry (re-mint above the new head), nothing silently non-head") {
    val (base, lake) = newLake()
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "docs")
    var future: String = null
    lake.onBeforeManifestCommit = () => {
      lake.onBeforeManifestCommit = () => ()
      future = plantFutureHead(base, "docs", lake)
    }
    try {
      lake.retryOnConflict() {
        lake.appendAtomic(Seq((3L, "c")).toDF("id", "s"), "docs")
      }
    } finally lake.onBeforeManifestCommit = () => ()
    val head = lake.listVersions("docs").head
    assert(future != null, "the race seam must have fired")
    assert(head > future,
      s"retried commit '$head' must sort above the planted head '$future'")
    // retry re-read the future head (2 rows) and appended onto it
    lake.read("docs").count() shouldBe 3L
  }

  test("restore and OPTIMIZE over a future-named head keep name order") {
    val (base, lake) = newLake()
    lake.writeAtomic((1L to 40L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(4), "docs")
    val v1 = lake.listVersions("docs").head
    lake.appendAtomic(Seq((99L, "z")).toDF("id", "s"), "docs")
    val future = plantFutureHead(base, "docs", lake)
    lake.compact("docs") // maintenance rewrite commits above the future head
    val afterOpt = lake.listVersions("docs").head
    assert(afterOpt > future)
    val r = lake.restore("docs", v1) // restore commit too
    val afterRestore = lake.listVersions("docs").head
    assert(afterRestore > afterOpt)
    lake.read("docs").count() shouldBe 40L
  }
}
