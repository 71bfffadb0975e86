package newspipe.io

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import newspipe.SparkTestBase
import org.apache.hadoop.fs.{FileSystem, Path}

/** The [[CommitStore]] seam: a foreign coordinator slots into the commit
  * funnel unchanged — the OCC race behavior (every writer lands, losers
  * bounce-and-retry) holds through [[InMemoryCommitStore]] exactly as it
  * does through the default lock file, and the critical section really is
  * exclusive under the double (overlap instrumented, not assumed).
  */
class CommitStoreSpec extends SparkTestBase {
  import spark.implicits._

  /** Instrumented double: delegates exclusion to a JVM lock (the foreign-
    * coordinator shape) while counting how many bodies are inside the
    * section at once — the seam's contract, observed.
    */
  private final class ProbingStore extends CommitStore {
    val inside = new AtomicInteger(0)
    @volatile var maxInside = 0
    @volatile var sections = 0
    private val inner = InMemoryCommitStore
    override def withExclusive[T](root: Path, f: FileSystem)(
        body: (() => Boolean) => T): T =
      inner.withExclusive(root, f) { probe =>
        val now = inside.incrementAndGet()
        maxInside = math.max(maxInside, now)
        sections += 1
        try body(probe) finally inside.decrementAndGet()
      }
  }

  test("4 writers racing appendAtomic through the in-memory coordinator: " +
      "all increments land, the section never overlaps, zero lock files") {
    val dir = Files.createTempDirectory("lake_cstore").toString
    val probe = new ProbingStore
    val lake = new Lake(spark,
      LakeConfig(basePath = dir, commitStore = probe))
    lake.writeAtomic(Seq((0L, "base")).toDF("id", "text"), "docs")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (1 to 4).map { w =>
      Future {
        lake.retryOnConflict(maxAttempts = 10, baseBackoffMs = 20L) {
          lake.appendAtomic(
            Seq((w.toLong, s"writer$w")).toDF("id", "text"), "docs")
        }
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    lake.read("docs").select("id").as[Long].collect().sorted shouldBe
      Array(0L, 1L, 2L, 3L, 4L)
    lake.historyRows("docs").map(_.getString(2)) shouldBe
      Seq("WRITE", "APPEND", "APPEND", "APPEND", "APPEND")
    // the double really coordinated: every commit entered the section,
    // and no two bodies ever overlapped
    probe.sections should be >= 5
    probe.maxInside shouldBe 1
    // no _COMMIT_LOCK file was ever created — coordination left the FS
    val vDir = new Path(s"$dir/docs/_v")
    val f = vDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.listStatus(vDir).map(_.getPath.getName)
      .filter(_.startsWith("_COMMIT_LOCK")) shouldBe empty
  }

  test("OCC conflict semantics survive the seam: a sibling commit inside " +
      "the window still bounces the loser with " +
      "ConcurrentModificationException, and retryOnConflict relands") {
    val dir = Files.createTempDirectory("lake_cstore2").toString
    val lake = new Lake(spark,
      LakeConfig(basePath = dir, commitStore = InMemoryCommitStore))
    lake.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), "t")
    lake.onBeforeManifestCommit = () => {
      lake.onBeforeManifestCommit = () => ()
      lake.appendAtomic(Seq((7L, "x")).toDF("id", "k"), "t")
    }
    try {
      lake.retryOnConflict() {
        lake.overwriteWhere("t", Seq((20L, "b")).toDF("id", "k"),
          org.apache.spark.sql.functions.col("k") === "b")
      }
    } finally lake.onBeforeManifestCommit = () => ()
    lake.read("t").select("id").as[Long].collect().sorted shouldBe
      Array(1L, 7L, 20L)
  }

  test("mixed stores on one layer stay correct for same-JVM writers: the " +
      "OCC parent check (not the lock) is the safety net when " +
      "coordination domains differ") {
    // A writer on FsCommitStore and one on InMemoryCommitStore do not
    // share an exclusion domain — the parent-checked marker still makes
    // every commit land-or-bounce (the lock only narrows the race window;
    // correctness rides the CAS). Serialized here: each lands cleanly.
    val dir = Files.createTempDirectory("lake_cstore3").toString
    val fsLake = new Lake(spark, LakeConfig(basePath = dir))
    val memLake = new Lake(spark,
      LakeConfig(basePath = dir, commitStore = InMemoryCommitStore))
    fsLake.writeAtomic(Seq((0L, "base")).toDF("id", "text"), "docs")
    memLake.appendAtomic(Seq((1L, "mem")).toDF("id", "text"), "docs")
    fsLake.appendAtomic(Seq((2L, "fs")).toDF("id", "text"), "docs")
    fsLake.read("docs").select("id").as[Long].collect().sorted shouldBe
      Array(0L, 1L, 2L)
    memLake.historyRows("docs").map(_.getString(2)) shouldBe
      Seq("WRITE", "APPEND", "APPEND")
  }
}
