package graft

import newspipe.io.{Lake, LakeConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Lake-maintenance scale evidence (SCALE.md): measure what `batches` of
  * streaming-sink accretion (`writeBatchIdempotent`, the effectively-once
  * foreachBatch path) does to scan cost, and that `compact` recovers it.
  *
  * Protocol, one JSON line at the end:
  *   1. land the sf documents table once as a compact baseline layer →
  *      `scan_baseline_sec` (median-of-3 full-text aggregate after warm-up)
  *      and `files_baseline`;
  *   2. land the SAME rows through `batches` idempotent micro-batch writes
  *      (`__batch_id` partitions, several files each — the small-file
  *      accretion a continuous stream produces) → `accrete_sec` total,
  *      `files_accreted`, `scan_accreted_sec`;
  *   3. `compact(layer)` (snapshot-protocol rewrite, byte-sized file count)
  *      → `compact_sec`, `files_compacted`, `scan_compacted_sec`.
  *
  * The claim under test: scan_accreted ≫ scan_baseline (per-file open +
  * footer cost), and scan_compacted returns to ≈ scan_baseline while rows
  * are preserved exactly.
  *
  * Run: `sbt "runMain graft.LakeMaintBench [batches]"` (default 100); env
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as graft.Bench.
  */
object LakeMaintBench {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val v = f
    (v, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val batches = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("lake_maint").toString
    val lake = new Lake(spark, LakeConfig(basePath = root))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .localCheckpoint(true) // source cost out of every timed section

    def fileCountAt(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      newspipe.io.FsListing.filesRecursive(fs, p).count(s =>
        !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith(".")).toLong
    }
    def fileCount(layer: String): Long = fileCountAt(s"$root/$layer")
    // newest committed snapshot dir (what a post-compaction reader scans);
    // superseded flat files stay on disk by the retention contract, so the
    // layer-root count would overstate the live set
    def liveSnapshotDir(layer: String): Option[String] = {
      val v = new org.apache.hadoop.fs.Path(s"$root/$layer/_v")
      val fs = v.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(v)) None
      else fs.listStatus(v).map(_.getPath)
        .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_COMMITTED")))
        .sortBy(_.getName).lastOption.map(_.toString)
    }
    // the scan under test: full text column + row count (footer + open +
    // decode per file); warm-up then median of 3
    def scanSec(layer: String): Double = {
      def once(): Double =
        timed(lake.read(layer).agg(count(lit(1)), sum(length(col("text"))))
          .collect())._2
      once()
      Seq(once(), once(), once()).sorted.apply(1)
    }

    // 1. compact baseline
    lake.write(docs, "base")
    val filesBase = fileCount("base")
    val scanBase = scanSec("base")
    val nRows = lake.read("base").count()

    // 2. accretion: the same rows through `batches` idempotent batch lands.
    // Each micro-batch repartitions to a handful of files — the shape a
    // real stream (trigger interval ≪ data rate) produces.
    val (_, accreteSec) = timed {
      (0 until batches).foreach { b =>
        lake.writeBatchIdempotent(
          docs.filter(pmod(col("doc_id"), lit(batches)) === b).repartition(4),
          "stream", b.toLong)
      }
    }
    val filesAccreted = fileCount("stream")
    val scanAccreted = scanSec("stream")
    require(lake.read("stream").count() == nRows, "accretion lost rows")

    // 3. compaction through the snapshot protocol (migrates the flat layer)
    val (_, compactSec) = timed(lake.compact("stream"))
    val filesCompacted = liveSnapshotDir("stream").map(fileCountAt)
      .getOrElse(fileCount("stream"))
    val scanCompacted = scanSec("stream")
    require(lake.read("stream").count() == nRows, "compaction lost rows")

    val json =
      s"""{"metric":"lake_maintenance","batches":$batches,"rows":$nRows,""" +
        s""""files_baseline":$filesBase,"scan_baseline_sec":$scanBase,""" +
        s""""accrete_sec":$accreteSec,"files_accreted":$filesAccreted,""" +
        s""""scan_accreted_sec":$scanAccreted,"compact_sec":$compactSec,""" +
        s""""files_compacted":$filesCompacted,"scan_compacted_sec":$scanCompacted,""" +
        s""""sf":"$sfDir"}"""
    println(json)
    try {
      val out = java.nio.file.Paths.get("target", "lake_maint.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    } catch { case _: Exception => () }
    spark.stop()
  }
}
