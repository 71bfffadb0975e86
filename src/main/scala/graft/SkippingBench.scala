package graft

import newspipe.io.{Lake, LakeConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-skipping scale evidence (SCALE.md): on the sf lineitem table,
  * measure what the stats sidecar + Z-order layout buy a selective
  * two-column predicate, against the identical data in an
  * unclustered layout.
  *
  * Protocol (one JSON line at the end):
  *   1. land lineitem twice through the snapshot protocol: `plain`
  *      (size-compacted, no ordering) and `zorder` (compacted
  *      `zorderBy (l_shipdate, l_partkey)`), same target file size;
  *   2. for the 2-dim predicate (≈10% selectivity per column) record
  *      `pruneInfo` on both layouts — files kept / total, row upper
  *      bound kept / total;
  *   3. time the filtered aggregate (sum of extendedprice) warm
  *      median-of-3 through `read().filter` (full scan) and
  *      `readWhere` (pruned scan) on both layouts, and assert the four
  *      results agree.
  *
  * The claims under test: the Z-ordered layout prunes on BOTH columns
  * (the plain layout prunes on neither), and `readWhere` converts pruned
  * files into proportionally less scan work — the effect that at 100 TB
  * is the difference between opening 10⁵ files and opening the few
  * hundred a point query actually needs.
  *
  * Timestamp columns only carry usable footer stats in the INT64 forms —
  * the session pins `outputTimestampType=TIMESTAMP_MICROS` (Spark's
  * legacy INT96 default has no trustworthy min/max, and [[newspipe.io
  * .FileStats]] deliberately records nothing for INT96).
  *
  * Run: `sbt "runMain graft.SkippingBench"`; env SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS as graft.Bench. Artifact: `target/lake_skipping.json`.
  */
object SkippingBench {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val v = f
    (v, (System.nanoTime() - t0) / 1e9)
  }

  private def median3(f: => Unit): Double = {
    f // warm-up
    Seq(timed(f)._2, timed(f)._2, timed(f)._2).sorted.apply(1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("lake_skip").toString
    val lake = new Lake(spark, LakeConfig(basePath = root))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    val targetBytes = 32L * 1024
    lake.writeAtomic(li, "plain")
    lake.compact("plain", targetFileBytes = targetBytes)
    lake.writeAtomic(li, "zorder")
    lake.compact("zorder", targetFileBytes = targetBytes,
      zorderBy = Seq("l_shipdate", "l_partkey"))

    // ~10% of the 1995-2001 shipdate span x 10% of the partkey space
    val pred = col("l_shipdate").between("1999-01-01", "1999-09-01") &&
      col("l_partkey").between(2000L, 3999L)

    val infoPlain = lake.pruneInfo("plain", pred).get
    val infoZ = lake.pruneInfo("zorder", pred).get

    // overheads: what commit-time stats collection costs (re-measured
    // standalone on the committed snapshot — footer reads only), and what
    // one prune DECISION costs (sidecar cached, optimizer resolve + the
    // per-file interval checks)
    val zSnap = {
      val vdir = new java.io.File(s"$root/zorder/_v")
      vdir.listFiles().filter(f => new java.io.File(f, "_COMMITTED").exists())
        .map(_.toString).max
    }
    val statsCollectSec = timed(newspipe.io.FileStats.collect(
      spark.sparkContext.hadoopConfiguration, zSnap))._2
    val pruneSec = median3 { lake.pruneInfo("zorder", pred).get; () }

    def agg(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val r = df.agg(count(lit(1)), sum("l_extendedprice")).as[(Long, Double)]
        .collect().head
      (r._1, r._2)
    }
    val results = Seq(
      agg(lake.read("plain").filter(pred)),
      agg(lake.readWhere("plain", pred)),
      agg(lake.read("zorder").filter(pred)),
      agg(lake.readWhere("zorder", pred)))
    // counts exact; double sums agree to relative 1e-9 (the two layouts
    // sum the same values in different orders — IEEE non-associativity)
    require(results.map(_._1).distinct.size == 1 &&
      results.map(_._2).forall(s =>
        math.abs(s - results.head._2) <= 1e-9 * math.abs(results.head._2)),
      s"pruned and full scans disagree: $results")

    val tFullPlain = median3(agg(lake.read("plain").filter(pred)))
    val tPrunedPlain = median3(agg(lake.readWhere("plain", pred)))
    val tFullZ = median3(agg(lake.read("zorder").filter(pred)))
    val tPrunedZ = median3(agg(lake.readWhere("zorder", pred)))

    val json =
      s"""{"metric":"lake_skipping","rows":${results.head._1},""" +
        s""""files_plain":${infoPlain.totalFiles},""" +
        s""""kept_plain":${infoPlain.keptFiles},""" +
        s""""files_zorder":${infoZ.totalFiles},""" +
        s""""kept_zorder":${infoZ.keptFiles},""" +
        s""""rows_upper_plain":${infoPlain.keptRows},""" +
        s""""rows_upper_zorder":${infoZ.keptRows},""" +
        s""""scan_full_plain_sec":$tFullPlain,""" +
        s""""scan_pruned_plain_sec":$tPrunedPlain,""" +
        s""""scan_full_zorder_sec":$tFullZ,""" +
        s""""scan_pruned_zorder_sec":$tPrunedZ,""" +
        s""""stats_collect_sec":$statsCollectSec,""" +
        s""""prune_decision_sec":$pruneSec,""" +
        s""""sf":"$sfDir"}"""
    println(json)
    try {
      val out = java.nio.file.Paths.get("target", "lake_skipping.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    } catch { case _: Exception => () }
    spark.stop()
  }
}
