package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to files — the
  * plan-evidence artifacts under `plans/r18/` (optimization rounds commit
  * before/after plans per touched query).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <q1,q2,...> [exec]
  * writes `<outDir>/<name>_<suffix>.txt` per query. Same session shape as
  * Bench (shuffle.partitions = cpus, UTC, nanosAsLong) so the captured
  * plans are the plans the bench times. With `exec`, the query is RUN
  * first and the FINAL adaptive plan is printed (AQE's initial explain
  * hides runtime stage/exchange reuse — the final plan is where
  * ReusedQueryStage/AQEShuffleRead show up).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (outDir, suffix, names) = (args(0), args(1), args(2))
    val exec = args.length > 3 && args(3) == "exec"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      try {
        val df = fn(spark, sfDir)
        // collect(), not count(): count() wraps the frame in a NEW agg
        // Dataset with its own QueryExecution — the original plan would
        // stay unexecuted (isFinalPlan=false, no runtime reuse visible)
        if (exec) df.collect()
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
        println(s"[plandump] wrote $name ($suffix)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
      try spark.catalog.clearCache() catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
