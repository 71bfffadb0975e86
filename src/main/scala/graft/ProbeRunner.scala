package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** Empirical probe (guide §1, UI-less): run a query warm, then once
  * instrumented, printing every Spark job's duration + description and the
  * DRIVER-SIDE GAPS between jobs (metadata/FS/commit work shows up as gaps,
  * not jobs). Usage: runMain graft.ProbeRunner <q1,q2,...>
  */
object ProbeRunner {
  private case class Job(id: Int, desc: String, start: Long, var end: Long)

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
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

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm: JIT + codegen + footer caches, same as Bench's untimed pass
      (1 to 2).foreach { _ =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
        try spark.catalog.clearCache() catch { case _: Throwable => () }
      }
      val jobs = mutable.ArrayBuffer.empty[Job]
      val listener = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobs += Job(e.jobId, d, System.nanoTime(), 0L)
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.end = System.nanoTime())
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"[probe] $name failed: ${e.getMessage}")
      }
      val t1 = System.nanoTime()
      spark.sparkContext.removeSparkListener(listener)
      val sorted = jobs.sortBy(_.start)
      val jobTotal = sorted.map(j => (j.end - j.start) / 1e9).sum
      println(f"%n=== $name: wall ${(t1 - t0) / 1e9}%.3f s, ${sorted.size} jobs, in-job ${jobTotal}%.3f s, driver gaps ${(t1 - t0) / 1e9 - jobTotal}%.3f s ===")
      var prevEnd = t0
      sorted.foreach { j =>
        val gap = (j.start - prevEnd) / 1e9
        if (gap > 0.005)
          println(f"  [gap ${gap}%.3f s]")
        println(f"  job ${j.id}%4d ${(j.end - j.start) / 1e9}%7.3f s  ${j.desc.take(100)}")
        prevEnd = math.max(prevEnd, j.end)
      }
      val tailGap = (t1 - prevEnd) / 1e9
      if (tailGap > 0.005) println(f"  [tail gap ${tailGap}%.3f s]")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
      try spark.catalog.clearCache() catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
