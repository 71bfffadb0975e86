package newspipe.streaming

import newspipe.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §7 extension: sessionization — batch window form vs flatMapGroupsWithState
  * streaming form produce the same sessions.
  */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // user A: two sessions (gap 3600s at 10:00→12:00); user B: one session
  private val events = Seq(
    ("A", ts("2026-01-01 09:00:00")),
    ("A", ts("2026-01-01 09:10:00")),
    ("A", ts("2026-01-01 09:59:00")),
    ("A", ts("2026-01-01 12:00:00")),
    ("A", ts("2026-01-01 12:05:00")),
    ("B", ts("2026-01-01 09:00:00")),
    ("B", ts("2026-01-01 09:30:00")))

  test("batch: lag-window sessionization splits on the gap") {
    val out = Sessionize.batch(events.toDF("user", "ts"), "user", "ts", gapSeconds = 3600)
      .as[Sessionize.Session].collect()
      .sortBy(s => (s.key, s.session_start.getTime))
    out.map(s => (s.key, s.n_events)) shouldBe Array(("A", 3L), ("A", 2L), ("B", 2L))
    out(0).session_end shouldBe ts("2026-01-01 09:59:00")
    out(1).session_start shouldBe ts("2026-01-01 12:00:00")
  }

  test("streaming: flatMapGroupsWithState emits closed sessions; open stay in state") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, java.sql.Timestamp)]
    stream.addData(events: _*)
    val q = Sessionize.streaming(stream.toDF().toDF("user", "ts"), "user", "ts", 3600)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // closed in-batch: only A's first session (A 12:00 and B's are still open)
    val closed = spark.table("sessions").as[Sessionize.Session].collect()
    closed.map(s => (s.key, s.n_events)).toSet shouldBe Set(("A", 3L))
  }

  test("streaming across batches: a late-arriving burst closes the earlier session") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, java.sql.Timestamp)]
    val out = Sessionize.streaming(stream.toDF().toDF("user", "ts"), "user", "ts", 3600)
    val q = out.writeStream.format("memory").queryName("sessions2")
      .outputMode("append").start()
    try {
      stream.addData(("A", ts("2026-01-01 09:00:00")), ("A", ts("2026-01-01 09:30:00")))
      q.processAllAvailable()
      spark.table("sessions2").count() shouldBe 0 // still open
      stream.addData(("A", ts("2026-01-01 13:00:00")))
      q.processAllAvailable()
      val closed = spark.table("sessions2").as[Sessionize.Session].collect()
      closed.map(s => (s.key, s.n_events, s.session_end)) shouldBe
        Array(("A", 2L, ts("2026-01-01 09:30:00")))
    } finally q.stop()
  }
}
