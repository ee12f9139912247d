package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators for the events stream. The reference has
  * no streaming path (SURVEY §1.3) — its analog is incremental re-crawl —
  * but the engine ships the streaming shapes a web-scale ingest needs:
  * watermarked tumbling windows and stateful sessionization. The same
  * transformations run on batch DataFrames (tested against the batch
  * sessionize query) and on `readStream` sources.
  */
object StreamOps {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionUpdate(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           total_value: Double, closed: Boolean)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Watermarked tumbling hourly counts — works on batch or stream. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("event_type"), col("window.start").as("hr"),
        col("n"), col("sum_value"))
  }

  /** Streaming exact dedup on content hash — the ingest-time analog of the
    * batch keep-first dedup (ChunkerJob.dedup): a re-crawled page whose
    * normalized text already streamed through within the watermark horizon
    * is dropped. State is bounded by the watermark (late duplicates beyond
    * it are handled by the batch incremental merge, the same contract as
    * the reference's re-crawl path). Works on batch frames too (plain
    * dropDuplicates).
    *
    * Input: (url, warc_ts, text); output adds the dedup hash column.
    */
  def dedupStream(pages: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val hashed = pages.withColumn("text_hash",
      md5(regexp_replace(lower(col("text")), "(?U)\\W+", "")))
    if (pages.isStreaming)
      hashed.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark("text_hash")
    else hashed.dropDuplicates("text_hash")
  }

  /** Epoch microseconds of a Timestamp — the batch sessionize query
    * compares `unix_micros`, so the streaming path must use the identical
    * granularity: a gap in (1800.000, 1800.001] s must classify the same
    * way on both paths (`getTime` is only millisecond-grained).
    */
  private[graft] def micros(ts: Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def fromMicros(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Stateful sessionization with a 30-minute inactivity gap via
    * flatMapGroupsWithState (event-time-ish using processing-time timeout
    * as the close signal; emits updates per batch). State timestamps are
    * epoch micros, matching the batch query's unix_micros semantics.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
          for (e <- sorted) {
            val t = micros(e.ts)
            if (st == null) st = SessionState(t, t, 1, e.value)
            else if (t - st.last > gapSeconds * 1000000L) {
              out += SessionUpdate(userId, fromMicros(st.start),
                fromMicros(st.last), st.n, st.total, closed = true)
              st = SessionState(t, t, 1, e.value)
            } else st = SessionState(st.start, t, st.n + 1, st.total + e.value)
          }
          if (st != null) {
            state.update(st)
            out += SessionUpdate(userId, fromMicros(st.start),
              fromMicros(st.last), st.n, st.total, closed = false)
          }
          out.iterator
      }
  }
}
