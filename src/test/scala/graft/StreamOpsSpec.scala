package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long) = new Timestamp(1704067200000L + min * 60000L)

  test("streaming sessionization: gap split, state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamOps.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    // batch 1: two events 5 min apart (one open session)
    input.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(5), 7, "click", 2.0))
    query.processAllAvailable()
    val b1 = spark.sql("SELECT * FROM sessions").as[StreamOps.SessionUpdate].collect()
    assert(b1.exists(s => s.user_id == 7 && s.n_events == 2 && !s.closed))

    // batch 2: 40 min later -> closes the first session, opens a second;
    // state carried across batches
    input.addData(Event(3, ts(45), 7, "buy", 10.0))
    query.processAllAvailable()
    val b2 = spark.sql("SELECT * FROM sessions").as[StreamOps.SessionUpdate].collect()
    assert(b2.exists(s => s.user_id == 7 && s.n_events == 2 && s.closed),
      s"expected closed 2-event session, got ${b2.toSeq}")
    assert(b2.exists(s => s.user_id == 7 && s.n_events == 1 && !s.closed &&
      s.total_value == 10.0))
    query.stop()
  }

  test("sessionize gap boundary is microsecond-exact, matching batch unix_micros") {
    import spark.implicits._
    // Batch semantics: new session iff unix_micros(ts) - unix_micros(prev)
    // > 1_800_000_000. A gap of 1800.0004 s exceeds that by 400 us and must
    // split — but getTime-based ms arithmetic truncates it to exactly
    // 1_800_000 ms (not >) and would keep one session. A gap of
    // 1799.9996 s must not split on either path.
    def tsMicros(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt) // full sub-second nanos
      t
    }
    val base = 1704067200000000L
    assert(StreamOps.micros(tsMicros(base + 1800000400L)) - StreamOps.micros(tsMicros(base))
      == 1800000400L)
    def sessions(gapUs: Long): Int = {
      val ds = Seq(
        Event(1, tsMicros(base), 9, "click", 1.0),
        Event(2, tsMicros(base + gapUs), 9, "click", 1.0)).toDS()
      // one update = single open session; two = closed + new open (split)
      StreamOps.sessionize(ds).collect().length
    }
    assert(sessions(1800000400L) == 2, "gap 1800.0004s must split (batch: > 1800s)")
    assert(sessions(1799999600L) == 1, "gap 1799.9996s must stay one session")
  }

  test("streaming sessionize over the events testdata == oracle-checked batch query") {
    // replay the real events table through the stream in three micro-batches
    // and compare per-user session counts against q_events_sessionize (the
    // driver-oracle-verified batch semantics)
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (StreamOps.micros(e.ts), e.event_id))
    val input = MemoryStream[Event]
    val query = StreamOps.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode(OutputMode.Append()).start()
    val third = events.length / 3
    for (batch <- Seq(events.take(third), events.slice(third, 2 * third),
                      events.drop(2 * third))) {
      input.addData(batch.toIndexedSeq: _*)
      query.processAllAvailable()
    }
    // open sessions re-emit once per batch; a session is identified by its
    // start, so count distinct (user, session_start)
    val streamed = spark.sql("SELECT * FROM sess_parity")
      .as[StreamOps.SessionUpdate].collect()
      .map(s => (s.user_id, s.session_start.getTime)).distinct
      .groupBy(_._1).view.mapValues(_.length).toMap
    query.stop()
    val batchCounts = SparkEntry.queries("q_events_sessionize")(spark, dir)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    assert(streamed.keySet == batchCounts.keySet)
    for ((u, n) <- batchCounts)
      assert(streamed(u).toLong == n, s"user $u: stream ${streamed(u)} vs batch $n")
  }

  test("streaming hourly counts over the events testdata == oracle-checked batch query") {
    // replay the real events table through the watermarked stream in three
    // micro-batches and compare every (event_type, hour) group against
    // q_events_hourly (the driver-oracle-verified batch semantics)
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (StreamOps.micros(e.ts), e.event_id))
    val input = MemoryStream[Event]
    val query = StreamOps.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly_parity")
      .outputMode(OutputMode.Complete()).start()
    val third = events.length / 3
    for (batch <- Seq(events.take(third), events.slice(third, 2 * third),
                      events.drop(2 * third))) {
      input.addData(batch.toIndexedSeq: _*)
      query.processAllAvailable()
    }
    val streamed = spark.sql(
      """SELECT event_type, date_format(hr, 'yyyy-MM-dd HH:mm') AS hr, n, sum_value
         FROM hourly_parity""")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    query.stop()
    val batchRows = SparkEntry.queries("q_events_hourly")(spark, dir)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(streamed.keySet == batchRows.keySet)
    for ((k, (n, s)) <- batchRows) {
      assert(streamed(k)._1 == n, s"$k: stream n ${streamed(k)._1} vs batch $n")
      // batch rounds to 4; stream sums in different float order
      assert(math.abs(streamed(k)._2 - s) < 1e-6, s"$k: sum ${streamed(k)._2} vs $s")
    }
  }

  test("watermarked hourly counts over a stream match batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts(1), 1, "click", 1.0), Event(2, ts(30), 2, "click", 2.0),
      Event(3, ts(61), 1, "buy", 5.0), Event(4, ts(90), 3, "click", 3.0))
    val input = MemoryStream[Event]
    val query = StreamOps.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete()).start()
    input.addData(events: _*)
    query.processAllAvailable()
    val streamed = spark.sql("SELECT event_type, hr, n, sum_value FROM hourly")
      .collect().map(_.toSeq).sortBy(_.toString)
    val batch = StreamOps.hourlyCounts(events.toDF())
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
    query.stop()
  }

  test("streaming dedup drops re-crawled duplicate text within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String)]
    val query = StreamOps.dedupStream(
      input.toDF().toDF("url", "warc_ts", "text"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      ("https://a/1", ts(0), "Alpha beta gamma."),
      ("https://a/2", ts(1), "alpha  BETA gamma"), // same normalized text
      ("https://b/1", ts(2), "something else entirely"))
    query.processAllAvailable()
    input.addData(
      ("https://a/1", ts(10), "Alpha beta gamma."), // re-crawl, dup again
      ("https://c/1", ts(11), "fresh new content"))
    query.processAllAvailable()
    val urls = spark.sql("SELECT url FROM dedup").as[String].collect().sorted.toSeq
    assert(urls == Seq("https://a/1", "https://b/1", "https://c/1"))

    // batch mode: same operator, plain dropDuplicates
    val batch = StreamOps.dedupStream(Seq(
      ("u1", ts(0), "Same text!"), ("u2", ts(1), "same TEXT"),
      ("u3", ts(2), "different")).toDF("url", "warc_ts", "text"))
    assert(batch.count() == 2)
    query.stop()
  }
}
