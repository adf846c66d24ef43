package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Structured Streaming operators driven through MemoryStream - the
  * incremental twin of the batch event queries. Data is added BEFORE
  * start so the first micro-batch sees it; processAllAvailable drains. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) =
    java.sql.Timestamp.valueOf(f"2026-08-01 10:$min%02d:00")

  test("windowed type counts aggregate incrementally with a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(1), 7, "click", 1.0),
      Event(2, ts(2), 7, "click", 2.0),
      Event(3, ts(12), 8, "view", 5.0))
    val query = EventStream.windowedTypeCounts(input.toDF(), "10 minutes", "20 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    query.processAllAvailable()
    query.stop()

    val rows = spark.sql(
      "SELECT event_type, n_events, sum_value FROM win_counts")
      .as[(String, Long, Double)].collect().toSet
    assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("append-mode file sink emits watermark-closed windows (scale path)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // two early windows plus a late-hour event that advances the
    // watermark far enough to close them
    input.addData(
      Event(1, ts(1), 7, "click", 1.0),
      Event(2, ts(2), 7, "click", 2.0),
      Event(3, ts(12), 8, "view", 5.0),
      Event(4, java.sql.Timestamp.valueOf("2026-08-01 12:00:00"), 9, "late", 1.0))
    val out = java.nio.file.Files.createTempDirectory("stream_out").toString
    val ckp = java.nio.file.Files.createTempDirectory("stream_ckp").toString
    val query = EventStream.windowedTypeCountsToFiles(
      input.toDF(), out, ckp, "10 minutes", "20 minutes")
    query.awaitTermination()

    val rows = spark.read.parquet(out)
      .select("event_type", "n_events").as[(String, Long)].collect().toSet
    // windows more than the watermark behind 12:00 are closed + emitted;
    // the 12:00 window itself is still open -> not in the files
    assert(rows == Set(("click", 2L), ("view", 1L)))
  }

  test("streaming dedupe drops replayed event ids") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(1), 7, "click", 1.0),
      Event(1, ts(1), 7, "click", 1.0), // exact replay
      Event(2, ts(2), 7, "click", 2.0))
    val query = EventStream.dedupeEvents(input.toDF(), "20 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    query.processAllAvailable()
    query.stop()

    assert(spark.sql("SELECT count(*) FROM deduped").as[Long].head() == 2L)
  }

  test("streaming dedupe equals batch dropDuplicates (same surviving set)") {
    implicit val sqlCtx = spark.sqlContext
    val events = (1 to 30).flatMap { i =>
      val e = Event(i.toLong, ts(i), i % 5, if (i % 2 == 0) "click" else "view",
        i.toDouble)
      Seq(e, e) // every event replayed once
    }
    val input = MemoryStream[Event]
    input.addData(events: _*)
    val query = EventStream.dedupeEvents(input.toDF(), "20 minutes")
      .writeStream.format("memory").queryName("dedup_vs_batch")
      .outputMode("append").start()
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("dedup_vs_batch")
      .select("event_id", "user_id", "event_type", "value")
      .as[(Long, Long, String, Double)].collect().toSeq
    val batch = events.toDF().dropDuplicates("event_id")
      .select("event_id", "user_id", "event_type", "value")
      .as[(Long, Long, String, Double)].collect().toSeq
    // set equality AND no double-emits (each key exactly once)
    assert(streamed.sorted == batch.sorted)
    assert(streamed.map(_._1).distinct.size == streamed.size)
  }

  test("session windows close at the gap and emit once on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // user 7: events at 10:01 and 10:05 (one session, gap 10 min), then
    // 10:30 (past the gap -> second session); the 13:00 event advances
    // the watermark far enough to close and emit all of user 7's sessions
    input.addData(
      Event(1, ts(1), 7, "click", 1.0),
      Event(2, ts(5), 7, "click", 2.0),
      Event(3, ts(30), 7, "view", 4.0),
      Event(4, java.sql.Timestamp.valueOf("2026-08-01 13:00:00"), 9, "late", 1.0))
    val query = EventStream.sessionStats(input.toDF(), gap = "10 minutes",
        watermark = "30 minutes", streaming = true)
      .writeStream.format("memory").queryName("session_windows")
      .outputMode("append").start()
    query.processAllAvailable()
    query.stop()

    val rows = spark.sql(
      """SELECT user_id, n_events, sum_value,
                sess_end_s - sess_start_s AS len_s
         FROM session_windows""")
      .as[(Long, Long, Double, Long)].collect().toSet
    // session 1: 10:01-10:05 + 10-min gap = 840s span; session 2: one
    // event + gap = 600s. The 13:00 session is still open -> not emitted.
    assert(rows == Set((7L, 2L, 3.0, 840L), (7L, 1L, 4.0, 600L)))
  }

  test("batch and streaming session stats agree (same plan, same result)") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts(1), 7, "click", 1.0),
      Event(2, ts(5), 7, "click", 2.0),
      Event(3, ts(30), 7, "view", 4.0),
      Event(4, ts(2), 9, "view", 8.0))
    val batch = EventStream.sessionStats(events.toDF(), gap = "10 minutes")
      .as[(Long, Long, Long, Long, Double)].collect().toSet

    val input = MemoryStream[Event]
    input.addData(events: _*)
    input.addData(Event(5, java.sql.Timestamp.valueOf("2026-08-01 13:00:00"),
      1, "late", 0.0)) // watermark push so every earlier session closes
    val query = EventStream.sessionStats(input.toDF(), gap = "10 minutes",
        watermark = "30 minutes", streaming = true)
      .writeStream.format("memory").queryName("session_both")
      .outputMode("append").start()
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("session_both")
      .as[(Long, Long, Long, Long, Double)].collect().toSet

    assert(batch.filter(_._3 != 1L) == streamed.filter(_._3 != 1L))
  }

  test("keyed session state accumulates per user") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(1), 7, "click", 1.0),
      Event(2, ts(2), 7, "click", 2.5),
      Event(3, ts(3), 9, "view", 4.0))
    val query = EventStream.userSessions(input.toDS(), timeoutMs = 0)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    query.processAllAvailable()
    query.stop()

    val rows = spark.sql(
      "SELECT user_id, n_events, sum_value, closed FROM sessions")
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(rows == Set((7L, 2L, 3.5, false), (9L, 1L, 4.0, false)))
  }

  test("stream-stream interval join matches batch; bounds respected") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    // user 7: view at :01, clicks at :02 (in 0-5min window), :20 (out);
    // user 9: click at :02 with no view; user 8: view only
    clicks.addData(
      Event(10, ts(2), 7, "click", 1.0),
      Event(11, ts(20), 7, "click", 1.0),
      Event(12, ts(2), 9, "click", 1.0))
    views.addData(
      Event(20, ts(1), 7, "view", 1.0),
      Event(21, ts(3), 8, "view", 1.0))
    val joined = EventStream.intervalJoin(
      clicks.toDF(), views.toDF(), key = "user_id",
      loSec = 0, hiSec = 300)
    val query = joined.select($"l_event_id", $"r_event_id")
      .writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    query.processAllAvailable()
    query.stop()
    val rows = spark.sql("SELECT l_event_id, r_event_id FROM ij")
      .as[(Long, Long)].collect().toSet
    assert(rows == Set((10L, 20L)))

    // the same operator over batch frames gives the same pairs
    val bClicks = Seq(Event(10, ts(2), 7, "click", 1.0),
      Event(11, ts(20), 7, "click", 1.0),
      Event(12, ts(2), 9, "click", 1.0)).toDF()
    val bViews = Seq(Event(20, ts(1), 7, "view", 1.0),
      Event(21, ts(3), 8, "view", 1.0)).toDF()
    val batch = EventStream.intervalJoin(bClicks, bViews, "user_id", 0, 300)
      .select($"l_event_id", $"r_event_id").as[(Long, Long)].collect().toSet
    assert(batch == rows)
  }

  test("prep map stages (scrub + quality filter) run unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "it runs away to the forest with a spring in its step for a while"
    val docs = Seq(
      (1L, good + " mail me@example.com ok"),
      (2L, "too short"))
    // stateless map stages compose onto a stream exactly as in batch -
    // the SAME code path PrepPipeline.run uses (its dedup window is the
    // one stateful stage and stays batch-side by design)
    def stages(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.withQualityFilter(
        graft.llm.TextAnalysis.withScrubbedText(df), "scrubbed")
        .select($"doc_id", $"n_emails", $"keep")
    val batch = stages(docs.toDF("doc_id", "text"))
      .as[(Long, Int, Int)].collect().toSet

    val input = MemoryStream[(Long, String)]
    input.addData(docs: _*)
    val q = stages(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("prep_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("prep_stream")
      .as[(Long, Int, Int)].collect().toSet
    assert(streamed == batch && batch ==
      Set((1L, 1, 1), (2L, 0, 0)))
  }

  test("windowed streaming HLL registers equal the batch sketch per window") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // users 7,8,7,9 in the 10:00 window; 8,7 in 10:10 - duplicates must
    // fold into the same register state, and incremental max over two
    // micro-batch adds must equal the one-shot batch registers
    val events = Seq(
      Event(1, ts(1), 7, "click", 1.0), Event(2, ts(2), 8, "view", 1.0),
      Event(3, ts(3), 7, "click", 1.0), Event(4, ts(4), 9, "view", 1.0),
      Event(5, ts(12), 8, "view", 1.0), Event(6, ts(13), 7, "click", 1.0))

    val input = MemoryStream[Event]
    input.addData(events.take(3): _*)
    input.addData(events.drop(3): _*)
    val q = EventStream.windowedHllRegisters(input.toDF(),
        col("user_id").cast("string"), "10 minutes", "20 minutes")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      """SELECT CAST(window.start AS STRING) AS w, bucket, max(m_j) AS m_j
         FROM hll_stream GROUP BY 1, 2""") // update mode re-emits rows; max folds revisions
      .as[(String, Long, Int)].collect().toSet

    val batch = graft.llm.Sketches.hllRegisters(
        events.toDF()
          .select(date_trunc("minute", col("ts")).as("t0"), col("user_id"))
          .withColumn("w", date_format(
            expr("timestamp_seconds(floor(unix_timestamp(t0) / 600) * 600)"),
            "yyyy-MM-dd HH:mm:ss")),
        "w", col("user_id").cast("string"))
      .as[(String, Long, Int)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }
}
