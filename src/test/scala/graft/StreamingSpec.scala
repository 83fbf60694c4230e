package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, UserSessions}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkSpecBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowedCounts aggregates per hour/type with a watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 2, "click", 2.0),
      Event(3, ts(65), 1, "error", 3.0))
    val q = EventStreams.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Update).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", "click", 2L),
        ("2024-01-01 01:00:00.0", "error", 1L)))
    } finally q.stop()
  }

  test("file-source stream: windowedCounts over readStream parquet equals the batch agg") {
    // The distributed-source path: NO collect() feeds the source (the
    // parquet copy is a distributed write, readStream ingests files
    // one per micro-batch). Settled Complete-mode state must equal
    // the batch events_windowed aggregation exactly.
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.windowedCountsFileStream(spark, sfDir)
      .orderBy(col("window_start"), col("event_type")).collect().toSeq
    val batch = Tables.events(spark, sfDir)
      .withColumn("window_start", date_trunc("hour", col("ts")))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("window_start"), col("event_type")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("MemoryStream replay and the file source settle to the same windowed state") {
    // Two ingest harnesses, one plan: the one-batch MemoryStream
    // replay and the multi-micro-batch file source must agree row for
    // row (Complete mode keeps window state past the watermark, so
    // batch boundaries cannot change the settled result).
    import org.apache.spark.sql.functions.col
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy(col("window_start"), col("event_type")).collect().toSeq
    assert(key(EventStreams.windowedCountsReplay(spark, sfDir)) ==
      key(EventStreams.windowedCountsFileStream(spark, sfDir)))
  }

  test("stateful sessionize counts 30-min-gap sessions per user") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    // user 1: two events 10 min apart (1 session), then one 40 min
    // later (2nd session). user 2: single event.
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 1.0),
      Event(3, ts(50), 1, "click", 1.0),
      Event(4, ts(0), 2, "view", 1.0))
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Update).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sess").as[UserSessions].collect()
        .map(u => u.user_id -> ((u.n_sessions, u.n_events))).toMap
      assert(rows(1L) == ((2L, 3L)))
      assert(rows(2L) == ((1L, 1L)))
    } finally q.stop()
  }

  test("foreachBatch sink: windowed counts land in parquet") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 2, "click", 2.0))
    val q = EventStreams.windowedCounts(input.toDF())
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("append").parquet(s"$dir/batch")
      }
      .start()
    try {
      q.processAllAvailable()
      val back = spark.read.parquet(s"$dir/batch")
      assert(back.count() >= 1)
      assert(back.columns.toSet ==
        Set("window_start", "event_type", "n_events", "sum_value"))
    } finally q.stop()
  }

  test("streaming exact-dedup keeps one row per content hash within the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStreams.Doc
    val input = MemoryStream[Doc]
    input.addData(
      Doc(1, ts(0), "alpha beta"),
      Doc(2, ts(1), "gamma delta"),
      Doc(3, ts(2), "alpha beta"),   // dup of 1 inside the horizon
      Doc(4, ts(3), "epsilon"),
      Doc(5, ts(4), "gamma delta"))  // dup of 2
    val q = EventStreams.dedupExactStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val kept = spark.table("dedup_stream").as[Doc].collect().map(_.doc_id).toSet
      assert(kept == Set(1L, 2L, 4L), s"kept $kept")
      // Agrees with the batch semantics: same distinct-hash count.
      val batchDistinct = Seq("alpha beta", "gamma delta", "alpha beta",
        "epsilon", "gamma delta").distinct.size
      assert(kept.size == batchDistinct)
    } finally q.stop()
  }

  test("streaming sessionize agrees with the batch gaps-and-islands query") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val events = Tables.events(spark, sfDir).as[Event].collect().toSeq
    val input = MemoryStream[Event]
    input.addData(events)
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_batch")
      .outputMode(OutputMode.Update).start()
    val batch = graft.operators.Analytics.eventsSessionize(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_batch").as[UserSessions].collect()
        .groupBy(_.user_id).map { case (u, rows) =>
          // Update mode emits one row per (user, microbatch); the last
          // row carries the final state.
          u -> { val last = rows.last; (last.n_sessions, last.n_events) }
        }
      assert(streamed == batch)
    } finally q.stop()
  }
}
