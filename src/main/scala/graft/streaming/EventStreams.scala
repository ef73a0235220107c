package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming analytics over the events stream (SURVEY.md
  * §2.11 E6; the streaming generalization of the reference's daily-file
  * incremental pattern S8/S9 — the file-source checkpoint subsumes the
  * hand-rolled loaded-files trackers).
  *
  * Each transform takes/returns DataFrames so the identical logic runs on
  * `spark.readStream` (production) and on a batch frame (tests validate
  * the streaming path against the batch oracle q45).
  */
object EventStreams {

  /** events schema for file-source streams (ts already micros here —
    * streaming readers should pre-convert nanos like graft.Tables.events).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over any parquet fixture (directory, glob, or a
    * single file via the glob trick). The declared schema is mandatory
    * for file streams; pass `spark.read.parquet(path).schema` to reuse
    * the on-disk one.
    */
  def readParquetStream(spark: SparkSession, path: String, schema: StructType,
                        maxFilesPerTrigger: Int = 1): DataFrame = {
    val f = new java.io.File(path)
    val streamPath =
      if (f.isFile) s"${f.getParent}/[${f.getName.head}]${f.getName.tail}"
      else path
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(streamPath)
  }

  /** File-source stream over a directory (or glob) of parquet events.
    * The driver fixture's ts is TIMESTAMP(NANOS): read as long nanos
    * and truncate to micros, mirroring graft.Tables.events. Derived
    * rungs (graft.ScaleUp) carry a plain timestamp column — detected
    * from the on-disk footer and streamed as-is.
    *
    * `maxFilesPerTrigger` 0 (the default) ingests the available
    * backlog as ONE micro-batch. That is the correct replay mode for
    * an event DIRECTORY whose files are not event-time-ordered (each
    * part file spans the whole time range): per-file batches would
    * both stack update-mode emissions in the sink and watermark-drop
    * every later file's older rows, so stream==batch-oracle parity
    * holds only for time-ordered arrival — which is what multi-batch
    * specs stage explicitly. Pass a positive value to rate-limit when
    * arrival order is controlled.
    */
  def readEventStream(spark: SparkSession, path: String,
                      maxFilesPerTrigger: Int = 0): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Mirror graft.Tables.events: the fixture's ts has shipped as
    // nanos-long, TIMESTAMP_NTZ micros, and tz'd micros across
    // generations — detect the on-disk type from the footer and declare
    // the stream schema to match, then normalize below.
    val tsType = spark.read.parquet(path).schema("ts").dataType
    val rawSchema = StructType(eventSchema.fields.map {
      case f if f.name == "ts" => f.copy(dataType = tsType)
      case f => f
    })
    // The file stream source accepts a directory or a glob, not a plain
    // file path: turn a file path into an equivalent glob.
    val f = new java.io.File(path)
    val streamPath =
      if (f.isFile) s"${f.getParent}/[${f.getName.head}]${f.getName.tail}"
      else path
    val reader = spark.readStream.schema(rawSchema)
    if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val stream = reader.parquet(streamPath)
    tsType match {
      case LongType =>
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // NTZ wall-clock IS the UTC instant; wall-clock diff against the
        // NTZ epoch is session-timezone-independent (see Tables.events).
        stream.withColumn("ts", expr(
          "timestamp_micros(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts))"))
      case _ => stream
    }
  }

  /** E6: tumbling 1-hour windows per event type with a watermark; late
    * rows beyond 2 hours are dropped by the engine.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(col("w.start").as("h"), col("event_type"), col("n"), col("sum_v"))

  /** E6: stream-static enrichment — join the event stream against a
    * static dimension (broadcast: the stream side never shuffles and no
    * join state accumulates, unlike stream-stream joins), then a
    * watermarked hourly window per dimension attribute. The planner
    * re-reads the static side per micro-batch, so dimension updates
    * between batches are picked up — the streaming twin of a star join.
    */
  def segmentCounts(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(broadcast(dim), Seq("user_id"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(col("w.start").as("h"), col("c_mktsegment"), col("n"), col("sum_v"))

  /** E6 × T2: per-hour distinct-user estimation with the KMV sketch AS
    * the streaming window aggregate — per-window state is ≤ k longs in
    * the state store, where a streaming countDistinct would hold every
    * user id per open window. k is deliberately small so saturated
    * windows produce real estimates (unsaturated windows are exact by
    * construction). The k minima are a deterministic function of each
    * window's user SET, so the streaming result carries a FULL batch
    * oracle despite being an approximate aggregate.
    */
  def hourlyDistinctUsers(events: DataFrame, k: Int = 8): DataFrame = {
    val P = graft.functions.TextHash.Mod
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.KMVSketch.kmvMins(
        (lit(982451653L) * col("user_id") + lit(12345L)) % P, k).as("mins"))
      .select(col("w.start").as("h"),
        size(col("mins")).cast("long").as("n_min"),
        element_at(col("mins"), size(col("mins"))).as("kth_hash"),
        when(size(col("mins")) < k, size(col("mins")).cast("double"))
          .otherwise(round(lit((k - 1).toDouble * P) /
            element_at(col("mins"), k), 4)).as("est_users"))
  }

  /** Sliding 1-hour windows every 15 minutes (overlapping aggregation). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, event_type: String,
                            value: Double, props: String)
  final case class SessionState(count: Long, lastSec: Long, sessions: Long)
  final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  /** Custom stateful operator: per-user session counting with a 30-minute
    * inactivity gap via mapGroupsWithState (the batch twin is q47).
    */
  def sessionCounts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.as[EventRow]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
          // within a micro-batch, order by time; state carries the last
          // seen second across batches
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var (cnt, last, sess) = (prev.count, prev.lastSec, prev.sessions)
          sorted.foreach { e =>
            val sec = e.ts.getTime / 1000
            if (last == Long.MinValue || sec - last > 1800) sess += 1
            last = sec
            cnt += 1
          }
          state.update(SessionState(cnt, last, sess))
          UserSessions(uid, cnt, sess)
      }
      .toDF()
  }

  /** Watermarked stream-stream inner join: each purchase joined to the
    * same user's view events in the preceding hour. Both sides carry
    * watermarks and the join condition bounds event time on both ends,
    * so state for expired intervals is evicted — the streaming twin of
    * the batch as-of/attribution queries (q44/q61).
    */
  def viewToPurchaseJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
              col("event_id").as("view_id"))
      .withWatermark("v_ts", "2 hours")
    val p = purchases
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
              col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "2 hours")
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
              col("p_ts"), col("v_ts"), col("value"))
  }

  /** Streaming exact dedup on event_id with bounded state: duplicates
    * arriving within the watermark horizon are dropped; state for ids
    * older than the watermark is evicted (the streaming twin of E1).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a streaming frame to completion against in-memory sink (test /
    * local replay harness). Returns the materialized result table.
    */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val q = streamed.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
