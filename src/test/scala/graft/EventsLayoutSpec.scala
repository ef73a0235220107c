package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events fixture's `ts` has shipped in three parquet layouts across
  * driver fixture generations (round-6 post-mortem: a regeneration from
  * TIMESTAMP(NANOS) to TIMESTAMP_NTZ micros silently broke every
  * epoch-arithmetic query). This spec freezes the contract: whatever the
  * on-disk layout, `Tables.events` and `EventStreams.readEventStream`
  * yield the same UTC-instant microsecond TimestampType column.
  */
class EventsLayoutSpec extends SparkSpec {
  import spark.implicits._

  // Three fixed instants (epoch micros), one of them with sub-second part.
  private val micros = Seq(1700000000000000L, 1700000123456789L, 1712345678000001L)

  /** Writes the same three logical events in the given layout and returns
    * the directory containing events.parquet.
    */
  private def writeLayout(layout: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"evlayout_$layout").toString
    val rows = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    layout match {
      case "nanos_long" =>
        // the historical TIMESTAMP(NANOS) fixture surfaces as a raw long
        // under nanosAsLong — model it as an actual long nanos column
        rows.map { case (id, us) => (id, us * 1000L) }
          .toDF("event_id", "ts")
          .coalesce(1).write.parquet(s"$dir/events.parquet")
      case "ntz_micros" =>
        // the CURRENT fixture layout: TIMESTAMP(MICROS, isAdjustedToUTC=0)
        val schema = StructType(Seq(
          StructField("event_id", LongType),
          StructField("ts", TimestampNTZType)))
        val data = rows.map { case (id, us) =>
          Row(id, java.time.LocalDateTime.ofEpochSecond(
            us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
        }
        spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
          .coalesce(1).write.parquet(s"$dir/events.parquet")
      case "ltz_micros" =>
        // tz-adjusted micros (what ScaleUp writes): plain TimestampType
        val out0 = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        try rows.map { case (id, us) => (id, us) }
          .toDF("event_id", "us")
          .select(col("event_id"), expr("timestamp_micros(us)").as("ts"))
          .coalesce(1).write.parquet(s"$dir/events.parquet")
        finally out0.foreach(
          spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    }
    dir
  }

  private def readBack(dir: String): Seq[(Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("Tables.events normalizes all three on-disk ts layouts identically") {
    val want = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }.sorted
    for (layout <- Seq("nanos_long", "ntz_micros", "ltz_micros")) {
      val dir = writeLayout(layout)
      val got = readBack(dir)
      assert(got == want, s"layout=$layout")
      // and the column is a plain TimestampType, so downstream
      // cast("long") / unix_micros keep working on every layout
      assert(Tables.events(spark, dir).schema("ts").dataType == TimestampType,
        s"layout=$layout dtype")
    }
  }

  test("normalization is session-timezone-independent") {
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("America/New_York", "Asia/Tokyo")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        for (layout <- Seq("nanos_long", "ntz_micros", "ltz_micros")) {
          val dir = writeLayout(layout)
          assert(readBack(dir) ==
            micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }.sorted,
            s"layout=$layout tz=$tz")
        }
      }
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("readEventStream agrees with Tables.events on the fixture") {
    // full events schema required by the stream reader — use the real
    // fixture (whatever layout the current generation carries) and
    // compare the streamed rows against the batch reader's
    val batch = Tables.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val streamDf = streaming.EventStreams
      .readEventStream(spark, s"$sfDir/events.parquet")
    val out = java.nio.file.Files.createTempDirectory("evlayout_stream").toString
    val q = streamDf
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(s"$out/got"); ()
      }
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$out/got")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(batch))
  }
}
