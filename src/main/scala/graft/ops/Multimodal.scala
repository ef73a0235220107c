package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY.md §2.11 E5): media payloads ride
  * as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs per-partition so heavyweight codec state is
  * initialized once per task, never per row.
  *
  * The decode step is a DETERMINISTIC STUB (this container has no
  * image/audio codecs): it derives a fixed-length feature vector from the
  * bytes. The Spark-side plumbing — schema, binary transport, partition
  * batching, feature schema — is real and tested; swapping `decodeStub`
  * for a JNI/codec call is a one-function change.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType))))))

  /** STUB decoder: stands in for image decode + resize + embed. Features:
    * payload length, xxhash-like rolling checksum, mean byte value, and a
    * 4-bin byte histogram — deterministic in the bytes alone.
    */
  private[ops] def decodeStub(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) return Array.fill(7)(0.0)
    var checksum = 1125899906842597L
    var sum = 0L
    val hist = new Array[Long](4)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      checksum = checksum * 31 + b
      sum += b
      hist(b >> 6) += 1
      i += 1
    }
    Array(
      payload.length.toDouble,
      (checksum & 0x7fffffffL).toDouble,
      sum.toDouble / payload.length,
      hist(0).toDouble, hist(1).toDouble, hist(2).toDouble, hist(3).toDouble)
  }

  /** Wrap raw payload rows (id, bytes) into the media schema. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        octet_length(col("payload")).cast("long").as("n_bytes")))

  /** Deterministic stub resize: stride-sample the payload down to
    * `target` bytes (the byte-level analogue of nearest-neighbor image
    * downsampling). Stands in for a codec resize; deterministic in the
    * bytes alone, identity when already small enough.
    */
  private[ops] def resizeStub(payload: Array[Byte], target: Int): Array[Byte] = {
    if (payload == null) return Array.emptyByteArray
    if (payload.length <= target) return payload
    val out = new Array[Byte](target)
    var i = 0
    while (i < target) {
      out(i) = payload((i.toLong * payload.length / target).toInt)
      i += 1
    }
    out
  }

  /** Resize every payload to at most `targetBytes` (per-partition codec
    * init point, same contract as [[extractFeatures]]); metadata is
    * recomputed so downstream stages see the true stored size.
    */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    val enc = ExpressionEncoder(mediaSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val resized = resizeStub(r.getAs[Array[Byte]](payloadIdx), targetBytes)
        val mime = r.getStruct(metaIdx).getString(0)
        Row(r.getLong(idIdx), resized, Row(mime, resized.length.toLong))
      }
    }(enc)
  }

  /** Frame sampling (the video analogue: one payload → every n-th
    * fixed-size frame as its own row). flatMap inside mapPartitions so a
    * real demuxer would be initialized once per task; frame indices are
    * the ORIGINAL positions, so downstream can reconstruct timing.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", LongType),
      StructField("frame", BinaryType)))
    val enc = ExpressionEncoder(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val id = r.getLong(idIdx)
        if (payload == null) Iterator.empty
        else payload.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % everyNth == 0 =>
            Row(id, idx.toLong, frame)
        }
      }
    }(enc)
  }

  /** Feature-extract every payload via mapPartitions (codec state would be
    * initialized once per partition here).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(DoubleType))))
    val enc = ExpressionEncoder(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // per-partition init point (decoder/codec handles would live here)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val feats = decodeStub(payload)
        Row(r.getLong(idIdx),
            if (payload == null) 0L else payload.length.toLong,
            feats.toSeq)
      }
    }(enc)
  }
}
