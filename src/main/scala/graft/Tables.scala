package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Parquet table loaders for the driver fixtures (see /root/repo/TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst applies column
  * pruning and predicate pushdown into the scan (check `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`). At cluster scale the same
  * call works over `s3a://` globs; the FileIndex handles listing.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped in THREE parquet layouts across fixture
    * generations, and the reference's only timestamp handling is
    * "accept what arrives" (reference src/transform.py:102-103 parses
    * with coercion) — so normalize every layout to one UTC-instant
    * `TimestampType` column here, in the single reader every events
    * query goes through:
    *
    *  - TIMESTAMP(NANOS): Spark 4 refuses to map nanos to its
    *    microsecond TimestampType; read the raw INT64 nanos
    *    (`nanosAsLong`) and truncate to micros in exact long
    *    arithmetic (doubles would lose precision above 2^53).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark TIMESTAMP_NTZ
    *    (the CURRENT fixture layout): the wall-clock value IS the UTC
    *    instant. Reinterpret via `timestampdiff(MICROSECOND, ntz-epoch,
    *    ts)` — a pure wall-clock difference between two NTZ values, so
    *    the conversion is deterministic regardless of the session or
    *    host timezone (a plain cast would route through the session
    *    zone).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=true) → Spark TimestampType:
    *    already an instant; pass through.
    *
    * Downstream `cast(ts as long)` / `unix_micros(ts)` then work
    * identically on all three, matching the DuckDB oracle's
    * layout-stable `date_part('epoch', ts)` / `epoch_ns(ts)`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", expr(
          "timestamp_micros(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts))"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
