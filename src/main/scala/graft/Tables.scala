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
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Harmless unless a column is TIMESTAMP(NANOS) — which Spark 4
    // otherwise refuses to read at all; with it, nanos surface as raw
    // longs that normTs converts. Set here so EVERY table survives a
    // fixture regeneration to nanos, not just events.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Normalize the named timestamp columns across every layout the
    * driver fixtures have shipped (round-6 post-mortem — the fixture
    * generator changed parquet timestamp annotation between rounds and
    * silently broke every epoch-arithmetic query on `events.ts`; the
    * reference's only timestamp handling is "accept what arrives",
    * reference src/transform.py:102-103):
    *
    *  - raw INT64 (a TIMESTAMP(NANOS) column under `nanosAsLong`):
    *    truncate to micros in exact long arithmetic (doubles lose
    *    precision above 2^53);
    *  - TIMESTAMP_NTZ (micros, isAdjustedToUTC=false — the CURRENT
    *    layout): the wall-clock IS the UTC instant; reinterpret via a
    *    wall-clock `timestampdiff` against the NTZ epoch, which is
    *    deterministic regardless of session/host timezone (a plain
    *    cast would route through the session zone);
    *  - TimestampType (tz'd micros): already an instant; pass through.
    *
    * Every downstream `cast(col as long)` / `unix_micros` / date-part
    * then behaves identically on all three, matching the DuckDB
    * oracle's layout-stable reads.
    */
  private def normTs(df: DataFrame, cols: String*): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType =>
          d.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          d.withColumn(c, expr(
            s"timestamp_micros(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', $c))"))
        case _ => d
      }
    }

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    normTs(load(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    normTs(load(s, d, "lineitem"), "l_shipdate")
  /** `events.ts` is the column the round-6 fixture regeneration broke;
    * see [[normTs]] for the three layouts handled.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normTs(load(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
