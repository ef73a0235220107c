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
  /** `events.ts` is parquet TIMESTAMP(NANOS) in the driver fixtures,
    * which Spark 4 refuses to map to its microsecond TimestampType:
    * read the raw INT64 nanos and truncate to micros explicitly (`div`
    * keeps the arithmetic in exact longs; doubles would lose precision
    * above 2^53). Derived rungs (graft.ScaleUp) already carry a
    * microsecond TimestampType column — pass it through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
