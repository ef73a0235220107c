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
    normNtz(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Schema-driven half of the timestamp normalization: reinterpret EVERY
    * TIMESTAMP_NTZ column as a UTC instant, whatever its name. Run inside
    * [[load]] so a fixture regeneration that adds or renames a
    * wall-clock-annotated column is normalized without touching the
    * per-name list below (round-7 advice — the name allow-list alone
    * would silently pass a new NTZ column through un-normalized). The
    * nanos-long layout stays name-listed in [[normTs]]: under
    * `nanosAsLong` a TIMESTAMP(NANOS) column is indistinguishable from a
    * genuine LongType in the Spark schema, so only known-timestamp names
    * can be converted — and normTs now asserts they END as TimestampType,
    * turning any fourth fixture layout into a loud failure instead of a
    * silent type change.
    */
  private def normNtz(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          d.withColumn(f.name, expr(
            s"timestamp_micros(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ${f.name}))"))
        case _ => d
      }
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
      val out = d.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType =>
          d.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
        // TIMESTAMP_NTZ is already handled schema-wide by normNtz in load
        case _ => d
      }
      // Loud-failure guard: a named timestamp column must normalize to
      // TimestampType. A fixture regeneration to any layout outside the
      // three known ones fails HERE, not as a silent downstream type.
      require(out.schema(c).dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"fixture column $c arrived as ${df.schema(c).dataType}; expected " +
          "nanos-long / TIMESTAMP_NTZ / TIMESTAMP — a new fixture layout " +
          "needs a normTs case")
      out
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

  /** Round-robin spread for a CPU-heavy per-row chain over an
    * under-parallelized scan (r16 optimization; guide §2.5 "input
    * skew" / one-big-unsplittable-file). The fixtures stage each table
    * as ONE small parquet file, so a chain whose cost is per-row CPU
    * (regex cleaning, skill extraction, image/audio/video codecs, PII
    * scrubbing) would otherwise run on a single core with the rest of
    * the box idle — measured on q55 as a 3.3 s single-task stage, wall
    * ≈ executor CPU. Cost switch: spread only while the table's scan
    * split count (file bytes over spark.sql.files.maxPartitionBytes)
    * undershoots the session shuffle width — both conf-derived,
    * nothing hard-codes the local core count, and at warehouse scale
    * (splits ≥ width) this is the identity, so no extra corpus-sized
    * exchange ever appears in a production plan. Results are
    * partition-invariant: every consumer is per-row work followed by
    * keyed aggregation/joins (and the round-robin repartition itself
    * is deterministic under retry via sortBeforeRepartition).
    */
  def spreadIfNarrow(s: SparkSession, d: String, table: String,
                     df: DataFrame): DataFrame = {
    val width = s.conf.get("spark.sql.shuffle.partitions").toIntOption
      .getOrElse(1)
    val mpb = math.max(1L, s.sessionState.conf.filesMaxPartitionBytes)
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(s"$d/$table.parquet")
        p.getFileSystem(s.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      } catch { case scala.util.control.NonFatal(_) => return df }
    val splits = ((bytes + mpb - 1) / mpb).toInt
    // cap the spread: every extra task pays a fixed deserialize-CPU
    // cost for these codegen-heavy plans (measured: spreading a 1 s
    // single-core codec row to 32 tasks cut wall but inflated
    // executor CPU ~8x on pure per-task overhead); 8-way captures
    // most of the single-core win at a quarter of that tax
    if (splits < width) df.repartition(math.min(width, 8)) else df
  }
}
