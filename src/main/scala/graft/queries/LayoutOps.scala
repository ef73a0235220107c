package graft.queries

import graft.Tables
import graft.ops.ZOrder
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout operators (SURVEY §2 extension surface): Z-order
  * clustering keys and the pruning guarantee they buy. The write-side
  * operator itself is [[graft.ops.ZOrder.layoutByZ]] (layouts aren't a
  * query result); what registers here is its portable computational
  * core — the Morton key (q127) and the corner-bound pruning interval
  * with its superset proof and measured selectivity (q128) — both
  * fully DuckDB-replayable because the interleave is plain integer bit
  * math. PhysicalLayoutSpec holds the physical half: a z-clustered
  * parquet layout row-group-prunes a 2-D box scan that a one-column
  * sort cannot.
  */
object LayoutOps {

  private def epochDay(c: Column): Column = datediff(c, lit("1970-01-01"))

  /** DuckDB twin of [[ZOrder.spread]]/[[ZOrder.zValue]] as SQL text:
    * bit i of `x` to bit 2i, y's half shifted one left, summed (the
    * set bit positions are disjoint, so + == OR).
    */
  private def spreadSql(x: String): String =
    s"list_sum(list_transform(range(0, 24), i -> (($x >> i) & 1) << (2 * i)))"
  private def zSql(x: String, y: String): String =
    s"(${spreadSql(x)} + 2 * ${spreadSql(y)})"

  val defs: Seq[Q] = Seq(
    // ---- Z-order key: the portable Morton interleave ---------------------
    // One row per sampled order (a deterministic modulus, not RNG):
    // both engines compute the 48-bit interleave of (custkey,
    // epoch-day) bit for bit. This is the key layoutByZ range-
    // partitions on; its monotonicity per coordinate is what q128's
    // corner bound and the spec's row-group pruning rely on.
    Q(
      "q127_zorder_key",
      (s, d) =>
        Tables.orders(s, d)
          .where(col("o_orderkey") % 199 === 0)
          .select(col("o_orderkey"),
            col("o_custkey").as("ck"),
            epochDay(col("o_orderdate")).cast("long").as("dy"))
          .withColumn("z", ZOrder.zValue(col("ck"), col("dy")))
          .orderBy(col("o_orderkey")),
      Some(s"""SELECT o_orderkey, ck, dy, CAST(${zSql("ck", "dy")} AS BIGINT) AS z
             |FROM (
             |  SELECT o_orderkey, o_custkey AS ck,
             |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS dy
             |  FROM orders WHERE o_orderkey % 199 = 0)
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- Z-range pruning: corner bound, superset proof, selectivity ------
    // For the 2-D box (custkey in [100,299] x orderdate in 1998) a
    // z-clustered scan reads only the Morton interval
    // [z(100, day_lo), z(299, day_hi)] before the exact residual
    // filter. The row proves the interval is a true superset
    // (n_escaped = 0 — no box row outside it; this is the
    // monotonicity-in-each-coordinate corner bound, NOT an approximate
    // heuristic) and measures its cost: n_zrange / n_total is the
    // fraction of a z-laid-out table the scan touches, vs 1.0 for a
    // full scan — the same ratio at any scale because both counts grow
    // linearly. A tighter read set would decompose the interval
    // BIGMIN/LITMAX-style; the single-interval bound is already
    // file-grain-right because layoutByZ files own contiguous
    // z-intervals.
    Q(
      "q128_zrange_prune",
      (s, d) => {
        val base = Tables.orders(s, d)
          .select(col("o_custkey").as("ck"),
            epochDay(col("o_orderdate")).cast("long").as("dy"))
          .withColumn("z", ZOrder.zValue(col("ck"), col("dy")))
        val dLo = epochDay(to_date(lit("1998-01-01"))).cast("long")
        val dHi = epochDay(to_date(lit("1998-12-31"))).cast("long")
        val zLo = ZOrder.zValue(lit(100L), dLo)
        val zHi = ZOrder.zValue(lit(299L), dHi)
        val inBox = col("ck").between(100L, 299L) && col("dy").between(dLo, dHi)
        val inZ = col("z").between(zLo, zHi)
        base.agg(
          count(lit(1)).as("n_total"),
          sum(when(inBox, 1L).otherwise(0L)).as("n_box"),
          sum(when(inZ, 1L).otherwise(0L)).as("n_zrange"),
          sum(when(inBox && !inZ, 1L).otherwise(0L)).as("n_escaped"))
      },
      Some(s"""WITH z AS (
             |  SELECT ck, dy, CAST(${zSql("ck", "dy")} AS BIGINT) AS z
             |  FROM (
             |    SELECT o_custkey AS ck,
             |           CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS dy
             |    FROM orders)),
             |b AS (
             |  SELECT CAST(${zSql("100", "(DATE '1998-01-01' - DATE '1970-01-01')")} AS BIGINT) AS z_lo,
             |         CAST(${zSql("299", "(DATE '1998-12-31' - DATE '1970-01-01')")} AS BIGINT) AS z_hi,
             |         CAST(DATE '1998-01-01' - DATE '1970-01-01' AS BIGINT) AS d_lo,
             |         CAST(DATE '1998-12-31' - DATE '1970-01-01' AS BIGINT) AS d_hi)
             |SELECT count(*) AS n_total,
             |       CAST(sum(CASE WHEN ck BETWEEN 100 AND 299 AND dy BETWEEN d_lo AND d_hi
             |                THEN 1 ELSE 0 END) AS BIGINT) AS n_box,
             |       CAST(sum(CASE WHEN z BETWEEN z_lo AND z_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_zrange,
             |       CAST(sum(CASE WHEN ck BETWEEN 100 AND 299 AND dy BETWEEN d_lo AND d_hi
             |                AND NOT (z BETWEEN z_lo AND z_hi)
             |                THEN 1 ELSE 0 END) AS BIGINT) AS n_escaped
             |FROM z CROSS JOIN b""".stripMargin)),

    // ---- bucketed co-located fact-fact join ------------------------------
    // The other half of the layout surface: q127/q128 buy range-scan
    // pruning, bucketing buys shuffle-free recurring joins. Both facts
    // are written bucketed by the orderkey (Load.toBucketedTable — the
    // ingest-side operator PhysicalLayoutSpec proves exchange-free on
    // the executed plan), so the lineitem⋈orders merge join reads
    // bucket-aligned files with zero Exchange under the join; at 100 TB
    // that's the fact shuffle paid ONCE at ingest and amortized over
    // every keyed join/agg after it. The registered result is a
    // priority-level revenue summary off that join; only the final
    // 5-row aggregate shuffles. The write cost stays inside the query —
    // the honest ingest price of the layout. The oracle replays the
    // semantics on the raw parquet: layout must never change answers,
    // which is exactly what the gate proves.
    Q(
      "q136_bucketed_join",
      (s, d) => {
        import graft.pipeline.Load
        // per-rung table names so sf0.01/sf1 runs in one session don't
        // collide; sessions share one JVM-wide warehouse dir (gitignored)
        val tag = (d.hashCode.toLong & 0xffffffffL).toString
        Load.toBucketedTable(
          graft.Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_extendedprice")), s"li_b_$tag",
          "l_orderkey", 8)
        Load.toBucketedTable(
          graft.Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderpriority")), s"ord_b_$tag",
          "o_orderkey", 8)
        s.table(s"li_b_$tag")
          .join(s.table(s"ord_b_$tag"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
               (sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
                  .cast("decimal(38,0)")).cast("double") / 100.0).as("gross_rev"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |       count(*) AS n_items,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             |         / 100.0 AS gross_rev
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin))
  )
}
