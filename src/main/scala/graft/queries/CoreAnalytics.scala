package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The BI query inventory (SURVEY.md §2.10 Q1–Q27) re-expressed over the
  * driver's TPC-H-ish fixtures: global/distinct aggregates, group-by +
  * top-k, share-of-total windows, date-part group-bys, argmax-per-group,
  * semi/anti joins, dedup, union, pivot, running windows.
  *
  * Scale notes (100 TB design point):
  *  - dimension joins (`nation`, `region`) are explicit `broadcast`s; the
  *    customer join is left to AQE, which broadcasts when the build side
  *    is under the threshold and shuffle-joins otherwise;
  *  - aggregates are declared via `groupBy().agg()` so Catalyst plans
  *    partial (map-side) aggregation before the shuffle;
  *  - top-k is `orderBy().limit(k)` which plans as TakeOrderedAndProject
  *    (per-partition heap + driver merge — no global sort);
  *  - the only unpartitioned window (q22) runs over a pre-aggregated
  *    frame of one row per day, which is tiny at any scale.
  */
object CoreAnalytics {

  /** Discounted revenue in exact integer units of 1e-4 (cents x
    * (100 - discount-hundredths)): summing integers is associative, so
    * the aggregate is bit-identical under ANY summation order and ANY
    * scale — where round(sum(double), 4) drifts in the 4th decimal
    * once ~1e5 doubles sum past 1e10 (measured at the sf1 rung).
    * Summed as decimal(38,0): headroom to ~1e25 rows of max revenue.
    */
  private def revenueUnits: Column =
    (round(col("l_extendedprice") * 100).cast("bigint") *
      (lit(100L) - round(col("l_discount") * 100).cast("bigint")))
      .cast("decimal(38,0)")

  /** Exact-units decimal sum -> the double the driver gate hashes.
    * The cast to double is the ONLY inexact step (one half-even
    * rounding of an exact integer, identical in every IEEE engine). */
  private def unitsToRev(sumUnits: Column): Column =
    (sumUnits.cast("double") / 10000.0)

  /** Order- and scale-invariant money sum: 2-dp prices ride as exact
    * integer cents (decimal(38,0) accumulator), one deterministic
    * double conversion at the end. Oracle twin:
    * CAST(sum(CAST(round(x*100) AS BIGINT)) AS DOUBLE)/100.0. */
  private def moneySum(c: Column): Column =
    (sum(round(c * 100).cast("bigint").cast("decimal(38,0)"))
      .cast("double") / 100.0)

  val defs: Seq[Q] = Seq(
    // ---- Q1/Q2/Q5/Q14 analogues: global KPI card aggregates -------------
    Q(
      "q01_orders_kpis",
      (s, d) =>
        Tables.orders(s, d).agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"),
          round(avg(col("o_totalprice")), 2).as("avg_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price")),
      Some("""SELECT count(*) AS n_orders,
             |       count(DISTINCT o_custkey) AS n_customers,
             |       round(avg(o_totalprice), 2) AS avg_price,
             |       min(o_totalprice) AS min_price,
             |       max(o_totalprice) AS max_price
             |FROM orders""".stripMargin)),

    // ---- TPC-H Q1-style pricing summary (group agg + partial agg) -------
    Q(
      "q02_pricing_summary",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            // exact-cents / exact-units sums: associative integers, so
            // the values are scale- and order-invariant (see revenueUnits)
            (sum(round(col("l_extendedprice") * 100).cast("bigint")
              .cast("decimal(38,0)")).cast("double") / 100.0)
              .as("sum_base_price"),
            unitsToRev(sum(revenueUnits)).as("sum_disc_price"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       sum(l_quantity) AS sum_qty,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             |         / 100.0 AS sum_base_price,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
             |         / 10000.0 AS sum_disc_price,
             |       count(*) AS n_rows
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- Q3/Q4/Q19: distinct-count cards --------------------------------
    Q(
      "q03_customer_distincts",
      (s, d) =>
        Tables.customer(s, d).agg(
          count(lit(1)).as("n_customers"),
          countDistinct(col("c_mktsegment")).as("n_segments"),
          countDistinct(col("c_nationkey")).as("n_nations")),
      Some("""SELECT count(*) AS n_customers,
             |       count(DISTINCT c_mktsegment) AS n_segments,
             |       count(DISTINCT c_nationkey) AS n_nations
             |FROM customer""".stripMargin)),

    // ---- Q7: top-10 "companies hiring" = top customers by order count ---
    Q(
      "q04_top_customers",
      (s, d) => {
        val agg = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
               moneySum(col("o_totalprice")).as("total_spend"))
        // post-agg side is one row per customer; dimension lookup joins on
        // the grouped key. AQE broadcasts customer at small SF.
        agg.join(Tables.customer(s, d), agg("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("n_orders"), col("total_spend"))
          .orderBy(col("n_orders").desc, col("c_name"))
          .limit(10)
      },
      Some("""SELECT c_name, count(*) AS n_orders,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_spend
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_name
             |ORDER BY n_orders DESC, c_name
             |LIMIT 10""".stripMargin)),

    // ---- Q9/Q26: share-of-total window over a group-by ------------------
    Q(
      "q05_priority_share",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .withColumn("pct",
            round(col("n") * lit(100.0) / sum(col("n")).over(Window.partitionBy()), 4))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS n,
             |       round(count(*) * 100.0 / sum(count(*)) OVER (), 4) AS pct
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ---- Q6/Q24: jobs-by-month time series ------------------------------
    Q(
      "q06_monthly_orders",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .cast("long").as("ym"))
          .agg(count(lit(1)).as("n"),
               moneySum(col("o_totalprice")).as("rev"))
          .orderBy(col("ym")),
      Some("""SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
             |       count(*) AS n, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS rev
             |FROM orders
             |GROUP BY ym
             |ORDER BY ym""".stripMargin)),

    // ---- Q25: two-key group (day x status) ------------------------------
    Q(
      "q07_daily_by_status",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("d"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("d"), col("o_orderstatus")),
      Some("""SELECT CAST(o_orderdate AS DATE) AS d, o_orderstatus, count(*) AS n
             |FROM orders
             |GROUP BY d, o_orderstatus
             |ORDER BY d, o_orderstatus""".stripMargin)),

    // ---- flagship: full star join, revenue per region/nation ------------
    Q(
      "q08_revenue_by_nation",
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = broadcast(Tables.nation(s, d))
        val r = broadcast(Tables.region(s, d))
        // Pre-aggregate lineitem to one row per order BEFORE the wide
        // join: shrinks the fact-fact join input ~4x and turns the
        // distinct-order count into a plain count (no Expand node).
        val perOrder = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(revenueUnits).as("order_units"))
        perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_orders"),
               unitsToRev(sum(col("order_units"))).as("rev"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
             |       count(DISTINCT o_orderkey) AS n_orders,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
             |         / 10000.0 AS rev
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin)),

    // ---- Q20: global argmax ("top employer") ----------------------------
    Q(
      "q09_top_nation",
      (s, d) =>
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("n_customers").desc, col("n_name"))
          .limit(1),
      Some("""SELECT n_name, count(*) AS n_customers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name
             |ORDER BY n_customers DESC, n_name
             |LIMIT 1""".stripMargin)),

    // ---- Q12: explode comma/space list -> top-k tokens ------------------
    Q(
      "q10_part_tokens",
      (s, d) =>
        Tables.part(s, d)
          .select(explode(split(col("p_name"), " ")).as("tok"))
          .where(col("tok") =!= "")
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok"))
          .limit(10),
      Some("""SELECT tok, count(*) AS n
             |FROM (SELECT unnest(string_split(p_name, ' ')) AS tok FROM part)
             |WHERE tok <> ''
             |GROUP BY tok
             |ORDER BY n DESC, tok
             |LIMIT 10""".stripMargin)),

    // ---- Q23: filtered agg + ratio of aggregates ------------------------
    Q(
      "q11_year_stats",
      (s, d) =>
        Tables.orders(s, d)
          .where(year(col("o_orderdate")) === 1997)
          .agg(
            count(lit(1)).as("n"),
            countDistinct(to_date(col("o_orderdate"))).as("n_days"))
          .withColumn("per_day", round(col("n") * lit(1.0) / col("n_days"), 4)),
      Some("""SELECT count(*) AS n,
             |       count(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
             |       round(count(*) * 1.0 / count(DISTINCT CAST(o_orderdate AS DATE)), 4) AS per_day
             |FROM orders
             |WHERE year(o_orderdate) = 1997""".stripMargin)),

    // ---- Q17: argmax per group (max salary + first title by company) ----
    // As an AGGREGATION (max_by), not a window: aggregations get partial
    // map-side combine, so 5 low-cardinality groups never funnel the
    // whole table through 5 reducers the way a per-group window sort
    // would at scale. Determinism: prices are exact 2-dp, so an exact
    // combined BIGINT key (cents * 2^32 + orderkey) totally orders rows
    // identically in both engines (ties -> larger orderkey).
    Q(
      "q12_argmax_per_group",
      (s, d) =>
        Tables.orders(s, d)
          .withColumn("ord_key",
            expr("CAST(round(o_totalprice * 100) AS BIGINT) * 4294967296 + o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(max_by(col("o_orderkey"), col("ord_key")).as("o_orderkey"),
               max(col("o_totalprice")).as("o_totalprice"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
             |       arg_max(o_orderkey,
             |               CAST(round(o_totalprice * 100) AS BIGINT) * 4294967296 + o_orderkey)
             |         AS o_orderkey,
             |       max(o_totalprice) AS o_totalprice
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ---- D2: semi join (customers having orders) ------------------------
    Q(
      "q13_semi_join",
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d).select(col("o_custkey")),
                col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(*) AS n
             |FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders)
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // ---- U2/S8: anti join (incremental-discovery pattern) ---------------
    Q(
      "q14_anti_join",
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d).select(col("o_custkey")),
                col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").cast("long").as("nationkey"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("nationkey")),
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n
             |FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
             |GROUP BY nationkey
             |ORDER BY nationkey""".stripMargin)),

    // ---- E1/D1: exact keyed dedup, keep-first + dup audit ---------------
    Q(
      "q15_dedup_exact",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
          .agg(min(col("o_orderkey")).as("first_key"), count(lit(1)).as("dup_cnt"))
          .where(col("dup_cnt") > 1)
          .orderBy(col("o_custkey"), col("od")),
      Some("""SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
             |       min(o_orderkey) AS first_key, count(*) AS dup_cnt
             |FROM orders
             |GROUP BY o_custkey, od
             |HAVING count(*) > 1
             |ORDER BY o_custkey, od""".stripMargin)),

    // ---- F3: numeric range filter (salary-band analogue) ----------------
    Q(
      "q16_range_filter",
      (s, d) =>
        Tables.orders(s, d)
          .where(col("o_totalprice").between(50000, 200000))
          .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total")),
      Some("""SELECT count(*) AS n, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
             |FROM orders
             |WHERE o_totalprice BETWEEN 50000 AND 200000""".stripMargin)),

    // ---- F1: IN-list filter through a dimension join --------------------
    Q(
      "q17_in_filter",
      (s, d) =>
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .where(col("n_name").isin("NATION_1", "NATION_7", "NATION_19"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"), round(avg(col("c_acctbal")), 2).as("avg_bal"))
          .orderBy(col("n_name")),
      Some("""SELECT n_name, count(*) AS n, round(avg(c_acctbal), 2) AS avg_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE n_name IN ('NATION_1', 'NATION_7', 'NATION_19')
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)),

    // ---- F2: regex predicate ---------------------------------------------
    Q(
      "q18_rlike_filter",
      (s, d) =>
        Tables.part(s, d)
          .where(col("p_name").rlike("(red|blue)"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("p_brand")),
      Some("""SELECT p_brand, count(*) AS n
             |FROM part
             |WHERE regexp_matches(p_name, '(red|blue)')
             |GROUP BY p_brand
             |ORDER BY p_brand""".stripMargin)),

    // ---- U1: union-all of two filtered branches --------------------------
    Q(
      "q19_union_all",
      (s, d) => {
        val o = Tables.orders(s, d)
        val hi = o.where(col("o_totalprice") > 150000).select(col("o_orderstatus"))
        val ur = o.where(col("o_orderpriority") === "1-URGENT").select(col("o_orderstatus"))
        hi.unionByName(ur)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n
             |FROM (SELECT o_orderstatus FROM orders WHERE o_totalprice > 150000
             |      UNION ALL
             |      SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT')
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // ---- window: top-3 per group -----------------------------------------
    Q(
      "q20_topn_per_group",
      (s, d) => {
        val j = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        j.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("c_mktsegment"), col("o_totalprice").desc, col("o_orderkey"))
      },
      Some("""SELECT c_mktsegment, o_orderkey, o_totalprice
             |FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
             |             row_number() OVER (PARTITION BY c_mktsegment
             |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |      FROM orders JOIN customer ON o_custkey = c_custkey)
             |WHERE rn <= 3
             |ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey""".stripMargin)),

    // ---- pivot (Q25 stacked-area twin): counts per status as columns -----
    Q(
      "q21_pivot_status",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
          .pivot(col("o_orderstatus"), Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0, Seq("F", "O", "P"))
          .withColumnRenamed("F", "f_cnt")
          .withColumnRenamed("O", "o_cnt")
          .withColumnRenamed("P", "p_cnt")
          .orderBy(col("yr")),
      Some("""SELECT year(o_orderdate) AS yr,
             |       count(*) FILTER (o_orderstatus = 'F') AS f_cnt,
             |       count(*) FILTER (o_orderstatus = 'O') AS o_cnt,
             |       count(*) FILTER (o_orderstatus = 'P') AS p_cnt
             |FROM orders
             |GROUP BY yr
             |ORDER BY yr""".stripMargin)),

    // ---- running / moving window over the daily series -------------------
    // Pre-aggregation reduces to one row per day, so the global window is
    // cheap at any scale (at 100 TB you'd still pre-agg, then window).
    Q(
      "q22_running_totals",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.orderBy(col("day"))
        daily
          .withColumn("cum_n",
            sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("ma7",
            round(avg(col("n") * lit(1.0)).over(w.rowsBetween(-6, Window.currentRow)), 4))
          .orderBy(col("day"))
      },
      Some("""SELECT day, n,
             |       CAST(sum(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
             |       round(avg(n * 1.0) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
             |FROM (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
             |      FROM orders GROUP BY day)
             |ORDER BY day""".stripMargin)),

    // ---- D1 exact keep-first semantics (first order per customer) --------
    Q(
      "q23_first_per_customer",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"),
                  to_date(col("o_orderdate")).as("od"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od
             |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
             |             row_number() OVER (PARTITION BY o_custkey
             |                                ORDER BY o_orderdate, o_orderkey) AS rn
             |      FROM orders)
             |WHERE rn = 1
             |ORDER BY o_custkey""".stripMargin)),

    // ---- Q13: keyword contains filter (BI slicer LIKE '%kw%') ------------
    Q(
      "q24_keyword_filter",
      (s, d) =>
        Tables.part(s, d)
          .where(col("p_name").contains("red") || col("p_name").contains("blue"))
          .groupBy(col("p_type"))
          .agg(count(lit(1)).as("n"),
               round(avg(col("p_retailprice")), 2).as("avg_price"))
          .orderBy(col("p_type")),
      Some("""SELECT p_type, count(*) AS n,
             |       round(avg(p_retailprice), 2) AS avg_price
             |FROM part
             |WHERE p_name LIKE '%red%' OR p_name LIKE '%blue%'
             |GROUP BY p_type
             |ORDER BY p_type""".stripMargin)),

    // ---- rollup: subtotal hierarchy (year -> status -> grand total) ------
    Q(
      "q25_rollup",
      (s, d) =>
        Tables.orders(s, d)
          .rollup(year(col("o_orderdate")).cast("long").as("yr"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("rev"))
          .orderBy(col("yr").asc_nulls_first, col("o_orderstatus").asc_nulls_first),
      Some("""SELECT year(o_orderdate) AS yr, o_orderstatus,
             |       count(*) AS n, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS rev
             |FROM orders
             |GROUP BY ROLLUP (yr, o_orderstatus)
             |ORDER BY yr NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),

    // ---- exact percentiles (interpolated) per group ----------------------
    Q(
      "q26_percentiles",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderstatus"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
          .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
             |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             |       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
             |FROM orders
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // ---- second-moment statistics ----------------------------------------
    Q(
      "q27_moment_stats",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |       round(stddev_samp(l_extendedprice), 2) AS sd_price,
             |       round(var_samp(l_quantity), 4) AS var_qty,
             |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qp
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // q28 (Spark's engine-internal approx_count_distinct) was RETIRED in
    // round 5: its register layout is invisible to any external oracle,
    // so it sat as a no_oracle row — superseded by the fully
    // oracle-checked portable HLL q124 (SketchOps), with the built-in
    // kept as a SketchSpec cross-check, the same pattern as q35/q36.

    // ---- cube with grouping ids (full BI subtotal lattice) ---------------
    Q(
      "q58_cube_grouping",
      (s, d) =>
        Tables.orders(s, d)
          .withColumn("yr", year(col("o_orderdate")).cast("long"))
          .cube(col("yr"), col("o_orderstatus"))
          .agg(grouping(col("yr")).cast("long").as("g_yr"),
               grouping(col("o_orderstatus")).cast("long").as("g_st"),
               count(lit(1)).as("n"))
          .orderBy(col("yr").asc_nulls_first,
                   col("o_orderstatus").asc_nulls_first),
      Some("""SELECT year(o_orderdate) AS yr, o_orderstatus,
             |       CAST(GROUPING(year(o_orderdate)) AS BIGINT) AS g_yr,
             |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
             |       count(*) AS n
             |FROM orders
             |GROUP BY CUBE (yr, o_orderstatus)
             |ORDER BY yr NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),

    // ---- full outer join with null-side aggregation ----------------------
    Q(
      "q59_outer_join",
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        Tables.customer(s, d)
          .join(perCust, col("c_custkey") === col("o_custkey"), "full_outer")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_rows"),
               count(when(col("n_orders").isNull, lit(1))).as("n_no_orders"),
               coalesce(sum(col("n_orders")), lit(0L)).as("total_orders"))
          .orderBy(col("c_mktsegment").asc_nulls_first)
      },
      Some("""SELECT c_mktsegment, count(*) AS n_rows,
             |       count(*) FILTER (n_orders IS NULL) AS n_no_orders,
             |       CAST(coalesce(sum(n_orders), 0) AS BIGINT) AS total_orders
             |FROM customer
             |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
             |                 FROM orders GROUP BY o_custkey) o
             |  ON c_custkey = o_custkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment NULLS FIRST""".stripMargin)),

    // ---- top-3 per group via the custom bounded-heap aggregate -----------
    // Same result set as q20, but as a TypedImperativeAggregate: each map
    // task ships at most k rows per group (partial aggregate), instead of
    // the window plan's full per-group shuffle + sort. Ordering is the
    // exact combined key of q12 with orderkey inverted so ties rank
    // ascending, matching the row_number oracle.
    Q(
      "q65_topk_heap",
      (s, d) => {
        import graft.functions.TopKBy.topKBy
        val j = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .withColumn("ord_key",
            expr("CAST(round(o_totalprice * 100) AS BIGINT) * 4294967296 + (4294967295 - o_orderkey)"))
        // The combined key is self-describing: both the orderkey and the
        // exact 2-dp price decode from it, so no join-back is needed.
        j.groupBy(col("c_mktsegment"))
          .agg(topKBy(col("ord_key"), col("ord_key"), 3).as("keys"))
          .select(col("c_mktsegment"), explode(col("keys")).as("key"))
          .select(
            col("c_mktsegment"),
            (lit(4294967295L) - pmod(col("key"), lit(4294967296L))).as("o_orderkey"),
            (expr("key div 4294967296") / 100.0).as("o_totalprice"))
          .orderBy(col("c_mktsegment"), col("o_totalprice").desc, col("o_orderkey"))
      },
      Some("""SELECT c_mktsegment, o_orderkey, o_totalprice
             |FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
             |             row_number() OVER (PARTITION BY c_mktsegment
             |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |      FROM orders JOIN customer ON o_custkey = c_custkey)
             |WHERE rn <= 3
             |ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey""".stripMargin)),

    // ---- offset pagination (BI table pages; shallow pages only) ----------
    Q(
      "q64_pagination",
      (s, d) =>
        Tables.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .offset(10)
          .limit(10),
      Some("""SELECT o_orderkey, o_totalprice
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 10 OFFSET 10""".stripMargin)),

    // ---- keyset pagination: the deep-page shape ---------------------------
    // offset-N pagination materializes and discards N rows per page (a
    // driver-side CollectLimit — fine at page 2, pathological at page
    // 10,000). The keyset form seeks from the last row of the previous
    // page via a sargable predicate on the (totalprice, orderkey)
    // cursor, so every page is filter + top-k no matter how deep. Here:
    // the page AFTER the cursor row (q64's last row computed inline, so
    // the oracle stays self-contained).
    Q(
      "q64b_keyset_page",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"))
        // cursor = last row of page 2 in (price DESC, key ASC) order
        val cur = o.orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .offset(19).limit(1)
          .select(col("o_totalprice").as("c_price"), col("o_orderkey").as("c_key"))
        o.join(broadcast(cur),
            col("o_totalprice") < col("c_price") ||
              (col("o_totalprice") === col("c_price") && col("o_orderkey") > col("c_key")))
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""WITH cur AS (SELECT o_totalprice AS c_price, o_orderkey AS c_key
             |             FROM orders
             |             ORDER BY o_totalprice DESC, o_orderkey
             |             LIMIT 1 OFFSET 19)
             |SELECT o_orderkey, o_totalprice
             |FROM orders, cur
             |WHERE o_totalprice < c_price
             |   OR (o_totalprice = c_price AND o_orderkey > c_key)
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 10""".stripMargin)),

    // ---- RANGE-frame window: true 7-calendar-day rolling sum -------------
    // Unlike q22's ROWS frame (last 7 observations), a RANGE frame over
    // the day number covers the actual trailing week even when days are
    // missing from the series.
    Q(
      "q67_range_frame",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("n"))
          .withColumn("day_num", datediff(col("day"), lit("1995-01-01")).cast("long"))
        val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
        daily
          .withColumn("week_n", sum(col("n")).over(w))
          .select(col("day"), col("n"), col("week_n"))
          .orderBy(col("day"))
      },
      Some("""SELECT day, n,
             |       CAST(sum(n) OVER (ORDER BY day_num
             |                         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS week_n
             |FROM (SELECT day, n, day - DATE '1995-01-01' AS day_num
             |      FROM (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
             |            FROM orders GROUP BY day))
             |ORDER BY day""".stripMargin)),

    // ---- Bloom-filter join pruning (runtime row-level semi-join) ---------
    // Build a Bloom filter over the selective side's join key, probe the
    // big side BEFORE the real join (at 100 TB this prunes most of a
    // scan without shuffling either side), then exact-verify the
    // survivors with the semi-join itself — the production runtime-
    // filter shape: the sketch only prunes, the join guarantees
    // correctness. Because false positives are removed by the exact
    // join, the output is engine-independent and fully oracle-checked
    // (OpsSpec separately proves the probe brackets the semi-join).
    Q(
      "q66_bloom_prune",
      (s, d) => {
        val urgent = Tables.orders(s, d)
          .where(col("o_orderpriority") === "1-URGENT")
        // an EMPTY build side yields a degenerate sketch whose probe
        // NPEs on a null bit buffer (r13 degenerate sweep); the exact
        // semi-join makes the probe an optimization, so the empty case
        // prunes everything outright — same rows, no sketch
        val probe: org.apache.spark.sql.Column =
          if (urgent.isEmpty) lit(false)
          else {
            val bloom = urgent.stat.bloomFilter("o_custkey", 2000, 0.01)
            // the sketch ships to executors inside the probe closure
            // (equivalently: broadcast it explicitly on a real cluster)
            udf((k: Long) => bloom.mightContain(k)).apply(col("c_custkey"))
          }
        Tables.customer(s, d)
          .where(probe)
          .join(urgent.select(col("o_custkey").as("c_custkey")).distinct(),
                Seq("c_custkey"), "left_semi")
          .agg(count(lit(1)).as("n_buyers"),
               countDistinct(col("c_nationkey")).as("n_nations"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_buyers,
             |       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
             |FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders
             |                    WHERE o_orderpriority = '1-URGENT')""".stripMargin)),

    // ---- SQL entry point: the same engine surface through spark.sql ------
    // (SURVEY.md §2.10 requires both DataFrame and SQL APIs; the SQL text
    // below is also valid DuckDB, so one string serves both engines.)
    Q(
      "q29_sql_interface",
      (s, d) => {
        // views come from the normalized accessors, not raw load(), so
        // any SQL query added on this path sees the same timestamp
        // layout normalization as the DataFrame surface (round-7 advice)
        Tables.orders(s, d).createOrReplaceTempView("orders")
        Tables.customer(s, d).createOrReplaceTempView("customer")
        s.sql("""SELECT c_mktsegment, count(*) AS n,
                |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS rev
                |FROM orders JOIN customer ON o_custkey = c_custkey
                |WHERE o_orderpriority = '1-URGENT'
                |GROUP BY c_mktsegment
                |ORDER BY c_mktsegment""".stripMargin)
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS rev
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // ---- salted hot-key aggregation (skew mitigation under oracle) -------
    // l_returnflag has 3 distinct values over the whole fact table — the
    // maximal-skew shape where a plain groupBy sends ~1/3 of the corpus
    // to each of three reducers. ops.Skew.saltedCountSum splits each key
    // into 16 sub-keys for the partial aggregate, then merges partials:
    // two narrow shuffles instead of three stragglers. Salting is pure
    // execution strategy — the RESULT is identical to the plain groupBy,
    // so the oracle is the unsalted query, and the hash compare proves
    // the rewrite is semantics-preserving (l_quantity is integer-valued,
    // so the double partial sums are exact under any grouping order).
    Q(
      "q133_salted_hot_keys",
      (s, d) =>
        graft.ops.Skew.saltedCountSum(
            Tables.lineitem(s, d).select(col("l_returnflag"), col("l_quantity")),
            "l_returnflag", "l_quantity")
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS total
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin))
  )
}
