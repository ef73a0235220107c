package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` fixture (SURVEY.md §2.11
  * E5/E6): tumbling windows, JSON-ish property extraction, gap-based
  * sessionization, funnels, per-user top-k. These are the batch twins of
  * the Structured Streaming jobs in `graft.streaming` — identical
  * aggregation logic, so the streaming path can be validated against the
  * batch oracle.
  */
object EventOps {

  val defs: Seq[Q] = Seq(
    // ---- E6: tumbling 1-hour window ---------------------------------------
    Q(
      "q45_events_hourly",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("h"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
          .orderBy(col("h"), col("event_type")),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS h,
             |       event_type, count(*) AS n, round(sum(value), 2) AS sum_v
             |FROM events
             |GROUP BY h, event_type
             |ORDER BY h, event_type""".stripMargin)),

    // ---- E5: property extraction from the JSON props column ---------------
    Q(
      "q46_events_props",
      (s, d) =>
        Tables.events(s, d)
          .withColumn("k",
            expr("""try_cast(nullif(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS BIGINT)"""))
          .groupBy((col("k") % 10).as("bucket"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
          .orderBy(col("bucket")),
      Some("""SELECT TRY_CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS BIGINT) % 10 AS bucket,
             |       count(*) AS n, round(sum(value), 2) AS sum_v
             |FROM events
             |GROUP BY bucket
             |ORDER BY bucket""".stripMargin)),

    // ---- E5: typed JSON parsing of the props column ----------------------
    Q(
      "q43_json_props_typed",
      (s, d) =>
        Tables.events(s, d)
          .withColumn("p", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
               min(col("p.k")).cast("long").as("min_k"),
               max(col("p.k")).cast("long").as("max_k"),
               countDistinct(col("p.k")).as("n_k"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
             |       CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS min_k,
             |       CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS max_k,
             |       count(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS n_k
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ---- E6: gap-based sessionization (30-min inactivity) -----------------
    Q(
      "q47_events_sessions",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("long").as("sec"))
          .withColumn("prev", lag(col("sec"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev").isNull || col("sec") - col("prev") > 1800, 1L).otherwise(0L))
          .groupBy(col("user_id"))
          .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
             |FROM (SELECT user_id,
             |             CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS new_sess
             |      FROM (SELECT user_id,
             |                   CAST(floor(date_part('epoch', ts)) AS BIGINT) AS sec,
             |                   lag(CAST(floor(date_part('epoch', ts)) AS BIGINT), 1)
             |                     OVER (PARTITION BY user_id
             |                           ORDER BY CAST(floor(date_part('epoch', ts)) AS BIGINT)) AS prev
             |            FROM events))
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // ---- funnel: view -> click -> purchase, by first occurrence -----------
    Q(
      "q48_events_funnel",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "view", col("ts"))).as("tv"),
            min(when(col("event_type") === "click", col("ts"))).as("tc"),
            min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
          .agg(
            count(lit(1)).as("n_users"),
            count(when(col("tv").isNotNull, lit(1))).as("n_view"),
            count(when(col("tv") < col("tc"), lit(1))).as("n_click_after_view"),
            count(when(col("tv") < col("tc") && col("tc") < col("tp"), lit(1)))
              .as("n_funnel")),
      Some("""SELECT count(*) AS n_users,
             |       count(*) FILTER (tv IS NOT NULL) AS n_view,
             |       count(*) FILTER (tv < tc) AS n_click_after_view,
             |       count(*) FILTER (tv < tc AND tc < tp) AS n_funnel
             |FROM (SELECT user_id,
             |             min(CASE WHEN event_type = 'view' THEN ts END) AS tv,
             |             min(CASE WHEN event_type = 'click' THEN ts END) AS tc,
             |             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
             |      FROM events GROUP BY user_id)""".stripMargin)),

    // ---- as-of attribution: each purchase joined to the latest preceding
    //      view of the same user. The classic as-of join expressed as a
    //      running max over an ordered window — no range join, no custom
    //      physical operator, shuffles once on user_id. ------------------
    Q(
      "q44_asof_attribution",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("sec"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
                  col("ts").cast("long").as("sec"))
          .withColumn("last_view",
            max(when(col("event_type") === "view", col("sec"))).over(w))
          .where(col("event_type") === "purchase" && col("last_view").isNotNull)
          .select(col("event_id"), col("user_id"),
                  (col("sec") - col("last_view")).as("secs_since_view"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, sec - last_view AS secs_since_view
             |FROM (SELECT event_id, user_id, event_type, sec,
             |             max(CASE WHEN event_type = 'view' THEN sec END)
             |               OVER (PARTITION BY user_id ORDER BY sec, event_id
             |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |               AS last_view
             |      FROM (SELECT event_id, user_id, event_type,
             |                   CAST(floor(date_part('epoch', ts)) AS BIGINT) AS sec
             |            FROM events))
             |WHERE event_type = 'purchase' AND last_view IS NOT NULL
             |ORDER BY event_id""".stripMargin)),

    // ---- as-of join as a CUSTOM CATALYST OPERATOR (graft.plans.AsOf) -----
    // Same attribution semantics as q44, but through the first-class
    // AsOfJoinPlan/AsOfJoinExec: co-partitioned (key, time)-sorted
    // two-pointer merge instead of the union + full-stream window.
    // The oracle is DuckDB's native ASOF JOIN — two independent
    // implementations of the operator semantics.
    Q(
      "q69_asof_custom",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
                  unix_micros(col("ts")).as("us"))
        val p = e.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("us"))
        val v = e.where(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("us").as("v_us"))
        graft.plans.AsOf.joinBackward(p, v,
            keys = Seq("user_id" -> "v_user"), time = "us" -> "v_us")
          .where(col("v_us").isNotNull) // inner as-of, like the oracle
          .select(col("event_id"), col("user_id"),
                  (col("us") - col("v_us")).as("micros_since_view"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |                 epoch_ns(ts) // 1000 AS us
             |          FROM events),
             |p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
             |v AS (SELECT user_id AS v_user, us AS v_us FROM e WHERE event_type = 'view')
             |SELECT p.event_id, p.user_id, p.us - v.v_us AS micros_since_view
             |FROM p ASOF JOIN v ON p.user_id = v.v_user AND v.v_us <= p.us
             |ORDER BY p.event_id""".stripMargin)),

    // ---- range join via time binning: neighbors within ±5 minutes --------
    // A naive theta join (|t1-t2| <= 300) is quadratic per user; binning
    // to 5-minute buckets and exploding one side into its 3 adjacent
    // buckets turns it into an equi-join on (user, bin) + residual
    // filter — each qualifying pair matches exactly once because the
    // probe side keeps its single home bin. This is the scalable range
    // join shape; the oracle checks it against DuckDB's direct theta join.
    Q(
      "q61_range_join_binned",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
                  col("ts").cast("long").as("sec"))
        val left = ev.withColumn("bin", expr("sec div 300"))
        val right = ev
          .withColumn("bin", explode_outer(expr(
            "array(sec div 300 - 1, sec div 300, sec div 300 + 1)")))
        left.as("l")
          .join(right.as("r"),
                col("l.user_id") === col("r.user_id") &&
                  col("l.bin") === col("r.bin") &&
                  col("l.event_id") =!= col("r.event_id") &&
                  abs(col("l.sec") - col("r.sec")) <= 300)
          .groupBy(col("l.event_type").as("event_type"))
          .agg(count(lit(1)).as("n_pairs"),
               countDistinct(col("l.event_id")).as("n_events_with_neighbors"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT e1.event_type, count(*) AS n_pairs,
             |       count(DISTINCT e1.event_id) AS n_events_with_neighbors
             |FROM (SELECT event_id, user_id, event_type,
             |             CAST(floor(date_part('epoch', ts)) AS BIGINT) AS sec
             |      FROM events) e1
             |JOIN (SELECT event_id, user_id,
             |             CAST(floor(date_part('epoch', ts)) AS BIGINT) AS sec
             |      FROM events) e2
             |  ON e1.user_id = e2.user_id
             | AND e1.event_id <> e2.event_id
             | AND abs(e1.sec - e2.sec) <= 300
             |GROUP BY e1.event_type
             |ORDER BY e1.event_type""".stripMargin)),

    // ---- time series: day-over-day growth of event volume ----------------
    Q(
      "q62_daily_growth",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        // unpartitioned window AUDIT: the frame is the pre-aggregated
        // daily series — one row per calendar day, bounded by the date
        // span (thousands of rows at any corpus scale), never raw events
        val w = Window.orderBy(col("day"))
        daily
          .withColumn("prev_n", lag(col("n"), 1).over(w))
          .withColumn("growth_pct",
            round((col("n") - col("prev_n")) * lit(100.0) / col("prev_n"), 4))
          .orderBy(col("day"))
      },
      Some("""SELECT day, n, prev_n,
             |       round((n - prev_n) * 100.0 / prev_n, 4) AS growth_pct
             |FROM (SELECT day, n, lag(n, 1) OVER (ORDER BY day) AS prev_n
             |      FROM (SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |            FROM events GROUP BY day))
             |ORDER BY day""".stripMargin)),

    // ---- cohort retention: users by first-seen day x days-since-cohort ---
    Q(
      "q63_cohort_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
        ev.join(cohort, Seq("user_id"))
          .groupBy(col("cohort_day"),
                   datediff(col("day"), col("cohort_day")).cast("long").as("age_days"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .where(col("age_days") <= 3)
          .orderBy(col("cohort_day"), col("age_days"))
      },
      Some("""SELECT cohort_day, CAST(day - cohort_day AS BIGINT) AS age_days,
             |       count(DISTINCT user_id) AS active_users
             |FROM (SELECT user_id, CAST(ts AS DATE) AS day FROM events) e
             |JOIN (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
             |      FROM events GROUP BY user_id) c USING (user_id)
             |WHERE day - cohort_day <= 3
             |GROUP BY cohort_day, age_days
             |ORDER BY cohort_day, age_days""".stripMargin)),

    // ---- top-k users by activity ------------------------------------------
    Q(
      "q49_events_top_users",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
               count(when(col("event_type") === "purchase", lit(1))).as("n_purchases"))
          .orderBy(col("n").desc, col("user_id"))
          .limit(20),
      Some("""SELECT user_id, count(*) AS n,
             |       count(*) FILTER (event_type = 'purchase') AS n_purchases
             |FROM events
             |GROUP BY user_id
             |ORDER BY n DESC, user_id
             |LIMIT 20""".stripMargin))
  )
}
