package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics over the `events` table: time-bucketed
  * aggregation, ranking/lag window functions, JSON property extraction, and
  * gap-based sessionization. The reference has no window/stream surface
  * (SURVEY §2.5) — these are capability extensions, all expressed with
  * Spark built-ins so they scale: window functions shuffle once on their
  * partition key (user_id — high cardinality, even), and the time-bucket
  * aggregations are plain hash aggregates with map-side combine.
  *
  * NOTE on timestamps: events.ts is nanosecond-precision parquet; Spark
  * truncates to microseconds. Queries therefore never order or group by raw
  * `ts` where sub-µs could matter — `event_id` is the total order.
  */
object Events {

  private val THIRTY_MIN_US = 30L * 60 * 1000 * 1000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_events_hourly" -> { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      e.groupBy(
          date_trunc("hour", col("ts")).as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("hour"), col("event_type"))
    },

    "e2_window_funcs" -> { (s, dir) =>
      // filtering on the partition key commutes with the window — do it
      // before so only the selected partitions shuffle at all
      val e = Tables.load(s, dir, "events").filter(col("user_id") < 50)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      e.select(
          col("user_id"), col("event_id"), col("value"),
          row_number().over(byUser).as("rn"),
          rank().over(Window.partitionBy(col("user_id")).orderBy(col("event_type"))).as("type_rank"),
          lag(col("event_id"), 1).over(byUser).as("prev_event"),
          sum(col("value").cast("decimal(18,2)"))
            .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    },

    "e3_events_json" -> { (s, dir) =>
      // props is a JSON string column: {"k": <int>}
      val e = Tables.load(s, dir, "events")
      e.select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },

    "e4_sessionize" -> { (s, dir) =>
      // gap-based sessionization: a >30-minute silence starts a new session.
      // boundary flags → running sum per user = session index; then one
      // aggregate per (user, session).
      val e = Tables.load(s, dir, "events").filter(col("user_id") < 50)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val flagged = e.select(
          col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > THIRTY_MIN_US, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      flagged
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          date_trunc("second", min(col("ts"))).as("session_start"),
          date_trunc("second", max(col("ts"))).as("session_end"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
        .filter(col("user_id") < 50)
        .orderBy(col("user_id"), col("session_id"))
    },

    "e5_asof_join" -> { (s, dir) =>
      // backward as-of join on the event_id axis (unique ⇒ deterministic;
      // the ts column is ns-precision in DuckDB vs µs in Spark, so an
      // id axis keeps both engines exactly comparable): for every click,
      // the most recent prior purchase by the same user
      val e = Tables.load(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("ord"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("ord"),
          col("event_id").as("pid"), col("value").as("pvalue"))
      graft.operators.AsofJoin
        .backward(clicks, purchases, key = "user_id", ord = "ord",
          payload = Seq("pid", "pvalue"))
        .orderBy(col("user_id"), col("ord"))
    },

    "e7_asof_forward" -> { (s, dir) =>
      // forward as-of join, e5's mirror: for every click, the EARLIEST
      // following purchase by the same user — the "next event" lookup.
      // Same union + single-shuffle sweep, first() over the following
      // frame; the oracle is DuckDB's native ASOF with the >= comparator.
      val e = Tables.load(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("ord"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("ord"),
          col("event_id").as("pid"), col("value").as("pvalue"))
      graft.operators.AsofJoin
        .forward(clicks, purchases, key = "user_id", ord = "ord",
          payload = Seq("pid", "pvalue"))
        .orderBy(col("user_id"), col("ord"))
    },

    "e6_range_join" -> { (s, dir) =>
      // point-in-interval range join on the µs axis (exact on both
      // engines — the data has no sub-µs components): events falling into
      // 2-minute "incident windows" anchored at the 20 busiest minutes.
      // The window table is derived with the global-top-k form of the
      // TopKPerKey operator; the join is RangeJoin's bucketed equi form
      // (1-minute buckets, so each 2-minute window spans 2-3 buckets).
      val e = Tables.load(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
      val minuteUs = 60L * 1000 * 1000
      val perMinute = e
        .groupBy((col("us") / minuteUs).cast("long").as("minute"))
        .agg(count(lit(1)).as("n"))
      val top = graft.plans.TopKPerKey(
        perMinute, Seq.empty, Seq(col("n").desc, col("minute").asc), 20)
      val windows = top.select(
        (col("minute") * minuteUs).as("start_us"),
        ((col("minute") + 2) * minuteUs).as("end_us"))
      graft.operators.RangeJoin
        .pointInInterval(e.select(col("event_id"), col("us")), windows,
          pt = "us", start = "start_us", end = "end_us",
          bucketWidth = minuteUs)
        .select(col("event_id"), col("start_us"))
        .orderBy(col("event_id"), col("start_us"))
    },

    "e8_interval_overlap" -> { (s, dir) =>
      // interval×interval overlap join on the day axis: per-order
      // fulfillment intervals [orderdate, orderdate + orderkey%21 days]
      // (deterministic varied lengths, no RNG) against 7-day "audit
      // windows" anchored at the 20 busiest order days. e6's point form
      // can't express this — BOTH sides have extent — so it exercises
      // RangeJoin.intervalOverlap's canonical-bucket expansion (7-day
      // buckets ⇒ fulfillment spans 1-4, windows 1-2, every overlapping
      // pair survives in exactly one). The window table derives from the
      // global-top-k form of TopKPerKey, as in e6.
      val o = Tables.load(s, dir, "orders")
      val perDay = o.groupBy(unix_date(to_date(col("o_orderdate"))).as("d"))
        .agg(count(lit(1)).as("n"))
      val top = graft.plans.TopKPerKey(
        perDay, Seq.empty, Seq(col("n").desc, col("d").asc), 20)
      val windows = top.select(
        col("d").cast("long").as("w_start"),
        (col("d") + 6).cast("long").as("w_end"))
      val fulfill = o.select(
        col("o_orderkey"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("f_start"),
        (unix_date(to_date(col("o_orderdate"))) + col("o_orderkey") % 21)
          .cast("long").as("f_end"))
      graft.operators.RangeJoin
        .intervalOverlap(fulfill, windows,
          lStart = "f_start", lEnd = "f_end",
          rStart = "w_start", rEnd = "w_end", bucketWidth = 7L)
        .select(col("o_orderkey"), col("w_start"))
        .orderBy(col("o_orderkey"), col("w_start"))
    },

    "e9_funnel" -> { (s, dir) =>
      // ordered funnel (view → click → purchase) per user on the
      // event_id axis. Each stage's anchor is a conditional min over the
      // WHOLE user partition, chained: stage n+1 only counts events after
      // stage n's anchor. Three unordered windows share one hash
      // partitioning on user_id, so the whole funnel is a single shuffle
      // followed by a partition-local aggregate — no per-stage joins, no
      // repeated scans. That shape holds at any user cardinality.
      val e = Tables.load(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id"))
      e.select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("v",
          min(when(col("event_type") === "view", col("event_id"))).over(byUser))
        .withColumn("c",
          min(when(col("event_type") === "click" && col("event_id") > col("v"),
            col("event_id"))).over(byUser))
        .withColumn("p",
          min(when(col("event_type") === "purchase" && col("event_id") > col("c"),
            col("event_id"))).over(byUser))
        .groupBy(col("user_id"))
        .agg(min(col("v")).as("v_id"), min(col("c")).as("c_id"),
          min(col("p")).as("p_id"))
        .withColumn("stage",
          (when(col("v_id").isNotNull, 1).otherwise(0) +
            when(col("c_id").isNotNull, 1).otherwise(0) +
            when(col("p_id").isNotNull, 1).otherwise(0)).cast("int"))
        .orderBy(col("user_id"))
    },

    "e10_gap_fill" -> { (s, dir) =>
      // time-series regularization: per user, an hourly grid from the
      // user's first to last event hour, gap hours carrying the last
      // observed value forward (n_events = 0 marks the fill rows).
      // The grid is generated, not joined-in: sequence() + explode emits
      // each user's hours map-side from a 2-column bounds row, so the
      // only shuffles are the hourly aggregate and the forward-fill
      // window — both on user_id. Hours are integer epoch-hour buckets
      // (µs DIV 3600e6): pure integer math on both engines, no timestamp
      // formatting in the comparison surface.
      val e = Tables.load(s, dir, "events")
        .filter(col("user_id") < 40)
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 3600000000").as("h"),
          col("value"))
      val hourly = e.groupBy(col("user_id"), col("h"))
        .agg(max(col("value")).as("v"), count(lit(1)).as("n"))
      val grid = e.groupBy(col("user_id"))
        .agg(min(col("h")).as("hmin"), max(col("h")).as("hmax"))
        .select(col("user_id"),
          explode(sequence(col("hmin"), col("hmax"))).as("h"))
      val fill = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          last(col("v"), ignoreNulls = true).over(fill).as("filled_value"))
        .orderBy(col("user_id"), col("h"))
    },

    "e11_cohort" -> { (s, dir) =>
      // cohort retention matrix: users grouped by first-active week,
      // counted at each later week offset. Weeks are integer epoch-week
      // buckets (µs DIV 86400e6 DIV 7). One distinct over (user, week)
      // — the only row-scale shuffle — then a per-user min and a tiny
      // (cohort, offset) aggregate; the matrix is O(weeks²) however big
      // the event log grows.
      val e = Tables.load(s, dir, "events")
      val uw = e.select(col("user_id"),
          expr("(unix_micros(ts) DIV 86400000000) DIV 7").as("w"))
        .distinct()
      val cohorts = uw.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
      uw.join(cohorts, "user_id")
        .groupBy(col("cw").as("cohort_week"), (col("w") - col("cw")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    "e14_rolling_window" -> { (s, dir) =>
      // trailing-24h rolling aggregates per user — the sliding-window
      // feature-engineering primitive e2's ROW frames can't express: a
      // RANGE frame over epoch seconds includes every event within the
      // trailing day regardless of row count. Partitioned by user (a
      // user's history fits a task); the frame bound is integer seconds
      // (floor-of-epoch, ≡ DuckDB's boundary-counting date_diff) and the
      // value sum routes through decimal, so every row is bit-exact.
      // Tied timestamps are RANGE-frame peers in both engines —
      // deterministic without needing a unique order key.
      val e = Tables.load(s, dir, "events").filter(col("user_id") < 50)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("es")).rangeBetween(-86399L, 0L)
      e.select(col("user_id"), col("event_id"), col("value"),
          unix_timestamp(col("ts")).as("es"))
        .select(col("user_id"), col("event_id"), col("es"),
          count(lit(1)).over(w).as("n_24h"),
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("v_24h"))
        .orderBy(col("user_id"), col("event_id"))
    },

    "e16_burst_ratio" -> { (s, dir) =>
      // burst detection per event type — each hour's event count
      // against its trailing-24h hourly mean, the live-ops anomaly
      // signal ("clicks are 4× their daily baseline"): burst_ppm =
      // 1e6·c·n_hours div trail (exact integers; n_hours counts only
      // OBSERVED buckets, so sparse hours don't deflate the baseline).
      // The RANGE frame runs over epoch-second hour keys PARTITIONED
      // by event_type (e14's discipline — a type's hourly series fits
      // a task at any volume; the hourly pre-aggregate is the only
      // corpus-sized stage and map-combines).
      val e = Tables.load(s, dir, "events")
      val hourly = e.select(col("event_type"),
          unix_timestamp(date_trunc("hour", col("ts"))).as("hs"))
        .groupBy(col("event_type"), col("hs"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("hs")).rangeBetween(-82800L, 0L) // trailing 24 buckets
      hourly.select(col("event_type"), col("hs"), col("c"),
          sum(col("c")).over(w).as("trail"),
          count(lit(1)).over(w).as("n_hours"))
        .select(col("event_type"), col("hs"), col("c"), col("trail"),
          col("n_hours"),
          expr("(1000000 * c * n_hours) div trail").as("burst_ppm"))
        .orderBy(col("event_type"), col("hs"))
    }
  )

  val oracles: Map[String, String] = Map(
    "e8_interval_overlap" ->
      """WITH pd AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
        |         count(*) AS n
        |  FROM orders GROUP BY 1),
        |top AS (SELECT d FROM pd ORDER BY n DESC, d ASC LIMIT 20),
        |w AS (SELECT CAST(d AS BIGINT) AS w_start,
        |             CAST(d + 6 AS BIGINT) AS w_end FROM top),
        |f AS (
        |  SELECT o_orderkey,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS f_start,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      + o_orderkey % 21 AS f_end
        |  FROM orders)
        |SELECT f.o_orderkey, w.w_start
        |FROM f JOIN w ON f.f_start <= w.w_end AND w.w_start <= f.f_end
        |ORDER BY f.o_orderkey, w.w_start""".stripMargin,

    "e6_range_join" ->
      """WITH m AS (SELECT epoch_us(ts) // 60000000 AS minute, count(*) AS n
        |           FROM events GROUP BY 1),
        |top AS (SELECT minute FROM m ORDER BY n DESC, minute ASC LIMIT 20),
        |w AS (SELECT minute * 60000000 AS start_us,
        |             (minute + 2) * 60000000 AS end_us FROM top)
        |SELECT e.event_id, w.start_us
        |FROM events e JOIN w
        |  ON epoch_us(e.ts) >= w.start_us AND epoch_us(e.ts) < w.end_us
        |ORDER BY e.event_id, w.start_us""".stripMargin,

    "e5_asof_join" ->
      """WITH c AS (SELECT user_id, event_id AS ord FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS ord, event_id AS pid, value AS pvalue
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.ord, p.pid, p.pvalue
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ord <= c.ord
        |ORDER BY c.user_id, c.ord""".stripMargin,

    "e7_asof_forward" ->
      """WITH c AS (SELECT user_id, event_id AS ord FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS ord, event_id AS pid, value AS pvalue
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.ord, p.pid, p.pvalue
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ord >= c.ord
        |ORDER BY c.user_id, c.ord""".stripMargin,

    "e1_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e2_window_funcs" ->
      """SELECT user_id, event_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        |  rank() OVER (PARTITION BY user_id ORDER BY event_type) AS type_rank,
        |  lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_event,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events WHERE user_id < 50
        |ORDER BY user_id, event_id""".stripMargin,

    "e3_events_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e4_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
        |  FROM events WHERE user_id < 50),
        |numbered AS (
        |  SELECT user_id, event_id, ts, value,
    |    CAST(sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id,
        |  count(*) AS n_events,
        |  date_trunc('second', min(ts)) AS session_start,
        |  date_trunc('second', max(ts)) AS session_end,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM numbered WHERE user_id < 50
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "e9_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, event_id, event_type,
        |    min(CASE WHEN event_type = 'view' THEN event_id END)
        |      OVER (PARTITION BY user_id) AS v
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND event_id > v
        |                     THEN event_id END)
        |    OVER (PARTITION BY user_id) AS c
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND event_id > c
        |                     THEN event_id END)
        |    OVER (PARTITION BY user_id) AS p
        |  FROM s2)
        |SELECT user_id, min(v) AS v_id, min(c) AS c_id, min(p) AS p_id,
        |  CAST((CASE WHEN min(v) IS NOT NULL THEN 1 ELSE 0 END)
        |     + (CASE WHEN min(c) IS NOT NULL THEN 1 ELSE 0 END)
        |     + (CASE WHEN min(p) IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER) AS stage
        |FROM s3 GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e10_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS h, value
        |  FROM events WHERE user_id < 40),
        |hourly AS (
        |  SELECT user_id, h, max(value) AS v, count(*) AS n
        |  FROM e GROUP BY 1, 2),
        |b AS (SELECT user_id, min(h) AS hmin, max(h) AS hmax
        |      FROM e GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(hmin, hmax)) AS h
        |         FROM b)
        |SELECT g.user_id, g.h,
        |  coalesce(n, 0) AS n_events,
        |  last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM grid g LEFT JOIN hourly USING (user_id, h)
        |ORDER BY g.user_id, g.h""".stripMargin,

    "e11_cohort" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    (epoch_us(ts) // 86400000000) // 7 AS w
        |  FROM events),
        |c AS (SELECT user_id, min(w) AS cw FROM uw GROUP BY 1)
        |SELECT c.cw AS cohort_week, uw.w - c.cw AS week_offset,
        |  count(DISTINCT uw.user_id) AS n_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e14_rolling_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS es
        |  FROM events WHERE user_id < 50)
        |SELECT user_id, event_id, es,
        |  count(*) OVER w AS n_24h,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_24h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY es
        |             RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "e16_burst_ratio" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |      date_trunc('hour', ts)) AS hs,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, hs, c,
        |  CAST(sum(c) OVER w AS BIGINT) AS trail,
        |  CAST(count(*) OVER w AS BIGINT) AS n_hours,
        |  (1000000 * c * CAST(count(*) OVER w AS BIGINT)) //
        |    CAST(sum(c) OVER w AS BIGINT) AS burst_ppm
        |FROM hourly
        |WINDOW w AS (PARTITION BY event_type ORDER BY hs
        |             RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, hs""".stripMargin
  )
}
