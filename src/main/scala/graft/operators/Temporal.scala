package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Temporal operators over the `events` table: as-of join and
  * sessionization. The reference has no time semantics at all
  * (SURVEY.md §2.3 A9); these are the extension-layer operators a
  * training-data/event pipeline needs.
  *
  * As-of join is expressed Spark-first as the "union + running
  * last-match" window pattern rather than a custom physical operator:
  * tag both sides, sort within the key partition by event time, and
  * carry the latest left-side match forward with a running `max over
  * window`. One shuffle on the join key, no point lookups, no
  * broadcast state — the same plan shape scales to any key
  * cardinality, which is why engines without a native ASOF operator
  * use it. The DuckDB oracle states the same semantics as a
  * correlated max.
  */
object Temporal {

  private val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val duckFmt = "%Y-%m-%d %H:%M:%S.%f"
  private val SessionGapUs = 1800000000L // 30 min

  // ---------------------------------------------------------------
  // SCD2 HISTORY BUILD — the slowly-changing-dimension type-2 table
  // every lakehouse derives from an event stream: per user, collapse
  // consecutive same-status events and emit one VALIDITY INTERVAL per
  // status change (valid_from = the change event's time, valid_to =
  // the next change's time, open interval marked `current`). The
  // batch twin of [[graft.streaming.Streams]]' CDC apply: merge_upsert
  // keeps only the latest state, SCD2 keeps the full history — the
  // form point-in-time joins and training-data snapshots read.
  // Deterministic under the (ts, event_id) total order (the CDC
  // last-write-wins convention); one user-partitioned window chain,
  // no global sort, timestamps out as µs strings.
  def qScd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type").as("status"),
        date_format(col("ts"), tsFmt).as("valid_from"),
        coalesce(date_format(col("valid_to_ts"), tsFmt), lit("current")).as("valid_to"),
        col("valid_to_ts").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val qScd2Sql: String =
    s"""WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
       |ch AS (SELECT user_id, event_type, ts, event_id FROM (
       |  SELECT user_id, event_type, ts, event_id,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt FROM ev)
       |  WHERE pt IS NULL OR pt <> event_type),
       |v AS (SELECT user_id, event_type, ts,
       |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
       |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt FROM ch)
       |SELECT user_id, CAST(version AS BIGINT) AS version, event_type AS status,
       |  strftime(ts, '$duckFmt') AS valid_from,
       |  coalesce(strftime(vt, '$duckFmt'), 'current') AS valid_to,
       |  vt IS NULL AS is_current
       |FROM v ORDER BY user_id, version""".stripMargin

  // ---------------------------------------------------------------
  // as-of join: each purchase matched to the latest click at-or-before
  // it for the same user.
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      // clicks sort before purchases at equal ts, making the match
      // condition exactly click.ts <= purchase.ts
      .withColumn("side", when(col("event_type") === "click", 0).otherwise(1))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    e.withColumn("last_click_ts",
        max(when(col("side") === 0, col("ts"))).over(w))
      .filter(col("side") === 1)
      .select(
        col("event_id"),
        col("user_id"),
        date_format(col("ts"), tsFmt).as("purchase_ts"),
        date_format(col("last_click_ts"), tsFmt).as("last_click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("last_click_ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  val qAsofJoinSql: String =
    s"""WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
       |p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
       |m AS (SELECT p.event_id, p.user_id, p.ts,
       |  (SELECT max(c.ts) FROM ev c
       |   WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts) AS c_ts
       |  FROM p)
       |SELECT event_id, user_id,
       |  strftime(ts, '$duckFmt') AS purchase_ts,
       |  strftime(c_ts, '$duckFmt') AS last_click_ts,
       |  date_diff('microsecond', c_ts, ts) AS gap_us
       |FROM m ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  // NEAREST as-of join (pandas merge_asof direction='nearest'): each
  // purchase matched to the CLOSEST click in time, either side — the
  // sensor-fusion / attribution variant of [[qAsofJoin]] (which is
  // direction='backward'). Backward candidate = the at-or-before
  // window carry; forward candidate = the mirrored at-or-after frame
  // (a second sort order where purchases sort before clicks at equal
  // ts, so an equal-ts click is visible to BOTH directions); the
  // winner is the smaller µs gap, ties to backward (stated
  // convention, mirrored in the oracle's CASE order). One shuffle on
  // the user key, two partition-local sorts — no self-join, no point
  // lookups, the same plan shape at any key cardinality.
  def qAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("side", when(col("event_type") === "click", 0).otherwise(1))
    val wBack = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), lit(1) - col("side"), col("event_id"))
      .rowsBetween(0, Window.unboundedFollowing)
    val gb = unix_micros(col("ts")) - unix_micros(col("back_ts"))
    val gf = unix_micros(col("fwd_ts")) - unix_micros(col("ts"))
    e.withColumn("back_ts", max(when(col("side") === 0, col("ts"))).over(wBack))
      .withColumn("fwd_ts", min(when(col("side") === 0, col("ts"))).over(wFwd))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), tsFmt).as("purchase_ts"),
        date_format(when(col("fwd_ts").isNull ||
            (col("back_ts").isNotNull && gb <= gf), col("back_ts"))
          .otherwise(col("fwd_ts")), tsFmt).as("nearest_click_ts"),
        when(col("back_ts").isNull && col("fwd_ts").isNull, "none")
          .when(col("fwd_ts").isNull ||
            (col("back_ts").isNotNull && gb <= gf), "back")
          .otherwise("fwd").as("direction"),
        when(col("fwd_ts").isNull ||
            (col("back_ts").isNotNull && gb <= gf), gb)
          .otherwise(gf).as("gap_us"))
      .orderBy(col("event_id"))
  }

  val qAsofNearestSql: String =
    s"""WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
       |p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
       |m AS (SELECT p.event_id, p.user_id, p.ts,
       |  (SELECT max(c.ts) FROM ev c WHERE c.event_type = 'click'
       |     AND c.user_id = p.user_id AND c.ts <= p.ts) AS b_ts,
       |  (SELECT min(c.ts) FROM ev c WHERE c.event_type = 'click'
       |     AND c.user_id = p.user_id AND c.ts >= p.ts) AS f_ts
       |  FROM p),
       |d AS (SELECT event_id, user_id, ts, b_ts, f_ts,
       |  date_diff('microsecond', b_ts, ts) AS gb,
       |  date_diff('microsecond', ts, f_ts) AS gf FROM m)
       |SELECT event_id, user_id,
       |  strftime(ts, '$duckFmt') AS purchase_ts,
       |  strftime(CASE WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND gb <= gf)
       |    THEN b_ts ELSE f_ts END, '$duckFmt') AS nearest_click_ts,
       |  CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN 'none'
       |    WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND gb <= gf) THEN 'back'
       |    ELSE 'fwd' END AS direction,
       |  CASE WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND gb <= gf)
       |    THEN gb ELSE gf END AS gap_us
       |FROM d ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  // AS-OF JOIN VIA THE CUSTOM PHYSICAL OPERATOR — the same gate as
  // [[qAsofJoin]] (same oracle SQL), answered by
  // [[graft.plans.AsOfJoinExec]]: a planner-injected logical node
  // that EnsureRequirements co-partitions + sorts, then a single
  // O(n+m) merge pass per partition — no union, no window buffer.
  // Two implementations, one oracle: the composed window form proves
  // the semantics, the custom operator proves the extension ladder
  // (logical node → Strategy → SparkPlan) carries them at scan
  // speed; ExtensionSpec asserts the physical plan really is
  // AsOfJoinExec over sorted, clustered children. The two sides read
  // `events` independently (fresh attribute ids per side — a custom
  // binary node does not get the analyzer's join-specific relation
  // deduplication).
  def qAsofJoinExec(s: SparkSession, dir: String): DataFrame = {
    val purchases = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = Tables.events(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    graft.plans.AsOfJoinPlan.asofJoin(s, purchases, clicks, "user_id", "ts", "c_ts")
      .toDF("event_id", "user_id", "p_ts", "r_uid", "c_ts")
      .select(
        col("event_id"), col("user_id"),
        date_format(col("p_ts"), tsFmt).as("purchase_ts"),
        date_format(col("c_ts"), tsFmt).as("last_click_ts"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------
  // SEASONALITY PROFILE — the hour-of-day load shape per event type:
  // exact integer counts, per-mille share of the type's traffic, and
  // the peak-hour flag (ties to the earlier hour — deterministic).
  // The profile a pipeline reads to place sampling windows, size
  // streaming capacity, and catch diurnal drift (a type whose peak
  // hour MOVES is upstream behavior change). One scan, one
  // (type, hour) partial agg — 24·|types| metadata out.
  def qSeasonality(s: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.events(s, dir)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hour_of_day"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy(col("event_type"))
    cnt
      .withColumn("type_n", sum(col("n")).over(tot))
      .withColumn("mx", max(col("n")).over(tot))
      .withColumn("peak_hour", min(when(col("n") === col("mx"), col("hour_of_day"))).over(tot))
      .select(col("event_type"), col("hour_of_day"), col("n"),
        expr("n * 1000 div type_n").as("share_pm"),
        when(col("hour_of_day") === col("peak_hour"), 1L).otherwise(0L).as("is_peak"))
      .orderBy(col("event_type"), col("hour_of_day"))
  }

  val qSeasonalitySql: String =
    """WITH ev AS (SELECT event_type, hour(CAST(ts AS TIMESTAMP)) AS hod FROM events),
      |c AS (SELECT event_type, hod, count(*) AS n FROM ev GROUP BY 1, 2),
      |t AS (SELECT event_type, hod, n,
      |  sum(n) OVER (PARTITION BY event_type) AS type_n,
      |  max(n) OVER (PARTITION BY event_type) AS mx FROM c),
      |p AS (SELECT event_type, min(hod) AS peak_hour FROM t WHERE n = mx GROUP BY 1)
      |SELECT t.event_type, CAST(t.hod AS BIGINT) AS hour_of_day, CAST(t.n AS BIGINT) AS n,
      |  CAST(t.n * 1000 // t.type_n AS BIGINT) AS share_pm,
      |  CAST(CASE WHEN t.hod = p.peak_hour THEN 1 ELSE 0 END AS BIGINT) AS is_peak
      |FROM t JOIN p USING (event_type)
      |ORDER BY event_type, hour_of_day""".stripMargin

  // ---------------------------------------------------------------
  // DAY-OF-WEEK PROFILE — [[qSeasonality]]'s calendar sibling: the
  // weekday/weekend load shape per event type (the dimension
  // capacity planning and drift checks read alongside hour-of-day).
  // dayofweek is rendered as the ISO day NAME so neither engine's
  // week-start numbering convention can silently shift the gate.
  // Same one-partial-agg shape; 7·|types| metadata out.
  def qDowProfile(s: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "EEEE").as("dow"),
        ((dayofweek(col("ts")) + 5) % 7).cast("long").as("iso_idx"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy(col("event_type"))
    cnt.withColumn("type_n", sum(col("n")).over(tot))
      .select(col("event_type"), col("iso_idx"), col("dow"), col("n"),
        expr("n * 1000 div type_n").as("share_pm"),
        when(col("iso_idx") >= 5, 1L).otherwise(0L).as("is_weekend"))
      .orderBy(col("event_type"), col("iso_idx"))
  }

  val qDowProfileSql: String =
    """WITH ev AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |c AS (SELECT event_type, dayname(ts) AS dow, (isodow(ts) - 1) AS iso_idx, count(*) AS n
      |  FROM ev GROUP BY 1, 2, 3),
      |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS type_n FROM c GROUP BY 1)
      |SELECT c.event_type, CAST(c.iso_idx AS BIGINT) AS iso_idx, c.dow, CAST(c.n AS BIGINT) AS n,
      |  CAST(c.n * 1000 // t.type_n AS BIGINT) AS share_pm,
      |  CAST(CASE WHEN c.iso_idx >= 5 THEN 1 ELSE 0 END AS BIGINT) AS is_weekend
      |FROM c JOIN t USING (event_type)
      |ORDER BY c.event_type, c.iso_idx""".stripMargin

  // ---------------------------------------------------------------
  // USER LIFESPAN — the per-user cohort base table the retention
  // matrix aggregates away: first/last event, lifespan in whole
  // days (integer µs div — exact), distinct active days, and the
  // activity density per-mille (active days over lifespan span) —
  // the churn-modeling features a pipeline derives before any
  // cohort rollup. One (user) partial agg + one distinct-day
  // pre-agg; user-count-sized output.
  def qUserLifespan(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), to_date(col("ts")).as("d"))
    val days = ev.select(col("user_id"), col("d")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("active_days"))
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .join(days, Seq("user_id"))
      .select(col("user_id"), col("n_events"),
        date_format(col("first_ts"), tsFmt).as("first_ts"),
        date_format(col("last_ts"), tsFmt).as("last_ts"),
        expr("(unix_micros(last_ts) - unix_micros(first_ts)) div 86400000000")
          .as("lifespan_days"),
        col("active_days"),
        // CALENDAR-day span, not whole-µs-day span: two events 20
        // minutes apart across midnight span 2 calendar days but 0
        // µs-days — the µs denominator read 200% "density" for
        // exactly the bursty users the feature characterizes
        expr("active_days * 1000 div (datediff(to_date(last_ts), to_date(first_ts)) + 1)")
          .as("density_pm"))
      .orderBy(col("user_id"))
  }

  val qUserLifespanSql: String =
    s"""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, CAST(ts AS DATE) AS d FROM events),
       |days AS (SELECT user_id, CAST(count(DISTINCT d) AS BIGINT) AS active_days FROM ev GROUP BY 1),
       |agg AS (SELECT user_id, count(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts
       |  FROM ev GROUP BY 1)
       |SELECT a.user_id, CAST(a.n_events AS BIGINT) AS n_events,
       |  strftime(a.first_ts, '$duckFmt') AS first_ts,
       |  strftime(a.last_ts, '$duckFmt') AS last_ts,
       |  CAST(date_diff('microsecond', a.first_ts, a.last_ts) // 86400000000 AS BIGINT) AS lifespan_days,
       |  d.active_days,
       |  CAST(d.active_days * 1000 // (date_diff('day', CAST(a.first_ts AS DATE), CAST(a.last_ts AS DATE)) + 1) AS BIGINT) AS density_pm
       |FROM agg a JOIN days d USING (user_id)
       |ORDER BY a.user_id""".stripMargin

  // ---------------------------------------------------------------
  // sessionization: 30-minute-gap sessions per user, batch form
  // (lag + cumulative sum). The Structured Streaming stateful twin
  // lives in graft.streaming.
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
    val isNew = when(gapUs.isNull || gapUs > SessionGapUs, 1).otherwise(0)
    Tables.events(s, dir)
      .withColumn("is_new", isNew)
      .withColumn("session_idx",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        date_format(min(col("ts")), tsFmt).as("session_start"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  // ---------------------------------------------------------------
  // INTERVAL JOIN via BIN EXPANSION — the range-only join Spark has
  // no native operator for (no equi key: "how many OTHER users'
  // events landed inside my session's [start, end]?"). The naive
  // form is a cartesian with a range filter; the scale pattern is:
  // expand each interval to the fixed-width time bins it covers
  // (duration/1h + 1 rows — bounded by the 30-min-gap session
  // construction), map each event to its ONE bin, and equi-join on
  // the bin before the exact containment filter. Every event has
  // exactly one bin, so no post-join dedup is needed; the shuffle
  // moves fixed-width (bin, µs, cents) rows, never payloads. A
  // hot-hour bin is the documented skew point — the
  // maint_salted_from_stats machinery applies unchanged if one bin
  // dominates. Sessions with zero concurrent events are restored by
  // the final session-table-sized left join. Money flows as integer
  // cents (per-group sums are small, cents keep them
  // order-independent anyway); the oracle is DuckDB's plain
  // theta-join form of the same query.
  private val HourUs = 3600000000L

  def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
    val isNew = when(gapUs.isNull || gapUs > SessionGapUs, 1).otherwise(0)
    val sess = Tables.events(s, dir)
      .withColumn("is_new", isNew)
      .withColumn("session_idx",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .localCheckpoint() // feeds bin expansion AND the zero-restore join
    val bins = sess.select(col("user_id").as("s_user"), col("session_idx"),
      col("start_us"), col("end_us"),
      explode(sequence(expr(s"start_us div $HourUs"), expr(s"end_us div $HourUs"))).as("bin"))
    val ev = Tables.events(s, dir).select(col("user_id").as("e_user"),
        unix_micros(col("ts")).as("t_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .withColumn("bin", expr(s"t_us div $HourUs"))
    val hits = ev.join(bins,
        ev("bin") === bins("bin") && col("t_us") >= col("start_us")
          && col("t_us") <= col("end_us") && col("e_user") =!= col("s_user"))
      .groupBy(col("s_user").as("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("cents"))
    sess.join(hits, Seq("user_id", "session_idx"), "left")
      .select(col("user_id"), col("session_idx"),
        date_format(timestamp_micros(col("start_us")), tsFmt).as("session_start"),
        coalesce(col("n"), lit(0L)).as("n_concurrent"),
        coalesce(col("cents"), lit(0L)).as("cents_concurrent"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  val qIntervalJoinSql: String =
    s"""WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       |  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
       |g AS (SELECT user_id, event_id, ts,
       |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |         OR date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > $SessionGapUs
       |       THEN 1 ELSE 0 END AS is_new
       |  FROM ev),
       |sx AS (SELECT user_id, ts,
       |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
       |  FROM g),
       |sess AS MATERIALIZED (SELECT user_id, session_idx, min(ts) AS start_ts, max(ts) AS end_ts
       |  FROM sx GROUP BY user_id, session_idx),
       |hits AS (SELECT se.user_id, se.session_idx, count(*) AS n, sum(e.vc) AS cents
       |  FROM sess se JOIN ev e
       |    ON e.ts BETWEEN se.start_ts AND se.end_ts AND e.user_id <> se.user_id
       |  GROUP BY se.user_id, se.session_idx)
       |SELECT se.user_id, se.session_idx,
       |  strftime(se.start_ts, '$duckFmt') AS session_start,
       |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_concurrent,
       |  CAST(coalesce(h.cents, 0) AS BIGINT) AS cents_concurrent
       |FROM sess se LEFT JOIN hits h USING (user_id, session_idx)
       |ORDER BY user_id, session_idx""".stripMargin

  val qSessionizeSql: String =
    s"""WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
       |g AS (SELECT user_id, event_id, ts,
       |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |         OR date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > $SessionGapUs
       |       THEN 1 ELSE 0 END AS is_new
       |  FROM ev),
       |s AS (SELECT user_id, ts,
       |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
       |  FROM g)
       |SELECT user_id, session_idx,
       |  strftime(min(ts), '$duckFmt') AS session_start,
       |  count(*) AS n_events,
       |  date_diff('microsecond', min(ts), max(ts)) AS duration_us
       |FROM s GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  // ---------------------------------------------------------------
  // sessionization via Spark's built-in session_window — the same
  // 30-minute-gap semantics as [[qSessionize]] expressed as a gap
  // session window aggregation (the form that runs unchanged as a
  // stateful streaming query). Oracle: the lag+cumsum SQL, aggregated
  // to the same shape.
  def qSessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        date_format(min(col("ts")), tsFmt).as("session_start"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"))
      .select(col("user_id"), col("session_start"), col("n_events"), col("duration_us"))
      .orderBy(col("user_id"), col("session_start"))

  val qSessionWindowSql: String =
    s"""WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
       |g AS (SELECT user_id, event_id, ts,
       |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |         OR date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) >= $SessionGapUs
       |       THEN 1 ELSE 0 END AS is_new
       |  FROM ev),
       |s AS (SELECT user_id, ts,
       |  sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
       |  FROM g)
       |SELECT user_id,
       |  strftime(min(ts), '$duckFmt') AS session_start,
       |  count(*) AS n_events,
       |  date_diff('microsecond', min(ts), max(ts)) AS duration_us
       |FROM s GROUP BY user_id, session_idx
       |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------
  // ROLLING per-entity features — the feature-engineering projection
  // a training pipeline derives from an event stream: previous value
  // (lag), 5-event rolling mean, and inter-event gap, per user in
  // event-time order. One shuffle on user_id; all three window
  // functions share the same (partition, order) spec, so Catalyst
  // plans a single exchange + sort feeding stacked Window operators —
  // the per-key work is a linear scan, horizontally parallel in the
  // number of users at any scale. First-event rows carry NULL
  // lag/gap (both engines agree; the presentation sort never ties on
  // them — event_id is unique and non-null).
  //
  // roll_mean rounds at 4 dp: a ≤5-term running mean, the
  // self-cancelling class under the cross-engine double rules (not a
  // corpus-sized unordered sum).
  private val RollWindow = 5

  def qRolling(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wf = w.rowsBetween(-(RollWindow - 1), 0)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("lag_value", lag(col("value"), 1).over(w))
      .withColumn("roll_mean", round(avg(col("value")).over(wf), 4))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .select(col("event_id"), col("user_id"), date_format(col("ts"), tsFmt).as("ts"),
        col("value"), col("lag_value"), col("roll_mean"), col("gap_us"))
      .orderBy(col("event_id"))
  }

  val qRollingSql: String =
    s"""WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
       |r AS (SELECT event_id, user_id, ts, value,
       |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_value,
       |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN ${RollWindow - 1} PRECEDING AND CURRENT ROW), 4) AS roll_mean,
       |  date_diff('microsecond',
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_us
       |  FROM ev)
       |SELECT event_id, user_id, strftime(ts, '$duckFmt') AS ts, value,
       |  lag_value, roll_mean, gap_us
       |FROM r ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  // HOPPING (sliding) windows in batch — Spark's native
  // `window(ts, windowDuration, slideDuration)`: each event lands in
  // window/slide = 4 overlapping hourly windows, the moving-average
  // view a monitoring/feature pipeline reads. The generator explodes
  // each row into its 4 window assignments BEFORE the aggregation, so
  // the exchange carries (window, type, partial agg) — a map-side
  // partial aggregate over ~4·|windows|·|types| keys, independent of
  // event count. The oracle states the same window arithmetic in µs
  // integers (floor to slide, back off j slides, j < 4 — exactly
  // Spark's assignment because window = 4·slide).
  def qHopping(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"),
        col("n_events"),
        round(col("sum_value"), 2).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  val qHoppingSql: String =
    """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      |j AS (SELECT unnest(range(4)) AS j),
      |h AS (SELECT make_timestamp((epoch_us(ev.ts) // 900000000) * 900000000
      |         - j.j * 900000000) AS ws, event_type, value FROM ev, j)
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
      |  count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM h GROUP BY window_start, event_type ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------
  // EXPONENTIAL MOVING AVERAGE (dyadic, exact) — the per-user
  // recency-weighted spend signal feature stores ship next to RFM:
  // s_i = s_{i-1}/2 + x_i/2 over each user's last 8 events in time
  // order (seeded s_1 = oldest x in the window). The recursion is
  // ungateable as floats (association-dependent), but with α = 1/2
  // every weight is DYADIC — the closed form over the k ≤ 8 window
  // rows is w(most-recent-rank r) = 2^-r, except the oldest row
  // (r = k) which carries the seed's 2^-(k-1) — and ×128 (the LCM
  // denominator 2^7) every weight is an exact integer. Values ride
  // as exact cents, so the gated ewma_x128_cents is a plain BIGINT
  // dot product: no recursion, no floats, no -0.0 class.
  //
  // Scale shape: ONE per-user window (row_number over ts DESC) and a
  // plain aggregate — the oldest-row weight correction is applied
  // POST-agg from (max rn, max_by(vc, rn)) rather than via a second
  // count-over-partition window, so the plan carries one sort
  // exchange on user_id and nothing else.
  private val EwmaK = 8

  def qEwma(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_id"),
      round(col("value") * 100).cast("long").as("vc"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= EwmaK)
      .groupBy(col("user_id"))
      .agg(max(col("rn")).cast("long").as("n_win"),
        sum(expr("vc * shiftright(128, rn)")).as("base"),
        expr("max_by(vc, rn)").as("ov"))
      .select(col("user_id"), col("n_win"),
        expr("base + ov * (shiftright(128, cast(n_win as int) - 1) - shiftright(128, cast(n_win as int)))")
          .cast("long").as("ewma_x128_cents"))
      .orderBy(col("user_id"))
  }

  val qEwmaSql: String =
    s"""WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id,
       |  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
       |r AS (SELECT user_id, vc,
       |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM e),
       |k8 AS (SELECT * FROM r WHERE rn <= $EwmaK),
       |a AS (SELECT user_id, CAST(max(rn) AS BIGINT) AS n_win,
       |  sum(vc * (128 >> rn)) AS base, max_by(vc, rn) AS ov
       |  FROM k8 GROUP BY 1)
       |SELECT user_id, n_win,
       |  CAST(base + ov * ((128 >> (n_win - 1)) - (128 >> n_win)) AS BIGINT) AS ewma_x128_cents
       |FROM a ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // Z-SCORE outlier detection — the monitoring pass a pipeline runs
  // over an event stream: flag events whose value sits ≥3 standard
  // deviations from their type's mean. Cross-engine determinism via
  // INTEGER moments: values are exact cents (round(value·100) as
  // BIGINT), so per-type Σv and Σv² are order-free integer sums —
  // no unordered float accumulation anywhere; mean/variance/z are
  // then a fixed chain of exact-input double ops identical in both
  // engines (the same rational-moments dodge as text_diversity).
  //
  // Scale shape: pass 1 is a map-side partial aggregate to |types|
  // rows; the tiny stats table broadcasts back onto the scan where
  // the z filter is row-local — two column-pruned scans, zero corpus
  // shuffles (the same two-pass shape as samp_temperature).
  private val AnomalyZ = 3.0

  def qAnomaly(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("vc", round(col("value") * 100).cast("long"))
    val stats = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"), sum(col("vc")).as("sc"),
      sum(col("vc") * col("vc")).as("ssc"))
    val mean = col("sc").cast("double") / col("n")
    val variance =
      (col("ssc").cast("double") - col("sc").cast("double") * col("sc").cast("double") / col("n")) / col("n")
    val z = (col("vc") - mean) / sqrt(variance)
    ev.join(broadcast(stats), "event_type")
      .withColumn("z", z)
      .filter(abs(col("z")) >= AnomalyZ)
      .select(col("event_id"), col("event_type"), col("value"), round(col("z"), 4).as("z_score"))
      .orderBy(col("event_id"))
  }

  val qAnomalySql: String =
    s"""WITH c AS (SELECT event_id, event_type, value,
       |  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
       |s AS (SELECT event_type, count(*) AS n, sum(vc) AS sc, sum(vc * vc) AS ssc
       |  FROM c GROUP BY event_type),
       |z AS (SELECT c.event_id, c.event_type, c.value,
       |  (c.vc - sc::DOUBLE / n) / sqrt((ssc::DOUBLE - sc::DOUBLE * sc::DOUBLE / n) / n) AS z
       |  FROM c JOIN s USING (event_type))
       |SELECT event_id, event_type, value, round(z, 4) AS z_score
       |FROM z WHERE abs(z) >= $AnomalyZ ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  // FUNNEL analysis — the ordered-step conversion query every event
  // pipeline runs: per user, the first `view`, the first `click`
  // STRICTLY AFTER that view, the first `purchase` strictly after
  // that click; emit per-stage user counts and the mean microsecond
  // gap from the previous stage. Sequential dependence (each stage's
  // cutoff is the previous stage's timestamp) is expressed as a chain
  // of filter → groupBy(user) → equi-join legs: every leg shuffles
  // only on user_id, so the three joins co-partition on one key and
  // the event_type filters push to the scan. The stage rows are
  // single-row partial aggregates (map-side combine to 1 row).
  //
  // mean_gap_us: Σgap is an exact BIGINT sum (order-free); the one
  // division is floor(exact::DOUBLE / n) — identical both engines.
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_type"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2.select(col("user_id"), col("t2")), "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"), min(col("t2")).as("t2"))
    def stageRow(df: DataFrame, stage: String, gapUs: Option[Column]): DataFrame =
      df.agg(
        count(lit(1)).as("n_users"),
        gapUs.map(g => floor(sum(g).cast("double") / count(lit(1))).cast("long"))
          .getOrElse(lit(null).cast("long")).as("mean_gap_us"))
        .select(lit(stage).as("stage"), col("n_users"), col("mean_gap_us"))
    stageRow(t1, "1_view", None)
      .unionAll(stageRow(t2, "2_click",
        Some(unix_micros(col("t2")) - unix_micros(col("t1")))))
      .unionAll(stageRow(t3, "3_purchase",
        Some(unix_micros(col("t3")) - unix_micros(col("t2")))))
      .orderBy(col("stage"))
  }

  val qFunnelSql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      |t1 AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, min(e.ts) AS t2, min(t1.t1) AS t1
      |  FROM ev e JOIN t1 ON e.user_id = t1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, min(e.ts) AS t3, min(t2.t2) AS t2
      |  FROM ev e JOIN t2 ON e.user_id = t2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id)
      |SELECT * FROM (
      |  SELECT '1_view' AS stage, count(*) AS n_users, CAST(NULL AS BIGINT) AS mean_gap_us FROM t1
      |  UNION ALL
      |  SELECT '2_click', count(*),
      |    CAST(floor(sum(date_diff('microsecond', t1, t2))::DOUBLE / count(*)) AS BIGINT) FROM t2
      |  UNION ALL
      |  SELECT '3_purchase', count(*),
      |    CAST(floor(sum(date_diff('microsecond', t2, t3))::DOUBLE / count(*)) AS BIGINT) FROM t3
      |) ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------
  // COHORT RETENTION — weekly cohorts (week of a user's first event)
  // by activity-week offset: the standard retention triangle. Two
  // aggregates over one scan — per-user first week, and the distinct
  // (user, week) activity set — joined back on user_id; every
  // exchange is on user_id or the tiny (cohort, offset) result keys.
  // Week arithmetic is pure integers (both engines truncate to
  // Monday 00:00 UTC; offsets are exact multiples of 7 days — no DST
  // in UTC), so the gate has no float anywhere.
  def qRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
    val firstW = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cw"))
    val act = ev.select(col("user_id"), date_trunc("week", col("ts")).as("aw")).distinct()
    firstW.join(act, "user_id")
      .groupBy(
        date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        ((unix_micros(col("aw")) - unix_micros(col("cw"))) / lit(604800000000L))
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val qRetentionSql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw FROM ev GROUP BY user_id),
      |act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM ev)
      |SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
      |  CAST(date_diff('day', f.cw, a.aw) // 7 AS BIGINT) AS week_offset,
      |  count(*) AS n_users
      |FROM f JOIN act a ON f.user_id = a.user_id
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  // ---------------------------------------------------------------
  // RESAMPLE + FORWARD-FILL — the time-series regularization step
  // (sensor/metric pipelines): a 6-hour grid per event type where
  // each tick carries the last observed value at-or-before it
  // (NULL before the first observation — q31's gap-fill zero-fills
  // COUNTS; forward-fill is the right semantics for sampled VALUES).
  // Same scalable shape as [[qAsofJoin]]: union grid ticks into the
  // event stream, one shuffle on the partition key, and a running
  // `last(value, ignoreNulls)` carries the fill — no correlated
  // lookup, no per-tick join; DuckDB states the same semantics as a
  // correlated LIMIT 1 (tiebreak event_id so engines agree at equal
  // timestamps). NULL-valued observations are dropped on BOTH sides
  // up front: Spark's ignoreNulls would skip a NULL observation and
  // carry the older value while the correlated LIMIT 1 would return
  // the newest row's NULL — filtering them makes the stated
  // last-non-null semantics identical in the two engines.
  def qResampleFfill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts"), col("value"), col("event_id"))
    val grid = ev.agg(date_trunc("day", min(col("ts"))).as("lo"), max(col("ts")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 6 hours"))).as("gts"))
      .crossJoin(ev.select(col("event_type")).distinct())
    val tagged = ev
      .select(col("event_type"), col("ts"), col("value"), lit(0).as("side"), col("event_id"))
      .unionAll(grid.select(col("event_type"), col("gts").as("ts"),
        lit(null).cast("double").as("value"), lit(1).as("side"),
        lit(Long.MaxValue).as("event_id")))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged.withColumn("ffill", last(col("value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("grid_ts"),
        round(col("ffill"), 2).as("value_ffill"))
      .orderBy(col("event_type"), col("grid_ts"))
  }

  val qResampleFfillSql: String =
    """WITH ev AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value, event_id
      |  FROM events WHERE value IS NOT NULL),
      |b AS (SELECT date_trunc('day', min(ts)) AS lo, max(ts) AS hi FROM ev),
      |grid AS (SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
      |  INTERVAL 6 HOUR)) AS gts),
      |types AS (SELECT DISTINCT event_type FROM ev)
      |SELECT t.event_type, strftime(g.gts, '%Y-%m-%d %H:%M:%S') AS grid_ts,
      |  round((SELECT e.value FROM ev e
      |         WHERE e.event_type = t.event_type AND e.ts <= g.gts
      |         ORDER BY e.ts DESC, e.event_id DESC LIMIT 1), 2) AS value_ffill
      |FROM grid g CROSS JOIN types t
      |ORDER BY event_type, grid_ts""".stripMargin

  // ---------------------------------------------------------------
  // SILENT-GAP DETECTOR — the pipeline-health monitor over event
  // streams: per event type, the largest gap between consecutive
  // events and when it started (a data outage, an upstream stall, a
  // source decommission). One lag window per type (single shuffle on
  // the type key), exact integer µs, earliest-start tiebreak on
  // equal gaps so both engines pick the same row.
  def qGapDetector(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .select(col("event_type"),
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("gap_us"),
        unix_micros(col("prev_ts")).as("gap_start_us"))
    val wBest = Window.partitionBy(col("event_type"))
      .orderBy(col("gap_us").desc, col("gap_start_us"))
    gaps.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("gap_us"), col("gap_start_us"))
      .orderBy(col("event_type"))
  }

  val qGapDetectorSql: String =
    """WITH ev AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
      |g AS (SELECT event_type,
      |  epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us,
      |  epoch_us(lag(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id)) AS gap_start_us
      |  FROM ev),
      |r AS (SELECT event_type, gap_us, gap_start_us,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap_us DESC, gap_start_us) AS rn
      |  FROM g WHERE gap_us IS NOT NULL)
      |SELECT event_type, CAST(gap_us AS BIGINT) AS gap_us,
      |  CAST(gap_start_us AS BIGINT) AS gap_start_us
      |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // CHURN LABEL GENERATION — supervised-label derivation, the step
  // between raw events and any retention model's training set: a
  // user churns if their last activity precedes the observation
  // horizon (corpus max ts − 12 h; chosen so the test data splits
  // the classes — 40/150 at the gate SF). Two aggregates: the
  // per-user last-activity rollup (one shuffle on user_id) and a
  // single-row global max that broadcasts back — the same two-pass
  // map-side shape as temporal_anomaly. The label compare is exact
  // integer µs on both engines.
  private val ChurnHorizonUs = 12L * 3600 * 1000000

  def qChurnLabel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
    val mx = ev.agg(max(col("ts")).as("m"))
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("lt"))
      .crossJoin(broadcast(mx))
      .select(col("user_id"), col("n_events"),
        date_format(col("lt"), tsFmt).as("last_ts"),
        when(unix_micros(col("lt")) < unix_micros(col("m")) - ChurnHorizonUs, 1L)
          .otherwise(0L).as("churn_label"))
      .orderBy(col("user_id"))
  }

  val qChurnLabelSql: String =
    s"""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
       |mx AS (SELECT max(ts) AS m FROM ev),
       |u AS (SELECT user_id, count(*) AS n_events, max(ts) AS lt FROM ev GROUP BY user_id)
       |SELECT user_id, n_events, strftime(lt, '$duckFmt') AS last_ts,
       |  CAST(CASE WHEN epoch_us(lt) < epoch_us(m) - $ChurnHorizonUs THEN 1 ELSE 0 END AS BIGINT) AS churn_label
       |FROM u, mx ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // DISTRIBUTION DRIFT between two time halves of the event stream —
  // the monitoring query every production ingest runs: has the
  // event-type mix shifted between the reference window and the live
  // window? The statistic is the per-type chi-square contribution,
  // kept EXACT: with Laplace-smoothed counts r (reference half) and
  // o (live half) and totals R, L, the per-type term
  // (o − r·L/R)²/(r·L/R) equals (o·R − r·L)² / (R·r·L) — emitted as
  // an integer ppm via wide arithmetic (DECIMAL(38,0)/HUGEINT: the
  // squared cross term passes Long already at ~1e5-row windows; the
  // wide form is exact to |o·R − r·L| < 1e16, i.e. ~1e8-event
  // windows — a deployment beyond that pre-scales counts to
  // per-million rates before the chi-square, the standard practice
  // for the statistic itself). No libm
  // anywhere: chi-square IS rational, which is why it gates where
  // PSI (needs ln) cannot. A type is flagged when its contribution
  // exceeds [[DriftThresholdPpm]] (2.0, ≈ the χ²(1df) 85th
  // percentile — the scale where a shift stops being count noise).
  //
  // Scale shape: one scan → two partial-agg count tables keyed by
  // the low-cardinality event_type; totals are 1-row broadcasts; the
  // full-corpus work is one groupBy. The midpoint split is a 1-row
  // metadata agg (at scale the window boundaries come from the
  // scheduler, not the data).
  // contribution > 2.0 — roughly the χ²(1df) 85th percentile, the
  // per-type scale where a shift stops being count noise (the sf0.01
  // corpus puts one type at 2.16 and the rest ≤0.72). Shared with
  // [[graft.streaming.Streams.qStreamDrift]].
  private[graft] val DriftThresholdPpm = 2000000L

  def qDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val b = ev.agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi")).first()
    val mid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    val cnt = ev
      .groupBy(col("event_type"))
      .agg(
        (sum(when(col("ts_us") < mid, 1L).otherwise(0L)) + 1L).cast("long").as("r_cnt"),
        (sum(when(col("ts_us") >= mid, 1L).otherwise(0L)) + 1L).cast("long").as("o_cnt"))
    val tot = cnt.agg(sum(col("r_cnt")).cast("long").as("rt"),
      sum(col("o_cnt")).cast("long").as("lt"))
    cnt.crossJoin(broadcast(tot))
      .withColumn("d", expr(
        "cast(o_cnt as decimal(38,0)) * rt - cast(r_cnt as decimal(38,0)) * lt"))
      .select(col("event_type"), col("r_cnt"), col("o_cnt"),
        expr("(cast(1000000 as decimal(38,0)) * d * d) div " +
          "(cast(rt as decimal(38,0)) * r_cnt * lt)").as("contrib_ppm"))
      .withColumn("drifted",
        when(col("contrib_ppm") > DriftThresholdPpm, 1L).otherwise(0L))
      .orderBy(col("event_type"))
  }

  val qDriftSql: String =
    s"""WITH ev AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
       |b AS (SELECT min(ts_us) AS lo, max(ts_us) AS hi FROM ev),
       |m AS (SELECT lo + (hi - lo) // 2 AS mid FROM b),
       |cnt AS (SELECT event_type,
       |    CAST(count(*) FILTER (WHERE ts_us < mid) AS BIGINT) + 1 AS r_cnt,
       |    CAST(count(*) FILTER (WHERE ts_us >= mid) AS BIGINT) + 1 AS o_cnt
       |  FROM ev CROSS JOIN m GROUP BY event_type),
       |tot AS (SELECT CAST(sum(r_cnt) AS BIGINT) AS rt, CAST(sum(o_cnt) AS BIGINT) AS lt FROM cnt),
       |sc AS (SELECT event_type, r_cnt, o_cnt,
       |    o_cnt::HUGEINT * rt - r_cnt::HUGEINT * lt AS d,
       |    rt, lt
       |  FROM cnt CROSS JOIN tot)
       |SELECT event_type, r_cnt, o_cnt,
       |  CAST((1000000::HUGEINT * d * d) // (rt::HUGEINT * r_cnt * lt) AS BIGINT) AS contrib_ppm,
       |  CASE WHEN (1000000::HUGEINT * d * d) // (rt::HUGEINT * r_cnt * lt) > $DriftThresholdPpm
       |       THEN 1::BIGINT ELSE 0::BIGINT END AS drifted
       |FROM sc ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // MARKOV TRANSITION MATRIX — the first-order behavioral model of
  // the event stream: for each (from_type → to_type) step in a
  // user's time-ordered sequence, the count and the row-normalized
  // transition probability in exact per-mille. This is the sequence
  // audit a pipeline reads before session modeling: self-loop mass =
  // burstiness per type, the view→click / click→purchase cells are
  // the funnel's local form, and a drifted matrix between snapshots
  // is the cheapest behavioral-change alarm. Scale shape: ONE
  // user-partitioned lead() window (the sessionize exchange — no
  // global window anywhere), a map-side-combined count to the
  // |types|² matrix, and the row totals via a window hosted on that
  // metadata-sized frame. Probabilities gate as integer `div`
  // per-mille (non-negative operands).
  def qMarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"))
    steps.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"), col("row_total"),
        expr("1000 * n div row_total").as("p_pm"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val qMarkovTransitionsSql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events),
      |st AS (SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM ev),
      |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM st WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
      |  CAST(1000 * n // (sum(n) OVER (PARTITION BY from_type)) AS BIGINT) AS p_pm
      |FROM c ORDER BY from_type, to_type""".stripMargin

  // ---------------------------------------------------------------
  // DAILY-SERIES AUTOCORRELATION — the time-series health statistic
  // behind [[qSeasonality]]'s profile: Pearson correlation of each
  // event type's daily count series against itself at lag 1 (daily
  // momentum) and lag 7 (weekly rhythm). A strong lag-7 / weak lag-1
  // pattern is weekly seasonality; both collapsing to ~0 on a
  // snapshot that used to show rhythm means the upstream producer's
  // clock or sampling broke — the alarm this audit exists for.
  // Lagged pairs come from an equi-join of the daily-count table
  // against itself on (type, day+lag) — no global window, gaps
  // pair nothing by construction; the q35 exact-moment discipline
  // (DECIMAL/HUGEINT sums, one fixed double chain, 4-dp round), with
  // degenerate (constant) series filtered out in exact decimal on
  // both engines so no NaN ever gates. Scale shape: the corpus
  // collapses map-side to |types|·|days| rows; everything after is
  // metadata.
  def qAutocorr(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // tiny; feeds both sides of both lag joins
    val m = Seq(1, 7).map { lg =>
      val a = daily.select(col("event_type"),
        expr(s"timestampadd(DAY, $lg, day)").as("jday"), col("cnt").as("x"))
      val b = daily.select(col("event_type"), col("day").as("jday"), col("cnt").as("y"))
      a.join(b, Seq("event_type", "jday"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          // widen-then-multiply (oracle: x::HUGEINT * y) — a daily
          // count > ~3e9 would wrap the raw BIGINT product here only
          sum(col("x").cast(dec) * col("y")).as("sxy"),
          sum(col("x").cast(dec) * col("x")).as("sxx"),
          sum(col("y").cast(dec) * col("y")).as("syy"))
        .withColumn("lag_days", lit(lg.toLong))
    }.reduce(_ unionAll _)
    val nD = col("n").cast("double")
    val (sx, sy, sxy, sxx, syy) = (col("sx").cast("double"), col("sy").cast("double"),
      col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
    m.filter(expr("cast(n as decimal(38,0)) * sxx - sx * sx > 0") &&
        expr("cast(n as decimal(38,0)) * syy - sy * sy > 0"))
      .select(col("event_type"), col("lag_days"), col("n").as("n_pairs"),
        // + 0.0: IEEE -0.0 normalization (sign-capable correlation;
        // mirrored in the oracle — r11 ml_corr_pairs lesson)
        (round((nD * sxy - sx * sy) /
          (sqrt(nD * sxx - sx * sx) * sqrt(nD * syy - sy * sy)), 4) + lit(0.0))
          .as("autocorr"))
      .orderBy(col("event_type"), col("lag_days"))
  }

  val qAutocorrSql: String =
    """WITH daily AS MATERIALIZED (SELECT event_type,
      |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |    CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT a.event_type, 1 AS lag_days, a.cnt AS x, b.cnt AS y
      |  FROM daily a JOIN daily b ON a.event_type = b.event_type AND b.day = a.day + INTERVAL 1 DAY
      |  UNION ALL
      |  SELECT a.event_type, 7, a.cnt, b.cnt
      |  FROM daily a JOIN daily b ON a.event_type = b.event_type AND b.day = a.day + INTERVAL 7 DAY),
      |m AS (SELECT event_type, lag_days, count(*) AS n,
      |    sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy, sum(x::HUGEINT * y) AS sxy,
      |    sum(x::HUGEINT * x) AS sxx, sum(y::HUGEINT * y) AS syy
      |  FROM p GROUP BY 1, 2)
      |SELECT event_type, CAST(lag_days AS BIGINT) AS lag_days, CAST(n AS BIGINT) AS n_pairs,
      |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
      |    (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
      |     sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 4) + 0.0 AS autocorr
      |FROM m WHERE n::HUGEINT * sxx - sx * sx > 0 AND n::HUGEINT * syy - sy * sy > 0
      |ORDER BY event_type, lag_days""".stripMargin

  // ---------------------------------------------------------------
  // CUSUM CHANGE-POINT DETECTOR — the classical sequential
  // mean-shift alarm on each event type's observed-day count series
  // (the drift detector a producer-health monitor runs per source).
  // The textbook recurrence S⁺_t = max(0, S⁺_{t-1} + (x_t − μ))
  // looks inherently sequential, but collapses to window algebra via
  // the prefix identity S⁺_t = P_t − min(0, min_{j≤t} P_j) (and the
  // mirrored S⁻ with max), where P is the running sum of deviations.
  // Exactness: deviations are scaled by n_days — d_t = nd·x_t − tot
  // — so μ never divides anything; every gated value is an integer
  // (the ml_gini_split no-division discipline). Alarms fire when the
  // scaled statistic exceeds $CusumK·tot ⇔ raw CUSUM > $CusumK·μ·nd/nd
  // … i.e. k mean-days of accumulated excess. Scale shape: corpus
  // collapses map-side to the |types|·|days| daily table; both
  // windows are type-partitioned metadata windows (the qAutocorr
  // class). Window sums of BIGINT ride decimal only on the oracle
  // side (HUGEINT) and re-cast — magnitudes are nd·x ≤ ~4e13 at
  // 1e11 rows/type, wrap-free.
  private val CusumK = 2L // alarm at > 2 mean-days of excess
  def qCusum(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val wt = Window.partitionBy(col("event_type"))
    val wp = wt.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("nd", count(lit(1)).over(wt))
      .withColumn("tot", sum(col("cnt")).over(wt))
      .withColumn("p", sum(col("nd") * col("cnt") - col("tot")).over(wp))
      .withColumn("s_up", col("p") - least(lit(0L), min(col("p")).over(wp)))
      .withColumn("s_dn", greatest(lit(0L), max(col("p")).over(wp)) - col("p"))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cnt"), col("nd").as("n_days"), col("s_up"), col("s_dn"),
        when(col("s_up") > lit(CusumK) * col("tot"), 1L).otherwise(0L).as("alarm_up"),
        when(col("s_dn") > lit(CusumK) * col("tot"), 1L).otherwise(0L).as("alarm_dn"))
      .orderBy(col("event_type"), col("day"))
  }

  val qCusumSql: String =
    s"""WITH daily AS (SELECT event_type,
       |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       |    CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
       |t AS (SELECT event_type, day, cnt,
       |  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd,
       |  CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS tot
       |  FROM daily),
       |p AS (SELECT event_type, day, cnt, nd, tot,
       |  CAST(sum(nd * cnt - tot) OVER (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
       |  FROM t),
       |s AS (SELECT event_type, day, cnt, nd, tot, p,
       |  p - least(0, CAST(min(p) OVER (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)) AS s_up,
       |  greatest(0, CAST(max(p) OVER (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)) - p AS s_dn
       |  FROM p)
       |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt, nd AS n_days,
       |  s_up, s_dn,
       |  CASE WHEN s_up > $CusumK * tot THEN 1::BIGINT ELSE 0::BIGINT END AS alarm_up,
       |  CASE WHEN s_dn > $CusumK * tot THEN 1::BIGINT ELSE 0::BIGINT END AS alarm_dn
       |FROM s ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------
  // RFM SEGMENTATION — the recency/frequency/monetary quintile grid,
  // the classical user-value segmentation every growth/curation
  // pipeline derives from an event log. Per purchasing user: recency
  // = whole days from their last purchase to the corpus's latest
  // purchase (exact µs div), frequency = purchase count, monetary =
  // Σ⌊value·100⌋ integer cents (the moneySum discipline — floor, not
  // round: identical on identical doubles). Each metric is cut into
  // EXACT quintiles at ranks ⌈k·n/5⌉ under the total order
  // (metric, user_id) — the tiebreak makes the cut unambiguous on
  // ties, so both engines place every user identically. Scores 1–5
  // (recency inverted: recent = 5); gated output = the ≤125-row
  // segment grid with user counts and segment revenue as a
  // DECIMAL(38,0)-backed string (no wrap horizon).
  //
  // Scale shape: one map-side-combined per-user aggregate collapses
  // the corpus; the 12 quintile thresholds come from the distributed
  // [[OrderStats]] exact-rank path (range exchange + partition-local
  // scans — no corpus-global sort window); scoring is a broadcast
  // compare against 12 threshold literals; the final grid is a tiny
  // partial agg. Driver traffic: 12 one-row rank fetches + one max.
  def qRfm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("r_score", LongType), StructField("f_score", LongType),
      StructField("m_score", LongType), StructField("n_users", LongType),
      StructField("money_cents", StringType)))
    val pu = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100).cast("long").as("cents"))
    val agg = pu.groupBy(col("user_id"))
      .agg(count(lit(1)).as("freq"), sum(col("cents")).as("money"),
        max(col("us")).as("last_us"))
      .localCheckpoint()
    val muRow = agg.agg(max(col("last_us"))).first()
    if (muRow.isNullAt(0)) // degenerate-input rule: no purchases
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    val mu = muRow.getLong(0)
    val users = agg.select(col("user_id"),
        expr(s"(${mu}L - last_us) div 86400000000").as("rec"),
        col("freq"), col("money"))
      .localCheckpoint()
    // quintile thresholds per metric: ranks ceil(k*n/5), k = 1..4,
    // under (metric, user_id); a user's quintile = 1 + #{thresholds
    // strictly below them in that order}
    def quintile(metric: String): Column = {
      val r = OrderStats.rank(users.select(col(metric), col("user_id")),
        Seq(metric, "user_id"))
      val n = r.total
      // all 4 cut ranks in ONE fetch job (OrderStats.kths, r18) —
      // this metric's thresholds previously cost 4 scheduled jobs
      val cuts = OrderStats.kths(r, (1 to 4).map(k => (k * n + 4) / 5))
      (1 to 4).foldLeft(lit(1L)) { (acc, k) =>
        val t = cuts((k * n + 4) / 5)
        val (tv, tu) = (t.getLong(0), t.getLong(1))
        acc + when(col(metric) > tv ||
          (col(metric) === tv && col("user_id") > tu), 1L).otherwise(0L)
      }
    }
    users
      .select((lit(6L) - quintile("rec")).as("r_score"),
        quintile("freq").as("f_score"), quintile("money").as("m_score"),
        col("money"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("money").cast("decimal(38,0)")).cast("string").as("money_cents"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  val qRfmSql: String = {
    val ths = (for (m <- Seq("rec", "freq", "money"); k <- 1 to 4) yield
      s"""t$m$k AS (SELECT $m AS tv, user_id AS tu FROM u ORDER BY $m, user_id
         |  LIMIT 1 OFFSET ((SELECT ($k*n+4)//5 FROM nn) - 1))""".stripMargin)
      .mkString(",\n")
    def score(m: String) = (1 to 4).map(k =>
      s"(CASE WHEN u.$m > t$m$k.tv OR (u.$m = t$m$k.tv AND u.user_id > t$m$k.tu)" +
        " THEN 1 ELSE 0 END)").mkString(" + ")
    val crosses = (for (m <- Seq("rec", "freq", "money"); k <- 1 to 4)
      yield s"t$m$k").mkString(", ")
    s"""WITH pu AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
       |  CAST(floor(value * 100) AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |agg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS freq,
       |  CAST(sum(cents) AS BIGINT) AS money, max(epoch_us(ts)) AS last_us
       |  FROM pu GROUP BY 1),
       |mx AS (SELECT max(last_us) AS mu FROM agg),
       |u AS (SELECT user_id, CAST((mu - last_us) // 86400000000 AS BIGINT) AS rec,
       |  freq, money FROM agg, mx),
       |nn AS (SELECT count(*) AS n FROM u),
       |$ths,
       |sc AS (SELECT u.user_id, u.money,
       |  CAST(6 - (1 + ${score("rec")}) AS BIGINT) AS r_score,
       |  CAST(1 + ${score("freq")} AS BIGINT) AS f_score,
       |  CAST(1 + ${score("money")} AS BIGINT) AS m_score
       |  FROM u, $crosses)
       |SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(CAST(sum(money) AS HUGEINT) AS VARCHAR) AS money_cents
       |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  // ---------------------------------------------------------------
  // INTER-EVENT GAP QUANTILES — per-user activity-velocity features
  // (exact lower median + p90 of the µs gap between consecutive
  // events): the abuse-detection / bot-scoring feature table — a
  // human's median gap is minutes, a scripted client's is
  // milliseconds, and p90/median spread separates bursty humans from
  // constant-rate automation. Exactness: gaps are integer µs; the
  // quantiles are ORDER STATISTICS at ceil-ranks (n+1)/2 and
  // ⌈9n/10⌉ under (gap, event_id) — no percentile_approx, no float
  // interpolation.
  //
  // Scale shape: every window is USER-partitioned (the lag, the
  // gap rank, the per-user count) — partition-local sorts behind one
  // shuffle on the key, nothing corpus-global; the rank pick
  // collapses to a per-user conditional aggregate. |users| rows out.
  def qGapMedian(s: SparkSession, dir: String): DataFrame = {
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val wRank = Window.partitionBy(col("user_id")).orderBy(col("gap"), col("event_id"))
    val wUser = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(wSeq))
      .filter(col("gap").isNotNull)
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wUser))
      .groupBy(col("user_id"))
      .agg(min(col("n")).as("n_gaps"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("gap"))).as("med_gap_us"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("gap"))).as("p90_gap_us"))
      .orderBy(col("user_id"))
  }

  val qGapMedianSql: String =
    """WITH ev AS (SELECT user_id, event_id,
      |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |g AS (SELECT user_id, event_id,
      |  us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
      |  FROM ev),
      |r AS (SELECT user_id, gap,
      |  row_number() OVER (PARTITION BY user_id ORDER BY gap, event_id) AS rn,
      |  count(*) OVER (PARTITION BY user_id) AS n
      |  FROM g WHERE gap IS NOT NULL)
      |SELECT user_id, CAST(min(n) AS BIGINT) AS n_gaps,
      |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS BIGINT) AS med_gap_us,
      |  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap END) AS BIGINT) AS p90_gap_us
      |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // DAU / WAU / MAU — the engagement KPI triple plus the DAU/MAU
  // stickiness ratio, with EXACT trailing-window distinct counts (no
  // approx_count_distinct, no HLL error bar on the company KPI). A
  // distinct-over-trailing-window is not decomposable as a window
  // aggregate, and the correlated range join the SQL form uses
  // (ud.d BETWEEN day-k AND day — the oracle's shape) plans as a
  // broadcast range join at best; the distributed-exact shape is the
  // CONTRIBUTION EXPLODE: the corpus collapses once to the distinct
  // (user, day) frame (checkpointed — three consumers), each pair
  // contributes to ≤ k target days, and dedup + count are ordinary
  // partial-aggregable exchanges over a users×days×k frame that is
  // activity-bounded, not corpus-bounded. Missing grid days emit
  // zero rows (LEFT joins against the full day sequence).
  def qDauWauMau(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("day", StringType), StructField("dau", LongType),
      StructField("wau", LongType), StructField("mau", LongType),
      StructField("stickiness_pm", LongType)))
    val ud = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct().localCheckpoint()
    val mm = ud.agg(min(col("d")), max(col("d"))).first()
    if (mm.isNullAt(0)) // degenerate-input rule: no events
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    val (lo, hi) = (mm.getDate(0), mm.getDate(1))
    val grid = s.range(1).select(
      explode(expr(s"sequence(to_date('$lo'), to_date('$hi'), interval 1 day)"))
        .as("day"))
    def trailing(k: Int, name: String) = ud
      .select(col("user_id"),
        explode(expr(s"sequence(d, date_add(d, ${k - 1}), interval 1 day)")).as("day"))
      .filter(col("day") <= lit(hi))
      .dropDuplicates("user_id", "day")
      .groupBy(col("day")).agg(count(lit(1)).as(name))
    val dau = ud.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau"))
    grid.join(dau, Seq("day"), "left")
      .join(trailing(7, "wau"), Seq("day"), "left")
      .join(trailing(28, "mau"), Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"),
        coalesce(col("mau"), lit(0L)).as("mau"))
      .withColumn("stickiness_pm",
        expr("case when mau > 0 then (1000 * dau) div mau else 0L end"))
      .orderBy(col("day"))
  }

  val qDauWauMauSql: String =
    """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
      |mm AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
      |g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM mm),
      |dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
      |wau AS (SELECT g.day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      |  FROM g JOIN ud ON ud.d BETWEEN g.day - 6 AND g.day GROUP BY 1),
      |mau AS (SELECT g.day, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      |  FROM g JOIN ud ON ud.d BETWEEN g.day - 27 AND g.day GROUP BY 1)
      |SELECT strftime(g.day, '%Y-%m-%d') AS day,
      |  CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
      |  CAST(coalesce(wau.wau, 0) AS BIGINT) AS wau,
      |  CAST(coalesce(mau.mau, 0) AS BIGINT) AS mau,
      |  CAST(CASE WHEN coalesce(mau.mau, 0) > 0
      |    THEN (1000 * coalesce(dau.dau, 0)) // mau.mau ELSE 0 END AS BIGINT)
      |    AS stickiness_pm
      |FROM g LEFT JOIN dau ON g.day = dau.day LEFT JOIN wau ON g.day = wau.day
      |LEFT JOIN mau ON g.day = mau.day ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // ACTIVE-DAY STREAKS — gaps-and-islands over each user's distinct
  // activity days: the engagement feature (longest consecutive-day
  // run, streak count) retention models and bot screens both read
  // (a 60-day unbroken streak at constant rate is automation; human
  // streaks break). The classical exact trick, no iteration: with
  // days ranked per user, epoch_day − rank is CONSTANT within a
  // consecutive island, so a groupBy on that anchor yields island
  // lengths. Scale shape: one user-partitioned distinct + window
  // (partition-local sort behind one key shuffle, nothing global),
  // then map-side island/summary aggregates; integers only.
  def qActiveStreaks(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val islands = days
      .withColumn("anchor",
        expr("datediff(d, date'1970-01-01')") - row_number().over(w))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"))
    islands.groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
      .orderBy(col("user_id"))
  }

  val qActiveStreaksSql: String =
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP)::DATE AS d FROM events),
      |rk AS (SELECT user_id, d,
      |  row_number() OVER (PARTITION BY user_id ORDER BY d) AS r FROM days),
      |isl AS (SELECT user_id, datediff('day', DATE '1970-01-01', d) - r AS anchor,
      |    CAST(count(*) AS BIGINT) AS len
      |  FROM rk GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
      |  CAST(max(len) AS BIGINT) AS longest_streak,
      |  CAST(count(*) AS BIGINT) AS n_streaks
      |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // GROWTH ACCOUNTING — the DAU decomposition every growth team
  // reads instead of a bare active count: each user-day is exactly
  // one of NEW (first day ever), RETAINED (active within the last
  // [[ResurrectGapDays]]−1 days), or RESURRECTED (returned after a
  // gap ≥ ResurrectGapDays) — so n_active = n_new + n_retained +
  // n_resurrected row-for-row, and a flat DAU curve decomposes into
  // churn being masked by acquisition (the signal this table
  // exists to expose). One lag() per user over distinct activity
  // days (partition-local sort behind one key shuffle), then a
  // map-side day rollup; integers only, threshold chosen against
  // the measured gap distribution (gaps reach 4–6 days at the gate
  // SFs, so ≥ 3 is exercised by the data, not vacuous).
  private val ResurrectGapDays = 3

  def qGrowthAccounting(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    days.withColumn("pd", lag(col("d"), 1).over(w))
      .select(col("d"),
        when(col("pd").isNull, "new")
          .when(datediff(col("d"), col("pd")) < ResurrectGapDays, "retained")
          .otherwise("resurrected").as("k"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("k") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("k") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("k") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
      .select(col("d").cast("string").as("day"), col("n_active"),
        col("n_new"), col("n_retained"), col("n_resurrected"))
      .orderBy(col("day"))
  }

  val qGrowthAccountingSql: String =
    s"""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP)::DATE AS d FROM events),
       |lagd AS (SELECT user_id, d, lag(d) OVER (PARTITION BY user_id ORDER BY d) AS pd
       |  FROM days),
       |cls AS (SELECT d, CASE WHEN pd IS NULL THEN 'new'
       |    WHEN datediff('day', pd, d) < $ResurrectGapDays THEN 'retained'
       |    ELSE 'resurrected' END AS k FROM lagd)
       |SELECT CAST(d AS VARCHAR) AS day, CAST(count(*) AS BIGINT) AS n_active,
       |  CAST(count(*) FILTER (k = 'new') AS BIGINT) AS n_new,
       |  CAST(count(*) FILTER (k = 'retained') AS BIGINT) AS n_retained,
       |  CAST(count(*) FILTER (k = 'resurrected') AS BIGINT) AS n_resurrected
       |FROM cls GROUP BY d ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // COHORT VALUE MATRIX — the revenue twin of [[qRetention]]: per
  // (signup-cohort week × week offset), purchase count and EXACT
  // revenue cents (the LTV build-up curve finance reads next to the
  // retention counts; a cohort whose users persist but stop spending
  // looks healthy in retention and sick here). Money goes through
  // integer cents (round(value·100) per row, the moneySum rule —
  // order-free, no double-sum association drift). Scale shape:
  // first-week table is one map-side min() per user; the value roll-
  // up joins it back on the user key and partial-aggregates to the
  // |cohorts|·|offsets| metadata grid.
  def qCohortValue(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"),
      col("event_type"), col("value"))
    val firstW = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cw"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).as("aw"),
        round(col("value") * 100).cast("long").as("cents"))
    purchases.join(firstW, "user_id")
      .groupBy(
        date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        ((unix_micros(col("aw")) - unix_micros(col("cw"))) / lit(604800000000L))
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("revenue_cents"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val qCohortValueSql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw FROM ev GROUP BY user_id),
      |p AS (SELECT user_id, date_trunc('week', ts) AS aw, cents FROM ev
      |  WHERE event_type = 'purchase')
      |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
      |  CAST((epoch_us(aw) - epoch_us(cw)) // 604800000000 AS BIGINT) AS week_offset,
      |  CAST(count(*) AS BIGINT) AS n_purchases,
      |  CAST(sum(cents) AS BIGINT) AS revenue_cents
      |FROM p JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // CHANGEPOINT DETECTION (binary segmentation, one split) — the
  // drift alarm a training-data intake runs on its volume series:
  // over the daily revenue-cents totals, the split day maximizing the
  // between-segment SSE reduction, which for a split after prefix i is
  //   v_i = (S_i·(n−i) − (S−S_i)·i)² / (i·(n−i))
  // — an exact rational of prefix sums (the CUSUM statistic squared,
  // scaled by the segment sizes). Top-3 candidates gate with their
  // exact segment sums; v itself ships AS A STRING (the Σd²
  // convention: v reaches ~1e18 at the test SF and grows past BIGINT
  // with the corpus — both engines materialize the exact integer,
  // Spark via BigInt, DuckDB via HUGEINT, and the string compares
  // bit-faithfully). BigInt `/` truncates toward zero = floor here
  // (num² ≥ 0, den > 0), matching DuckDB `//`.
  //
  // Scale shape: the corpus pass is ONE daily aggregate (map-side
  // partials, |days| output rows); the candidate scan is a driver
  // walk over that bin frame (the qAucExact offsets class) — at any
  // corpus size the driver sees |days| longs, never events.
  def qChangepoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        coalesce(expr("cast(round(value * 100) as long)"), lit(0L)).as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("x"))
      .orderBy(col("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = daily.length
    val stot = daily.map(d => BigInt(d._2)).sum
    var si = BigInt(0)
    val cands = (0 until n - 1).map { k =>
      si += BigInt(daily(k)._2)
      val i = BigInt(k + 1)
      val nr = BigInt(n - k - 1)
      val num = si * nr - (stot - si) * i
      val vq = (num * num) / (i * nr)
      (daily(k)._1, (k + 1).toLong, si, (n - k - 1).toLong, stot - si, vq)
    }
    val top = cands.sortBy { case (day, _, _, _, _, vq) => (-vq, day) }.take(3)
    top.zipWithIndex.map { case ((day, nl, sl, nr, sr, vq), r) =>
      ((r + 1).toLong, day, nl, sl.toLong, nr, sr.toLong, vq.toString)
    }.toSeq
      .toDF("rank", "day", "n_left", "sum_left_cents", "n_right",
        "sum_right_cents", "v_str")
      .orderBy(col("rank"))
  }

  val qChangepointSql: String =
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t,
      |    coalesce(CAST(round(value * 100) AS BIGINT), 0) AS c FROM events),
      |daily AS (SELECT strftime(date_trunc('day', t), '%Y-%m-%d') AS day,
      |    CAST(sum(c) AS BIGINT) AS x FROM e GROUP BY 1),
      |idx AS (SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS i,
      |  CAST(sum(x) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS si
      |  FROM daily),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s FROM daily),
      |cand AS (SELECT day, i, si, n - i AS nr,
      |    (si::HUGEINT * (n - i) - (s - si)::HUGEINT * i) AS num,
      |    i::HUGEINT * (n - i) AS den
      |  FROM idx, tot WHERE i < n),
      |v AS (SELECT day, i AS n_left, nr AS n_right, si AS sum_left_cents,
      |    (SELECT s FROM tot) - si AS sum_right_cents,
      |    (num * num) // den AS vq FROM cand),
      |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY vq DESC, day) AS rank FROM v)
      |SELECT CAST(rank AS BIGINT) AS rank, day, CAST(n_left AS BIGINT) AS n_left,
      |  CAST(sum_left_cents AS BIGINT) AS sum_left_cents,
      |  CAST(n_right AS BIGINT) AS n_right,
      |  CAST(sum_right_cents AS BIGINT) AS sum_right_cents,
      |  CAST(vq AS VARCHAR) AS v_str
      |FROM r WHERE rank <= 3 ORDER BY rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "temporal_changepoint" -> (qChangepoint _),
    "temporal_dau_wau_mau" -> (qDauWauMau _),
    "temporal_gap_median" -> (qGapMedian _),
    "temporal_rfm" -> (qRfm _),
    "temporal_asof_nearest" -> (qAsofNearest _),
    "temporal_cusum" -> (qCusum _),
    "temporal_scd2" -> (qScd2 _),
    "temporal_autocorr" -> (qAutocorr _),
    "temporal_markov" -> (qMarkovTransitions _),
    "temporal_drift" -> (qDrift _),
    "asof_join" -> (qAsofJoin _),
    "asof_join_exec" -> (qAsofJoinExec _),
    "temporal_seasonality" -> (qSeasonality _),
    "temporal_dow_profile" -> (qDowProfile _),
    "temporal_user_lifespan" -> (qUserLifespan _),
    "temporal_active_streaks" -> (qActiveStreaks _),
    "temporal_growth_accounting" -> (qGrowthAccounting _),
    "temporal_cohort_value" -> (qCohortValue _),
    "temporal_ffill" -> (qResampleFfill _),
    "temporal_churn_label" -> (qChurnLabel _),
    "temporal_gap_detector" -> (qGapDetector _),
    "sessionize" -> (qSessionize _),
    "temporal_interval_join" -> (qIntervalJoin _),
    "session_window" -> (qSessionWindow _),
    "temporal_rolling" -> (qRolling _),
    "temporal_hopping" -> (qHopping _),
    "temporal_anomaly" -> (qAnomaly _),
    "temporal_ewma" -> (qEwma _),
    "temporal_funnel" -> (qFunnel _),
    "temporal_retention" -> (qRetention _),
    "temporal_did" -> (qDid _),
    "temporal_event_study" -> (qEventStudy _),
    "temporal_backtest_folds" -> (qBacktestFolds _),
    "temporal_hazard_curve" -> (qHazardCurve _),
  )

  // ---------------------------------------------------------------
  // SURVIVAL HAZARD CURVE — Kaplan-Meier risk-set construction with
  // RIGHT-CENSORING, the analysis layer behind every retention /
  // repeat-engagement readout: subjects are purchase events, the
  // duration is hours to the user's NEXT purchase, and a last
  // purchase with no successor is CENSORED at the observation
  // horizon (the global max event hour) — dropping those rows (the
  // naive mistake) would bias the long-gap tail downward, and the
  // gate makes the censored column first-class instead. Output is
  // the exact risk table: per distinct duration t, subjects still at
  // risk (n_risk), events (d_event), censorings, the discrete hazard
  // in ppm (1e6·d div n_risk — non-negative integer div, safe), and
  // the Nelson-Aalen-style cumulative of those FLOORED ppm terms
  // (sum-of-floors, not floor-of-sum: both engines floor each term
  // identically, so the running total gates exactly; the true
  // rational Σd/n differs from it by < #terms ppm, stated here so
  // the derived metric is honest). The KM survival PRODUCT is
  // deliberately not shipped: Π(1−d/n) has unboundedly growing exact
  // denominators and any fixed-point rounding of it splits engines —
  // the hazard table carries the same information.
  // Scale shape: one user-partitioned lead window over purchases,
  // one groupBy on t; the cumulative window runs on the duration
  // GRID (≤ observation-window hours — metadata-sized at any corpus,
  // the KsTest bounded-window class).
  def qHazardCurve(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val horizon = ev.agg(expr("max(unix_micros(ts)) div 3600000000").as("hh"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 3600000000").as("h"))
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("h"), col("event_id"))
    val subj = p.withColumn("nh", lead(col("h"), 1).over(wNext))
      .crossJoin(broadcast(horizon))
      .select(
        when(col("nh").isNotNull, col("nh") - col("h"))
          .otherwise(col("hh") - col("h")).as("t"),
        col("nh").isNotNull.cast("long").as("ev"))
    val grid = subj.groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"), sum(col("ev")).as("d_event"),
        (count(lit(1)) - sum(col("ev"))).as("n_censored"))
    val tot = subj.agg(count(lit(1)).as("n"))
    val wCum = Window.orderBy(col("t")) // duration grid: bounded metadata frame
    grid.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n") - coalesce(sum(col("n_at"))
          .over(wCum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("hazard_ppm", expr("1000000 * d_event div n_risk"))
      .select(col("t").as("t_hours"), col("n_risk"), col("d_event"),
        col("n_censored"), col("hazard_ppm"),
        sum(col("hazard_ppm")).over(wCum.rowsBetween(Window.unboundedPreceding, 0))
          .as("cumhaz_ppm"))
      .orderBy(col("t_hours"))
  }

  val qHazardCurveSql: String =
    """WITH p AS (SELECT user_id, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h
      |  FROM events WHERE event_type = 'purchase'),
      |hz AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) AS hh FROM events),
      |subj AS (SELECT
      |    CASE WHEN nh IS NOT NULL THEN nh - h ELSE (SELECT hh FROM hz) - h END AS t,
      |    CASE WHEN nh IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM (SELECT h, lead(h) OVER (PARTITION BY user_id ORDER BY h, event_id) AS nh FROM p)),
      |grid AS (SELECT t, count(*) AS n_at, sum(ev) AS d_event,
      |    count(*) - sum(ev) AS n_censored FROM subj GROUP BY 1),
      |tot AS (SELECT count(*) AS n FROM subj),
      |risk AS (SELECT t, n_at, d_event, n_censored,
      |    (SELECT n FROM tot) - COALESCE(sum(n_at) OVER
      |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      |  FROM grid)
      |SELECT t AS t_hours, CAST(n_risk AS BIGINT) AS n_risk,
      |  CAST(d_event AS BIGINT) AS d_event, CAST(n_censored AS BIGINT) AS n_censored,
      |  CAST(1000000 * d_event // n_risk AS BIGINT) AS hazard_ppm,
      |  CAST(sum(1000000 * d_event // n_risk) OVER
      |    (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumhaz_ppm
      |FROM risk ORDER BY t""".stripMargin

  // ---------------------------------------------------------------
  // ROLLING-ORIGIN BACKTEST FOLDS — the time-series analogue of
  // samp_group_kfold: evaluation folds where the train window always
  // PRECEDES the test window (a random split leaks the future; this
  // is the split discipline every forecast/ranking model needs). K=4
  // expanding-origin folds over the observed day span, each testing
  // on the next H=3 days after its train end; boundaries are derived
  // from the data's min/max day by integer arithmetic (div on
  // non-negative spans), so the fold plan itself is the gated value —
  // per fold: train length, train/test row counts and cents totals.
  // Scale shape: the bounds aggregate is one metadata row; folds
  // (4 rows) broadcast-join the corpus and everything else is one
  // map-side conditional aggregate.
  private val BtK = 4L
  private val BtH = 3L

  def qBacktestFolds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(expr("unix_micros(ts) div 86400000000").as("d"),
        round(col("value") * 100).cast("long").as("cents"))
      .localCheckpoint()
    val bounds = e.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val folds = bounds
      .crossJoin(broadcast((1L to BtK).toDF("k")))
      .select(col("k"),
        col("d0"),
        (col("d0") + col("k") * expr(s"(d1 - d0 + 1 - $BtH) div $BtK")).as("tr_end"))
    e.crossJoin(broadcast(folds))
      .groupBy(col("k"), (col("tr_end") - col("d0")).as("train_days"))
      .agg(
        sum(when(col("d") < col("tr_end"), 1L).otherwise(0L)).as("train_n"),
        sum(when(col("d") >= col("tr_end") && col("d") < col("tr_end") + BtH, 1L)
          .otherwise(0L)).as("test_n"),
        sum(when(col("d") < col("tr_end"), col("cents")).otherwise(0L)).as("train_cents"),
        sum(when(col("d") >= col("tr_end") && col("d") < col("tr_end") + BtH, col("cents"))
          .otherwise(0L)).as("test_cents"))
      .select(col("k").as("fold"), col("train_days"), col("train_n"), col("test_n"),
        col("train_cents"), col("test_cents"))
      .orderBy(col("fold"))
  }

  val qBacktestFoldsSql: String =
    s"""WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
       |    CAST(round(value * 100) AS BIGINT) AS cents FROM events WHERE value IS NOT NULL),
       |b AS (SELECT min(d) AS d0, max(d) AS d1 FROM e),
       |folds AS (SELECT k, d0, d0 + k * ((d1 - d0 + 1 - $BtH) // $BtK) AS tr_end
       |  FROM b, (SELECT unnest(range(1, ${BtK + 1})) AS k))
       |SELECT k AS fold, tr_end - d0 AS train_days,
       |  CAST(count(*) FILTER (e.d < tr_end) AS BIGINT) AS train_n,
       |  CAST(count(*) FILTER (e.d >= tr_end AND e.d < tr_end + $BtH) AS BIGINT) AS test_n,
       |  CAST(COALESCE(sum(cents) FILTER (e.d < tr_end), 0) AS BIGINT) AS train_cents,
       |  CAST(COALESCE(sum(cents) FILTER (e.d >= tr_end AND e.d < tr_end + $BtH), 0) AS BIGINT) AS test_cents
       |FROM folds JOIN e ON true GROUP BY 1, 2 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // EVENT STUDY — the dynamic companion to temporal_did: instead of
  // one pre/post contrast, the treated-vs-control mean difference is
  // traced PER RELATIVE DAY in a ±7-day window around the cutover —
  // the pre-trend rows (d < 0) are the parallel-trends diagnostic
  // every DiD readout needs (a contrast that already moves before
  // the rollout invalidates the design), and the post rows are the
  // effect's time path. Same conventions as the rest of the causal
  // family: md5 ':did' cohort, integer cents, per-day contrast as an
  // EXACT RATIONAL (num/den strings, decimal(38,0)/HUGEINT). Day
  // arithmetic is epoch-day integer division (non-negative epochs),
  // cutover day 19738 = 2024-01-16 UTC. One map-side aggregate over
  // a 15-row grid.
  private val EsCutDay = 19738L
  private val EsWindow = 7L

  def qEventStudy(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val e = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(
        (expr("unix_micros(ts) div 86400000000") - EsCutDay).as("d"),
        round(col("value") * 100).cast("long").as("cents"),
        (conv(substring(md5(concat(col("user_id").cast("string"), lit(":did"))), 1, 15), 16, 10)
          .cast("long") % 100 < 50).cast("long").as("t"))
      .filter(col("d").between(-EsWindow, EsWindow))
    e.groupBy(col("d"))
      .agg(sum(col("t")).as("n_t"), sum(col("t") * col("cents")).as("s_t"),
        (count(lit(1)) - sum(col("t"))).as("n_c"),
        sum((lit(1L) - col("t")) * col("cents")).as("s_c"))
      .select(col("d"), col("n_t"), col("s_t"), col("n_c"), col("s_c"),
        (col("s_t").cast(d38) * col("n_c") - col("s_c").cast(d38) * col("n_t"))
          .cast("string").as("diff_num"),
        (col("n_t").cast(d38) * col("n_c")).cast("string").as("diff_den"))
      .orderBy(col("d"))
  }

  val qEventStudySql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 - $EsCutDay AS d,
       |    CAST(round(value * 100) AS BIGINT) AS cents,
       |    CASE WHEN (('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':did'), 1, 15))::BIGINT % 100) < 50
       |      THEN 1 ELSE 0 END AS t
       |  FROM events WHERE value IS NOT NULL),
       |w AS (SELECT d, sum(t) AS n_t, sum(t*cents) AS s_t,
       |    count(*) - sum(t) AS n_c, sum((1-t)*cents) AS s_c
       |  FROM e WHERE d BETWEEN -$EsWindow AND $EsWindow GROUP BY 1)
       |SELECT d, CAST(n_t AS BIGINT) AS n_t, CAST(s_t AS BIGINT) AS s_t,
       |  CAST(n_c AS BIGINT) AS n_c, CAST(s_c AS BIGINT) AS s_c,
       |  CAST(s_t::HUGEINT * n_c - s_c::HUGEINT * n_t AS VARCHAR) AS diff_num,
       |  CAST(n_t::HUGEINT * n_c AS VARCHAR) AS diff_den
       |FROM w ORDER BY d""".stripMargin

  // ---------------------------------------------------------------
  // DIFFERENCE-IN-DIFFERENCES — the causal estimator behind every
  // "did the pipeline change move the metric" readout: a treated
  // cohort (md5-bucket of user_id, the qSplit convention — a
  // simulated 50% rollout; doc_id/user_id MODULO splits collapse,
  // see CLAUDE.md) vs control, pre/post a fixed cutover, outcome =
  // event value in integer cents. DiD = (ȳ_tp − ȳ_tr) − (ȳ_cp − ȳ_cr)
  // is an EXACT RATIONAL of the four cell (sum, count) pairs; the
  // numerator and common denominator ship AS STRINGS through
  // decimal(38,0)/HUGEINT (the Σd²-as-string convention — a quotient
  // this size can't gate as a rounded double, and its sign is
  // data-dependent so no floor'd int either). Overflow ceiling:
  // |num| ≤ Σcents·n³ ≈ 1e12·1e18 = 1e30 at sf100 — decimal(38,0)
  // holds to ~1e8 rows per cell; shard per source past that.
  // One map-side 4-cell aggregate; no shuffle beyond the final
  // 1-row exchange.
  private val DidCutover = "2024-01-16 00:00:00"

  def qDid(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(
        round(col("value") * 100).cast("long").as("cents"),
        (conv(substring(md5(concat(col("user_id").cast("string"), lit(":did"))), 1, 15), 16, 10)
          .cast("long") % 100 < 50).cast("int").as("grp"),
        (col("ts") >= to_timestamp(lit(DidCutover))).cast("int").as("post"))
    def cell(g: Int, p: Int, agg: Column): Column =
      max(when(col("grp") === g && col("post") === p, agg))
    val cells = e.groupBy(col("grp"), col("post"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val d38 = "decimal(38,0)"
    cells.agg(
        cell(1, 1, col("n")).as("n_tp"), cell(1, 1, col("s")).as("s_tp"),
        cell(1, 0, col("n")).as("n_tr"), cell(1, 0, col("s")).as("s_tr"),
        cell(0, 1, col("n")).as("n_cp"), cell(0, 1, col("s")).as("s_cp"),
        cell(0, 0, col("n")).as("n_cr"), cell(0, 0, col("s")).as("s_cr"))
      .select(col("n_tp"), col("s_tp"), col("n_tr"), col("s_tr"),
        col("n_cp"), col("s_cp"), col("n_cr"), col("s_cr"),
        (col("s_tp").cast(d38) * col("n_tr") * col("n_cp") * col("n_cr")
          - col("s_tr").cast(d38) * col("n_tp") * col("n_cp") * col("n_cr")
          - col("s_cp").cast(d38) * col("n_tp") * col("n_tr") * col("n_cr")
          + col("s_cr").cast(d38) * col("n_tp") * col("n_tr") * col("n_cp"))
          .cast("string").as("did_num"),
        (col("n_tp").cast(d38) * col("n_tr") * col("n_cp") * col("n_cr"))
          .cast("string").as("did_den"))
  }

  val qDidSql: String =
    s"""WITH e AS (
       |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
       |    CASE WHEN (('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':did'), 1, 15))::BIGINT % 100) < 50
       |      THEN 1 ELSE 0 END AS grp,
       |    CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '$DidCutover' THEN 1 ELSE 0 END AS post
       |  FROM events WHERE value IS NOT NULL),
       |cells AS (SELECT grp, post, count(*) AS n, sum(cents) AS s FROM e GROUP BY 1, 2)
       |SELECT
       |  CAST(max(CASE WHEN grp=1 AND post=1 THEN n END) AS BIGINT) AS n_tp,
       |  CAST(max(CASE WHEN grp=1 AND post=1 THEN s END) AS BIGINT) AS s_tp,
       |  CAST(max(CASE WHEN grp=1 AND post=0 THEN n END) AS BIGINT) AS n_tr,
       |  CAST(max(CASE WHEN grp=1 AND post=0 THEN s END) AS BIGINT) AS s_tr,
       |  CAST(max(CASE WHEN grp=0 AND post=1 THEN n END) AS BIGINT) AS n_cp,
       |  CAST(max(CASE WHEN grp=0 AND post=1 THEN s END) AS BIGINT) AS s_cp,
       |  CAST(max(CASE WHEN grp=0 AND post=0 THEN n END) AS BIGINT) AS n_cr,
       |  CAST(max(CASE WHEN grp=0 AND post=0 THEN s END) AS BIGINT) AS s_cr,
       |  CAST(max(CASE WHEN grp=1 AND post=1 THEN s END)::HUGEINT
       |      * max(CASE WHEN grp=1 AND post=0 THEN n END)
       |      * max(CASE WHEN grp=0 AND post=1 THEN n END)
       |      * max(CASE WHEN grp=0 AND post=0 THEN n END)
       |    - max(CASE WHEN grp=1 AND post=0 THEN s END)::HUGEINT
       |      * max(CASE WHEN grp=1 AND post=1 THEN n END)
       |      * max(CASE WHEN grp=0 AND post=1 THEN n END)
       |      * max(CASE WHEN grp=0 AND post=0 THEN n END)
       |    - max(CASE WHEN grp=0 AND post=1 THEN s END)::HUGEINT
       |      * max(CASE WHEN grp=1 AND post=1 THEN n END)
       |      * max(CASE WHEN grp=1 AND post=0 THEN n END)
       |      * max(CASE WHEN grp=0 AND post=0 THEN n END)
       |    + max(CASE WHEN grp=0 AND post=0 THEN s END)::HUGEINT
       |      * max(CASE WHEN grp=1 AND post=1 THEN n END)
       |      * max(CASE WHEN grp=1 AND post=0 THEN n END)
       |      * max(CASE WHEN grp=0 AND post=1 THEN n END) AS VARCHAR) AS did_num,
       |  CAST(max(CASE WHEN grp=1 AND post=1 THEN n END)::HUGEINT
       |      * max(CASE WHEN grp=1 AND post=0 THEN n END)
       |      * max(CASE WHEN grp=0 AND post=1 THEN n END)
       |      * max(CASE WHEN grp=0 AND post=0 THEN n END) AS VARCHAR) AS did_den
       |FROM cells""".stripMargin

  val oracles: Map[String, String] = Map(
    "temporal_did" -> qDidSql,
    "temporal_event_study" -> qEventStudySql,
    "temporal_backtest_folds" -> qBacktestFoldsSql,
    "temporal_hazard_curve" -> qHazardCurveSql,
    "temporal_changepoint" -> qChangepointSql,
    "temporal_dau_wau_mau" -> qDauWauMauSql,
    "temporal_gap_median" -> qGapMedianSql,
    "temporal_rfm" -> qRfmSql,
    "temporal_asof_nearest" -> qAsofNearestSql,
    "temporal_cusum" -> qCusumSql,
    "temporal_scd2" -> qScd2Sql,
    "temporal_autocorr" -> qAutocorrSql,
    "temporal_markov" -> qMarkovTransitionsSql,
    "temporal_drift" -> qDriftSql,
    "asof_join" -> qAsofJoinSql,
    "asof_join_exec" -> qAsofJoinSql,
    "temporal_seasonality" -> qSeasonalitySql,
    "temporal_dow_profile" -> qDowProfileSql,
    "temporal_user_lifespan" -> qUserLifespanSql,
    "temporal_active_streaks" -> qActiveStreaksSql,
    "temporal_growth_accounting" -> qGrowthAccountingSql,
    "temporal_cohort_value" -> qCohortValueSql,
    "temporal_ffill" -> qResampleFfillSql,
    "temporal_churn_label" -> qChurnLabelSql,
    "temporal_gap_detector" -> qGapDetectorSql,
    "sessionize" -> qSessionizeSql,
    "temporal_interval_join" -> qIntervalJoinSql,
    "session_window" -> qSessionWindowSql,
    "temporal_rolling" -> qRollingSql,
    "temporal_hopping" -> qHoppingSql,
    "temporal_anomaly" -> qAnomalySql,
    "temporal_ewma" -> qEwmaSql,
    "temporal_funnel" -> qFunnelSql,
    "temporal_retention" -> qRetentionSql,
  )
}
