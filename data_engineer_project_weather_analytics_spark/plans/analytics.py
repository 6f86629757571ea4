"""Warehouse-analytics query set (round 3 widening): the operational
analytics a BI/data-engineering user runs daily on top of the
reference's dashboard workload — data profiling, SCD Type-2 dimension
building, cohort retention, funnels, histograms, anomaly flags, and
snapshot CDC diffs.

Every query follows the cross-engine determinism rules learned in
rounds 1-2 (CLAUDE.md): exact DECIMAL sums for money, BIGINT casts for
integer aggregates, integer-quantized variance arithmetic instead of
float stddev, unrounded single double divisions for ratios.

Scale notes are inline per query; all shuffles are keyed and partial-
aggregated, windows always partition by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# D-family — data profiling
# --------------------------------------------------------------------------

def d1_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile of ``events`` — row count, null count,
    exact distinct count, numeric min/max, string min/max per column.
    The standard first query against any new table.

    Plan shape: ONE scan, one aggregate computing every statistic,
    then an in-row ``stack`` unpivot of the single result row into one
    row per column.  The multi-column exact ``count(DISTINCT …)`` plans
    as a single Expand (×4 row replication before the partial agg) —
    the classic exact-profile trade; at 100 TB swap the distinct counts
    for ``approx_count_distinct`` (see ``a8b``) and the Expand
    disappears.  Everything after the aggregate is a 1-row transform.
    """
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # non-null counts
        F.count("event_id").alias("nn_event_id"),
        F.count("user_id").alias("nn_user_id"),
        F.count("event_type").alias("nn_event_type"),
        F.count("value").alias("nn_value"),
        # exact distinct counts
        F.countDistinct("event_id").alias("nd_event_id"),
        F.countDistinct("user_id").alias("nd_user_id"),
        F.countDistinct("event_type").alias("nd_event_type"),
        F.countDistinct("value").alias("nd_value"),
        # numeric ranges (min/max of stored values — bit-exact in any
        # engine, unlike sums/avgs which need the decimal detour)
        F.min("event_id").cast("double").alias("min_event_id"),
        F.max("event_id").cast("double").alias("max_event_id"),
        F.min("user_id").cast("double").alias("min_user_id"),
        F.max("user_id").cast("double").alias("max_user_id"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        # string ranges
        F.min("event_type").alias("min_event_type"),
        F.max("event_type").alias("max_event_type"),
    )
    return row.selectExpr(
        """stack(4,
            'event_id',  n_rows, n_rows - nn_event_id,  nd_event_id,
                CAST(min_event_id AS DOUBLE), CAST(max_event_id AS DOUBLE),
                CAST(NULL AS STRING), CAST(NULL AS STRING),
            'user_id',   n_rows, n_rows - nn_user_id,   nd_user_id,
                CAST(min_user_id AS DOUBLE), CAST(max_user_id AS DOUBLE),
                CAST(NULL AS STRING), CAST(NULL AS STRING),
            'event_type', n_rows, n_rows - nn_event_type, nd_event_type,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                min_event_type, max_event_type,
            'value',     n_rows, n_rows - nn_value,     nd_value,
                min_value, max_value,
                CAST(NULL AS STRING), CAST(NULL AS STRING)
        ) AS (column_name, n_rows, n_nulls, n_distinct,
              min_num, max_num, min_str, max_str)"""
    )


# --------------------------------------------------------------------------
# SCD Type-2 dimension build
# --------------------------------------------------------------------------

def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension from a change stream: collapse each user's
    event history into state-validity intervals
    ``(state, valid_from, valid_to, version, is_current)``.

    Classic gaps-and-islands: a ``lag`` window detects state-change
    points, a second window over only the change rows assigns interval
    ends (``lead``) and version numbers.  Both windows partition by
    ``user_id`` with the same ``(ts, event_id)`` deterministic order,
    so the plan is ONE shuffle + sort reused across both window nodes —
    the shape that holds at any scale (no global sort, state bounded by
    rows-per-user).

    Cross-engine: ``row_number``/boolean cast explicitly to BIGINT
    (Spark returns INT, DuckDB BIGINT); tiebreak on ``event_id`` makes
    duplicate-timestamp histories deterministic (the etl.py:112 lesson).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        "event_id",
        F.lag("event_type").over(w).alias("__prev"),
    )
    changes = marked.filter(
        F.col("__prev").isNull() | (F.col("__prev") != F.col("state"))
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("bigint").alias("version"),
        F.lead("valid_from").over(w2).isNull().cast("bigint").alias("is_current"),
    )


# --------------------------------------------------------------------------
# A-family extensions — cohorts, histograms, funnels, anomaly flags
# --------------------------------------------------------------------------

def a14_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, distinct
    active users per (cohort_day, day_offset).

    All three aggregations key on ``user_id`` (distinct days → cohort
    min → retention join), so the cohort join is co-partitioned with
    the day dedup — one shuffle for the user-keyed stages plus the
    final small (cohort_day, offset) rollup.  Exact integer arithmetic
    throughout (dates + counts): no float drift possible."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("bigint").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def a15_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value — 20 × 25 000 buckets.

    Bucketing is pure integer arithmetic on exact cents
    (``DECIMAL(12,2) × 100 → BIGINT``, integer ``div``): no float
    boundary can disagree between engines.  One scan, partial
    aggregation into ≤20 groups — scale-trivial."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    bucket = F.least(F.expr("__cents div 2500000"), F.lit(19)).cast("bigint")
    return (
        orders.select(cents.alias("__cents"))
        .select(bucket.alias("bucket"), "__cents")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # exact cents sum back to a 2-dp double — deterministic
            (F.sum("__cents").cast("double") / 100.0).alias("sum_price"),
        )
    )


def a16_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → signup → purchase: a
    user reaches stage *k* only via an event strictly after their
    earliest stage-*k−1* arrival.

    Each stage is a user-keyed min-timestamp aggregate joined to the
    previous stage — four co-partitioned shuffles on ``user_id`` (AQE
    coalesces them; no stage ever materializes more than one row per
    user).  The unioned 4-row output is exact counts only."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(event_type: str, prev: DataFrame | None) -> DataFrame:
        s = ev.filter(F.col("event_type") == event_type)
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("ts") > F.col("t_prev"))
        return s.groupBy("user_id").agg(F.min("ts").alias("t_prev"))

    s1 = stage("view", None)
    s2 = stage("click", s1)
    s3 = stage("signup", s2)
    s4 = stage("purchase", s3)

    def counted(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )

    return (
        counted(s1, "1_view")
        .unionAll(counted(s2, "2_click"))
        .unionAll(counted(s3, "3_signup"))
        .unionAll(counted(s4, "4_purchase"))
    )


def a17_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-window anomaly flags: readings whose squared
    z-score against the previous ≤20 readings exceeds 3².

    Float stddev is not reproducible cross-engine, so the test is done
    in EXACT integer arithmetic on cents: with window count n, sum s,
    sum-of-squares ss (all BIGINT over quantized cents x),

        z² > 9  ⇔  (n·x − s)² > 9·(n·ss − s²)

    — a pure-integer inequality, identical in any engine (the
    label_centroids quantize-first lesson applied to variance).  Bounds:
    cents ≤ 4.9e4, window 20 → every term ≤ ~1e12, far inside BIGINT.
    One shuffle (window partition by user), deterministic
    ``(ts, event_id)`` order."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    scored = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        cents.alias("__x"),
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.sum(cents).over(w).alias("__s"),
        F.sum(cents * cents).over(w).alias("__ss"),
    )
    n, x, s, ss = (F.col(c) for c in ("n_window", "__x", "__s", "__ss"))
    dev_sq = (n * x - s) * (n * x - s)
    nvar = n * ss - s * s
    return (
        scored.filter((n >= 10) & (dev_sq > 9 * nvar))
        .select(
            "event_id",
            "user_id",
            "value",
            "n_window",
            dev_sq.alias("dev_sq"),
            nvar.alias("nvar"),
        )
    )


def w5_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: densify each user's daily series to
    every calendar day between their first and last activity, then
    forward-fill the metric across the gaps (the standard prep step
    before charting or joining a sparse series).

    The day scaffold comes from ``explode(sequence(d0, d1))`` on the
    per-user span — fan-out bounded by calendar span, not data volume —
    and the fill is ``last(value, ignorenulls)`` over an unbounded-
    preceding window.  Everything keys on ``user_id``: the span agg,
    the scaffold join, and the fill window share one partitioning.
    Metric is exact integer cents (sum per day), so fill values are
    bit-identical cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    daily = (
        ev.select("user_id", F.to_date("ts").alias("day"), cents.alias("__c"))
        .groupBy("user_id", "day")
        .agg(F.sum("__c").alias("day_cents"))
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("__d0"), F.max("day").alias("__d1")
    )
    scaffold = span.select(
        "user_id", F.explode(F.sequence("__d0", "__d1")).alias("day")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        scaffold.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("day_cents", ignorenulls=True).over(w).alias("filled_cents"),
            F.col("day_cents").isNull().cast("bigint").alias("was_gap"),
        )
    )


def a18_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day.

    A sliding COUNT(DISTINCT) has no window-function form in Spark (and
    a naive self-join is O(days²) scans); the scalable shape is the
    contribution explode: each (user, active-day) row contributes to
    exactly 7 target days, so one explode (×7, bounded) + one
    distinct-count shuffle computes every day's trailing distinct in a
    single pass.  Target days are semi-joined back to observed days so
    the output domain matches the data."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    contrib = days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("on_day"),
    )
    observed = days.select(F.col("day").alias("on_day")).distinct()
    return (
        contrib.join(observed, "on_day", "left_semi")
        .groupBy("on_day")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .select(F.col("on_day").alias("day"), "active_7d")
    )


# --------------------------------------------------------------------------
# CDC — snapshot diff
# --------------------------------------------------------------------------

def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff between two table snapshots: emit
    ``(key, change_type ∈ {insert, update, delete})`` rows.

    The two snapshots are carved deterministically from ``orders``
    (old = keys ∤ 7, new = keys ∤ 11, values bumped by exactly
    1000.00 on keys ÷ 5) — the same fixture-by-arithmetic device as
    ``x1b``.  The diff itself is the production operator: one
    co-partitioned full-outer join on the key, DECIMAL-exact value
    comparison (no float equality), insert/delete from null-ness.
    At 100 TB both sides shuffle once on the key; with bucketed
    snapshots (operators/bucketing.py) even that shuffle disappears."""
    orders = load_table(spark, sf_dir, "orders")
    val = F.col("o_totalprice").cast("decimal(12,2)")
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", val.alias("val_old")
    )
    bump = F.when(F.col("o_orderkey") % 5 == 0, F.lit(1000.00)).otherwise(
        F.lit(0.0)
    ).cast("decimal(6,2)")
    new = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", (val + bump).alias("val_new")
    )
    diff = old.join(new, "o_orderkey", "full_outer").withColumn(
        "change_type",
        F.when(F.col("val_old").isNull(), F.lit("insert"))
        .when(F.col("val_new").isNull(), F.lit("delete"))
        .when(F.col("val_old") != F.col("val_new"), F.lit("update"))
        .otherwise(F.lit("unchanged")),
    )
    return diff.filter(F.col("change_type") != "unchanged").select(
        "o_orderkey", "change_type"
    )


# --------------------------------------------------------------------------
# Oracle SQL twins (DuckDB) — identical column aliases, the determinism
# rules from CLAUDE.md applied on both sides.
# --------------------------------------------------------------------------

ORACLES_ANALYTICS: dict[str, str] = {
    "d1_data_profile": """
        SELECT 'event_id' AS column_name,
               count(*) AS n_rows,
               count(*) - count(event_id) AS n_nulls,
               count(DISTINCT event_id) AS n_distinct,
               CAST(min(event_id) AS DOUBLE) AS min_num,
               CAST(max(event_id) AS DOUBLE) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str,
               CAST(NULL AS VARCHAR) AS max_str
        FROM events
        UNION ALL
        SELECT 'user_id', count(*), count(*) - count(user_id),
               count(DISTINCT user_id),
               CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE),
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM events
        UNION ALL
        SELECT 'event_type', count(*), count(*) - count(event_type),
               count(DISTINCT event_type),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               min(event_type), max(event_type)
        FROM events
        UNION ALL
        SELECT 'value', count(*), count(*) - count(value),
               count(DISTINCT value),
               min(value), max(value),
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM events
    """,
    "scd2_user_state": """
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_state
            FROM events
        ),
        changes AS (
            SELECT user_id, event_type AS state, ts AS valid_from, event_id
            FROM ordered
            WHERE prev_state IS NULL OR prev_state <> event_type
        )
        SELECT user_id, state, valid_from,
               lead(valid_from) OVER w AS valid_to,
               CAST(row_number() OVER w AS BIGINT) AS version,
               CAST((lead(valid_from) OVER w IS NULL) AS BIGINT) AS is_current
        FROM changes
        WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    """,
    "a14_cohort_retention": """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        cohort AS (
            SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
        )
        SELECT cohort_day,
               CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
               count(DISTINCT days.user_id) AS n_users
        FROM days JOIN cohort ON days.user_id = cohort.user_id
        GROUP BY 1, 2
    """,
    "a15_histogram": """
        WITH cents AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                       AS c
            FROM orders
        )
        SELECT CAST(least(c // 2500000, 19) AS BIGINT) AS bucket,
               count(*) AS n_orders,
               CAST(sum(c) AS DOUBLE) / 100.0 AS sum_price
        FROM cents
        GROUP BY 1
    """,
    "a16_funnel": """
        WITH s1 AS (
            SELECT user_id, min(ts) AS t_prev FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t_prev
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t_prev
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t_prev
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'signup' AND e.ts > s2.t_prev
            GROUP BY e.user_id
        ),
        s4 AS (
            SELECT e.user_id, min(e.ts) AS t_prev
            FROM events e JOIN s3 ON e.user_id = s3.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s3.t_prev
            GROUP BY e.user_id
        )
        SELECT '1_view' AS stage, count(*) AS n_users FROM s1
        UNION ALL SELECT '2_click', count(*) FROM s2
        UNION ALL SELECT '3_signup', count(*) FROM s3
        UNION ALL SELECT '4_purchase', count(*) FROM s4
    """,
    "a17_zscore_anomaly": """
        WITH scored AS (
            SELECT event_id, user_id, value,
                   CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
                   count(*) OVER w AS n_window,
                   sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                       OVER w AS s,
                   sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                       * CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                       OVER w AS ss
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
            )
        )
        SELECT event_id, user_id, value,
               CAST(n_window AS BIGINT) AS n_window,
               -- HUGEINT → BIGINT: DuckDB widens integer window sums to
               -- HUGEINT, which pandas renders as float (CLAUDE.md rule)
               CAST((n_window * x - s) * (n_window * x - s) AS BIGINT)
                   AS dev_sq,
               CAST(n_window * ss - s * s AS BIGINT) AS nvar
        FROM scored
        WHERE n_window >= 10
          AND (n_window * x - s) * (n_window * x - s)
              > 9 * (n_window * ss - s * s)
    """,
    "w5_gap_fill_ffill": """
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS day_cents
            FROM events
            GROUP BY 1, 2
        ),
        span AS (
            SELECT user_id, min(day) AS d0, max(day) AS d1
            FROM daily GROUP BY user_id
        ),
        scaffold AS (
            SELECT user_id,
                   CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                        AS DATE) AS day
            FROM span
        )
        SELECT s.user_id, s.day,
               last_value(d.day_cents IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_cents,
               CAST((d.day_cents IS NULL) AS BIGINT) AS was_gap
        FROM scaffold s
        LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
    "a18_rolling_distinct": """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        contrib AS (
            SELECT user_id,
                   CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                               INTERVAL 1 DAY)) AS DATE)
                       AS on_day
            FROM days
        ),
        observed AS (SELECT DISTINCT day AS on_day FROM days)
        SELECT on_day AS day, count(DISTINCT user_id) AS active_7d
        FROM contrib
        WHERE on_day IN (SELECT on_day FROM observed)
        GROUP BY on_day
    """,
    "cdc_snapshot_diff": """
        WITH old_snap AS (
            SELECT o_orderkey,
                   CAST(o_totalprice AS DECIMAL(12,2)) AS val_old
            FROM orders WHERE o_orderkey % 7 <> 0
        ),
        new_snap AS (
            SELECT o_orderkey,
                   CAST(o_totalprice AS DECIMAL(12,2))
                   + CAST(CASE WHEN o_orderkey % 5 = 0 THEN 1000.00
                               ELSE 0.00 END AS DECIMAL(6,2)) AS val_new
            FROM orders WHERE o_orderkey % 11 <> 0
        )
        SELECT o_orderkey,
               CASE WHEN val_old IS NULL THEN 'insert'
                    WHEN val_new IS NULL THEN 'delete'
                    ELSE 'update' END AS change_type
        FROM old_snap FULL OUTER JOIN new_snap USING (o_orderkey)
        WHERE val_old IS NULL OR val_new IS NULL OR val_old <> val_new
    """,
}
