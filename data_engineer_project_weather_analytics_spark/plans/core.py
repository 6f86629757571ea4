"""Core query set: the reference's dashboard/ETL workload re-expressed
Spark-first, on the driver's testdata stand-ins (FIXTURES.md mapping:
``events`` ≈ weather readings keyed ``(user_id, ts)``, ``customer`` /
``nation`` ≈ the cities dimension, TPC-H star for volume joins).

Every function takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names exactly match the paired oracle SQL in
``plans/oracles_core.py`` (the driver hashes values after sorting
columns by name).

Scale notes are inline per query; common principles:

* dimensions are broadcast (``F.broadcast``) — no shuffle of the fact;
* aggregates are expressed so Catalyst plans partial (map-side)
  aggregation before the exchange;
* windows always partition by a key, never a global ``ORDER BY`` over
  the whole table (except deliberate top-k, which uses ``TakeOrdered``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.operators.latest import latest_per_key
from data_engineer_project_weather_analytics_spark.operators.upsert import latest_write_wins
from data_engineer_project_weather_analytics_spark.plans.hints import maybe_broadcast
from data_engineer_project_weather_analytics_spark.sources.catalog import load_table


def _dec2(col) -> F.Column:
    """Money column → exact DECIMAL(12,2).

    Sums of doubles are order-dependent, and Spark and DuckDB sum in
    different orders — at sf0.1 the accumulated ulp drift can flip a
    2-decimal rounding.  Casting to decimal first makes the sum exact
    (identical in any engine); the final cast back to double is then
    deterministic.  Same cast appears in every oracle SQL."""
    return (col if isinstance(col, F.Column) else F.col(col)).cast("decimal(12,2)")


def _money_sum(expr: F.Column, alias: str) -> F.Column:
    return F.round(F.sum(expr).cast("double"), 2).alias(alias)


def _exact_avg(col: str, digits: int, alias: str) -> F.Column:
    """Order- and engine-independent average: exact decimal sum ÷ count,
    divided in double, UNROUNDED.

    Plain ``round(avg(x), d)`` is unreproducible across engines twice
    over: partial-sum order drifts the double, and even on identical
    doubles Spark rounds the shortest decimal string (38.37875 →
    .3788) while DuckDB rounds the binary value (38.3787499… → .3787)
    — both observed at sf0.001.  Exact decimal sums make the division
    inputs bit-identical, after which *no* rounding is the only
    representation both engines agree on.  ``digits`` is kept for API
    stability but intentionally unused.
    Oracle mirror: ``CAST(sum(CAST(x AS DECIMAL(12,2))) AS DOUBLE)
    / count(x)``."""
    return (F.sum(_dec2(col)).cast("double") / F.count(col)).alias(alias)


def _revenue() -> F.Column:
    """Exact-decimal ``l_extendedprice * (1 - l_discount)``.

    Oracle mirror: ``CAST(l_extendedprice AS DECIMAL(12,2)) *
    CAST(1 - l_discount AS DECIMAL(4,2))``."""
    return _dec2("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)")


# --------------------------------------------------------------------------
# projections / filters / predicates (P-family)
# --------------------------------------------------------------------------

def p7_filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7/P10: predicate + projection + computed column.

    The filter and the 3-column read schema both push down to the
    parquet scan (verify: ``PushedFilters`` in ``.explain``)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter((F.col("event_type") == "purchase") & (F.col("value") > 100.0))
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") * 2, 2).alias("double_value"),
        )
    )


def p1_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P8: schema-ful JSON parse of the ``props`` payload column.

    ``from_json`` with an explicit schema is the engine's standard
    ingestion move (see sources/json_ingest.py for the full weather
    flatten); runs entirely in codegen, no UDF."""
    events = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return events.select(
        "event_id",
        parsed.getField("k").alias("prop_k"),
    )


def p10_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: the dashboard's date-range + equality filter
    (``README.md:113`` "Filter by date/time and city name")."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp_ntz"))
        & (F.col("event_type") != "error")
    ).select("event_id", "user_id", "event_type", "ts", "value")


# --------------------------------------------------------------------------
# aggregations (A-family — the dashboard workload)
# --------------------------------------------------------------------------

def a1_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the Looker scorecards — global averages over the filtered
    window (PDF p1: temp 22.82, humidity 74.4, …).  One partial+final
    hash aggregate; at 100 TB this is a single reduce of 32-byte
    partials per partition."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") != "error").agg(
        F.count(F.lit(1)).alias("n_readings"),
        _exact_avg("value", 4, "avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        _money_sum(_dec2("value"), "sum_value"),
    )


def a2_daily_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: "Temperature by Day" — tumbling daily buckets of the reading
    stream (PDF p1).  ``to_date`` + groupBy = map-side partial agg."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            _exact_avg("value", 4, "avg_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def a3_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/W1: latest reading per key — the "current weather per city"
    table (``README.md:111``), via the deterministic ranking window."""
    events = load_table(spark, sf_dir, "events")
    return latest_per_key(
        events.select("user_id", "event_id", "ts", "event_type", "value"),
        keys=["user_id"],
        order_cols=["ts", "event_id"],
        strategy="window",
    )


def a4_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: dimension dedup before insert (notebook cell 19
    ``drop_duplicates`` → DISTINCT)."""
    events = load_table(spark, sf_dir, "events")
    return events.select("user_id", "event_type").distinct()


def a5_latest_join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (+J1): the map widget — latest reading per key joined to the
    dimension for coordinates/name.  The dimension side is broadcast
    size-conditionally (customer scales with SF): zero shuffle added on
    top of A3's while it fits, stats/AQE choice beyond."""
    latest = a3_latest_per_key(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    return latest.join(
        maybe_broadcast(customer.select("c_custkey", "c_name", "c_acctbal")),
        latest["user_id"] == customer["c_custkey"],
        "inner",
    ).select("user_id", "c_name", "c_acctbal", "event_id", "ts", "value")


# --------------------------------------------------------------------------
# joins (J-family)
# --------------------------------------------------------------------------

def j1_dim_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 at volume: fact ⋈ broadcast dimension chain, revenue rollup.

    lineitem ⋈ supplier ⋈ nation: nation (constant 25 rows) is force-
    broadcast, supplier (SF-scaling) size-conditionally, so the only
    shuffle while the dims fit is the final groupBy on n_name (25
    groups) — the shape that survives a 1000-executor scale-up."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(maybe_broadcast(supplier), lineitem["l_suppkey"] == supplier["s_suppkey"])
        .join(F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            _money_sum(_revenue(), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def j2_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/K3: insert-if-absent key test — customers with no orders
    (``ON CONFLICT DO NOTHING`` ≡ left_anti, ``ipynb:684``)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders.select("o_custkey"),
        customer["c_custkey"] == orders["o_custkey"],
        "left_anti",
    ).select("c_custkey", "c_name")


def j2b_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: customers having ≥1 high-value order (EXISTS)."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return customer.join(
        big.select("o_custkey"),
        customer["c_custkey"] == big["o_custkey"],
        "left_semi",
    ).select("c_custkey", "c_name", "c_mktsegment")


def ri_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity gate (``sql/createtable.sql:13`` FK):
    fact keys with no dimension row — must be empty on healthy data."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return (
        events.select("user_id")
        .distinct()
        .join(customer, events["user_id"] == customer["c_custkey"], "left_anti")
        .select("user_id")
    )


def ri_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ON DELETE CASCADE`` parity (``sql/createtable.sql:13``):
    deleting the ASIA nations removes them from the dimension AND
    every customer/supplier fact row referencing them — one broadcast
    anti-join per table, no shuffle.  Output: surviving nations with
    their surviving fact counts (cascaded facts must be gone)."""
    from data_engineer_project_weather_analytics_spark.operators.delete import cascade_delete

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    doomed = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .select("n_nationkey")
    )
    new_nation, (new_cust, new_supp) = cascade_delete(
        nation,
        "n_nationkey",
        [(customer, "c_nationkey"), (supplier, "s_nationkey")],
        doomed,
    )
    cust_counts = new_cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("__nc")
    )
    supp_counts = new_supp.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("__ns")
    )
    return (
        new_nation.select("n_nationkey", "n_name")
        .join(cust_counts, new_nation["n_nationkey"] == cust_counts["c_nationkey"], "left")
        .join(supp_counts, new_nation["n_nationkey"] == supp_counts["s_nationkey"], "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(F.col("__nc"), F.lit(0).cast("long")).alias("n_customers"),
            F.coalesce(F.col("__ns"), F.lit(0).cast("long")).alias("n_suppliers"),
        )
    )


# --------------------------------------------------------------------------
# upsert semantics (K-family) — the reference's write path, replayed
# --------------------------------------------------------------------------

def k2_upsert_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2: last-write-wins upsert replay.

    Batch 0 = the events table; batch 1 re-delivers every 7th event
    with a changed value (the reference's hourly re-run overwriting
    ``(city_id, dt)`` rows — ``dags/etl.py:97-114``).  The canonical
    view must show the batch-1 values."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    base = events.withColumn("ingest_seq", F.lit(0).cast("long"))
    redelivery = (
        events.filter(F.col("event_id") % 7 == 0)
        .withColumn("value", F.round(F.col("value") + 1000.0, 2))
        .withColumn("ingest_seq", F.lit(1).cast("long"))
    )
    return latest_write_wins(base.unionByName(redelivery), keys=["event_id"])


def k3_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: first-write-wins — event users not already in the dimension
    would be inserted; here we surface the would-insert set."""
    events = load_table(spark, sf_dir, "events")
    seen = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 2 == 0)
    return (
        events.select(F.col("user_id").alias("new_key"))
        .distinct()
        .join(seen, F.col("new_key") == seen["c_custkey"], "left_anti")
        .select("new_key")
    )


# --------------------------------------------------------------------------
# windows / sorts / limits / set ops (W/O/U-family)
# --------------------------------------------------------------------------

def w2_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: analytic windows — per-key lag + 3-row moving average
    ("temperature trend"); partitioned by key, so no global sort."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-2, 0)
    # exact decimal window sum / count — see _exact_avg for why no round
    mavg3 = F.sum(_dec2("value")).over(frame).cast("double") / F.count("value").over(frame)
    return events.select(
        "user_id",
        "event_id",
        mavg3.alias("mavg3"),
        F.lag("value", 1).over(w).alias("prev_value"),
    )


def o2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global top-k with deterministic tiebreak.  Spark plans
    ``TakeOrderedAndProject`` — per-partition heaps, no full sort."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .select("event_id", "user_id", "value")
        .limit(10)
    )


def u1_union_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: the notebook's ``pd.concat`` across per-city frames
    (``ipynb:344``) → unionByName, then a count rollup."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    signups = events.filter(F.col("event_type") == "signup")
    return (
        purchases.unionByName(signups)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), _money_sum(_dec2("value"), "total_value"))
    )


def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: INTERSECT — users who both purchased and signed up."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select("user_id")
    b = events.filter(F.col("event_type") == "signup").select("user_id")
    return a.intersect(b)


def u2b_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: EXCEPT — purchasers who never hit an error."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select("user_id")
    b = events.filter(F.col("event_type") == "error").select("user_id")
    return a.subtract(b)  # set-semantics EXCEPT, matches SQL EXCEPT


# --------------------------------------------------------------------------
# scalar functions (F-family) and tumbling windows (T4)
# --------------------------------------------------------------------------

def f_time_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F5: epoch extraction, epoch→timestamp round trip, fixed
    UTC+7 shift (the reference's Asia/Ho_Chi_Minh convert,
    ``ipynb:585-587``), and the ``dt_txt`` text rendering."""
    events = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")  # session tz pinned UTC
    return events.select(
        "event_id",
        F.unix_millis(ts).alias("epoch_ms"),
        F.timestamp_seconds(F.unix_seconds(ts)).cast("timestamp_ntz").alias("ts_seconds"),
        (F.col("ts") + F.expr("INTERVAL 7 HOURS")).alias("ts_ict"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("dt_txt"),
    )


def t4_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: tumbling 1-hour window aggregation via ``F.window`` — the
    same operator Structured Streaming uses (streaming/pipeline.py),
    here in batch."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _exact_avg("value", 4, "avg_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("bucket"),
            "event_type",
            "n",
            "avg_value",
        )
    )


def a13_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): two chosen
    groupings + grand total in one pass, with ``grouping_id`` to
    disambiguate NULL-as-ALL from NULL-as-value."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("v_events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(user_id % 10 AS BIGINT) AS user_bucket,
               CAST(grouping_id() AS BIGINT) AS gid,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM v_events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        """
    )


def w4_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family in one pass: rank / dense_rank /
    percent_rank / cume_dist over a TIED ordering (floor of value — so
    gap and density semantics are actually exercised), plus ntile over
    a fully-ordered window (ntile depends on physical row order, so its
    window must be a total order to be deterministic).  percent_rank
    and cume_dist are int/int divisions — engine-exact."""
    events = load_table(spark, sf_dir, "events")
    w_ties = Window.partitionBy("event_type").orderBy(F.floor("value").desc())
    w_total = Window.partitionBy("event_type").orderBy(
        F.floor("value").desc(), F.col("event_id")
    )
    return (
        events.select(
            "event_id",
            "event_type",
            "value",
            F.rank().over(w_ties).alias("rnk"),
            F.dense_rank().over(w_ties).alias("drnk"),
            F.ntile(4).over(w_total).alias("quartile"),
            F.percent_rank().over(w_ties).alias("pct_rank"),
            F.cume_dist().over(w_ties).alias("cume"),
        )
        .filter(F.col("rnk") <= 100)
    )


def t6_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 variant: sliding 1-hour window every 30 minutes — each event
    lands in exactly window/slide = 2 overlapping windows.  Spark's
    ``F.window`` explodes scan-side (narrow), so the aggregation is
    still one partial-agg shuffle; the oracle replays the epoch-aligned
    window-start arithmetic."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), _exact_avg("value", 4, "avg_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n",
            "avg_value",
        )
    )


def a6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (not in the reference; free Catalyst
    built-in — SURVEY.md §2.5 'not present' list)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _money_sum(_dec2("l_quantity"), "sum_qty"),
        )
    )


def a7_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two group dimensions."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.cube("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), _exact_avg("value", 4, "avg_value"))
    )


def a8_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (partial-agg friendly: Spark plans
    expand + two-phase aggregate)."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct("user_id", "event_type").alias("n_user_type_pairs"),
    )


def _a8b_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — Spark's sketch is not
    replayable in another engine, so the driver row stays rows-only;
    to make it SELF-verifying the query grades itself against the
    exact counts and emits ``within_5pct`` (integer arithmetic:
    ``|approx−exact|·20 ≤ exact``) — and FILTERS on it, so an
    out-of-bound sketch produces 0 rows instead of 1: the rows-only
    driver check (which records only the row count) detects a
    violation without needing an oracle.  The exact twin columns are
    the grading harness — a true 100 TB deployment drops them and
    keeps only the sketch (that cost profile is why a8b exists next to
    a8); ``a22_hll_distinct`` is the oracle-checked deterministic
    counterpart."""
    events = load_table(spark, sf_dir, "events")
    agg = events.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.approx_count_distinct("event_id", rsd=0.02).alias("approx_events"),
        F.countDistinct("user_id").alias("exact_users"),
        F.countDistinct("event_id").alias("exact_events"),
    )
    within = (
        (F.abs(F.col("approx_users") - F.col("exact_users")) * 20
         <= F.col("exact_users"))
        & (F.abs(F.col("approx_events") - F.col("exact_events")) * 20
           <= F.col("exact_events"))
    )
    # the error bound travels IN the output schema (integer ppm, the
    # a25/x30 grading recipe) so the rows-only driver check records not
    # just "a row survived the 5% filter" but the measured error itself
    err_ppm = lambda a, e: F.expr(f"abs({a} - {e}) * 1000000 DIV {e}")  # noqa: E731
    return agg.select(
        "approx_users",
        "approx_events",
        "exact_users",
        "exact_events",
        err_ppm("approx_users", "exact_users").alias("users_err_ppm"),
        err_ppm("approx_events", "exact_events").alias("events_err_ppm"),
        within.alias("within_5pct"),
    ).filter(F.col("within_5pct"))


NO_ORACLE = {
    "a8b_approx_count_distinct": _a8b_approx_count_distinct,
}


def j3_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: as-of backward join — each event matched to the latest
    *prior day's* per-user summary (forecast-vs-actual shape).  Uses
    the union-scan trick (operators/asof.py): one sort, no range-join
    blowup."""
    from data_engineer_project_weather_analytics_spark.operators.asof import asof_join_backward

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(
            "user_id",
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day_ts"),
        )
        .agg(_exact_avg("value", 4, "day_avg"))
        # "prior day" semantics: the summary becomes visible at the
        # *end* of its day, so events match yesterday's summary
        .select(
            "user_id",
            (F.col("day_ts") + F.expr("INTERVAL 1 DAY")).alias("day_ts"),
            "day_avg",
        )
    )
    left = events.select("user_id", "event_id", "ts", "value")
    return asof_join_backward(
        left,
        daily,
        on=["user_id"],
        left_ts="ts",
        right_ts="day_ts",
        value_cols=["day_avg"],
    ).select("user_id", "event_id", "ts", "value", "day_avg")


def j4_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: range (interval) join — events matched to OVERLAPPING
    9-hour observation windows on a 6-hour stride (every event falls
    in 1-2 windows), then rolled up per window.

    Executed as the bucket-explode equi-join
    (operators/range_join.py) — a theta-join here would plan as a
    BroadcastNestedLoopJoin, the O(|L|·|R|) shape that cannot scale;
    the plan gate in tests/test_plans.py asserts it does not.  The
    value rollup floor-quantizes to cents before the exact integer
    sum (cross-engine determinism: no decimal cast of arbitrary
    doubles, no round())."""
    from data_engineer_project_weather_analytics_spark.operators.range_join import bucketed_range_join

    events = load_table(spark, sf_dir, "events")
    joined = bucketed_range_join(
        events.select("ts", "user_id", "value"),
        _obs_windows(spark),
        left_ts="ts",
        start_col="win_start",
        end_col="win_end",
        bucket_seconds=3 * 3600,
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
            "value_cents"
        ),
    )


def _obs_windows(spark: SparkSession) -> DataFrame:
    """120 observation windows on a 6-hour stride, each 9 hours wide —
    consecutive windows OVERLAP by 3 hours, covering the 30-day event
    span (shared by j4/j5; oracle mirror: generate_series)."""
    base = F.timestamp_seconds(
        F.lit(1704067200) + F.col("window_id") * 21600
    ).cast("timestamp_ntz")
    return (
        spark.range(120)
        .select(F.col("id").alias("window_id"))
        .select(
            "window_id",
            base.alias("win_start"),
            (base + F.expr("INTERVAL 9 HOURS")).alias("win_end"),
        )
    )


def j5_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: interval×interval overlap join — per-user daily activity
    spans ``[min(ts), max(ts)+1s)`` matched to every OVERLAPPING
    observation window, rolled up per window.

    Executed by the canonical-bucket overlap join
    (operators/range_join.py:interval_overlap_join): both interval
    sides explode into 6-hour buckets and equi-join, with each
    qualifying pair emitted exactly once from the bucket containing
    the first instant of its overlap — no theta-join, no post-join
    distinct.  The plan gate asserts no BroadcastNestedLoopJoin."""
    from data_engineer_project_weather_analytics_spark.operators.range_join import interval_overlap_join

    events = load_table(spark, sf_dir, "events")
    spans = events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.min("ts").alias("span_start"),
        (F.max("ts") + F.expr("INTERVAL 1 SECOND")).alias("span_end"),
    )
    joined = interval_overlap_join(
        spans,
        _obs_windows(spark),
        left_start="span_start",
        left_end="span_end",
        right_start="win_start",
        right_end="win_end",
        bucket_seconds=6 * 3600,
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.count_distinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# TPC-H-style volume queries (bench headliners)
# --------------------------------------------------------------------------

def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide scan + 4-group hash aggregate.  The filter
    and 7-column read schema push into the scan; everything before the
    exchange is one codegen stage."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _revenue()
    charge = disc_price * (F.lit(1.0) + F.col("l_tax")).cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum(_dec2("l_quantity"), "sum_qty"),
            _money_sum(_dec2("l_extendedprice"), "sum_base_price"),
            _money_sum(disc_price, "sum_disc_price"),
            _money_sum(charge, "sum_charge"),
            _exact_avg("l_quantity", 4, "avg_qty"),
            _exact_avg("l_extendedprice", 4, "avg_price"),
            _exact_avg("l_discount", 6, "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k.
    customer (filtered, but still SF-proportional) broadcasts into
    orders only while its size estimate fits; orders⋈lineitem is the
    one real shuffle; top-10 via TakeOrdered."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    )
    return (
        lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        )
        .join(maybe_broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_money_sum(_revenue(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join, one fact shuffle
    (orders⋈lineitem), grouped rollup per nation.  nation/region
    (constant 25/5 rows) force-broadcast; customer/supplier (SF-
    scaling) broadcast only under the size threshold."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(maybe_broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(maybe_broadcast(supplier), lineitem["l_suppkey"] == supplier["s_suppkey"])
        .join(F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(_money_sum(_revenue(), "revenue"))
    )
