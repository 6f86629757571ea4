"""Advanced analytics queries: session windows, pivot, percentiles,
the SQL entry point, and additional TPC-H shapes.

These extend the reference surface with operators any BI/dashboard
workload grows into (SURVEY.md lists them as natural extensions); all
are oracle-checked except where noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.plans.core import _dec2, _money_sum, _revenue
from data_engineer_project_weather_analytics_spark.plans.hints import maybe_broadcast
from data_engineer_project_weather_analytics_spark.sources.catalog import load_table


def w3_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via the native
    ``session_window`` operator — the same state machine Structured
    Streaming uses for streaming sessions.

    Semantics: a session extends while the next event is strictly
    within the gap of the previous; the window end is last event + gap
    (the oracle replays this with lag + a running sum)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id",
            F.session_window(F.col("ts").cast("timestamp"), "30 minutes").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money_sum(_dec2("value"), "session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").cast("timestamp_ntz").alias("session_start"),
            F.col("sw.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def a10_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily counts per event type as columns (the dashboard
    crosstab).  Explicit value list → stable schema, and Catalyst
    compiles it to one pass of conditional aggregates."""
    events = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def a9_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile``
    ≡ DuckDB ``quantile_cont``: both linear interpolation over the
    sorted set, so results agree bit-for-bit on identical input)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


def sql_entry_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL front door: ``spark.sql`` over registered
    views — big spenders via GROUP BY + HAVING + join, written in SQL
    (identical text runs on the oracle minus the decimal note)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               count(*) AS n_orders,
               round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
                   AS total_spent
        FROM v_orders o
        JOIN v_customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        HAVING count(*) >= 3
        """
    )


def sql_entry_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WITH RECURSIVE`` through the SQL front door (new in Spark 4):
    generate the min..max calendar spine by recursion and left-join
    daily event counts onto it, zero-filling silent days — the
    warehouse calendar-dimension pattern, produced by the engine
    itself rather than an external seed table.  The recursion depth is
    the day span (bounded by data, ~30 here), each step one row — this
    is the bounded-fixpoint use recursive CTEs are for, not an
    unbounded graph walk.  Identical SQL text runs on the oracle."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("v_events")
    return spark.sql(_RECURSIVE_SPINE_SQL.format(events="v_events"))


_RECURSIVE_SPINE_SQL = """
        WITH RECURSIVE spine(day) AS (
            SELECT min(CAST(ts AS DATE)) FROM {events}
            UNION ALL
            SELECT day + 1 FROM spine
            WHERE day < (SELECT max(CAST(ts AS DATE)) FROM {events})
        )
        SELECT s.day, coalesce(d.n, 0) AS n_events
        FROM spine s
        LEFT JOIN (SELECT CAST(ts AS DATE) AS day,
                          CAST(count(*) AS BIGINT) AS n
                   FROM {events} GROUP BY 1) d USING (day)
"""


def sql_entry_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — orders above their customer's own
    average (Catalyst decorrelates this into a join + aggregate; the
    reference had no optimizer at all, SURVEY.md §4.1)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders o1
        WHERE o_totalprice > 2 * (
            SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   / count(o_totalprice)
            FROM v_orders o2 WHERE o2.o_custkey = o1.o_custkey
        )
        """
    )


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + selective filter + single aggregate
    — the pushdown showcase (every predicate reaches the parquet
    row-group stats)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money_sum(
                _dec2("l_extendedprice") * F.col("l_discount").cast("decimal(4,2)"),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def tpch_q18_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: semi-join against a HAVING-filtered aggregate,
    then top-k — large-order customers."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec2("l_quantity")).alias("__qty"))
        .filter(F.col("__qty") > 150)
        .select("l_orderkey", F.col("__qty").cast("double").alias("total_qty"))
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(maybe_broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").alias("o_orderdate"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


def a11_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase (salted) aggregation — bit-identical
    to the direct groupBy thanks to exact decimal partials (the oracle
    runs the plain GROUP BY)."""
    from data_engineer_project_weather_analytics_spark.operators.skew import salted_sum_count

    events = load_table(spark, sf_dir, "events")
    out = salted_sum_count(events, ["user_id"], "value", n_salts=8)
    return out.select("user_id", F.round("total", 2).alias("total"), "n", "avg")


def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation (CASE inside sum) over
    a join — counts split by a predicate, one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_priority_lines"),
            F.sum(1 - high).alias("low_priority_lines"),
        )
    )


def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share — ratio of two exact
    decimal sums over one scan (part dimension broadcast while its
    size estimate fits; part scales with SF)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = _revenue()
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return (
        li.join(maybe_broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders with ≥1 late-shipped
    line, counted by priority.  The semi-join moves only the order key
    (no fact-row duplication) and the count is one partial-agg pass."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(
        F.col("l_shipdate") >= F.lit("1998-06-01 00:00:00").cast("timestamp_ntz")
    ).select("l_orderkey")
    return (
        orders.join(late, orders["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: filtered LEFT OUTER join + two-level aggregate
    — the distribution of per-customer order counts, customers with no
    orders included (c_count = 0)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "F"
    )
    per_cust = (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated average subquery, decorrelated into
    a per-part aggregate + re-join — revenue from lines under 20% of
    their part's average quantity.  The brand dimension filter is
    broadcast; the threshold join shuffles only the filtered lines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    li_b = li.join(
        maybe_broadcast(brand_parts), li["l_partkey"] == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresh = li_b.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (F.sum(_dec2("l_quantity")).cast("double") / F.count("l_quantity"))
        ).alias("__thr")
    )
    return (
        li_b.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("__thr"))
        .agg(
            (F.sum(_dec2("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti-
    join — above-average-balance customers who never ordered, rolled
    up by market segment.  The 1-row average broadcasts; the anti-join
    is the only shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec2("c_acctbal")).cast("double") / F.count("c_acctbal")).alias(
            "__avg"
        )
    )
    rich = customer.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__avg")
    )
    dormant = rich.join(orders, rich["c_custkey"] == orders["o_custkey"], "left_anti")
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        _money_sum(_dec2("c_acctbal"), "totacctbal"),
    )


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: five-table join with a symmetric two-nation
    predicate, yearly revenue rollup.  Both nation sides (constant 25
    rows) force-broadcast; customer/supplier (SF-scaling) broadcast
    size-conditionally; the fact chain (lineitem→orders) is the only
    unconditional big shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(maybe_broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(maybe_broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__cn_key"))
        .filter(
            ((F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY"))
            | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "FRANCE"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(_money_sum(_revenue(), "revenue"), F.count(F.lit(1)).alias("n_lines"))


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer in a date
    window, top 20 — join + agg + TakeOrdered (no global sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    q = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
            ),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .join(maybe_broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
    )
    return (
        q.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_money_sum(_revenue(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def tpch_q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: equi-join with a DISJUNCTIVE residual predicate
    — three (brand, size-range, quantity-range) arms OR-ed together.
    The join stays a hash equi-join on partkey (the planner must not
    fall back to a nested loop); the brand/size disjunction prunes the
    part side at the scan, the quantity arms filter post-join.
    Simplification vs reference Q19 (PARITY.md): no p_container /
    l_shipmode columns in the testdata, so those conjuncts are
    dropped; shape and plan properties are the Q19 ones."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    part_f = part.filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15))
    )
    j = li.join(maybe_broadcast(part_f), li["l_partkey"] == part_f["p_partkey"])
    arms = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30))
    )
    return j.filter(arms).agg(
        _money_sum(_revenue(), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: view-over-aggregate + scalar-max self-reference
    — the quarter's revenue per supplier, keeping the top one(s).  The
    per-supplier aggregate is computed ONCE and reused for both the
    max (1-row broadcast) and the equality filter; the max comparison
    runs on the exact decimal sum, so ties are engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("__rev"))
    )
    mx = rev.agg(F.max("__rev").alias("__mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("__rev") == F.col("__mx"))
        .join(supplier, rev["l_suppkey"] == supplier["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("__rev").cast("double"), 2).alias("total_revenue"),
        )
    )


def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute
    group, with an excluded-supplier anti-join.  The testdata has no
    partsupp table, so the part↔supplier relation is derived as the
    DISTINCT (l_partkey, l_suppkey) pairs of lineitem (PARITY.md);
    the reference's complaint-comment exclusion becomes a
    negative-balance exclusion (no s_comment column)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    part_f = part.filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").startswith("MEDIUM"))
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = supplier.filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        ps.join(maybe_broadcast(part_f), ps["l_partkey"] == part_f["p_partkey"])
        .join(bad, ps["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value for one nation's suppliers,
    kept where the value exceeds a fraction of the nation-wide total
    (scalar subquery threshold).  partsupp value is surrogated by
    lineitem revenue (PARITY.md: no ps_supplycost/ps_availqty in the
    testdata).  The per-part aggregate feeds both the total (1-row
    broadcast) and the filter — one scan, one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nat_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey")
    val = (
        li.join(nat_supp, li["l_suppkey"] == nat_supp["s_suppkey"], "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).alias("__val"))
    )
    tot = val.agg(F.sum("__val").alias("__tot"))
    return (
        val.join(F.broadcast(tot))
        .filter(
            F.col("__val").cast("double")
            > F.col("__tot").cast("double") * F.lit(0.001)
        )
        .select(
            "l_partkey",
            F.round(F.col("__val").cast("double"), 2).alias("part_value"),
        )
    )


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — the 8-table join
    (part, lineitem, supplier, orders, customer, nation ×2, region),
    yearly share of one supplier-nation's revenue inside one region's
    ECONOMY-part market.

    Fully expressible on the testdata schema (no partsupp needed).
    Scale shape: the two constant tables (nation, region) force-
    broadcast; SF-scaling part/customer/supplier go through
    ``maybe_broadcast`` (size-conditional); lineitem→orders is the one
    unconditional fact shuffle.  The share is
    ``coalesce(cast(exact_sum_num as double),0) / cast(exact_sum_den
    as double)`` — exact decimal sums, one double division, unrounded
    (cross-engine float rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    # customer-side nation restricted to the AMERICA region
    n1 = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .select(F.col("n_nationkey").alias("__cn_key"))
    )
    # supplier-side nation provides the share subject
    n2 = nation.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    part_f = part.filter(F.col("p_type") == "ECONOMY")
    orders_f = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    joined = (
        li.join(maybe_broadcast(part_f), li["l_partkey"] == part_f["p_partkey"], "left_semi")
        .join(orders_f, li["l_orderkey"] == orders_f["o_orderkey"])
        .join(maybe_broadcast(customer), orders_f["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("__cn_key"), "left_semi")
        .join(maybe_broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("__sn_key"))
    )
    vol = _revenue()
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        (
            F.coalesce(
                F.sum(F.when(F.col("supp_nation") == "NATION_11", vol)).cast("double"),
                F.lit(0.0),
            )
            / F.sum(vol).cast("double")
        ).alias("mkt_share"),
        _money_sum(vol, "total_volume"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by nation and year.  The
    testdata has no partsupp, so ``ps_supplycost`` is surrogated as
    ``0.5 * p_retailprice`` (PARITY.md); profit =
    ``l_extendedprice*(1-l_discount) - 0.5*p_retailprice*l_quantity``,
    computed entirely in exact decimal (l_quantity is integral,
    p_retailprice is 2-dp — both decimal-cast-safe) and summed exactly
    before the one double cast.

    Scale shape: part is filtered (name predicate) then
    size-conditionally broadcast; nation (constant) force-broadcast;
    lineitem→orders is the fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")

    part_f = part.filter(F.col("p_name").contains("red")).select(
        "p_partkey", "p_retailprice"
    )
    supply_cost = (
        _dec2("p_retailprice") * F.lit("0.5").cast("decimal(2,1)") * _dec2("l_quantity")
    )
    amount = _revenue() - supply_cost
    joined = (
        li.join(maybe_broadcast(part_f), li["l_partkey"] == part_f["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(maybe_broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .join(F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"])
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(_money_sum(amount, "sum_profit"), F.count(F.lit(1)).alias("n_lines"))


def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept orders waiting — the
    correlated EXISTS / NOT-EXISTS pair over lineitems of the same
    order.  The testdata has no receipt/commit dates (PARITY.md), so
    "late" is surrogated as ``l_shipdate > o_orderdate + 90 days``; a
    supplier blocks a finalized multi-supplier order when it is the
    ONLY late supplier on it.

    Scale shape: the EXISTS/NOT-EXISTS pair is re-expressed as ONE
    per-order aggregate (distinct-supplier and distinct-late-supplier
    counts) joined back to the late lines — both sides shuffle on
    ``l_orderkey``, so the second join reuses the first exchange
    instead of the reference's two correlated self-scans; supplier is
    size-conditionally broadcast, nation (25 rows, scale-constant)
    force-broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    lo = li.join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        ).cast("int").alias("is_late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    blockers = (
        lo.filter(F.col("is_late") == 1)
        .join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        blockers.join(
            maybe_broadcast(supplier), blockers["l_suppkey"] == supplier["s_suppkey"]
        )
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_11")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def tpch_q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers sitting on excess supply of a named
    part family.  The testdata has no partsupp (PARITY.md), so
    availability is surrogated from lineitem itself: per
    (supplier, part), all-time shipped quantity stands in for
    ``ps_availqty`` and 1995 shipments for the year's demand; a pair
    qualifies when supply > 2 × demand with nonzero demand, mirroring
    Q20's ``availqty > 0.5 * sum(qty)`` inner subquery.

    Scale shape: ONE partial-agg shuffle on (suppkey, partkey) builds
    both totals (the reference's nested IN subqueries would scan
    lineitem twice); the part-name filter prunes before the join and
    is size-conditionally broadcast; the supplier probe is a semi-join
    (no row multiplication).  Quantities sum in exact decimal.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    in_1995 = (
        F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    ps = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec2("l_quantity")).alias("supply_qty"),
        F.sum(
            F.when(in_1995, _dec2("l_quantity")).otherwise(
                F.lit("0").cast("decimal(12,2)")
            )
        ).alias("demand_qty"),
    )
    part_f = part.filter(F.col("p_name").startswith("blue")).select("p_partkey")
    excess = (
        ps.join(maybe_broadcast(part_f), ps["l_partkey"] == part_f["p_partkey"])
        .filter(
            (F.col("demand_qty") > 0)
            & (F.col("supply_qty") > F.col("demand_qty") * 2)
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            excess, supplier["s_suppkey"] == excess["l_suppkey"], "left_semi"
        )
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part in one region —
    the correlated scalar-min subquery against partsupp.  The testdata
    has no partsupp or ps_supplycost (PARITY.md), so supply pairs are
    surrogated from distinct lineitem (supplier, part) and the cost by
    a deterministic key-derived pseudo-cost
    ``(s·31 + p·17) mod 10000`` — preserving the query's shape (the
    per-part min can tie, and ties all survive, exactly as in Q2).

    Scale shape: the correlated subquery de-correlates into ONE window
    min over the region-filtered supply table partitioned by part key
    — a single shuffle instead of the reference's per-part rescan.
    The part filter joins BEFORE the window (a partkey-level predicate
    commutes with a partkey-partitioned min), so the window sorts only
    qualifying parts' rows; nation/region (scale-constant) are forced
    broadcasts, the supplier side is size-conditional.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    ps = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .select(
            "l_partkey",
            "l_suppkey",
            ((F.col("l_suppkey") * 31 + F.col("l_partkey") * 17) % 10000).alias(
                "supply_cost"
            ),
        )
    )
    eu_suppliers = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part_f = part.filter(
        (F.col("p_type") == "ECONOMY") & F.col("p_size").between(1, 15)
    ).select("p_partkey")
    regional = ps.join(
        maybe_broadcast(eu_suppliers),
        ps["l_suppkey"] == F.col("s_suppkey"),
    ).join(maybe_broadcast(part_f), ps["l_partkey"] == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    return (
        regional.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


ORACLES_ADVANCED: dict[str, str] = {
    "tpch_q2_min_cost_supplier": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   (l_suppkey * 31 + l_partkey * 17) % 10000 AS supply_cost
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        ),
        eu AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ),
        regional AS (
            SELECT ps.l_partkey, ps.supply_cost,
                   eu.s_name, eu.s_acctbal, eu.n_name
            FROM ps
            JOIN eu ON ps.l_suppkey = eu.s_suppkey
            JOIN part ON ps.l_partkey = p_partkey
            WHERE p_type = 'ECONOMY' AND p_size BETWEEN 1 AND 15
        )
        SELECT s_acctbal, s_name, n_name,
               l_partkey AS p_partkey,
               CAST(supply_cost AS BIGINT) AS supply_cost
        FROM (
            SELECT *, min(supply_cost) OVER (PARTITION BY l_partkey)
                       AS min_cost
            FROM regional
        )
        WHERE supply_cost = min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "tpch_q8_market_share": """
        WITH flat AS (
            SELECT year(o_orderdate) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(1 - l_discount AS DECIMAL(4,2)) AS volume,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'AMERICA'
              AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
        SELECT CAST(o_year AS INTEGER) AS o_year,
               coalesce(CAST(sum(CASE WHEN supp_nation = 'NATION_11'
                                      THEN volume END) AS DOUBLE), 0.0)
                   / CAST(sum(volume) AS DOUBLE) AS mkt_share,
               round(CAST(sum(volume) AS DOUBLE), 2) AS total_volume,
               count(*) AS n_lines
        FROM flat
        GROUP BY o_year
    """,
    "tpch_q9_product_type_profit": """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(CAST(sum(
                   CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(1 - l_discount AS DECIMAL(4,2))
                   - CAST(p_retailprice AS DECIMAL(12,2))
                       * CAST(0.5 AS DECIMAL(2,1))
                       * CAST(l_quantity AS DECIMAL(12,2))
               ) AS DOUBLE), 2) AS sum_profit,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
    """,
    "tpch_q19_disjunctive_join": """
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE), 2)
                   AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q15_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(1 - l_discount AS DECIMAL(4,2))) AS r
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               round(CAST(r AS DOUBLE), 2) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE r = (SELECT max(r) FROM rev)
    """,
    "tpch_q16_supplier_part_counts": """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#45'
          AND p_type NOT LIKE 'MEDIUM%'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        GROUP BY p_brand, p_type, p_size
    """,
    "tpch_q11_important_parts": """
        WITH val AS (
            SELECT l_partkey,
                   sum(CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(1 - l_discount AS DECIMAL(4,2))) AS v
            FROM lineitem
            WHERE l_suppkey IN (
                SELECT s_suppkey FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_7')
            GROUP BY l_partkey
        )
        SELECT l_partkey, round(CAST(v AS DOUBLE), 2) AS part_value
        FROM val
        WHERE CAST(v AS DOUBLE) >
              CAST((SELECT sum(v) FROM val) AS DOUBLE) * 0.001
    """,
    "tpch_q7_volume_shipping": """
        SELECT supp_nation, cust_nation, l_year,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE), 2)
                   AS revenue,
               count(*) AS n_lines
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INTEGER) AS l_year,
                   l_extendedprice, l_discount
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
               OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE')
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "tpch_q10_returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE), 2)
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "tpch_q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate >= TIMESTAMP '1998-06-01 00:00:00')
        GROUP BY o_orderpriority
    """,
    "tpch_q13_order_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderstatus <> 'F'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "tpch_q17_small_quantity_revenue": """
        WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
        li_b AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN bp ON l_partkey = p_partkey
        ),
        t AS (
            SELECT l_partkey,
                   CAST(0.2 AS DOUBLE) *
                       (CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                        / count(l_quantity)) AS thr
            FROM li_b GROUP BY l_partkey
        )
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
                   AS avg_yearly,
               count(*) AS n_lines
        FROM li_b JOIN t USING (l_partkey)
        WHERE l_quantity < thr
    """,
    "tpch_q22_dormant_customers": """
        WITH avg_bal AS (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                       / count(c_acctbal) AS a
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_mktsegment,
               count(*) AS numcust,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2)
                   AS totacctbal
        FROM customer, avg_bal
        WHERE c_acctbal > a
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
    "tpch_q12_priority_shipping": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_linestatus
    """,
    "tpch_q14_promo_share": """
        SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                                     THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                          * CAST(1 - l_discount AS DECIMAL(4,2))
                                     ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                                * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
                   AS promo_revenue_pct,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
    """,
    "a11_salted_agg": """
        SELECT user_id,
               round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total,
               count(value) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(value) AS avg
        FROM events
        GROUP BY user_id
    """,
    "w3_session_windows": """
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             >= INTERVAL 30 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        numbered AS (
            SELECT *, sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2)
                   AS session_value
        FROM numbered
        GROUP BY user_id, session_id
    """,
    "a10_pivot": """
        SELECT CAST(ts AS DATE) AS day,
               count(*) FILTER (event_type = 'click')    AS click,
               count(*) FILTER (event_type = 'error')    AS error,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'signup')   AS signup,
               count(*) FILTER (event_type = 'view')     AS view
        FROM events
        GROUP BY 1
    """,
    "a9_percentiles": """
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               count(*) AS n
        FROM events
        GROUP BY event_type
    """,
    "sql_entry_having": """
        SELECT c.c_custkey, c.c_name,
               count(*) AS n_orders,
               round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
                   AS total_spent
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        HAVING count(*) >= 3
    """,
    "sql_entry_recursive_spine": _RECURSIVE_SPINE_SQL.format(events="events"),
    "sql_entry_correlated_subquery": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o1
        WHERE o_totalprice > 2 * (
            SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   / count(o_totalprice)
            FROM orders o2 WHERE o2.o_custkey = o1.o_custkey
        )
    """,
    "tpch_q6_forecast_revenue": """
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE), 2)
                   AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "tpch_q18_top_customers": """
        WITH big AS (
            SELECT l_orderkey,
                   CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
        FROM big
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey ASC
        LIMIT 20
    """,
    "tpch_q21_waiting_suppliers": """
        WITH lo AS (
            SELECT l_orderkey, l_suppkey,
                   CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END AS is_late
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        ),
        po AS (
            SELECT l_orderkey,
                   count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END)
                       AS n_late_supp
            FROM lo GROUP BY l_orderkey
        ),
        blockers AS (
            SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
            FROM lo JOIN po USING (l_orderkey)
            WHERE lo.is_late = 1 AND po.n_supp > 1 AND po.n_late_supp = 1
        )
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM blockers
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_11'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    "tpch_q20_excess_supply": """
        WITH ps AS (
            SELECT l_suppkey, l_partkey,
                   sum(CAST(l_quantity AS DECIMAL(12,2))) AS supply_qty,
                   sum(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
                             AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
                            THEN CAST(l_quantity AS DECIMAL(12,2))
                            ELSE CAST(0 AS DECIMAL(12,2)) END) AS demand_qty
            FROM lineitem
            GROUP BY l_suppkey, l_partkey
        ),
        excess AS (
            SELECT DISTINCT l_suppkey
            FROM ps
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'blue%'
              AND demand_qty > 0
              AND supply_qty > demand_qty * 2
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND EXISTS (SELECT 1 FROM excess e WHERE e.l_suppkey = s_suppkey)
        ORDER BY s_suppkey
    """,
}
