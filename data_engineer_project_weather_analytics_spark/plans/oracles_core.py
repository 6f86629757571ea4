"""DuckDB oracle SQL for the core query set (plans/core.py).

Each statement is the ANSI-SQL ground truth for the same-named Spark
query; the correctness driver runs both at sf=0.01 and compares
row-count + schema + order-insensitive value hash.  Column aliases and
all rounding/decimal casts mirror the Spark side exactly — money sums
go through ``DECIMAL(12,2)`` so the arithmetic is exact (order
independent) in both engines.
"""

from __future__ import annotations

#: CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))
_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"

ORACLES_CORE: dict[str, str] = {
    "p7_filter_projection": """
        SELECT event_id, user_id, round(value * 2, 2) AS double_value
        FROM events
        WHERE event_type = 'purchase' AND value > 100.0
    """,
    "p1_json_flatten": """
        SELECT event_id, TRY_CAST(props->>'$.k' AS INTEGER) AS prop_k
        FROM events
    """,
    "p10_range_filter": """
        SELECT event_id, user_id, event_type, ts, value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
          AND ts <  TIMESTAMP '2024-01-12 00:00:00'
          AND event_type <> 'error'
    """,
    "a1_scorecard": """
        SELECT
            count(*) AS n_readings,
            CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(value) AS avg_value,
            round(min(value), 2) AS min_value,
            round(max(value), 2) AS max_value,
            round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_value
        FROM events
        WHERE event_type <> 'error'
    """,
    "a2_daily_timeseries": """
        SELECT
            CAST(ts AS DATE) AS day,
            CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(value) AS avg_value,
            count(*) AS n_events
        FROM events
        GROUP BY 1
    """,
    "a3_latest_per_key": """
        SELECT user_id, event_id, ts, event_type, value
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    "a4_distinct": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    "a5_latest_join_dim": """
        WITH latest AS (
            SELECT user_id, event_id, ts, value
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        )
        SELECT l.user_id, c.c_name, c.c_acctbal, l.event_id, l.ts, l.value
        FROM latest l
        JOIN customer c ON l.user_id = c.c_custkey
    """,
    "j1_dim_join_agg": f"""
        SELECT
            n_name,
            round(CAST(sum({_REV}) AS DOUBLE), 2) AS revenue,
            count(*) AS n_lines
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "j2_anti_join": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "j2b_semi_join": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
    """,
    "ri_orphan_check": """
        SELECT DISTINCT user_id
        FROM events
        WHERE NOT EXISTS (
            SELECT 1 FROM customer WHERE c_custkey = user_id)
    """,
    "ri_cascade_delete": """
        WITH doomed AS (
            SELECT n_nationkey FROM nation
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        ),
        nn AS (
            -- NOT EXISTS, not NOT IN: a NULL key must be KEPT (anti-join
            -- / Postgres CASCADE semantics), not swallowed by NULL IN
            SELECT n_nationkey, n_name FROM nation n
            WHERE NOT EXISTS (
                SELECT 1 FROM doomed d WHERE d.n_nationkey = n.n_nationkey)
        ),
        nc AS (
            SELECT c_nationkey, count(*) AS n FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM doomed d WHERE d.n_nationkey = c.c_nationkey)
            GROUP BY c_nationkey
        ),
        ns AS (
            SELECT s_nationkey, count(*) AS n FROM supplier s
            WHERE NOT EXISTS (
                SELECT 1 FROM doomed d WHERE d.n_nationkey = s.s_nationkey)
            GROUP BY s_nationkey
        )
        SELECT nn.n_nationkey, nn.n_name,
               CAST(coalesce(nc.n, 0) AS BIGINT) AS n_customers,
               CAST(coalesce(ns.n, 0) AS BIGINT) AS n_suppliers
        FROM nn
        LEFT JOIN nc ON nc.c_nationkey = nn.n_nationkey
        LEFT JOIN ns ON ns.s_nationkey = nn.n_nationkey
    """,
    "k2_upsert_lww": """
        WITH base AS (
            SELECT event_id, user_id, ts, value, 0 AS ingest_seq FROM events
        ), redelivery AS (
            SELECT event_id, user_id, ts,
                   round(value + 1000.0, 2) AS value, 1 AS ingest_seq
            FROM events WHERE event_id % 7 = 0
        ), merged AS (
            SELECT * FROM base UNION ALL SELECT * FROM redelivery
        )
        SELECT event_id, user_id, ts, value
        FROM merged
        QUALIFY row_number() OVER (
            PARTITION BY event_id ORDER BY ingest_seq DESC) = 1
    """,
    "k3_insert_if_absent": """
        SELECT DISTINCT user_id AS new_key
        FROM events
        WHERE NOT EXISTS (
            SELECT 1 FROM customer
            WHERE c_custkey % 2 = 0 AND c_custkey = user_id)
    """,
    "a6_rollup": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "a7_cube": """
        SELECT event_type, CAST(ts AS DATE) AS day,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(value) AS avg_value
        FROM events
        GROUP BY CUBE (event_type, CAST(ts AS DATE))
    """,
    "a8_count_distinct": """
        SELECT count(DISTINCT user_id) AS n_users,
               count(DISTINCT event_type) AS n_types,
               -- FILTER aligns with Spark's countDistinct(a, b), which
               -- skips rows where ANY argument is NULL (DuckDB's row
               -- struct (NULL, x) would otherwise count as distinct)
               count(DISTINCT (user_id, event_type))
                   FILTER (user_id IS NOT NULL AND event_type IS NOT NULL)
                   AS n_user_type_pairs
        FROM events
    """,
    "j3_asof_join": """
        WITH daily AS (
            SELECT user_id,
                   date_trunc('day', ts) + INTERVAL 1 DAY AS day_ts,
                   CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(value) AS day_avg
            FROM events
            GROUP BY 1, 2
        )
        SELECT e.user_id, e.event_id, e.ts, e.value, d.day_avg
        FROM events e
        ASOF LEFT JOIN daily d
          ON e.user_id = d.user_id AND e.ts >= d.day_ts
    """,
    "j4_range_join_windows": """
        WITH windows AS (
            SELECT w AS window_id,
                   TIMESTAMP '2024-01-01 00:00:00' + to_hours(6 * w) AS win_start,
                   TIMESTAMP '2024-01-01 00:00:00' + to_hours(6 * w + 9) AS win_end
            FROM (SELECT unnest(generate_series(0, 119)) AS w)
        )
        SELECT w.window_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
               CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events e
        JOIN windows w
          ON e.ts >= w.win_start AND e.ts < w.win_end
        GROUP BY w.window_id
    """,
    "j5_interval_overlap": """
        WITH windows AS (
            SELECT w AS window_id,
                   TIMESTAMP '2024-01-01 00:00:00' + to_hours(6 * w) AS win_start,
                   TIMESTAMP '2024-01-01 00:00:00' + to_hours(6 * w + 9) AS win_end
            FROM (SELECT unnest(generate_series(0, 119)) AS w)
        ),
        spans AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   min(ts) AS span_start,
                   max(ts) + INTERVAL 1 SECOND AS span_end
            FROM events
            GROUP BY user_id, CAST(ts AS DATE)
        )
        SELECT w.window_id,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(count(DISTINCT s.user_id) AS BIGINT) AS n_users
        FROM spans s
        JOIN windows w
          ON s.span_start < w.win_end AND w.win_start < s.span_end
        GROUP BY w.window_id
    """,
    "w2_moving_avg": """
        SELECT
            user_id,
            event_id,
            CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
              / count(value) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mavg3,
            lag(value, 1) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        FROM events
    """,
    "o2_topk": """
        SELECT event_id, user_id, value
        FROM events
        ORDER BY value DESC, event_id ASC
        LIMIT 10
    """,
    "u1_union_agg": """
        WITH unioned AS (
            SELECT * FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT * FROM events WHERE event_type = 'signup'
        )
        SELECT
            event_type,
            count(*) AS n,
            round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value
        FROM unioned
        GROUP BY event_type
    """,
    "u2_intersect": """
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    "u2b_except": """
        SELECT user_id FROM events WHERE event_type = 'purchase'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error'
    """,
    "f_time_scalars": """
        SELECT
            event_id,
            epoch_ms(ts) AS epoch_ms,
            date_trunc('second', ts) AS ts_seconds,
            ts + INTERVAL 7 HOUR AS ts_ict,
            strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt_txt
        FROM events
    """,
    "t4_hourly_window": """
        SELECT
            date_trunc('hour', ts) AS bucket,
            event_type,
            count(*) AS n,
            CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(value) AS avg_value
        FROM events
        GROUP BY 1, 2
    """,
    "a13_grouping_sets": """
        SELECT event_type,
               CAST(user_id % 10 AS BIGINT) AS user_bucket,
               CAST(GROUPING(event_type, user_id % 10) AS BIGINT) AS gid,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    """,
    "w4_rank_functions": """
        SELECT * FROM (
            SELECT event_id, event_type, value,
                   CAST(rank() OVER w1 AS INTEGER) AS rnk,
                   CAST(dense_rank() OVER w1 AS INTEGER) AS drnk,
                   CAST(ntile(4) OVER w2 AS INTEGER) AS quartile,
                   percent_rank() OVER w1 AS pct_rank,
                   cume_dist() OVER w1 AS cume
            FROM events
            WINDOW w1 AS (PARTITION BY event_type ORDER BY floor(value) DESC),
                   w2 AS (PARTITION BY event_type
                          ORDER BY floor(value) DESC, event_id)
        ) WHERE rnk <= 100
    """,
    "t6_sliding_window": """
        WITH w AS (
            SELECT unnest([
                       make_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT)
                                      * 1800 * 1000000),
                       make_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) - 1)
                                      * 1800 * 1000000)
                   ]) AS window_start,
                   value
            FROM events
        )
        SELECT window_start,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(value)
                   AS avg_value
        FROM w
        GROUP BY window_start
    """,
    "tpch_q1_pricing_summary": f"""
        SELECT
            l_returnflag,
            l_linestatus,
            round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
            round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
            round(CAST(sum({_REV}) AS DOUBLE), 2) AS sum_disc_price,
            round(CAST(sum(({_REV}) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE), 2) AS sum_charge,
            CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
            CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
            count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q3_shipping_priority": f"""
        SELECT
            o_orderkey,
            o_orderdate,
            o_orderpriority,
            round(CAST(sum({_REV}) AS DOUBLE), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "tpch_q5_local_volume": f"""
        SELECT
            r_name,
            n_name,
            round(CAST(sum({_REV}) AS DOUBLE), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY r_name, n_name
    """,
}
