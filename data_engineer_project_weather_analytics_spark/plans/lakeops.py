"""Lake-operations + advanced-analytics query set (round 3, batch 4):
the table-maintenance and feature-engineering workload a 100 TB
deployment runs beside the dashboard queries.

* ``c1``  — small-file compaction planner: greedy contiguous
  bin-packing of per-partition file lists via a window cumsum — the
  planning half of an OPTIMIZE/rewrite job (the execute half is
  ``operators/upsert.UpsertTable.compact``);
* ``dq2`` — snapshot drift detection: per-segment count / distinct /
  value-mass deltas between a baseline and a current time slice in ONE
  conditional-aggregation scan (schema-stable inputs; the column-stats
  analogue of dq1's row contracts);
* ``geo1`` — grid-bucketed spatial radius join: the cell-hash
  equi-join that replaces the O(|L|·|R|) theta distance join (same
  bucket-explode trick as the temporal range join, in 2-D);
* ``a20`` — Pearson correlation + OLS slope from one pass of exact
  integer moments (the sufficient-statistics pattern: no second scan,
  no ``corr()`` builtin whose internal accumulation order is
  engine-specific);
* ``j8``  — nearest-event join (both directions): as-of backward AND
  forward in a single union-scan window, picking the closer side —
  the attribution primitive ("which click caused this purchase");
* ``x23`` — int8 scalar-quantized similarity search with exact
  rescoring: the memory-bound ANN path (4× smaller vectors, integer
  dot products) that brute-force scans the quantized corpus and
  rescores only the candidate set at full precision.

Cross-engine determinism per CLAUDE.md: integer arithmetic up to the
last operation, floor-quantized float outputs, no round(), no libm
except IEEE-correctly-rounded sqrt/division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.operators import similarity
from data_engineer_project_weather_analytics_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# C1 — small-file compaction planner
# --------------------------------------------------------------------------

#: target rows per compacted output file (stand-in for a byte budget —
#: the testdata's row counts proxy file sizes)
_COMPACT_TARGET_ROWS = 500


def c1_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan the compaction of small event "files" ((type, hour) row
    groups) into ~target-sized output bins.

    Greedy *contiguous* packing: within each event_type, files sorted
    by hour are assigned ``bin = (cumulative_rows - 1) div target`` —
    each bin closes as soon as it reaches the target, and time
    locality is preserved (a bin spans a contiguous hour range, so
    time-range pruning keeps working after the rewrite).

    Scale shape: the file inventory is a partial-agg shuffle (one row
    per (type, hour) — inventory-sized, not data-sized), the cumsum is
    a window partitioned by event_type (no global sort), and the plan
    rollup re-aggregates per bin.  At 100 TB the inventory is the
    table's file manifest, millions of rows at most — this exact plan
    holds.  All arithmetic is exact int64.
    """
    events = load_table(spark, sf_dir, "events")
    files = (
        events.groupBy(
            "event_type",
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("file_hour"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    planned = files.select(
        "event_type",
        "file_hour",
        "n_rows",
        F.expr(
            f"CAST((sum(n_rows) OVER (PARTITION BY event_type ORDER BY file_hour "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) "
            f"DIV {_COMPACT_TARGET_ROWS} AS BIGINT)"
        ).alias("bin_id"),
    )
    return planned.groupBy("event_type", "bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_rows").alias("total_rows"),
        F.min("file_hour").alias("first_hour"),
        F.max("file_hour").alias("last_hour"),
    )


# --------------------------------------------------------------------------
# DQ2 — snapshot drift detection (column stats between time slices)
# --------------------------------------------------------------------------

_DRIFT_SPLIT = "2024-01-16 00:00:00"


def dq2_drift_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-stats drift per event_type between the baseline slice
    (ts < Jan 16) and the current slice (ts ≥ Jan 16): row counts,
    distinct users, and value mass, plus the count-drift ratio.

    Scale shape: ONE fact scan with conditional aggregation — the
    naive two-query layout scans 100 TB twice and joins; this emits
    both slices' stats from the same partial aggregates.  Counts and
    cent-sums are exact int64; the single closing division is the only
    float op.
    """
    events = load_table(spark, sf_dir, "events")
    split = F.lit(_DRIFT_SPLIT).cast("timestamp_ntz")
    in_base = F.col("ts") < split
    cents = F.floor(F.col("value") * 100).cast("bigint")
    agg = events.groupBy("event_type").agg(
        F.sum(F.when(in_base, 1).otherwise(0)).cast("bigint").alias("n_base"),
        F.sum(F.when(~in_base, 1).otherwise(0)).cast("bigint").alias("n_curr"),
        F.count_distinct(F.when(in_base, F.col("user_id"))).alias("users_base"),
        F.count_distinct(F.when(~in_base, F.col("user_id"))).alias("users_curr"),
        F.coalesce(F.sum(F.when(in_base, cents)), F.lit(0)).alias("cents_base"),
        F.coalesce(F.sum(F.when(~in_base, cents)), F.lit(0)).alias("cents_curr"),
    )
    return agg.select(
        "event_type",
        "n_base",
        "n_curr",
        "users_base",
        "users_curr",
        "cents_base",
        "cents_curr",
        # exact ints, ONE double division — deterministic cross-engine
        F.try_divide(
            F.col("n_curr").cast("double"), F.col("n_base").cast("double")
        ).alias("count_ratio"),
    )


# --------------------------------------------------------------------------
# GEO1 — grid-bucketed spatial radius join
# --------------------------------------------------------------------------

_GEO_RADIUS = 8  # cell size == radius → 3×3 neighborhood suffices


def geo1_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search on a synthetic 1000×1000 integer grid: customers
    are points, suppliers are centers; count the customers within
    distance 8 of each supplier (coordinates derived deterministically
    from the keys — the testdata has no geo columns, TESTDATA.md).

    The spatial-join pattern that scales: bucket the plane into
    radius-sized cells, explode ONLY the smaller (supplier) side to
    its 3×3 cell neighborhood, equi-join on the cell id, then apply
    the exact squared-distance predicate.  A direct theta join on the
    distance plans as BroadcastNestedLoopJoin — O(|points|·|centers|)
    — the shape the temporal range join already banned in 1-D
    (operators/range_join.py); the plan gate asserts this one stays an
    equi-join too.  All arithmetic is exact int64.
    """
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    r = _GEO_RADIUS

    pts = customer.select(
        F.col("c_custkey").alias("point_id"),
        (F.col("c_custkey") % 1000).alias("px"),
        ((F.col("c_custkey") * 7) % 1000).alias("py"),
    ).select(
        "point_id",
        "px",
        "py",
        F.expr(f"px DIV {r}").alias("cx"),
        F.expr(f"py DIV {r}").alias("cy"),
    )
    centers = supplier.select(
        F.col("s_suppkey").alias("center_id"),
        ((F.col("s_suppkey") * 13) % 1000).alias("sx"),
        ((F.col("s_suppkey") * 17) % 1000).alias("sy"),
    )
    neighborhood = F.array(
        *[
            F.struct(
                (F.expr(f"sx DIV {r}") + F.lit(dx)).alias("gx"),
                (F.expr(f"sy DIV {r}") + F.lit(dy)).alias("gy"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probes = centers.select(
        "center_id", "sx", "sy", F.explode(neighborhood).alias("cell")
    ).select(
        "center_id",
        "sx",
        "sy",
        F.col("cell.gx").alias("gx"),
        F.col("cell.gy").alias("gy"),
    )
    # squared distance via integer multiplication (** would promote to
    # double through pow(); exact int64 keeps the hash engine-stable)
    dx = F.col("px") - F.col("sx")
    dy = F.col("py") - F.col("sy")
    d2 = dx * dx + dy * dy
    pairs = probes.join(
        pts,
        (F.col("gx") == pts["cx"]) & (F.col("gy") == pts["cy"]),
    ).filter(d2 <= F.lit(r * r))
    return pairs.groupBy("center_id").agg(
        F.count(F.lit(1)).alias("n_within"),
        F.min(d2).alias("min_d2"),
    )


# --------------------------------------------------------------------------
# A20 — correlation / regression from one pass of exact moments
# --------------------------------------------------------------------------

def a20_feature_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation and OLS slope of (l_quantity →
    l_extendedprice) per return flag, via sufficient statistics.

    One partial-agg scan accumulates the five moments (Σx, Σy, Σx²,
    Σy², Σxy) over integer-floored inputs — all exact int64 (bounds:
    y ≤ 1.05e5 ⇒ Σy² ≤ 2.2e16 at sf1, headroom to sf100).  The
    closing arithmetic casts each moment to double FIRST and then
    applies an identical expression tree in both engines: products,
    differences, division and sqrt are all IEEE correctly-rounded, so
    the result is bit-identical — unlike builtin ``corr()``, whose
    streaming accumulation order differs per engine.  Outputs are
    floor-quantized (repo determinism rule: never round()).
    """
    li = load_table(spark, sf_dir, "lineitem")
    xi = F.floor(F.col("l_quantity")).cast("bigint")
    yi = F.floor(F.col("l_extendedprice")).cast("bigint")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(xi).alias("sx"),
        F.sum(yi).alias("sy"),
        F.sum(xi * xi).alias("sxx"),
        F.sum(yi * yi).alias("syy"),
        F.sum(xi * yi).alias("sxy"),
    )
    n = F.col("n_rows").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    corr = num / (F.sqrt(denx) * F.sqrt(deny))
    slope = num / denx
    return m.select(
        "l_returnflag",
        "n_rows",
        F.floor(corr * 10000).cast("bigint").alias("corr_q"),
        F.floor(slope * 10000).cast("bigint").alias("slope_q"),
    )


# --------------------------------------------------------------------------
# J8 — nearest-event join (bidirectional as-of)
# --------------------------------------------------------------------------

def j8_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the time gap to the SAME user's nearest
    click — searching both backward and forward, ties to the earlier
    click.  The attribution primitive behind "which interaction drove
    this conversion".

    Scale shape: the union-scan trick from the as-of join
    (operators/asof.py), run in BOTH directions over one window: the
    two event streams union, sort once per user, and
    last/first-ignore-nulls carry the neighboring click timestamps to
    each purchase row — one shuffle of |purchases|+|clicks|, versus
    the naive per-row subquery's quadratic rescan.  Gap math is exact
    integer microseconds (temporal-join rule: sub-second nanos make
    whole-second math lossy).
    """
    events = load_table(spark, sf_dir, "events")
    ev = events.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        (F.col("event_type") == "click").alias("is_click"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    click_ts = F.when(F.col("is_click"), F.col("ts_us"))
    seq = ev.select(
        "user_id",
        "event_id",
        "ts_us",
        "is_click",
        F.last(click_ts, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_us"),
        F.first(click_ts, ignorenulls=True)
        .over(w.rowsBetween(1, Window.unboundedFollowing))
        .alias("next_us"),
    )
    d_prev = F.col("ts_us") - F.col("prev_us")
    d_next = F.col("next_us") - F.col("ts_us")
    gap = (
        F.when(F.col("prev_us").isNull(), d_next)
        .when(F.col("next_us").isNull(), d_prev)
        .when(d_prev <= d_next, d_prev)
        .otherwise(d_next)
    )
    direction = (
        F.when(F.col("prev_us").isNull() & F.col("next_us").isNull(), F.lit(None))
        .when(F.col("next_us").isNull(), F.lit("back"))
        .when(F.col("prev_us").isNull(), F.lit("fwd"))
        .when(d_prev <= d_next, F.lit("back"))
        .otherwise(F.lit("fwd"))
    )
    return (
        seq.filter(~F.col("is_click"))
        .select(
            "user_id",
            "event_id",
            gap.cast("bigint").alias("gap_us"),
            direction.cast("string").alias("direction"),
        )
    )


# --------------------------------------------------------------------------
# X23 — int8 scalar-quantized top-k with exact rescoring
# --------------------------------------------------------------------------

def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda s, v: s + v,
    )


def x23_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors for queries vec_id < 10, searched on an
    int8 scalar-quantized copy of the corpus and rescored exactly.

    The memory-bound ANN recipe (FAISS-style SQ8): one corpus pass
    finds the global max |component| (1-row broadcast), every vector
    quantizes to ``floor(x · 127/max)`` int8-range integers — 4× less
    to scan than float32, and the candidate scoring becomes exact
    int64 dot products (engine-stable, unlike float accumulation).
    The top-20 candidates per query then rescore with the
    full-precision cosine; only |queries| × 20 float dot products run.
    Quantized scan and rescore stay in whole-stage codegen
    (higher-order functions, no UDF).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", similarity._as_double("embedding").alias("emb")
    )
    mx = v.agg(
        F.max(F.array_max(F.transform("emb", F.abs))).alias("m")
    )
    qz = v.join(F.broadcast(mx)).select(
        "vec_id",
        "emb",
        # x * (127/m), NOT (x*127)/m — the oracle computes the same
        # expression tree, and IEEE rounding differs between the two
        F.transform(
            "emb", lambda x: F.floor(x * (F.lit(127.0) / F.col("m"))).cast("bigint")
        ).alias("qv"),
    )
    q = qz.select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("qv").alias("qqv"),
    ).filter(F.col("query_id") < 10)
    scored = (
        qz.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "qemb",
            "emb",
            _int_dot(F.col("qqv"), F.col("qv")).alias("iscore"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("iscore").desc(), F.col("neighbor_id")
    )
    cand = scored.withColumn("r", F.row_number().over(wq)).filter(F.col("r") <= 20)
    cos = similarity.cosine(F.col("qemb"), F.col("emb"))
    wf = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id")
    )
    return (
        cand.select("query_id", "neighbor_id", cos.alias("__cos"))
        .withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            similarity.sim_q(F.col("__cos")).alias("sim"),
        )
    )


ORACLES_LAKEOPS: dict[str, str] = {
    "c1_compaction_plan": f"""
        WITH files AS (
            SELECT event_type,
                   date_trunc('hour', ts) AS file_hour,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM events
            GROUP BY event_type, date_trunc('hour', ts)
        ),
        planned AS (
            SELECT event_type, file_hour, n_rows,
                   CAST((sum(n_rows) OVER (
                           PARTITION BY event_type ORDER BY file_hour
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                        ) - 1) // {_COMPACT_TARGET_ROWS} AS BIGINT) AS bin_id
            FROM files
        )
        SELECT event_type, bin_id,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(n_rows) AS BIGINT) AS total_rows,
               min(file_hour) AS first_hour,
               max(file_hour) AS last_hour
        FROM planned
        GROUP BY event_type, bin_id
    """,
    "dq2_drift_detect": f"""
        SELECT event_type,
               CAST(sum(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
               CAST(sum(CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_curr,
               CAST(count(DISTINCT CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                                        THEN user_id END) AS BIGINT)
                   AS users_base,
               CAST(count(DISTINCT CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}'
                                        THEN user_id END) AS BIGINT)
                   AS users_curr,
               CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                             THEN CAST(floor(value * 100) AS BIGINT) END), 0)
                    AS BIGINT) AS cents_base,
               CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}'
                             THEN CAST(floor(value * 100) AS BIGINT) END), 0)
                    AS BIGINT) AS cents_curr,
               CAST(sum(CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}'
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(sum(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                              THEN 1 ELSE 0 END) AS DOUBLE) AS count_ratio
        FROM events
        GROUP BY event_type
    """,
    "geo1_grid_join": f"""
        WITH pts AS (
            SELECT c_custkey AS point_id,
                   c_custkey % 1000 AS px,
                   (c_custkey * 7) % 1000 AS py
            FROM customer
        ),
        centers AS (
            SELECT s_suppkey AS center_id,
                   (s_suppkey * 13) % 1000 AS sx,
                   (s_suppkey * 17) % 1000 AS sy
            FROM supplier
        ),
        probes AS (
            SELECT center_id, sx, sy,
                   (sx // {_GEO_RADIUS}) + dx.dx AS gx,
                   (sy // {_GEO_RADIUS}) + dy.dy AS gy
            FROM centers
            CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dx
            CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dy
        ),
        pairs AS (
            SELECT p.center_id,
                   (t.px - p.sx) * (t.px - p.sx)
                       + (t.py - p.sy) * (t.py - p.sy) AS d2
            FROM probes p
            JOIN pts t
              ON t.px // {_GEO_RADIUS} = p.gx
             AND t.py // {_GEO_RADIUS} = p.gy
            WHERE (t.px - p.sx) * (t.px - p.sx)
                      + (t.py - p.sy) * (t.py - p.sy)
                  <= {_GEO_RADIUS * _GEO_RADIUS}
        )
        SELECT center_id,
               CAST(count(*) AS BIGINT) AS n_within,
               CAST(min(d2) AS BIGINT) AS min_d2
        FROM pairs
        GROUP BY center_id
    """,
    "a20_feature_corr": """
        WITH m AS (
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
                   CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
                       AS sy,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT)
                            * CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                       AS sxx,
                   CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)
                            * CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
                       AS syy,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT)
                            * CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
                       AS sxy
            FROM lineitem
            GROUP BY l_returnflag
        )
        SELECT l_returnflag, n_rows,
               CAST(floor(
                   (CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (sqrt(CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * sqrt(CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                   * 10000) AS BIGINT) AS corr_q,
               CAST(floor(
                   (CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * 10000) AS BIGINT) AS slope_q
        FROM m
    """,
    "j8_nearest_event_join": """
        WITH ev AS (
            SELECT user_id, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                   event_type = 'click' AS is_click
            FROM events
            WHERE event_type IN ('purchase', 'click')
        ),
        seq AS (
            SELECT user_id, event_id, ts_us, is_click,
                   last_value(CASE WHEN is_click THEN ts_us END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_us,
                   first_value(CASE WHEN is_click THEN ts_us END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS next_us
            FROM ev
        )
        SELECT user_id, event_id,
               CAST(CASE
                   WHEN prev_us IS NULL THEN next_us - ts_us
                   WHEN next_us IS NULL THEN ts_us - prev_us
                   WHEN ts_us - prev_us <= next_us - ts_us THEN ts_us - prev_us
                   ELSE next_us - ts_us
               END AS BIGINT) AS gap_us,
               CAST(CASE
                   WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
                   WHEN next_us IS NULL THEN 'back'
                   WHEN prev_us IS NULL THEN 'fwd'
                   WHEN ts_us - prev_us <= next_us - ts_us THEN 'back'
                   ELSE 'fwd'
               END AS VARCHAR) AS direction
        FROM seq
        WHERE NOT is_click
    """,
    "x23_sq8_topk": """
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ),
        mx AS (
            SELECT max(list_max(list_transform(emb, x -> abs(x)))) AS m
            FROM v
        ),
        qz AS (
            SELECT vec_id, emb,
                   list_transform(
                       emb, x -> CAST(floor(x * (127.0 / m)) AS BIGINT)
                   ) AS qv
            FROM v, mx
        ),
        q AS (
            SELECT vec_id AS query_id, emb AS qemb, qv AS qqv
            FROM qz WHERE vec_id < 10
        ),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id, q.qemb, c.emb,
                   CAST(list_sum(list_transform(
                       generate_series(1, len(q.qqv)),
                       i -> q.qqv[i] * c.qv[i]
                   )) AS BIGINT) AS iscore
            FROM qz c CROSS JOIN q
            WHERE c.vec_id <> q.query_id
        ),
        cand AS (
            SELECT query_id, neighbor_id, qemb, emb
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY iscore DESC, neighbor_id) AS r
                FROM scored
            ) WHERE r <= 20
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY list_cosine_similarity(qemb, emb) DESC,
                            neighbor_id) AS INTEGER) AS rank,
               CAST(floor(list_cosine_similarity(qemb, emb) * 10000) AS BIGINT)
                   AS sim
        FROM cand
        QUALIFY rank <= 5
    """,
}
