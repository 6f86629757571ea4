"""Lake-operations + advanced-analytics query set (round 3, batches
4-7): the table-maintenance, sketching, and feature-engineering
workload a 100 TB deployment runs beside the dashboard queries.

Maintenance / operations: ``c1`` compaction planner (window-cumsum
bin-packing over the file inventory), ``dq2`` snapshot column-drift
detection (one conditional-agg scan).

Joins: ``geo1`` grid-bucketed spatial radius join (2-D bucket-explode
equi-join), ``j8`` nearest-event bidirectional as-of (one union-scan
window), ``j9`` bloom-filter semi-join reduction (scale-constant
bitmap, measured false positives).

Sketches (all mergeable via partial aggregation): ``x24`` count-min
heavy hitters, ``a21`` histogram quantiles vs exact rank statistics,
``a22`` portable HyperLogLog (oracle-checked bit-for-bit).

Analytics: ``a20`` correlation/OLS from one-pass exact moments,
``a23`` event-time RANGE-frame trailing window, ``a24`` rank-bound
winsorization, ``w9`` daily-grid resampling with linear
interpolation, ``w10`` CUSUM change-point detection (prefix-min
closed form), ``w11`` rolling median (bounded sorted frames),
``w12`` burst debounce, ``mb1``/``mb2`` market-basket pairs and
association rules, ``g1`` degree-oriented triangle counting,
``mv2`` incremental join-view repair, ``j11`` linear multi-touch
attribution, ``x23`` int8 scalar-quantized ANN with exact rescoring,
``x26`` exact-integer balanced downsampling, ``x27`` adaptive
stopword stripping, ``x28`` leave-one-out target encoding.

Cross-engine determinism per CLAUDE.md: integer arithmetic up to the
last operation, floor-quantized float outputs, no round(), no libm
except IEEE-correctly-rounded sqrt/division; portable md5 bucketing
via conv(hex) ≡ ('0x'||hex)::BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.operators import similarity
from data_engineer_project_weather_analytics_spark.plans.corpus import (
    SQL_BASKET_ELIGIBLE_CTE,
    SQL_COPURCHASE_EDGES_CTE,
)
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


# --------------------------------------------------------------------------
# X24 — count-min sketch heavy hitters
# --------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 512


def _cms_bucket(col: Column, row: int) -> Column:
    """Row-``row`` CMS bucket of a token: first 8 md5 hex chars → int,
    mod width.  md5 is the one keyed hash both engines share (the
    MinHash lesson); ``conv(hex)`` here ≡ DuckDB's ``('0x'||hex)::BIGINT``."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}#"), col)), 1, 8), 16, 10
        ).cast("bigint")
        % _CMS_WIDTH
    )


def x24_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimates for the corpus's 30 most frequent tokens,
    reported against their exact counts.

    The bounded-memory frequency sketch: d×w counters (4×512 int64s
    here) replace the unbounded per-token hash table — at 100 TB the
    sketch aggregation state is 16 KB per task no matter how large the
    vocabulary grows, and sketches from different partitions merge by
    addition (classic CMS mergeability), which IS Spark's partial
    aggregation.  ``est(w) = min over rows of counter[row][h_row(w)]``
    upper-bounds the true count (only overestimates, by hash-collision
    mass).  The exact top-30 (a TakeOrdered over the token counts) is
    computed only to *grade* the sketch — a pure-sketch deployment
    skips it.  All counts exact int64; md5 bucketing is engine-portable.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    tagged = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"), _cms_bucket(F.col("w"), d).alias("bucket")
                    )
                    for d in range(_CMS_DEPTH)
                ]
            )
        ).alias("rb")
    )
    sketch = (
        tagged.select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    heavy = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "w")
        .limit(30)
    )
    probes = heavy.select(
        "w",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"), _cms_bucket(F.col("w"), d).alias("bucket")
                    )
                    for d in range(_CMS_DEPTH)
                ]
            )
        ).alias("rb"),
    ).select("w", "n_exact", "rb.row", "rb.bucket")
    return (
        probes.join(sketch, ["row", "bucket"])
        .groupBy(F.col("w").alias("token"), "n_exact")
        .agg(F.min("cnt").alias("cms_est"))
    )


# --------------------------------------------------------------------------
# MB1 — market-basket co-occurrence (frequent pairs)
# --------------------------------------------------------------------------

def mb1_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part pairs co-purchased in the same order (frequent-
    itemset support counts — the recommendation/association primitive).

    Scale shape: distinct (order, part) items shuffle ONCE on the
    order key; the pair self-join reuses that exchange on both sides
    (ReuseExchange), so pair emission is map-side within each order's
    partition.  Mega-baskets are excluded BEFORE pair emission
    (2 ≤ items ≤ 10) — an uncapped basket of n items emits n²/2 pairs,
    the same hot-key blowup the LSH bucket cap guards against; the
    cap keeps per-order fan-out ≤ 45 pairs.  Top-20 is
    TakeOrderedAndProject with a total-order tiebreak.
    """
    from data_engineer_project_weather_analytics_spark.plans.corpus import eligible_basket_items

    li = load_table(spark, sf_dir, "lineitem")
    eligible = eligible_basket_items(li)
    a = eligible.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = eligible.select("l_orderkey", F.col("l_partkey").alias("p2"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "p1", "p2")
        .limit(20)
    )


# --------------------------------------------------------------------------
# MB2 — association rules (confidence / lift over frequent pairs)
# --------------------------------------------------------------------------

def mb2_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the co-purchase pairs: support,
    both-direction confidence, and lift for the top-20 pairs by lift —
    the scoring step that turns mb1's raw counts into rankable rules.

    All three metrics are ratios, so they are emitted as integer
    quantizations computed with int64 cross-multiplication
    (``x·10⁴ div y``) — never a float division per rule, never
    round().  Shape: the same single (order, part) exchange feeds the
    pair self-join and both item-count aggregations (ReuseExchange);
    the 1-row basket total broadcasts; top-20 is TakeOrdered with a
    total-order tiebreak.  Support floor ≥ 3 prunes the rule table
    before ranking.

    int64 headroom (the tightest of the integer quantizations): lift_q
    evaluates ``n_pair·n_orders·10⁴`` before dividing by ``n_a·n_b``,
    so exactness needs ``n_pair·n_orders < 2⁶³/10⁴ ≈ 9.2e14`` — with
    TPC-H popularity (a pair appears in ≪ 1e-4 of baskets) that holds
    through SF ~10⁵ (n_orders ~1.5e11), far past the 100 TB target.
    Reassociating (``(n_pair·10⁴ div n_a)·n_orders div n_b``) would
    widen headroom but loses exactness to the intermediate integer
    truncation; revisit only if baskets stop being sparse.
    """
    from data_engineer_project_weather_analytics_spark.plans.corpus import eligible_basket_items

    li = load_table(spark, sf_dir, "lineitem")
    eligible = eligible_basket_items(li)
    a = eligible.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = eligible.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 3)
    )
    item_n = eligible.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    n_orders = eligible.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    i1 = item_n.select(F.col("l_partkey").alias("p1"), F.col("n_item").alias("n_a"))
    i2 = item_n.select(F.col("l_partkey").alias("p2"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(i1, "p1")
        .join(i2, "p2")
        .join(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "n_pair",
            F.expr("CAST(n_pair * 10000 DIV n_a AS BIGINT)").alias("conf_ab_q"),
            F.expr("CAST(n_pair * 10000 DIV n_b AS BIGINT)").alias("conf_ba_q"),
            F.expr(
                "CAST(n_pair * n_orders * 10000 DIV (n_a * n_b) AS BIGINT)"
            ).alias("lift_q"),
        )
        .orderBy(F.col("lift_q").desc(), "p1", "p2")
        .limit(20)
    )


# --------------------------------------------------------------------------
# W9 — resample to a fixed grid with linear interpolation
# --------------------------------------------------------------------------

def w9_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's daily value series resampled onto the full 30-day
    January grid, gaps filled by linear interpolation between the
    nearest observed days (edges stay NULL) — the timeseries-cleanup
    step before any windowed model sees the data.

    Scale shape: the observed series is a partial-agg shuffle; the
    grid is |users| × 30 rows (dimension-sized); prev/next observed
    day and value ride ONE window per user (four ignore-nulls
    expressions share the same spec → a single sort).  Interpolation
    is exact int64 cents/day arithmetic with ONE closing double
    division, so the fill is bit-identical cross-engine.
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
                "grid_day"
            ),
        )
        .agg(F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("cents"))
    )
    grid = (
        events.select("user_id")
        .distinct()
        .select("user_id", F.explode(F.sequence(F.lit(0), F.lit(29))).alias("grid_day"))
    )
    g = grid.join(daily, ["user_id", "grid_day"], "left")
    w = Window.partitionBy("user_id").orderBy("grid_day")
    obs_day = F.when(F.col("cents").isNotNull(), F.col("grid_day"))
    obs_val = F.when(F.col("cents").isNotNull(), F.col("cents"))
    filled_in = g.select(
        "user_id",
        "grid_day",
        "cents",
        F.last(obs_day, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_d"),
        F.last(obs_val, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_v"),
        F.first(obs_day, ignorenulls=True)
        .over(w.rowsBetween(1, Window.unboundedFollowing))
        .alias("next_d"),
        F.first(obs_val, ignorenulls=True)
        .over(w.rowsBetween(1, Window.unboundedFollowing))
        .alias("next_v"),
    )
    num = F.col("prev_v") * (F.col("next_d") - F.col("grid_day")) + F.col(
        "next_v"
    ) * (F.col("grid_day") - F.col("prev_d"))
    den = F.col("next_d") - F.col("prev_d")
    filled = (
        F.when(F.col("cents").isNotNull(), F.col("cents").cast("double"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            num.cast("double") / den.cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
    )
    src = (
        F.when(F.col("cents").isNotNull(), F.lit("obs"))
        .when(F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(), F.lit("interp"))
        .otherwise(F.lit("edge"))
    )
    return filled_in.select(
        "user_id",
        "grid_day",
        filled.alias("filled_cents"),
        src.alias("src"),
    )


# --------------------------------------------------------------------------
# J9 — bloom-filter semi-join reduction
# --------------------------------------------------------------------------

_BLOOM_BITS = 1 << 16  # 65536-bit filter = 2048 32-bit words
_BLOOM_K = 3


def _bloom_pos(key: Column, i: int) -> Column:
    """Hash-``i`` bit position of a key (md5-portable, like CMS)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}#"), key)), 1, 8), 16, 10
        ).cast("bigint")
        % _BLOOM_BITS
    )


def j9_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via a bloom filter: how many lineitem rows
    survive a 64 Kbit / 3-hash bloom of the filtered part keys, versus
    the exact semi-join count — the fact-side pre-filter that cuts
    shuffle volume before a big join.

    The 100 TB pattern: the dimension's join keys compress into a
    scale-CONSTANT bitmap (2048 words regardless of key count — built
    by one ``bit_or`` partial aggregation, which is how bloom filters
    merge), broadcast to every fact scan task; fact rows failing any
    of the k membership probes never enter the join exchange.  False
    positives (reported here) only cost wasted shuffle rows, never
    correctness — the exact join still runs behind the filter.  Word
    size 32 keeps every shift strictly inside a positive int64 in both
    engines.  Probes are joins against the 2048-row bitmap (bounded
    broadcast), bit tests are codegen shift/AND.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    keys = part.filter(F.col("p_name").startswith("blue")).select(
        "p_partkey", F.col("p_partkey").cast("string").alias("k")
    )
    positions = keys.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("k"), i) for i in range(_BLOOM_K)])
        ).alias("pos")
    )
    bloom = positions.select(
        F.expr("pos DIV 32").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("b"),
    ).groupBy("word").agg(F.expr("bit_or(b)").alias("bits"))

    probe = li.select(F.col("l_partkey").cast("string").alias("k"), "l_partkey")
    for i in range(_BLOOM_K):
        probe = probe.withColumn(f"pos{i}", _bloom_pos(F.col("k"), i))
        bl = bloom.select(
            F.col("word").alias(f"word{i}"), F.col("bits").alias(f"bits{i}")
        )
        probe = probe.join(
            F.broadcast(bl), F.expr(f"pos{i} DIV 32") == F.col(f"word{i}"), "left"
        )
    passed = probe.filter(
        " AND ".join(
            f"(bits{i} IS NOT NULL AND "
            f"(shiftright(bits{i}, CAST(pos{i} % 32 AS INT)) & 1) = 1)"
            for i in range(_BLOOM_K)
        )
    )
    n_pass = passed.agg(F.count(F.lit(1)).alias("n_bloom_pass"))
    n_true = (
        li.join(keys, li["l_partkey"] == keys["p_partkey"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    return n_pass.join(F.broadcast(n_true)).select(
        "n_bloom_pass",
        "n_true",
        (F.col("n_bloom_pass") - F.col("n_true")).alias("n_false_pos"),
    )


# --------------------------------------------------------------------------
# A21 — histogram-sketch quantiles vs exact rank statistics
# --------------------------------------------------------------------------

_HQ_WIDTH = 64  # cents per histogram bucket


def a21_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of event value per event_type, twice: exact
    (rank-based order statistic) and from a fixed 64-cent-bucket
    histogram sketch (the bucket's lower bound).

    The bounded-memory quantile path: the histogram is ≤ |range|/width
    counters per group regardless of row count — it merges by
    addition (partial agg), while the exact path needs a full sort of
    every group.  Rank math is pure int64: the p-th rank is
    ``(p·n + 99) div 100`` and the sketch answer is the first bucket
    whose cumulative count reaches it (a window over ≤ 1024 bucket
    rows, never over the data).  Reporting both quantifies the
    sketch's resolution error instead of hiding it.
    """
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        "event_id",
    )
    n_tbl = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    wq = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = base.select(
        "event_type", "cents", F.row_number().over(wq).alias("rn")
    ).join(n_tbl, "event_type")
    exact = ranked.groupBy("event_type", "n").agg(
        *[
            F.max(
                F.when(
                    F.col("rn") == F.expr(f"({p} * n + 99) DIV 100"), F.col("cents")
                )
            ).alias(f"p{p}_exact")
            for p in (50, 95, 99)
        ]
    )

    hist = (
        base.select("event_type", F.expr(f"cents DIV {_HQ_WIDTH}").alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wh = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "event_type", "bucket", F.sum("cnt").over(wh).alias("cum")
    ).join(n_tbl, "event_type")
    est = cum.groupBy("event_type").agg(
        *[
            (
                F.min(
                    F.when(
                        F.col("cum") >= F.expr(f"({p} * n + 99) DIV 100"),
                        F.col("bucket"),
                    )
                )
                * _HQ_WIDTH
            ).alias(f"p{p}_est")
            for p in (50, 95, 99)
        ]
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "n",
        "p50_exact",
        "p95_exact",
        "p99_exact",
        "p50_est",
        "p95_est",
        "p99_est",
    )


# --------------------------------------------------------------------------
# A23 — event-time RANGE-frame trailing window
# --------------------------------------------------------------------------

def a23_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: the count and value mass of the SAME user's activity
    in the trailing hour — a RANGE frame over event-time microseconds,
    not a ROWS frame.

    The distinction matters for correctness at scale: a ROWS frame
    counts a fixed number of neighbors regardless of how sparse or
    bursty the stream is, and splits same-timestamp peers
    arbitrarily; the RANGE frame is defined by the *time* interval
    ``[t − 1 h, t]`` and includes ALL equal-timestamp peers in both
    engines — deterministic under ties where a ROWS frame is not.
    One shuffle on user_id, frame bounds in exact integer
    microseconds (the temporal-join rule), cents exact int64.
    """
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return base.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("trail_cnt"),
        F.sum("cents").over(w).alias("trail_cents"),
    )


# --------------------------------------------------------------------------
# W10 — CUSUM change-point detection (recurrence → prefix closed form)
# --------------------------------------------------------------------------

#: flag when the one-sided CUSUM exceeds this many baseline-scaled cents
_CUSUM_H_CENTS = 2_000_000


def w10_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector on each event_type's daily value
    series: flag the days where cumulative upward deviation from the
    first-15-day baseline mean exceeds a threshold.

    The CUSUM recurrence ``S_t = max(0, S_{t−1} + (x_t − μ))`` looks
    sequential — a driver loop — but has the exact closed form
    ``S_t = P_t − min_{j≤t} P_j`` over prefix sums ``P`` of the
    deviations, so it is two window expressions over ONE per-key sort
    (the same de-recursion trick as w7's EWMA truncation).  All
    arithmetic is integer: deviations are scaled by the baseline day
    count (``x·n − Σx`` instead of ``x − Σx/n``), so no division ever
    happens and the flag threshold is exact.
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
                "day"
            ),
        )
        .agg(F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("cents"))
    )
    base = daily.filter(F.col("day") < 15).groupBy("event_type").agg(
        F.sum("cents").alias("base_sum"),
        F.count(F.lit(1)).alias("base_days"),
    )
    dev = daily.join(base, "event_type").select(
        "event_type",
        "day",
        "cents",
        # (x − μ) scaled by base_days: exact int64
        (F.col("cents") * F.col("base_days") - F.col("base_sum")).alias("d"),
        "base_days",
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixed = dev.select(
        "event_type",
        "day",
        "cents",
        "base_days",
        F.sum("d").over(wp).alias("p"),
    )
    cusum = (
        F.col("p")
        - F.least(F.min("p").over(wp), F.lit(0))
    )
    return prefixed.select(
        "event_type",
        "day",
        "cents",
        cusum.alias("cusum_scaled"),
        (cusum > F.col("base_days") * F.lit(_CUSUM_H_CENTS)).alias("flagged"),
    )


# --------------------------------------------------------------------------
# J11 — linear multi-touch attribution
# --------------------------------------------------------------------------

def j11_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-weight) multi-touch attribution: every click in
    the 24 h before a same-user purchase shares the credit equally —
    the ad-tech counterpart of j8's single-touch nearest join.

    Scale shape: the click∈window join is the bucketed range join
    with the user id as an ADDED equality key (operators/range_join
    ``on=``) — the shuffle partitions on (user, day-bucket), so no
    row ever compares across users and the per-bucket work is each
    user's own activity, not the corpus's.  Credit stays exact
    integer parts-per-million (``1e6 div k`` — summing 1/k doubles
    across engines would be accumulation-order-dependent); k comes
    from one window over the pair table.
    """
    from data_engineer_project_weather_analytics_spark.operators.range_join import bucketed_range_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 24 HOURS")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    pairs = bucketed_range_join(
        clicks,
        purchases,
        "c_ts",
        "w_start",
        "w_end",
        bucket_seconds=86400,
        on=["user_id"],
    )
    k = F.count(F.lit(1)).over(Window.partitionBy("purchase_id"))
    return (
        pairs.select("user_id", "purchase_id", "click_id", k.alias("n_touches"))
        .select(
            "user_id",
            "purchase_id",
            "click_id",
            "n_touches",
            F.expr("CAST(1000000 DIV n_touches AS BIGINT)").alias("credit_ppm"),
        )
    )


# --------------------------------------------------------------------------
# A24 — winsorization (clip at group rank-percentiles)
# --------------------------------------------------------------------------

def a24_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize event values per event_type at the p1/p99 rank
    statistics: clip the tails instead of dropping them — the
    outlier-robust preprocessing step before any mean-based feature.

    Scale shape: the clip bounds are ONE windowed rank pass per group
    (reusing the a21 exact-rank machinery: bound = value at rank
    ``(p·n+99) div 100``), reduced to a 2-column per-group bounds
    table that joins back — bounded by |groups|, chosen by AQE.  The
    clip itself is in-row ``greatest/least``; all arithmetic int64
    cents, and the clipped-mass report makes the transform auditable.
    """
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wq = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = base.select(
        "event_type",
        "cents",
        F.row_number().over(wq).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(1 * n + 99) DIV 100"), F.col("cents"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rn") == F.expr("(99 * n + 99) DIV 100"), F.col("cents"))
        ).alias("hi"),
    )
    clipped = base.join(bounds, "event_type").select(
        "event_type",
        "cents",
        "lo",
        "hi",
        F.greatest(F.least(F.col("cents"), F.col("hi")), F.col("lo")).alias(
            "w_cents"
        ),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("cents") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("cents") > F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.sum("w_cents").alias("winsorized_cents"),
        F.min("lo").alias("lo_cents"),
        F.min("hi").alias("hi_cents"),
    )


# --------------------------------------------------------------------------
# X28 — leave-one-out target encoding
# --------------------------------------------------------------------------

def x28_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the supplier key by line
    revenue: each row's feature is the mean of its group's target
    EXCLUDING the row itself — ``(Σ − x) / (n − 1)`` — the standard
    leakage-free categorical encoding for tree/linear models.

    Scale shape: one partial-agg shuffle builds the per-key (Σ, n)
    table; it joins back to the fact by key (AQE sizes the join) and
    the LOO arithmetic is in-row: exact int64 numerator, ONE double
    division (repo determinism rule — never round()).  Singleton
    groups (n=1) yield NULL via try_divide rather than a fabricated
    prior.  Output quantized for the hash check.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("__p"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        (F.col("__p") * 100).cast("bigint").alias("cents"),
    )
    grp = base.groupBy("l_suppkey").agg(
        F.sum("cents").alias("g_sum"), F.count(F.lit(1)).alias("g_n")
    )
    # explicit n>1 guard: double x/0.0 is ±Inf, and engines may differ
    # on try-division of doubles — a NULL branch is unambiguous
    loo = F.when(
        F.col("g_n") > 1,
        F.floor(
            (F.col("g_sum") - F.col("cents")).cast("double")
            / (F.col("g_n") - 1).cast("double")
        ).cast("bigint"),
    )
    return base.join(grp, "l_suppkey").select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        loo.alias("loo_mean_cents"),
    )


# --------------------------------------------------------------------------
# DQ3 — cross-table financial reconciliation
# --------------------------------------------------------------------------

def dq3_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile the order header against its lines: per order status,
    how many orders' ``o_totalprice`` disagrees with the sum of their
    lineitems' net revenue, and by how much — the ledger-vs-detail
    audit every financial pipeline runs nightly.

    Scale shape: ONE partial-agg shuffle rolls the line table up to
    order grain, then an order-key join (both sides already keyed —
    AQE picks the strategy) and a tiny per-status rollup.  All money
    arithmetic in exact decimal; the mismatch test and the absolute
    difference are decimal-exact, so a one-cent drift is a mismatch in
    both engines.  Orders with NO lines reconcile against 0 via the
    left join + coalesce (the header-without-detail case an inner
    join would silently hide).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    from data_engineer_project_weather_analytics_spark.plans.core import _revenue

    line_rev = li.groupBy("l_orderkey").agg(
        F.sum(_revenue()).alias("line_total")
    )
    joined = orders.join(
        line_rev, orders["o_orderkey"] == line_rev["l_orderkey"], "left"
    ).select(
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("header_total"),
        F.coalesce(
            F.col("line_total"), F.lit("0").cast("decimal(12,2)")
        ).alias("line_total"),
    )
    diff = F.col("header_total") - F.col("line_total")
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(diff != 0, 1).otherwise(0)).cast("bigint").alias(
            "n_mismatched"
        ),
        F.sum(F.abs(diff)).cast("double").alias("abs_drift"),
        F.sum("header_total").cast("double").alias("header_sum"),
    )


# --------------------------------------------------------------------------
# MV2 — incremental join-view repair (late-arriving dimension updates)
# --------------------------------------------------------------------------

def mv2_delta_join_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a materialized orders⋈customer view under a dimension
    update (every 50th customer's balance changes) WITHOUT recomputing
    the join: delete the affected rows from the old view, re-join only
    the affected facts against the updated dimension rows, union.
    The query emits the repaired view's per-nation aggregates NEXT TO
    a from-scratch recompute and a consistency flag — self-verifying.

    The 100 TB point: the repair's join input is |affected facts| ×
    |updated dims| (the delta), not |all facts| × |all dims| — with
    2% of dims updated, ~98% of the view is untouched and never
    shuffles.  The "delete" is a predicate on the view's own dim key
    (at scale: partition pruning on the view layout).  Exact decimal
    money sums; the flag compares exact decimals, never floats.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    is_updated = F.col("c_custkey") % 50 == 0
    new_bal = F.when(
        is_updated, _dec2_local("c_acctbal") + F.lit("100").cast("decimal(12,2)")
    ).otherwise(_dec2_local("c_acctbal"))
    dim_old = customer.select(
        "c_custkey", "c_nationkey", _dec2_local("c_acctbal").alias("bal")
    )
    dim_new = customer.select(
        "c_custkey", "c_nationkey", new_bal.alias("bal")
    )
    dim_delta = dim_new.filter(is_updated)

    view_old = orders.join(
        dim_old, orders["o_custkey"] == dim_old["c_custkey"]
    ).select("o_orderkey", "c_custkey", "c_nationkey", "bal")
    repaired = view_old.filter(~(F.col("c_custkey") % 50 == 0)).unionByName(
        orders.join(
            dim_delta, orders["o_custkey"] == dim_delta["c_custkey"]
        ).select("o_orderkey", "c_custkey", "c_nationkey", "bal")
    )
    recomputed = orders.join(
        dim_new, orders["o_custkey"] == dim_new["c_custkey"]
    ).select("o_orderkey", "c_custkey", "c_nationkey", "bal")

    def roll(df: DataFrame, prefix: str) -> DataFrame:
        return df.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias(f"{prefix}_orders"),
            F.sum("bal").alias(f"__{prefix}_bal"),
        )
    a = roll(repaired, "rep")
    b = roll(recomputed, "rec")
    return (
        a.join(b, "c_nationkey")
        .select(
            "c_nationkey",
            "rep_orders",
            "rec_orders",
            F.col("__rep_bal").cast("double").alias("rep_bal"),
            (
                (F.col("rep_orders") == F.col("rec_orders"))
                & (F.col("__rep_bal") == F.col("__rec_bal"))
            ).alias("consistent"),
        )
    )


def _dec2_local(col: str) -> Column:
    return F.col(col).cast("decimal(12,2)")


# --------------------------------------------------------------------------
# X27 — corpus-adaptive stopword stripping (apply-step of boilerplate)
# --------------------------------------------------------------------------

def x27_adaptive_stopword_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip corpus-adaptive stopwords — tokens appearing in ≥ 60% of
    documents — from every document, preserving token order: the
    APPLY step downstream of boilerplate *detection* (x20 flags, this
    rewrites).

    Scale shape: the document-frequency table is built from distinct
    (token, doc) pairs by partial-agg shuffle and joined back to the
    positional token stream with a forced MERGE hint — it is
    vocabulary-sized and must never broadcast (the x9 lesson); the
    1-row corpus count does broadcast.  Order restoration is
    sort_array over in-row (pos, token) structs — per-document,
    bounded, codegen — then one rollup shuffle on doc_id.  The
    stopword test is exact integers (df·100 ≥ 60·n_docs).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    df_ = (
        toks.select("doc_id", "w")
        .distinct()
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    nd = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    kept = (
        toks.join(df_.hint("merge"), "w")
        .join(F.broadcast(nd))
        .filter(F.col("__df") * 100 < 60 * F.col("__n_docs"))
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("cleaned"),
        )
    )


# --------------------------------------------------------------------------
# W12 — debounce (burst dedup: keep the first event of each burst)
# --------------------------------------------------------------------------

def w12_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor-style debounce: within each (user, event_type) stream,
    keep only the FIRST event of every burst, where a burst extends
    while consecutive events are ≤ 60 s apart.

    "Keep first, then measure the gap from the kept one" looks
    stateful-sequential, but bursts are exactly the segments between
    >60 s gaps: a lag-gap flag and a running sum assign burst ids in
    ONE window pass (the streak/sessionize de-recursion, w6), and the
    burst's first row is rank 1 — no driver loop, no
    applyInPandasWithState needed for the batch form.  Gap math in
    exact integer microseconds (temporal rule).  Emits per kept event
    the burst size it represents, so downstream aggregation can weight
    by suppressed volume.
    """
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    flagged = base.select(
        "user_id",
        "event_type",
        "event_id",
        "ts_us",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) <= 60_000_000, F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("is_new_burst"),
    )
    wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bursts = flagged.select(
        "user_id",
        "event_type",
        "event_id",
        "ts_us",
        F.sum("is_new_burst").over(wb).alias("burst_id"),
    )
    return (
        bursts.groupBy("user_id", "event_type", "burst_id")
        .agg(
            F.min(F.struct("ts_us", "event_id")).alias("first"),
            F.count(F.lit(1)).alias("burst_size"),
        )
        .select(
            "user_id",
            "event_type",
            "burst_id",
            F.col("first.event_id").alias("kept_event_id"),
            "burst_size",
        )
    )


# --------------------------------------------------------------------------
# X26 — balanced downsampling (exact-integer data-derived rates)
# --------------------------------------------------------------------------

def x26_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus across languages by downsampling every
    language toward the minority class, with a DATA-DERIVED sampling
    rate applied as an exact integer comparison — no float thresholds
    anywhere, so the kept set is bit-identical in any engine and
    stable under re-partitioning.

    The trick: keeping a doc with probability ``n_min / n_lang``
    is ``md5_u32(doc) · n_lang < n_min · 2³²`` — cross-multiplied
    int64 arithmetic on a per-doc hash (the same partition-order-free
    selection as x6's fixed split, upgraded to rates computed FROM the
    data: two broadcast-joined aggregate rows per language).  Reports
    per language the before/after counts; kept counts land within
    O(√n) of ``n_min`` (hash noise), never above ``n_lang``.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    n_min = counts.agg(F.min("n_lang").alias("n_min"))
    hashed = docs.select(
        "doc_id",
        "lang",
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT)"
        ).alias("h32"),
    )
    kept = (
        hashed.join(F.broadcast(counts), "lang")
        .join(F.broadcast(n_min))
        .filter(
            F.col("h32") * F.col("n_lang")
            < F.col("n_min") * F.lit(4294967296)
        )
    )
    return (
        counts.join(
            kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept")),
            "lang",
            "left",
        )
        .select(
            "lang",
            "n_lang",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


# --------------------------------------------------------------------------
# W11 — rolling median (order statistic over a moving frame)
# --------------------------------------------------------------------------

def w11_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median of daily revenue over the last 7 OBSERVED days per
    return flag — the robust-smoothing counterpart to w2's moving
    average (a single outlier day shifts the mean but not the median).

    Frame semantics: ``ROWS BETWEEN 6 PRECEDING`` counts observed
    rows, not calendar days — on a gapped series the frame spans more
    than a week (the calendar-exact alternative is a RANGE frame over
    an integer day column, a23's pattern).  The lineitem daily series
    is dense at every SF, so here the two frames coincide; ROWS keeps
    the collect_list frame bounded at exactly 7 elements.

    No engine has a native moving median; the frame is materialized as
    a sorted array (≤ 7 int64 cents — bounded, in-row, codegen) and
    the LOWER median ``sorted[(k+1) div 2]`` is picked by index: pure
    integer selection, no averaging of middle pairs, so the result is
    engine-exact.  Input is the usual daily partial-agg shuffle; the
    window is ONE sort per flag.  The frame array is bounded by the
    frame length — this never materializes a group, only a window.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.select(
            "l_returnflag",
            F.to_date("l_shipdate").alias("day"),
            (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("__c"),
        )
        .groupBy("l_returnflag", "day")
        .agg(F.sum("__c").alias("cents"))
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    frame = F.sort_array(F.collect_list("cents").over(w))
    return (
        daily.select("l_returnflag", "day", "cents", frame.alias("__f"))
        .select(
            "l_returnflag",
            "day",
            "cents",
            F.expr(
                "element_at(__f, CAST((size(__f) + 1) DIV 2 AS INT))"
            ).alias("med7"),
        )
    )


# --------------------------------------------------------------------------
# A22 — portable deterministic HyperLogLog
# --------------------------------------------------------------------------

_HLL_M = 256  # 2^8 registers — raw-regime-valid (n > 2.5m) at every test SF


def a22_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-id stream cardinality estimated by a from-scratch
    HyperLogLog whose every step is engine-portable — unlike the
    native ``approx_count_distinct`` (a8b, rows-only because Spark's
    HLL++ internals aren't replayable), this sketch is oracle-checked
    bit-for-bit and graded against the exact count (estimates land
    within ±5% at every test SF; σ = 1.04/√256 ≈ 6.5%).

    Construction: md5(key) supplies 12 bits of register index (top 8
    kept → m=256) and 52 bits of suffix; the register stores max(rho)
    where ``rho = 53 − length(bin(suffix))`` (leading-zero count via
    the shared ``bin()`` builtin — no libm).  No distinct pass is
    needed: max() is idempotent over re-observations, which is exactly
    why HLL registers merge by max — Spark's partial aggregation
    again, ~2 KB of state per task for any cardinality.  The harmonic
    sum stays EXACT integer: Σ 2^(53−M_j) ≤ 256·2^53 = 2^61, so the
    one double division at the end is the only float op and the
    estimate is deterministic (the α_m factor parses from the same
    literal string in both engines).  Raw estimate, no small-range
    correction (that needs ln; m is sized so every test SF sits in the
    raw-valid regime n > 2.5m, and the exact column makes any residual
    bias measurable instead of hidden).
    """
    events = load_table(spark, sf_dir, "events")
    regs = (
        events.select(F.md5(F.col("event_id").cast("string")).alias("h"))
        .select(
            F.expr(
                "CAST(conv(substring(h, 1, 3), 16, 10) AS BIGINT) DIV 16"
            ).alias("bucket"),
            F.expr("CAST(conv(substring(h, 4, 13), 16, 10) AS BIGINT)").alias(
                "w"
            ),
        )
        .select(
            "bucket",
            F.expr(
                "CASE WHEN w > 0 THEN 53 - length(bin(w)) ELSE 53 END"
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_reg"))
    )
    stats = regs.agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m_reg AS INT))")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_buckets"),
    ).select(
        (
            F.col("s_present")
            + (F.lit(_HLL_M) - F.col("n_buckets"))
            * F.expr("shiftleft(CAST(1 AS BIGINT), 53)")
        ).alias("s_total")
    )
    exact = events.agg(F.count_distinct("event_id").alias("n_exact"))
    # identical literal-string→double parses and one division: the
    # whole closing expression is IEEE-deterministic in both engines
    est = F.expr(
        "CAST(floor((CAST('0.7213' AS DOUBLE)"
        " / (CAST(1 AS DOUBLE) + CAST('1.079' AS DOUBLE)"
        f" / CAST({_HLL_M} AS DOUBLE)))"
        f" * CAST({_HLL_M * _HLL_M} AS DOUBLE)"
        " * CAST(9007199254740992 AS DOUBLE)"
        " / CAST(s_total AS DOUBLE)) AS BIGINT)"
    )
    return (
        exact.join(F.broadcast(stats))
        .select("n_exact", est.alias("hll_est"))
    )


# --------------------------------------------------------------------------
# G1 — triangle counting with degree orientation
# --------------------------------------------------------------------------

def g1_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the co-purchase graph (parts as nodes, same-order
    co-occurrence as edges) — the clustering/community primitive.

    The distributed-graph trick that makes this scale: orient every
    undirected edge from its lower-(degree, id) endpoint to the higher
    one.  Out-degrees are then bounded by O(√m) even on power-law
    graphs, so the wedge self-join (out-neighbor pairs per source)
    cannot explode on hub nodes — the unoriented formulation generates
    deg² wedges per hub.  Each triangle is counted exactly once: only
    its orientation-minimal vertex owns both out-edges.  Shape: edge
    list (basket-capped, as mb1) → degree partial-agg → oriented
    self-join on the source → closing-edge semi-probe.  All counts
    int64.
    """
    from data_engineer_project_weather_analytics_spark.plans.corpus import copurchase_edges

    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li)
    deg = (
        edges.select(F.col("p1").alias("node"))
        .unionAll(edges.select(F.col("p2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("p1"), F.col("deg").alias("d1"))
    dv = deg.select(F.col("node").alias("p2"), F.col("deg").alias("d2"))
    lower_first = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("p1") < F.col("p2"))
    )
    oriented = (
        edges.join(du, "p1")
        .join(dv, "p2")
        .select(
            F.when(lower_first, F.col("p1")).otherwise(F.col("p2")).alias("src"),
            F.when(lower_first, F.col("p2")).otherwise(F.col("p1")).alias("dst"),
        )
    )
    wa = oriented.select("src", F.col("dst").alias("v"))
    wb = oriented.select("src", F.col("dst").alias("w"))
    wedges = wa.join(wb, "src").filter(F.col("v") < F.col("w"))
    tri = wedges.join(
        edges,
        (F.col("v") == edges["p1"]) & (F.col("w") == edges["p2"]),
        "left_semi",
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = wedges.agg(F.count(F.lit(1)).alias("n_wedges"))
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        n_edges.join(F.broadcast(n_wedges))
        .join(F.broadcast(n_tri))
        .select("n_edges", "n_wedges", "n_triangles")
    )


ORACLES_LAKEOPS: dict[str, str] = {
    "j11_linear_attribution": """
        WITH clicks AS (
            SELECT user_id, event_id AS click_id, ts AS c_ts
            FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT user_id, event_id AS purchase_id,
                   ts - INTERVAL 24 HOURS AS w_start,
                   ts AS w_end
            FROM events WHERE event_type = 'purchase'
        ),
        pairs AS (
            SELECT c.user_id, p.purchase_id, c.click_id
            FROM clicks c
            JOIN purchases p
              ON c.user_id = p.user_id
             AND c.c_ts >= p.w_start AND c.c_ts < p.w_end
        ),
        counted AS (
            SELECT user_id, purchase_id, click_id,
                   CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT)
                       AS n_touches
            FROM pairs
        )
        SELECT user_id, purchase_id, click_id, n_touches,
               CAST(1000000 // n_touches AS BIGINT) AS credit_ppm
        FROM counted
    """,
    "a24_winsorize": """
        WITH base AS (
            SELECT event_type, event_id,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        ranked AS (
            SELECT event_type, cents,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY cents, event_id
                   ) AS rn,
                   CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n
            FROM base
        ),
        bounds AS (
            SELECT event_type,
                   max(CASE WHEN rn = (1 * n + 99) // 100 THEN cents END)
                       AS lo,
                   max(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END)
                       AS hi
            FROM ranked GROUP BY event_type
        ),
        clipped AS (
            SELECT b.event_type, b.cents, bo.lo, bo.hi,
                   greatest(least(b.cents, bo.hi), bo.lo) AS w_cents
            FROM base b JOIN bounds bo USING (event_type)
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_low,
               CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_high,
               CAST(sum(w_cents) AS BIGINT) AS winsorized_cents,
               CAST(min(lo) AS BIGINT) AS lo_cents,
               CAST(min(hi) AS BIGINT) AS hi_cents
        FROM clipped
        GROUP BY event_type
    """,
    "x28_target_encode": """
        WITH base AS (
            SELECT l_orderkey, l_linenumber, l_suppkey,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS cents
            FROM lineitem
        ),
        grp AS (
            SELECT l_suppkey,
                   CAST(sum(cents) AS BIGINT) AS g_sum,
                   CAST(count(*) AS BIGINT) AS g_n
            FROM base GROUP BY l_suppkey
        )
        SELECT b.l_orderkey, b.l_linenumber, b.l_suppkey,
               CASE WHEN g.g_n > 1 THEN
                   CAST(floor(CAST(g.g_sum - b.cents AS DOUBLE)
                              / CAST(g.g_n - 1 AS DOUBLE)) AS BIGINT)
               END AS loo_mean_cents
        FROM base b JOIN grp g USING (l_suppkey)
    """,
    "dq3_order_reconciliation": """
        WITH line_rev AS (
            SELECT l_orderkey,
                   sum(CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(1 - l_discount AS DECIMAL(4,2)))
                       AS line_total
            FROM lineitem GROUP BY l_orderkey
        ),
        joined AS (
            SELECT o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(12,2)) AS header_total,
                   coalesce(line_total, CAST(0 AS DECIMAL(12,2)))
                       AS line_total
            FROM orders
            LEFT JOIN line_rev ON o_orderkey = l_orderkey
        )
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN header_total - line_total <> 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
               CAST(sum(abs(header_total - line_total)) AS DOUBLE)
                   AS abs_drift,
               CAST(sum(header_total) AS DOUBLE) AS header_sum
        FROM joined
        GROUP BY o_orderstatus
    """,
    "mv2_delta_join_repair": """
        WITH dim_old AS (
            SELECT c_custkey, c_nationkey,
                   CAST(c_acctbal AS DECIMAL(12,2)) AS bal
            FROM customer
        ),
        dim_new AS (
            SELECT c_custkey, c_nationkey,
                   CASE WHEN c_custkey % 50 = 0
                        THEN CAST(c_acctbal AS DECIMAL(12,2))
                             + CAST(100 AS DECIMAL(12,2))
                        ELSE CAST(c_acctbal AS DECIMAL(12,2)) END AS bal
            FROM customer
        ),
        view_old AS (
            SELECT o_orderkey, c_custkey, c_nationkey, bal
            FROM orders JOIN dim_old ON o_custkey = c_custkey
        ),
        repaired AS (
            SELECT * FROM view_old WHERE NOT (c_custkey % 50 = 0)
            UNION ALL
            SELECT o_orderkey, d.c_custkey, d.c_nationkey, d.bal
            FROM orders JOIN dim_new d ON o_custkey = d.c_custkey
            WHERE d.c_custkey % 50 = 0
        ),
        recomputed AS (
            SELECT o_orderkey, c_custkey, c_nationkey, bal
            FROM orders JOIN dim_new ON o_custkey = c_custkey
        ),
        a AS (
            SELECT c_nationkey, CAST(count(*) AS BIGINT) AS rep_orders,
                   sum(bal) AS rb
            FROM repaired GROUP BY c_nationkey
        ),
        b AS (
            SELECT c_nationkey, CAST(count(*) AS BIGINT) AS rec_orders,
                   sum(bal) AS cb
            FROM recomputed GROUP BY c_nationkey
        )
        SELECT a.c_nationkey, rep_orders, rec_orders,
               CAST(rb AS DOUBLE) AS rep_bal,
               (rep_orders = rec_orders AND rb = cb) AS consistent
        FROM a JOIN b USING (c_nationkey)
    """,
    "x27_adaptive_stopword_strip": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(t)),
                       i -> struct_pack(pos := i, w := t[i]))) AS u
            FROM (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents)
        ),
        flat AS (SELECT doc_id, u.pos AS pos, u.w AS w FROM toks),
        df_ AS (
            SELECT w, CAST(count(*) AS BIGINT) AS df
            FROM (SELECT DISTINCT doc_id, w FROM flat)
            GROUP BY w
        ),
        nd AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
        ),
        kept AS (
            SELECT f.doc_id, f.pos, f.w
            FROM flat f
            JOIN df_ USING (w)
            CROSS JOIN nd
            WHERE df * 100 < 60 * n_docs
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               array_to_string(list(w ORDER BY pos), ' ') AS cleaned
        FROM kept
        GROUP BY doc_id
    """,
    "w12_debounce": """
        WITH base AS (
            SELECT user_id, event_type, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
            FROM events
        ),
        flagged AS (
            SELECT user_id, event_type, event_id, ts_us,
                   CASE WHEN ts_us - lag(ts_us) OVER (
                            PARTITION BY user_id, event_type
                            ORDER BY ts_us, event_id
                        ) <= 60000000
                        THEN 0 ELSE 1 END AS is_new_burst
            FROM base
        ),
        bursts AS (
            SELECT user_id, event_type, event_id, ts_us,
                   CAST(sum(is_new_burst) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS burst_id
            FROM flagged
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY user_id, event_type, burst_id
                       ORDER BY ts_us, event_id) AS rn
            FROM bursts
        )
        SELECT user_id, event_type, burst_id,
               CAST(max(CASE WHEN rn = 1 THEN event_id END) AS BIGINT)
                   AS kept_event_id,
               CAST(count(*) AS BIGINT) AS burst_size
        FROM ranked
        GROUP BY user_id, event_type, burst_id
    """,
    "x26_balanced_downsample": """
        WITH counts AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
            FROM documents GROUP BY lang
        ),
        nm AS (SELECT min(n_lang) AS n_min FROM counts),
        hashed AS (
            SELECT doc_id, lang,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT AS h32
            FROM documents
        ),
        kept AS (
            SELECT h.lang
            FROM hashed h
            JOIN counts c USING (lang)
            CROSS JOIN nm
            WHERE h.h32 * c.n_lang < nm.n_min * 4294967296
        ),
        k2 AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
            FROM kept GROUP BY lang
        )
        SELECT c.lang, c.n_lang,
               CAST(coalesce(k2.n_kept, 0) AS BIGINT) AS n_kept
        FROM counts c LEFT JOIN k2 USING (lang)
    """,
    "w11_rolling_median": """
        WITH daily AS (
            SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                                 * 100 AS BIGINT)) AS BIGINT) AS cents
            FROM lineitem
            GROUP BY l_returnflag, CAST(l_shipdate AS DATE)
        ),
        framed AS (
            SELECT l_returnflag, day, cents,
                   list(cents) OVER (
                       PARTITION BY l_returnflag ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
                   ) AS f
            FROM daily
        )
        SELECT l_returnflag, day, cents,
               CAST(list_sort(f)[(len(f) + 1) // 2] AS BIGINT) AS med7
        FROM framed
    """,
    "w10_cusum_changepoint": f"""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                       AS day,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events
            GROUP BY 1, 2
        ),
        base AS (
            SELECT event_type,
                   CAST(sum(cents) AS BIGINT) AS base_sum,
                   CAST(count(*) AS BIGINT) AS base_days
            FROM daily WHERE day < 15
            GROUP BY event_type
        ),
        dev AS (
            SELECT d.event_type, d.day, d.cents, b.base_days,
                   d.cents * b.base_days - b.base_sum AS dd
            FROM daily d JOIN base b USING (event_type)
        ),
        psum AS (
            SELECT event_type, day, cents, base_days,
                   CAST(sum(dd) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS p
            FROM dev
        ),
        prefixed AS (
            SELECT event_type, day, cents, base_days, p,
                   CAST(min(p) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS minp
            FROM psum
        )
        SELECT event_type, CAST(day AS INTEGER) AS day, cents,
               CAST(p - least(minp, 0) AS BIGINT) AS cusum_scaled,
               (p - least(minp, 0)) > base_days * {_CUSUM_H_CENTS}
                   AS flagged
        FROM prefixed
    """,
    "a23_trailing_range_window": """
        WITH base AS (
            SELECT user_id, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT user_id, event_id,
               CAST(count(*) OVER w AS BIGINT) AS trail_cnt,
               CAST(sum(cents) OVER w AS BIGINT) AS trail_cents
        FROM base
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts_us
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
        )
    """,
    "a22_hll_distinct": f"""
        WITH h AS (
            SELECT md5(CAST(event_id AS VARCHAR)) AS h FROM events
        ),
        split AS (
            SELECT ('0x' || substr(h, 1, 3))::BIGINT // 16 AS bucket,
                   ('0x' || substr(h, 4, 13))::BIGINT AS w
            FROM h
        ),
        regs AS (
            SELECT bucket,
                   max(CASE WHEN w > 0 THEN 53 - length(bin(w))
                            ELSE 53 END) AS m_reg
            FROM split GROUP BY bucket
        ),
        stats AS (
            SELECT CAST(sum(1::BIGINT << CAST(53 - m_reg AS INTEGER))
                        AS BIGINT)
                   + ({_HLL_M} - CAST(count(*) AS BIGINT))
                       * (1::BIGINT << 53) AS s_total
            FROM regs
        ),
        exact AS (
            SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS n_exact
            FROM events
        )
        SELECT n_exact,
               CAST(floor((CAST('0.7213' AS DOUBLE)
                    / (CAST(1 AS DOUBLE) + CAST('1.079' AS DOUBLE)
                       / CAST({_HLL_M} AS DOUBLE)))
                    * CAST({_HLL_M * _HLL_M} AS DOUBLE)
                    * CAST(9007199254740992 AS DOUBLE)
                    / CAST(s_total AS DOUBLE)) AS BIGINT) AS hll_est
        FROM exact CROSS JOIN stats
    """,
    "g1_triangle_count": f"""
        WITH {SQL_COPURCHASE_EDGES_CTE},
        deg AS (
            SELECT node, count(*) AS deg FROM (
                SELECT p1 AS node FROM edges
                UNION ALL SELECT p2 FROM edges
            ) GROUP BY node
        ),
        oriented AS (
            SELECT CASE WHEN (du.deg < dv.deg)
                          OR (du.deg = dv.deg AND e.p1 < e.p2)
                        THEN e.p1 ELSE e.p2 END AS src,
                   CASE WHEN (du.deg < dv.deg)
                          OR (du.deg = dv.deg AND e.p1 < e.p2)
                        THEN e.p2 ELSE e.p1 END AS dst
            FROM edges e
            JOIN deg du ON du.node = e.p1
            JOIN deg dv ON dv.node = e.p2
        ),
        wedges AS (
            SELECT a.src, a.dst AS v, b.dst AS w
            FROM oriented a
            JOIN oriented b ON a.src = b.src AND a.dst < b.dst
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
               (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_wedges,
               (SELECT CAST(count(*) AS BIGINT) FROM wedges
                WHERE EXISTS (SELECT 1 FROM edges e
                              WHERE e.p1 = v AND e.p2 = w)) AS n_triangles
    """,
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
               -- mirror Spark try_divide: NULL (not inf/nan) on a zero
               -- baseline slice, so an empty n_base cannot diverge
               CASE WHEN sum(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                             THEN 1 ELSE 0 END) = 0 THEN NULL
                    ELSE CAST(sum(CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}'
                                  THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(sum(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                                    THEN 1 ELSE 0 END) AS DOUBLE)
               END AS count_ratio
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
    "j9_bloom_prune_join": f"""
        WITH keys AS (
            SELECT p_partkey, CAST(p_partkey AS VARCHAR) AS k
            FROM part WHERE p_name LIKE 'blue%'
        ),
        pos AS (
            SELECT ('0x' || substr(md5(CAST(i.i AS VARCHAR) || '#' || keys.k),
                                   1, 8))::BIGINT % {_BLOOM_BITS} AS pos
            FROM keys CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) i
        ),
        bloom AS (
            SELECT pos // 32 AS word,
                   bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS bits
            FROM pos GROUP BY pos // 32
        ),
        pp AS (
            SELECT l_partkey,
                   ('0x' || substr(md5('0#' || CAST(l_partkey AS VARCHAR)),
                                   1, 8))::BIGINT % {_BLOOM_BITS} AS pos0,
                   ('0x' || substr(md5('1#' || CAST(l_partkey AS VARCHAR)),
                                   1, 8))::BIGINT % {_BLOOM_BITS} AS pos1,
                   ('0x' || substr(md5('2#' || CAST(l_partkey AS VARCHAR)),
                                   1, 8))::BIGINT % {_BLOOM_BITS} AS pos2
            FROM lineitem
        ),
        checked AS (
            SELECT CASE WHEN b0.bits IS NOT NULL
                         AND ((b0.bits >> CAST(p.pos0 % 32 AS INTEGER)) & 1) = 1
                        THEN 1 ELSE 0 END AS c0,
                   CASE WHEN b1.bits IS NOT NULL
                         AND ((b1.bits >> CAST(p.pos1 % 32 AS INTEGER)) & 1) = 1
                        THEN 1 ELSE 0 END AS c1,
                   CASE WHEN b2.bits IS NOT NULL
                         AND ((b2.bits >> CAST(p.pos2 % 32 AS INTEGER)) & 1) = 1
                        THEN 1 ELSE 0 END AS c2
            FROM pp p
            LEFT JOIN bloom b0 ON b0.word = p.pos0 // 32
            LEFT JOIN bloom b1 ON b1.word = p.pos1 // 32
            LEFT JOIN bloom b2 ON b2.word = p.pos2 // 32
        ),
        agg AS (
            SELECT CAST(count(*) FILTER (WHERE c0 = 1 AND c1 = 1 AND c2 = 1)
                        AS BIGINT) AS n_bloom_pass
            FROM checked
        ),
        tr AS (
            SELECT CAST(count(*) AS BIGINT) AS n_true
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM keys)
        )
        SELECT n_bloom_pass, n_true,
               n_bloom_pass - n_true AS n_false_pos
        FROM agg CROSS JOIN tr
    """,
    "a21_hist_quantiles": f"""
        WITH base AS (
            SELECT event_type,
                   CAST(floor(value * 100) AS BIGINT) AS cents,
                   event_id
            FROM events
        ),
        n_tbl AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY event_type
        ),
        ranked AS (
            SELECT b.event_type, b.cents, n.n,
                   row_number() OVER (
                       PARTITION BY b.event_type ORDER BY b.cents, b.event_id
                   ) AS rn
            FROM base b JOIN n_tbl n USING (event_type)
        ),
        exact AS (
            SELECT event_type, n,
                   max(CASE WHEN rn = (50 * n + 99) // 100 THEN cents END)
                       AS p50_exact,
                   max(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END)
                       AS p95_exact,
                   max(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END)
                       AS p99_exact
            FROM ranked GROUP BY event_type, n
        ),
        hist AS (
            SELECT event_type, cents // {_HQ_WIDTH} AS bucket,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM base GROUP BY 1, 2
        ),
        cum AS (
            SELECT h.event_type, h.bucket, n.n,
                   sum(h.cnt) OVER (
                       PARTITION BY h.event_type ORDER BY h.bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum
            FROM hist h JOIN n_tbl n USING (event_type)
        ),
        est AS (
            SELECT event_type,
                   CAST(min(CASE WHEN cum >= (50 * n + 99) // 100
                                 THEN bucket END) * {_HQ_WIDTH} AS BIGINT)
                       AS p50_est,
                   CAST(min(CASE WHEN cum >= (95 * n + 99) // 100
                                 THEN bucket END) * {_HQ_WIDTH} AS BIGINT)
                       AS p95_est,
                   CAST(min(CASE WHEN cum >= (99 * n + 99) // 100
                                 THEN bucket END) * {_HQ_WIDTH} AS BIGINT)
                       AS p99_est
            FROM cum GROUP BY event_type
        )
        SELECT e.event_type, e.n,
               e.p50_exact, e.p95_exact, e.p99_exact,
               s.p50_est, s.p95_est, s.p99_est
        FROM exact e JOIN est s USING (event_type)
    """,
    "x24_countmin_heavy_hitters": f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ),
        rows_ AS (SELECT unnest([0, 1, 2, 3]) AS row),
        tagged AS (
            SELECT r.row,
                   ('0x' || substr(md5(CAST(r.row AS VARCHAR) || '#' || w), 1, 8))
                       ::BIGINT % {_CMS_WIDTH} AS bucket
            FROM toks CROSS JOIN rows_ r
        ),
        sketch AS (
            SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
            FROM tagged GROUP BY row, bucket
        ),
        heavy AS (
            SELECT w, CAST(count(*) AS BIGINT) AS n_exact
            FROM toks GROUP BY w
            ORDER BY n_exact DESC, w LIMIT 30
        ),
        probes AS (
            SELECT h.w, h.n_exact, r.row,
                   ('0x' || substr(md5(CAST(r.row AS VARCHAR) || '#' || h.w), 1, 8))
                       ::BIGINT % {_CMS_WIDTH} AS bucket
            FROM heavy h CROSS JOIN rows_ r
        )
        SELECT p.w AS token, p.n_exact,
               CAST(min(s.cnt) AS BIGINT) AS cms_est
        FROM probes p
        JOIN sketch s ON s.row = p.row AND s.bucket = p.bucket
        GROUP BY p.w, p.n_exact
    """,
    "mb1_market_basket": f"""
        WITH {SQL_BASKET_ELIGIBLE_CTE}
        SELECT a.l_partkey AS p1, b.l_partkey AS p2,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM eligible a
        JOIN eligible b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        ORDER BY n_orders DESC, p1, p2
        LIMIT 20
    """,
    "mb2_association_rules": f"""
        WITH {SQL_BASKET_ELIGIBLE_CTE},
        pairs AS (
            SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                   CAST(count(*) AS BIGINT) AS n_pair
            FROM eligible a
            JOIN eligible b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY a.l_partkey, b.l_partkey
            HAVING count(*) >= 3
        ),
        item_n AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
            FROM eligible GROUP BY l_partkey
        ),
        no AS (
            SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
            FROM eligible
        )
        SELECT p.p1, p.p2, p.n_pair,
               CAST(p.n_pair * 10000 // i1.n_item AS BIGINT) AS conf_ab_q,
               CAST(p.n_pair * 10000 // i2.n_item AS BIGINT) AS conf_ba_q,
               CAST(p.n_pair * no.n_orders * 10000
                    // (i1.n_item * i2.n_item) AS BIGINT) AS lift_q
        FROM pairs p
        JOIN item_n i1 ON i1.l_partkey = p.p1
        JOIN item_n i2 ON i2.l_partkey = p.p2
        CROSS JOIN no
        ORDER BY lift_q DESC, p1, p2
        LIMIT 20
    """,
    "w9_resample_interpolate": """
        WITH daily AS (
            SELECT user_id,
                   date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                       AS grid_day,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events
            GROUP BY 1, 2
        ),
        grid AS (
            SELECT u.user_id, d.grid_day
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (SELECT unnest(list_transform(
                            generate_series(0, 29), x -> x)) AS grid_day) d
        ),
        g AS (
            SELECT grid.user_id, grid.grid_day, daily.cents
            FROM grid LEFT JOIN daily USING (user_id, grid_day)
        ),
        seq AS (
            SELECT user_id, grid_day, cents,
                   last_value(CASE WHEN cents IS NOT NULL THEN grid_day END
                              IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY grid_day
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_d,
                   last_value(CASE WHEN cents IS NOT NULL THEN cents END
                              IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY grid_day
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_v,
                   first_value(CASE WHEN cents IS NOT NULL THEN grid_day END
                               IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY grid_day
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS next_d,
                   first_value(CASE WHEN cents IS NOT NULL THEN cents END
                               IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY grid_day
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS next_v
            FROM g
        )
        SELECT user_id,
               CAST(grid_day AS INTEGER) AS grid_day,
               CASE
                   WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
                   WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                       CAST(prev_v * (next_d - grid_day)
                            + next_v * (grid_day - prev_d) AS DOUBLE)
                           / CAST(next_d - prev_d AS DOUBLE)
                   ELSE NULL
               END AS filled_cents,
               CASE
                   WHEN cents IS NOT NULL THEN 'obs'
                   WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                       THEN 'interp'
                   ELSE 'edge'
               END AS src
        FROM seq
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
