"""Sequence analytics + data-quality query set (round 3, batch 3):
the event-sequence and pipeline-guardrail workload layered on the
reference's dashboard tables.

* ``a19`` — Markov transition matrix over the event stream (which
  event follows which): the path-analysis primitive behind funnel
  discovery and next-action models;
* ``dq1`` — a dbt-style expectation suite (not-null, unique,
  accepted-values, range, FK relationship) evaluated in ONE fact scan
  plus one anti-join — the shape a 100 TB nightly contract check needs
  (per-rule scans would read the fact table five times);
* ``x22`` — bigram collocation scoring (PMI) for phrase mining in an
  LLM curation pipeline, with a rational PMI surrogate in exact
  integer arithmetic (no ``ln``, no float drift);
* ``w7`` — 8-tap exponentially-weighted moving average with
  power-of-two weights: every product and the windowed sum are exact
  in 64-bit integers, so the single closing division is bit-identical
  across engines.

Cross-engine determinism per CLAUDE.md: BIGINT casts for counts,
integer arithmetic before any division, no ``round()``/libm on
checked outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.functions.zorder import zorder_key_sql
from data_engineer_project_weather_analytics_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# A19 — Markov transition matrix over the event stream
# --------------------------------------------------------------------------

def a19_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-to-event transition counts and shares: for every user's
    time-ordered stream, pair each event with its predecessor and
    count (prev, next) transitions corpus-wide.

    Scale shape: ONE shuffle on ``user_id`` feeds the lag window (each
    user's history sorts within its partition), then a partial-agg
    shuffle on the (prev, next) pair — 100 TB of events never sort
    globally.  The share denominator reuses the aggregated output
    (windowed sum over at most |event_types|² rows), not the raw
    stream.  Tiebreak on ``event_id`` makes same-timestamp ordering
    deterministic (the etl.py lesson from round 2).
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    counted = (
        pairs.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    total_w = Window.partitionBy("prev_type")
    return counted.select(
        "prev_type",
        "next_type",
        "n_transitions",
        # exact ints, ONE double division — deterministic cross-engine
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(total_w).cast("double")
        ).alias("share"),
    )


# --------------------------------------------------------------------------
# DQ1 — expectation suite (data contracts) in one scan + one anti-join
# --------------------------------------------------------------------------

def dq1_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-style data-quality rules over ``orders``, reported as one
    (rule, n_violations) row each:

    * ``not_null_custkey`` — NULL foreign keys;
    * ``unique_orderkey``  — duplicate primary keys
      (``count(*) − count(distinct)``);
    * ``accepted_status``  — ``o_orderstatus`` outside {O, F, P};
    * ``range_totalprice`` — non-positive or implausibly large totals;
    * ``fk_custkey_customer`` — orphaned FKs (anti-join).

    Scale shape: the four scalar rules fold into ONE conditional
    aggregation over a single fact scan (a per-rule-scan layout would
    read 100 TB five times); only the referential rule needs a second
    pass — an anti-join against the pruned dimension key column, left
    to AQE to broadcast when the key set fits and shuffle when it
    doesn't (no forced hint — the round-2 verdict lesson).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    one_scan = orders.agg(
        F.sum(
            F.when(F.col("o_custkey").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("not_null_custkey"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "unique_orderkey"
        ),
        F.sum(
            F.when(
                ~F.col("o_orderstatus").isin("O", "F", "P"), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("accepted_status"),
        F.sum(
            F.when(
                (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") > 400000),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("range_totalprice"),
    )
    scalar_rules = one_scan.select(
        F.expr(
            "stack(4, "
            "'not_null_custkey', not_null_custkey, "
            "'unique_orderkey', unique_orderkey, "
            "'accepted_status', accepted_status, "
            "'range_totalprice', range_totalprice) AS (rule, n_violations)"
        )
    )
    orphans = (
        orders.join(
            customer,
            orders["o_custkey"] == customer["c_custkey"],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("fk_custkey_customer").alias("rule"), "n_violations")
    )
    return scalar_rules.unionAll(orphans)


# --------------------------------------------------------------------------
# X22 — bigram collocations (PMI) for phrase mining
# --------------------------------------------------------------------------

def x22_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 bigram collocations scored by a pointwise-mutual-
    information surrogate — the phrase-mining pass of an LLM curation
    pipeline (frequent "new york"-style units for tokenizer/vocab
    decisions).

    PMI's ``log`` is monotone, so ranking by the *rational* inside
    ``P(xy)/(P(x)P(y)) = c_xy·N / (c_x·c_y)`` ranks identically;
    scaled by 10⁴ and integer-divided it is exact 64-bit arithmetic —
    zero float drift cross-engine (the x9 TF-IDF lesson).

    Scale shape: tokenize ONCE behind a projection boundary, build
    bigrams by zipping two slices of the materialized array (never
    re-split per pair); bigram and unigram counts are partial-agg
    shuffles; the two count joins shuffle on the word key — the
    vocabulary-sized unigram table is NEVER broadcast (the x9 verdict
    fix); top-50 is TakeOrderedAndProject.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t"))
    n_pairs = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice("t", 1, n_pairs),
                F.slice("t", 2, n_pairs),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("pr")
    ).select("pr.w1", "pr.w2")
    bigrams = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("n_cooccur")
    )
    unigrams = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # derived from the aggregated table, not the raw corpus: its
    # exchange is identical to u1/u2's, so ReuseExchange runs the
    # unigram aggregation once for all three consumers
    n_tokens = unigrams.agg(F.sum("c").alias("n_tokens"))  # 1 row — broadcast ok
    # vocabulary-sized sides must SHUFFLE-join (the x9 verdict lesson):
    # without the merge hint Catalyst broadcasts the post-agg unigram
    # table off its (test-scale) size estimate — unbounded on a corpus
    u1 = unigrams.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_x")
    u2 = unigrams.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_y")
    return (
        bigrams.join(u1.hint("merge"), "w1")
        .join(u2.hint("merge"), "w2")
        .join(F.broadcast(n_tokens))
        .select(
            "w1",
            "w2",
            "n_cooccur",
            F.expr(
                "CAST((n_cooccur * n_tokens * 10000) DIV (c_x * c_y) AS BIGINT)"
            ).alias("pmi_q"),
        )
        .orderBy(F.col("n_cooccur").desc(), "w1", "w2")
        .limit(50)
    )


# --------------------------------------------------------------------------
# ZO1 — Z-order curve histogram (layout-key verification)
# --------------------------------------------------------------------------

def zo1_zorder_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of events along the Z-order curve of
    ``(user_id, minute_of_day)`` — 256 curve segments with row counts
    and key ranges.

    This is the *verification query* for the layout primitive
    (``operators/layout.write_zordered``): the interleave runs over
    every event through the paired Spark/SQL builders
    (``functions/zorder``), so a single bit-position error anywhere in
    the key breaks the hash check.  All arithmetic is integer
    shift/and/or inside whole-stage codegen; the histogram is one
    partial-agg shuffle over ≤256 groups.
    """
    from data_engineer_project_weather_analytics_spark.functions.zorder import zorder_key

    events = load_table(spark, sf_dir, "events")
    keyed = events.select(
        zorder_key(
            F.col("user_id").bitwiseAND(F.lit(255)),
            (F.hour("ts") * 60 + F.minute("ts")).bitwiseAND(F.lit(255)),
            bits=8,
        ).alias("zkey")
    )
    return (
        keyed.groupBy(F.shiftright("zkey", 8).alias("z_segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("zkey").alias("zkey_min"),
            F.max("zkey").alias("zkey_max"),
        )
    )


# --------------------------------------------------------------------------
# W7 — exponentially weighted moving average, exact dyadic weights
# --------------------------------------------------------------------------

def w7_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-tap EWMA (α = ½) of daily revenue per return flag.

    A true recurrence is sequential; the 8-tap truncation (weights
    128/255 … 1/255, <0.4% tail mass) re-expresses it as a FIXED
    linear combination of lags — pure window arithmetic, no UDF, no
    driver loop.  Weights are powers of two and inputs are integer
    cents, so every product and the sum are exact int64; the single
    closing division by 25500 (255 weight-sum × 100 cents) is the
    only float op — bit-identical across engines.

    Scale shape: daily partial-agg shuffle, then ONE window shuffle
    partitioned by flag (series are per-key — no global sort).  Rows
    without a full 8-day history are emitted with NULL ewma rather
    than a partial-weight estimate (renormalizing would need a
    per-row float weight sum — determinism over cleverness).
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
        .agg(F.sum("__c").alias("c0"))
    )
    w = Window.partitionBy("l_returnflag").orderBy("day")
    lags = [F.col("c0")] + [F.lag("c0", k).over(w) for k in range(1, 8)]
    weighted = sum(
        lag * F.lit(1 << (7 - k)) for k, lag in enumerate(lags)
    )
    return daily.select(
        "l_returnflag",
        "day",
        (F.col("c0").cast("double") / 100.0).alias("revenue"),
        (weighted.cast("double") / 25500.0).alias("ewma"),
    )


# the oracle replays the SAME interleave term list the Spark key uses —
# generated by the paired builder, never hand-transcribed
_ZKEY_SQL = zorder_key_sql(
    "(user_id & 255)", "((hour(ts) * 60 + minute(ts)) & 255)", bits=8
)

ORACLES_QUALITY: dict[str, str] = {
    "zo1_zorder_histogram": f"""
        WITH keyed AS (
            SELECT ({_ZKEY_SQL}) AS zkey FROM events
        )
        SELECT zkey >> 8 AS z_segment,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(min(zkey) AS BIGINT) AS zkey_min,
               CAST(max(zkey) AS BIGINT) AS zkey_max
        FROM keyed
        GROUP BY zkey >> 8
    """,
    "a19_markov_transitions": """
        WITH seq AS (
            SELECT event_type AS next_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ),
        counted AS (
            SELECT prev_type, next_type,
                   CAST(count(*) AS BIGINT) AS n_transitions
            FROM seq
            WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type
        )
        SELECT prev_type, next_type, n_transitions,
               CAST(n_transitions AS DOUBLE)
                   / CAST(sum(n_transitions) OVER (PARTITION BY prev_type)
                          AS DOUBLE) AS share
        FROM counted
    """,
    "dq1_expectations": """
        WITH s AS (
            SELECT
                CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS not_null_custkey,
                CAST(count(*) - count(DISTINCT o_orderkey)
                     AS BIGINT) AS unique_orderkey,
                CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                              THEN 1 ELSE 0 END)
                     AS BIGINT) AS accepted_status,
                CAST(sum(CASE WHEN o_totalprice <= 0
                               OR o_totalprice > 400000
                              THEN 1 ELSE 0 END)
                     AS BIGINT) AS range_totalprice
            FROM orders
        )
        SELECT 'not_null_custkey' AS rule, not_null_custkey AS n_violations
        FROM s
        UNION ALL SELECT 'unique_orderkey', unique_orderkey FROM s
        UNION ALL SELECT 'accepted_status', accepted_status FROM s
        UNION ALL SELECT 'range_totalprice', range_totalprice FROM s
        UNION ALL
        SELECT 'fk_custkey_customer', CAST(count(*) AS BIGINT)
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
        )
    """,
    "x22_bigram_pmi": """
        WITH toks AS (
            SELECT string_split(text, ' ') AS t FROM documents
        ),
        uni AS (SELECT unnest(t) AS w FROM toks),
        uc AS (
            SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM uni),
        bi AS (
            SELECT unnest(list_transform(
                       generate_series(1, len(t) - 1),
                       i -> struct_pack(w1 := t[i], w2 := t[i + 1])
                   )) AS pr
            FROM toks
        ),
        bc AS (
            SELECT pr.w1 AS w1, pr.w2 AS w2,
                   CAST(count(*) AS BIGINT) AS n_cooccur
            FROM bi GROUP BY 1, 2
        )
        SELECT bc.w1, bc.w2, bc.n_cooccur,
               CAST((bc.n_cooccur * n.n_tokens * 10000)
                    // (u1.c * u2.c) AS BIGINT) AS pmi_q
        FROM bc
        JOIN uc u1 ON u1.w = bc.w1
        JOIN uc u2 ON u2.w = bc.w2
        CROSS JOIN n
        ORDER BY bc.n_cooccur DESC, bc.w1, bc.w2
        LIMIT 50
    """,
    "w7_ewma": """
        WITH daily AS (
            SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                                 * 100 AS BIGINT)) AS BIGINT) AS c0
            FROM lineitem
            GROUP BY l_returnflag, CAST(l_shipdate AS DATE)
        )
        SELECT l_returnflag, day,
               CAST(c0 AS DOUBLE) / 100.0 AS revenue,
               CAST(c0 * 128
                    + lag(c0, 1) OVER w * 64
                    + lag(c0, 2) OVER w * 32
                    + lag(c0, 3) OVER w * 16
                    + lag(c0, 4) OVER w * 8
                    + lag(c0, 5) OVER w * 4
                    + lag(c0, 6) OVER w * 2
                    + lag(c0, 7) OVER w * 1
                    AS DOUBLE) / 25500.0 AS ewma
        FROM daily
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY day)
    """,
}
