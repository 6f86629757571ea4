"""Round-4 widening: sketch estimators, graph ranking, and corpus
curation self-evaluation queries.

Everything here follows the repo's cross-engine determinism rules:
hashes come from md5 hex prefixes (`conv` / `'0x'||...` — the portable
hash→int idiom), estimates close with exact integer arithmetic (DIV)
or a single shared-tree double op, and no float aggregation ever
crosses rows (accumulation order is engine-dependent).

Reference parity: the reference repo has no sketch/graph surface (it is
a ~400-line pandas/psycopg2 weather ETL, see PARITY.md §1); this module
is part of the charter's "operations a large-scale training-data
pipeline would need" mandate, extending the X-family (extensions.py)
and the sketch family (lakeops.py a22/x24/j9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.operators import dedup
from data_engineer_project_weather_analytics_spark.sources.catalog import load_table

# 48-bit hash space: first 12 hex chars of md5.  2^48 fits int64 with
# headroom for the (k-1)·2^48 estimator numerator (255·2^48 ≈ 7.2e16).
_H48 = 1 << 48
_KMV_K = 256


def _h48(col):
    """Portable 48-bit hash: Spark side of the md5-prefix idiom."""
    return F.expr(
        f"CAST(conv(substring(md5({col}), 1, 12), 16, 10) AS BIGINT)"
    )


# --------------------------------------------------------------------------
# A25 — KMV (bottom-k) distinct sketch, graded against the exact count
# --------------------------------------------------------------------------

def a25_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-id cardinality via a KMV (k-minimum-values) sketch — the
    second portable distinct estimator next to the HyperLogLog (a22),
    and the one whose sketches also support set-intersection estimates
    (x34 uses exactly that).

    Construction (Bar-Yossef et al., "Counting distinct elements in a
    data stream"): hash every key into [0, 2^48), keep the k smallest
    DISTINCT hash values; if the k-th smallest is h_k, the density
    estimate is (k-1)·2^48 / h_k.  Everything is exact int64 — the
    estimator closes with one integer DIV, so the result is
    engine-exact (no float anywhere).

    Scale shape: distinct-hash is one partial-aggregated shuffle;
    bottom-k is a TakeOrderedAndProject (per-partition top-k, never a
    global sort); the closing join is two 1-row sides.  When the
    stream has fewer than k distinct hashes the sketch IS the exact
    set and the estimate degenerates to k_used (saturation flag
    `sketch_full` = 0 makes that visible).  Error is graded in-query:
    `err_ppm` vs the exact count (σ ≈ 1/√k ≈ 6.2% at k=256).
    """
    events = load_table(spark, sf_dir, "events")
    hashes = events.select(
        _h48("CAST(event_id AS STRING)").alias("h")
    ).distinct()
    bottom = hashes.orderBy("h").limit(_KMV_K)
    sk = bottom.agg(
        F.count(F.lit(1)).alias("k_used"), F.max("h").alias("h_k")
    )
    exact = events.agg(F.count_distinct("event_id").alias("n_exact"))
    # integer DIV, never float division — the estimate is engine-exact
    est = F.expr(
        f"CASE WHEN k_used < {_KMV_K} THEN k_used"
        f" ELSE ((k_used - 1) * {_H48}) DIV h_k END"
    )
    return (
        exact.join(F.broadcast(sk))
        .select(
            "n_exact",
            F.col("k_used").alias("kmv_k"),
            est.alias("kmv_est"),
            F.expr(
                f"CASE WHEN k_used < {_KMV_K} THEN 0 ELSE 1 END"
            ).alias("sketch_full"),
        )
        .select(
            "n_exact",
            "kmv_k",
            "kmv_est",
            "sketch_full",
            F.expr(
                "abs(kmv_est - n_exact) * 1000000 DIV n_exact"
            ).alias("err_ppm"),
        )
    )


# --------------------------------------------------------------------------
# X34 — KMV source-overlap estimate (sketch twin of the exact x29)
# --------------------------------------------------------------------------

def x34_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source Jaccard ESTIMATED from per-source KMV sketches —
    the 100 TB form of the exact overlap matrix (x29).  At corpus
    scale the exact matrix shuffles the full distinct (source,
    shingle) set; the sketch path reduces each source to k=256 hashes
    first, so the pairwise comparison touches |sources|·k rows — a
    catalog-sized quantity — no matter how large the corpus grows.

    Estimator (Beyer et al., SIGMOD'07): for sources A, B take the k
    smallest hashes of (sketch_A ∪ sketch_B); the fraction of those
    that appear in BOTH sketches estimates J(A,B).  Reported as exact
    integer ppm (`jaccard_est_ppm = n_both·1e6 DIV k_used`) — no
    float, engine-exact.

    Scale shape: shingle-hash distinct is one shuffle (tokenize-once
    via ``doc_shingles``); per-source bottom-k is ONE window sort over
    |sources|·|distinct shingles| rows — bounded reducer state because
    row_number streams, nothing collects; the pair expansion joins the
    k-row sketches against a |sources|²-row pair list (broadcast-safe:
    scale-constant catalog dimension).
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        dedup.doc_shingles(
            docs.select(F.col("source").alias("doc_id"), "text"),
            "doc_id",
            "text",
        )
        .withColumnRenamed("doc_id", "source")
        .distinct()
    )
    hv = sh.select(
        "source", _h48("shingle").alias("h")
    ).distinct()
    rn = Window.partitionBy("source").orderBy("h")
    sk = (
        hv.select("source", "h", F.row_number().over(rn).alias("__r"))
        .filter(F.col("__r") <= _KMV_K)
        .select("source", "h")
    )
    # pair list from ONE keys=[] aggregate + in-row expansion (the x29
    # shape): never a cross join, and the broadcast subtree is provably
    # bounded (grand aggregate), which is what the plan gate requires
    srcs_row = sk.select("source").agg(
        F.sort_array(F.collect_set("source")).alias("srcs")
    )
    pair_expr = F.expr(
        """
        flatten(transform(srcs, (x, i) ->
            transform(slice(srcs, i + 2, size(srcs) - i - 1), y ->
                named_struct('src_a', x, 'src_b', y))))
        """
    )
    pairs = F.broadcast(
        srcs_row.select(F.explode(pair_expr).alias("p")).select(
            "p.src_a", "p.src_b"
        )
    )
    side_a = sk.join(
        pairs, sk["source"] == pairs["src_a"]
    ).select("src_a", "src_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    side_b = sk.join(
        pairs, sk["source"] == pairs["src_b"]
    ).select("src_a", "src_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        side_a.unionAll(side_b)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    rn2 = Window.partitionBy("src_a", "src_b").orderBy("h")
    kept = merged.select(
        "src_a", "src_b", "in_a", "in_b", F.row_number().over(rn2).alias("__r")
    ).filter(F.col("__r") <= _KMV_K)
    return (
        kept.groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).alias("k_used"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
        )
        .select(
            "src_a",
            "src_b",
            "k_used",
            "n_both",
            F.expr("n_both * 1000000 DIV k_used").alias("jaccard_est_ppm"),
        )
    )


ORACLES_CORPUS: dict[str, str] = {
    "a25_kmv_distinct": f"""
        WITH hashes AS (
            SELECT DISTINCT
                   ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))
                       ::BIGINT AS h
            FROM events
        ),
        bottom AS (
            SELECT h FROM hashes ORDER BY h LIMIT {_KMV_K}
        ),
        sk AS (
            SELECT CAST(count(*) AS BIGINT) AS k_used,
                   max(h) AS h_k
            FROM bottom
        ),
        exact AS (
            SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS n_exact
            FROM events
        ),
        est AS (
            SELECT n_exact, k_used AS kmv_k,
                   CASE WHEN k_used < {_KMV_K} THEN k_used
                        ELSE ((k_used - 1) * {_H48}) // h_k END AS kmv_est,
                   CASE WHEN k_used < {_KMV_K} THEN 0 ELSE 1 END
                       AS sketch_full
            FROM exact CROSS JOIN sk
        )
        SELECT n_exact, kmv_k, kmv_est, sketch_full,
               abs(kmv_est - n_exact) * 1000000 // n_exact AS err_ppm
        FROM est
    """,
    "x34_kmv_source_overlap": f"""
        WITH sh AS (
            SELECT DISTINCT source,
                   unnest(list_transform(
                       generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1] || ' ' ||
                            string_split(text, ' ')[i+2])) AS shingle
            FROM documents
        ),
        hv AS (
            SELECT DISTINCT source,
                   ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h
            FROM sh
        ),
        sk AS (
            SELECT source, h FROM (
                SELECT source, h,
                       row_number() OVER (PARTITION BY source ORDER BY h)
                           AS __r
                FROM hv
            ) WHERE __r <= {_KMV_K}
        ),
        srcs AS (SELECT DISTINCT source FROM sk),
        pairs AS (
            SELECT a.source AS src_a, b.source AS src_b
            FROM srcs a JOIN srcs b ON a.source < b.source
        ),
        merged AS (
            SELECT src_a, src_b, h,
                   max(in_a) AS in_a, max(in_b) AS in_b
            FROM (
                SELECT p.src_a, p.src_b, s.h, 1 AS in_a, 0 AS in_b
                FROM pairs p JOIN sk s ON s.source = p.src_a
                UNION ALL
                SELECT p.src_a, p.src_b, s.h, 0 AS in_a, 1 AS in_b
                FROM pairs p JOIN sk s ON s.source = p.src_b
            ) GROUP BY src_a, src_b, h
        ),
        kept AS (
            SELECT src_a, src_b, in_a, in_b FROM (
                SELECT src_a, src_b, in_a, in_b,
                       row_number() OVER (PARTITION BY src_a, src_b
                                          ORDER BY h) AS __r
                FROM merged
            ) WHERE __r <= {_KMV_K}
        )
        SELECT src_a, src_b,
               CAST(count(*) AS BIGINT) AS k_used,
               CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
               CAST(sum(in_a * in_b) AS BIGINT) * 1000000
                   // CAST(count(*) AS BIGINT) AS jaccard_est_ppm
        FROM kept GROUP BY src_a, src_b
    """,
}
