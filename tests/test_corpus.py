"""Semantic tests for plans/corpus.py with planted structures and
invariants the oracle comparison can't express (the oracle proves both
engines agree; these prove the agreed answer is the RIGHT one)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineer_project_weather_analytics_spark.plans import corpus
from data_engineer_project_weather_analytics_spark.plans.registry import REGISTRY

from .conftest import SF_DIR


def test_pagerank_star_graph_exact_integer_ranks(spark):
    """Hand-computed 2-iteration ranks on a 4-leaf star: the hub
    receives four full-degree contributions, each leaf a quarter-split
    one.  Exact integer equality — the whole point of the quantized
    formulation is that these numbers are reproducible anywhere."""
    edges = [(0, i) for i in range(1, 5)]
    adj = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        "src long, dst long",
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    adjd = adj.join(deg, "src").localCheckpoint()
    got = {
        r["node"]: r["pr_rank"]
        for r in corpus.pagerank_over_adjacency(adjd, iters=2).collect()
    }
    # iter1: hub = 150000 + 4*((1e6*85) DIV 100)           = 3_550_000
    #        leaf = 150000 + (1e6*85) DIV 400              =   362_500
    # iter2: hub = 150000 + 4*((362500*85) DIV 100)        = 1_382_500
    #        leaf = 150000 + (3550000*85) DIV 400          =   904_375
    assert got[0] == 1_382_500
    assert all(got[i] == 904_375 for i in range(1, 5))


def test_pagerank_adjacency_modes_hash_identical(spark):
    """`adjacency_mode="persist"` must be a pure execution-strategy
    switch: the full (node, pr_rank, deg) result set is row-for-row
    identical to the default checkpoint mode (exact integers, so plain
    set equality — no tolerance).  prepared_adjacency's persist cache
    entry is owned by the caller; the test releases it."""
    base = sorted(
        (r["node"], r["pr_rank"], r["deg"])
        for r in corpus.g2_pagerank(spark, SF_DIR).collect()
    )
    got = sorted(
        (r["node"], r["pr_rank"], r["deg"])
        for r in corpus.g2_pagerank(
            spark, SF_DIR, adjacency_mode="persist"
        ).collect()
    )
    spark.catalog.clearCache()
    assert got == base and len(base) == 20


def test_prepared_adjacency_rejects_unknown_mode(spark):
    import pytest

    li = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="checkpoint|persist"):
        corpus.prepared_adjacency(li, mode="cache")


def test_pagerank_hub_outranks_leaves_at_full_depth(spark):
    edges = [(0, i) for i in range(1, 7)]
    adj = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        "src long, dst long",
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    adjd = adj.join(deg, "src").localCheckpoint()
    top = corpus.pagerank_over_adjacency(adjd).first()
    assert top["node"] == 0 and top["deg"] == 6


def test_chunk_dedup_first_owner_keeps_its_distinct_chunks(spark):
    """Survivors are the global (doc_id, pos) minima, so the smallest
    doc_id must keep exactly its internally-distinct chunks, and the
    corpus-wide survivor count must equal the distinct chunk count."""
    out = REGISTRY["x33_chunk_dedup"].fn(spark, SF_DIR)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(r["n_kept"] <= r["n_chunks"] for r in rows.values())

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    chunk_arr = F.expr(
        "transform(sequence(0, (size(split(text, ' ')) + 7) DIV 8 - 1),"
        " i -> array_join(slice(split(text, ' '), i * 8 + 1, 8), ' '))"
    )
    chunks = docs.select("doc_id", F.explode(chunk_arr).alias("chunk"))
    n_distinct = chunks.select("chunk").distinct().count()
    assert sum(r["n_kept"] for r in rows.values()) == n_distinct

    first_doc = min(rows)
    first_distinct = (
        chunks.filter(F.col("doc_id") == first_doc)
        .select("chunk")
        .distinct()
        .count()
    )
    assert rows[first_doc]["n_kept"] == first_distinct


def test_kmv_estimate_lands_near_exact(spark):
    """k=256 gives sigma ~ 1/sqrt(k) ~ 6%; 30% is a generous bound
    that still catches an off-by-2^k scaling bug instantly."""
    row = REGISTRY["a25_kmv_distinct"].fn(spark, SF_DIR).first()
    if row["sketch_full"] == 1:
        assert row["err_ppm"] < 300_000, row
    else:  # sketch saw everything: the estimate IS the exact count
        assert row["kmv_est"] == row["n_exact"], row


def test_bm25_top_doc_contains_query_terms(spark):
    top = REGISTRY["x36_bm25_retrieval"].fn(spark, SF_DIR).collect()
    assert len(top) == 10
    scores = [r["score_q"] for r in top]
    assert scores == sorted(scores, reverse=True) and scores[-1] > 0
    text = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") == top[0]["doc_id"])
        .first()["text"]
    )
    assert any(t in text.split(" ") for t in corpus._BM25_TERMS)


def test_pit_join_is_row_preserving_over_purchases(spark):
    """SCD2 intervals partition each user's timeline, so the PIT join
    must match every purchase exactly once — fan-out or loss here
    means broken interval boundaries."""
    out = REGISTRY["j12_scd2_pit_join"].fn(spark, SF_DIR)
    n_purchases = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert out.count() == n_purchases
    assert out.select("event_id").distinct().count() == n_purchases


def test_prefix_filter_has_exact_recall_vs_brute_force(spark):
    """The prefix-filter lemma guarantees NO false negatives: the
    pruned join must return exactly the brute-force J>=0.7 pair set
    (LSH can only aspire to this probabilistically)."""
    from data_engineer_project_weather_analytics_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ds = dedup.doc_shingles(docs, "doc_id", "text", n=3)
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.prefix_filter_pairs(ds, "doc_id", 70).collect()
    }
    brute = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs(ds, "doc_id", threshold=0.7).collect()
    }
    assert got == brute and brute  # equal AND non-trivial


def test_containment_catches_subset_jaccard_misses(spark):
    """A 10-shingle doc fully embedded in a 100-shingle doc: Jaccard
    0.1 (invisible at any usual threshold), containment 1.0 on the
    short side — the asymmetry is the operator's reason to exist."""
    from data_engineer_project_weather_analytics_spark.operators import dedup

    small = [f"s{i}" for i in range(10)]
    big = small + [f"b{i}" for i in range(90)]
    ds = spark.createDataFrame(
        [(1, s) for s in small] + [(2, s) for s in big],
        "doc_id long, shingle string",
    )
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = dedup.containment_for_candidates(
        ds, "doc_id", cand, threshold=0.5
    ).first()
    assert row["cont_a"] == 1.0 and row["n_inter"] == 10
    assert abs(row["cont_b"] - 0.1) < 1e-12
    # and the Jaccard verifier would have dropped it at 0.5
    assert (
        dedup.jaccard_for_candidates(ds, "doc_id", cand, threshold=0.5)
        .count()
        == 0
    )


def test_distributed_cumsum_matches_serial_reference(spark):
    """The two-phase cumsum must equal the single-reducer reference on
    every row, including when the range partitioner scatters 40 rows
    over 32 shuffle partitions (empty partitions, 1-row partitions)."""
    from data_engineer_project_weather_analytics_spark.operators.prefix_sum import distributed_cumsum

    rows = [(i, (i * 37) % 11 + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in distributed_cumsum(df, [F.col("k")], "v").collect()
    }
    run = 0
    for k, v in sorted(rows):
        run += v
        assert got[k] == run, (k, got[k], run)


def test_distributed_cumsum_desc_order_with_tiebreaker(spark):
    from data_engineer_project_weather_analytics_spark.operators.prefix_sum import distributed_cumsum

    rows = [(1, 5), (2, 5), (3, 9), (4, 1)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in distributed_cumsum(
            df, [F.col("v").desc(), F.col("k")], "v"
        ).collect()
    }
    # order: (9,k3) (5,k1) (5,k2) (1,k4)
    assert got == {3: 9, 1: 14, 2: 19, 4: 20}


def test_label_propagation_majority_and_tie_break(spark):
    """Planted 5-node graph, 1 round.  Node 0 neighbors {1,2,3} with
    labels {B,B,A} -> majority B.  Node 4 neighbors {1,3} with labels
    {B,A} -> tied counts, min-label tie-break -> A.  Synchronous
    update: every pick reads the SEED frame, not this round's."""
    edges = [(0, 1), (0, 2), (0, 3), (4, 1), (4, 3)]
    adj = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(0, "A"), (1, "B"), (2, "B"), (3, "A"), (4, "B")],
        "node long, label string",
    )
    got = {
        r["node"]: r["label"]
        for r in corpus.propagate_labels(adj, seeds, iters=1).collect()
    }
    assert got[0] == "B"
    assert got[4] == "A"
    # leaves 1,2,3 see only their own neighbors' seed labels too:
    # node 1 neighbors {0,4} -> {A,B} tie -> A; node 2 neighbors {0} -> A
    assert got[1] == "A" and got[2] == "A"


def test_label_propagation_converges_on_two_cliques(spark):
    """Two triangles joined by one bridge edge: after 2 synchronous
    rounds each clique must be uniformly its majority seed label —
    the structure LPA exists to recover."""
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(3, 4), (4, 5), (3, 5)]
    bridge = [(2, 3)]
    edges = tri1 + tri2 + bridge
    adj = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(0, "L"), (1, "L"), (2, "L"), (3, "R"), (4, "R"), (5, "R")],
        "node long, label string",
    )
    got = {
        r["node"]: r["label"]
        for r in corpus.propagate_labels(adj, seeds, iters=2).collect()
    }
    assert all(got[n] == "L" for n in (0, 1, 2))
    assert all(got[n] == "R" for n in (3, 4, 5))


def test_domain_mixing_equal_token_budget(spark):
    """Every source's rate must target total/n_sources tokens: the
    rate_ppm column must equal the closed-form integer expression, and
    emitted token mass must land within one doc-length granule of the
    budget for every source (hash noise is bounded by max doc size)."""
    out = REGISTRY["x40_domain_mixing"].fn(spark, SF_DIR).collect()
    total = sum(r["src_tokens"] for r in out)
    n_sources = len(out)
    budget = total // n_sources
    for r in out:
        assert r["rate_ppm"] == budget * 1_000_000 // r["src_tokens"]
        # oversampled sources repeat docs: emitted_docs >= n_docs
        if r["rate_ppm"] >= 1_000_000:
            assert r["emitted_docs"] >= r["n_docs"]
            assert r["kept_docs"] == r["n_docs"]
        # achieved token mass within ~3 max-doc granules of the budget
        # (Bernoulli noise over ~25 docs/source at sf0.01)
        assert abs(r["emitted_tokens"] - budget) <= 3 * 120


def test_weighted_sample_is_topk_of_exact_priorities(spark):
    """The sample must be exactly the K docs with the largest
    w*2^32 DIV u priority (ties impossible: doc_id closes the order),
    recomputed here driver-side from first principles."""
    import hashlib

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    ).collect()

    def pri(doc_id, w):
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) + 1
        return w * 4294967296 // u

    expect = sorted(
        ((pri(r["doc_id"], r["n_chars"]), r["doc_id"]) for r in docs),
        key=lambda t: (-t[0], t[1]),
    )[:100]
    got = REGISTRY["x41_weighted_sample"].fn(spark, SF_DIR).collect()
    assert [(r["priority_q"], r["doc_id"]) for r in got] == expect


def test_copurchase_substrate_planted_graph(spark):
    """The ONE shared co-purchase substrate (eligible_basket_items →
    copurchase_edges → copurchase_adjacency) on a hand-built order
    table: single-item and mega (>10 items) baskets contribute
    nothing, duplicate (order, part) rows collapse, cross-order
    repeats of a pair dedupe, and the adjacency is exactly the
    symmetric closure of the undirected edge list."""
    rows = (
        # basket A: parts 1,2,3  →  edges (1,2),(1,3),(2,3)
        [(100, p) for p in (1, 2, 3)]
        + [(100, 2)]          # duplicate line item: must collapse
        + [(101, 1), (101, 2)]  # repeat pair (1,2) in another order
        + [(102, 9)]          # singleton basket: no edges
        + [(103, p) for p in range(20, 31)]  # 11 items: over the cap
    )
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    eligible = {
        (r.l_orderkey, r.l_partkey)
        for r in corpus.eligible_basket_items(li).collect()
    }
    assert eligible == {(100, 1), (100, 2), (100, 3), (101, 1), (101, 2)}

    edges = {(r.p1, r.p2) for r in corpus.copurchase_edges(li).collect()}
    assert edges == {(1, 2), (1, 3), (2, 3)}

    adj = [(r.src, r.dst) for r in corpus.copurchase_adjacency(li).collect()]
    assert len(adj) == 2 * len(edges)  # both directions, no extras
    assert set(adj) == {(a, b) for a, b in edges} | {
        (b, a) for a, b in edges
    }


def test_duplicate_span_fraction_first_principles(spark):
    """x43 recomputed driver-side from the raw corpus: per-doc span
    counts, cross-document duplicate flags (span in >=2 DISTINCT
    docs), and the exact-integer numerators — full-map equality, so
    any drift in spanning, counting, or the dup predicate fails."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    n = corpus._SPAN_N
    per_doc: dict[int, list[str]] = {}
    for r in docs:
        toks = r["text"].split(" ")
        per_doc[r["doc_id"]] = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
    span_docs: dict[str, set[int]] = {}
    for did, spans in per_doc.items():
        for s in spans:
            span_docs.setdefault(s, set()).add(did)
    expect = {
        did: (
            len(spans),
            sum(1 for s in spans if len(span_docs[s]) >= 2),
        )
        for did, spans in per_doc.items()
        if spans
    }
    got = REGISTRY["x43_duplicate_span_fraction"].fn(spark, SF_DIR).collect()
    assert {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"]) for r in got
    } == expect
    for r in got:
        assert r["dup_frac"] == r["n_dup_spans"] / r["n_spans"]


def test_dsir_importance_first_principles(spark):
    """x44 recomputed driver-side: md5-48bit buckets, one global
    (raw, target) histogram, integer blog deltas, exact per-doc
    score — full-map equality including n_tokens."""
    import hashlib

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "text"
    ).collect()

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % 64

    raw = [0] * 64
    tgt = [0] * 64
    doc_counts: dict[int, dict[int, int]] = {}
    for r in docs:
        dc = doc_counts.setdefault(r["doc_id"], {})
        for tok in r["text"].split(" "):
            b = bucket(tok)
            dc[b] = dc.get(b, 0) + 1
            raw[b] += 1
            if r["lang"] == "en":
                tgt[b] += 1
    delta = [(tgt[b] + 1).bit_length() - (raw[b] + 1).bit_length()
             for b in range(64)]
    expect = {
        did: (
            sum(c * delta[b] for b, c in dc.items()),
            sum(dc.values()),
        )
        for did, dc in doc_counts.items()
    }
    got = REGISTRY["x44_dsir_importance"].fn(spark, SF_DIR).collect()
    assert {
        r["doc_id"]: (r["dsir_score"], r["n_tokens"]) for r in got
    } == expect
    # the target subset must score higher on average than the rest:
    # the selection signal the operator exists to produce
    langs = {r["doc_id"]: r["lang"] for r in docs}
    en = [s for (d, (s, _)) in expect.items() if langs[d] == "en"]
    other = [s for (d, (s, _)) in expect.items() if langs[d] != "en"]
    assert sum(en) / len(en) > sum(other) / len(other)


def test_mixture_sample_partitioning_invariant_and_monotone(spark):
    """x46's two headline claims, which the oracle can't express:
    (1) the kept set is invariant under re-partitioning (a rand()- or
    TABLESAMPLE-based sampler fails this — the sample would change
    with the physical split); (2) tightening every rate yields a
    STRICT SUBSET (hash-threshold monotonicity), the property that
    lets a pipeline re-cut a mixture without resampling churn."""
    from data_engineer_project_weather_analytics_spark.sources.catalog import load_table

    base = {
        r["doc_id"] for r in REGISTRY["x46_mixture_sample"].fn(spark, SF_DIR).collect()
    }
    assert base, "sample came back empty"

    docs = load_table(spark, SF_DIR, "documents").repartition(13)
    h = corpus._h48(
        f"concat('{corpus._MIX_SEED}:', CAST(doc_id AS STRING))"
    )
    spec = F.broadcast(
        spark.createDataFrame(
            sorted(corpus._MIX_RATES_BP.items()), "lang string, rate_bp int"
        )
    )
    shuffled = (
        docs.select("doc_id", "lang", (h % 10000).alias("__u"))
        .join(spec, "lang")
        .where(F.col("__u") < F.col("rate_bp"))
    )
    assert {r["doc_id"] for r in shuffled.collect()} == base

    tighter = (
        docs.select("doc_id", "lang", (h % 10000).alias("__u"))
        .join(spec, "lang")
        .where(F.col("__u") < F.col("rate_bp") - 2500)
    )
    tight_ids = {r["doc_id"] for r in tighter.collect()}
    assert tight_ids < base  # strict subset, non-empty gap


def test_span_dedup_rewrite_first_principles(spark):
    """x49 recomputed driver-side from the raw corpus with a LITERAL
    interval union (a set of covered token indices) — independent of
    the query's gap-sum trick, so it verifies that min(N, gap) over
    removed occurrences in position order IS the union length for
    equal-length spans, plus the global-first-occurrence keep rule."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    n = corpus._SPAN_N
    occ: dict[int, list[tuple[int, str]]] = {}
    for r in docs:
        toks = r["text"].split(" ")
        occ[r["doc_id"]] = [
            (i, " ".join(toks[i : i + n]))
            for i in range(len(toks) - n + 1)
        ]
    first: dict[str, tuple[int, int]] = {}
    count: dict[str, int] = {}
    for did, lst in occ.items():
        for pos, s in lst:
            count[s] = count.get(s, 0) + 1
            if s not in first or (did, pos) < first[s]:
                first[s] = (did, pos)
    expect = {}
    for did, lst in occ.items():
        if not lst:
            continue
        removed = [
            pos
            for pos, s in lst
            if count[s] >= 2 and first[s] != (did, pos)
        ]
        covered: set[int] = set()
        for pos in removed:
            covered.update(range(pos, pos + n))
        expect[did] = (len(lst) + n - 1, len(removed), len(covered))
    got = REGISTRY["x49_span_dedup_rewrite"].fn(spark, SF_DIR).collect()
    assert {
        r["doc_id"]: (r["n_tokens"], r["removed_occ"], r["removed_tokens"])
        for r in got
    } == expect
    for r in got:
        assert r["retained_frac"] == (
            (r["n_tokens"] - r["removed_tokens"]) / r["n_tokens"]
        )
    # the corpus actually exercises the removal branch
    assert any(r["removed_occ"] > 0 for r in got)


def test_span_dedup_rewrite_overflow_guard(spark, tmp_path):
    """A document whose max span position would overflow the
    (doc_id, pos) packing must fail LOUDLY (raise_error), never
    silently reorder the global first-occurrence key (ADVICE r7)."""
    from pyspark.errors import SparkRuntimeException

    n_toks = corpus._SPAN_KEY_SHIFT + corpus._SPAN_N  # max pos == shift
    big = " ".join(str(i % 97) for i in range(n_toks))
    spark.createDataFrame(
        [(1, big)], "doc_id long, text string"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    with pytest.raises(SparkRuntimeException, match="span-key capacity"):
        REGISTRY["x49_span_dedup_rewrite"].fn(spark, str(tmp_path)).collect()


def test_pq_topk_first_principles(spark):
    """x50 recomputed with numpy as a third engine: same quantizer
    tree floor(x * (127/max)) in float64, per-subspace argmin on
    dist*16+cb_id, ADC sums, top-10 by (adc, id) — full-map equality
    for every query, so coding, table lookup, and ranking are all
    pinned to an independent implementation."""
    import numpy as np

    from data_engineer_project_weather_analytics_spark.plans.extensions import (
        _PQ_CODEWORDS,
        _PQ_DIM,
        _PQ_M,
        _PQ_QUERIES,
        _PQ_TOPK,
    )

    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r["vec_id"] for r in rows])
    v = np.array([r["embedding"] for r in rows], dtype=np.float64)
    scale = 127.0 / np.abs(v).max()
    qv = np.floor(v * scale).astype(np.int64)
    d4 = _PQ_DIM // _PQ_M
    order = np.argsort(ids)
    cb = qv[order][: _PQ_CODEWORDS]  # vec_id 0..15 sorted
    assert (ids[order][: _PQ_CODEWORDS] == np.arange(_PQ_CODEWORDS)).all()

    def subdist(a, b, s):
        d = a[s * d4 : (s + 1) * d4] - b[s * d4 : (s + 1) * d4]
        return int((d * d).sum())

    codes = {
        int(ids[i]): [
            min(
                range(_PQ_CODEWORDS),
                key=lambda j: subdist(qv[i], cb[j], s) * _PQ_CODEWORDS + j,
            )
            for s in range(_PQ_M)
        ]
        for i in range(len(ids))
    }
    expect = {}
    for qi in range(len(ids)):
        qid = int(ids[qi])
        if qid >= _PQ_QUERIES:
            continue
        dtab = [
            [subdist(qv[qi], cb[j], s) for j in range(_PQ_CODEWORDS)]
            for s in range(_PQ_M)
        ]
        scored = sorted(
            (
                sum(dtab[s][codes[int(cid)][s]] for s in range(_PQ_M)),
                int(cid),
            )
            for cid in ids
            if int(cid) != qid
        )
        expect[qid] = [
            (cid, rank + 1, adc)
            for rank, (adc, cid) in enumerate(scored[:_PQ_TOPK])
        ]
    got = REGISTRY["x50_pq_topk"].fn(spark, SF_DIR).collect()
    got_map: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        got_map.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["rank"], r["adc_dist"])
        )
    assert got_map == expect


def test_ivfpq_topk_first_principles(spark):
    """x51 recomputed driver-side: µ-quantized exact-mean centroids,
    probe ranking on floor(cos·1e4) with the cosine computed by the
    SAME sequential left-fold tree Spark's aggregate() uses (Python
    floats are IEEE doubles, so the replication is bit-exact), then
    ADC restricted to candidates in the 2 probed cells — full-map
    equality for every query."""
    import numpy as np

    from data_engineer_project_weather_analytics_spark.plans.extensions import (
        _PQ_CODEWORDS,
        _PQ_DIM,
        _PQ_M,
        _PQ_QUERIES,
        _PQ_TOPK,
    )

    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    ).collect()
    ids = [r["vec_id"] for r in rows]
    cells = {r["vec_id"]: r["label"] for r in rows}
    v = np.array([r["embedding"] for r in rows], dtype=np.float64)
    byid = {int(i): v[n] for n, i in enumerate(ids)}
    scale = 127.0 / np.abs(v).max()
    qv = {i: np.floor(x * scale).astype(np.int64) for i, x in byid.items()}
    d4 = _PQ_DIM // _PQ_M
    cb = [qv[j] for j in range(_PQ_CODEWORDS)]

    def subdist(a, b, s):
        d = a[s * d4 : (s + 1) * d4] - b[s * d4 : (s + 1) * d4]
        return int((d * d).sum())

    codes = {
        i: [
            min(
                range(_PQ_CODEWORDS),
                key=lambda j: subdist(qv[i], cb[j], s) * _PQ_CODEWORDS + j,
            )
            for s in range(_PQ_M)
        ]
        for i in byid
    }
    # µ-quantized exact-mean centroids (cell_centroids replication)
    percell: dict[int, list[np.ndarray]] = {}
    for i, x in byid.items():
        percell.setdefault(cells[i], []).append(x)
    cents = {
        c: [
            int(sum(int(np.floor(x[p] * 1000000.0)) for x in xs))
            / (len(xs) * 1000000)
            for p in range(_PQ_DIM)
        ]
        for c, xs in percell.items()
    }

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cos(a, b):
        import math

        return fold_dot(a, b) / (
            math.sqrt(fold_dot(a, a)) * math.sqrt(fold_dot(b, b))
        )

    expect = {}
    for qid in range(_PQ_QUERIES):
        ranked = sorted(
            cents,
            key=lambda c: (-int(np.floor(cos(byid[qid], cents[c]) * 10000.0)), c),
        )
        probed = set(ranked[:2])
        dtab = [
            [subdist(qv[qid], cb[j], s) for j in range(_PQ_CODEWORDS)]
            for s in range(_PQ_M)
        ]
        scored = sorted(
            (
                sum(dtab[s][codes[cid][s]] for s in range(_PQ_M)),
                cid,
            )
            for cid in byid
            if cid != qid and cells[cid] in probed
        )
        expect[qid] = [
            (cid, rank + 1, adc)
            for rank, (adc, cid) in enumerate(scored[:_PQ_TOPK])
        ]
    got = REGISTRY["x51_ivfpq_topk"].fn(spark, SF_DIR).collect()
    got_map: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        got_map.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["rank"], r["adc_dist"])
        )
    assert got_map == expect


def test_incremental_neardup_straddles_split_and_matches_exact(spark):
    """x53's every output pair must straddle the corpus/batch split,
    and its verified jaccard must equal the full exact computation
    (x2c) for that pair — the incremental probe changes WHICH pairs
    are examined, never their grade.  (LSH misses are allowed: x53 ⊆
    cross-split x2c, not equality.)"""
    import hashlib

    got = REGISTRY["x53_incremental_neardup"].fn(spark, SF_DIR).collect()
    assert got, "testdata has cross-split near-dups; empty means broken"
    exact = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])): r["jaccard"]
        for r in REGISTRY["x2c_ngram_jaccard"].fn(spark, SF_DIR).collect()
    }
    for r in got:
        c, b = r["corpus_doc_id"], r["batch_doc_id"]
        assert hashlib.md5(str(c).encode()).hexdigest() < "cd", r
        assert hashlib.md5(str(b).encode()).hexdigest() >= "cd", r
        assert exact[(min(c, b), max(c, b))] == r["jaccard"], r


def test_x59_covers_batch_split_with_consistent_verdicts(spark):
    """The steady-state composed verdict must cover exactly the batch
    side of the split, once each, and every verdict must be the
    first-failing-layer recomputation of its own signal columns
    (quality > exact > neardup > semdup > sampled > keep)."""
    import hashlib

    from data_engineer_project_weather_analytics_spark.plans import corpus

    rows = corpus.x59_ingest_curation(spark, SF_DIR).collect()
    batch_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
        if hashlib.md5(str(r["doc_id"]).encode()).hexdigest() >= "cd"
    )
    assert sorted(r["doc_id"] for r in rows) == batch_ids
    for r in rows:
        if not r["quality_pass"]:
            want = "drop_quality"
        elif r["exact_kept"] == 0:
            want = "drop_exact"
        elif r["n_near"] > 0:
            want = "drop_neardup"
        elif r["semantic_kept"] == 0:
            want = "drop_semdup"
        elif not r["sampled"]:
            want = "drop_sampled"
        else:
            want = "keep"
        assert r["verdict"] == want, r
        # signal-column coherence: a near count needs a best Jaccard
        # over threshold; a semantic drop needs a best_sim over 0.8
        if r["n_near"] > 0:
            assert r["best_jaccard"] is not None and r["best_jaccard"] >= 0.1, r
        else:
            assert r["best_jaccard"] is None, r
        if r["semantic_kept"] == 0:
            assert r["best_sim"] is not None and r["best_sim"] >= 8000, r
