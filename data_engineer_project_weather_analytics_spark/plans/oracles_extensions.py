"""DuckDB oracle SQL for the extension query set (plans/extensions.py).

Shingle generation uses ``list_transform(generate_series(...))`` —
DuckDB's lateral-free equivalent of Spark's ``transform(sequence(...))``
— and MinHash/SimHash share the engine-portable md5 construction with
the Spark side, so the sketches are bit-identical.
"""

from __future__ import annotations

from data_engineer_project_weather_analytics_spark.operators.multimodal import (
    AUDIO_SAMPLE_RATE,
    N_VIDEO_FRAMES,
    VIDEO_FPS,
)
from data_engineer_project_weather_analytics_spark.operators.dedup import SHINGLE_HASH_HEX
from data_engineer_project_weather_analytics_spark.operators.similarity import ANN_TOPK, seeded_hyperplanes
from data_engineer_project_weather_analytics_spark.operators.text import PII_PATTERNS
from data_engineer_project_weather_analytics_spark.plans.extensions import (
    DECON_SHINGLE_N,
    EVAL_SPLIT_HEX,
    EVAL_SUITE_ROWS,
    LSH_MAX_BUCKET,
    RETRACT_SPLIT_HEX,
)

#: capped-bucket CTE body — tracks plans.extensions.LSH_MAX_BUCKET so
#: the Spark cap and the oracle cap can never drift (used by x2b, x2f,
#: x2e).  Assumes a CTE named ``sigs`` in scope.
_OK_BUCKETS = f"""
            SELECT band, minhash
            FROM sigs
            GROUP BY band, minhash
            HAVING count(DISTINCT doc_id) BETWEEN 2 AND {LSH_MAX_BUCKET}
"""


def _x11_pii_sql() -> str:
    """Replay of x11_pii_redaction: the same literal docs, the same
    patterns in the same order (imported, not copied), with DuckDB's
    'g' flag matching Spark's replace-all default."""
    from data_engineer_project_weather_analytics_spark.plans.extensions import PII_DOCS

    def esc(s: str) -> str:
        return s.replace("'", "''")

    redacted = "text"
    for _, pat, tok in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{esc(pat)}', '{tok}', 'g')"
    counts = ",\n               ".join(
        f"CAST(len(regexp_extract_all(text, '{esc(pat)}')) AS INTEGER) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    values = ", ".join(
        "(" + str(i) + ", '" + t.replace("'", "''") + "')" for i, t in PII_DOCS
    )
    return f"""
        SELECT doc_id,
               {redacted} AS redacted,
               {counts}
        FROM (VALUES {values}) AS docs(doc_id, text)
    """


def _plane_sql(plane: list[float]) -> str:
    """A hyperplane as a DuckDB DOUBLE[] literal — repr() round-trips
    each double exactly, so the SQL side sees bit-identical planes."""
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def _tagged_arms(n_planes: int, dim: int, seed: int, n_tables: int) -> str:
    """UNION ALL arms assigning each vector its sign-pattern bucket in
    every LSH table, planes embedded as literals."""
    arms = []
    for t in range(n_tables):
        planes = seeded_hyperplanes(dim, n_planes, seed + t)
        bits = " || ".join(
            "(CASE WHEN list_inner_product(emb, " + _plane_sql(p) + ") >= 0 "
            "THEN '1' ELSE '0' END)"
            for p in planes
        )
        arms.append(
            f"SELECT vec_id, {t} AS tbl, {bits} AS bkt FROM v"
        )
    return "\n            UNION ALL ".join(arms)


def _x3b_lsh_oracle(
    threshold: float = 0.8,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    n_tables: int = 4,
) -> str:
    """Replay of operators.similarity.embedding_neardup_lsh: the same
    seeded hyperplanes (embedded as literals), the same sign-pattern
    buckets, the same kept-bucket width filter
    (``EMB_LSH_MAX_BUCKET``), the same per-distinct-pair cosine verify
    with floor-quantized similarity."""
    from data_engineer_project_weather_analytics_spark.plans.extensions import EMB_LSH_MAX_BUCKET

    tagged = _tagged_arms(n_planes, dim, seed, n_tables)
    thr = int(round(threshold * 10000))  # round, not int(): see sim_q callers
    return f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        ),
        tagged AS (
            {tagged}
        ),
        kept AS (
            SELECT tbl, bkt
            FROM tagged
            GROUP BY tbl, bkt
            HAVING count(*) BETWEEN 2 AND {EMB_LSH_MAX_BUCKET}
        ),
        tagged_kept AS (
            -- kept is unique per (tbl, bkt): inner join ≡ semi join
            SELECT t.vec_id, t.tbl, t.bkt
            FROM tagged t JOIN kept k ON t.tbl = k.tbl AND t.bkt = k.bkt
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM tagged_kept a
            JOIN tagged_kept b ON a.tbl = b.tbl AND a.bkt = b.bkt
            WHERE a.vec_id < b.vec_id
        )
        SELECT id_a, id_b,
               CAST(floor(list_cosine_similarity(va.emb, vb.emb) * 10000)
                    AS BIGINT) AS sim
        FROM cand
        JOIN v va ON va.vec_id = id_a
        JOIN v vb ON vb.vec_id = id_b
        WHERE CAST(floor(list_cosine_similarity(va.emb, vb.emb) * 10000)
                   AS BIGINT) >= {thr}
    """


def _x3d_lsh_ann_oracle(
    k: int = ANN_TOPK,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    n_tables: int = 2,
) -> str:
    """Replay of operators.similarity.lsh_ann_topk for queries
    vec_id < 10: bucket-collision candidates OR-amplified over
    ``n_tables`` plane sets, exact cosine re-rank within candidates."""
    tagged = _tagged_arms(n_planes, dim, seed, n_tables)
    return f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        ),
        tagged AS (
            {tagged}
        ),
        qt AS (SELECT * FROM tagged WHERE vec_id < 10),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM tagged c
            JOIN qt q ON c.tbl = q.tbl AND c.bkt = q.bkt
            WHERE c.vec_id <> q.vec_id
        ),
        scored AS (
            SELECT query_id, neighbor_id,
                   list_cosine_similarity(vq.emb, vc.emb) AS cos
            FROM cand
            JOIN v vq ON vq.vec_id = query_id
            JOIN v vc ON vc.vec_id = neighbor_id
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
               CAST(floor(cos * 10000) AS BIGINT) AS sim
        FROM scored
        QUALIFY rank <= {k}
    """


def _x13_sql() -> str:
    """Replay of x13_stratified_sample from the same threshold table."""
    from data_engineer_project_weather_analytics_spark.plans.extensions import (
        DEFAULT_STRATUM_THRESHOLD,
        STRATA_THRESHOLDS,
    )

    cases = "\n                 ".join(
        f"WHEN lang = '{lang}' THEN '{t}'" for lang, t in STRATA_THRESHOLDS
    )
    return f"""
        SELECT doc_id, lang, threshold
        FROM (
            SELECT doc_id, lang,
                   CASE {cases}
                        ELSE '{DEFAULT_STRATUM_THRESHOLD}' END AS threshold,
                   md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        )
        WHERE h < threshold
    """


def _x12_sql() -> str:
    """Replay of x12_blocked_edit_dedup over the same literal titles."""
    from data_engineer_project_weather_analytics_spark.plans.extensions import X12_TITLES

    values = ", ".join(
        "(" + str(i) + ", '" + t.replace("'", "''") + "')" for i, t in X12_TITLES
    )
    return f"""
        WITH docs AS (
            SELECT id, title, split_part(title, ' ', 1) AS block
            FROM (VALUES {values}) AS t(id, title)
        )
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(levenshtein(a.title, b.title) AS INTEGER) AS edit_distance
        FROM docs a
        JOIN docs b ON a.block = b.block
        WHERE a.id < b.id
          AND levenshtein(a.title, b.title) <= 2
    """


#: distinct (doc_id, 3-word shingle) pairs
_SHINGLES = """
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2])) AS shingle
        FROM documents
"""

def _shingles_n(n: int, src: str = "documents") -> str:
    """Distinct (doc_id, n-word shingle) pairs over ``src`` — the
    parametric form of ``_SHINGLES`` for non-default widths (x61b's
    8-gram windows).  Same construction: 1-based DuckDB list indexing,
    ``generate_series`` bounded at 0 for short docs."""
    words = " || ' ' || ".join(
        f"string_split(text, ' ')[i+{j}]" if j else "string_split(text, ' ')[i]"
        for j in range(n)
    )
    return f"""
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(string_split(text, ' ')) - {n - 1}, 0)),
                   i -> {words})) AS shingle
        FROM {src}
"""


#: per-doc DISTINCT hashed-shingle set (packed) — the verify-side
#: twin of operators.dedup.doc_shingle_hash_sets: same md5 prefix
#: (SHINGLE_HASH_HEX = 15 hex chars = 60 bits), so any hash collision
#: merges the same two shingles on both engines and the exact-Jaccard
#: verify can never drift.  Assumes a CTE named ``ds`` in scope.
_HASH_SETS = f"""
            SELECT doc_id, sh_set, len(sh_set) AS set_size FROM (
                SELECT doc_id,
                       list(DISTINCT ('0x' || substr(md5(shingle), 1,
                           {SHINGLE_HASH_HEX}))::BIGINT) AS sh_set
                FROM ds GROUP BY doc_id
            )
"""

_SIGNATURES = f"""
        WITH ds AS ({_SHINGLES}),
        bands AS (SELECT unnest(generate_series(0, 7)) AS band)
        SELECT doc_id, CAST(band AS INTEGER) AS band,
               min(substr(md5(shingle) || md5(shingle || '#'),
                          8 * band + 1, 8)) AS minhash
        FROM ds CROSS JOIN bands
        GROUP BY doc_id, band
"""

#: Lloyd k-means unrolled as a CTE chain ending in the final
#: assignment ``a3 (vec_id, emb, cell, simq)`` over centroids ``c2`` —
#: shared by the x3g assignment oracle, the x45 SemDeDup keep-decision
#: oracle, and (with the corpus predicate spliced into the ``v`` CTE
#: via :func:`_kmeans_ctes`) the x54 incremental-probe oracle.
_KMEANS_CTES_TEMPLATE = """
        v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings__V_WHERE__
        ),
        seed AS (
            SELECT row_number() OVER (ORDER BY h, vec_id) AS cell,
                   emb AS centroid
            FROM (
                SELECT vec_id, emb,
                       ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS h
                FROM v
                ORDER BY h, vec_id LIMIT 8
            )
        ),
        a1 AS (
            -- argmax on the 1e-4-floored cosine, ties to the lowest
            -- cell: DuckDB's list_cosine_similarity and Spark's fold
            -- tree differ in the last ulp, so ordering on the raw
            -- double could flip a near-tie and compound through the
            -- centroid updates (x42 integer-key rule)
            SELECT vec_id, emb, cell FROM (
                SELECT v.vec_id, v.emb, c.cell,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY CAST(floor(list_cosine_similarity(
                                        v.emb, c.centroid) * 10000)
                                        AS BIGINT) DESC, c.cell) AS r
                FROM v CROSS JOIN seed c
            ) WHERE r = 1
        ),
        c1 AS (
            SELECT cell, list(comp ORDER BY pos) AS centroid FROM (
                SELECT cell, u.pos AS pos,
                       CAST(sum(CAST(floor(CAST(u.val AS DOUBLE) * 1000000.0)
                                     AS BIGINT)) AS DOUBLE)
                           / (count(*) * 1000000) AS comp
                FROM (
                    SELECT cell,
                           unnest(list_transform(
                               generate_series(1, len(emb)),
                               i -> {'pos': i, 'val': emb[i]})) AS u
                    FROM a1
                )
                GROUP BY cell, u.pos
            ) GROUP BY cell
        ),
        a2 AS (
            SELECT vec_id, emb, cell FROM (
                SELECT v.vec_id, v.emb, c.cell,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY CAST(floor(list_cosine_similarity(
                                        v.emb, c.centroid) * 10000)
                                        AS BIGINT) DESC, c.cell) AS r
                FROM v CROSS JOIN c1 c
            ) WHERE r = 1
        ),
        c2 AS (
            SELECT cell, list(comp ORDER BY pos) AS centroid FROM (
                SELECT cell, u.pos AS pos,
                       CAST(sum(CAST(floor(CAST(u.val AS DOUBLE) * 1000000.0)
                                     AS BIGINT)) AS DOUBLE)
                           / (count(*) * 1000000) AS comp
                FROM (
                    SELECT cell,
                           unnest(list_transform(
                               generate_series(1, len(emb)),
                               i -> {'pos': i, 'val': emb[i]})) AS u
                    FROM a2
                )
                GROUP BY cell, u.pos
            ) GROUP BY cell
        ),
        a3 AS (
            SELECT vec_id, emb, cell, simq FROM (
                SELECT v.vec_id, v.emb, c.cell,
                       CAST(floor(list_cosine_similarity(
                            v.emb, c.centroid) * 10000) AS BIGINT) AS simq,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY CAST(floor(list_cosine_similarity(
                                        v.emb, c.centroid) * 10000)
                                        AS BIGINT) DESC, c.cell) AS r
                FROM v CROSS JOIN c2 c
            ) WHERE r = 1
        )"""


def _kmeans_ctes(v_where: str = "") -> str:
    """The unrolled k-means CTE chain with an optional predicate on the
    vector source — ``_kmeans_ctes()`` is the full-corpus chain x3g/x45
    replay; x54 splices the corpus-side split predicate so the probe
    oracle clusters ONLY the existing corpus (the x53-over-x2f
    recipe)."""
    return _KMEANS_CTES_TEMPLATE.replace("__V_WHERE__", v_where)


_KMEANS_CTES = _kmeans_ctes()

#: shared PQ replay chain (x50 standalone ADC, x51 IVFADC): the x23
#: quantizer tree, exploded components, all vector->codeword subspace
#: distances (exact int64), argmin codes on dist*16+cb_id, and the
#: 8-query ADC distance tables.  Spliced into both oracles so the two
#: PQ queries can never drift from each other (the _KMEANS_CTES rule).
#: the x23 quantizer chain alone (pv/mx/qz) — the prefix every
#: quantized-vector oracle shares; x57 splices just this, the PQ
#: oracles splice the full _PQ_CTES built on top of it.
_QZ_CTES = """pv AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ),
        mx AS (
            SELECT max(list_max(list_transform(emb, x -> abs(x)))) AS m
            FROM pv
        ),
        qz AS (
            SELECT vec_id,
                   list_transform(
                       emb, x -> CAST(floor(x * (127.0 / m)) AS BIGINT)
                   ) AS qv
            FROM pv, mx
        )"""

_PQ_CTES = _QZ_CTES + """,
        pcomp AS (
            SELECT vec_id,
                   unnest(generate_series(1, 64)) AS i,
                   unnest(qv) AS q
            FROM qz
        ),
        pcomps AS (
            SELECT vec_id, CAST((i - 1) // 16 AS INT) AS s, i, q FROM pcomp
        ),
        cdist AS (
            SELECT a.vec_id, c.vec_id AS cb_id, a.s,
                   CAST(sum((a.q - c.q) * (a.q - c.q)) AS BIGINT) AS d
            FROM pcomps a JOIN pcomps c ON a.i = c.i AND c.vec_id < 16
            GROUP BY a.vec_id, c.vec_id, a.s
        ),
        codes AS (
            SELECT vec_id, s, CAST(min(d * 16 + cb_id) % 16 AS INT) AS code
            FROM cdist GROUP BY vec_id, s
        ),
        dtab AS (
            SELECT vec_id AS query_id, s, cb_id, d
            FROM cdist WHERE vec_id < 8
        )"""


ORACLES_EXT: dict[str, str] = {
    "x1_exact_dedup": """
        SELECT md5(text) AS text_hash,
               min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    "x1b_incremental_dedup": """
        WITH fp AS (
            SELECT doc_id, md5(lower(text)) AS fingerprint,
                   CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cd'
                        THEN 'train' ELSE 'test' END AS split
            FROM documents
        )
        SELECT min(doc_id) AS doc_id, fingerprint
        FROM fp
        WHERE split = 'test'
          AND fingerprint NOT IN
              (SELECT fingerprint FROM fp WHERE split = 'train')
        GROUP BY fingerprint
    """,
    "x2_minhash_signatures": _SIGNATURES,
    "x2b_lsh_candidate_pairs": f"""
        WITH sigs AS ({_SIGNATURES}),
        ok_buckets AS ({_OK_BUCKETS})
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sigs a
        JOIN sigs b ON a.band = b.band AND a.minhash = b.minhash
        JOIN ok_buckets ob ON ob.band = a.band AND ob.minhash = a.minhash
        WHERE a.doc_id < b.doc_id
    """,
    "x2c_ngram_jaccard": f"""
        WITH ds AS ({_SHINGLES}),
        sizes AS (SELECT doc_id, count(*) AS set_size FROM ds GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM ds a JOIN ds b ON a.shingle = b.shingle
            WHERE a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b,
               CAST(n_inter AS DOUBLE) /
                   (sa.set_size + sb.set_size - n_inter) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_inter AS DOUBLE) /
                  (sa.set_size + sb.set_size - n_inter) >= 0.1
    """,
    "x2f_lsh_verified_neardup": f"""
        WITH ds AS ({_SHINGLES}),
        sigs AS (
            SELECT doc_id, CAST(band AS INTEGER) AS band,
                   min(substr(md5(shingle) || md5(shingle || '#'),
                              8 * band + 1, 8)) AS minhash
            FROM ds CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS band) b
            GROUP BY doc_id, band
        ),
        ok_buckets AS ({_OK_BUCKETS}),
        candidates AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sigs a
            JOIN sigs b ON a.band = b.band AND a.minhash = b.minhash
            JOIN ok_buckets ob ON ob.band = a.band AND ob.minhash = a.minhash
            WHERE a.doc_id < b.doc_id
        ),
        dsa AS ({_HASH_SETS}),
        scored AS (
            SELECT c.id_a, c.id_b,
                   CAST(len(list_intersect(a.sh_set, b.sh_set)) AS BIGINT)
                       AS n_inter,
                   a.set_size AS size_a, b.set_size AS size_b
            FROM candidates c
            JOIN dsa a ON a.doc_id = c.id_a
            JOIN dsa b ON b.doc_id = c.id_b
        )
        SELECT id_a, id_b,
               CAST(n_inter AS DOUBLE) /
                   (size_a + size_b - n_inter) AS jaccard
        FROM scored
        WHERE CAST(n_inter AS DOUBLE) /
                  (size_a + size_b - n_inter) >= 0.1
    """,
    # cross-side candidates only (corpus = md5(id) < 'cd', batch = the
    # rest); same kept-bucket cap as x2b/x2f, same verifier
    "x53_incremental_neardup": f"""
        WITH ds AS ({_SHINGLES}),
        sigs AS (
            SELECT doc_id, CAST(band AS INTEGER) AS band,
                   min(substr(md5(shingle) || md5(shingle || '#'),
                              8 * band + 1, 8)) AS minhash
            FROM ds CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS band) b
            GROUP BY doc_id, band
        ),
        ok_buckets AS ({_OK_BUCKETS}),
        candidates AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sigs a
            JOIN sigs b ON a.band = b.band AND a.minhash = b.minhash
            JOIN ok_buckets ob ON ob.band = a.band AND ob.minhash = a.minhash
            WHERE md5(CAST(a.doc_id AS VARCHAR)) < 'cd'
              AND md5(CAST(b.doc_id AS VARCHAR)) >= 'cd'
        ),
        dsa AS ({_HASH_SETS}),
        scored AS (
            SELECT c.id_a, c.id_b,
                   CAST(len(list_intersect(a.sh_set, b.sh_set)) AS BIGINT)
                       AS n_inter,
                   a.set_size AS size_a, b.set_size AS size_b
            FROM candidates c
            JOIN dsa a ON a.doc_id = c.id_a
            JOIN dsa b ON b.doc_id = c.id_b
        )
        SELECT id_a AS corpus_doc_id, id_b AS batch_doc_id,
               CAST(n_inter AS DOUBLE) /
                   (size_a + size_b - n_inter) AS jaccard
        FROM scored
        WHERE CAST(n_inter AS DOUBLE) /
                  (size_a + size_b - n_inter) >= 0.1
    """,
    # train↔eval decontamination: the eval slice ('fa' threshold =
    # plans.extensions.EVAL_SPLIT_HEX) is the fixed benchmark suite;
    # hashed shingles shared with the Spark side (SHINGLE_HASH_HEX) so
    # a collision can never drift the hit counts
    "x61_decontamination": f"""
        WITH ds AS ({_SHINGLES}),
        tsh AS (
            SELECT doc_id,
                   ('0x' || substr(md5(shingle), 1,
                       {SHINGLE_HASH_HEX}))::BIGINT AS sh
            FROM ds WHERE md5(CAST(doc_id AS VARCHAR)) < 'cd'
        ),
        esh AS (
            SELECT DISTINCT
                   ('0x' || substr(md5(shingle), 1,
                       {SHINGLE_HASH_HEX}))::BIGINT AS sh
            FROM ds WHERE md5(CAST(doc_id AS VARCHAR)) >= 'fa'
        ),
        agg AS (
            SELECT t.doc_id,
                   CAST(count(*) AS BIGINT) AS n_shingles,
                   CAST(count(e.sh) AS BIGINT) AS n_hit
            FROM tsh t LEFT JOIN esh e ON t.sh = e.sh
            GROUP BY t.doc_id
        )
        SELECT doc_id AS train_doc_id, n_shingles, n_hit,
               CAST(n_hit AS DOUBLE) / n_shingles AS contamination
        FROM agg WHERE n_hit > 0
    """,
    # production-contract decontamination (x61b): FIXED eval suite
    # (lowest EVAL_SUITE_ROWS doc_ids of the eval slice) and 8-gram
    # windows — same one-pass shape, scale-constant eval side
    "x61b_decontamination_fixed_eval": f"""
        WITH eval_suite AS (
            SELECT doc_id, text FROM documents
            WHERE md5(CAST(doc_id AS VARCHAR)) >= '{EVAL_SPLIT_HEX}'
            ORDER BY doc_id LIMIT {EVAL_SUITE_ROWS}
        ),
        tds AS ({_shingles_n(DECON_SHINGLE_N, '''(
            SELECT doc_id, text FROM documents
            WHERE md5(CAST(doc_id AS VARCHAR)) < 'cd') t''')}),
        eds AS ({_shingles_n(DECON_SHINGLE_N, "eval_suite")}),
        tsh AS (
            SELECT doc_id,
                   ('0x' || substr(md5(shingle), 1,
                       {SHINGLE_HASH_HEX}))::BIGINT AS sh
            FROM tds
        ),
        esh AS (
            SELECT DISTINCT
                   ('0x' || substr(md5(shingle), 1,
                       {SHINGLE_HASH_HEX}))::BIGINT AS sh
            FROM eds
        ),
        agg AS (
            SELECT t.doc_id,
                   CAST(count(*) AS BIGINT) AS n_shingles,
                   CAST(count(e.sh) AS BIGINT) AS n_hit
            FROM tsh t LEFT JOIN esh e ON t.sh = e.sh
            GROUP BY t.doc_id
        )
        SELECT doc_id AS train_doc_id, n_shingles, n_hit,
               CAST(n_hit AS DOUBLE) / n_shingles AS contamination
        FROM agg WHERE n_hit > 0
    """,
    # per-EVAL-doc contamination coverage (x61c): distinct train
    # shingle hashes intersected with the eval set first (bounded by
    # the eval set), then the per-doc arithmetic on eval-sized tables
    "x61c_contamination_eval_coverage": f"""
        WITH eval_suite AS (
            SELECT doc_id, text FROM documents
            WHERE md5(CAST(doc_id AS VARCHAR)) >= '{EVAL_SPLIT_HEX}'
            ORDER BY doc_id LIMIT {EVAL_SUITE_ROWS}
        ),
        eds AS ({_shingles_n(DECON_SHINGLE_N, "eval_suite")}),
        esh AS (
            -- eds is DISTINCT at the raw-shingle level; no hash-level
            -- DISTINCT here, so a within-doc hash collision stays two
            -- rows exactly as on the Spark side (the x61 tsh rule)
            SELECT doc_id,
                   ('0x' || substr(md5(shingle), 1,
                       {SHINGLE_HASH_HEX}))::BIGINT AS sh
            FROM eds
        ),
        tds AS ({_shingles_n(DECON_SHINGLE_N, '''(
            SELECT doc_id, text FROM documents
            WHERE md5(CAST(doc_id AS VARCHAR)) < 'cd') t''')}),
        hits AS (
            SELECT DISTINCT t.sh FROM (
                SELECT ('0x' || substr(md5(shingle), 1,
                           {SHINGLE_HASH_HEX}))::BIGINT AS sh
                FROM tds
            ) t
            JOIN (SELECT DISTINCT sh FROM esh) e ON t.sh = e.sh
        )
        SELECT e.doc_id AS eval_doc_id,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(count(h.sh) AS BIGINT) AS n_hit,
               CAST(count(h.sh) AS DOUBLE) / count(*) AS coverage
        FROM esh e LEFT JOIN hits h ON e.sh = h.sh
        GROUP BY e.doc_id
    """,
    "x2d_simhash": """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ), votes AS (
            SELECT doc_id,
                   {votes}
            FROM tok
            GROUP BY doc_id
        )
        SELECT doc_id, {bits} AS simhash16 FROM votes
    """.format(
        votes=",\n                   ".join(
            "sum(CASE WHEN substr(md5(w), {i}, 1) IN "
            "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v{i}".format(i=i + 1)
            for i in range(16)
        ),
        bits=" || ".join(
            "(CASE WHEN v{i} > 0 THEN '1' ELSE '0' END)".format(i=i + 1) for i in range(16)
        ),
    ),
    # rank on the 1e-4-quantized cosine (integer-key rule, ADVICE r7):
    # both engines order identical BIGINTs, so a last-ulp engine drift
    # in the raw double can never flip the top-k boundary
    "x3_cosine_topk": """
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings),
        scored AS (
            SELECT query_id, neighbor_id,
                   list_cosine_similarity(qv, cv) AS cos
            FROM c CROSS JOIN q
            WHERE neighbor_id <> query_id
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY CAST(floor(cos * 10000) AS BIGINT) DESC,
                            neighbor_id) AS INTEGER) AS rank,
               CAST(floor(cos * 10000) AS BIGINT) AS sim
        FROM scored
        QUALIFY rank <= __ANN_TOPK__
    """,
    # PQ/ADC replay: same x23 quantizer tree floor(x*(127/max)); every
    # distance an exact int64 sum of squared diffs (order-independent),
    # argmin on dist*16+cb_id (integer-key ranking rule).  Constants
    # (m=4 subspaces of 16 dims, 16 codewords = vec_id<16, 8 queries,
    # top-10) are spliced literals — keep in lockstep with extensions
    # ._PQ_* (pinned by test_pq_oracle_constants_in_lockstep).
    "x50_pq_topk": """
        WITH __PQ_CTES__,
        adc AS (
            SELECT t.query_id, c.vec_id AS neighbor_id,
                   CAST(sum(t.d) AS BIGINT) AS adc_dist
            FROM codes c JOIN dtab t ON t.s = c.s AND t.cb_id = c.code
            WHERE c.vec_id <> t.query_id
            GROUP BY t.query_id, c.vec_id
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY adc_dist, neighbor_id) AS INTEGER) AS rank,
               adc_dist
        FROM adc
        QUALIFY rank <= 10
    """,
    # IVFADC: probe 2 cells per query on the 1e-4-quantized centroid
    # cosine (mu-quantized exact-mean centroids, the x3e chain), then
    # ADC-score ONLY candidates in probed cells via the shared PQ codes
    "x51_ivfpq_topk": """
        WITH __PQ_CTES__,
        vl AS (
            SELECT vec_id, label AS cell, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ),
        ccomp AS (
            SELECT cell, u.pos AS pos,
                   CAST(sum(CAST(floor(CAST(u.val AS DOUBLE) * 1000000.0)
                                 AS BIGINT)) AS DOUBLE)
                       / (count(*) * 1000000) AS comp
            FROM (
                SELECT cell,
                       unnest(list_transform(
                           generate_series(1, len(emb)),
                           i -> {'pos': i, 'val': emb[i]})) AS u
                FROM vl
            )
            GROUP BY cell, u.pos
        ),
        cent AS (
            SELECT cell, list(comp ORDER BY pos) AS centroid
            FROM ccomp GROUP BY cell
        ),
        q AS (SELECT vec_id AS query_id, emb AS qemb FROM vl
              WHERE vec_id < 8),
        probes AS (
            SELECT query_id, cell FROM (
                SELECT q.query_id, c.cell,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY CAST(floor(
                               list_cosine_similarity(q.qemb, c.centroid)
                               * 10000) AS BIGINT) DESC, c.cell) AS r
                FROM q CROSS JOIN cent c
            ) WHERE r <= 2
        ),
        adc AS (
            SELECT t.query_id, c.vec_id AS neighbor_id,
                   CAST(sum(t.d) AS BIGINT) AS adc_dist
            FROM codes c
            JOIN vl ON vl.vec_id = c.vec_id
            JOIN probes p ON p.cell = vl.cell
            JOIN dtab t ON t.query_id = p.query_id
                       AND t.s = c.s AND t.cb_id = c.code
            WHERE c.vec_id <> t.query_id
            GROUP BY t.query_id, c.vec_id
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY adc_dist, neighbor_id) AS INTEGER) AS rank,
               adc_dist
        FROM adc
        QUALIFY rank <= 10
    """,
    # recall of the PQ index vs the exact cosine top-10 over the same
    # 8 queries: set overlap, integer ppm (x30's grading recipe)
    "x52_pq_recall": """
        WITH __PQ_CTES__,
        padc AS (
            SELECT t.query_id, c.vec_id AS neighbor_id,
                   CAST(sum(t.d) AS BIGINT) AS adc_dist
            FROM codes c JOIN dtab t ON t.s = c.s AND t.cb_id = c.code
            WHERE c.vec_id <> t.query_id
            GROUP BY t.query_id, c.vec_id
        ),
        pq AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY adc_dist, neighbor_id) AS r
                FROM padc
            ) WHERE r <= 10
        ),
        q AS (SELECT vec_id AS query_id, emb AS qemb FROM pv
              WHERE vec_id < 8),
        ex AS (
            -- exact side ranks on the 1e-4-quantized cosine (the x42
            -- integer-key rule; ADVICE r7): a raw-double top-10
            -- boundary flip would change n_hit, turning last-ulp
            -- engine drift into a grade change
            SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY CAST(floor(list_cosine_similarity(
                                        q.qemb, c.emb) * 10000) AS BIGINT)
                                        DESC, c.vec_id) AS r
                FROM pv c CROSS JOIN q
                WHERE c.vec_id <> q.query_id
            ) WHERE r <= 10
        )
        SELECT e.query_id,
               CAST(count(p.neighbor_id) AS BIGINT) AS n_hit,
               CAST(count(p.neighbor_id) * 1000000 // 10 AS BIGINT)
                   AS recall_ppm
        FROM ex e LEFT JOIN pq p USING (query_id, neighbor_id)
        GROUP BY e.query_id
    """,
    # IVFADC recall dial: the x51 probe chain generalized to the widest
    # dial (r <= 4, probe rank kept — a neighbor's cell has exactly one
    # rank per query since cells partition the corpus), ADC-scored once,
    # then per-nprobe top-10 as rank-filtered windows; recall vs the
    # quantized-ranked exact top-10 in integer ppm (the x30/x52 recipe)
    "x55_ivfpq_recall": """
        WITH __PQ_CTES__,
        vl AS (
            SELECT vec_id, label AS cell, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ),
        ccomp AS (
            SELECT cell, u.pos AS pos,
                   CAST(sum(CAST(floor(CAST(u.val AS DOUBLE) * 1000000.0)
                                 AS BIGINT)) AS DOUBLE)
                       / (count(*) * 1000000) AS comp
            FROM (
                SELECT cell,
                       unnest(list_transform(
                           generate_series(1, len(emb)),
                           i -> {'pos': i, 'val': emb[i]})) AS u
                FROM vl
            )
            GROUP BY cell, u.pos
        ),
        cent AS (
            SELECT cell, list(comp ORDER BY pos) AS centroid
            FROM ccomp GROUP BY cell
        ),
        q AS (SELECT vec_id AS query_id, emb AS qemb FROM vl
              WHERE vec_id < 8),
        probes AS (
            SELECT query_id, cell, r AS probe_rank FROM (
                SELECT q.query_id, c.cell,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY CAST(floor(
                               list_cosine_similarity(q.qemb, c.centroid)
                               * 10000) AS BIGINT) DESC, c.cell) AS r
                FROM q CROSS JOIN cent c
            ) WHERE r <= 4
        ),
        adc AS (
            SELECT t.query_id, c.vec_id AS neighbor_id, p.probe_rank,
                   CAST(sum(t.d) AS BIGINT) AS adc_dist
            FROM codes c
            JOIN vl ON vl.vec_id = c.vec_id
            JOIN probes p ON p.cell = vl.cell
            JOIN dtab t ON t.query_id = p.query_id
                       AND t.s = c.s AND t.cb_id = c.code
            WHERE c.vec_id <> t.query_id
            GROUP BY t.query_id, c.vec_id, p.probe_rank
        ),
        np AS (SELECT unnest([1, 2, 4]) AS nprobe),
        pq AS (
            SELECT query_id, nprobe, neighbor_id FROM (
                SELECT a.query_id, np.nprobe, a.neighbor_id,
                       row_number() OVER (
                           PARTITION BY a.query_id, np.nprobe
                           ORDER BY a.adc_dist, a.neighbor_id) AS r
                FROM adc a JOIN np ON a.probe_rank <= np.nprobe
            ) WHERE r <= 10
        ),
        ex AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY CAST(floor(list_cosine_similarity(
                                        q.qemb, c.emb) * 10000) AS BIGINT)
                                        DESC, c.vec_id) AS r
                FROM vl c CROSS JOIN q
                WHERE c.vec_id <> q.query_id
            ) WHERE r <= 10
        )
        SELECT e.query_id, np.nprobe,
               CAST(count(p.neighbor_id) AS BIGINT) AS n_hit,
               CAST(count(p.neighbor_id) * 1000000 // 10 AS BIGINT)
                   AS recall_ppm
        FROM ex e CROSS JOIN np
        LEFT JOIN pq p ON p.query_id = e.query_id
                      AND p.nprobe = np.nprobe
                      AND p.neighbor_id = e.neighbor_id
        GROUP BY e.query_id, np.nprobe
    """,
    # SQ8 recall dial: raw int8 dot ranking vs x23's rescored pipeline,
    # graded vs the quantized-ranked exact top-10 (the x52 recipe);
    # candidate scores are exact int64 dots over the shared quantizer
    "x58_sq8_recall": """
        WITH __QZ_CTES__,
        comp AS (
            SELECT vec_id,
                   unnest(generate_series(1, 64)) AS i,
                   unnest(qv) AS q
            FROM qz
        ),
        idot AS (
            SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(sum(a.q * c.q) AS BIGINT) AS iscore
            FROM comp a JOIN comp c ON c.i = a.i AND c.vec_id <> a.vec_id
            WHERE a.vec_id < 8
            GROUP BY a.vec_id, c.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY iscore DESC, neighbor_id) AS r
            FROM idot
        ),
        raw AS (
            SELECT 'sq8' AS method, query_id, neighbor_id
            FROM ranked WHERE r <= 10
        ),
        resc AS (
            SELECT 'sq8_rescore' AS method, query_id, neighbor_id FROM (
                SELECT c.query_id, c.neighbor_id,
                       row_number() OVER (
                           PARTITION BY c.query_id
                           ORDER BY CAST(floor(list_cosine_similarity(
                                        qp.emb, np.emb) * 10000) AS BIGINT)
                                        DESC, c.neighbor_id) AS rr
                FROM ranked c
                JOIN pv qp ON qp.vec_id = c.query_id
                JOIN pv np ON np.vec_id = c.neighbor_id
                WHERE c.r <= 20
            ) WHERE rr <= 10
        ),
        approx AS (
            SELECT * FROM raw UNION ALL SELECT * FROM resc
        ),
        q AS (SELECT vec_id AS query_id, emb AS qemb FROM pv
              WHERE vec_id < 8),
        ex AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY CAST(floor(list_cosine_similarity(
                                        q.qemb, c.emb) * 10000) AS BIGINT)
                                        DESC, c.vec_id) AS r
                FROM pv c CROSS JOIN q
                WHERE c.vec_id <> q.query_id
            ) WHERE r <= 10
        ),
        m AS (SELECT unnest(['sq8', 'sq8_rescore']) AS method)
        SELECT m.method, e.query_id,
               CAST(count(p.neighbor_id) AS BIGINT) AS n_hit,
               CAST(count(p.neighbor_id) * 1000000 // 10 AS BIGINT)
                   AS recall_ppm
        FROM ex e CROSS JOIN m
        LEFT JOIN approx p ON p.method = m.method
                          AND p.query_id = e.query_id
                          AND p.neighbor_id = e.neighbor_id
        GROUP BY m.method, e.query_id
    """,
    # reduced-dimension recall dial: JL ±1 random projection vs prefix
    # truncation at the same 16-int budget, each ranked on the reduced
    # cosine (ONE shared double tree dot/sqrt(nq*nc), floor-quantized),
    # graded vs the quantized-ranked exact top-10 (the x52 recipe).
    # The sign matrix is DERIVED from the portable md5 recipe — both
    # engines hash the same 'rp:j:i' text, nothing spliced.
    "x57_reduced_recall": """
        WITH __QZ_CTES__,
        rsign AS (
            SELECT jj.j AS j, ii.i AS i,
                   CAST(1 - 2 * ((('0x' || substr(md5('rp:' || jj.j || ':'
                       || ii.i), 1, 8))::BIGINT) % 2) AS BIGINT) AS s
            FROM (SELECT unnest(generate_series(0, 15)) AS j) jj,
                 (SELECT unnest(generate_series(0, 63)) AS i) ii
        ),
        comp AS (
            SELECT vec_id,
                   unnest(generate_series(1, 64)) AS i,
                   unnest(qv) AS q
            FROM qz
        ),
        red AS (
            SELECT 'rp' AS method, c.vec_id, r.j,
                   CAST(sum(r.s * c.q) AS BIGINT) AS v
            FROM comp c JOIN rsign r ON r.i = c.i - 1
            GROUP BY c.vec_id, r.j
            UNION ALL
            SELECT 'prefix' AS method, vec_id, i - 1 AS j,
                   CAST(q AS BIGINT) AS v
            FROM comp WHERE i <= 16
        ),
        nrm AS (
            SELECT method, vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM red GROUP BY method, vec_id
            HAVING CAST(sum(v * v) AS BIGINT) > 0
        ),
        rdot AS (
            SELECT q.method, q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(sum(q.v * c.v) AS BIGINT) AS dot
            FROM red q
            JOIN red c ON c.method = q.method AND c.j = q.j
                      AND c.vec_id <> q.vec_id
            WHERE q.vec_id < 8
            GROUP BY q.method, q.vec_id, c.vec_id
        ),
        approx AS (
            SELECT method, query_id, neighbor_id FROM (
                SELECT d.method, d.query_id, d.neighbor_id,
                       row_number() OVER (
                           PARTITION BY d.method, d.query_id
                           ORDER BY CAST(floor(CAST(d.dot AS DOUBLE)
                               / sqrt(CAST(nq.n2 AS DOUBLE)
                                      * CAST(nc.n2 AS DOUBLE))
                               * 10000.0) AS BIGINT) DESC,
                               d.neighbor_id) AS r
                FROM rdot d
                JOIN nrm nq ON nq.method = d.method
                           AND nq.vec_id = d.query_id
                JOIN nrm nc ON nc.method = d.method
                           AND nc.vec_id = d.neighbor_id
            ) WHERE r <= 10
        ),
        q AS (SELECT vec_id AS query_id, emb AS qemb FROM pv
              WHERE vec_id < 8),
        ex AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY CAST(floor(list_cosine_similarity(
                                        q.qemb, c.emb) * 10000) AS BIGINT)
                                        DESC, c.vec_id) AS r
                FROM pv c CROSS JOIN q
                WHERE c.vec_id <> q.query_id
            ) WHERE r <= 10
        ),
        m AS (SELECT unnest(['prefix', 'rp']) AS method)
        SELECT m.method, e.query_id,
               CAST(count(p.neighbor_id) AS BIGINT) AS n_hit,
               CAST(count(p.neighbor_id) * 1000000 // 10 AS BIGINT)
                   AS recall_ppm
        FROM ex e CROSS JOIN m
        LEFT JOIN approx p ON p.method = m.method
                          AND p.query_id = e.query_id
                          AND p.neighbor_id = e.neighbor_id
        GROUP BY m.method, e.query_id
    """,
    "x3b_embedding_neardup": _x3b_lsh_oracle(),
    "x3d_ann_lsh": _x3d_lsh_ann_oracle(),
    "x3e_ivf_topk": """
        WITH v AS (
            SELECT vec_id, label AS cell, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ),
        comp AS (
            SELECT cell, u.pos AS pos,
                   CAST(sum(CAST(floor(CAST(u.val AS DOUBLE) * 1000000.0)
                                 AS BIGINT)) AS DOUBLE)
                       / (count(*) * 1000000) AS comp
            FROM (
                SELECT cell,
                       unnest(list_transform(
                           generate_series(1, len(emb)),
                           i -> {'pos': i, 'val': emb[i]})) AS u
                FROM v
            )
            GROUP BY cell, u.pos
        ),
        cent AS (
            SELECT cell, list(comp ORDER BY pos) AS centroid
            FROM comp GROUP BY cell
        ),
        q AS (SELECT vec_id AS query_id, emb AS qemb FROM v WHERE vec_id < 10),
        probes AS (
            SELECT query_id, cell, qemb FROM (
                SELECT q.query_id, c.cell, q.qemb,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_cosine_similarity(q.qemb, c.centroid)
                                        DESC, c.cell) AS r
                FROM q CROSS JOIN cent c
            ) WHERE r <= 2
        ),
        scored AS (
            SELECT p.query_id, c.vec_id AS neighbor_id,
                   list_cosine_similarity(p.qemb, c.emb) AS cos
            FROM probes p
            JOIN v c ON c.cell = p.cell
            WHERE c.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
               CAST(floor(cos * 10000) AS BIGINT) AS sim
        FROM scored
        QUALIFY rank <= __ANN_TOPK__
    """,
    "x3f_semantic_neardup": """
        WITH v AS (
            SELECT vec_id, label AS cell, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ),
        comp AS (
            SELECT cell, u.pos AS pos,
                   CAST(sum(CAST(floor(CAST(u.val AS DOUBLE) * 1000000.0)
                                 AS BIGINT)) AS DOUBLE)
                       / (count(*) * 1000000) AS comp
            FROM (
                SELECT cell,
                       unnest(list_transform(
                           generate_series(1, len(emb)),
                           i -> {'pos': i, 'val': emb[i]})) AS u
                FROM v
            )
            GROUP BY cell, u.pos
        ),
        cent AS (
            SELECT cell, list(comp ORDER BY pos) AS centroid
            FROM comp GROUP BY cell
        ),
        assigned AS (
            SELECT vec_id, emb, cell FROM (
                SELECT v.vec_id, v.emb, c.cell,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY list_cosine_similarity(v.emb, c.centroid)
                                        DESC, c.cell) AS r
                FROM v CROSS JOIN cent c
            ) WHERE r = 1
        )
        SELECT id_a, id_b, cell, sim
        FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cell AS cell,
                   CAST(floor(list_cosine_similarity(a.emb, b.emb) * 10000)
                        AS BIGINT) AS sim
            FROM assigned a
            JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
        )
        WHERE sim >= 8000
    """,
    # Lloyd k-means unrolled: seed (portable id hash) → assign a1 →
    # µ-quantized means c1 → assign a2 → means c2 → final assignment
    # a3.  Stage-for-stage the Spark loop in similarity.kmeans_assign
    # with KMEANS_K=8 / KMEANS_ITERS=3 (the constants are asserted
    # against this text in tests/test_queries_oracle.py).  The CTE
    # chain is shared with x45 below via _KMEANS_CTES.
    "x3g_kmeans_clusters": """
        WITH __KMEANS_CTES__
        SELECT vec_id, CAST(cell AS INTEGER) AS cluster_id,
               simq AS sim
        FROM a3
    """,
    # greedy min-id SemDeDup over the same unrolled k-means cells: a
    # vector is kept iff no within-cell neighbor at cosine >= 0.8 has
    # a smaller id; n_near is the epsilon-neighborhood degree.
    "x45_semdedup_keep": """
        WITH __KMEANS_CTES__,
        pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM a3 a
            JOIN a3 b ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE CAST(floor(list_cosine_similarity(a.emb, b.emb) * 10000)
                       AS BIGINT) >= 8000
        ),
        sym AS (
            SELECT id_a AS vid, id_b AS nb FROM pairs
            UNION ALL
            SELECT id_b, id_a FROM pairs
        ),
        deg AS (
            SELECT vid,
                   CAST(count(*) AS BIGINT) AS n_near,
                   CAST(sum(CASE WHEN nb < vid THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_smaller
            FROM sym GROUP BY vid
        )
        SELECT a3.vec_id,
               CAST(a3.cell AS INTEGER) AS cluster_id,
               CAST(coalesce(d.n_near, 0) AS BIGINT) AS n_near,
               CAST(CASE WHEN coalesce(d.n_smaller, 0) = 0
                         THEN 1 ELSE 0 END AS INTEGER) AS kept
        FROM a3 LEFT JOIN deg d ON d.vid = a3.vec_id
    """,
    # incremental SemDeDup probe: the k-means chain is spliced with the
    # CORPUS predicate (md5(id) < 'cd' — the x53/x1b split), so a3 is
    # the corpus assignment and c2 the codebook it used; corpus
    # survivors follow the x45 greedy min-id rule (any id_b in a
    # within-cell near pair has a smaller near neighbor → dropped); the
    # batch (md5 >= 'cd') takes ONE assignment pass against c2 and each
    # batch vector keeps iff no same-cell survivor is at >= 0.8.
    "x54_incremental_semdedup": """
        WITH __KMEANS_CORPUS_CTES__,
        pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM a3 a
            JOIN a3 b ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE CAST(floor(list_cosine_similarity(a.emb, b.emb) * 10000)
                       AS BIGINT) >= 8000
        ),
        dropped AS (SELECT DISTINCT id_b AS vid FROM pairs),
        survivors AS (
            SELECT cell, vec_id AS corpus_id, emb
            FROM a3
            WHERE vec_id NOT IN (SELECT vid FROM dropped)
        ),
        bv AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
            WHERE md5(CAST(vec_id AS VARCHAR)) >= 'cd'
        ),
        bassign AS (
            SELECT vec_id, emb, cell FROM (
                SELECT b.vec_id, b.emb, c.cell,
                       row_number() OVER (
                           PARTITION BY b.vec_id
                           ORDER BY CAST(floor(list_cosine_similarity(
                                        b.emb, c.centroid) * 10000)
                                        AS BIGINT) DESC, c.cell) AS r
                FROM bv b CROSS JOIN c2 c
            ) WHERE r = 1
        ),
        near AS (
            SELECT ba.vec_id AS vid,
                   CAST(count(*) AS BIGINT) AS n_near,
                   max(CAST(floor(list_cosine_similarity(ba.emb, s.emb)
                                  * 10000) AS BIGINT)) AS best_sim
            FROM bassign ba
            JOIN survivors s ON s.cell = ba.cell
            WHERE CAST(floor(list_cosine_similarity(ba.emb, s.emb) * 10000)
                       AS BIGINT) >= 8000
            GROUP BY ba.vec_id
        )
        SELECT ba.vec_id,
               CAST(ba.cell AS INTEGER) AS cluster_id,
               CAST(coalesce(n.n_near, 0) AS BIGINT) AS n_corpus_near,
               n.best_sim AS best_sim,
               CAST(CASE WHEN n.n_near IS NULL THEN 1 ELSE 0 END AS INTEGER)
                   AS kept
        FROM bassign ba LEFT JOIN near n ON n.vid = ba.vec_id
    """,
    "x2e_dup_clusters": f"""
        WITH RECURSIVE ds AS ({_SHINGLES}),
        sigs AS (
            SELECT doc_id, CAST(band AS INTEGER) AS band,
                   min(substr(md5(shingle) || md5(shingle || '#'),
                              8 * band + 1, 8)) AS minhash
            FROM ds CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS band) b
            GROUP BY doc_id, band
        ),
        ok_buckets AS ({_OK_BUCKETS}),
        candidates AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sigs a
            JOIN sigs b ON a.band = b.band AND a.minhash = b.minhash
            JOIN ok_buckets ob ON ob.band = a.band AND ob.minhash = a.minhash
            WHERE a.doc_id < b.doc_id
        ),
        sym AS (
            SELECT id_a AS src, id_b AS dst FROM candidates
            UNION ALL
            SELECT id_b, id_a FROM candidates
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT src, src FROM sym
            UNION
            SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
        )
        SELECT src AS doc_id, min(dst) AS cluster_id
        FROM reach
        GROUP BY src
    """,
    "x25_cluster_representatives": f"""
        WITH RECURSIVE ds AS ({_SHINGLES}),
        sigs AS (
            SELECT doc_id, CAST(band AS INTEGER) AS band,
                   min(substr(md5(shingle) || md5(shingle || '#'),
                              8 * band + 1, 8)) AS minhash
            FROM ds CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS band) b
            GROUP BY doc_id, band
        ),
        ok_buckets AS ({_OK_BUCKETS}),
        candidates AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sigs a
            JOIN sigs b ON a.band = b.band AND a.minhash = b.minhash
            JOIN ok_buckets ob ON ob.band = a.band AND ob.minhash = a.minhash
            WHERE a.doc_id < b.doc_id
        ),
        sym AS (
            SELECT id_a AS src, id_b AS dst FROM candidates
            UNION ALL
            SELECT id_b, id_a FROM candidates
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT src, src FROM sym
            UNION
            SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
        ),
        cl AS (
            SELECT src AS doc_id, min(dst) AS cluster_id
            FROM reach GROUP BY src
        ),
        allc AS (
            SELECT d.doc_id, d.n_chars,
                   coalesce(cl.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN cl USING (doc_id)
        ),
        ranked AS (
            SELECT cluster_id, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY cluster_id
                       ORDER BY n_chars DESC, doc_id) AS rn
            FROM allc
        )
        SELECT cluster_id,
               CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
                   AS kept_doc_id,
               CAST(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
                   AS kept_chars,
               CAST(count(*) AS BIGINT) AS n_members
        FROM ranked
        GROUP BY cluster_id
    """,
    "x3c_label_centroids": """
        WITH t AS (
            SELECT label,
                   unnest(list_transform(
                       generate_series(1, len(embedding)),
                       i -> {'pos': i, 'val': embedding[i]})) AS u
            FROM embeddings
        )
        SELECT label, CAST(u.pos AS INTEGER) AS pos,
               CAST(sum(CAST(floor(CAST(u.val AS DOUBLE) * 1000000.0) AS BIGINT))
                    AS DOUBLE) / (count(*) * 1000000) AS centroid_component
        FROM t
        GROUP BY label, u.pos
    """,
    "x4_token_stats": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'))
                    AS INTEGER) AS n_bpe_tokens,
               CAST(length(replace(text, ' ', '')) AS DOUBLE) /
                     len(string_split(text, ' ')) AS avg_token_len
        FROM documents
    """,
    "x4b_language_dist": """
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS DOUBLE) / count(n_chars) AS avg_chars,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents
        GROUP BY lang
    """,
    "x4c_quality_score": """
        WITH t AS (
            SELECT doc_id,
                   string_split(text, ' ') AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               CAST(len(list_filter(toks, w -> w IN ('the', 'a'))) AS DOUBLE)
                     / len(toks) AS stopword_ratio,
               (len(toks) >= 20 AND len(toks) <= 1000 AND
                CAST(len(list_filter(toks, w -> w IN ('the', 'a'))) AS DOUBLE)
                    / len(toks) <= 0.5) AS is_quality
        FROM t
    """,
    "x4d_language_id": """
        SELECT doc_id,
               CASE
                 WHEN len(list_filter(string_split(text, ' '),
                                      w -> w IN ('the', 'a'))) > 0 THEN 'en'
                 WHEN CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS DOUBLE)
                      / nullif(length(regexp_replace(lower(text), '[^a-z]', '', 'g')), 0)
                      > 0.45 THEN 'vowel-heavy'
                 ELSE 'other'
               END AS predicted_lang
        FROM documents
    """,
    "x6_train_test_split": """
        SELECT doc_id,
               CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cd'
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
    """,
    "x7_decontamination": f"""
        WITH ds AS ({_SHINGLES}),
        split AS (
            SELECT doc_id,
                   CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cd'
                        THEN 'train' ELSE 'test' END AS split
            FROM documents
        ),
        tagged AS (SELECT ds.doc_id, ds.shingle, split.split
                   FROM ds JOIN split USING (doc_id))
        SELECT t.doc_id AS test_doc,
               tr.doc_id AS train_doc,
               count(*) AS n_shared_shingles
        FROM tagged t
        JOIN tagged tr ON t.shingle = tr.shingle
        WHERE t.split = 'test' AND tr.split = 'train'
        GROUP BY t.doc_id, tr.doc_id
        HAVING count(*) >= 3
    """,
    "x4f_gopher_quality": """
        WITH t AS (
            SELECT doc_id,
                   string_split(text, ' ') AS toks,
                   length(replace(text, ' ', '')) AS chars
            FROM documents
        ),
        s AS (
            SELECT doc_id,
                   CAST(chars AS DOUBLE) / len(toks) AS mean_word_len,
                   CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
                        AS DOUBLE) / len(toks) AS alpha_word_ratio,
                   CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                       AS distinct_token_ratio,
                   CAST(list_max(list_transform(list_distinct(toks),
                            t2 -> len(list_filter(toks, w -> w = t2))))
                        AS DOUBLE) / len(toks) AS top_token_ratio
            FROM t
        )
        SELECT doc_id, mean_word_len, alpha_word_ratio,
               distinct_token_ratio, top_token_ratio,
               (mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND alpha_word_ratio >= 0.8
                AND distinct_token_ratio >= 0.2
                AND top_token_ratio <= 0.2) AS gopher_pass
        FROM s
    """,
    "x19_unigram_prob_score": """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        vocab AS (
            SELECT term, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY term
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM toks)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)
                   / CAST(count(*) * total AS DOUBLE) AS mean_unigram_p
        FROM toks JOIN vocab USING (term) CROSS JOIN n
        GROUP BY doc_id, total
    """,
    "x18_source_quality_filter": """
        WITH q AS (
            SELECT doc_id, source,
                   CAST(floor(CAST(len(list_distinct(string_split(text, ' ')))
                                   AS DOUBLE)
                              / len(string_split(text, ' ')) * 1000000.0)
                        AS BIGINT) AS qi
            FROM documents
        ),
        per_source AS (
            SELECT source,
                   CAST(sum(qi) AS DOUBLE) / (count(*) * 1000000)
                       AS source_quality
            FROM q GROUP BY source
        ),
        g AS (
            SELECT CAST(sum(qi) AS DOUBLE) / (count(*) * 1000000) AS gm
            FROM q
        )
        SELECT q.doc_id, q.source, s.source_quality
        FROM q
        JOIN per_source s ON q.source = s.source
        CROSS JOIN g
        WHERE s.source_quality >= g.gm
    """,
    "x17_document_chunking": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents
        ),
        c AS (
            SELECT doc_id, toks,
                   unnest(generate_series(0,
                       (greatest(len(toks) - 50, 0) + 39) // 40)) AS chunk_id
            FROM t
        )
        SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
               array_to_string(toks[chunk_id*40 + 1 : chunk_id*40 + 50], ' ')
                   AS chunk_text,
               CAST(len(toks[chunk_id*40 + 1 : chunk_id*40 + 50]) AS INTEGER)
                   AS n_chunk_tokens
        FROM c
    """,
    "x16_curation_pipeline": """
        WITH t AS (
            SELECT doc_id, lang, text, string_split(text, ' ') AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id, lang, text, toks,
                   list_transform(
                       list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                       p -> p[1] || ' ' || p[2]) AS bg,
                   list_transform(
                       list_zip(toks[1:len(toks)-2], toks[2:len(toks)-1],
                                toks[3:len(toks)]),
                       p -> p[1] || ' ' || p[2] || ' ' || p[3]) AS tg
            FROM t
        ),
        kept AS (
            SELECT doc_id, lang, text
            FROM g
            WHERE coalesce(CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE)
                           / nullif(len(bg), 0), 0.0) <= 0.2
              AND coalesce(CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)
                           / nullif(len(tg), 0), 0.0) <= 0.18
              AND coalesce(CAST(list_max(list_transform(list_distinct(bg),
                               g2 -> len(list_filter(bg, x -> x = g2))))
                           AS DOUBLE) / nullif(len(bg), 0), 0.0) <= 0.1
              AND len(toks) BETWEEN 20 AND 1000
              AND CAST(len(list_filter(toks, w -> w IN ('the', 'a')))
                       AS DOUBLE) / len(toks) <= 0.5
        ),
        deduped AS (
            SELECT doc_id, lang
            FROM (
                SELECT doc_id, lang,
                       row_number() OVER (
                           PARTITION BY md5(lower(text))
                           ORDER BY doc_id) AS rn
                FROM kept
            )
            WHERE rn = 1
        )
        SELECT doc_id, lang,
               CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cd'
                    THEN 'train' ELSE 'test' END AS split
        FROM deduped
    """,
    "x15_quality_percentile_filter": """
        WITH sig AS (
            SELECT doc_id, lang,
                   CAST(len(list_distinct(string_split(text, ' ')))
                        AS DOUBLE)
                       / len(string_split(text, ' ')) AS quality
            FROM documents
        )
        SELECT doc_id, lang, quality, pctile
        FROM (
            SELECT doc_id, lang, quality,
                   cume_dist() OVER (
                       PARTITION BY lang ORDER BY quality) AS pctile
            FROM sig
        )
        WHERE pctile > 0.2
    """,
    "x4g_repetition_signals": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id,
                   list_transform(
                       list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                       p -> p[1] || ' ' || p[2]) AS bg,
                   list_transform(
                       list_zip(toks[1:len(toks)-2], toks[2:len(toks)-1],
                                toks[3:len(toks)]),
                       p -> p[1] || ' ' || p[2] || ' ' || p[3]) AS tg
            FROM t
        ),
        s AS (
            SELECT doc_id,
                   CAST(len(bg) AS INTEGER) AS n_bigrams,
                   coalesce(CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE)
                            / nullif(len(bg), 0), 0.0) AS dup_bigram_ratio,
                   coalesce(CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)
                            / nullif(len(tg), 0), 0.0) AS dup_trigram_ratio,
                   coalesce(CAST(list_max(list_transform(list_distinct(bg),
                                g -> len(list_filter(bg, x -> x = g))))
                            AS DOUBLE) / nullif(len(bg), 0), 0.0)
                       AS top_bigram_ratio
            FROM g
        )
        SELECT doc_id, n_bigrams, dup_bigram_ratio, dup_trigram_ratio,
               top_bigram_ratio,
               (dup_bigram_ratio <= 0.2 AND dup_trigram_ratio <= 0.18
                AND top_bigram_ratio <= 0.1) AS rep_pass
        FROM s
    """,
    "x8_vocab_topk": """
        SELECT token, count(*) AS n_occurrences
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY n_occurrences DESC, token
        LIMIT 100
    """,
    "x9_tfidf_keywords": """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM toks GROUP BY doc_id, term
        ),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        nd AS (SELECT count(*) AS n FROM documents),
        scored AS (
            SELECT doc_id, term,
                   CAST(tf * (n + 1) AS DOUBLE) / (df + 1) AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN nd
        )
        SELECT doc_id, term, CAST(rank AS INTEGER) AS rank, tfidf
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
            FROM scored
        )
        WHERE rank <= 3
    """,
    "x20_boilerplate_detect": f"""
        WITH ds AS ({_SHINGLES}),
        df AS (SELECT shingle, count(*) AS df FROM ds GROUP BY shingle),
        nd AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id,
               count(*) AS n_shingles,
               CAST(sum(CASE WHEN df.df * 100 >= nd.n_docs
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
               CAST(sum(CASE WHEN df.df * 100 >= nd.n_docs
                             THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
                   AS boiler_frac
        FROM ds JOIN df USING (shingle) CROSS JOIN nd
        GROUP BY doc_id
    """,
    "x4e_fingerprint": """
        SELECT doc_id,
               md5(lower(text)) AS fingerprint,
               substr(md5(lower(text)), 1, 8) AS fp_prefix
        FROM documents
    """,
    "x10_sequence_packing": """
        WITH t AS (
            SELECT lang, doc_id,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT lang, doc_id, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM t
        )
        SELECT lang, doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
               CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
               CAST((cum - n_tokens) % 2048 AS BIGINT) AS offset_in_seq
        FROM c
    """,
    "x11_pii_redaction": _x11_pii_sql(),
    "x12_blocked_edit_dedup": _x12_sql(),
    "x13_stratified_sample": _x13_sql(),
    "x14_embedding_normalize": """
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ),
        n AS (
            SELECT vec_id,
                   sqrt(list_inner_product(emb, emb)) AS norm,
                   emb[1:16] AS head
            FROM v
        )
        SELECT vec_id,
               CAST(floor(norm * 10000.0) AS BIGINT) AS norm_q,
               md5(array_to_string(
                   list_transform(head,
                       x -> CAST(floor(x / sqrt(list_inner_product(head, head))
                                       * 10000.0) AS BIGINT)),
                   ',')) AS unit16_digest
        FROM n
    """,
    "x5b_binary_roundtrip": """
        SELECT doc_id AS media_id,
               'image' AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
               md5(text) AS payload_md5
        FROM documents
    """,
    # replays sample_frames' fake byte-slicing: payload[i*L//n:(i+1)*L//n]
    # == substr with the same integer-division bounds (ASCII payloads:
    # byte slicing == char slicing); cadence i*40 ms mirrors
    # FRAME_INTERVAL_MS
    "x5c_frame_sample": """
        WITH f AS (
            SELECT doc_id AS media_id,
                   unnest(generate_series(0, 3)) AS i,
                   text,
                   length(text) AS L
            FROM documents
        )
        SELECT media_id,
               CAST(i AS INTEGER) AS frame_idx,
               CAST(i * 40 AS BIGINT) AS frame_ts_ms,
               md5(substr(text, (i * L) // 4 + 1,
                          ((i + 1) * L) // 4 - (i * L) // 4)) AS frame_md5,
               CAST(((i + 1) * L) // 4 - (i * L) // 4 AS BIGINT) AS frame_len
        FROM f
    """,
    # replays resize_media's fake tile-or-truncate to 16x8 = 128 bytes:
    # (payload * reps)[:128] == substr(repeat(text, reps), 1, 128).
    # The CASE replays the fake resizer's empty-payload branch (128
    # zero bytes) — without it DuckDB divides by zero on an empty doc
    # where Spark is total (ADVICE r6); current testdata has no empty
    # docs, but the oracle must stay total anyway.
    "x5d_resize_digest": """
        SELECT doc_id AS media_id,
               CAST(16 AS INTEGER) AS width,
               CAST(8 AS INTEGER) AS height,
               CAST(128 AS BIGINT) AS size_bytes,
               md5(CASE WHEN length(text) = 0 THEN repeat(chr(0), 128)
                        ELSE substr(repeat(text, 128 // length(text) + 1),
                                    1, 128) END)
                   AS payload_md5
        FROM documents
    """,
    # replays audio_features' fake path from the text: one byte = one
    # PCM sample (b-128)*256 (ASCII corpus: byte == ascii() code
    # point); all stats exact integers, duration is integer division
    "x5f_audio_digest": f"""
        WITH s AS (
            SELECT doc_id AS media_id,
                   list_transform(
                       generate_series(1, length(text)),
                       i -> abs((ascii(text[i]) - 128) * 256)) AS amps,
                   length(text) AS n
            FROM documents
        )
        SELECT media_id,
               CAST({AUDIO_SAMPLE_RATE} AS INTEGER) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(n * 1000 // {AUDIO_SAMPLE_RATE} AS BIGINT) AS duration_ms,
               CAST(coalesce(list_max(amps), 0) AS INTEGER) AS peak,
               CAST(coalesce(list_sum(amps), 0) AS BIGINT) AS sum_abs
        FROM s
    """,
    # replays video_features' fake path from the text: per-byte
    # amplitude |ascii - 128| plus the encoder's deterministic
    # DIB-strip padding arithmetic (_avi_frame_bytes: per-frame size
    # fs covers a 1/N_VIDEO_FRAMES share of the payload, min 4,
    # rounded up to the 4-byte DIB stride; pad bytes are 0 → amplitude
    # 128).  All stats exact integers — constants spliced from the
    # operator module so the two sides can only move in lockstep.
    "x5g_video_digest": f"""
        WITH s AS (
            SELECT doc_id AS media_id,
                   list_transform(
                       generate_series(1, length(text)),
                       i -> abs(ascii(text[i]) - 128)) AS amps,
                   length(text) AS L
            FROM documents
        ),
        g AS (
            SELECT media_id, amps, L,
                   ((greatest((L + {N_VIDEO_FRAMES - 1}) // {N_VIDEO_FRAMES},
                              4) + 3) // 4) * 4 AS fs
            FROM s
        )
        SELECT media_id,
               CAST(fs AS INTEGER) AS width,
               CAST(1 AS INTEGER) AS height,
               CAST({VIDEO_FPS} AS INTEGER) AS fps,
               CAST({N_VIDEO_FRAMES} AS INTEGER) AS n_frames,
               CAST({N_VIDEO_FRAMES * 1000 // VIDEO_FPS} AS BIGINT) AS duration_ms,
               CAST({N_VIDEO_FRAMES} * fs AS BIGINT) AS sum_bytes,
               CAST(CASE WHEN {N_VIDEO_FRAMES} * fs > L
                              AND coalesce(list_max(amps), 0) < 128
                         THEN 128
                         ELSE coalesce(list_max(amps), 0)
                    END AS INTEGER) AS peak,
               CAST(coalesce(list_sum(amps), 0)
                    + ({N_VIDEO_FRAMES} * fs - L) * 128 AS BIGINT) AS sum_abs
        FROM g
    """,
    "x29_source_overlap_matrix": """
        WITH sh AS (
            SELECT DISTINCT source,
                   unnest(list_transform(
                       generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1] || ' ' ||
                            string_split(text, ' ')[i+2])) AS shingle
            FROM documents
        ),
        p AS (
            SELECT a.shingle, a.source AS src_a, b.source AS src_b
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.source < b.source
        )
        SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_shared_shingles
        FROM p GROUP BY src_a, src_b
    """,
}

# Splice the shared ANN top-k into the plain-string oracle bodies (an
# f-string would force double-escaping the struct-literal braces in
# x3e); the Spark side and _x3d_lsh_ann_oracle take the same constant
# as a parameter default, so the k can only move in lockstep.
for _name in ("x3_cosine_topk", "x3e_ivf_topk"):
    ORACLES_EXT[_name] = ORACLES_EXT[_name].replace(
        "__ANN_TOPK__", str(ANN_TOPK)
    )

for _name in ("x3g_kmeans_clusters", "x45_semdedup_keep"):
    ORACLES_EXT[_name] = ORACLES_EXT[_name].replace(
        "__KMEANS_CTES__", _KMEANS_CTES)

# x54 clusters ONLY the corpus side of the split (train = existing
# corpus); the batch side never enters the Lloyd loop
ORACLES_EXT["x54_incremental_semdedup"] = ORACLES_EXT[
    "x54_incremental_semdedup"
].replace(
    "__KMEANS_CORPUS_CTES__",
    _kmeans_ctes(
        "\n            WHERE md5(CAST(vec_id AS VARCHAR)) < 'cd'"
    ),
)

for _name in ("x50_pq_topk", "x51_ivfpq_topk", "x52_pq_recall", "x55_ivfpq_recall"):
    ORACLES_EXT[_name] = ORACLES_EXT[_name].replace(
        "__PQ_CTES__", _PQ_CTES)

# x57/x58 share only the quantizer prefix of the PQ chain
for _name in ("x57_reduced_recall", "x58_sq8_recall"):
    ORACLES_EXT[_name] = ORACLES_EXT[_name].replace("__QZ_CTES__", _QZ_CTES)

# x50b queries the STORED PQ index; its output is byte-identical to
# x50's in-query form by construction (same quantizer max, codebook
# and codes, round-tripped exactly through parquet doubles), so the
# oracle is x50's text verbatim — any drift between the stored and
# in-query paths fails the hash check immediately.
ORACLES_EXT["x50b_pq_topk_stored"] = ORACLES_EXT["x50_pq_topk"]
ORACLES_EXT["x51b_ivfpq_topk_stored"] = ORACLES_EXT["x51_ivfpq_topk"]
# same argument for the stored LSH signature index: the union of the
# stored corpus signatures/sets with the freshly-signed batch is
# row-identical to x53's single-statement computation (signatures and
# hash sets are per-doc; bucket caps count both sides either way)
ORACLES_EXT["x53b_incremental_neardup_stored"] = ORACLES_EXT[
    "x53_incremental_neardup"
]
# retraction, oracle-checked end-to-end (r12): deleting the re-crawl
# slice from the stored index is ROW-IDENTICAL to a full rebuild on
# the retained corpus (each doc's signature/set rows derive only from
# that doc — pinned by the lifecycle pytest), so x53c's oracle is
# x53's text with the single documents scan narrowed to the retained
# docs: shingles, signatures, hash sets AND bucket-cap widths all see
# the post-delete corpus + batch exactly as the stored index does.  A
# ghost row a broken delete left behind fails the hash immediately.
assert ORACLES_EXT["x53_incremental_neardup"].count("FROM documents") == 1
ORACLES_EXT["x53c_incremental_neardup_retracted"] = ORACLES_EXT[
    "x53_incremental_neardup"
].replace(
    "FROM documents",
    "FROM (SELECT * FROM documents WHERE "
    f"md5(CAST(doc_id AS VARCHAR)) >= '{RETRACT_SPLIT_HEX}') documents",
)
# and for the stored SemDeDup corpus index: survivors + codebook
# round-trip parquet bit-exactly (doubles are IEEE-preserved), so the
# stored probe is byte-identical to x54's in-query computation
ORACLES_EXT["x54b_incremental_semdedup_stored"] = ORACLES_EXT[
    "x54_incremental_semdedup"
]
