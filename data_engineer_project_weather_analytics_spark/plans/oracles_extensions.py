"""DuckDB oracle SQL for the extension query set (plans/extensions.py).

Shingle generation uses ``list_transform(generate_series(...))`` —
DuckDB's lateral-free equivalent of Spark's ``transform(sequence(...))``
— and MinHash/SimHash share the engine-portable md5 construction with
the Spark side, so the sketches are bit-identical.
"""

from __future__ import annotations

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

_SIGNATURES = f"""
        WITH ds AS ({_SHINGLES}),
        bands AS (SELECT unnest(generate_series(0, 7)) AS band)
        SELECT doc_id, CAST(band AS INTEGER) AS band,
               min(substr(md5(shingle) || md5(shingle || '#'),
                          8 * band + 1, 8)) AS minhash
        FROM ds CROSS JOIN bands
        GROUP BY doc_id, band
"""

ORACLES_EXT: dict[str, str] = {
    "x1_exact_dedup": """
        SELECT md5(text) AS text_hash,
               min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    "x2_minhash_signatures": _SIGNATURES,
    "x2b_lsh_candidate_pairs": f"""
        WITH sigs AS ({_SIGNATURES})
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sigs a JOIN sigs b
          ON a.band = b.band AND a.minhash = b.minhash
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
        candidates AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sigs a JOIN sigs b
              ON a.band = b.band AND a.minhash = b.minhash
            WHERE a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS set_size FROM ds GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM ds a JOIN ds b ON a.shingle = b.shingle
            WHERE a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        verified AS (
            SELECT id_a, id_b,
                   CAST(n_inter AS DOUBLE) /
                       (sa.set_size + sb.set_size - n_inter) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) /
                      (sa.set_size + sb.set_size - n_inter) >= 0.1
        )
        SELECT c.id_a, c.id_b, v.jaccard
        FROM candidates c JOIN verified v USING (id_a, id_b)
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
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
               round(cos, 4) AS sim
        FROM scored
        QUALIFY rank <= 5
    """,
    "x3b_embedding_neardup": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])), 4) AS sim
        FROM embeddings a
        JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 500 AND b.vec_id < 500
          AND round(list_cosine_similarity(
                  CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])), 4) >= 0.8
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
               round(avg(CAST(u.val AS DOUBLE)), 6) AS centroid_component
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
    "x4e_fingerprint": """
        SELECT doc_id,
               md5(lower(text)) AS fingerprint,
               substr(md5(lower(text)), 1, 8) AS fp_prefix
        FROM documents
    """,
    "x5b_binary_roundtrip": """
        SELECT doc_id AS media_id,
               'image' AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
               md5(text) AS payload_md5
        FROM documents
    """,
}
