"""Stored-index housekeeping shared by the index families.

The append lifecycle (``dedup.lsh_index_append``,
``similarity.semdedup_index_append``) adds a handful of parquet files
per ingestion batch — after thousands of batches a probe lists and
opens thousands of tiny files, the classic small-files problem.
:func:`compact_index` rewrites each index artifact into a few sorted
files, semantics-preserving by construction (same rows, better
layout), so probes keep their plans and lose the per-file open cost.

On a real lake the index would live in a transactional table format
whose compaction is atomic; on a plain filesystem the swap here is two
directory renames with the old artifact kept until the new one is in
place (a crash between the renames leaves the ``.compact_trash``
directory to recover from, never a half-written artifact in the live
path).
"""

from __future__ import annotations

import os
import shutil

#: artifact → sort columns for each index family's layout.  Sorting
#: within the rewritten files gives parquet row-group min/max stats a
#: real pruning surface for the probe-side filters (band/minhash
#: bucket lookups, cell-keyed posting-list scans).
LSH_INDEX_LAYOUT: dict[str, list[str]] = {
    "sigs": ["band", "minhash"],
    "sets": ["doc_id"],
}
SEM_INDEX_LAYOUT: dict[str, list[str]] = {
    "survivors": ["cell", "corpus_id"],
    "cents": ["cell"],
}
PQ_INDEX_LAYOUT: dict[str, list[str]] = {
    "codes": ["vec_id"],
    "codebook": [],
}


def _n_parquet_files(path: str) -> int:
    return sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def compact_index(
    spark,
    index_dir: str,
    layout: dict[str, list[str]],
    target_files: int = 1,
) -> dict[str, tuple[int, int]]:
    """Rewrite every artifact of a stored index into ``target_files``
    sorted parquet files.  Returns ``{artifact: (files_before,
    files_after)}`` so callers (and tests) can assert the compaction
    actually bought something.

    Row-preserving: the rewrite is a plain
    ``repartition → sortWithinPartitions → write`` of the artifact's
    own rows — no dedup, no schema change — so any probe returns
    byte-identical results before and after.  Missing artifacts (an
    index variant without ``centroids``, say) are skipped."""
    stats: dict[str, tuple[int, int]] = {}
    for sub, sort_cols in layout.items():
        path = os.path.join(index_dir, sub)
        if not os.path.isdir(path):
            continue
        before = _n_parquet_files(path)
        df = spark.read.parquet(path)
        staged = os.path.join(index_dir, f".compact_{sub}")
        trash = os.path.join(index_dir, f".compact_trash_{sub}")
        w = df.repartition(target_files)
        if sort_cols:
            w = w.sortWithinPartitions(*sort_cols)
        w.write.mode("overwrite").parquet(staged)
        shutil.rmtree(trash, ignore_errors=True)
        os.replace(path, trash)
        os.replace(staged, path)
        shutil.rmtree(trash)
        stats[sub] = (before, _n_parquet_files(path))
    return stats
