"""Text-analysis operators for training-data pipelines (SURVEY.md X4).

All operators are pure Catalyst expressions (split / filter / md5 /
higher-order functions) — no Python UDFs — so they run inside
whole-stage codegen and scale linearly with partitions.  Tokenization
is single-space splitting to match the corpus format; swap the pattern
for ``\\s+`` on real text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny default stopword list present in the synthetic corpus vocabulary.
STOPWORDS: tuple[str, ...] = ("the", "a")


def tokens(text_col: str | Column) -> Column:
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(col, " ")


def token_count(text_col: str | Column) -> Column:
    return F.size(tokens(text_col))


#: BPE-ish pre-tokenization: word pieces OR single non-space symbols —
#: the GPT-2-style regex split, ASCII classes so Java regex ≡ RE2.
BPE_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def bpe_token_count(text_col: str | Column) -> Column:
    """Token count under the BPE-ish regex (upper bound on merged-BPE
    length; the standard cheap proxy for LLM token budgeting)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0)))


def avg_token_length(text_col: str | Column) -> Column:
    """Mean characters per token = non-space chars / token count."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    chars = F.length(F.regexp_replace(col, " ", ""))
    return chars.cast("double") / token_count(col)


def stopword_ratio(text_col: str | Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(text_col)
    hits = F.size(F.filter(toks, lambda w: w.isin(*stopwords)))
    return hits.cast("double") / F.size(toks)


def quality_flag(
    text_col: str | Column,
    min_tokens: int = 20,
    max_tokens: int = 1000,
    max_stopword_ratio: float = 0.5,
) -> Column:
    """Heuristic document-quality gate (length band + stopword cap) —
    the standard pre-training corpus filter shape."""
    n = token_count(text_col)
    return (
        (n >= min_tokens)
        & (n <= max_tokens)
        & (stopword_ratio(text_col) <= max_stopword_ratio)
    )


def language_id(text_col: str | Column) -> Column:
    """N-gram-free heuristic language ID.

    Real language ID is a char-n-gram profile model; on this synthetic
    corpus (uniform English-ish vocabulary) we use a deterministic
    heuristic with the same *shape* — token-level evidence then a
    vowel-ratio fallback — kept fully SQL-expressible so the DuckDB
    oracle can replay it."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens(col)
    has_en_stop = F.size(F.filter(toks, lambda w: w.isin("the", "a"))) > 0
    vowels = F.length(F.regexp_replace(F.lower(col), "[^aeiou]", ""))
    letters = F.length(F.regexp_replace(F.lower(col), "[^a-z]", ""))
    vowel_ratio = vowels.cast("double") / F.nullif(letters.cast("double"), F.lit(0.0))
    return (
        F.when(has_en_stop, F.lit("en"))
        .when(vowel_ratio > 0.45, F.lit("vowel-heavy"))
        .otherwise(F.lit("other"))
    )


def deterministic_split(
    id_col: str | Column, train_fraction_hex: str = "cd"
) -> Column:
    """Reproducible train/test split by content-independent id hash.

    A row is 'train' iff the md5 of its id string is lexicographically
    below the hex prefix threshold (``'cd'`` ≈ 205/256 ≈ 80.1 %).
    Deterministic across runs, engines, and partitionings — the
    property random() splits lack — and oracle-replayable since md5 +
    string compare exist everywhere."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.when(
        F.md5(col.cast("string")) < F.lit(train_fraction_hex), F.lit("train")
    ).otherwise(F.lit("test"))


def fingerprint(text_col: str | Column) -> Column:
    """Whole-document fingerprint: md5 of the case-folded text.

    (Rolling/Rabin fingerprints shard better for *partial* matching;
    for whole-doc identity a single strong hash is the right tool and
    is exactly reproducible everywhere.)"""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.lower(col))


#: PII patterns, applied in this order.  ASCII-class-only regexes so
#: Java (Spark) and RE2 (DuckDB) agree; DuckDB needs the 'g' flag to
#: match Spark's replace-all default.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("phone", r"\+[0-9]{7,15}", "<PHONE>"),
)


def redact_pii(text_col: str | Column) -> Column:
    """Scrub emails / SSN-shaped ids / IPv4s / international phone
    numbers — the standard pre-training privacy pass, as chained
    ``regexp_replace`` (order matters: IP before phone would eat
    dotted quads; patterns are applied in ``PII_PATTERNS`` order in
    BOTH engines).  Pure codegen — no Python in the hot path."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for _, pattern, token in PII_PATTERNS:
        col = F.regexp_replace(col, pattern, token)
    return col


def pii_counts(text_col: str | Column) -> list[Column]:
    """Per-category PII hit counts (for filtering / audit)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return [
        F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, pattern, _ in PII_PATTERNS
    ]


def max_sorted_run(arr: Column) -> Column:
    """Most frequent element's occurrence count = longest equal-run
    after ``array_sort`` — O(len·log len) per row, zero shuffles, and
    bounded on pathological rows (the naive distinct×filter scan is
    O(distinct × len)).  The fold carries (prev element, current run,
    best run) through the row."""
    run = lambda acc, x: F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(  # noqa: E731
        F.lit(1)
    )
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def gopher_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style corpus-quality signals, per document — the
    repetition and well-formedness heuristics of the Gopher/MassiveText
    filtering rules, re-expressed as pure Catalyst expressions (no
    Python, no shuffle: every signal is a higher-order function over
    the token array of the row).

    Signals:

    * ``mean_word_len`` — non-space chars / tokens (Gopher keeps 3-10);
    * ``alpha_word_ratio`` — fraction of tokens containing a letter
      (Gopher requires ≥ 0.8 with alphabetic chars);
    * ``distinct_token_ratio`` — |distinct tokens| / |tokens| (low ⇒
      repetitious boilerplate);
    * ``top_token_ratio`` — most frequent token's share of the doc
      (the single-term domination test);
    * ``gopher_pass`` — the conjunction, with the standard-ish bands.

    All ratios are int/int divisions of exact counts — bit-identical
    in any engine.  ``top_token_ratio`` is computed *inside the row*
    as the longest run in the SORTED token array — O(len·log len) per
    row and zero shuffles, so quality scoring stays embarrassingly
    parallel AND bounded on pathological documents (the naive
    distinct×filter scan is O(distinct × len): quadratic on a 100
    k-token doc of mostly-unique tokens)."""
    toks = tokens(text_col)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    chars = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    top = max_sorted_run(toks)
    mean_word_len = chars.cast("double") / n
    alpha_ratio = alpha.cast("double") / n
    distinct_ratio = n_distinct.cast("double") / n
    top_ratio = top.cast("double") / n
    return df.select(
        F.col(id_col),
        mean_word_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_word_ratio"),
        distinct_ratio.alias("distinct_token_ratio"),
        top_ratio.alias("top_token_ratio"),
        (
            (mean_word_len >= 3.0)
            & (mean_word_len <= 10.0)
            & (alpha_ratio >= 0.8)
            & (distinct_ratio >= 0.2)
            & (top_ratio <= 0.2)
        ).alias("gopher_pass"),
    )


def repetition_signals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dup_bigram_ratio: float = 0.2,
    max_dup_trigram_ratio: float = 0.18,
    max_top_bigram_ratio: float = 0.1,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher/MassiveText repetition filters, per document: the
    duplicate-n-gram fractions that catch boilerplate and looped text
    which single-token signals (``gopher_signals``) miss.

    Signals (all int/int divisions of exact counts — bit-identical in
    any engine; empty-gram docs coalesce to 0.0):

    * ``dup_bigram_ratio``  — 1 - |distinct 2-grams| / |2-grams|;
    * ``dup_trigram_ratio`` — 1 - |distinct 3-grams| / |3-grams|;
    * ``top_bigram_ratio``  — most frequent 2-gram's share;
    * ``rep_pass``          — the conjunction under the thresholds.

    Plan shape: tokenize ONCE, n-gram arrays built once behind
    projection boundaries (``zip_with`` over token-array slices — no
    re-``split`` inside per-gram lambdas), every signal a higher-order
    function over the row.  No shuffle anywhere: repetition scoring
    stays embarrassingly parallel at corpus scale.

    ``keep`` columns pass through untouched (lets pipeline consumers
    like the corpus-curation query stay single-scan)."""
    kept = [F.col(c) for c in keep]
    toks = F.col("__toks")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    staged = df.select(
        F.col(id_col), *kept, tokens(text_col).alias("__toks")
    ).select(
        F.col(id_col), *kept, F.col("__toks"), bigrams.alias("__bg")
    )
    bg = F.col("__bg")
    m = F.size(bg)
    tri_len = F.greatest(m - 1, F.lit(0))  # single-token doc: m = 0
    trigrams = F.zip_with(
        F.slice(bg, 1, tri_len),
        F.slice(F.col("__toks"), 3, tri_len),
        lambda g, t: F.concat_ws(" ", g, t),
    )
    staged = staged.select(
        F.col(id_col), *kept, F.col("__bg"), trigrams.alias("__tg")
    )
    tg = F.col("__tg")

    def dup_ratio(arr: Column) -> Column:
        sz = F.size(arr)
        return F.coalesce(
            (sz - F.size(F.array_distinct(arr))).cast("double")
            / F.nullif(sz, F.lit(0)).cast("double"),
            F.lit(0.0),
        )

    top_bg = F.coalesce(
        max_sorted_run(bg).cast("double")
        / F.nullif(F.size(bg), F.lit(0)).cast("double"),
        F.lit(0.0),
    )
    dup_bg, dup_tg = dup_ratio(bg), dup_ratio(tg)
    return staged.select(
        F.col(id_col),
        *kept,
        F.size(bg).alias("n_bigrams"),
        dup_bg.alias("dup_bigram_ratio"),
        dup_tg.alias("dup_trigram_ratio"),
        top_bg.alias("top_bigram_ratio"),
        (
            (dup_bg <= max_dup_bigram_ratio)
            & (dup_tg <= max_dup_trigram_ratio)
            & (top_bg <= max_top_bigram_ratio)
        ).alias("rep_pass"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap —
    the pre-tokenization chunking step of a training/RAG pipeline
    (context-window packing consumes these; see sequence packing x10).

    Chunk *i* covers tokens ``[i·stride + 1, i·stride + max_tokens]``
    with ``stride = max_tokens - overlap``; the final chunk clips at
    the document end, and a short document yields exactly one chunk.

    Plan: tokenize once, then ``explode(sequence(...))`` over the
    chunk indices and an O(max_tokens) ``slice`` per chunk — a narrow
    rowwise expansion (output rows ≈ n_tokens/stride per doc), no
    shuffle, no Python.  At 100 TB this runs entirely inside the scan
    stage and parallelizes with the input partitioning."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap
    toks = F.col("__toks")
    n = F.size(toks)
    # number of EXTRA chunks beyond the first: ceil((n - max)/stride),
    # via exact small-int arithmetic (truncating cast = floor here)
    extra_tokens = F.greatest(n - F.lit(max_tokens), F.lit(0))
    n_extra = ((extra_tokens + F.lit(stride - 1)) / F.lit(stride)).cast("int")
    staged = df.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        F.col(id_col),
        F.col("__toks"),
        F.explode(F.sequence(F.lit(0), n_extra)).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, max_tokens
    )
    return staged.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_chunk_tokens"),
    )


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over tokens.

    Classic SimHash: each hash bit of each token votes ±1; the sign of
    the total is the fingerprint bit.  We derive bit *i* of a token's
    hash from hex digit *i* of its md5 (high bit of the nibble), which
    is engine-portable (md5 + substr exist everywhere) while keeping
    real SimHash semantics.  One explode + one groupBy — scales as a
    single shuffle on the doc id."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__w"))
    h = F.md5(F.col("__w"))
    votes = [
        F.sum(
            F.when(F.substring(h, i + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
            .otherwise(-1)
        ).alias(f"__v{i}")
        for i in range(16)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    bits = [F.when(F.col(f"__v{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(16)]
    return agg.select(F.col(id_col), F.concat(*bits).alias("simhash16"))


def hamming_distance(a: str | Column, b: str | Column) -> Column:
    """Hamming distance between two equal-length bit strings (for
    SimHash near-dup thresholds)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    pairs = F.zip_with(F.split(ca, ""), F.split(cb, ""), lambda x, y: (x != y).cast("int"))
    return F.aggregate(pairs, F.lit(0), lambda s, v: s + v)
