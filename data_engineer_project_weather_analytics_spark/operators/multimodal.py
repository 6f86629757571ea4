"""Multimodal column plumbing (SURVEY.md X5).

Images / audio / video ride through the engine as opaque ``binary``
columns plus typed metadata; per-item decode and feature extraction
run as Arrow-batched ``mapInPandas`` stages so the Python boundary is
crossed once per batch, not per row.

The decode step has two paths behind one contract (a 16-dim float
feature):

* ``fake=True`` — deterministic byte-histogram decoder, always
  available; what every test in this container exercises;
* ``fake=False`` — REAL image decode via PIL when it is importable
  (16-bin luminance histogram over the decoded pixels — same schema,
  same row shape), else ``NotImplementedError`` naming the missing
  codec.  The contract test
  (tests/test_operators.py::test_multimodal_real_codec_contract) is
  skip-marked when PIL is absent, so environments WITH codecs get the
  real path verified automatically.

Everything around the decode (schema, batching, partition behavior,
output contract) is identical on both paths and tested here.

At 100 TB: binary payloads dominate I/O, so (a) store them in their
own parquet column chunk — column pruning means metadata-only queries
never touch the bytes; (b) ``repartition`` by a size-balanced key
before the decode stage so Arrow batches are even; (c) feature
extraction emits fixed-width arrays, keeping downstream shuffles
compact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: A multimodal asset row: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("size_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("size_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> list[float]:
    """Decode one media payload to a fixed-width (16-dim) feature.

    ``fake=True``: deterministic byte-histogram — always available.
    ``fake=False``: real decode — images via PIL when importable
    (16-bin luminance histogram of the decoded pixels, normalized to
    sum 1 like the fake path); audio/video codecs are not available in
    any supported environment yet.  Raises ``NotImplementedError``
    naming the missing codec otherwise."""
    if fake:
        hist = [0] * 16
        for byte in payload:
            hist[byte % 16] += 1
        total = float(len(payload)) or 1.0
        return [h / total for h in hist]
    if media_type == "image":
        try:
            import io

            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "image decode requires PIL, which is not installed; pass "
                "fake=True for the deterministic test decoder"
            ) from exc
        img = Image.open(io.BytesIO(payload)).convert("L")
        hist256 = img.histogram()  # 256 luminance bins
        hist = [sum(hist256[16 * i : 16 * (i + 1)]) for i in range(16)]
        total = float(sum(hist)) or 1.0
        return [h / total for h in hist]
    raise NotImplementedError(
        f"no codec for media_type={media_type!r} (audio/video decode "
        "requires libraries not present in any supported environment); "
        "pass fake=True for the deterministic test decoder"
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` receives whole Arrow batches; the decode loop is
    per-row *inside* the batch (unavoidable for codecs) but the
    Spark↔Python transfer is vectorized."""

    # the decode step is re-declared inside the closure so cloudpickle
    # ships it BY VALUE — workers must not need this module importable
    # (the embedding harness runs the driver from an arbitrary cwd);
    # keep this in lockstep with decode_media above
    def _decode(payload: bytes, media_type: str) -> list[float]:
        if fake:
            hist = [0] * 16
            for byte in payload:
                hist[byte % 16] += 1
            total = float(len(payload)) or 1.0
            return [h / total for h in hist]
        if media_type == "image":
            try:
                import io

                from PIL import Image
            except ImportError as exc:
                raise NotImplementedError(
                    "image decode requires PIL, which is not installed; "
                    "pass fake=True for the deterministic test decoder"
                ) from exc
            img = Image.open(io.BytesIO(payload)).convert("L")
            hist256 = img.histogram()
            hist = [sum(hist256[16 * i : 16 * (i + 1)]) for i in range(16)]
            total = float(sum(hist)) or 1.0
            return [h / total for h in hist]
        raise NotImplementedError(
            f"no codec for media_type={media_type!r}; pass fake=True "
            "for the deterministic test decoder"
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = [
                _decode(p if p is not None else b"", t)
                for p, t in zip(batch["payload"], batch["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "media_type": batch["media_type"],
                    "size_bytes": batch["size_bytes"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as binary payloads so
    the multimodal path has real data to flow over in this container."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("size_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
