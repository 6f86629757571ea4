"""Multimodal column plumbing (SURVEY.md X5).

Images / audio / video ride through the engine as opaque ``binary``
columns plus typed metadata; per-item decode and feature extraction
run as Arrow-batched ``mapInPandas`` stages so the Python boundary is
crossed once per batch, not per row.

The actual media decode is STUBBED — codec libraries are not in this
container — behind :func:`decode_media`, which raises
``NotImplementedError`` unless ``fake=True`` selects the deterministic
fake decoder.  Everything around the stub (schema, batching, partition
behavior, output contract) is real and tested.

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
    """Decode one media payload to a fixed-width feature vector.

    Real decoding (PIL / torchaudio / pyav) is unavailable in this
    environment — STUB.  ``fake=True`` yields a deterministic
    16-dim byte-histogram feature so the surrounding pipeline is
    fully exercisable."""
    if not fake:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )
    hist = [0] * 16
    for byte in payload:
        hist[byte % 16] += 1
    total = float(len(payload)) or 1.0
    return [h / total for h in hist]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` receives whole Arrow batches; the decode loop is
    per-row *inside* the batch (unavoidable for codecs) but the
    Spark↔Python transfer is vectorized."""

    # the decode step is re-declared inside the closure so cloudpickle
    # ships it BY VALUE — workers must not need this module importable
    # (the embedding harness runs the driver from an arbitrary cwd)
    def _decode(payload: bytes, media_type: str) -> list[float]:
        if not fake:
            raise NotImplementedError(
                "media decode requires codec libraries not present in this "
                "environment; pass fake=True for the deterministic test decoder"
            )
        hist = [0] * 16
        for byte in payload:
            hist[byte % 16] += 1
        total = float(len(payload)) or 1.0
        return [h / total for h in hist]

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
