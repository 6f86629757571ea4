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

Audio has its own REAL decode path with no dependency at all: the
stdlib ``wave`` module parses 16-bit mono PCM containers
(:func:`audio_features` with ``fake=False``, synthesizer
:func:`encode_pcm_wav`); video decode remains an honest
``NotImplementedError`` (no codec library ships in any supported
environment).

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


# ---------------------------------------------------------------------------
# Audio path: stdlib-`wave` PCM decode (the first REAL non-image codec)
# ---------------------------------------------------------------------------

#: Audio feature row: integer PCM stats (exact, engine-replayable on
#: the fake path — no float anywhere).
AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("peak", IntegerType(), True),
        StructField("sum_abs", LongType(), True),
    ]
)

#: synthesized-PCM sample rate for the documents-as-audio adapter
AUDIO_SAMPLE_RATE = 8000


def documents_as_audio(documents: DataFrame, sample_rate: int = AUDIO_SAMPLE_RATE) -> DataFrame:
    """Adapter: documents' text bytes as raw audio payloads (one byte →
    one PCM sample under the ``(b - 128) * 256`` mapping both feature
    paths share) — the audio twin of :func:`documents_as_media`."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("size_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(sample_rate).cast("int").alias("sample_rate"),
    )


def encode_pcm_wav(media: DataFrame) -> DataFrame:
    """Wrap each payload's bytes as a valid 16-bit mono PCM WAV
    container (sample ``i`` = ``(byte_i - 128) * 256``, little-endian,
    at the row's ``sample_rate``) — the deterministic synthesizer that
    gives the REAL stdlib-``wave`` decode path (:func:`audio_features`
    with ``fake=False``) a genuine container to parse, with no codec
    dependency.  1 row in → 1 row out, Arrow-batched."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import array
        import io
        import sys
        import wave

        for batch in batches:
            outs = []
            for p, sr in zip(batch["payload"], batch["sample_rate"]):
                data = p if p is not None else b""
                samples = array.array("h", [(b - 128) * 256 for b in data])
                if sys.byteorder == "big":
                    samples.byteswap()  # WAV PCM is little-endian
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(int(sr) if sr is not None else AUDIO_SAMPLE_RATE)
                    w.writeframes(samples.tobytes())
                outs.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "media_type": batch["media_type"],
                    "payload": outs,
                    "size_bytes": [len(o) for o in outs],
                    "width": batch["width"],
                    "height": batch["height"],
                    "sample_rate": batch["sample_rate"],
                }
            )

    return media.mapInPandas(_encode, schema=MEDIA_SCHEMA)


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Integer PCM stats per asset — sample count, duration, peak
    amplitude, total absolute amplitude (all exact int64: no float, so
    the fake path is bit-replayable in SQL, the x5d digest recipe).

    * ``fake=True`` — stats computed directly from the RAW payload
      bytes under the shared ``(b - 128) * 256`` sample mapping; the
      always-available deterministic path (x5f's oracle replays it
      from the text with ``ascii()``).
    * ``fake=False`` — REAL container decode via the stdlib ``wave``
      module (16-bit mono PCM; header parsed, frames read,
      little-endian samples unpacked).  No new dependency — the first
      real non-image codec in the multimodal family; raises
      ``NotImplementedError`` naming the codec for non-audio rows or
      unsupported PCM layouts.  For a payload synthesized by
      :func:`encode_pcm_wav`, the real stats EQUAL the fake stats over
      the pre-encode payload — the contract pytest pins that
      equivalence, value-checking the decoder end-to-end.
    """

    # closures re-declared by value (module convention: workers must
    # not need this module importable)
    def _stats_fake(data: bytes) -> tuple[int, int, int]:
        peak = 0
        total = 0
        for b in data:
            v = abs((b - 128) * 256)
            if v > peak:
                peak = v
            total += v
        return len(data), peak, total

    def _stats_real(payload: bytes, media_type: str) -> tuple[int, int, int, int]:
        if media_type != "audio":
            raise NotImplementedError(
                f"no audio codec for media_type={media_type!r}; pass "
                "fake=True for the deterministic byte-stats path"
            )
        import array
        import io
        import sys
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            if w.getsampwidth() != 2 or w.getnchannels() != 1:
                raise NotImplementedError(
                    "only 16-bit mono PCM WAV is decodable with the "
                    "stdlib wave module; other layouts need codec "
                    "libraries not present in any supported environment"
                )
            rate = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
        samples = array.array("h")
        samples.frombytes(raw)
        if sys.byteorder == "big":
            samples.byteswap()
        peak = 0
        total = 0
        for s in samples:
            v = abs(s)
            if v > peak:
                peak = v
            total += v
        return rate, len(samples), peak, total

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, mtype, p, sr in zip(
                batch["media_id"],
                batch["media_type"],
                batch["payload"],
                batch["sample_rate"],
            ):
                data = p if p is not None else b""
                if fake:
                    rate = int(sr) if sr is not None else 0
                    n, peak, total = _stats_fake(data)
                else:
                    rate, n, peak, total = _stats_real(data, mtype)
                duration_ms = n * 1000 // rate if rate else 0
                rows.append((int(mid), rate, n, duration_ms, peak, total))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples",
                    "duration_ms", "peak", "sum_abs",
                ],
            )

    return media.mapInPandas(_extract, schema=AUDIO_FEATURE_SCHEMA)


#: A sampled frame row: 1 media row → `n_frames` of these.
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)

#: fake frame cadence: 25 fps surrogate, part of the deterministic
#: contract (the x5c oracle replays `frame_idx * 40`).
FRAME_INTERVAL_MS = 40


def resize_media(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize every payload to ``width x height``, preserving
    `MEDIA_SCHEMA` (same charter contract shape as decode: the fake
    path is the always-available deterministic stand-in, the real path
    uses PIL when importable).

    * ``fake=True`` — tile-or-truncate the payload bytes to exactly
      ``width*height`` (empty payload → that many zero bytes): a
      pure-bytes surrogate for pixel resampling, SQL-replayable
      (`repeat`+`substr`), so the pipeline is value-checkable
      cross-engine (x5d) — unlike a real codec.
    * ``fake=False`` — PIL decode → `Image.resize((w, h), NEAREST)`
      (nearest keeps it deterministic) → PNG re-encode; raises
      ``NotImplementedError`` naming the codec for audio/video or
      when PIL is absent.

    Batch shape: 1 row in → 1 row out, Arrow-batched `mapInPandas`;
    width/height metadata are set to the target, ``size_bytes``
    re-derived from the new payload.
    """
    # closures re-declared by value (module convention: workers must
    # not need this module importable)
    target = width * height

    def _resize_fake(payload: bytes) -> bytes:
        if not payload:
            return bytes(target)
        reps = target // len(payload) + 1
        return (payload * reps)[:target]

    def _resize_real(payload: bytes, media_type: str) -> bytes:
        if media_type != "image":
            raise NotImplementedError(
                f"no codec for media_type={media_type!r}; pass fake=True "
                "for the deterministic byte-tiling resizer"
            )
        try:
            import io

            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "image resize requires PIL, which is not installed; pass "
                "fake=True for the deterministic byte-tiling resizer"
            ) from exc
        img = Image.open(io.BytesIO(payload))
        out = io.BytesIO()
        img.resize((width, height), Image.NEAREST).save(out, format="PNG")
        return out.getvalue()

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            resized = [
                _resize_fake(p if p is not None else b"")
                if fake
                else _resize_real(p if p is not None else b"", t)
                for p, t in zip(batch["payload"], batch["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "media_type": batch["media_type"],
                    "payload": resized,
                    "size_bytes": [len(p) for p in resized],
                    "width": width,
                    "height": height,
                    "sample_rate": batch["sample_rate"],
                }
            )

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int = 4, fake: bool = True
) -> DataFrame:
    """Sample ``n_frames`` frames from every payload — the 1→N row
    expansion stage of the video path (`FRAME_SCHEMA` output).

    * ``fake=True`` — frame *i* is the contiguous byte slice
      ``payload[i*L//n : (i+1)*L//n]`` (concatenating all frames
      reconstructs the payload exactly — the tested invariant) at
      ``ts = i * FRAME_INTERVAL_MS``; SQL-replayable for text
      payloads (`substr` with the same integer-division bounds), so
      the sampling pipeline is value-checked cross-engine (x5c).
    * ``fake=False`` — real frame extraction needs a video codec,
      which no supported environment ships: raises
      ``NotImplementedError`` naming it.

    Batch shape: each Arrow batch of M media rows yields one pandas
    frame of ``M * n_frames`` rows — the expansion happens inside the
    batch, never per-row across the Python boundary.
    """
    if n_frames < 1:
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, tss, payloads = [], [], [], []
            for mid, p, t in zip(
                batch["media_id"], batch["payload"], batch["media_type"]
            ):
                if not fake:
                    raise NotImplementedError(
                        f"no frame codec for media_type={t!r} (video "
                        "decode requires libraries not present in any "
                        "supported environment); pass fake=True for the "
                        "deterministic byte-slicing sampler"
                    )
                data = p if p is not None else b""
                length = len(data)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * FRAME_INTERVAL_MS)
                    payloads.append(
                        data[i * length // n_frames : (i + 1) * length // n_frames]
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_ts_ms": tss,
                    "frame_payload": payloads,
                }
            )

    return media.mapInPandas(_frames, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Video path: stdlib RIFF/AVI container (real non-image codec #2)
# ---------------------------------------------------------------------------

#: Video feature row: exact integer container/pixel stats (no float —
#: the fake path is bit-replayable in SQL, the x5f digest recipe).
VIDEO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("fps", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sum_bytes", LongType(), True),
        StructField("peak", IntegerType(), True),
        StructField("sum_abs", LongType(), True),
    ]
)

#: synthesized-AVI geometry: 4 equal frames at 25 fps, each a
#: height-1 8-bit grayscale DIB strip
N_VIDEO_FRAMES = 4
VIDEO_FPS = 25


def documents_as_video(documents: DataFrame) -> DataFrame:
    """Adapter: documents' text bytes as raw video payloads (the
    ``encode_avi`` synthesizer slices them into frame strips) — the
    video twin of :func:`documents_as_audio`."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("size_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
    )


def _avi_frame_bytes(length: int) -> int:
    """Per-frame byte count for a payload of ``length`` bytes: the
    smallest DIB-legal strip that fits a quarter of the payload —
    ``N_VIDEO_FRAMES`` equal frames cover the payload (zero-padded at
    the tail) and each row stride is a multiple of 4 (the BMP/DIB
    alignment rule; height is 1, so frame size == stride).  Pure
    integer arithmetic, replayed verbatim by the x5g oracle."""
    quarter = (length + N_VIDEO_FRAMES - 1) // N_VIDEO_FRAMES
    return ((max(quarter, 4) + 3) // 4) * 4


def encode_avi(media: DataFrame) -> DataFrame:
    """Wrap each payload's bytes as a valid uncompressed 8-bit
    grayscale AVI container — RIFF('AVI ') with a real header chain
    (avih main header, vids stream header, BITMAPINFOHEADER + 256-gray
    palette), a 'movi' LIST of ``N_VIDEO_FRAMES`` '00db' DIB frames
    (each one height-1 strip of :func:`_avi_frame_bytes` pixels; the
    payload is zero-padded to fill the last frame), and an idx1 index.
    The deterministic synthesizer that gives the REAL stdlib RIFF
    parse (:func:`video_features` with ``fake=False``) a genuine
    container — the :func:`encode_pcm_wav` recipe one modality up.
    1 row in → 1 row out, Arrow-batched."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def one(data: bytes) -> bytes:
            fs = _avi_frame_bytes(len(data))
            padded = data + bytes(N_VIDEO_FRAMES * fs - len(data))
            frames = [
                padded[i * fs : (i + 1) * fs] for i in range(N_VIDEO_FRAMES)
            ]
            # BITMAPINFOHEADER + 256-entry grayscale palette (required
            # at biBitCount=8)
            bmih = struct.pack(
                "<IiiHHIIiiII", 40, fs, 1, 1, 8, 0, fs, 0, 0, 256, 0
            )
            palette = b"".join(
                struct.pack("<BBBB", i, i, i, 0) for i in range(256)
            )
            strf = b"strf" + struct.pack("<I", len(bmih) + len(palette)) + bmih + palette
            strh = b"strh" + struct.pack(
                "<I4s4sIHHIIIIIIIIhhhh",
                56, b"vids", b"DIB ", 0, 0, 0, 0,
                1, VIDEO_FPS,              # dwScale / dwRate
                0, N_VIDEO_FRAMES,         # dwStart / dwLength
                fs, 0, 0,                  # buf size, quality, sample size
                0, 0, fs, 1,               # rcFrame
            )
            strl = b"LIST" + struct.pack("<I", 4 + len(strh)) + b"strl" + strh
            avih = b"avih" + struct.pack(
                "<15I",
                56,
                1000000 // VIDEO_FPS,      # dwMicroSecPerFrame
                fs * VIDEO_FPS,            # dwMaxBytesPerSec
                0, 0x10,                   # padding, AVIF_HASINDEX
                N_VIDEO_FRAMES, 0, 1,      # totalframes, initial, streams
                fs, fs, 1,                 # bufsize, width, height
                0, 0, 0, 0,                # dwReserved[4]
            )
            hdrl = (
                b"LIST"
                + struct.pack("<I", 4 + len(avih) + len(strl) + len(strf))
                + b"hdrl" + avih + strl + strf
            )
            movi_chunks = b"".join(
                b"00db" + struct.pack("<I", fs) + f for f in frames
            )
            movi = b"LIST" + struct.pack("<I", 4 + len(movi_chunks)) + b"movi" + movi_chunks
            idx_entries = []
            off = 4  # offsets are relative to the start of 'movi' data
            for _f in frames:
                idx_entries.append(
                    b"00db" + struct.pack("<III", 0x10, off, fs)
                )
                off += 8 + fs
            idx1 = b"idx1" + struct.pack("<I", 16 * N_VIDEO_FRAMES) + b"".join(idx_entries)
            body = b"AVI " + hdrl + movi + idx1
            return b"RIFF" + struct.pack("<I", len(body)) + body

        for batch in batches:
            outs = [one(p if p is not None else b"") for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "media_type": batch["media_type"],
                    "payload": outs,
                    "size_bytes": [len(o) for o in outs],
                    "width": batch["width"],
                    "height": batch["height"],
                    "sample_rate": batch["sample_rate"],
                }
            )

    return media.mapInPandas(_encode, schema=MEDIA_SCHEMA)


def video_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Integer container/pixel stats per video asset — geometry, frame
    count, duration, and exact byte stats over the frame pixels under
    the shared ``|b - 128|`` mapping (all exact int64).

    * ``fake=True`` — stats computed from the RAW payload bytes plus
      the deterministic padding arithmetic the encoder applies
      (:func:`_avi_frame_bytes`; pad bytes are 0 → amplitude 128); the
      always-available path the x5g oracle replays from the text with
      ``ascii()``.
    * ``fake=False`` — REAL container decode via a stdlib RIFF walk:
      verify the RIFF/'AVI ' signature, parse the avih main header
      (geometry, frame count) and the vids strh (dwScale/dwRate →
      timing), then walk the 'movi' LIST and compute the stats over
      the actual '00db' DIB frame bytes.  No new dependency — raises
      ``NotImplementedError`` naming the codec for non-video rows,
      non-RIFF payloads, and compressed streams.  For a payload
      synthesized by :func:`encode_avi`, the real stats EQUAL the fake
      stats over the pre-encode payload — the contract pytest pins the
      equivalence (the audio recipe, e8291ee, one modality up).
    """

    # closures re-declared by value (module convention: workers must
    # not need this module importable)
    n_frames_const = N_VIDEO_FRAMES
    fps_const = VIDEO_FPS

    def _frame_bytes(length: int) -> int:
        quarter = (length + n_frames_const - 1) // n_frames_const
        return ((max(quarter, 4) + 3) // 4) * 4

    def _stats_fake(data: bytes) -> tuple[int, int, int, int, int, int, int, int]:
        fs = _frame_bytes(len(data))
        n_pad = n_frames_const * fs - len(data)
        peak = 0
        total = 0
        for b in data:
            v = abs(b - 128)
            if v > peak:
                peak = v
            total += v
        if n_pad > 0 and peak < 128:
            peak = 128
        total += n_pad * 128
        return (
            fs, 1, fps_const, n_frames_const,
            n_frames_const * 1000 // fps_const,
            n_frames_const * fs, peak, total,
        )

    def _stats_real(payload: bytes, media_type: str):
        if media_type != "video":
            raise NotImplementedError(
                f"no video codec for media_type={media_type!r}; pass "
                "fake=True for the deterministic byte-stats path"
            )
        import struct

        def need(cond: bool, what: str) -> None:
            if not cond:
                raise NotImplementedError(
                    f"only uncompressed 8-bit DIB AVI is decodable with "
                    f"the stdlib RIFF walk ({what}); other layouts need "
                    "codec libraries not present in any supported "
                    "environment"
                )

        need(len(payload) >= 12 and payload[:4] == b"RIFF"
             and payload[8:12] == b"AVI ", "not a RIFF/AVI container")
        width = height = rate = scale = n_frames = None
        frames: list[bytes] = []

        def walk(buf: bytes, pos: int, end: int) -> None:
            nonlocal width, height, rate, scale, n_frames
            while pos + 8 <= end:
                ckid = buf[pos : pos + 4]
                (size,) = struct.unpack_from("<I", buf, pos + 4)
                body = pos + 8
                if ckid == b"LIST":
                    walk(buf, body + 4, body + size)
                elif ckid == b"avih":
                    vals = struct.unpack_from("<14I", buf, body)
                    n_frames = vals[4]
                    width, height = vals[8], vals[9]
                elif ckid == b"strh":
                    fcc_type, handler = struct.unpack_from("<4s4s", buf, body)
                    if fcc_type == b"vids":
                        need(handler in (b"DIB ", b"\x00\x00\x00\x00"),
                             f"compressed stream {handler!r}")
                        scale, rate = struct.unpack_from("<II", buf, body + 20)
                elif ckid == b"strf":
                    bit_count = struct.unpack_from("<H", buf, body + 14)[0]
                    compression = struct.unpack_from("<I", buf, body + 16)[0]
                    need(bit_count == 8 and compression == 0,
                         f"biBitCount={bit_count} biCompression={compression}")
                elif ckid[2:4] == b"db":
                    frames.append(buf[body : body + size])
                pos = body + size + (size & 1)  # RIFF chunks are word-aligned

        walk(payload, 12, 8 + struct.unpack_from("<I", payload, 4)[0])
        need(width is not None and rate not in (None, 0), "missing headers")
        peak = 0
        total = 0
        sum_bytes = 0
        for f in frames:
            sum_bytes += len(f)
            for b in f:
                v = abs(b - 128)
                if v > peak:
                    peak = v
                total += v
        duration_ms = len(frames) * 1000 * (scale or 1) // rate
        return (
            width, height, rate // (scale or 1), len(frames),
            duration_ms, sum_bytes, peak, total,
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, mtype, p in zip(
                batch["media_id"], batch["media_type"], batch["payload"]
            ):
                data = p if p is not None else b""
                stats = _stats_fake(data) if fake else _stats_real(data, mtype)
                rows.append((int(mid), *stats))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "fps", "n_frames",
                    "duration_ms", "sum_bytes", "peak", "sum_abs",
                ],
            )

    return media.mapInPandas(_extract, schema=VIDEO_FEATURE_SCHEMA)
