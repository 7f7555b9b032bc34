"""Multimodal column plumbing: images/audio/video as opaque binary.

The pattern for 100 TB multimodal corpora: payload travels as a
``binary`` column next to typed metadata; per-item decode/feature
work runs in Arrow-batched ``mapInPandas`` (one Python worker per
partition, vectorized transfer — never a row-at-a-time UDF); outputs
are again columnar (fixed-size ``array<float>`` features + scalar
metadata).

The decode step itself is STUBBED here (PIL/ffmpeg are not in this
container): :func:`decode_stub` raises ``NotImplementedError`` when a
real decoder is requested, and otherwise produces a deterministic
fake (byte-derived) feature so that the Spark-side plumbing — schema,
batching, partitioning, UDF signature — is fully real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("sha1", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Simulate a multimodal table from the documents fixture: the
    UTF-8 bytes of the text stand in for an image/audio payload, with
    typed metadata columns alongside (the real-world schema shape:
    ``(id, payload binary, format string, n_bytes long)``)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("txt").alias("format"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def decode_stub(payload: bytes, fmt: str) -> list[float]:
    """Deterministic fake 'decode → feature vector' for plumbing tests.

    A real deployment swaps this for PIL/torchvision/ffmpeg decode —
    the calling ``mapInPandas`` contract is unchanged. Requesting a
    real decoder here raises, loudly.
    """
    if fmt not in ("txt",):
        raise NotImplementedError(
            f"real decoder for format={fmt!r} not available in this "
            "environment; only the deterministic stub ('txt') is wired"
        )
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "little") / 2**32
        for i in range(FEATURE_DIM)
    ]


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("target_px", LongType()),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_sha1", StringType()),
        StructField("frame_bytes", LongType()),
    ]
)


def resize_stub(payload: bytes, fmt: str, target_px: int) -> bytes:
    """Deterministic fake resize: decimate the byte stream to
    ``target_px`` 'pixels'. A real deployment swaps in PIL
    ``Image.resize`` — the mapInPandas contract (binary in → smaller
    binary out, 1:1 rows) is unchanged."""
    if fmt not in ("txt",):
        raise NotImplementedError(
            f"real resize for format={fmt!r} not available; stub only"
        )
    if len(payload) <= target_px:
        return payload
    step = len(payload) / target_px
    return bytes(payload[int(i * step)] for i in range(target_px))


def resize_payloads(binary_df: DataFrame, target_px: int = 64) -> DataFrame:
    """Arrow-batched 'image resize' over binary payloads (1:1 rows).

    The load-bearing property at 100 TB: the payload column never
    leaves the executor as Python scalars — Arrow carries whole
    batches both ways, and output size is bounded by ``target_px``
    per row, so a resize stage strictly shrinks the data in flight."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [
                resize_stub(p, f, target_px)
                for p, f in zip(pdf["payload"], pdf["format"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": pdf["format"],
                    "payload": out,
                    "n_bytes": [len(b) for b in out],
                    "target_px": target_px,
                }
            )

    return binary_df.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(
    binary_df: DataFrame, every_n_bytes: int = 256, max_frames: int = 4
) -> DataFrame:
    """Row-expanding 'video frame sampling' (1:N) in mapInPandas.

    Treats every ``every_n_bytes`` slice of the payload as one
    'frame' and emits up to ``max_frames`` evenly-spaced frames per
    input row — the exact batch shape of real video sampling (ffmpeg
    keyframe extraction), where one row fans out to a bounded number
    of frame rows. Bounding the fan-out is what keeps the stage safe
    at scale: output ≤ max_frames × input rows by construction."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, shas, sizes = [], [], [], []
            for doc_id, payload, fmt in zip(
                pdf["doc_id"], pdf["payload"], pdf["format"]
            ):
                if fmt not in ("txt",):
                    raise NotImplementedError(
                        f"real frame sampler for format={fmt!r} not available"
                    )
                n_slices = max(1, min(max_frames, len(payload) // every_n_bytes))
                step = max(1, len(payload) // n_slices)
                for i in range(n_slices):
                    frame = payload[i * step : i * step + every_n_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    shas.append(hashlib.sha1(frame).hexdigest())
                    sizes.append(len(frame))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_sha1": shas,
                    "frame_bytes": sizes,
                }
            )

    return binary_df.mapInPandas(batches, schema=FRAMES_SCHEMA)


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``mapInPandas`` receives whole Arrow record batches — payload
    bytes never individually round-trip through pickle. Output rows
    stay 1:1 with input (schema :data:`FEATURES_SCHEMA`), so the
    operator composes with downstream joins without re-partitioning.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_stub(p, f)
                for p, f in zip(pdf["payload"], pdf["format"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "format": pdf["format"],
                    "sha1": [hashlib.sha1(p).hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return binary_df.mapInPandas(batches, schema=FEATURES_SCHEMA)


AUDIO_WINDOWS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", IntegerType()),
        StructField("start_byte", IntegerType()),
        StructField("win_sha1", StringType()),
        StructField("level", DoubleType()),
    ]
)


def window_audio(
    binary_df: DataFrame, window_bytes: int = 200, hop_bytes: int = 100
) -> DataFrame:
    """Overlapping 'audio window' extraction (1:N) in mapInPandas —
    the audio counterpart of :func:`sample_frames`: fixed-size
    windows every ``hop_bytes`` (50% overlap at the defaults), each
    with a content hash and a mean-byte 'level' standing in for RMS
    energy (a real pipeline would decode PCM and window samples; the
    batch shape, overlap arithmetic, and bounded 1:N fan-out are
    identical). Fan-out is ceil(len/hop), bounded by payload size —
    the property that keeps the stage memory-safe at 100 TB."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, starts, shas, levels = [], [], [], [], []
            for doc_id, payload, fmt in zip(
                pdf["doc_id"], pdf["payload"], pdf["format"]
            ):
                if fmt not in ("txt",):
                    raise NotImplementedError(
                        f"real audio decoder for format={fmt!r} not available"
                    )
                n = len(payload)
                for i, start in enumerate(range(0, max(1, n), hop_bytes)):
                    win = payload[start : start + window_bytes]
                    if not win:
                        break
                    ids.append(doc_id)
                    idxs.append(i)
                    starts.append(start)
                    shas.append(hashlib.sha1(win).hexdigest())
                    levels.append(round(sum(win) / len(win), 4))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win_idx": idxs,
                    "start_byte": starts,
                    "win_sha1": shas,
                    "level": levels,
                }
            )

    return binary_df.mapInPandas(batches, schema=AUDIO_WINDOWS_SCHEMA)
