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
    FloatType,
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
