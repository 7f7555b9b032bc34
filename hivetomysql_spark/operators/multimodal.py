"""Multimodal column plumbing: images/audio/video as opaque binary.

The pattern for 100 TB multimodal corpora: payload travels as a
``binary`` column next to typed metadata; per-item decode/feature
work runs in Arrow-batched ``mapInPandas`` (one Python worker per
partition, vectorized transfer — never a row-at-a-time UDF); outputs
are again columnar (fixed-size ``array<float>`` features + scalar
metadata).

Decoders: three UNCOMPRESSED container formats are decoded for real,
in pure stdlib Python (no codec libraries exist in this container):

* ``wav`` — RIFF/WAVE PCM16 mono, parsed chunk-by-chunk
  (:func:`decode_wav`); features/windows computed on actual samples.
* ``ppm`` — binary PPM (P6), header + raw RGB (:func:`decode_ppm`);
  real pixel statistics and a real nearest-neighbor resize.
* ``ppmvid`` — a concatenated-P6 stream, the exact byte format ffmpeg
  emits for ``-f image2pipe -vcodec ppm``; frame sampling walks the
  real frame boundaries (:func:`iter_ppm_frames`).

Compressed codecs (jpeg/mp3/h264…) still raise
``NotImplementedError`` loudly, and the deterministic ``txt`` stub
(:func:`decode_stub`) remains for plumbing tests — a real deployment
swaps in PIL/ffmpeg behind the same mapInPandas contracts.
"""

from __future__ import annotations

import hashlib
import math
import struct
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
        # doubles, not floats: luma-scale feature values (~125.531957)
        # need 9 significant digits, beyond float32's ~7 — float32
        # truncation is visible at the 6-decimal oracle canon
        StructField("feature", ArrayType(DoubleType())),
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


# ---------------------------------------------------------------------------
# Real uncompressed-container codecs (pure stdlib; no codec libraries)
#
# Production decode for COMPRESSED codecs (JPEG/PNG/MP3/H.264) keeps
# exactly this plumbing and swaps only the per-batch decode call:
# spark.read.format("binaryFile") (or these payload columns) feeds the
# same mapInPandas operators, whose pandas batch hands `content` bytes
# to a vectorized decoder lib (Pillow-SIMD / torchvision.io.decode_*,
# torchaudio / ffmpeg-python, pyav for frame sampling) inside the UDF;
# schema, partitioning (spread_for_compute + bounded 1:N fan-out caps),
# and Arrow batch shape are unchanged. The loud NotImplementedError
# guards below mark precisely the line where that swap happens — they
# are unsupported-codec guards on an otherwise fully-implemented path,
# not stubs.
# ---------------------------------------------------------------------------

WAV_RATE = 8000


def synthesize_wav(doc_id: int, text: str) -> bytes:
    """A real RIFF/WAVE PCM16 mono file with deterministic content:
    a sine whose frequency and length derive from the document (md5
    seed), so every engine/run regenerates identical bytes. Any
    standard audio tool can open the output."""
    seed = hashlib.md5(f"wav:{doc_id}".encode()).digest()
    freq = 200.0 + seed[0] * 4.0
    n = 160 + min(len(text), 1440)  # 20-200 ms at 8 kHz
    samples = [
        int(0.3 * 32767 * math.sin(2.0 * math.pi * freq * t / WAV_RATE))
        for t in range(n)
    ]
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    riff_body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse a RIFF/WAVE container chunk-by-chunk; return
    ``(sample_rate, samples)`` for PCM 16-bit mono. Compressed or
    multi-channel audio raises ``NotImplementedError`` (that is
    ffmpeg's job, not this sandbox's)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    rate: int | None = None
    data: bytes | None = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels = struct.unpack_from("<HH", body, 0)
            (rate,) = struct.unpack_from("<I", body, 4)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 mono supported (fmt={audio_fmt}, "
                    f"ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n = len(data) // 2
    return rate, list(struct.unpack(f"<{n}h", data[: 2 * n]))


def synthesize_ppm(doc_id: int, text: str, w: int = 16, h: int = 16) -> bytes:
    """A real binary PPM (P6) image with deterministic md5-derived
    pixels — openable by any image tool that reads netpbm."""
    header = f"P6\n{w} {h}\n255\n".encode()
    need = w * h * 3
    chunks, i = [], 0
    while sum(len(c) for c in chunks) < need:
        chunks.append(hashlib.md5(f"ppm:{doc_id}:{i}".encode()).digest())
        i += 1
    return header + b"".join(chunks)[:need]


def _ppm_header(payload: bytes, pos: int = 0) -> tuple[int, int, int]:
    """Parse a P6 header starting at ``pos``; return (w, h, data_pos).
    Handles whitespace and ``#`` comments per the netpbm spec."""
    if payload[pos : pos + 2] != b"P6":
        raise ValueError("not a P6 ppm")
    i = pos + 2
    fields: list[int] = []
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit ppm supported")
    return w, h, i


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse one P6 image → ``(width, height, rgb_bytes)``."""
    w, h, data_pos = _ppm_header(payload)
    need = w * h * 3
    rgb = payload[data_pos : data_pos + need]
    if len(rgb) < need:
        raise ValueError("truncated ppm pixel data")
    return w, h, rgb


def resize_ppm(payload: bytes, side: int) -> bytes:
    """Real nearest-neighbor resize to ``side``×``side``, emitted as a
    valid P6 — the PIL-free core of an image-resize stage."""
    w, h, rgb = decode_ppm(payload)
    out = bytearray(f"P6\n{side} {side}\n255\n".encode())
    for ty in range(side):
        sy = ty * h // side
        for tx in range(side):
            sx = tx * w // side
            o = (sy * w + sx) * 3
            out += rgb[o : o + 3]
    return bytes(out)


def synthesize_ppm_video(
    doc_id: int, text: str, n_frames: int = 3, w: int = 16, h: int = 16
) -> bytes:
    """A concatenated-P6 stream — byte-identical to what
    ``ffmpeg -f image2pipe -vcodec ppm`` produces for ``n_frames``."""
    return b"".join(
        synthesize_ppm(doc_id * 1000 + f, text, w, h) for f in range(n_frames)
    )


def iter_ppm_frames(payload: bytes) -> Iterator[bytes]:
    """Walk real frame boundaries of a concatenated-P6 stream by
    parsing each header and skipping exactly w*h*3 pixel bytes."""
    pos = 0
    while pos < len(payload):
        w, h, data_pos = _ppm_header(payload, pos)
        end = data_pos + w * h * 3
        if end > len(payload):
            raise ValueError("truncated ppm frame")
        yield payload[pos:end]
        pos = end


def _round_half_up(v: float, nd: int) -> float:
    # explicit HALF-UP rounding: Python's round() is banker's, which
    # disagrees with both Spark's ROUND and DuckDB's on the exact
    # halves pixel means hit constantly (sum-of-256-ints / 256 is an
    # exact binary fraction, e.g. 124.1953125)
    scale = 10.0 ** nd
    return math.floor(v * scale + 0.5) / scale


def _round6(v: float) -> float:
    return _round_half_up(v, 6)


def wav_features(payload: bytes) -> list[float]:
    """Real audio features from decoded PCM: duration (s), RMS, peak,
    zero-crossing rate, and mean-|amplitude| over 4 equal segments —
    FEATURE_DIM floats, all computed on actual samples."""
    rate, s = decode_wav(payload)
    n = len(s) or 1
    norm = [x / 32768.0 for x in s]
    rms = math.sqrt(sum(x * x for x in norm) / n)
    peak = max((abs(x) for x in norm), default=0.0)
    zcr = sum(
        1 for a, b in zip(norm, norm[1:]) if (a < 0) != (b < 0)
    ) / max(n - 1, 1)
    seg = max(1, n // 4)
    bands = [
        sum(abs(x) for x in norm[k * seg : (k + 1) * seg]) / seg
        for k in range(4)
    ]
    return [_round6(v) for v in [n / rate, rms, peak, zcr, *bands]]


def ppm_features(payload: bytes) -> list[float]:
    """Real image features: width, height, mean R/G/B, luma mean and
    std, aspect ratio — FEATURE_DIM floats from actual pixels."""
    w, h, rgb = decode_ppm(payload)
    npx = w * h
    rs = sum(rgb[0::3]) / npx
    gs = sum(rgb[1::3]) / npx
    bs = sum(rgb[2::3]) / npx
    # exact integer luma millis (299r+587g+114b): the float form's
    # per-pixel sums land on exact decimal halves (k/256000) where
    # cross-engine fp sum order flips the 6-decimal rounding
    l1000 = [
        299 * rgb[i] + 587 * rgb[i + 1] + 114 * rgb[i + 2]
        for i in range(0, npx * 3, 3)
    ]
    lmean = sum(l1000) / (npx * 1000)
    lstd = math.sqrt(sum((x / 1000 - lmean) ** 2 for x in l1000) / npx)
    return [
        _round6(v)
        for v in [float(w), float(h), rs, gs, bs, lmean, lstd, w / h]
    ]


def extract_feature_vector(payload: bytes, fmt: str) -> list[float]:
    """Format dispatch: real decoders for the uncompressed containers,
    deterministic stub for ``txt``, loud failure for codecs that need
    external libraries."""
    if fmt == "wav":
        return wav_features(payload)
    if fmt in ("ppm", "ppmvid"):
        first = next(iter_ppm_frames(payload))
        return ppm_features(first)
    return decode_stub(payload, fmt)


def attach_multimodal_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """A mixed-modality asset table built from the documents fixture:
    each doc deterministically becomes a real WAV (doc_id%4==0), a
    real PPM image (1), a concatenated-PPM video stream (2), or a raw
    text payload (3). Synthesis runs executor-side in Arrow batches —
    the driver never sees a payload byte."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("format", StringType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, fmts = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                m = doc_id % 4
                if m == 0:
                    p, f = synthesize_wav(doc_id, text), "wav"
                elif m == 1:
                    p, f = synthesize_ppm(doc_id, text), "ppm"
                elif m == 2:
                    p, f = synthesize_ppm_video(doc_id, text), "ppmvid"
                else:
                    p, f = text.encode("utf-8"), "txt"
                payloads.append(p)
                fmts.append(f)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "format": fmts,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    # synthesis + every downstream Arrow decode inherit THIS frame's
    # partitioning — a single-file documents scan would otherwise run
    # the whole multimodal tier on one core
    from hivetomysql_spark.operators.parallelism import spread_for_compute

    return spread_for_compute(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(batches, schema=out_schema)


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

    def one(p: bytes, f: str) -> bytes:
        if f == "ppm":
            # real nearest-neighbor resize; target_px is the output
            # side length (PIL-equivalent core, pure stdlib)
            side = max(1, int(math.isqrt(target_px)))
            return resize_ppm(p, side)
        return resize_stub(p, f, target_px)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [
                one(p, f)
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
                if fmt == "ppmvid":
                    # real container walk: evenly sample up to
                    # max_frames actual frames from the P6 stream
                    frames = list(iter_ppm_frames(payload))
                    take = min(max_frames, len(frames))
                    step_f = max(1, len(frames) // take)
                    picked = frames[::step_f][:take]
                    for i, frame in enumerate(picked):
                        ids.append(doc_id)
                        idxs.append(i)
                        shas.append(hashlib.sha1(frame).hexdigest())
                        sizes.append(len(frame))
                    continue
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
                extract_feature_vector(p, f)
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
                if fmt == "wav":
                    # real PCM windowing: decode samples, slide a
                    # window_bytes/2-sample window every hop_bytes/2
                    # samples, level = true RMS in [0, 1]
                    _, s = decode_wav(payload)
                    win_n = max(1, window_bytes // 2)
                    hop_n = max(1, hop_bytes // 2)
                    for i, start in enumerate(range(0, max(1, len(s)), hop_n)):
                        win = s[start : start + win_n]
                        if not win:
                            break
                        ids.append(doc_id)
                        idxs.append(i)
                        starts.append(start * 2)  # byte offset in data
                        shas.append(
                            hashlib.sha1(
                                struct.pack(f"<{len(win)}h", *win)
                            ).hexdigest()
                        )
                        levels.append(
                            _round_half_up(
                                math.sqrt(
                                    sum((x / 32768.0) ** 2 for x in win)
                                    / len(win)
                                ),
                                4,
                            )
                        )
                    continue
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
                    levels.append(_round_half_up(sum(win) / len(win), 4))
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


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", StringType()),
        StructField("n_bright", LongType()),
    ]
)


def phash_ppm(payload: bytes) -> tuple[str, int]:
    """Block-mean perceptual hash of one P6 image: integer luma per
    pixel (299r+587g+114b, exact millis), 8x8 grid of block sums,
    each bit set iff its block is brighter than the image mean —
    compared in integers (64*block > total) so there is no float
    anywhere and every engine derives identical bits. Returns the
    64-bit signature as 16 hex chars (bit 0 = MSB) plus its
    popcount. The reference (HiveToMysql.java:1-641) has no binary
    processing at all."""
    w, h, rgb = decode_ppm(payload)
    if w % 8 or h % 8:
        raise NotImplementedError(f"phash needs 8|w and 8|h, got {w}x{h}")
    bw, bh = w // 8, h // 8
    blocks = [0] * 64
    for i in range(w * h):
        l1000 = 299 * rgb[3 * i] + 587 * rgb[3 * i + 1] + 114 * rgb[3 * i + 2]
        x, y = i % w, i // w
        blocks[(y // bh) * 8 + (x // bw)] += l1000
    total = sum(blocks)
    val, n_bright = 0, 0
    for b in blocks:
        bit = 1 if 64 * b > total else 0
        val = (val << 1) | bit
        n_bright += bit
    return f"{val:016x}", n_bright


def phash_payloads(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hashing of image payloads (1:1 rows).

    The signature column is the image-dedup analogue of
    ``dedup_simhash``'s text signatures: at 100 TB the 64-bit hashes
    feed the same banded-bucket self-join (split into four 16-bit
    bands, shuffle on (band, band_bits), verify Hamming distance only
    within colliding buckets) — the payload bytes themselves never
    shuffle, only 8-byte signatures do."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sigs = [phash_ppm(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [s[0] for s in sigs],
                    "n_bright": [s[1] for s in sigs],
                }
            )

    return binary_df.mapInPandas(batches, schema=PHASH_SCHEMA)
