"""Real-codec round trips for the multimodal tier: the WAV/PPM/
concatenated-PPM decoders must parse back exactly what the
synthesizers wrote, and the Spark stages must compute real features
from the decoded content (not byte-stub hashes)."""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from hivetomysql_spark.operators import multimodal as M
from hivetomysql_spark.tables import load_table


def test_wav_round_trip_and_features():
    payload = M.synthesize_wav(4, "hello " * 100)
    rate, samples = M.decode_wav(payload)
    assert rate == M.WAV_RATE
    # re-derive the expected sine deterministically
    import hashlib

    seed = hashlib.md5(b"wav:4").digest()
    freq = 200.0 + seed[0] * 4.0
    expect = [
        int(0.3 * 32767 * math.sin(2.0 * math.pi * freq * t / rate))
        for t in range(len(samples))
    ]
    assert samples == expect
    f = M.wav_features(payload)
    assert len(f) == M.FEATURE_DIM
    assert f[0] == pytest.approx(len(samples) / rate)
    # sine RMS ~ amplitude/sqrt(2)
    assert f[1] == pytest.approx(0.3 / math.sqrt(2), rel=0.05)
    assert f[2] == pytest.approx(0.3, rel=0.01)  # peak


def test_wav_rejects_non_pcm16():
    payload = bytearray(M.synthesize_wav(1, "x"))
    # corrupt the audio-format tag (offset: RIFF(12) + 'fmt '+size(8))
    struct.pack_into("<H", payload, 20, 7)  # mu-law
    with pytest.raises(NotImplementedError):
        M.decode_wav(bytes(payload))


def test_ppm_round_trip_resize_and_features():
    payload = M.synthesize_ppm(7, "x")
    w, h, rgb = M.decode_ppm(payload)
    assert (w, h) == (16, 16) and len(rgb) == 16 * 16 * 3
    small = M.resize_ppm(payload, 4)
    sw, sh, srgb = M.decode_ppm(small)
    assert (sw, sh) == (4, 4)
    # nearest-neighbor: every output pixel exists at its source pos
    for ty in range(4):
        for tx in range(4):
            src = ((ty * 16 // 4) * 16 + (tx * 16 // 4)) * 3
            dst = (ty * 4 + tx) * 3
            assert srgb[dst : dst + 3] == rgb[src : src + 3]
    f = M.ppm_features(payload)
    assert f[0] == 16.0 and f[1] == 16.0
    assert f[2] == pytest.approx(sum(rgb[0::3]) / 256, abs=1e-4)


def test_ppm_header_comments_and_truncation():
    ok = b"P6\n# c\n2 1\n255\n" + bytes(6)
    assert M.decode_ppm(ok)[:2] == (2, 1)
    with pytest.raises(ValueError):
        M.decode_ppm(b"P6\n4 4\n255\n" + bytes(3))


def test_ppm_video_frame_walk():
    v = M.synthesize_ppm_video(9, "x", n_frames=5)
    frames = list(M.iter_ppm_frames(v))
    assert len(frames) == 5
    assert all(M.decode_ppm(fr)[:2] == (16, 16) for fr in frames)
    assert b"".join(frames) == v  # boundaries are exact


def test_spark_stages_decode_for_real(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(40)
    binary = M.attach_multimodal_payload(docs, "doc_id", "text")
    feats = {
        r["doc_id"]: r
        for r in M.extract_features(binary).collect()
    }
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in binary.collect()}
    for doc_id, r in feats.items():
        expect = M.extract_feature_vector(payloads[doc_id], r["format"])
        got = [round(float(x), 6) for x in r["feature"]]
        assert got == pytest.approx(expect, abs=1e-5), (doc_id, r["format"])
    # audio windows carry true RMS of the decoded samples
    wavs = binary.where(F.col("format") == "wav")
    wins = M.window_audio(wavs).collect()
    assert wins, "expected at least one wav asset"
    by_doc = {}
    for r in wins:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        _, s = M.decode_wav(payloads[doc_id])
        first = min(rows, key=lambda r: r["win_idx"])
        win = s[:100]
        rms = round(
            math.sqrt(sum((x / 32768.0) ** 2 for x in win) / len(win)), 4
        )
        assert first["level"] == pytest.approx(rms, abs=1e-4)


def test_video_ssim_short_payload_degrades(spark):
    """ADVICE r7: the in-row frame walk hardcoded pairs (0,1); a
    payload with <3 frames must yield FEWER pairs (size-1, capped at
    2) — exactly like the old frame+1 join — never NULL ssim rows or
    an ANSI out-of-bounds error."""
    from hivetomysql_spark.queries.multimodal_suite import ssim_from_lumas

    f0 = [float(i) for i in range(4)]
    f1 = [float(i * 2) for i in range(4)]
    f2 = [float(i * 3) for i in range(4)]
    per_doc = spark.createDataFrame(
        [
            (1, [f0]),            # 1 frame  -> 0 pairs
            (2, [f0, f1]),        # 2 frames -> 1 pair
            (3, [f0, f1, f2]),    # 3 frames -> 2 pairs (fixture shape)
            (4, []),              # 0 frames -> 0 pairs
        ],
        "doc_id long, lumas array<array<double>>",
    )
    rows = ssim_from_lumas(per_doc).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc and 4 not in by_doc
    assert [r["pair_idx"] for r in by_doc[2]] == [0]
    assert sorted(r["pair_idx"] for r in by_doc[3]) == [0, 1]
    assert all(r["ssim"] is not None for r in rows)
