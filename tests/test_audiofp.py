"""Audio fingerprint dedup (B130, ``operators/audiofp.py``).

Independent python-loop replay of the fingerprint (different code
structure than the module's einsum path), corpus-wide planted-case
verdicts over the real fixture set, gain invariance, banding
completeness vs a brute-force Hamming scan, torn-payload error rows,
and determinism.
"""

import itertools
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_api_system_loop_ai_spark.operators import audiofp as A
from data_ingestion_api_system_loop_ai_spark.operators.phash import hamming64


def _replay_afp(samples: np.ndarray) -> int:
    """Independent fingerprint: explicit python loops over the DCT-II
    definition — no shared code with the module's banded-einsum path
    beyond the published formulas."""
    n = A.AFP_FRAME
    e = []
    for fi in range(A.AFP_FRAMES):
        frame = samples[fi * A.AFP_HOP : fi * A.AFP_HOP + n].astype(
            np.float64
        )
        bands = []
        for m in range(A.AFP_BANDS):
            acc = 0.0
            for k in range(
                A.AFP_BIN_LO + m * A.AFP_BAND_W,
                A.AFP_BIN_LO + (m + 1) * A.AFP_BAND_W,
            ):
                scale = math.sqrt(2.0 / n) * (
                    1.0 / math.sqrt(2.0) if k == 0 else 1.0
                )
                c = scale * float(
                    np.dot(
                        frame,
                        np.cos((2.0 * np.arange(n) + 1.0) * k * math.pi / (2.0 * n)),
                    )
                )
                acc += c * c
            bands.append(acc)
        e.append(bands)
    bits, slot = 0, 0
    for fp in A.AFP_PAIRS:
        for m in range(A.AFP_BANDS - 1):
            d = (e[fp][m] - e[fp][m + 1]) - (e[fp - 1][m] - e[fp - 1][m + 1])
            if d > 0:
                bits |= 1 << slot
            slot += 1
    return bits & ((1 << 63) - 1)


def test_afp64_matches_independent_replay():
    for seed in (0, 3, 44, 123):
        s = A.clip_samples(seed)
        assert A.afp64(s) == _replay_afp(s), seed


def test_afp_gain_invariance_and_wav_round_trip():
    for seed in (1, 8, 61, 200):
        s = A.clip_samples(seed)
        h = A.afp64(s)
        # volume change scales every band energy by g^2 — every
        # double-difference sign survives (up to int16 re-quantization,
        # exact on these fixtures)
        assert A.afp64(A.gain_scale(s)) == h
        assert A.afp64(A.gain_scale(s, 1.1)) == h
        # container round trip is byte-faithful
        assert A.afp64(A.decode_clip_wav(A.encode_clip_wav(s))) == h


def _spec_fps(doc_ids):
    fps, specs = {}, {}
    for d in doc_ids:
        sp = A.afp_spec(d)
        specs[d] = sp
        if sp["torn"]:
            continue
        s = A.clip_samples(sp["seed"])
        if sp["variant"] == "gain":
            s = A.gain_scale(s)
        elif sp["variant"] == "dropout":
            s = A.dropout(s)
        fps[d] = A.afp64(s)
    return fps, specs


def test_audio_dedup_verdicts(spark, sf_dir):
    from data_ingestion_api_system_loop_ai_spark.operators.audiofp import (
        q_audio_dedup,
    )
    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

    doc_ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    fps, specs = _spec_fps(doc_ids)
    out = {r["asset_id"]: r for r in q_audio_dedup(spark, sf_dir).collect()}
    assert set(out) == set(doc_ids)  # one verdict per clip

    # expected content groups from the replayed fingerprints
    content_min: dict = {}
    for d, fp in fps.items():
        content_min[fp] = min(content_min.get(fp, d), d)

    for d, sp in specs.items():
        r = out[d]
        if sp["torn"]:
            assert r["error"] is not None and r["afp"] is None
            continue
        assert r["error"] is None
        assert r["afp"] == fps[d]  # engine fingerprint == replay
        assert r["content_id"] == content_min[fps[d]]
        partner = {"copy": d - 2, "gain": d - 4, "dropout": d - 6}.get(
            sp["variant"]
        )
        if partner is not None and partner in fps:
            # the planted relative resolves: exact/gain copies share
            # the fingerprint (content collapse), dropout lands within
            # the Hamming radius (near collapse)
            if sp["variant"] in ("copy", "gain"):
                assert r["content_id"] == content_min[fps[partner]]
                assert r["hamming_to_near"] == 0
            else:
                assert r["near_id"] == content_min[fps[partner]]
                assert r["hamming_to_near"] <= A.AFP_MAX_HAMMING
        elif sp["variant"] == "base":
            # fixture separation (validated corpus-wide while building
            # the fixture): distinct contents sit >= 8 bits apart, a
            # base clip's own id is the minimum of its content group
            # (derivative assets always carry larger ids), and any
            # in-radius dropout twin has a LARGER content id — so the
            # one-hop canonical is always the clip's own content
            assert r["content_id"] == d
            assert r["near_id"] == d


def test_audio_banding_complete_vs_bruteforce(spark, sf_dir):
    """The 4x16-bit pigeonhole banding finds EXACTLY the distinct-hash
    pairs a brute-force Hamming scan finds (zero false negatives, the
    B120/B32 guarantee re-proven on the audio hash)."""
    from data_ingestion_api_system_loop_ai_spark.operators.audiofp import (
        afp_fingerprints,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.phash import (
        phash_near_pairs,
    )

    fps = afp_fingerprints(spark, sf_dir).localCheckpoint()
    vals = sorted(
        {r["afp"] for r in fps.collect() if r["afp"] is not None}
    )
    brute = {
        (a, b)
        for a, b in itertools.combinations(vals, 2)
        if hamming64(a, b) <= A.AFP_MAX_HAMMING
    }
    assert brute  # the dropout plants guarantee near pairs exist
    banded = {
        (r["afp_a"], r["afp_b"])
        for r in phash_near_pairs(
            fps, max_hamming=A.AFP_MAX_HAMMING, col="afp"
        ).collect()
    }
    assert banded == brute


def test_audio_dedup_deterministic(spark, sf_dir):
    from data_ingestion_api_system_loop_ai_spark.operators.audiofp import (
        q_audio_dedup,
    )

    a = sorted(map(tuple, q_audio_dedup(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_audio_dedup(spark, sf_dir).collect()))
    assert a == b


def test_torn_wav_arms():
    import struct

    import pytest

    # truncation inside the data chunk
    with pytest.raises(ValueError, match="truncated"):
        A.decode_clip_wav(A.afp_payload(0))  # doc 0 is the torn witness
    # not a RIFF payload at all
    with pytest.raises(ValueError, match="RIFF"):
        A.decode_clip_wav(b"not audio")
    # truncation inside a chunk HEADER must also surface as an error
    # row, never a dead task (the r9 multimodal lesson): the batch
    # mapper catches struct.error as well
    good = A.encode_clip_wav(A.clip_samples(1))
    torn_header = good[:18]  # mid-fmt-chunk
    with pytest.raises((ValueError, struct.error)):
        A.decode_clip_wav(torn_header)
