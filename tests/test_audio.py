"""Semantic oracle for the audio feature extractor: every value
`audio_frame_features` reports is recomputed by a straight-line
pure-Python/numpy twin (same audiocodec primitives, independent window
arithmetic) and asserted exactly equal — the same convention
tests/test_video.py applies to the video frame-sampler."""

from __future__ import annotations

import numpy as np
import pytest

from commentsearchengine_spark.functions import audiocodec as ac
from commentsearchengine_spark.functions.mmh3 import murmur64
from commentsearchengine_spark.relational import engine_queries as eq


def _oracle_row(vid: int) -> dict:
    uh = murmur64(f"audio-{vid}")
    n = ac.n_samples_for(uh)
    pcm = ac.pcm_decode(ac.pcm_encode(ac.synth_pcm(uh, n)))
    # independent window math: per-window loops, not the reshape path
    nw = n // ac.FRAME_LEN
    rms, zcr = [], []
    for i in range(nw):
        w = pcm[i * ac.FRAME_LEN:(i + 1) * ac.FRAME_LEN].astype(np.float64)
        rms.append(float(np.sqrt((w**2).mean())))
        s = np.sign(w)
        zcr.append(float((np.abs(np.diff(s)) > 1).sum() / (ac.FRAME_LEN - 1)))
    return {
        "sr": ac.SAMPLE_RATE,
        "n_samples": n,
        "n_windows": nw,
        "tail_samples": n - nw * ac.FRAME_LEN,
        "mean_rms": round(float(np.mean(rms)), 4),
        "max_rms": round(float(np.max(rms)), 4),
        "mean_zcr": round(float(np.mean(zcr)), 4),
        "silence_ratio": round(
            float(np.mean([r < ac.SILENCE_RMS for r in rms])), 4),
    }


def test_audio_frame_features_match_oracle(spark, sf_dir):
    rows = {
        r["vec_id"]: r.asDict()
        for r in eq.q_audio_frame_features(spark, sf_dir).collect()
    }
    assert rows
    for vid, got in rows.items():
        exp = _oracle_row(int(vid))
        for k, v in exp.items():
            assert got[k] == v, (vid, k, got[k], v)


def test_audio_fixture_exercises_both_regimes(spark, sf_dir):
    """The synthesized corpus must hit silent AND non-silent windows,
    and at least one ragged tail — otherwise the features are tested
    only on degenerate inputs."""
    rows = [r.asDict() for r in
            eq.q_audio_frame_features(spark, sf_dir).collect()]
    assert any(r["silence_ratio"] > 0 for r in rows)
    assert any(r["silence_ratio"] < 1 for r in rows)
    assert any(r["tail_samples"] > 0 for r in rows)
    assert all(8 <= r["n_windows"] <= 31 for r in rows)


@pytest.mark.parametrize("vid", [0, 1, 7])
def test_silence_prefix_is_silent(vid):
    """Synthesis zeroes exactly silence_windows_for leading windows;
    those windows must read RMS 0 and ZCR 0 in the oracle arithmetic."""
    uh = murmur64(f"audio-{vid}")
    pcm = ac.synth_pcm(uh, ac.n_samples_for(uh))
    k = ac.silence_windows_for(uh)
    assert not pcm[: k * ac.FRAME_LEN].any()
    if k:
        w = pcm[: ac.FRAME_LEN].astype(np.float64)
        assert float(np.sqrt((w**2).mean())) == 0.0


def test_pcm_roundtrip_bit_exact():
    uh = murmur64("audio-roundtrip")
    pcm = ac.synth_pcm(uh, 4096)
    assert np.array_equal(ac.pcm_decode(ac.pcm_encode(pcm)), pcm)
    assert pcm.dtype == np.int16
