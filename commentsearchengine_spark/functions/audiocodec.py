"""Audio payload synthesis + windowed feature primitives — spec twins.

The brief's multimodal list is image / audio / video over opaque binary
columns.  No audio library exists in this container (no soundfile/librosa,
verified the same way PIL's absence pinned the image codecs), so the
"decode" here is our own PCM16 little-endian mono codec and the clip
content is a deterministic stand-in — exactly the convention
imagecodec.synth_pixels / the video clip container already use.  What
must be REAL (and is): the Spark-side plumbing — binary column + typed
metadata schema, Arrow-batched mapInPandas, whole-window numpy feature
math with no per-sample Python.

These pure functions run identically inside the engine's mapInPandas
pass (relational/engine_queries.q_audio_frame_features) and in the
pure-Python pytest oracle (tests/test_audio.py), making every reported
feature value testable bit-for-bit.

Synthesis model (all fields bit-slices of one splitmix64 round, like
imagecodec): a sine carrier (freq 50..449 Hz, amplitude 3000..14999)
plus uniform integer noise in [-500, 500], with the first
``silence_windows_for`` analysis windows zeroed out so the
silence-ratio feature is exercised at non-trivial values.

Features (per FRAME_LEN-sample window, hop == frame, ragged tail
dropped but counted): RMS energy and zero-crossing rate; per clip the
aggregates mean/max RMS, mean ZCR, and the fraction of silent windows
(RMS < SILENCE_RMS).
"""

from __future__ import annotations

import numpy as np

from .mmh3 import splitmix64

SAMPLE_RATE = 8000
FRAME_LEN = 256
SILENCE_RMS = 10.0
_M64 = (1 << 64) - 1


def _z(clip_hash: int) -> int:
    return splitmix64(clip_hash & _M64)


def n_samples_for(clip_hash: int) -> int:
    """Deterministic clip length in samples: 2048..8191 (8..31 full
    windows plus, usually, a ragged tail — both code paths exercised)."""
    return 2048 + _z(clip_hash) % 6144


def silence_windows_for(clip_hash: int) -> int:
    """Number of leading analysis windows zeroed at synthesis: 0..3."""
    return (_z(clip_hash) >> 13) % 4


def synth_pcm(clip_hash: int, n_samples: int) -> np.ndarray:
    """Deterministic int16 mono PCM — identical in oracle and engine."""
    z = _z(clip_hash)
    freq = 50 + (z >> 7) % 400
    amp = 3000 + (z >> 19) % 12000
    t = np.arange(n_samples, dtype=np.float64)
    tone = amp * np.sin(2.0 * np.pi * freq * t / SAMPLE_RATE)
    rng = np.random.Generator(np.random.PCG64(clip_hash & _M64))
    noise = rng.integers(-500, 501, size=n_samples, dtype=np.int64)
    pcm = np.clip(np.rint(tone) + noise, -32768, 32767).astype(np.int16)
    cut = silence_windows_for(clip_hash) * FRAME_LEN
    if cut:
        pcm[:cut] = 0
    return pcm


def pcm_encode(pcm: np.ndarray) -> bytes:
    return pcm.astype("<i2").tobytes()


def pcm_decode(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype="<i2")


def frame_features(pcm: np.ndarray) -> dict:
    """Windowed RMS / zero-crossing features over full FRAME_LEN windows.

    Whole-clip numpy (reshape + axis reductions); the ragged tail is
    dropped from the windows but reported as ``tail_samples``.
    """
    n = int(pcm.shape[0])
    n_windows = n // FRAME_LEN
    frames = (
        pcm[: n_windows * FRAME_LEN]
        .astype(np.float64)
        .reshape(n_windows, FRAME_LEN)
    )
    rms = np.sqrt((frames**2).mean(axis=1))
    # sign() maps 0 -> 0; count strict sign flips between consecutive
    # samples within each window (an all-zero silent window has ZCR 0)
    signs = np.sign(frames)
    zcr = (np.abs(np.diff(signs, axis=1)) > 1).sum(axis=1) / (FRAME_LEN - 1)
    return {
        "n_samples": n,
        "n_windows": n_windows,
        "tail_samples": n - n_windows * FRAME_LEN,
        "mean_rms": round(float(rms.mean()), 4),
        "max_rms": round(float(rms.max()), 4),
        "mean_zcr": round(float(zcr.mean()), 4),
        "silence_ratio": round(float((rms < SILENCE_RMS).mean()), 4),
    }
