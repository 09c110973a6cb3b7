"""Semantic oracles for the image-modality driver queries: every value
`image_feature_extract` and `image_resize_thumbs` report is recomputed
by a straight-line pure-Python/numpy twin (same imagecodec primitives,
independent arithmetic) and asserted exactly equal — completing the
convention tests/test_video.py and tests/test_audio.py set for the
other two modalities (the queries themselves stay rows-only in the
driver gate: binary codec pipelines have no SQL oracle)."""

from __future__ import annotations

import numpy as np

from commentsearchengine_spark.functions import imagecodec as ic
from commentsearchengine_spark.functions.mmh3 import murmur64
from commentsearchengine_spark.relational import engine_queries as eq


def _feature_oracle(vid: int) -> dict:
    uh = murmur64(f"img-{vid}")
    w, h = ic.dims_for(uh)
    fmt = ic.fmt_for(uh)
    data = ic.encode(ic.synth_pixels(uh, w, h), fmt)
    dec = ic.decode(data, fmt, w, h)
    return {
        "fmt": fmt,
        "w": w,
        "h": h,
        "n_bytes": len(data),
        "mean_lum": round(float(dec.astype("float64").mean(axis=2).mean()), 4),
        "phash": ic.phash64(dec),
    }


def _thumb_oracle(vid: int) -> dict:
    uh = murmur64(f"img-{vid}")
    w, h = ic.dims_for(uh)
    fmt = ic.fmt_for(uh)
    dec = ic.decode(ic.encode(ic.synth_pixels(uh, w, h), fmt), fmt, w, h)
    thumb = ic.resize_box(dec, 8, 8)
    return {
        "src_w": w,
        "src_h": h,
        "thumb_mean": round(float(thumb.mean()), 4),
        "n_thumb_bytes": 8 * 8 * 3,
    }


def test_image_feature_extract_matches_oracle(spark, sf_dir):
    rows = {
        r["vec_id"]: r.asDict()
        for r in eq.q_image_feature_extract(spark, sf_dir).collect()
    }
    assert rows
    # all three codecs must appear, or the decode path is undertested
    assert {r["fmt"] for r in rows.values()} == {"raw", "png", "qlossy"}
    for vid, got in rows.items():
        exp = _feature_oracle(int(vid))
        for k, v in exp.items():
            assert got[k] == v, (vid, k, got[k], v)


def test_image_resize_thumbs_matches_oracle(spark, sf_dir):
    rows = {
        r["vec_id"]: r.asDict()
        for r in eq.q_image_resize_thumbs(spark, sf_dir).collect()
    }
    assert rows
    for vid, got in rows.items():
        exp = _thumb_oracle(int(vid))
        for k, v in exp.items():
            assert got[k] == v, (vid, k, got[k], v)


def test_thumb_mean_tracks_source_mean():
    """Box-filter resize preserves the global mean up to block-edge
    truncation: for exact-multiple dims it is exact."""
    arr = ic.synth_pixels(murmur64("thumb-exact"), 64, 32)
    thumb = ic.resize_box(arr, 8, 8)
    assert np.isclose(
        thumb.astype("float64").mean(), arr.astype("float64").mean(), atol=1.0
    )
