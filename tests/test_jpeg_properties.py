"""Property-based check for the progressive JPEG decoder: for ANY
small image and ANY legal scan script, decoding the progressive
encode must yield bit-identical pixels to decoding a baseline encode
of the same quantized coefficients. The example tests pin specific
scripts; this pins the algebra across random spectral splits and
successive-approximation depths (no Spark involved — pure codec)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from test_operators import _encode_jpeg, _encode_jpeg_progressive


def _decode(content):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.multimodal import (
        _decode_jpeg,
    )

    return _decode_jpeg(content, feat_dim=8)


@st.composite
def _image(draw):
    h = draw(st.integers(4, 24))
    w = draw(st.integers(4, 24))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.integers(0, 2))
    if kind == 0:  # noise (dense AC)
        img = rng.integers(0, 256, size=(h, w)).astype(np.float64)
    elif kind == 1:  # flat + patch (EOB-run heavy)
        img = np.full((h, w), float(rng.integers(0, 256)))
        ph, pw = max(1, h // 3), max(1, w // 3)
        img[:ph, :pw] = rng.integers(0, 256, size=(ph, pw))
    else:  # gradient (low-frequency AC)
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(
            float(rng.integers(0, 128))
            + float(rng.integers(1, 8)) * xx
            + float(rng.integers(1, 8)) * yy,
            0,
            255,
        ).astype(np.float64)
    return img


@st.composite
def _scan_script(draw):
    """A legal single-component progressive scan script: DC first
    (+ optional refinements), AC spectral bands in order per
    approximation level, refinements descending to Al=0."""
    dc_al = draw(st.integers(0, 2))
    ac_al = draw(st.integers(0, 2))
    # split 1..63 into 1-3 contiguous bands
    cuts = sorted(draw(st.sets(st.integers(2, 62), max_size=2)))
    bands = []
    lo = 1
    for c in cuts:
        bands.append((lo, c - 1))
        lo = c
    bands.append((lo, 63))
    scans = [([0], 0, 0, 0, dc_al)]
    for lvl in range(dc_al, 0, -1):
        scans.append(([0], 0, 0, lvl, lvl - 1))  # DC refinements
    for ss, se in bands:
        scans.append(([0], ss, se, 0, ac_al))  # AC first passes
    for lvl in range(ac_al, 0, -1):
        for ss, se in bands:
            scans.append(([0], ss, se, lvl, lvl - 1))  # AC refinements
    return scans


@settings(max_examples=25, deadline=None)
@given(img=_image(), scans=_scan_script(), quant=st.sampled_from([8, 16, 40]))
def test_progressive_equals_baseline_for_any_script(img, scans, quant):
    base = _decode(_encode_jpeg([img], [1], [1], quant=quant))
    prog = _decode(
        _encode_jpeg_progressive([img], [1], [1], quant=quant, scans=scans)
    )
    assert base is not None and prog is not None
    assert (prog["width"], prog["height"]) == (base["width"], base["height"])
    assert prog["features"] == base["features"], (img.shape, scans, quant)
