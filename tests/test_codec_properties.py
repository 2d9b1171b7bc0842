"""Property-based fuzz for the round-8 from-spec codecs: arbitrary
shapes/chunkings/dtypes round-trip bit-exactly through zarrlite, and
arbitrary PCM signals round-trip losslessly through FLAC and WAV.
These complement the per-feature goldens with shape/edge coverage no
hand-written case list reaches (the same hypothesis discipline as
test_delaunay's kernel invariants)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oco3_data_transformer_spark.operators import flaclite as FL
from oco3_data_transformer_spark.operators import multimodal as M
from oco3_data_transformer_spark.sinks import zarrlite as Z


@settings(max_examples=40, deadline=None)
@given(
    ndim=st.integers(1, 3),
    data=st.data(),
    dtype=st.sampled_from(["<f8", "<f4", "<i4", "<i8", "|u1"]),
    level=st.sampled_from([None, 1, 9]),
)
def test_zarr_array_roundtrip_property(tmp_path_factory, ndim, data, dtype, level):
    shape = tuple(data.draw(st.integers(1, 9)) for _ in range(ndim))
    chunks = tuple(data.draw(st.integers(1, s + 2)) for s in shape)
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    if dtype.endswith("f8") or dtype.endswith("f4"):
        arr = rng.normal(size=shape).astype(dtype)
        # sprinkle NaN (must survive: fill is also NaN)
        mask = rng.random(shape) < 0.2
        arr[mask] = np.nan
    else:
        arr = rng.integers(0, 200, size=shape).astype(dtype)
    root = str(tmp_path_factory.mktemp("z"))
    Z.write_array(root, "v", arr, chunks, fill_value=np.nan if "f" in dtype else 0,
                  level=level)
    got, _ = Z.read_array(root, "v")
    assert got.dtype == arr.dtype and got.shape == arr.shape
    if "f" in dtype:
        assert np.array_equal(got, arr, equal_nan=True)
    else:
        assert np.array_equal(got, arr)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 3000),
    ch=st.integers(1, 3),
    bps=st.sampled_from([8, 16, 24]),
    style=st.sampled_from(["walk", "noise", "const", "extreme"]),
    seed=st.integers(0, 2**32 - 1),
)
def test_flac_roundtrip_property(n, ch, bps, style, seed):
    rng = np.random.default_rng(seed)
    lim = 1 << (bps - 1)
    if style == "walk":
        x = np.clip(np.cumsum(rng.integers(-99, 100, size=(n, ch)), axis=0),
                    -lim, lim - 1)
    elif style == "noise":
        x = rng.integers(-lim, lim, size=(n, ch))
    elif style == "const":
        x = np.full((n, ch), int(rng.integers(-lim, lim)))
    else:  # extreme: full-scale alternation stresses rice quotients
        x = (np.tile([[lim - 1], [-lim]], (n // 2 + 1, ch)))[:n]
    dec, rate, b = FL.flac_decode(FL.flac_encode(x, 22050, bps=bps))
    assert rate == 22050 and b == bps
    assert np.array_equal(dec, x.astype(np.int64))


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 2000),
    ch=st.integers(1, 2),
    bits=st.sampled_from([8, 16, 24, 32, -32]),
    seed=st.integers(0, 2**32 - 1),
)
def test_wav_roundtrip_property(n, ch, bits, seed):
    rng = np.random.default_rng(seed)
    x = np.clip(rng.normal(0, 0.4, size=(n, ch)), -1, 1)
    got, rate = M.wav_decode(M.wav_encode(x, 48000, bits=bits))
    assert rate == 48000 and got.shape == (n, ch)
    tol = {8: 1 / 128, 16: 1 / 32768, 24: 1e-6, 32: 1e-9, -32: 1e-7}[bits]
    assert np.abs(got - x).max() <= tol


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([1, 3, 4]),
    cardinality=st.sampled_from([2, 7, 256]),
    seed=st.integers(0, 2**32 - 1),
)
def test_webp_lossless_roundtrip_property(h, w, ch, cardinality, seed):
    """VP8L is lossless: decode(encode(x)) == x bit-exactly for any shape,
    channel count, and value cardinality (low-cardinality images exercise
    the simple-code and degenerate code-length-code paths)."""
    from oco3_data_transformer_spark.operators import webplite as W

    rng = np.random.default_rng(seed)
    a = rng.integers(0, cardinality, size=(h, w, ch)).astype(np.uint8)
    dec = W.webp_decode(W.webp_encode(a))
    back = dec[:, :, :ch] if ch in (1, 3) else dec
    assert np.array_equal(back, a)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ch=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**32 - 1),
)
def test_progressive_equals_baseline_property(h, w, ch, seed):
    """Any image shape: progressive and baseline scan scripts encode the
    same quantized coefficients, so the decodes must be bit-identical."""
    from oco3_data_transformer_spark.operators import jpeglite as J

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, 3)
    a = rng.integers(0, 256, size=shape).astype(np.uint8)
    base = J.jpeg_decode(J.jpeg_encode(a, quality=85))
    prog = J.jpeg_decode(J.jpeg_encode_progressive(a, quality=85))
    assert np.array_equal(base, prog)


def test_zarr_fill_semantics_property():
    """Missing chunks read as fill for every dtype family."""
    for dtype, fill in [("<f8", np.nan), ("<i4", 0), ("|u1", 0)]:
        import tempfile

        root = tempfile.mkdtemp(prefix="zfill_")
        arr = np.ones((6, 6), dtype=dtype)
        Z.write_array(root, "v", arr, (3, 3), fill_value=fill)
        import os

        os.remove(os.path.join(root, "v", "1.1"))
        got, _ = Z.read_array(root, "v")
        if "f" in dtype:
            assert np.all(np.isnan(got[3:, 3:]))
        else:
            assert np.all(got[3:, 3:] == 0)
        assert np.all(got[:3, :3] == 1)
