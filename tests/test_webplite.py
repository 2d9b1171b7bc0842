"""Tests for the from-spec VP8L (lossless WebP) codec.

Oracle strategy (same as the PNG/JPEG/FLAC codecs):
  - lossless round trip: decode(encode(x)) == x bit-exactly for random and
    degenerate images — the encoder and decoder share no state beyond the
    canonical-code builder, so agreement pins both directions;
  - handcrafted streams for every decode feature the minimal encoder never
    emits (LZ77 copies with mapped and plain distances, color cache,
    meta prefix groups, all four transforms incl. bundled palettes),
    with expected pixels computed by independent forward logic in the test;
  - a spot-check of the generated 120-entry distance map against the
    spec's published prefix;
  - skip-gated PIL differentials that activate the moment the wheel lands.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from oco3_data_transformer_spark.operators import webplite as W


# ---------------------------------------------------------------------------
# helpers to build handcrafted VP8L streams
# ---------------------------------------------------------------------------


def _emit_lz_value(bw: W.BitWriter, codes: dict, value: int) -> None:
    """Inverse of webplite._prefix_value: emit the prefix code symbol and
    extra bits that decode back to `value`."""
    if value <= 4:
        sym = value - 1
        code, ln = codes[sym]
        bw.write_code(code, ln)
        return
    for sym in range(4, 40):
        extra = (sym - 2) >> 1
        offset = (2 + (sym & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            code, ln = codes[sym]
            bw.write_code(code, ln)
            bw.write(value - offset - 1, extra)
            return
    raise AssertionError(f"value {value} out of range")


def _lengths(symbols: set[int], alphabet: int) -> list[int]:
    """Balanced code lengths over the used symbols (valid & complete)."""
    syms = sorted(symbols)
    lengths = [0] * alphabet
    if len(syms) == 1:
        lengths[syms[0]] = 1
        return lengths
    if len(syms) == 2:
        for s in syms:
            lengths[s] = 1
        return lengths
    counts = {s: 1 for s in syms}
    for s, ln in W.limited_huffman_lengths(counts, 15).items():
        lengths[s] = ln
    return lengths


class _TreeSet:
    """Write the five prefix codes for one group and keep the code maps."""

    def __init__(self, bw, greens, reds, blues, alphas, dists, cache_size=0):
        self.green = W._write_prefix_code(
            bw, _lengths(greens, 256 + 24 + cache_size)
        )
        self.red = W._write_prefix_code(bw, _lengths(reds or {0}, 256))
        self.blue = W._write_prefix_code(bw, _lengths(blues or {0}, 256))
        self.alpha = W._write_prefix_code(bw, _lengths(alphas or {0}, 256))
        self.dist = W._write_prefix_code(bw, _lengths(dists or {0}, 40))

    def literal(self, bw, a, r, g, b):
        bw.write_code(*self.green[g])
        bw.write_code(*self.red[r])
        bw.write_code(*self.blue[b])
        bw.write_code(*self.alpha[a])

    def copy(self, bw, length, dist_value):
        # length symbol lives at 256+, via the same LZ prefix scheme
        lz = {s - 256: c for s, c in self.green.items() if s >= 256}
        _emit_lz_value(bw, lz, length)
        _emit_lz_value(bw, self.dist, dist_value)

    def cache_ref(self, bw, idx):
        bw.write_code(*self.green[256 + 24 + idx])


def _wrap_vp8l(bw: W.BitWriter) -> bytes:
    stream = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _write_header(bw: W.BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _write_literal_subimage(bw: W.BitWriter, argb_rows: list[tuple]) -> None:
    """Entropy-coded sub-image (transform data / palette / meta image):
    cache bit 0, five trees, literal pixels. argb_rows: [(a, r, g, b), ...]"""
    bw.write(0, 1)  # no color cache
    trees = _TreeSet(
        bw,
        {p[2] for p in argb_rows},
        {p[1] for p in argb_rows},
        {p[3] for p in argb_rows},
        {p[0] for p in argb_rows},
        set(),
    )
    for a, r, g, b in argb_rows:
        trees.literal(bw, a, r, g, b)


# ---------------------------------------------------------------------------
# distance map
# ---------------------------------------------------------------------------


def test_distance_map_matches_spec_prefix():
    want = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    ]
    assert W._DISTANCE_MAP[: len(want)] == want
    assert len(W._DISTANCE_MAP) == 120
    assert len(set(W._DISTANCE_MAP)) == 120


# ---------------------------------------------------------------------------
# round trip (the encoder's oracle)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1, 3), (5, 7, 3), (4, 4, 1), (6, 3, 4), (1, 40, 3), (40, 1, 1)])
def test_round_trip_random(shape):
    rng = np.random.default_rng(hash(shape) % (2**32))
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec = W.webp_decode(W.webp_encode(a))
    c = shape[2]
    back = dec[:, :, :c] if c in (1, 3) else dec
    np.testing.assert_array_equal(back, a)


def test_round_trip_degenerate():
    flat = np.full((9, 9, 3), 200, np.uint8)  # single-symbol channels
    np.testing.assert_array_equal(W.webp_decode(W.webp_encode(flat))[:, :, :3], flat)
    two = np.tile(np.array([[0], [255]], np.uint8), (4, 8))[:, :, None]
    np.testing.assert_array_equal(W.webp_decode(W.webp_encode(two))[:, :, :1], two)
    # alpha round-trips too
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, size=(5, 5, 4), dtype=np.uint8)
    np.testing.assert_array_equal(W.webp_decode(W.webp_encode(rgba)), rgba)


def test_round_trip_fuzz():
    rng = np.random.default_rng(99)
    for _ in range(25):
        h = int(rng.integers(1, 12))
        w = int(rng.integers(1, 12))
        c = int(rng.choice([1, 3, 4]))
        # mix low-cardinality and full-range images
        hi = int(rng.choice([2, 5, 256]))
        a = rng.integers(0, hi, size=(h, w, c)).astype(np.uint8)
        dec = W.webp_decode(W.webp_encode(a))
        back = dec[:, :, :c] if c in (1, 3) else dec
        np.testing.assert_array_equal(back, a)


# ---------------------------------------------------------------------------
# handcrafted streams: LZ77 + color cache + meta groups
# ---------------------------------------------------------------------------


def test_lz77_mapped_and_plain_distances():
    # 4x2: A B [copy len2 dist2 -> A B] / [copy len4, mapped dcode 1 = row
    # above] — checks both the 2D distance map and plain distances
    A = (255, 10, 20, 30)  # (a, r, g, b)
    B = (255, 11, 21, 31)
    bw = W.BitWriter()
    _write_header(bw, 4, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    trees = _TreeSet(
        bw,
        greens={20, 21, 256 + 1, 256 + 3},  # len codes for 2 and 4
        reds={10, 11},
        blues={30, 31},
        alphas={255},
        dists={0, 4},  # value 1 (mapped (0,1)) and value 6 (mapped (2,0))
    )
    trees.literal(bw, *A)
    trees.literal(bw, *B)
    trees.copy(bw, 2, 6)  # mapped: code 6 -> (2, 0) -> dist 2
    trees.copy(bw, 4, 1)  # mapped: code 1 -> (0, 1) -> dist = width = 4
    out = W.webp_decode(_wrap_vp8l(bw))
    wantA = [A[1], A[2], A[3], A[0]]
    wantB = [B[1], B[2], B[3], B[0]]
    want = np.array([[wantA, wantB, wantA, wantB]] * 2, np.uint8)
    np.testing.assert_array_equal(out, want)


def test_lz77_plain_distance_above_120():
    # w=130, h=2: row 0 all literals; row 1 copies row 0 via plain distance
    # 130 (distance code value 130+120=250 -> symbol > 4 with extra bits)
    w = 130
    bw = W.BitWriter()
    _write_header(bw, w, 2)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    trees = _TreeSet(
        bw,
        greens={7, 256 + 14},  # literal green + length symbol for value 130
        reds={1}, blues={2}, alphas={255},
        dists={15},  # distance symbol for value 250 (= 120 + 130)
    )
    for _ in range(w):
        trees.literal(bw, 255, 1, 7, 2)
    trees.copy(bw, w, 120 + w)
    out = W.webp_decode(_wrap_vp8l(bw))
    assert out.shape == (2, w, 4)
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[0, 0], [1, 7, 2, 255])


def test_color_cache():
    # 3 literals then a cache reference to the FIRST pixel
    cache_bits = 4
    A = (255, 1, 2, 3)
    B = (255, 4, 5, 6)
    C = (255, 7, 8, 9)
    argb = lambda p: (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
    idx = lambda p: (0x1E35A7BD * argb(p) & 0xFFFFFFFF) >> (32 - cache_bits)
    assert idx(A) != idx(B) and idx(A) != idx(C)  # A's slot survives
    bw = W.BitWriter()
    _write_header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    trees = _TreeSet(
        bw,
        greens={2, 5, 8, 256 + 24 + idx(A)},
        reds={1, 4, 7}, blues={3, 6, 9}, alphas={255},
        dists=set(),
        cache_size=1 << cache_bits,
    )
    for p in (A, B, C):
        trees.literal(bw, *p)
    trees.cache_ref(bw, idx(A))
    out = W.webp_decode(_wrap_vp8l(bw))
    np.testing.assert_array_equal(out[0, 3], [A[1], A[2], A[3], A[0]])


def test_meta_prefix_groups():
    # width 8, meta bits 2 -> two 4-pixel blocks with different groups;
    # group codes are disjoint so crossed wiring cannot pass
    bw = W.BitWriter()
    _write_header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix image present
    bw.write(2 - 2, 3)  # meta bits = 2
    # meta image 2x1: group ids 0 and 1 ((red<<8)|green)
    _write_literal_subimage(bw, [(255, 0, 0, 0), (255, 0, 1, 0)])
    g0 = _TreeSet(bw, {50}, {51}, {52}, {255}, set())
    g1 = _TreeSet(bw, {60}, {61}, {62}, {254}, set())
    for _ in range(4):
        g0.literal(bw, 255, 51, 50, 52)
    for _ in range(4):
        g1.literal(bw, 254, 61, 60, 62)
    out = W.webp_decode(_wrap_vp8l(bw))
    np.testing.assert_array_equal(out[0, 0], [51, 50, 52, 255])
    np.testing.assert_array_equal(out[0, 7], [61, 60, 62, 254])


# ---------------------------------------------------------------------------
# handcrafted streams: transforms
# ---------------------------------------------------------------------------


def _stream_with_transform(write_transform, residual_pixels, w, h):
    bw = W.BitWriter()
    _write_header(bw, w, h)
    write_transform(bw)
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    trees = _TreeSet(
        bw,
        {p[2] for p in residual_pixels},
        {p[1] for p in residual_pixels},
        {p[3] for p in residual_pixels},
        {p[0] for p in residual_pixels},
        set(),
    )
    for p in residual_pixels:
        trees.literal(bw, *p)
    return _wrap_vp8l(bw)


def test_subtract_green_transform():
    rng = np.random.default_rng(5)
    h, w = 3, 4
    target = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)  # a,r,g,b
    target[:, :, 0] = 255
    # forward: r -= g, b -= g (mod 256)
    res = target.astype(np.int32).copy()
    res[:, :, 1] = (res[:, :, 1] - res[:, :, 2]) & 0xFF
    res[:, :, 3] = (res[:, :, 3] - res[:, :, 2]) & 0xFF
    pixels = [tuple(res[y, x]) for y in range(h) for x in range(w)]

    def tr(bw):
        bw.write(1, 1)
        bw.write(W._T_SUBTRACT_GREEN, 2)

    out = W.webp_decode(_stream_with_transform(tr, pixels, w, h))
    np.testing.assert_array_equal(out, target[:, :, [1, 2, 3, 0]])


def test_color_transform():
    rng = np.random.default_rng(6)
    h, w = 4, 4
    g2r, g2b, r2b = 37, -20 & 0xFF, 5  # stored as uint8, read as int8
    target = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    as_i8 = lambda v: v - 256 if v > 127 else v
    delta = lambda t, c: (as_i8(t) * as_i8(c)) >> 5
    res = target.astype(np.int32).copy()
    for y in range(h):
        for x in range(w):
            a, r, g, b = target[y, x].astype(int)
            res[y, x, 1] = (r - delta(g2r, g)) & 0xFF
            res[y, x, 3] = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
    pixels = [tuple(res[y, x]) for y in range(h) for x in range(w)]

    def tr(bw):
        bw.write(1, 1)
        bw.write(W._T_COLOR, 2)
        bw.write(2, 3)  # size_bits = 4 -> one block for a 4x4 image
        # cte pixel: [a, red=r2b, green=g2b, blue=g2r]
        _write_literal_subimage(bw, [(255, r2b, g2b, g2r)])

    out = W.webp_decode(_stream_with_transform(tr, pixels, w, h))
    np.testing.assert_array_equal(out, target[:, :, [1, 2, 3, 0]])


def _predict_forward(px, y, x, mode, w):
    """Independent forward predictor (spec text), returning the prediction
    for reconstructed image px (int arrays [a, r, g, b])."""
    if x == 0 and y == 0:
        return np.array([0xFF, 0, 0, 0])
    if y == 0:
        return px[0, x - 1]
    if x == 0:
        return px[y - 1, 0]
    L, T, TL = px[y, x - 1], px[y - 1, x], px[y - 1, x - 1]
    TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
    av = lambda p, q: (p + q) >> 1
    if mode == 0:
        return np.array([0xFF, 0, 0, 0])
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return av(av(L, TR), T)
    if mode == 6:
        return av(L, TL)
    if mode == 7:
        return av(L, T)
    if mode == 8:
        return av(TL, T)
    if mode == 9:
        return av(T, TR)
    if mode == 10:
        return av(av(L, TL), av(T, TR))
    if mode == 11:
        return T if int(np.abs(L - TL).sum() - np.abs(T - TL).sum()) <= 0 else L
    if mode == 12:
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:
        a = av(L, T)
        d = a - TL
        half = np.where(d < 0, -((-d) // 2), d // 2)  # trunc toward zero
        return np.clip(a + half, 0, 255)
    raise AssertionError(mode)


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_transform_every_mode(mode):
    rng = np.random.default_rng(100 + mode)
    h, w = 4, 5
    target = rng.integers(0, 256, size=(h, w, 4), dtype=np.int64)
    res = np.zeros_like(target)
    for y in range(h):
        for x in range(w):
            pred = _predict_forward(target, y, x, mode, w)
            res[y, x] = (target[y, x] - pred) & 0xFF
    pixels = [tuple(int(v) for v in res[y, x]) for y in range(h) for x in range(w)]

    def tr(bw):
        bw.write(1, 1)
        bw.write(W._T_PREDICTOR, 2)
        bw.write(3 - 2, 3)  # size_bits = 3 -> 8x8 blocks -> one block
        _write_literal_subimage(bw, [(255, 0, mode, 0)])

    out = W.webp_decode(_stream_with_transform(tr, pixels, w, h))
    np.testing.assert_array_equal(out, target[:, :, [1, 2, 3, 0]].astype(np.uint8))


@pytest.mark.parametrize("ncolors,wbits", [(3, 2), (10, 1), (20, 0), (2, 3)])
def test_color_indexing_transform(ncolors, wbits):
    rng = np.random.default_rng(200 + ncolors)
    h, w = 3, 11
    palette = rng.integers(0, 256, size=(ncolors, 4), dtype=np.uint8)
    palette[:, 0] = 255
    idx = rng.integers(0, ncolors, size=(h, w))
    ppb = 1 << wbits
    bpp = 8 >> wbits
    packed_w = (w + ppb - 1) // ppb
    packed = np.zeros((h, packed_w), np.int64)
    for y in range(h):
        for x in range(w):
            packed[y, x // ppb] |= int(idx[y, x]) << ((x % ppb) * bpp)
    # palette entries are DELTA-coded in the stream
    deltas = np.diff(palette.astype(np.int32), axis=0, prepend=np.zeros((1, 4), np.int32)) & 0xFF
    residuals = [tuple(int(v) for v in packed_row_pixel) for packed_row_pixel in (
        (0xFF, 0, int(packed[y, xp]), 0) for y in range(h) for xp in range(packed_w)
    )]

    bw = W.BitWriter()
    _write_header(bw, w, h)
    bw.write(1, 1)
    bw.write(W._T_COLOR_INDEXING, 2)
    bw.write(ncolors - 1, 8)
    _write_literal_subimage(bw, [tuple(int(v) for v in d) for d in deltas])
    bw.write(0, 1)  # end transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    trees = _TreeSet(
        bw,
        {p[2] for p in residuals},
        {0}, {0}, {255},
        set(),
    )
    for p in residuals:
        trees.literal(bw, *p)
    out = W.webp_decode(_wrap_vp8l(bw))
    want = palette[idx][:, :, [1, 2, 3, 0]]
    np.testing.assert_array_equal(out, want)


# ---------------------------------------------------------------------------
# container / error paths
# ---------------------------------------------------------------------------


def test_rejects_non_webp():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        W.webp_decode(b"\x89PNG" + b"\x00" * 30)


def test_lossy_vp8_raises_not_implemented():
    body = b"\x00" * 10
    riff = b"WEBP" + b"VP8 " + struct.pack("<I", len(body)) + body
    payload = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(NotImplementedError, match="lossy"):
        W.webp_decode(payload)


def test_bad_version_rejected():
    bw = W.BitWriter()
    bw.write(0, 14)
    bw.write(0, 14)
    bw.write(0, 1)
    bw.write(5, 3)  # bad version
    with pytest.raises(ValueError, match="version"):
        W.webp_decode(_wrap_vp8l(bw))


def test_multimodal_routing():
    from oco3_data_transformer_spark.operators.multimodal import (
        decode_image,
        encode_image,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    payload = encode_image(img, codec="webp")
    back = decode_image("webp", payload, 5, 6, 3)
    np.testing.assert_array_equal(back, img)


# ---------------------------------------------------------------------------
# skip-gated library differentials
# ---------------------------------------------------------------------------


def test_pil_decodes_our_encoder():
    Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    got = np.asarray(Image.open(io.BytesIO(W.webp_encode(img))).convert("RGB"))
    np.testing.assert_array_equal(got, img)


def test_we_decode_pil_encoder():
    Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="WEBP", lossless=True)
    got = W.webp_decode(buf.getvalue())[:, :, :3]
    np.testing.assert_array_equal(got, img)
