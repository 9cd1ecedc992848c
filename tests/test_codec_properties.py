"""Hypothesis property tests for the r13 pure kernels — the codec and
bound math that Spark-side tests exercise at fixture geometry, swept
here across randomized inputs (no SparkSession: every subject is pure
Python/numpy, so hundreds of examples cost milliseconds).

Subjects:
- the PNG codec (encode_png/decode_png) against the BMP codec on the
  SAME source bytes — the cross-codec equality that makes the two
  decoders mutually proving;
- IDAT corruption → hard failure (the CRC walk, property-swept over
  flip positions);
- the Paeth predictor's spec conformance (PNG spec §9.4: result is
  one of {a, b, c}, chosen by minimal |p−·| with the a ≤ b ≤ c
  tie-breaking order);
- the quantized-screen upper bound (similarity.quantized_vec_cols'
  Cauchy–Schwarz argument) replayed in exact float arithmetic over
  random vector pairs: the bound must dominate exact cosine whenever
  the denominator is positive — for ANY vectors, not just the
  fixture's.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

from hypothesis import given, settings, strategies as st

from full_stack_big_data_spark.operators.multimodal import (
    _bmp_geometry, _paeth, _PNG_SIG, decode_bmp, decode_png, encode_bmp,
    encode_png)

_payloads = st.binary(min_size=0, max_size=600)


@settings(max_examples=150, deadline=None)
@given(_payloads)
def test_png_equals_bmp_for_any_payload(data):
    """decode_png∘encode_png ≡ decode_bmp∘encode_bmp: two disjoint
    container formats and decoders must agree on (w, h, bpp, weighted
    checksum) for every payload."""
    assert decode_png(encode_png(data)) == decode_bmp(encode_bmp(data))


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=3, max_size=200), st.data())
def test_png_idat_corruption_always_detected(data, draw):
    """Flipping any single byte of the IDAT chunk's DATA must fail the
    CRC walk — silent pixel corruption is not an outcome this decoder
    can produce."""
    buf = bytearray(encode_png(data))
    # locate the IDAT data region
    pos = 8
    while True:
        (length,) = struct.unpack_from(">I", bytes(buf), pos)
        ctype = bytes(buf[pos + 4:pos + 8])
        if ctype == b"IDAT":
            start, end = pos + 8, pos + 8 + length
            break
        pos += 12 + length
    i = draw.draw(st.integers(min_value=start, max_value=end - 1))
    buf[i] ^= draw.draw(st.integers(min_value=1, max_value=255))
    try:
        decode_png(bytes(buf))
    except ValueError:
        return
    raise AssertionError("corrupted IDAT decoded without error")


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255))
def test_paeth_spec_conformance(a, b, c):
    """PNG spec §9.4: the predictor returns the neighbor (left, up,
    up-left) nearest to p = a + b − c, preferring a, then b, then c on
    ties — re-derived here independently of the implementation."""
    p = a + b - c
    got = _paeth(a, b, c)
    dists = {v: abs(p - v) for v in (a, b, c)}
    assert got in (a, b, c)
    assert dists[got] == min(dists.values())
    if dists[a] <= dists[b] and dists[a] <= dists[c]:
        assert got == a
    elif dists[b] <= dists[c]:
        assert got == b
    else:
        assert got == c


_vec = st.lists(st.floats(min_value=-1e4, max_value=1e4,
                          allow_nan=False, allow_infinity=False,
                          width=32),
                min_size=2, max_size=64)


def _round_half_up(x: float) -> float:
    return math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)


@settings(max_examples=300, deadline=None)
@given(_vec, st.data())
def test_quant_screen_bound_dominates_exact_cosine(v, draw):
    """The screen's no-false-drops inequality, swept over random
    geometry: with s = max|v_i|/32767, q_i = round(v_i/s), ũ = s·q and
    r = (s/2)√d(1+1e-6), for any query x with cos(x, v) > 0 either
    |ũ| ≤ r (bypass) or (x·ũ + |x|r)/(|x|(|ũ|−r)) ≥ cos(x, v) — the
    exact argument in similarity.quantized_vec_cols, replayed in plain
    floats so hypothesis can hunt the boundary the fixture never
    visits. The POSITIVITY restriction is load-bearing, not cosmetic:
    hypothesis itself falsified the unrestricted form (with both sides
    negative, dividing by the smaller denominator pushes the bound
    BELOW the exact value — e.g. v ≈ antiparallel near-zero vectors).
    The screen is safe because it only ever decides at θ = 0.40 > 0:
    an exact-passing pair has x·v ≥ θ|x||v| > 0, the regime where the
    domination below holds — exactly the docstring's caveat "for any
    θ > 0"."""
    d = len(v)
    x = draw.draw(st.lists(st.floats(min_value=-1e4, max_value=1e4,
                                     allow_nan=False,
                                     allow_infinity=False, width=32),
                           min_size=d, max_size=d))
    amax = max(abs(c) for c in v)
    nv = math.sqrt(sum(c * c for c in v))
    nx = math.sqrt(sum(c * c for c in x))
    if nv == 0 or nx == 0:
        return  # exact cosine undefined (NULL both sides) — no claim
    # The scale is stored as FLOAT32 and — since the r13 ADVICE fix —
    # quantized-against as float32 too. Replaying the cast here is the
    # point: the r13 version of this test swept pure doubles and so
    # could never catch the round-against-double / reconstruct-against-
    # float mismatch (worst measured error/bound 1.003). If s underflows
    # to 0.0f the engine emits all-zero codes, which the degenerate
    # bypass (nu <= r, both 0) keeps safe — mirrored by the s > 0 guard.
    s = float(np.float32(amax / 32767.0))
    if s == 0:
        return  # float32 underflow → all-zero codes → bypass tier
    q = [_round_half_up(c / s) for c in v]
    u = [s * c for c in q]
    nu = math.sqrt(sum(c * c for c in u))
    r = 0.5 * (1 + 1e-6) * s * math.sqrt(d)
    exact = sum(a * b for a, b in zip(x, v)) / (nx * nv)
    if exact <= 0:
        return  # no positive threshold can pass this pair — no claim
    if nu <= r:
        return  # degenerate → bypass keeps the pair, trivially safe
    ub = (sum(a * b for a, b in zip(x, u)) + nx * r) / (nx * (nu - r))
    assert ub >= exact - 1e-9, (ub, exact, s, nu, r)


# --- JPEG (r14): the lossy codec's exact and bounded layers ---------------

from full_stack_big_data_spark.operators.jpeg import (  # noqa: E402
    _source_pixels, _ycbcr_planes, coef_checksum, decode_jpeg, encode_jpeg,
    jpeg_decode_coefficients, jpeg_pixel_array, jpeg_plan_coefficients)


@settings(max_examples=120, deadline=None)
@given(_payloads)
def test_jpeg_entropy_layer_roundtrips_exactly(data):
    """The lossless half of JPEG, proven lossless: decode∘encode must
    recover the encoder's quantized coefficients BIT-EXACTLY for any
    payload — markers, file-defined Huffman tables, zigzag, DC
    prediction, ZRL/EOB runs and byte stuffing all in the loop."""
    w, h, bw, bh, coefs = jpeg_plan_coefficients(data)
    dw, dh, dbw, dbh, dcoefs, _q = jpeg_decode_coefficients(
        encode_jpeg(data))
    assert (dw, dh, dbw, dbh) == (w, h, bw, bh)
    for comp in range(3):
        for bi in range(bw * bh):
            assert (dcoefs[comp][bi] == coefs[comp][bi]).all()


@settings(max_examples=120, deadline=None)
@given(_payloads)
def test_jpeg_matches_bmp_geometry_for_any_payload(data):
    """The JPEG surface agrees with the BMP decoder on geometry for
    every payload (the shared _bmp_geometry contract), and its
    coefficient checksum equals the plan's."""
    w, h, bpp, _ck = decode_bmp(encode_bmp(data))
    jw, jh, nb, jck = decode_jpeg(encode_jpeg(data))
    assert (jw, jh) == (w, h)
    assert nb == 3 * ((w + 7) // 8) * ((h + 7) // 8)
    assert jck == coef_checksum(jpeg_plan_coefficients(data)[4])


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=200), st.data())
def test_jpeg_scan_corruption_never_silently_misdecodes(data, draw):
    """Flipping one byte inside the entropy-coded scan must either
    raise (invalid code / marker / truncation) or change the decoded
    COEFFICIENT STREAM — a flip that decodes cleanly to the original
    coefficients would mean the entropy layer silently absorbed
    corruption. The assertion is on the coefficients themselves, not
    the mod-99991 checksum: the checksum is a bounded oracle surface
    and, like any hash, collides at ~1e-5 per corrupted stream
    (hypothesis found such a collision — coefficients differed, both
    summed to 91 mod 99991 — which is the checksum working as
    designed, not the decoder misdecoding). Bits after the last MCU's
    final code are padding — flips there decode identically, so the
    draw targets all but the final scan byte."""
    buf = bytearray(encode_jpeg(data))
    sos = bytes(buf).find(b"\xff\xda")
    (seglen,) = struct.unpack_from(">H", bytes(buf), sos + 2)
    start, end = sos + 2 + seglen, len(buf) - 2
    if end - start < 2:
        return
    orig = jpeg_decode_coefficients(bytes(buf))[4]
    i = draw.draw(st.integers(min_value=start, max_value=end - 2))
    flip = draw.draw(st.integers(min_value=1, max_value=255))
    buf[i] ^= flip
    try:
        got = jpeg_decode_coefficients(bytes(buf))[4]
    except ValueError:
        return
    coefs_equal = len(got) == len(orig) and all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(orig, got))
    assert not coefs_equal or (buf[i] ^ flip) == buf[i]


@settings(max_examples=100, deadline=None)
@given(_payloads)
def test_jpeg_pixel_error_is_bounded(data):
    """The lossy pixel path's measured quality pin: constant-content
    payloads (all energy in the DC coefficients) stay within the
    DC-quantization residual — ≤3, measured exhaustively over all 256
    byte values (luma step 16 and chroma step 17 leave ±1–2 per
    channel, amplified ≤1.772× by the color transform) — and
    arbitrary payloads — pseudo-random noise, JPEG's adversarial
    worst case under Annex K's up-to-121-step high-frequency
    quantization — stay within the measured transform-energy
    ceiling."""
    buf = encode_jpeg(data)
    _w, _h, px = jpeg_pixel_array(buf)
    _sw, _sh, spx = _source_pixels(data)
    err = np.abs(px.astype(np.int64) - spx.astype(np.int64)).max()
    if len(set(data)) <= 1:
        assert err <= 3, err
    else:
        # measured ceiling on the fixture's content class (max observed
        # 193 across 200+ seeds); 255 would be vacuous, 224 is not
        assert err <= 224, err


def test_jpeg_constant_images_within_dc_residual():
    """Exhaustive flat-image pin: every constant byte value decodes
    within the ≤3 DC-quantization residual, and the specific values
    whose YCbCr channels land on quantizer multiples reconstruct
    exactly."""
    for v in range(256):
        data = bytes([v]) * 96
        _w, _h, px = jpeg_pixel_array(encode_jpeg(data))
        _sw, _sh, spx = _source_pixels(data)
        err = int(np.abs(px.astype(np.int64)
                         - spx.astype(np.int64)).max())
        assert err <= 3, (v, err)
        if v == 0:   # black: every channel on a quantizer multiple
            assert err == 0, (v, err)


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255))
def test_jpeg_ycbcr_fixed_point_stays_in_range(r, g, b):
    """The integer YCbCr transform must land every channel in [0, 255]
    after the documented clamp (the 128/256 = 0.5 coefficient can
    reach exactly 256 pre-clamp) — the oracle replays the same clamp,
    so this pins the shared numeric contract."""
    px = np.array([[[r, g, b]]], dtype=np.uint8)
    planes = _ycbcr_planes(px)
    assert planes.min() >= 0 and planes.max() <= 255
