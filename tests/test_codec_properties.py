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
