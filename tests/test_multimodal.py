"""Semantic tests for multimodal plumbing beyond oracle parity."""

from __future__ import annotations

from full_stack_big_data_spark.operators.multimodal import FRAME_BYTES, frame_rows


def test_frame_rows_empty_and_short_payloads(spark):
    """Empty text must yield ZERO frames (Spark's sequence(1, 0) is the
    descending [1, 0] — unguarded it fabricates two frames; the DuckDB
    oracle's range(1, 1) yields none). Sub-stride text yields exactly
    one frame."""
    d = spark.createDataFrame(
        [(1, ""), (2, "x"), (3, "y" * FRAME_BYTES), (4, "z" * (FRAME_BYTES + 1))],
        "doc_id long, text string")
    rows = frame_rows(d).collect()
    per_doc = {}
    for r in rows:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    assert 1 not in per_doc          # empty payload: no frames at all
    assert per_doc[2] == 1
    assert per_doc[3] == 1
    assert per_doc[4] == 2
    assert all(r.frame_idx >= 0 for r in rows)


def test_bmp_codec_round_trip_and_format_sensitivity():
    """The BMP decoder must recover geometry + weighted checksum from
    the BYTES alone, and the checksum must be sensitive to the storage
    rules it claims to invert (row order, padding) — a decoder that
    merely summed the pixel multiset would pass a naive round trip."""
    import struct

    from full_stack_big_data_spark.operators.multimodal import (
        _bmp_geometry, decode_bmp, encode_bmp)

    for text in (b"", b"a", b"hello world", bytes(range(256)) * 3):
        buf = encode_bmp(text)
        w, h = _bmp_geometry(len(text))
        assert buf[:2] == b"BM"
        assert struct.unpack_from("<I", buf, 10)[0] == 54
        dw, dh, bpp, checksum = decode_bmp(buf)
        assert (dw, dh, bpp) == (w, h, 24)
        # independent recomputation of the expected checksum from source
        exp = 0
        for i in range(w * h):
            b = text[i % len(text)] if text else 0
            exp += (b + 2 * (b * 2 % 256) + 3 * (b * 7 % 256)) * (1 + i % 31)
        assert checksum == exp % 99991

    # corrupting ROW ORDER must change the weighted checksum: swap the
    # first two stored pixel rows of a non-uniform image
    buf = bytearray(encode_bmp(b"hello world, rows differ here"))
    w, h = _bmp_geometry(29)
    rowsize = (w * 3 + 3) // 4 * 4
    r0 = bytes(buf[54:54 + rowsize])
    r1 = bytes(buf[54 + rowsize:54 + 2 * rowsize])
    assert r0 != r1, "fixture rows must differ for the swap to mean anything"
    buf[54:54 + rowsize], buf[54 + rowsize:54 + 2 * rowsize] = r1, r0
    assert decode_bmp(bytes(buf))[3] != decode_bmp(encode_bmp(b"hello world, rows differ here"))[3]

    # unsupported variants must raise, not guess
    import pytest as _pytest
    bad = bytearray(encode_bmp(b"x"))
    struct.pack_into("<H", bad, 28, 8)          # 8-bit palette BMP
    with _pytest.raises(ValueError):
        decode_bmp(bytes(bad))
    with _pytest.raises(ValueError):
        decode_bmp(b"PNG not a bmp")


def test_decode_payload_sniffs_bmp_magic():
    """r6 verdict item 3: the BM magic must route to the REAL header
    parse (true geometry, mode BGR24); a payload that merely starts
    with 'BM' but fails BMP validation (ASCII text — its compression
    bytes are all >= 0x20) must fall through to the deterministic fake,
    and so must a truncated header."""
    from full_stack_big_data_spark.operators.multimodal import (
        _bmp_geometry, _decode_payload_fake, decode_payload, encode_bmp)

    data = b"hello multimodal world, this is not an image"
    bmp = encode_bmp(data)
    w, h = _bmp_geometry(len(data))
    assert decode_payload(bmp) == (w, h, "BGR24")

    spoofed = b"BMost people would call this text, not a bitmap header"
    assert decode_payload(spoofed) == _decode_payload_fake(spoofed)
    truncated = b"BM\x01\x02"
    assert decode_payload(truncated) == _decode_payload_fake(truncated)


def _phash_expected(text: bytes) -> int:
    """Independent pure-Python dHash recompute straight from the SOURCE
    bytes — never touches the BMP container, so agreement with
    phash_bmp(encode_bmp(text)) proves the numpy path truly inverted
    the container (header, bottom-up rows, padding) before hashing."""
    n = len(text)
    w, h = n % 13 + 4, n % 7 + 3

    def intensity(r: int, c: int) -> int:
        b = text[(r * w + c) % n]
        return b + 2 * ((b * 2) % 256) + 3 * ((b * 7) % 256)

    out = 0
    cols = [((cc * w) // 11 + cc) % w for cc in range(11)]
    for rr in range(6):
        r = ((rr * h) // 6 + rr) % h
        for cc in range(10):
            if intensity(r, cols[cc]) < intensity(r, cols[cc + 1]):
                out |= 1 << (rr * 10 + cc)
    return out


def test_phash_bmp_matches_independent_recompute():
    from full_stack_big_data_spark.operators.multimodal import (
        encode_bmp, phash_bmp)

    for text in (b"a", b"hello world", b"the quick brown fox jumps",
                 bytes(range(256)) * 2, b"x" * 97):
        assert phash_bmp(encode_bmp(text)) == _phash_expected(text), text
    # near-identical payloads of equal length: tiny hamming (dHash's
    # point); here a 1-byte edit leaves the sampled gradient grid intact
    a = phash_bmp(encode_bmp(b"hello world this is a test"))
    b = phash_bmp(encode_bmp(b"hello world this is a tesu"))
    assert bin(a ^ b).count("1") <= 4


def test_phash_index_append_compaction_and_row_equivalence(spark):
    """Signature-index maintenance (r9 verdict item 2): appending a
    dump's 8-byte rows beside the base generation must leave more files
    than the compaction target, compaction must fold the index to at
    most PHASH_INDEX_COMPACT_FILES, and the appended-then-compacted
    index must carry EXACTLY the full corpus's signature rows (so the
    banded self-join served from it answers like a from-scratch
    rebuild — the registered entry's oracle proves the serve side)."""
    import glob

    from pyspark.sql import functions as F

    from full_stack_big_data_spark.engine.scratch import scratch_dir
    from full_stack_big_data_spark.operators.multimodal import (
        PHASH_INCR_MOD, PHASH_INCR_REM, PHASH_INDEX_COMPACT_FILES,
        _phash_signatures, phash_index_compact)

    sf = "/root/testdata/sf0.001"
    is_new = F.col("doc_id") % PHASH_INCR_MOD == PHASH_INCR_REM
    path = scratch_dir("fsbd_test_phash_append_")
    _phash_signatures(spark, sf, pred=~is_new) \
        .write.mode("overwrite").parquet(path)
    # five mini-dumps appended over time — each drops its own file set,
    # so the generation dir grows per dump (the accumulation compaction
    # exists to undo)
    n_dumps = 5
    for k in range(n_dumps):
        _phash_signatures(spark, sf,
                          pred=is_new & (F.col("doc_id") % n_dumps == k)) \
            .write.mode("append").parquet(path)
    gen2 = scratch_dir("fsbd_test_phash_append_gen2_")
    phash_index_compact(spark, path, gen2)

    g1 = glob.glob(f"{path}/*.parquet")
    g2 = glob.glob(f"{gen2}/*.parquet")
    assert len(g1) >= n_dumps + 1, len(g1)   # at least one file per write
    assert len(g2) <= PHASH_INDEX_COMPACT_FILES < len(g1), (len(g1), len(g2))

    full = sorted(map(tuple, _phash_signatures(spark, sf).collect()))
    assert sorted(map(tuple, spark.read.parquet(gen2).collect())) == full


def test_phash_bmp_rejects_one_pixel_wide_images():
    """A 1-px-wide BMP has no horizontal gradient — every comparison
    would be a self-comparison and the hash degenerates to 0, silently
    colliding ALL such images (r9 ADVICE). phash_bmp rejects w < 2 with
    the decoder's strictness instead; engine geometry (w >= 4) never
    constructs one, so this needs a hand-patched container."""
    import struct

    import pytest

    from full_stack_big_data_spark.operators.multimodal import (
        _bmp_pixel_array, encode_bmp, phash_bmp)

    buf = bytearray(encode_bmp(b"hello world this is a test"))
    struct.pack_into("<i", buf, 18, 1)  # patch header width to 1 px
    w, _h, _px = _bmp_pixel_array(bytes(buf))
    assert w == 1  # still a valid 24-bit BMP for the decoder
    with pytest.raises(ValueError, match="width >= 2"):
        phash_bmp(bytes(buf))


def test_phash_band_geometries_agree(spark):
    """Fixture (10 bands x 6 bits) and scaled (5 bands x 12 bits) layouts
    must return the identical pair set — both are pigeonhole-lossless
    for hamming <= 4, so any divergence is a banding bug."""
    from full_stack_big_data_spark.operators.registry import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, reg["multimodal_phash_neardup"]
                   .builder(spark, sf).collect()))
    b = sorted(map(tuple, reg["multimodal_phash_neardup_scaled"]
                   .builder(spark, sf).collect()))
    assert a == b
    assert len(a) > 0


def test_phash_candidate_sensor_contrast(spark):
    """The geometry story in one number, phash edition: at the same
    corpus the scaled layout (4096 buckets/band, 5 bands) must produce
    far fewer raw bucket collisions than the fixture (64 buckets/band,
    10 bands)."""
    from full_stack_big_data_spark.functions import observability as obs
    from full_stack_big_data_spark.operators.registry import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    obs.enable()
    try:
        for name in ("multimodal_phash_neardup", "multimodal_phash_neardup_scaled"):
            reg[name].builder(spark, sf).write.format("noop") \
                .mode("overwrite").save()
        counts = obs.candidate_counts()
    finally:
        obs.disable()
    assert counts["phash_bits60_band12"] < counts["phash_bits60_band6"], counts


def test_png_codec_cross_codec_parity_and_filters():
    """The r13 PNG codec's three load-bearing claims: (1) CROSS-CODEC
    parity — decode_png(encode_png(t)) equals decode_bmp(encode_bmp(t))
    for the same source bytes (two disjoint container formats and two
    disjoint decoders inverting to the same pixels), (2) the corpus's
    deterministic filter mix really exercises ALL FIVE scanline filter
    types (a decoder that only handled None/Up would still round-trip a
    lazy encoder), (3) integrity is enforced — a flipped byte fails the
    CRC walk, an unsupported variant raises rather than guesses."""
    import struct
    import zlib

    import pytest as _pytest
    from full_stack_big_data_spark.operators.multimodal import (
        _bmp_geometry, _PNG_SIG, decode_bmp, decode_png, encode_bmp,
        encode_png)

    seen_filters: set[int] = set()
    for n in (0, 1, 7, 29, 64, 131, 256, 313):
        text = bytes((i * 37 + n) % 256 for i in range(n))
        png = encode_png(text)
        assert png[:8] == _PNG_SIG
        assert decode_png(png) == decode_bmp(encode_bmp(text))
        # collect the filter bytes actually stored
        pos, idat = 8, b""
        while pos + 8 <= len(png):
            (length,) = struct.unpack_from(">I", png, pos)
            if png[pos + 4:pos + 8] == b"IDAT":
                idat += png[pos + 8:pos + 8 + length]
            pos += 12 + length
        w, h = _bmp_geometry(n)
        stride = w * 3
        flat = zlib.decompress(idat)
        seen_filters |= {flat[r * (1 + stride)] for r in range(h)}
    assert seen_filters == {0, 1, 2, 3, 4}, seen_filters

    # integrity: one flipped byte anywhere in a chunk fails its CRC
    buf = bytearray(encode_png(b"integrity matters"))
    buf[30] ^= 0x40
    with _pytest.raises(ValueError):
        decode_png(bytes(buf))
    # unsupported variant (16-bit depth) raises, never guesses
    good = encode_png(b"depth check")
    hdr = bytearray(good[8:8 + 25])            # IHDR chunk incl len/type/crc
    hdr[4 + 4 + 8] = 16                        # bit depth field
    crc = zlib.crc32(bytes(hdr[4:4 + 4 + 13])) & 0xFFFFFFFF
    struct.pack_into(">I", hdr, 21, crc)       # re-CRC so depth gate trips
    with _pytest.raises(ValueError):
        decode_png(bytes(good[:8] + bytes(hdr) + good[33:]))


def test_decode_payload_sniffs_png_signature():
    """The r13 sniff route: the 8-byte PNG signature goes to the REAL
    inflate+unfilter decode (true geometry, mode RGB24, distinct from
    BMP's BGR24); a corrupt PNG falls through to the fake exactly like
    a spoofed BMP magic."""
    from full_stack_big_data_spark.operators.multimodal import (
        _bmp_geometry, _decode_payload_fake, _PNG_SIG, decode_payload,
        encode_png)

    data = b"a png is just zlib wearing a chunked coat"
    png = encode_png(data)
    w, h = _bmp_geometry(len(data))
    assert decode_payload(png) == (w, h, "RGB24")

    corrupt = bytearray(png)
    corrupt[20] ^= 0xFF                        # breaks the IHDR CRC
    assert decode_payload(bytes(corrupt)) \
        == _decode_payload_fake(bytes(corrupt))
    truncated = _PNG_SIG + b"\x00\x01"
    assert decode_payload(truncated) == _decode_payload_fake(truncated)


def test_decode_payload_sniffs_jpeg_soi():
    """An 0xFFD8 SOI routes to the real baseline JPEG decoder (r14,
    mode YCC24 — JPEG's native color space); a payload that merely
    starts with SOI but fails the marker walk falls through to the
    fake, exactly like the spoofed-BM and corrupt-PNG cases."""
    from full_stack_big_data_spark.operators.jpeg import encode_jpeg
    from full_stack_big_data_spark.operators.multimodal import (
        _bmp_geometry, _decode_payload_fake, decode_payload)

    data = b"jpeg sniff corpus payload"
    w, h = _bmp_geometry(len(data))
    jpg = encode_jpeg(data)
    assert decode_payload(jpg) == (w, h, "YCC24")
    spoofed = b"\xff\xd8not actually a jpeg stream"
    assert decode_payload(spoofed) == _decode_payload_fake(spoofed)
    truncated = jpg[:24]
    assert decode_payload(truncated) == _decode_payload_fake(truncated)
