"""Baseline JPEG codec conformance: hand-authored spec fixture,
encode/decode round trips across 4:4:4 / 4:2:0 / restart markers,
exactness of constant blocks at quality 100, refusal of unsupported
SOF types, and the sniff_decode / multimodal integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from python_minerva_etl_spark.ext.jpeg import (HT_AC_LUM, HT_DC_LUM,
                                               jpeg_decode, jpeg_encode,
                                               jpeg_stats)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _foreign_flat_jpeg(value: int = 130) -> bytes:
    """A minimal baseline JPEG authored BYTE-BY-BYTE from ITU-T T.81
    (not via our encoder): one 8x8 greyscale block, all-ones quant
    table, Annex K Huffman tables, flat value ``value``.

    The entropy bits are hand-derived: DC diff = 8*(value-128) = 16
    -> category 5 (canonical DC-lum code '110'), magnitude '10000',
    then EOB (canonical AC-lum code '1010'), padded with 1s:
    110 10000 1010 1111 -> 0xD0 0xAF."""
    assert value == 130, "entropy bits below are derived for 130"
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1)
                + bytes([1, 0x11, 0]))
    bits, vals = HT_DC_LUM
    out += _seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    bits, vals = HT_AC_LUM
    out += _seg(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))
    out += _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    out += b"\xd0\xaf"
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_foreign_hand_authored_bytes():
    w, h, c, pix = jpeg_decode(_foreign_flat_jpeg())
    assert (w, h, c) == (8, 8, 1)
    assert set(pix) == {130}


def test_constant_tiles_quality100_decode_exactly():
    """At quality 100 the quant tables are all ones, and a constant
    8x8 block has a single integer DC coefficient — baseline JPEG is
    EXACT on such images (this is what the mm_decode_jpeg oracle
    relies on); restart markers must not disturb it."""
    for doc_id in (0, 7, 41, 255, 1001):
        tiles = [(doc_id * 31 + k * 53) % 256 for k in range(4)]
        img = np.zeros((16, 16), dtype=np.uint8)
        img[:8, :8], img[:8, 8:] = tiles[0], tiles[1]
        img[8:, :8], img[8:, 8:] = tiles[2], tiles[3]
        enc = jpeg_encode(img.tobytes(), 16, 16, 1, quality=100,
                          restart_interval=2)
        assert b"\xff\xdd" in enc  # DRI present
        w, h, c, pix = jpeg_decode(enc)
        assert (w, h, c) == (16, 16, 1)
        assert np.array_equal(
            np.frombuffer(pix, np.uint8).reshape(16, 16), img)


def test_grey_roundtrip_gradient_close():
    g = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (32, 1))
    enc = jpeg_encode(g.tobytes(), 64, 32, 1, quality=92)
    w, h, c, pix = jpeg_decode(enc)
    got = np.frombuffer(pix, np.uint8).reshape(32, 64).astype(int)
    assert (w, h, c) == (64, 32, 1)
    assert np.abs(got - g.astype(int)).max() <= 2


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_rgb_roundtrip_both_subsamplings(subsampling):
    yy, xx = np.mgrid[0:37, 0:53]  # odd dims: crop + pad paths
    rgb = np.stack([80 + xx, 60 + yy, 100 + (xx + yy) // 2],
                   -1).clip(0, 255).astype(np.uint8)
    enc = jpeg_encode(rgb.tobytes(), 53, 37, 3, quality=90,
                      subsampling=subsampling)
    w, h, c, pix = jpeg_decode(enc)
    assert (w, h, c) == (53, 37, 3)
    got = np.frombuffer(pix, np.uint8).reshape(37, 53, 3).astype(int)
    err = np.abs(got - rgb.astype(int))
    assert err.max() <= 8 and err.mean() <= 3


def test_restart_markers_do_not_change_output():
    yy, xx = np.mgrid[0:37, 0:53]
    rgb = np.stack([80 + xx, 60 + yy, 100 + (xx + yy) // 2],
                   -1).clip(0, 255).astype(np.uint8)
    plain = jpeg_encode(rgb.tobytes(), 53, 37, 3, quality=90,
                        subsampling="420")
    rst = jpeg_encode(rgb.tobytes(), 53, 37, 3, quality=90,
                      subsampling="420", restart_interval=2)
    assert b"\xff\xd0" in rst and b"\xff\xd0" not in plain
    assert jpeg_decode(plain)[3] == jpeg_decode(rst)[3]


def test_unsupported_inputs_raise_not_misread():
    flat = _foreign_flat_jpeg()
    # SOF2 decodes since round 6 — but a BASELINE scan relabelled as
    # progressive is malformed (full-band Ss=0..Se=63 scan is illegal
    # in progressive mode) and must still raise, not garble
    prog = flat.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="DC scan"):
        jpeg_decode(prog)
    # arithmetic-coded SOF9 still refuses
    arith = flat.replace(b"\xff\xc0", b"\xff\xc9")
    with pytest.raises(ValueError, match="SOF9"):
        jpeg_decode(arith)
    # 16-bit quant table precision
    bad_dqt = flat.replace(_seg(0xDB, bytes([0x00]) + bytes([1] * 64)),
                           _seg(0xDB, bytes([0x10]) + bytes([1] * 64)))
    with pytest.raises(ValueError, match="quant"):
        jpeg_decode(bad_dqt)
    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x00\x01\x02\x03")


def test_jpeg_stats_shape_matches_png_stats():
    s = jpeg_stats(_foreign_flat_jpeg())
    assert s == {"width": 8, "height": 8, "channels": 1,
                 "n_pixels": 64, "pixel_sum": 64 * 130,
                 "pixel_min": 130, "pixel_max": 130}


def test_sniff_decode_routes_jpeg():
    from python_minerva_etl_spark.ext.codecs import sniff_decode

    feat = sniff_decode(_foreign_flat_jpeg(), dim=6)
    assert feat[:3] == [8.0, 8.0, 1.0]
    assert abs(feat[3] - 130 / 255.0) < 1e-12


def test_decode_assets_spark_stage_with_jpeg(spark):
    """The mapInPandas decode stage handles JPEG payloads end-to-end
    (mixed with PNG to prove dispatch inside one batch)."""
    from python_minerva_etl_spark.ext.codecs import png_encode
    from python_minerva_etl_spark.ext.multimodal import decode_assets

    jpg = jpeg_encode(bytes([130] * 64), 8, 8, 1, quality=100)
    png = png_encode(bytes(range(16)), 4, 4, 1)
    df = spark.createDataFrame(
        [(1, bytearray(jpg)), (2, bytearray(png))],
        "asset_id long, payload binary")
    got = {r.asset_id: r.feature for r in
           decode_assets(df, "asset_id", "payload", dim=4).collect()}
    assert got[1][:3] == [8.0, 8.0, 1.0]
    assert got[2][:3] == [4.0, 4.0, 1.0]


def test_resize_images_nearest_and_bilinear(spark):
    """The real resize stage: PNG and JPEG inputs decode, resize in
    numpy, re-encode as PNG; nearest matches the floor-index formula
    exactly, bilinear matches a numpy reference."""
    from python_minerva_etl_spark.ext.codecs import png_decode, png_encode
    from python_minerva_etl_spark.ext.multimodal import (_resize_pixels,
                                                         resize_images)

    src = np.arange(64, dtype=np.uint8).reshape(8, 8)
    png = png_encode(src.tobytes(), 8, 8, 1)
    jpg = jpeg_encode(bytes([200] * 64), 8, 8, 1, quality=100)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(jpg))],
        "asset_id long, payload binary")
    out = {r.asset_id: r for r in
           resize_images(df, "asset_id", "payload", 4, 4).collect()}
    assert out[1].width == 4 and out[1].channels == 1
    w, h, c, pix = png_decode(bytes(out[1].payload))
    got = np.frombuffer(pix, np.uint8).reshape(4, 4)
    # nearest: out(r,c) = in(2r, 2c)
    assert np.array_equal(got, src[::2, ::2])
    # flat JPEG resizes to flat
    _, _, _, pix2 = png_decode(bytes(out[2].payload))
    assert set(pix2) == {200}
    # bilinear agrees with the in-process reference resize
    out_b = {r.asset_id: r for r in
             resize_images(df, "asset_id", "payload", 4, 4,
                           method="bilinear").collect()}
    _, _, _, pixb = png_decode(bytes(out_b[1].payload))
    ref = _resize_pixels(src.tobytes(), 8, 8, 1, 4, 4, "bilinear")
    assert np.array_equal(np.frombuffer(pixb, np.uint8),
                          ref.reshape(-1))
    # unknown container raises (never pseudo-resizes)
    bad = spark.createDataFrame([(3, bytearray(b"???"))],
                                "asset_id long, payload binary")
    with pytest.raises(Exception, match="unknown container"):
        resize_images(bad, "asset_id", "payload", 2, 2).collect()


def test_jpeg_roundtrip_property_random_images():
    """Property: random images round-trip through encode→decode with
    bounded error at high quality, for grey and RGB in both
    subsamplings and with/without restart markers."""
    import numpy as _np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=40),
        channels=st.sampled_from([1, 3]),
        subsampling=st.sampled_from(["444", "420"]),
        rst=st.sampled_from([0, 2]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w, h, channels, subsampling, rst, seed):
        rng = _np.random.default_rng(seed)
        # genuinely smooth content (low per-pixel gradients): the
        # error bound below assumes photo-like locality — hard 8x8
        # tile edges under 4:2:0 legitimately average chroma across
        # the edge and would need a looser bound
        yy, xx = _np.mgrid[0:h, 0:w]
        img = _np.stack([
            rng.integers(80, 176)
            + rng.uniform(-2, 2) * xx + rng.uniform(-2, 2) * yy
            for _ in range(channels)], axis=-1)
        img = _np.clip(img, 0, 255).astype(_np.uint8)
        if channels == 1:
            img = img[..., 0]
        enc = jpeg_encode(img.tobytes(), w, h, channels, quality=95,
                          subsampling=subsampling if channels == 3
                          else "444", restart_interval=rst)
        W, H, C, pix = jpeg_decode(enc)
        assert (W, H, C) == (w, h, channels)
        got = _np.frombuffer(pix, _np.uint8).astype(int)
        err = _np.abs(got - img.reshape(-1).astype(int))
        assert err.max() <= 24 and err.mean() <= 6, (
            err.max(), err.mean())

    check()


def test_sub_mcu_420_dequant_regression():
    """Round-6 falsifying example, pinned: 1x7 px RGB, 4:2:0, q95,
    seed 0.  The decoder double-permuted the quantization table
    (DQT is parsed in zigzag order; ``_reconstruct`` indexed it with
    ZIGZAG again), which mis-scaled mid-frequency AC terms — invisible
    on smooth full-MCU content, but the padding kink of a sub-MCU
    4:2:0 image lives exactly there (max err 17, mean 6.24 before the
    fix; <=3 / <=1.5 after)."""
    import numpy as _np

    rng = _np.random.default_rng(0)
    w, h = 1, 7
    yy, xx = _np.mgrid[0:h, 0:w]
    img = _np.stack([
        rng.integers(80, 176)
        + rng.uniform(-2, 2) * xx + rng.uniform(-2, 2) * yy
        for _ in range(3)], axis=-1)
    img = _np.clip(img, 0, 255).astype(_np.uint8)
    enc = jpeg_encode(img.tobytes(), w, h, 3, quality=95,
                      subsampling="420")
    W, H, C, pix = jpeg_decode(enc)
    got = _np.frombuffer(pix, _np.uint8).astype(int)
    err = _np.abs(got - img.reshape(-1).astype(int))
    assert err.max() <= 3 and err.mean() <= 1.5, (err.max(), err.mean())
