"""Real-codec unit tests: PNG filter inversion, chunk handling, WAV
PCM round-trips and windowing.  No media libraries involved — these
are the stdlib-only decoders behind the multimodal decode stage."""

from __future__ import annotations

import struct
import zlib

import pytest

from python_minerva_etl_spark.ext.codecs import (
    _PNG_SIG, _chunk, png_decode, png_encode, png_stats, sniff_decode,
    wav_decode, wav_encode, wav_frames, wav_stats)


def _pixels(n: int, seed: int = 7) -> bytes:
    x, out = seed, bytearray()
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (2 ** 31)
        out.append(x % 256)
    return bytes(out)


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1])
def test_png_roundtrip(channels, filter_type):
    w, h = 5, 4
    pix = _pixels(w * h * channels)
    blob = png_encode(pix, w, h, channels, filter_type=filter_type)
    rw, rh, rc, rpix = png_decode(blob)
    assert (rw, rh, rc) == (w, h, channels)
    assert rpix == pix


def _handmade_png(filtered_rows: list[bytes], w: int, h: int,
                  color: int) -> bytes:
    """Build a PNG from pre-filtered scanlines — exercises decoder
    filters the encoder doesn't emit (Up/Average/Paeth)."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(filtered_rows)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))


def test_png_decoder_inverts_up_average_paeth():
    """Forward-filter rows 2/3/4 by hand, decode, expect originals."""
    from python_minerva_etl_spark.ext.codecs import _paeth

    w, h, ch = 4, 3, 1
    pix = _pixels(w * h * ch, seed=3)
    rows = [pix[y * w:(y + 1) * w] for y in range(h)]
    filtered = []
    prev = bytes(w)
    for y, (ftype, line) in enumerate(zip([2, 3, 4], rows)):
        out = bytearray([ftype])
        for i in range(w):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ftype == 2:
                out.append((line[i] - b) & 0xFF)
            elif ftype == 3:
                out.append((line[i] - (a + b) // 2) & 0xFF)
            else:
                out.append((line[i] - _paeth(a, b, c)) & 0xFF)
        filtered.append(bytes(out))
        prev = line
    blob = _handmade_png(filtered, w, h, color=0)
    rw, rh, rc, rpix = png_decode(blob)
    assert (rw, rh, rc) == (w, h, 1)
    assert rpix == pix


def test_png_multi_chunk_idat():
    """IDAT split across chunks must reassemble before inflate."""
    w, h = 3, 2
    pix = _pixels(w * h)
    raw = b"".join(b"\x00" + pix[y * w:(y + 1) * w] for y in range(h))
    comp = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    blob = (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", comp[:5]) + _chunk(b"IDAT", comp[5:])
            + _chunk(b"IEND", b""))
    assert png_decode(blob)[3] == pix


def test_png_rejects_garbage():
    with pytest.raises(ValueError, match="bad signature"):
        png_decode(b"JFIF not a png")
    with pytest.raises(ValueError, match="truncated"):
        png_decode(_PNG_SIG + struct.pack(">I", 99) + b"IHDRxx")
    # sub-byte depth on a NON-palette color type unsupported
    # (16-bit grey/RGB/RGBA decodes since round 6)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="unsupported PNG"):
        png_decode(_PNG_SIG + _chunk(b"IHDR", ihdr)
                   + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
                   + _chunk(b"IEND", b""))


def test_png_stats_exact():
    pix = bytes([0, 10, 20, 255])
    s = png_stats(png_encode(pix, 2, 2, 1))
    assert s == {"width": 2, "height": 2, "channels": 1, "n_pixels": 4,
                 "pixel_sum": 285, "pixel_min": 0, "pixel_max": 255}


def test_wav_roundtrip_and_stats():
    samples = [0, 1000, -1000, 32767, -32768, 12]
    blob = wav_encode(samples, sample_rate=8000)
    rate, nch, got = wav_decode(blob)
    assert (rate, nch, got) == (8000, 1, samples)
    s = wav_stats(blob)
    assert s["n_samples"] == 6 and s["sample_rate"] == 8000
    assert s["sample_sum"] == sum(samples)
    assert s["abs_sum"] == sum(abs(x) for x in samples)
    assert s["duration_ms"] == 6 * 1000 // 8000


def test_wav_skips_unknown_chunks():
    """LIST/INFO chunks (odd length → word alignment) must be skipped."""
    samples = [5, -5, 7]
    blob = wav_encode(samples)
    # splice an odd-length junk chunk between fmt and data
    fmt_end = blob.index(b"data")
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = blob[:fmt_end] + junk + blob[fmt_end:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    assert wav_decode(spliced)[2] == samples


def test_wav_frames_windowing():
    samples = list(range(10))
    blob = wav_encode(samples)
    frames = wav_frames(blob, frame_samples=4, every_n=1)
    assert [len(f) // 2 for f in frames] == [4, 4, 2]
    assert struct.unpack("<4h", frames[0]) == (0, 1, 2, 3)
    assert wav_frames(blob, frame_samples=4, every_n=2)[1] == frames[2]


def test_sniff_decode_dispatch():
    png = png_encode(bytes([100, 200]), 2, 1, 1)
    wav = wav_encode([100, -100])
    fp = sniff_decode(png, dim=6)
    assert fp[:3] == [2.0, 1.0, 1.0]
    assert fp[3] == pytest.approx(150 / 255.0)  # mean pixel / 255
    fw = sniff_decode(wav, dim=6)
    assert fw[0] == 8000.0 and fw[1] == 2.0
    with pytest.raises(ValueError, match="unknown container"):
        sniff_decode(b"\x00\x01\x02garbage")


def test_wav_8_and_24_bit_pcm_decode():
    """Round-5 codec breadth: 8-bit (unsigned, re-centred) and 24-bit
    (signed LE) PCM decode from hand-built RIFF bytes (not via our
    encoder, which emits 16-bit)."""
    import struct

    from python_minerva_etl_spark.ext.codecs import wav_decode

    def riff(bits, data, nch=1, rate=8000):
        block = bits // 8 * nch
        fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * block,
                          block, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 8-bit: unsigned bytes, midpoint 128 -> signed
    r, n, s = wav_decode(riff(8, bytes([0, 128, 255, 200])))
    assert (r, n) == (8000, 1) and s == [-128, 0, 127, 72]
    # 24-bit: signed little-endian triples
    vals = [0, 1, -1, 8_388_607, -8_388_608, 123_456]
    data = b"".join(v.to_bytes(3, "little", signed=True) for v in vals)
    r, n, s = wav_decode(riff(24, data))
    assert s == vals
    # 32-bit still refused
    import pytest as _pytest
    with _pytest.raises(ValueError, match="8/16/24"):
        wav_decode(riff(32, b"\x00" * 8))


def test_wav_frames_from_24_bit_source():
    import struct

    from python_minerva_etl_spark.ext.codecs import wav_frames

    vals = [100_000, -100_000, 5_000_000, 70]
    data = b"".join(v.to_bytes(3, "little", signed=True) for v in vals)
    block = 3
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * block, block, 24)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    frames = wav_frames(wav, frame_samples=2, every_n=1)
    got = [struct.unpack(f"<{len(f) // 2}h", f) for f in frames]
    assert got == [(100_000 >> 8, -100_000 >> 8),
                   (5_000_000 >> 8, 70 >> 8)]


def test_wav_frames_scale_keys_off_declared_bits():
    """ADVICE r5: scaling must key off the fmt chunk's bit depth, not
    amplitude.  A full-scale 16-bit file (containing -32768, abs
    32768 > 32767) must NOT be attenuated; a quiet 24-bit file (peak
    well under 32767) MUST still be scaled >> 8."""
    import struct

    from python_minerva_etl_spark.ext.codecs import wav_encode, wav_frames

    # full-scale 16-bit: -32768 would have tripped the old amplitude sniff
    loud16 = wav_encode([-32768, 32767, 0, -1])
    (frame,) = wav_frames(loud16, frame_samples=4)
    assert struct.unpack("<4h", frame) == (-32768, 32767, 0, -1)

    # quiet 24-bit: every sample fits in int16 yet must still be scaled
    vals = [3000, -3000, 256, -256]
    data = b"".join(v.to_bytes(3, "little", signed=True) for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    quiet24 = b"RIFF" + struct.pack("<I", len(body)) + body
    (frame,) = wav_frames(quiet24, frame_samples=4)
    assert struct.unpack("<4h", frame) == (3000 >> 8, -3000 >> 8, 1, -1)


def _palette_png(width, height, depth, indices, plte, trns=None):
    """Hand-built palette PNG (color type 3, filter None): pack
    `indices` MSB-first at `depth` bits, rows padded to byte
    boundaries."""
    import struct as _s
    import zlib as _z

    from python_minerva_etl_spark.ext.codecs import _chunk

    per_byte = 8 // depth
    stride = (width * depth + 7) // 8
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        row = bytearray(stride)
        for x in range(width):
            idx = indices[y * width + x]
            shift = 8 - depth * (x % per_byte + 1)
            row[x // per_byte] |= idx << shift
        raw += row
    ihdr = _s.pack(">IIBBBBB", width, height, depth, 3, 0, 0, 0)
    out = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"PLTE", bytes(plte)))
    if trns is not None:
        out += _chunk(b"tRNS", bytes(trns))
    out += _chunk(b"IDAT", _z.compress(bytes(raw), 6))
    out += _chunk(b"IEND", b"")
    return out


def test_png_palette_8bit():
    from python_minerva_etl_spark.ext.codecs import png_decode
    plte = [255, 0, 0, 0, 255, 0, 0, 0, 255]  # R, G, B
    blob = _palette_png(3, 2, 8, [0, 1, 2, 2, 1, 0], plte)
    w, h, ch, px = png_decode(blob)
    assert (w, h, ch) == (3, 2, 3)
    assert px == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255,
                        0, 0, 255, 0, 255, 0, 255, 0, 0])


def test_png_palette_subbyte_depths():
    from python_minerva_etl_spark.ext.codecs import png_decode
    plte = [10, 10, 10, 200, 200, 200]
    # 1-bit, width 5 (row pad bits exercised)
    blob = _palette_png(5, 2, 1, [0, 1, 1, 0, 1, 1, 0, 0, 1, 0], plte)
    w, h, ch, px = png_decode(blob)
    assert (w, h, ch) == (5, 2, 3)
    greys = [px[i] for i in range(0, len(px), 3)]
    assert greys == [10, 200, 200, 10, 200, 200, 10, 10, 200, 10]
    # 4-bit
    plte16 = sum(([i * 16, i * 16, i * 16] for i in range(16)), [])
    blob = _palette_png(3, 1, 4, [0, 15, 7], plte16)
    _, _, _, px = png_decode(blob)
    assert [px[0], px[3], px[6]] == [0, 240, 112]


def test_png_palette_trns_alpha():
    from python_minerva_etl_spark.ext.codecs import png_decode
    plte = [255, 0, 0, 0, 255, 0]
    blob = _palette_png(2, 1, 8, [0, 1], plte, trns=[128])  # idx1 opaque
    w, h, ch, px = png_decode(blob)
    assert ch == 4
    assert px == bytes([255, 0, 0, 128, 0, 255, 0, 255])


def test_png_palette_bad_index_and_missing_plte():
    import struct as _s
    import zlib as _z

    import pytest as _pytest

    from python_minerva_etl_spark.ext.codecs import _chunk, png_decode
    plte = [1, 2, 3]  # one entry
    blob = _palette_png(1, 1, 8, [5], plte)
    with _pytest.raises(ValueError, match="out of range"):
        png_decode(blob)
    # missing PLTE
    ihdr = _s.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", _z.compress(b"\x00\x00"))
            + _chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="PLTE"):
        png_decode(blob)


def test_wav_32bit_float_pcm():
    """IEEE-float WAV (format 3, 32-bit): decoded with a deterministic
    int16 scale (clamp, round half away from zero); wav_frames must
    NOT additionally shift (bits != 24)."""
    import struct

    import pytest as _pytest

    from python_minerva_etl_spark.ext.codecs import (wav_decode_full,
                                                     wav_frames)

    vals = [0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0, 3.1e-05]
    data = struct.pack(f"<{len(vals)}f", *vals)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    r, n, bits, s = wav_decode_full(wav)
    assert (r, n, bits) == (8000, 1, 32)
    assert s == [0, 32767, -32767, 16384, -16384, 32767, -32767, 1]
    (frame,) = wav_frames(wav, frame_samples=8)
    assert struct.unpack("<8h", frame) == tuple(s)
    # 32-bit INTEGER PCM still refused
    fmt_int = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 4, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_int))
            + fmt_int + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    bad = b"RIFF" + struct.pack("<I", len(body)) + body
    with _pytest.raises(ValueError, match="32-bit float"):
        wav_decode_full(bad)


def test_png_16bit_decode_high_byte():
    """16-bit grey/RGB PNGs decode with the spec's depth rescale
    (high byte); Sub filter at bpp=2·channels exercised."""
    import struct as _s
    import zlib as _z

    from python_minerva_etl_spark.ext.codecs import _chunk, png_decode

    def png16(width, height, color, samples, filter_type=0):
        ch = {0: 1, 2: 3}[color]
        stride = width * ch * 2
        raw = bytearray()
        prev = None
        for y in range(height):
            line = b"".join(_s.pack(">H", s) for s in
                            samples[y * width * ch:(y + 1) * width * ch])
            raw.append(filter_type)
            if filter_type == 1:
                bpp = ch * 2
                enc = bytearray(line)
                for i in range(stride - 1, bpp - 1, -1):
                    enc[i] = (enc[i] - line[i - bpp]) & 0xFF
                raw += enc
            else:
                raw += line
        ihdr = _s.pack(">IIBBBBB", width, height, 16, color, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", _z.compress(bytes(raw), 6))
                + _chunk(b"IEND", b""))

    # grey: exact v*257 values rescale losslessly to v
    vals = [0, 257, 65535, 128 * 257, 40000, 1]
    w, h, ch, px = png_decode(png16(3, 2, 0, vals))
    assert (w, h, ch) == (3, 2, 1)
    assert list(px) == [v >> 8 for v in vals]
    # RGB with Sub filter
    vals = [65535, 0, 257, 30000, 40000, 50000]
    w, h, ch, px = png_decode(png16(2, 1, 2, vals, filter_type=1))
    assert (w, h, ch) == (2, 1, 3)
    assert list(px) == [v >> 8 for v in vals]


# ----------------------------------------------------- Adam7

_ADAM7_GRID = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
               (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _interlaced_png(pixels, width, height, channels, depth=8):
    """In-test Adam7 encoder written straight from PNG spec §8.2,
    independent of the library's scatter logic: extract each pass's
    sub-image, filter its rows with Up (proves per-pass filter state
    resets — pass N's first row must NOT see pass N-1's last row),
    concatenate, compress once."""
    import struct as _s
    import zlib as _z

    from python_minerva_etl_spark.ext.codecs import _PNG_SIG, _chunk
    color = {1: 0, 3: 2, 4: 6}[channels]
    unit = channels * (depth // 8)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7_GRID:
        cols = list(range(x0, width, dx))
        rows = list(range(y0, height, dy))
        if not cols or not rows:
            continue
        prev = bytearray(len(cols) * unit)
        for y in rows:
            line = bytearray()
            for x in cols:
                o = (y * width + x) * unit
                line += pixels[o:o + unit]
            raw.append(2)  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF
                         for i in range(len(line)))
            prev = line
    ihdr = _s.pack(">IIBBBBB", width, height, depth, color, 0, 0, 1)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", _z.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("w,h,ch", [(13, 7, 3), (8, 8, 1), (5, 3, 4),
                                    (1, 1, 1), (2, 9, 3)])
def test_png_adam7_roundtrip(w, h, ch):
    from python_minerva_etl_spark.ext.codecs import png_decode
    rng = __import__("random").Random(w * 100 + h * 10 + ch)
    pix = bytes(rng.randrange(256) for _ in range(w * h * ch))
    got = png_decode(_interlaced_png(pix, w, h, ch))
    assert got == (w, h, ch, pix)


def test_png_adam7_16bit_high_byte():
    import struct as _s

    from python_minerva_etl_spark.ext.codecs import png_decode
    vals = [0, 257, 65535, 128 * 257, 40000, 1,
            12345, 54321, 257 * 7, 300, 2, 65534]
    w, h = 4, 3
    pix = b"".join(_s.pack(">H", v) for v in vals)
    got = png_decode(_interlaced_png(pix, w, h, 1, depth=16))
    assert got == (w, h, 1, bytes(v >> 8 for v in vals))


def test_png_adam7_palette_subbyte():
    import struct as _s
    import zlib as _z

    from python_minerva_etl_spark.ext.codecs import (_PNG_SIG, _chunk,
                                                     png_decode)
    # depth-2 palette, 5x3: pack each PASS row MSB-first independently
    w, h, depth = 5, 3, 2
    idx = [0, 1, 2, 3, 0,
           3, 2, 1, 0, 3,
           1, 1, 2, 2, 0]
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7_GRID:
        cols = list(range(x0, w, dx))
        rows = list(range(y0, h, dy))
        if not cols or not rows:
            continue
        for y in rows:
            bits = ""
            for x in cols:
                bits += format(idx[y * w + x], "02b")
            bits += "0" * (-len(bits) % 8)
            raw.append(0)  # None filter
            raw += bytes(int(bits[i:i + 8], 2)
                         for i in range(0, len(bits), 8))
    plte = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 40, 40, 40])
    ihdr = _s.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 1)
    blob = (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
            + _chunk(b"tRNS", bytes([255, 128, 64, 0]))
            + _chunk(b"IDAT", _z.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))
    got_w, got_h, got_ch, px = png_decode(blob)
    assert (got_w, got_h, got_ch) == (w, h, 4)
    want = bytearray()
    colors = [(10, 0, 0, 255), (0, 20, 0, 128),
              (0, 0, 30, 64), (40, 40, 40, 0)]
    for i in idx:
        want += bytes(colors[i])
    assert px == bytes(want)


def test_png_adam7_truncated_payload_raises():
    import struct as _s
    import zlib as _z

    from python_minerva_etl_spark.ext.codecs import (_PNG_SIG, _chunk,
                                                     png_decode)
    pix = bytes(range(13 * 7 * 3 % 256 or 1)) * 0 + bytes(
        (i * 7) % 256 for i in range(13 * 7 * 3))
    blob = _interlaced_png(pix, 13, 7, 3)
    # re-compress a truncated pass stream under the same IHDR
    body = _z.decompress(blob[blob.index(b"IDAT") + 4:
                              blob.rindex(b"IEND") - 8])
    short = _z.compress(body[:-5], 6)
    ihdr = _s.pack(">IIBBBBB", 13, 7, 8, 2, 0, 0, 1)
    bad = (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", short)
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="wrong length"):
        png_decode(bad)
