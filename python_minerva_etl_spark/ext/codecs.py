"""Dependency-free REAL media codecs for the multimodal column stage.

This container ships no media libraries (no PIL, no ffmpeg), so the
round-3 decode stage used a documented deterministic stub.  These
codecs remove that limitation for two formats whose specs are simple
enough to implement faithfully from the public file-format documents
with nothing but the stdlib:

- **PNG** (RFC 2083): encoder + decoder.  The decoder parses the
  signature, IHDR, IDAT (zlib-decompressed, possibly split across
  chunks) and IEND, then reverses all five scanline filters (None,
  Sub, Up, Average, Paeth) for 8-bit greyscale, RGB, and RGBA.  The
  encoder writes real CRC-checked chunks and can emit Sub-filtered
  scanlines, so decode genuinely exercises the unfilter path.
- **WAV** (RIFF/WAVE, PCM): encoder + decoder + frame windower for
  16-bit mono/stereo PCM.
- **JPEG** (baseline JFIF, :mod:`.jpeg`): full Huffman + IDCT
  decoder (grey/YCbCr, 4:2:0 and 4:4:4, restart markers) and a
  4:4:4/4:2:0 encoder — routed here via :func:`sniff_decode`.

These are real decoders of real bytes — a PNG produced by any other
tool (Pillow, ImageMagick) decodes here too, as long as it is 8-bit
non-interlaced grey/RGB/RGBA, which is what the test suite locks;
likewise any baseline-sequential JPEG.

Reference parity: the reference system (hendrikx-itc/python-minerva-etl)
has no multimodal surface; this module backs the §2.11 EXT-MM-COL
extension of the training-data pipeline brief.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# colour type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def png_encode(pixels: bytes, width: int, height: int,
               channels: int = 1, filter_type: int = 1) -> bytes:
    """Encode raw 8-bit pixels as a real PNG (CRC'd chunks, zlib IDAT).

    ``filter_type`` 0 (None) or 1 (Sub) — Sub is the default so a
    round-trip proves the decoder's unfilter path does real work, not
    a passthrough."""
    color = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{stride * height} for {width}x{height}x{channels}")
    raw = bytearray()
    for y in range(height):
        line = pixels[y * stride:(y + 1) * stride]
        if filter_type == 0:
            raw.append(0)
            raw += line
        elif filter_type == 1:  # Sub: delta vs pixel to the left
            raw.append(1)
            out = bytearray(line)
            for i in range(stride - 1, channels - 1, -1):
                out[i] = (out[i] - line[i - channels]) & 0xFF
            raw += out
        else:
            raise ValueError(f"unsupported encoder filter {filter_type}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 pass grid (PNG spec §8.2): (x0, y0, dx, dy) per pass
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _unfilter(raw: bytes, offset: int, stride: int, height: int,
              bpp: int) -> bytearray:
    """Reverse the five PNG scanline filters over ``height`` rows of
    ``stride`` bytes starting at ``offset`` (each row prefixed by its
    filter-type byte); returns the defiltered bytes."""
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        base = offset + y * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return out


def _unpack_indices(row: bytes, width: int, depth: int) -> list[int]:
    """Sub-byte palette indices, MSB-first, row pad bits dropped."""
    mask = (1 << depth) - 1
    per_byte = 8 // depth
    return [(row[x // per_byte]
             >> (8 - depth * (x % per_byte + 1))) & mask
            for x in range(width)]


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, raw_pixels)``.

    Real parse: signature check, chunk walk with length bounds, IHDR
    validation, multi-chunk IDAT reassembly, zlib inflate, and full
    reversal of all five PNG scanline filters.  Supports
    non-interlaced AND Adam7-interlaced (PNG spec §8.2: seven
    sub-images, each filtered independently, scattered back onto the
    8x8 pass grid) greyscale (0), RGB (2), RGBA (6) at 8- and 16-bit
    depth — 16-bit samples are deterministically scaled to 8 bits by
    taking the high byte (the PNG spec's own recommended depth
    rescale, exact for values of the form ``v*257``) — and
    palette-indexed (3) at bit depths 1/2/4/8, with indexed pixels
    resolved through PLTE (plus tRNS alpha when present, yielding
    RGBA instead of RGB)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, -1
    height = color = depth = -1
    interlace = 0
    idat = bytearray()
    plte: bytes | None = None
    trns: bytes | None = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # skip CRC
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            ok = (depth in (8, 16) and color in _CHANNELS) or \
                (color == 3 and depth in (1, 2, 4, 8))
            if not ok:
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={color} "
                    "(8/16-bit grey/RGB/RGBA or 1/2/4/8-bit palette "
                    "only)")
            if interlace not in (0, 1):
                raise ValueError(
                    f"bad PNG interlace method {interlace}")
        elif tag == b"PLTE":
            plte = bytes(body)
        elif tag == b"tRNS":
            trns = bytes(body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width < 0 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    paletted = color == 3
    if paletted:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing/malformed PLTE")
        # filters see one byte per packed-index unit
        channels, bpp = 1, 1
        stride = (width * depth + 7) // 8
    else:
        channels = _CHANNELS[color]
        # filters operate on BYTES with a bpp equal to the full
        # pixel width in bytes (PNG spec: 2 bytes/sample at 16-bit)
        bpp = channels * (depth // 8)
        stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    idx_full: bytearray | None = None
    if interlace == 0:
        if len(raw) != (stride + 1) * height:
            raise ValueError("PNG pixel payload has wrong length")
        out = _unfilter(raw, 0, stride, height, bpp)
    else:
        # Adam7: seven independently-filtered sub-images (empty
        # passes contribute zero bytes, not even filter bytes),
        # scattered back onto the 8x8 pass grid
        out = bytearray(stride * height)
        if paletted:
            idx_full = bytearray(width * height)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            sp = (wp * depth + 7) // 8 if paletted else wp * bpp
            if offset + (sp + 1) * hp > len(raw):
                raise ValueError("PNG pixel payload has wrong length")
            sub = _unfilter(raw, offset, sp, hp, bpp)
            offset += (sp + 1) * hp
            for yp in range(hp):
                y = y0 + yp * dy
                if paletted:
                    vals = _unpack_indices(
                        sub[yp * sp:(yp + 1) * sp], wp, depth)
                    for xp in range(wp):
                        idx_full[y * width + x0 + xp * dx] = vals[xp]
                else:
                    for xp in range(wp):
                        s = yp * sp + xp * bpp
                        d = y * stride + (x0 + xp * dx) * bpp
                        out[d:d + bpp] = sub[s:s + bpp]
        if offset != len(raw):
            raise ValueError("PNG pixel payload has wrong length")
    if not paletted:
        if depth == 16:
            # big-endian 16-bit samples -> high byte (v >> 8)
            return width, height, channels, bytes(out[0::2])
        return width, height, channels, bytes(out)
    if idx_full is None:
        idx_full = bytearray()
        for y in range(height):
            idx_full.extend(_unpack_indices(
                out[y * stride:(y + 1) * stride], width, depth))
    return _resolve_palette(idx_full, width, height, plte, trns)


def _resolve_palette(indices, width: int, height: int, plte: bytes,
                     trns: bytes | None
                     ) -> tuple[int, int, int, bytes]:
    """Resolve per-pixel palette indices through PLTE — plus tRNS
    alpha when present, in which case the output is RGBA."""
    n_entries = len(plte) // 3
    out_ch = 4 if trns is not None else 3
    px = bytearray(width * height * out_ch)
    o = 0
    for idx in indices:
        if idx >= n_entries:
            raise ValueError(
                f"palette index {idx} out of range "
                f"({n_entries} PLTE entries)")
        px[o:o + 3] = plte[idx * 3:idx * 3 + 3]
        if out_ch == 4:
            px[o + 3] = trns[idx] if idx < len(trns) else 255
        o += out_ch
    return width, height, out_ch, bytes(px)


def png_stats(payload: bytes) -> dict:
    """Decode a PNG and report exact pixel statistics (the decode
    'feature' stage): dimensions, channel count, and integer-exact
    sum/min/max so engines agree bit-for-bit."""
    width, height, channels, pix = png_decode(payload)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "n_pixels": width * height,
        "pixel_sum": sum(pix),
        "pixel_min": min(pix),
        "pixel_max": max(pix),
    }


# ---------------------------------------------------------------- WAV

def wav_encode(samples: list[int], sample_rate: int = 8000,
               n_channels: int = 1) -> bytes:
    """Encode 16-bit signed PCM samples as a real RIFF/WAVE file."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = 2 * n_channels
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _round_half_away(x: float) -> float:
    """Round half away from zero (Python's round() is banker's
    rounding, which would make the float->int16 scale depend on
    parity of the neighbour integer)."""
    import math
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def wav_decode(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a RIFF/WAVE file to ``(sample_rate, n_channels,
    samples)`` — see :func:`wav_decode_full` for the variant that
    also reports the source bit depth."""
    rate, nch, _, samples = wav_decode_full(payload)
    return rate, nch, samples


def wav_decode_full(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a RIFF/WAVE file to ``(sample_rate, n_channels, bits,
    samples)``.  Real chunk walk (fmt before data, unknown chunks
    skipped with word alignment).  Integer PCM (format 1) at 8 bits
    (unsigned per the WAV spec, re-centred to signed), 16 bits
    (signed LE), or 24 bits (signed LE, common in production audio);
    IEEE-float PCM (format 3) at 32 bits, deterministically scaled to
    the int16 range (clamp to [-1, 1], round-half-away-from-zero to
    ``s * 32767``).  Anything else raises."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    rate = nch = bits = None
    samples: list[int] | None = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, nch, rate, _, _, bits = \
                struct.unpack("<HHIIHH", body[:16])
            ok = (audio_fmt == 1 and bits in (8, 16, 24)) or \
                (audio_fmt == 3 and bits == 32)
            if not ok:
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} bits={bits} "
                    "(8/16/24-bit integer or 32-bit float PCM only)")
        elif tag == b"data":
            if rate is None:
                raise ValueError("WAV data chunk before fmt chunk")
            if bits == 32:  # IEEE float -> deterministic int16 scale
                n = len(body) // 4
                floats = struct.unpack(f"<{n}f", body[:n * 4])
                samples = [
                    int(_round_half_away(max(-1.0, min(1.0, f))
                                         * 32767.0))
                    for f in floats]
            elif bits == 16:
                n = len(body) // 2
                samples = list(struct.unpack(f"<{n}h", body[:n * 2]))
            elif bits == 8:
                # 8-bit WAV is UNSIGNED with midpoint 128
                samples = [b - 128 for b in body]
            else:  # 24-bit signed little-endian
                n = len(body) // 3
                samples = [
                    int.from_bytes(body[i * 3:i * 3 + 3], "little",
                                   signed=True)
                    for i in range(n)]
    if samples is None or rate is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, nch, bits, samples


def wav_stats(payload: bytes) -> dict:
    """Decode a WAV and report exact PCM statistics: duration in
    whole milliseconds, sample count, and integer-exact sum / absolute
    sum / extremes."""
    rate, nch, samples = wav_decode(payload)
    n_frames = len(samples) // nch
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "n_samples": len(samples),
        "duration_ms": n_frames * 1000 // rate,
        "sample_sum": sum(samples),
        "abs_sum": sum(abs(s) for s in samples),
        "sample_min": min(samples),
        "sample_max": max(samples),
    }


def wav_frames(payload: bytes, frame_samples: int = 64,
               every_n: int = 1) -> list[bytes]:
    """REAL audio demux/window stage for :func:`sample_frames`: decode
    the WAV container, window the PCM stream into ``frame_samples``
    chunks (last partial window kept), keep every ``every_n``-th, and
    re-emit each window as raw little-endian int16 bytes.  24-bit
    sources are deterministically scaled down (>> 8) so the emitted
    windows stay int16; 8-bit sources pass through at their native
    (low) amplitude.  Scaling keys off the DECLARED bit depth from
    the fmt chunk, never off amplitude: a full-scale 16-bit file
    (containing -32768) must not be attenuated 256x, and a quiet
    24-bit file must still be scaled."""
    _, _, bits, samples = wav_decode_full(payload)
    if bits == 24:
        samples = [s >> 8 for s in samples]  # 24-bit -> 16-bit scale
    frames = [struct.pack(f"<{len(samples[i:i + frame_samples])}h",
                          *samples[i:i + frame_samples])
              for i in range(0, len(samples), frame_samples)]
    return frames[::every_n]


def sniff_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Codec-dispatch decode for :func:`decode_assets`: detect the
    container by magic bytes and REALLY decode PNG, JPEG, and WAV
    payloads; anything else raises (unknown formats must be routed
    explicitly, never silently pseudo-decoded)."""
    if payload[:8] == _PNG_SIG:
        s = png_stats(payload)
    elif payload[:3] == b"\xff\xd8\xff":
        from .jpeg import jpeg_stats
        s = jpeg_stats(payload)
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        s = wav_stats(payload)
        peak = max(abs(s["sample_min"]), abs(s["sample_max"]), 1)
        out = [float(s["sample_rate"]), float(s["n_samples"]),
               float(s["duration_ms"]),
               s["abs_sum"] / max(s["n_samples"], 1) / 32768.0,
               float(peak) / 32768.0, float(s["n_channels"])]
        return (out + [0.0] * dim)[:dim]
    else:
        raise ValueError(
            "unknown container (not PNG, JPEG, or RIFF/WAVE); pass an "
            "explicit codec= to decode_assets for other formats")
    out = [float(s["width"]), float(s["height"]),
           float(s["channels"]),
           s["pixel_sum"] / s["n_pixels"] / 255.0,
           float(s["pixel_min"]) / 255.0,
           float(s["pixel_max"]) / 255.0]
    return (out + [0.0] * dim)[:dim]
