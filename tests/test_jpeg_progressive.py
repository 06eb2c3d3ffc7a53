"""Progressive JPEG (SOF2) decode: an in-test progressive ENCODER,
written from T.81 Annex G (the same spec the decoder implements, but
independent logic — the fixture-writer pattern of the Avro/Iceberg
tests), emits multi-scan streams of KNOWN coefficient blocks; the
package decoder must produce pixels identical to the same
coefficients decoded through the already-proven sequential path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from python_minerva_etl_spark.ext.jpeg import (HT_AC_LUM, HT_DC_LUM,
                                               ZIGZAG, _BitWriter,
                                               _build_encode_table,
                                               jpeg_decode)

DC_ENC = _build_encode_table(*HT_DC_LUM)
# Progressive AC scans emit EOBn symbols (0x10..0xE0) that Annex K's
# baseline AC table does not define — real progressive files carry
# custom DHTs.  This test table is the simplest canonical one: all
# 256 symbols, 128 at code length 8 and 128 at length 9 (DHT bits
# counts are single bytes, so one length cannot hold all 256; the
# all-ones code stays unused per the spec).
HT_AC_ALL = ([0] * 7 + [128, 128] + [0] * 7, list(range(256)))
AC_ENC = _build_encode_table(*HT_AC_ALL)


def _magnitude(v: int) -> int:
    m, a = 0, abs(v)
    while a:
        m += 1
        a >>= 1
    return m


def _put(bw: _BitWriter, table, sym: int) -> None:
    code, length = table[sym]
    bw.write(code, length)


def _put_amplitude(bw: _BitWriter, v: int, size: int) -> None:
    bw.write(v if v >= 0 else v + (1 << size) - 1, size)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
        + body


def _headers(width, height, qt_flat, sof_marker, ncomp=1) -> bytes:
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0]) + bytes(int(q) for q in qt_flat))
    sof = bytes([8]) + struct.pack(">HH", height, width) \
        + bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0])
    out += _seg(sof_marker, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(HT_DC_LUM[0])
                + bytes(HT_DC_LUM[1]))
    out += _seg(0xC4, bytes([0x10]) + bytes(HT_AC_ALL[0])
                + bytes(HT_AC_ALL[1]))
    return out


def _sos(comps, ss, se, ah, al) -> bytes:
    body = bytes([len(comps)])
    for cid, dc, ac in comps:
        body += bytes([cid, (dc << 4) | ac])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


# ------------------------------------------------- sequential writer


def _encode_baseline(blocks: list[np.ndarray], width, height,
                     qt_flat) -> bytes:
    """Single-scan SOF0 stream of the given zigzag coefficient
    blocks."""
    out = _headers(width, height, qt_flat, 0xC0)
    out += _sos([(1, 0, 0)], 0, 63, 0, 0)
    bw = _BitWriter()
    pred = 0
    for blk in blocks:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        size = _magnitude(diff)
        _put(bw, DC_ENC, size)
        if size:
            _put_amplitude(bw, diff, size)
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                _put(bw, AC_ENC, 0xF0)
                run -= 16
            size = _magnitude(v)
            _put(bw, AC_ENC, (run << 4) | size)
            _put_amplitude(bw, v, size)
            run = 0
        if run:
            _put(bw, AC_ENC, 0x00)  # EOB
    return out + bw.flush() + b"\xff\xd9"


# ------------------------------------------------- progressive writer


def _enc_dc_first(bw, blocks, al, pred=0):
    for blk in blocks:
        v = int(blk[0]) >> al
        diff = v - pred
        pred = v
        size = _magnitude(diff)
        _put(bw, DC_ENC, size)
        if size:
            _put_amplitude(bw, diff, size)


def _enc_dc_refine(bw, blocks, al):
    for blk in blocks:
        bw.write((int(blk[0]) >> al) & 1, 1)


def _flush_eobrun(bw, eobrun: int) -> int:
    if eobrun:
        nbits = _magnitude(eobrun) - 1
        _put(bw, AC_ENC, nbits << 4)
        if nbits:
            bw.write(eobrun - (1 << nbits), nbits)
    return 0


def _enc_ac_first(bw, blocks, ss, se, al):
    """T.81 G.1.2.2 encoder: EOB-run coded first pass."""
    eobrun = 0
    for blk in blocks:
        band = [int(blk[k]) >> al if blk[k] >= 0
                else -((-int(blk[k])) >> al)
                for k in range(ss, se + 1)]
        if not any(band):
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, eobrun)
            continue
        eobrun = _flush_eobrun(bw, eobrun)
        run = 0
        last_nz = max(i for i, v in enumerate(band) if v)
        for i, v in enumerate(band):
            if i > last_nz:
                eobrun += 1  # end-of-band for this block
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                _put(bw, AC_ENC, 0xF0)
                run -= 16
            size = _magnitude(v)
            _put(bw, AC_ENC, (run << 4) | size)
            _put_amplitude(bw, v, size)
            run = 0
        else:
            continue
    _flush_eobrun(bw, eobrun)


def _enc_ac_refine(bw, blocks, ss, se, al):
    """T.81 G.1.2.3 encoder (libjpeg encode_mcu_AC_refine shape).
    TWO correction-bit buffers with different flush points, exactly
    like jcphuff.c: ``be`` holds bits from completed EOB-run blocks
    and flushes right after the EOBn symbol; ``br`` holds the
    CURRENT block's bits and flushes after each emitted symbol (ZRL
    or newly-significant), so the decoder's advance loop reads them
    in stream order."""
    eobrun = 0
    be: list[int] = []   # corrections riding the pending EOB-run

    def emit_eobrun():
        nonlocal eobrun
        if eobrun:
            _flush_eobrun(bw, eobrun)
            eobrun = 0
            for b in be:
                bw.write(b, 1)
            be.clear()

    for blk in blocks:
        absval = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        signs = [1 if int(blk[k]) > 0 else 0
                 for k in range(ss, se + 1)]
        eob = 0
        for i, t in enumerate(absval):
            if t == 1:
                eob = i + 1  # position AFTER last newly-significant
        run = 0
        br: list[int] = []  # this block's correction bits
        for i, t in enumerate(absval):
            if t == 0:
                run += 1
                continue
            # ZRLs cannot be folded into an EOB — emit while the
            # position is still before this block's EOB
            while run > 15 and i < eob:
                emit_eobrun()
                _put(bw, AC_ENC, 0xF0)
                run -= 16
                for b in br:
                    bw.write(b, 1)
                br.clear()
            if t > 1:  # history-nonzero: queue correction bit
                br.append(t & 1)
                continue
            # newly significant
            emit_eobrun()
            _put(bw, AC_ENC, (run << 4) | 1)
            bw.write(signs[i], 1)
            for b in br:
                bw.write(b, 1)
            br.clear()
            run = 0
        if run or br:  # trailing zeros/corrections ride an EOB
            eobrun += 1
            be.extend(br)
        if eobrun == 0x7FFF:
            emit_eobrun()
    emit_eobrun()


def _encode_progressive(blocks, width, height, qt_flat,
                        dc_al=1, split=6) -> bytes:
    """Four scans: DC first (Al=dc_al), DC refine(s) to 0, AC first
    over two spectral bands (Al=1), AC refinements (Ah=1, Al=0)."""
    out = _headers(width, height, qt_flat, 0xC2)
    # DC first at Al=dc_al, then refinements down to 0
    bw = _BitWriter()
    _enc_dc_first(bw, blocks, dc_al)
    out += _sos([(1, 0, 0)], 0, 0, 0, dc_al) + bw.flush()
    for al in range(dc_al - 1, -1, -1):
        bw = _BitWriter()
        _enc_dc_refine(bw, blocks, al)
        out += _sos([(1, 0, 0)], 0, 0, al + 1, al) + bw.flush()
    # AC: two spectral bands, first pass at Al=1 then refine to 0
    for lo, hi in ((1, split), (split + 1, 63)):
        bw = _BitWriter()
        _enc_ac_first(bw, blocks, lo, hi, 1)
        out += _sos([(1, 0, 0)], lo, hi, 0, 1) + bw.flush()
    for lo, hi in ((1, split), (split + 1, 63)):
        bw = _BitWriter()
        _enc_ac_refine(bw, blocks, lo, hi, 0)
        out += _sos([(1, 0, 0)], lo, hi, 1, 0) + bw.flush()
    return out + b"\xff\xd9"


def _rand_blocks(n, rng, density=0.3, amp=60):
    out = []
    for _ in range(n):
        blk = np.zeros(64, dtype=np.int64)
        blk[0] = rng.integers(-200, 200)
        for k in range(1, 64):
            if rng.random() < density:
                v = 0
                while v == 0:
                    v = int(rng.integers(-amp, amp))
                blk[k] = v
        out.append(blk)
    return out


QT_ONES = np.ones(64, dtype=np.int64)


@pytest.mark.parametrize("seed,density", [(1, 0.3), (2, 0.05),
                                          (3, 0.8), (4, 0.0)])
def test_progressive_matches_sequential(seed, density):
    """Pixel-exact parity: the same coefficient blocks through the
    progressive multi-scan path and the sequential path."""
    rng = np.random.default_rng(seed)
    w, h = 32, 16  # 4x2 blocks
    blocks = _rand_blocks(8, rng, density=density)
    base = jpeg_decode(_encode_baseline(blocks, w, h, QT_ONES))
    prog = jpeg_decode(_encode_progressive(blocks, w, h, QT_ONES))
    assert base == prog


def test_progressive_two_level_dc_and_narrow_bands():
    rng = np.random.default_rng(9)
    blocks = _rand_blocks(4, rng, density=0.5, amp=500)
    w, h = 16, 16
    base = jpeg_decode(_encode_baseline(blocks, w, h, QT_ONES))
    prog = jpeg_decode(_encode_progressive(blocks, w, h, QT_ONES,
                                           dc_al=2, split=2))
    assert base == prog


def test_progressive_eobrun_spanning_blocks():
    """Blocks with empty high bands produce EOB-runs > 1 spanning
    several blocks — the decoder must skip exactly that many."""
    blocks = []
    for i in range(6):
        blk = np.zeros(64, dtype=np.int64)
        blk[0] = 10 * i
        if i == 0:
            blk[1] = 7       # only the first block has low-band AC
        if i == 5:
            blk[40] = -3     # only the last block has high-band AC
        blocks.append(blk)
    w, h = 48, 8
    base = jpeg_decode(_encode_baseline(blocks, w, h, QT_ONES))
    prog = jpeg_decode(_encode_progressive(blocks, w, h, QT_ONES))
    assert base == prog


def test_progressive_still_refuses_arithmetic_and_hierarchical():
    out = _headers(8, 8, QT_ONES, 0xC9)  # arithmetic sequential
    with pytest.raises(ValueError, match="SOF9"):
        jpeg_decode(out + b"\xff\xd9")


def test_progressive_color_420_interleaved_dc_and_real_grids():
    """3-component 4:2:0: the DC scan is interleaved in MCU order
    over the PADDED block lattice, while each AC scan walks the
    component's REAL (unpadded) block grid — with width 24 the luma
    real grid is 3 blocks wide but the padded lattice is 4, so any
    confusion between the two desyncs immediately.  Expected pixels
    come from the package's _reconstruct on the same coefficient
    grids (already proven by the sequential-path tests)."""
    from python_minerva_etl_spark.ext.jpeg import (_reconstruct,
                                                   jpeg_decode)

    w, h = 24, 16  # mcus: 2x1; luma padded 4x2, real 3x2; chroma 2x1
    rng = np.random.default_rng(21)
    comps = [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
    mcus_x, mcus_y = 2, 1
    coef = {1: np.zeros((2, 4, 64), dtype=np.int64),
            2: np.zeros((1, 2, 64), dtype=np.int64),
            3: np.zeros((1, 2, 64), dtype=np.int64)}
    real = {1: (2, 3), 2: (1, 2), 3: (1, 2)}
    for cid in coef:
        bh, bw_ = real[cid]
        for by in range(bh):
            for bx in range(bw_):
                blk = coef[cid][by, bx]
                blk[0] = int(rng.integers(-100, 100))
                for k in range(1, 64):
                    if rng.random() < 0.2:
                        v = 0
                        while v == 0:
                            v = int(rng.integers(-40, 40))
                        blk[k] = v

    qt = {0: QT_ONES}
    expected = _reconstruct(w, h, comps, coef, qt,
                            mcus_x, mcus_y, 2, 2)

    # --- author the progressive stream
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0]) + bytes(int(q) for q in QT_ONES))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(HT_DC_LUM[0])
                + bytes(HT_DC_LUM[1]))
    out += _seg(0xC4, bytes([0x10]) + bytes(HT_AC_ALL[0])
                + bytes(HT_AC_ALL[1]))

    # interleaved DC-first scan (Al=1), MCU order over PADDED lattice
    bw = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, ch, cv, _ in comps:
                for by in range(cv):
                    for bx in range(ch):
                        v = int(coef[cid][my * cv + by,
                                          mx * ch + bx][0]) >> 1
                        diff = v - pred[cid]
                        pred[cid] = v
                        size = _magnitude(diff)
                        _put(bw, DC_ENC, size)
                        if size:
                            _put_amplitude(bw, diff, size)
    out += _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 0, 1)
    out += bw.flush()
    # DC refinement, same interleaved order
    bw = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, ch, cv, _ in comps:
                for by in range(cv):
                    for bx in range(ch):
                        bw.write(int(coef[cid][my * cv + by,
                                               mx * ch + bx][0]) & 1,
                                 1)
    out += _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 1, 0)
    out += bw.flush()
    # per-component AC scans over the REAL grid, Al=1 then refine
    for cid, _, _, _ in comps:
        bh, bw_ = real[cid]
        blocks = [coef[cid][by, bx] for by in range(bh)
                  for bx in range(bw_)]
        bwr = _BitWriter()
        _enc_ac_first(bwr, blocks, 1, 63, 1)
        out += _sos([(cid, 0, 0)], 1, 63, 0, 1) + bwr.flush()
    for cid, _, _, _ in comps:
        bh, bw_ = real[cid]
        blocks = [coef[cid][by, bx] for by in range(bh)
                  for bx in range(bw_)]
        bwr = _BitWriter()
        _enc_ac_refine(bwr, blocks, 1, 63, 0)
        out += _sos([(cid, 0, 0)], 1, 63, 1, 0) + bwr.flush()
    out += b"\xff\xd9"

    assert jpeg_decode(out) == expected


def test_progressive_dc_scan_with_restart_markers():
    """DRI applies inside progressive scans too: the DC-first and
    DC-refinement scans emit RSTn every 2 data units (prediction
    resets, byte alignment), then DRI=0 is redefined before the AC
    scans.  Parity against the sequential path."""
    rng = np.random.default_rng(33)
    blocks = _rand_blocks(6, rng, density=0.2)
    w, h = 48, 8
    base = jpeg_decode(_encode_baseline(blocks, w, h, QT_ONES))

    out = _headers(w, h, QT_ONES, 0xC2)
    out += _seg(0xDD, struct.pack(">H", 2))  # DRI = 2 units
    # DC first (Al=1) with restarts every 2 blocks
    bw = _BitWriter()
    pred, rst = 0, 0
    for i, blk in enumerate(blocks):
        if i and i % 2 == 0:
            bw.emit_marker(0xD0 + rst)
            rst = (rst + 1) & 7
            pred = 0
        v = int(blk[0]) >> 1
        diff = v - pred
        pred = v
        size = _magnitude(diff)
        _put(bw, DC_ENC, size)
        if size:
            _put_amplitude(bw, diff, size)
    out += _sos([(1, 0, 0)], 0, 0, 0, 1) + bw.flush()
    # DC refinement with restarts
    bw = _BitWriter()
    rst = 0
    for i, blk in enumerate(blocks):
        if i and i % 2 == 0:
            bw.emit_marker(0xD0 + rst)
            rst = (rst + 1) & 7
        bw.write(int(blk[0]) & 1, 1)
    out += _sos([(1, 0, 0)], 0, 0, 1, 0) + bw.flush()
    # AC scans without restarts: redefine DRI = 0
    out += _seg(0xDD, struct.pack(">H", 0))
    bw = _BitWriter()
    _enc_ac_first(bw, blocks, 1, 63, 1)
    out += _sos([(1, 0, 0)], 1, 63, 0, 1) + bw.flush()
    bw = _BitWriter()
    _enc_ac_refine(bw, blocks, 1, 63, 0)
    out += _sos([(1, 0, 0)], 1, 63, 1, 0) + bw.flush()
    out += b"\xff\xd9"
    assert jpeg_decode(out) == base
