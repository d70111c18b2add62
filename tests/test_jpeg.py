"""Baseline JPEG decoder (multimodal/jpeg.py): roundtrip against an
independent test-local encoder, IDCT pinned to a numpy reference, the
4:2:0 upsample path, restart intervals, and the loud unsupported-format
guards.

The encoder here is deliberately test-local and independent: its own
forward DCT, its own canonical Huffman construction (every DC size at
code length 4, every AC (run, size) symbol at length 8 — a valid prefix
code the decoder must rebuild from the DHT bytes), all-ones quant
tables so roundtrip error is float-rounding only. A shared-bug false
pass is further excluded by the numpy IDCT pin and the flat-field
exactness cases."""

from __future__ import annotations

import math
import struct

import pytest

from etl_instagram_spark.multimodal.jpeg import ZIGZAG, decode_jpeg

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _fdct(block):
    """Forward 8x8 DCT of level-shifted samples (T.81 A.3.3)."""
    out = [[0] * 8 for _ in range(8)]
    for v in range(8):
        for u in range(8):
            acc = 0.0
            for y in range(8):
                for x in range(8):
                    acc += block[y][x] * _COS[x][u] * _COS[y][v]
            out[v][u] = _C[u] * _C[v] * acc / 4.0
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits


# canonical tables: DC sizes 0..11 all at code length 4 (12 < 2^4);
# AC: EOB, all (run 1..15, size 0 -> only ZRL=0xF0) and (run, size)
# for run 0..15, size 1..10 all at length 8 (162 < 2^8). r18: EOBn
# symbols (r<<4, r=1..14) APPENDED for the progressive encoder's EOB
# runs — appending keeps every earlier symbol's canonical code, so the
# baseline streams are byte-identical to pre-r18
_DC_SYMS = list(range(12))
_AC_SYMS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(1, 15)]
)


def _canon_codes(symbols, length):
    return {sym: (i, length) for i, sym in enumerate(symbols)}


_DC_CODES = _canon_codes(_DC_SYMS, 4)
_AC_CODES = _canon_codes(_AC_SYMS, 8)


def _dht_segment(tc, th, symbols, length):
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _size_cat(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _encode_block(w: _BitWriter, samples, dc_pred: int) -> int:
    """samples: 8x8 raster ints 0..255."""
    shifted = [[s - 128 for s in row] for row in samples]
    co = _fdct(shifted)
    zz = [int(round(co[idx // 8][idx % 8])) for idx in ZIGZAG]
    dc = zz[0]
    diff = dc - dc_pred
    s = _size_cat(diff)
    code, ln = _DC_CODES[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = _AC_CODES[0xF0]
            w.write(code, ln)
            run -= 16
        s = _size_cat(v)
        code, ln = _AC_CODES[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = _AC_CODES[0x00]
        w.write(code, ln)
    return dc


def _plane(pixels, width, height, ch, nch, pw, ph):
    """Extract channel ch, pad to (pw, ph) by edge replication."""
    rows = []
    for y in range(ph):
        yy = min(y, height - 1)
        row = [pixels[(yy * width + min(x, width - 1)) * nch + ch] for x in range(pw)]
        rows.append(row)
    return rows


def encode_jpeg(pixels, width, height, channels, subsample=False, restart_interval=0):
    """Minimal baseline encoder: all-ones quant, single DC/AC table
    pair, optional 4:2:0 (Y at 2x2) and restart intervals."""
    if channels == 3:
        yp, cbp, crp = [], [], []
        for i in range(width * height):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            yv = 0.299 * r + 0.587 * g + 0.114 * b
            cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
            yp.append(min(255, max(0, int(round(yv)))))
            cbp.append(min(255, max(0, int(round(cb)))))
            crp.append(min(255, max(0, int(round(cr)))))
        if subsample:
            comps = [(1, yp, 2, 2), (2, None, 1, 1), (3, None, 1, 1)]
            # box-subsample chroma at half resolution
            cw, chh = (width + 1) // 2, (height + 1) // 2
            subs = []
            for plane in (cbp, crp):
                sp = []
                for y in range(chh):
                    for x in range(cw):
                        vals = []
                        for dy in (0, 1):
                            for dx in (0, 1):
                                yy = min(2 * y + dy, height - 1)
                                xx = min(2 * x + dx, width - 1)
                                vals.append(plane[yy * width + xx])
                        sp.append(int(round(sum(vals) / len(vals))))
                subs.append(sp)
            planes = [
                (yp, width, height, 2, 2),
                (subs[0], cw, chh, 1, 1),
                (subs[1], cw, chh, 1, 1),
            ]
        else:
            planes = [
                (yp, width, height, 1, 1),
                (cbp, width, height, 1, 1),
                (crp, width, height, 1, 1),
            ]
    else:
        planes = [(list(pixels), width, height, 1, 1)]

    hmax = max(p[3] for p in planes)
    vmax = max(p[4] for p in planes)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT id 0, all ones
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    # SOF0
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for i, (_, _, _, h, v) in enumerate(planes):
        sof += bytes([i + 1, (h << 4) | v, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_SYMS, 4)
    out += _dht_segment(1, 0, _AC_SYMS, 8)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart_interval)
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    padded = []
    for plane, w_, h_, h, v in planes:
        pw, ph = mcux * h * 8, mcuy * v * 8
        padded.append((_plane(plane, w_, h_, 0, 1, pw, ph), h, v, pw))

    w = _BitWriter()
    dc_pred = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                w.flush()
                out += w.out
                w = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                dc_pred = [0] * ncomp
            for ci, (rows, h, v, pw) in enumerate(padded):
                for by in range(v):
                    for bx in range(h):
                        oy, ox = (my * v + by) * 8, (mx * h + bx) * 8
                        block = [rows[oy + y][ox : ox + 8] for y in range(8)]
                        dc_pred[ci] = _encode_block(w, block, dc_pred[ci])
            mcu_count += 1
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _zz_block(rows, oy, ox):
    """Quantized (all-ones) zigzag coefficients of one 8x8 block —
    bit-identical to what _encode_block feeds the baseline stream, so
    the progressive re-encode below carries the SAME coefficients."""
    block = [[rows[oy + y][ox + x] - 128 for x in range(8)] for y in range(8)]
    co = _fdct(block)
    return [int(round(co[idx // 8][idx % 8])) for idx in ZIGZAG]


def encode_jpeg_progressive(
    pixels,
    width,
    height,
    channels,
    subsample=False,
    restart_interval=0,
    band_split=6,
):
    """Independent progressive (SOF2) encoder — T.81 Annex G with
    spectral selection (bands [1, band_split-1] and [band_split, 63])
    and one successive-approximation level (Al=1 first scans, Ah=1/Al=0
    refinement scans), EOB runs, ZRL-in-refinement, and optional
    restart intervals. Same color convert / subsample / padding / DCT /
    all-ones quantization as encode_jpeg, so both files carry identical
    coefficients and must decode to identical pixels."""
    # identical plane prep to encode_jpeg
    if channels == 3:
        yp, cbp, crp = [], [], []
        for i in range(width * height):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            yv = 0.299 * r + 0.587 * g + 0.114 * b
            cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
            yp.append(min(255, max(0, int(round(yv)))))
            cbp.append(min(255, max(0, int(round(cb)))))
            crp.append(min(255, max(0, int(round(cr)))))
        if subsample:
            cw, chh = (width + 1) // 2, (height + 1) // 2
            subs = []
            for plane in (cbp, crp):
                sp = []
                for y in range(chh):
                    for x in range(cw):
                        vals = []
                        for dy in (0, 1):
                            for dx in (0, 1):
                                yy = min(2 * y + dy, height - 1)
                                xx = min(2 * x + dx, width - 1)
                                vals.append(plane[yy * width + xx])
                        sp.append(int(round(sum(vals) / len(vals))))
                subs.append(sp)
            planes = [
                (yp, width, height, 2, 2),
                (subs[0], cw, chh, 1, 1),
                (subs[1], cw, chh, 1, 1),
            ]
        else:
            planes = [
                (yp, width, height, 1, 1),
                (cbp, width, height, 1, 1),
                (crp, width, height, 1, 1),
            ]
    else:
        planes = [(list(pixels), width, height, 1, 1)]

    hmax = max(p[3] for p in planes)
    vmax = max(p[4] for p in planes)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # per-component coefficient grids over the FULL padded interleave
    # grid (DC scans cover it) plus the non-interleaved AC grid bound
    blocks = []  # [comp] -> {(by, bx): zz}
    grids = []  # [comp] -> (bw, bh, nbw, nbh, h, v)
    for plane, w_, h_, h, v in planes:
        pw, ph = mcux * h * 8, mcuy * v * 8
        rows = _plane(plane, w_, h_, 0, 1, pw, ph)
        bw, bh = mcux * h, mcuy * v
        nbw = (-(-(width * h) // hmax) + 7) // 8
        nbh = (-(-(height * v) // vmax) + 7) // 8
        blocks.append(
            {
                (by, bx): _zz_block(rows, by * 8, bx * 8)
                for by in range(bh)
                for bx in range(bw)
            }
        )
        grids.append((bw, bh, nbw, nbh, h, v))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for i, (_, _, _, h, v) in enumerate(planes):
        sof += bytes([i + 1, (h << 4) | v, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    out += _dht_segment(0, 0, _DC_SYMS, 4)
    out += _dht_segment(1, 0, _AC_SYMS, 8)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(
            ">H", restart_interval
        )

    rst_state = [0]

    def sos_header(comp_ids, ss, se, ah, al):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    def emit_restart(w):
        w.flush()
        out.extend(w.out)
        w.out = bytearray()
        out.extend(bytes([0xFF, 0xD0 + rst_state[0]]))
        rst_state[0] = (rst_state[0] + 1) % 8

    def dc_scan(al, first):
        out.extend(sos_header(list(range(1, ncomp + 1)), 0, 0, 0 if first else al + 1, al))
        rst_state[0] = 0
        w = _BitWriter()
        preds = [0] * ncomp
        count = 0
        if ncomp == 1:
            # single-component frame: non-interleaved one-block MCUs
            bw, bh, nbw, nbh, h, v = grids[0]
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and count and count % restart_interval == 0:
                        emit_restart(w)
                        preds = [0]
                    dc = blocks[0][(by, bx)][0]
                    if first:
                        pt = dc >> al  # arithmetic shift: the DC point transform
                        diff = pt - preds[0]
                        preds[0] = pt
                        s = _size_cat(diff)
                        code, ln = _DC_CODES[s]
                        w.write(code, ln)
                        if s:
                            w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
                    else:
                        w.write((dc >> al) & 1, 1)
                    count += 1
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and count and count % restart_interval == 0:
                        emit_restart(w)
                        preds = [0] * ncomp
                    for ci in range(ncomp):
                        bw, bh, nbw, nbh, h, v = grids[ci]
                        for by in range(v):
                            for bx in range(h):
                                dc = blocks[ci][(my * v + by, mx * h + bx)][0]
                                if first:
                                    pt = dc >> al
                                    diff = pt - preds[ci]
                                    preds[ci] = pt
                                    s = _size_cat(diff)
                                    code, ln = _DC_CODES[s]
                                    w.write(code, ln)
                                    if s:
                                        w.write(
                                            diff if diff > 0 else diff + (1 << s) - 1, s
                                        )
                                else:
                                    w.write((dc >> al) & 1, 1)
                    count += 1
        w.flush()
        out.extend(w.out)

    def ac_first_scan(ci, ss, se, al):
        out.extend(sos_header([ci + 1], ss, se, 0, al))
        rst_state[0] = 0
        w = _BitWriter()
        eob = [0]

        def flush_eob():
            if eob[0]:
                r = eob[0].bit_length() - 1
                code, ln = _AC_CODES[r << 4]
                w.write(code, ln)
                if r:
                    w.write(eob[0] - (1 << r), r)
                eob[0] = 0

        bw, bh, nbw, nbh, h, v = grids[ci]
        count = 0
        for by in range(nbh):
            for bx in range(nbw):
                if restart_interval and count and count % restart_interval == 0:
                    flush_eob()
                    emit_restart(w)
                count += 1
                zz = blocks[ci][(by, bx)]
                vals = []
                for k in range(ss, se + 1):
                    vv = zz[k]
                    # AC point transform: truncate toward zero
                    vals.append(-((-vv) >> al) if vv < 0 else vv >> al)
                last = -1
                for i, vv in enumerate(vals):
                    if vv:
                        last = i
                if last < 0:
                    eob[0] += 1
                    if eob[0] == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                r = 0
                for i in range(last + 1):
                    vv = vals[i]
                    if vv == 0:
                        r += 1
                        continue
                    while r > 15:
                        code, ln = _AC_CODES[0xF0]
                        w.write(code, ln)
                        r -= 16
                    s = _size_cat(vv)
                    code, ln = _AC_CODES[(r << 4) | s]
                    w.write(code, ln)
                    w.write(vv if vv > 0 else vv + (1 << s) - 1, s)
                    r = 0
                if last < se - ss:
                    eob[0] += 1
        flush_eob()
        w.flush()
        out.extend(w.out)

    def ac_refine_scan(ci, ss, se, al):
        out.extend(sos_header([ci + 1], ss, se, al + 1, al))
        rst_state[0] = 0
        w = _BitWriter()
        eob = [0]
        pend: list[int] = []  # correction bits riding an EOB run

        def flush_eob():
            if eob[0]:
                r = eob[0].bit_length() - 1
                code, ln = _AC_CODES[r << 4]
                w.write(code, ln)
                if r:
                    w.write(eob[0] - (1 << r), r)
                for b in pend:
                    w.write(b, 1)
                pend.clear()
                eob[0] = 0

        bw, bh, nbw, nbh, h, v = grids[ci]
        count = 0
        for by in range(nbh):
            for bx in range(nbw):
                if restart_interval and count and count % restart_interval == 0:
                    flush_eob()
                    emit_restart(w)
                count += 1
                zz = blocks[ci][(by, bx)]
                absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
                pos = [zz[k] >= 0 for k in range(ss, se + 1)]
                last1 = -1  # index of the last NEWLY significant coef
                for i, t in enumerate(absv):
                    if t == 1:
                        last1 = i
                r = 0
                br: list[int] = []  # this block's buffered corrections
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    # ZRLs that cannot fold into the EOB run (libjpeg's
                    # k <= EOB guard — zeros past the last new coef ride
                    # the EOB run instead)
                    while r > 15 and i <= last1:
                        flush_eob()
                        code, ln = _AC_CODES[0xF0]
                        w.write(code, ln)
                        r -= 16
                        for b in br:
                            w.write(b, 1)
                        br = []
                    if t > 1:  # history-nonzero: one correction bit
                        br.append(t & 1)
                        continue
                    flush_eob()
                    code, ln = _AC_CODES[(r << 4) | 1]
                    w.write(code, ln)
                    w.write(1 if pos[i] else 0, 1)
                    for b in br:
                        w.write(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eob[0] += 1
                    pend.extend(br)
                    if eob[0] == 0x7FFF:
                        flush_eob()
        flush_eob()
        w.flush()
        out.extend(w.out)

    split = max(2, min(band_split, 63))
    dc_scan(1, first=True)
    for ci in range(ncomp):
        ac_first_scan(ci, 1, split - 1, 1)
    for ci in range(ncomp):
        ac_first_scan(ci, split, 63, 1)
    dc_scan(0, first=False)  # DC refinement (Ah=1, Al=0)
    for ci in range(ncomp):
        ac_refine_scan(ci, 1, split - 1, 0)
    for ci in range(ncomp):
        ac_refine_scan(ci, split, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)


def _max_err(a, b):
    return max(abs(x - y) for x, y in zip(a, b))


def test_flat_gray_block_is_near_exact():
    """A flat 8x8 field is DC-only: the roundtrip must reproduce the
    value within float rounding (<=1)."""
    for val in (0, 77, 128, 255):
        data = encode_jpeg(bytes([val] * 64), 8, 8, 1)
        d = decode_jpeg(data)
        assert (d["width"], d["height"], d["channels"]) == (8, 8, 1)
        assert _max_err(d["pixels"], bytes([val] * 64)) <= 1, val


def test_gray_gradient_non_multiple_of_8_roundtrip():
    """24x17 gradient (crop path: image is not an MCU multiple): with
    all-ones quant tables the error budget is FDCT+IDCT float rounding
    only."""
    width, height = 24, 17
    src = bytes(
        (3 * x + 7 * y + ((x * y) % 5)) % 256
        for y in range(height)
        for x in range(width)
    )
    d = decode_jpeg(encode_jpeg(src, width, height, 1))
    assert (d["width"], d["height"], d["channels"]) == (width, height, 1)
    assert len(d["pixels"]) == width * height
    assert _max_err(d["pixels"], src) <= 3


def test_color_444_roundtrip():
    width, height = 16, 16
    src = bytes(
        v
        for y in range(height)
        for x in range(width)
        for v in ((x * 16) % 256, (y * 16) % 256, (x * 7 + y * 11) % 256)
    )
    d = decode_jpeg(encode_jpeg(src, width, height, 3))
    assert (d["width"], d["height"], d["channels"]) == (width, height, 3)
    assert len(d["pixels"]) == width * height * 3
    # two lossy color transforms (encode + decode) plus DCT rounding
    assert _max_err(d["pixels"], src) <= 6


def test_color_420_subsampled_flat_regions():
    """4:2:0 exercises the multi-block MCU loop and the chroma
    upsample: flat color halves must come back near-exact even at half
    chroma resolution (no chroma detail to lose)."""
    width, height = 32, 16
    left, right = (200, 40, 40), (40, 40, 200)
    src = bytes(
        v
        for y in range(height)
        for x in range(width)
        for v in (left if x < 16 else right)
    )
    d = decode_jpeg(encode_jpeg(src, width, height, 3, subsample=True))
    assert (d["width"], d["height"], d["channels"]) == (width, height, 3)
    px = d["pixels"]
    # sample away from the color edge (chroma is half-res there)
    for x, want in ((4, left), (27, right)):
        got = tuple(px[(8 * width + x) * 3 : (8 * width + x) * 3 + 3])
        assert all(abs(g - w) <= 6 for g, w in zip(got, want)), (x, got)


def test_restart_intervals_reset_dc_predictors():
    width, height = 32, 8  # 4 MCUs at 1x1 sampling
    src = bytes((13 * x + 5 * y) % 256 for y in range(height) for x in range(width))
    plain = decode_jpeg(encode_jpeg(src, width, height, 1))
    rst = decode_jpeg(encode_jpeg(src, width, height, 1, restart_interval=1))
    assert plain["pixels"] == rst["pixels"]
    assert _max_err(rst["pixels"], src) <= 3


def test_idct_matches_numpy_reference():
    """Pin _idct_block against an independent numpy DCT-III matrix
    construction (orthonormal 2-D inverse DCT), on a deterministic
    coefficient block — the decoder's core math is not self-certified
    by the encoder roundtrip alone."""
    import numpy as np

    from etl_instagram_spark.multimodal.jpeg import _idct_block

    rng = np.random.RandomState(7)
    coeffs = rng.randint(-200, 200, size=(8, 8)).astype(float)
    # orthonormal DCT-II matrix M; IDCT2(X) = M.T @ X @ M
    M = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            M[u, x] = math.sqrt((1 if u == 0 else 2) / 8) * math.cos(
                (2 * x + 1) * u * math.pi / 16
            )
    ref = M.T @ coeffs @ M
    ref = np.clip(np.round(ref) + 128, 0, 255)
    got = _idct_block([int(c) for c in coeffs.flatten()])
    diff = np.abs(np.array(got).reshape(8, 8) - ref)
    # round-then-shift vs shift-then-round can differ by 1 at .5 edges
    assert diff.max() <= 1


def test_unsupported_and_malformed_raise_loudly():
    good = encode_jpeg(bytes(range(64)), 8, 8, 1)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(TypeError):
        decode_jpeg("not bytes")
    # flip SOF0 -> SOF9 (arithmetic sequential — still unsupported)
    arith = good.replace(b"\xff\xc0", b"\xff\xc9")
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(arith)
    # flip SOF0 -> SOF2 (r18: progressive is SUPPORTED now, but a
    # baseline full-band scan under a SOF2 header is a malformed
    # progressive scan header, not a decodable file)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="DC scan|spectral"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="truncated|marker|entropy"):
        decode_jpeg(good[: len(good) // 2])


def test_decode_images_jpeg_decoder(spark):
    """The Spark face: decoder='jpeg' fills meta from the real pixels
    inside the mapInPandas boundary, exactly like decoder='png'."""
    from etl_instagram_spark.multimodal.images import decode_images

    blobs = []
    for i, (w_, h_) in enumerate([(8, 8), (24, 17)]):
        src = bytes((x + y + i) % 256 for y in range(h_) for x in range(w_))
        blobs.append((f"b{i}", encode_jpeg(src, w_, h_, 1), "image", None))
    df = spark.createDataFrame(
        blobs,
        "id string, content binary, media_type string, "
        "meta struct<width int, height int, format string>",
    )
    out = {
        r["id"]: (r["meta"]["width"], r["meta"]["height"], r["meta"]["format"])
        for r in decode_images(df, decoder="jpeg").collect()
    }
    assert out == {"b0": (8, 8, "jpeg"), "b1": (24, 17, "jpeg")}


def test_pixel_features_real_multimodal_near_dup(spark):
    """The real multimodal near-dup path (decode → pixel statistics →
    embedding cosine): the SAME frame encoded losslessly (PNG) and
    lossily (baseline JPEG) lands at cosine ~1, a different frame
    (inverted) lands clearly lower, and non-decodable bytes yield a
    NULL embedding rather than a fabricated vector."""
    import math

    from etl_instagram_spark.multimodal.images import pixel_features
    from etl_instagram_spark.multimodal.png import encode_png

    width, height = 32, 24
    src = bytes(
        v
        for y in range(height)
        for x in range(width)
        for v in ((x * 8) % 256, (y * 10) % 256, (x * 3 + y * 5) % 256)
    )
    # the contrast frame is structurally different (flat dark color:
    # zero variance, one-bin histogram), not a global-stats twin like
    # an inversion would be
    flat = bytes([20, 20, 20] * (width * height))
    blobs = spark.createDataFrame(
        [
            ("png", encode_png(width, height, src, channels=3), "image", None),
            ("jpg", encode_jpeg(src, width, height, 3), "image", None),
            ("oth", encode_png(width, height, flat, channels=3), "image", None),
            ("bad", b"RIFF....WEBP", "image", None),
        ],
        "id string, content binary, media_type string, "
        "meta struct<width int, height int, format string>",
    )
    out = {r["id"]: r["embedding"] for r in pixel_features(blobs).collect()}
    assert out["bad"] is None
    assert len(out["png"]) == 16

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    same = cos(out["png"], out["jpg"])
    diff = cos(out["png"], out["oth"])
    assert same > 0.999, same
    assert diff < 0.9, (same, diff)


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2 permits any number of 0xFF fill bytes before a
    marker — insert runs of 0xFF before SOF0 and SOS and the walk must
    still land on the real markers instead of reading a garbage segment
    length (r14 advice)."""
    from etl_instagram_spark.multimodal.jpeg import jpeg_dims

    width, height = 16, 16
    src = bytes((x * 3 + y * 5) % 256 for y in range(height) for x in range(width))
    good = encode_jpeg(src, width, height, 1)
    plain = decode_jpeg(good)
    i = good.index(b"\xff\xc0")
    padded = good[:i] + b"\xff\xff\xff" + good[i:]
    j = padded.index(b"\xff\xda")
    padded = padded[:j] + b"\xff" + padded[j:]
    assert decode_jpeg(padded) == plain
    assert jpeg_dims(padded) == (width, height)


def test_gray_scan_forces_one_data_unit_mcu():
    """A single-component scan is non-interleaved with MCU = one data
    unit (T.81 A.2.2) — the SOF sampling factors only shape
    multi-component interleaving. Patch a plain gray file's hv byte
    from 1x1 to 2x2 and the pixels must be unchanged (r14 advice:
    previously decoded with h×v-block MCU geometry → block-scrambled
    or erroring)."""
    width, height = 24, 16
    src = bytes((x * 7 + y * 11) % 256 for y in range(height) for x in range(width))
    good = encode_jpeg(src, width, height, 1)
    i = good.index(b"\xff\xc0")
    assert good[i + 11] == 0x11  # component 0's hv byte in the SOF
    patched = good[: i + 11] + bytes([0x22]) + good[i + 12 :]
    assert decode_jpeg(patched) == decode_jpeg(good)


def test_jpeg_dims_header_only_matches_decoder():
    """jpeg_dims reads width/height from the SOF0 header alone (the
    decode_images metadata path — r14 advice: full Huffman+IDCT per
    blob for dims already in the header) and rejects the same
    non-baseline inputs as the full decoder."""
    import pytest

    from etl_instagram_spark.multimodal.jpeg import jpeg_dims

    for w_, h_ in [(8, 8), (24, 17), (16, 16)]:
        src = bytes((x + y) % 256 for y in range(h_) for x in range(w_))
        data = encode_jpeg(src, w_, h_, 1)
        d = decode_jpeg(data)
        assert jpeg_dims(data) == (d["width"], d["height"]) == (w_, h_)
    good = encode_jpeg(bytes(64), 8, 8, 1)
    # r18: SOF2 headers are readable now; arithmetic SOFs still gate
    assert jpeg_dims(good.replace(b"\xff\xc0", b"\xff\xc2")) == (8, 8)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jpeg_dims(good.replace(b"\xff\xc0", b"\xff\xc9"))
    with pytest.raises(ValueError):
        jpeg_dims(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(TypeError):
        jpeg_dims("not bytes")


def test_numpy_engine_byte_identical_to_stdlib():
    """The batched numpy IDCT/upsample/color path must reproduce the
    stdlib reference loops BYTE-FOR-BYTE across every decode shape:
    gray, 4:4:4 color, 4:2:0 subsampled, non-multiple-of-8 crops,
    restart intervals, and adversarial flat/noise content — the
    same-order-accumulation argument in _render_np's docstring, made
    empirical (r15)."""
    import random

    rng = random.Random(4242)
    cases = []
    for w_, h_ in [(8, 8), (24, 17), (64, 64), (31, 9)]:
        gray = bytes(rng.randrange(256) for _ in range(w_ * h_))
        cases.append(encode_jpeg(gray, w_, h_, 1))
        rgb = bytes(rng.randrange(256) for _ in range(w_ * h_ * 3))
        cases.append(encode_jpeg(rgb, w_, h_, 3))
    cases.append(encode_jpeg(bytes([128] * 16 * 16 * 3), 16, 16, 3, subsample=True))
    noisy = bytes(rng.randrange(256) for _ in range(32 * 32 * 3))
    cases.append(encode_jpeg(noisy, 32, 32, 3, subsample=True))
    cases.append(encode_jpeg(bytes(range(64)), 8, 8, 1, restart_interval=1))
    for i, data in enumerate(cases):
        ref = decode_jpeg(data, engine="stdlib")
        fast = decode_jpeg(data, engine="numpy")
        assert fast == ref, f"case {i}: numpy path diverged from stdlib"
    import pytest

    with pytest.raises(ValueError, match="engine"):
        decode_jpeg(cases[0], engine="turbo")


def test_huffman_fast_path_matches_bitwalk_reference():
    """The r16 two-level Huffman fast path (8-bit peek table + 9..16
    prefix walk) decodes the identical symbol stream a per-bit
    reference walk does — exercised on a table that FORCES both levels
    (code lengths 1..11), over byte-stuffed data containing 0xFF00."""
    import random

    from etl_instagram_spark.multimodal.jpeg import _BitReader, _HuffTable

    # canonical table: 1 code at each length 1..11 -> long codes are
    # all-ones prefixes, so random payloads hit the slow path too
    bits = [1] * 11 + [0] * 5
    huffval = list(range(11))
    table = _HuffTable(bits, huffval)
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1

    rng = random.Random(99)
    syms = [rng.randrange(11) for _ in range(5000)]
    bitstr = "".join(
        format(codes[s][0], f"0{codes[s][1]}b") for s in syms
    )
    bitstr += "1" * ((8 - len(bitstr) % 8) % 8)
    raw = bytes(
        int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8)
    )
    stuffed = raw.replace(b"\xff", b"\xff\x00")

    got = []
    reader = _BitReader(stuffed, 0)
    for _ in syms:
        got.append(table.decode(reader))
    assert got == syms

    # per-bit reference walk over the same (length, code) -> symbol map
    ref = []
    pos = 0
    unstuffed = stuffed.replace(b"\xff\x00", b"\xff")
    allbits = "".join(format(b, "08b") for b in unstuffed)
    for _ in syms:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | int(allbits[pos])
            pos += 1
            if (length, code) in table.lookup:
                ref.append(table.lookup[(length, code)])
                break
    assert ref == syms


def test_progressive_decodes_identical_to_baseline():
    """r18 differential: progressive (SOF2) re-encode of the SAME
    quantized coefficients — spectral selection, successive
    approximation (Al=1 firsts + refinements), EOB runs — must decode
    BYTE-IDENTICAL to the baseline sibling, across gray / 4:4:4 /
    4:2:0 / non-multiple-of-8 / restart-interval shapes."""
    shapes = [
        (8, 8, 1, False, 0),
        (24, 17, 1, False, 0),
        (16, 16, 3, False, 0),
        (20, 13, 3, True, 0),
        (24, 17, 1, False, 2),
        (20, 13, 3, True, 2),
    ]
    for w, h, ch, sub, ri in shapes:
        n = w * h * ch
        px = bytes(((x * 7 + i * 13) % 256) for i, x in enumerate(range(n)))
        base = encode_jpeg(px, w, h, ch, subsample=sub, restart_interval=ri)
        prog = encode_jpeg_progressive(
            px, w, h, ch, subsample=sub, restart_interval=ri
        )
        db = decode_jpeg(base)
        dp = decode_jpeg(prog)
        assert (dp["width"], dp["height"], dp["channels"]) == (
            db["width"],
            db["height"],
            db["channels"],
        ), (w, h, ch, sub, ri)
        assert dp["pixels"] == db["pixels"], (w, h, ch, sub, ri)
        from etl_instagram_spark.multimodal.jpeg import jpeg_dims

        assert jpeg_dims(prog) == (w, h)


def test_progressive_eob_runs_and_sparse_blocks():
    """Mostly-flat images make the AC first scans one long EOB run
    (with the run-length extension bits live) and give the refinement
    scans entire bands of correction-free blocks; a lone bright pixel
    plants high-frequency coefficients that must survive the band
    split. Both engines must agree with baseline byte-for-byte."""
    w = h = 40  # 25 blocks, almost all AC-empty -> EOBn with r > 0
    px = bytearray([128] * (w * h))
    px[0] = 255  # one hot corner block
    px[33 * w + 33] = 0  # one dark block far into the grid
    base = encode_jpeg(bytes(px), w, h, 1)
    prog = encode_jpeg_progressive(bytes(px), w, h, 1)
    db = decode_jpeg(base)
    dp = decode_jpeg(prog)
    assert dp["pixels"] == db["pixels"]
    # stdlib engine renders the same store identically
    dp2 = decode_jpeg(prog, engine="stdlib")
    assert dp2["pixels"] == db["pixels"]


def test_progressive_dc_only_preview_renders():
    """A progressive file truncated after the DC scans (plus EOI) is a
    VALID partial file — the decoder renders the accumulated store (the
    low-frequency preview progressive was designed for) instead of
    refusing: every 8x8 tile is flat at its DC level."""
    w, h = 16, 16
    px = bytes([40] * 64 + [200] * 64 + [90] * 64 + [160] * 64)
    # build with only the DC first + DC refinement scans by slicing the
    # full progressive stream at the first AC SOS
    full = encode_jpeg_progressive(px, w, h, 1)
    # find the second SOS (first AC scan) and cut there
    first_sos = full.index(b"\xff\xda")
    second_sos = full.index(b"\xff\xda", first_sos + 2)
    partial = full[:second_sos] + b"\xff\xd9"
    d = decode_jpeg(partial)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 1)
    # DC-only render: each tile is flat (all 64 samples equal)
    pix = d["pixels"]
    for ty in (0, 8):
        for tx in (0, 8):
            tile = {pix[(ty + y) * w + tx + x] for y in range(8) for x in range(8)}
            assert len(tile) == 1, (ty, tx, tile)


def test_progressive_scan_header_validation():
    """Malformed progressive scan scripts refuse loudly: AC before the
    component's DC scan, multi-component AC scans, bad spectral bands,
    and inconsistent successive-approximation bits."""
    px = bytes(range(64))
    full = encode_jpeg_progressive(px, 8, 8, 1)

    def patch_sos(data, which, new_fields):
        """Rewrite scan header #which's (Ss, Se, AhAl)."""
        i = -2
        for _ in range(which + 1):
            i = data.index(b"\xff\xda", i + 2)
        (ln,) = struct.unpack(">H", data[i + 2 : i + 4])
        body = bytearray(data[i + 4 : i + 2 + ln])
        body[-3:] = bytes(new_fields)
        return data[: i + 4] + bytes(body) + data[i + 2 + ln :]

    # first scan (DC) rewritten to claim an AC band -> AC-before-DC
    bad = patch_sos(full, 0, (1, 5, 0x10))
    with pytest.raises(ValueError, match="before the component's first DC"):
        decode_jpeg(bad)
    # DC scan with Se != 0
    bad = patch_sos(full, 0, (0, 5, 0x01))
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bad)
    # AC refinement with Ah != Al + 1
    bad = patch_sos(full, 1, (1, 5, 0x31))
    with pytest.raises(ValueError, match="Ah"):
        decode_jpeg(bad)
    # spectral band upside down
    bad = patch_sos(full, 1, (9, 5, 0x01))
    with pytest.raises(ValueError, match="spectral band"):
        decode_jpeg(bad)


def test_sof1_extended_sequential_8bit_decodes_as_baseline():
    """r18: 8-bit SOF1 is baseline syntax with more Huffman-table
    slots — a SOF0 stream relabeled SOF1 decodes byte-identical, and
    jpeg_dims reads its header; the 12-bit form still gates on the
    precision check."""
    from etl_instagram_spark.multimodal.jpeg import jpeg_dims

    px = bytes(((x * 5 + 11) % 256) for x in range(24 * 17))
    base = encode_jpeg(px, 24, 17, 1)
    ext = base.replace(b"\xff\xc0", b"\xff\xc1")
    assert decode_jpeg(ext)["pixels"] == decode_jpeg(base)["pixels"]
    assert jpeg_dims(ext) == (24, 17)
    # 12-bit SOF1: precision byte is the first SOF payload byte
    i = ext.index(b"\xff\xc1") + 4
    twelve = ext[:i] + bytes([12]) + ext[i + 1 :]
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(twelve)
