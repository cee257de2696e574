"""Numpy-only JPEG codec (ITU-T T.81 / ISO 10918-1) — r9 late: closes
the LAST image env seam. JPEG is lossy, so unlike PNG/TIFF/FLAC the
general hash gate uses the provably-lossless constant-block class;
conformance lives in pytest: hand-derived DC-only blocks, a naive
O(N^4) cosine-formula IDCT twin, and round-trip error bounds
(tests/test_jpeg.py).

Decoder: SOI/APPn/COM/DQT/DHT/DRI/SOF/SOS/EOI marker walk, arbitrary
quantization and Huffman tables (8- and 16-bit DQT precision),
interleaved MCUs with any sampling factors (4:4:4, 4:2:2, 4:2:0, ...),
restart markers, byte destuffing, per-component DC prediction, EXTEND
sign decoding, dezigzag, dequantize, matrix-form 8x8 IDCT, nearest
upsampling, JFIF YCbCr -> RGB. BOTH baseline sequential (SOF0/SOF1)
and PROGRESSIVE (SOF2 — what most real web JPEGs are): spectral
selection, successive approximation (DC and AC first/refine scans,
EOB runs, the T.81 G.2 correction-bit algorithm), interleaved and
non-interleaved scan geometry. Scans accumulate into per-component
zigzag coefficient planes; dequantize + IDCT happen once at EOI.
Lossless (SOF3) and arithmetic-coded variants raise a named error.

Encoders: `write_jpeg` (baseline: gray/4:4:4/4:2:0, quality-scaled
quantization, optional restart intervals) and `write_jpeg_progressive`
(SOF2 scan script with DC+AC successive approximation), both using
self-generated spec-valid canonical tables (4-bit DC / 9-bit AC codes
— embedded in DHT like any table, so nothing depends on transcribing
the Annex K constants), 0xFF byte stuffing throughout.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_jpeg", "write_jpeg", "write_jpeg_progressive"]

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# 8x8 DCT-II basis matrix: spatial = C.T @ coeff @ C
_C = np.array([
    [
        (np.sqrt(0.125) if k == 0 else 0.5)
        * np.cos((2 * n + 1) * k * np.pi / 16)
        for n in range(8)
    ]
    for k in range(8)
])


def _idct2(coeff: np.ndarray) -> np.ndarray:
    return _C.T @ coeff @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _HuffTable:
    """Canonical Huffman table from the DHT (BITS, HUFFVAL) form."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        self.encode: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                self.encode[vals[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _EntropyReader:
    """MSB-first bit reader over the entropy-coded segment: destuffs
    0xFF00, stops before any other marker, skips restart markers via
    :meth:`restart`."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d, p = self.data, self.pos
        if p >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt == 0x00:
                self.pos = p + 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise ValueError("hit restart marker mid-symbol")
            else:
                raise ValueError("hit marker inside entropy data")
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d, p = self.data, self.pos
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2
        else:
            raise ValueError("expected restart marker")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def read_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes -> (H, W) uint8 grayscale or
    (H, W, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    try:
        return _read_jpeg_markers(data)
    except (struct.error, IndexError, KeyError) as exc:
        raise ValueError(f"truncated or malformed JPEG: {exc}") from exc


def _skip_to_marker(data: bytes, p: int) -> int:
    """Advance past entropy data (and padding) to the next non-RST,
    non-stuffing marker."""
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return n


def _refine_nonzero(er: _EntropyReader, blk: np.ndarray, k: int,
                    bit: int) -> None:
    """AC successive-approximation correction bit (T.81 G.2.2)."""
    if er.read_bit():
        if blk[k] >= 0:
            blk[k] += bit
        else:
            blk[k] -= bit


def _decode_scan(data, pos_after_sos, seg, sof, huff, restart_interval,
                 coef, progressive):
    """Decode one entropy-coded scan into the per-component zigzag
    coefficient planes ``coef[cid]`` of shape (nby, nbx, 64).

    Handles baseline full-block scans (Ss=0, Se=63) and all four
    progressive scan kinds: DC first/refine (interleaved or not) and
    AC first/refine (always one component). Returns the byte position
    of the next marker."""
    height, width, comps = sof
    ns = seg[0]
    sel = {}
    order = []
    for c in range(ns):
        cs, tdta = struct.unpack_from(">BB", seg, 1 + 2 * c)
        sel[cs] = (tdta >> 4, tdta & 0xF)
        order.append(next(cc for cc in comps if cc["id"] == cs))
    ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0xF
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    er = _EntropyReader(data, pos_after_sos)
    pred = {c["id"]: 0 for c in comps}
    state = {"eobrun": 0}

    def decode_block_full(blk, dct, act):
        s = er.decode(dct)
        diff = _extend(er.read(s), s) if s else 0
        pred[cid] = pred[cid] + diff
        blk[0] = pred[cid]
        k = 1
        while k <= se:
            rs = er.decode(act)
            r, sz = rs >> 4, rs & 0xF
            if sz == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC run overflow")
            blk[k] = _extend(er.read(sz), sz)
            k += 1

    def decode_dc_first(blk, dct):
        s = er.decode(dct)
        diff = _extend(er.read(s), s) if s else 0
        pred[cid] = pred[cid] + diff
        blk[0] = pred[cid] << al

    def decode_dc_refine(blk):
        if er.read_bit():
            blk[0] |= 1 << al

    def decode_ac_first(blk, act):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = er.decode(act)
            r, sz = rs >> 4, rs & 0xF
            if sz == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += er.read(r)
                    return
                k += 16
                continue
            k += r
            if k > se:
                raise ValueError("AC run overflow in progressive scan")
            blk[k] = _extend(er.read(sz), sz) << al
            k += 1

    def decode_ac_refine(blk, act):
        bit = 1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = er.decode(act)
                r, sz = rs >> 4, rs & 0xF
                val = 0
                if sz == 0:
                    if r != 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += er.read(r)
                        break
                    # ZRL: skip 16 zero-history coefficients
                else:
                    val = bit if er.read_bit() else -bit
                while k <= se:
                    if blk[k] != 0:
                        _refine_nonzero(er, blk, k, bit)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0:
                    _refine_nonzero(er, blk, k, bit)
                k += 1
            state["eobrun"] -= 1

    def do_block(c, by, bx):
        td, ta = sel[c["id"]]
        blk = coef[c["id"]][by, bx]
        if ss == 0 and se == 63:
            decode_block_full(blk, huff[(0, td)], huff[(1, ta)])
        elif ss == 0 and se == 0:
            if ah == 0:
                decode_dc_first(blk, huff[(0, td)])
            else:
                decode_dc_refine(blk)
        else:
            if ah == 0:
                decode_ac_first(blk, huff[(1, ta)])
            else:
                decode_ac_refine(blk, huff[(1, ta)])

    if ns == 1:
        # non-interleaved (T.81: the MCU is one block): the
        # component's own block grid, whatever the scan type
        c = order[0]
        cw = -(-(width * c["h"]) // hmax)
        ch = -(-(height * c["v"]) // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)
        nunit = 0
        cid = c["id"]
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and nunit and nunit % restart_interval == 0:
                    er.restart()
                    pred[cid] = 0
                    state["eobrun"] = 0
                do_block(c, by, bx)
                nunit += 1
    else:
        nmcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and nmcu and nmcu % restart_interval == 0:
                    er.restart()
                    for c in order:
                        pred[c["id"]] = 0
                    state["eobrun"] = 0
                for c in order:
                    cid = c["id"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            do_block(c, my * c["v"] + by, mx * c["h"] + bx)
                nmcu += 1
    return _skip_to_marker(data, er.pos)


def _read_jpeg_markers(data: bytes) -> np.ndarray:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    sof = None
    progressive = False
    restart_interval = 0
    coef: dict[int, np.ndarray] = {}
    saw_scan = False
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2")
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i : i + 64], dtype="u1")
                    i += 64
                dez = np.zeros(64, dtype=np.int64)
                dez[_ZIGZAG] = tbl.astype(np.int64)
                qt[tid] = dez.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog.
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            sof = (h, w, comps)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                coef[c["id"]] = np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential (SOF0/SOF1) and progressive "
                f"(SOF2) JPEG supported; got SOF marker 0x{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF")
            pos = _decode_scan(
                data, pos + seglen, seg, sof, huff, restart_interval,
                coef, progressive,
            )
            saw_scan = True
            continue
        pos += seglen
    if not saw_scan:
        raise ValueError("no SOS segment found")

    height, width, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for c in comps:
        zz = coef[c["id"]]
        nby, nbx, _ = zz.shape
        blocks = np.zeros((nby, nbx, 64), dtype=np.int64)
        blocks[:, :, _ZIGZAG] = zz
        q = qt[c["tq"]].reshape(-1)
        spatial = np.einsum(
            "ki,yxij,jl->yxkl",
            _C.T,
            (blocks * q).reshape(nby, nbx, 8, 8).astype(np.float64),
            _C,
        )
        plane = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:height, :width])
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0] + 128), 0, 255)
        return g.astype(np.uint8)
    y, cb, cr = out_planes[0] + 128, out_planes[1], out_planes[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -- encoder ---------------------------------------------------------------

# Our own spec-valid canonical tables (embedded in DHT; the decoder —
# any decoder — reads them from the stream, so nothing depends on the
# Annex K "typical" tables): 4-bit codes for the 12 DC categories,
# 9-bit codes for all 162 baseline AC symbols.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _fixed_table(syms: list[int], length: int) -> tuple[list[int], list[int]]:
    assert len(syms) < (1 << length)
    bits = [0] * 16
    bits[length - 1] = len(syms)
    return bits, list(syms)


_DC_BITS, _DC_VALS = _fixed_table(_DC_SYMS, 4)
_AC_BITS, _AC_VALS = _fixed_table(_AC_SYMS, 9)

# Monotone base quantization matrix (flat-ish low frequencies, rising
# toward high frequencies); any DQT-carried matrix is spec-valid.
_QBASE = np.array(
    [[16 + 4 * (u + v) for v in range(8)] for u in range(8)], dtype=np.int64
)


def _qtable(quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (_QBASE * scale + 50) // 100
    return np.clip(t, 1, 255)


class _EntropyWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _encode_block(
    ew: _EntropyWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dct: _HuffTable,
    act: _HuffTable,
) -> int:
    coeff = np.round(_fdct2(block.astype(np.float64)) / q).astype(np.int64)
    zz = coeff.reshape(-1)[_ZIGZAG]
    diff = int(zz[0]) - pred

    def mag(v: int) -> tuple[int, int]:
        s = int(abs(v)).bit_length()
        return s, (v if v >= 0 else v + (1 << s) - 1)

    s, bitsv = mag(diff)
    code, ln = dct.encode[s]
    ew.write(code, ln)
    if s:
        ew.write(bitsv, s)
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = act.encode[0x00]  # EOB
                ew.write(code, ln)
                break
            run += 1
            continue
        while run > 15:
            code, ln = act.encode[0xF0]  # ZRL
            ew.write(code, ln)
            run -= 16
        s, bitsv = mag(v)
        code, ln = act.encode[(run << 4) | s]
        ew.write(code, ln)
        ew.write(bitsv, s)
        run = 0
    return int(zz[0])


def write_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 as baseline
    JPEG. ``subsample=True`` uses 4:2:0 chroma (2x2 mean); quality
    1-100 scales the quantization matrix libjpeg-style."""
    a = np.asarray(arr)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"need (H, W) or (H, W, 3), got {a.shape}")
    h, w = a.shape[:2]
    q = _qtable(quality)
    dct, act = _HuffTable(_DC_BITS, _DC_VALS), _HuffTable(_AC_BITS, _AC_VALS)

    if gray:
        planes = [a.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            def ds(p):
                ph = (p.shape[0] + 1) // 2 * 2
                pw = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                            mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2]
                        + pp[1::2, 1::2]) / 4.0
            planes = [y, ds(cb), ds(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = 8 * mcuy * sv, 8 * mcux * sh
        padded.append(
            np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                   mode="edge")
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00"      # identifier
        + b"\x01\x01"      # version 1.1
        + b"\x00"          # units: none
        + b"\x00\x01\x00\x01"  # aspect ratio 1:1
        + b"\x00\x00"      # no thumbnail
    )
    zzq = q.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zzq
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i in range(nc):
        out += struct.pack(
            ">BBB", i + 1, (samp[i][0] << 4) | samp[i][1], 0
        )
    for cls, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([cls << 4]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        out += struct.pack(">BB", i + 1, 0x00)
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl

    ew = _EntropyWriter()
    pred = [0] * nc
    nmcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                ew.flush()
                out += bytes(ew.out)
                ew = _EntropyWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = [0] * nc
            for ci in range(nc):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(ew, block, q, pred[ci],
                                                 dct, act)
            nmcu += 1
    ew.flush()
    out += bytes(ew.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- progressive encoder ---------------------------------------------------

def _color_planes(a: np.ndarray, subsample: bool):
    """Shared color/space prep: returns (planes, samp) as write_jpeg."""
    gray = a.ndim == 2
    if gray:
        return [a.astype(np.float64) - 128.0], [(1, 1)]
    rgb = a.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    if not subsample:
        return [y, cb, cr], [(1, 1), (1, 1), (1, 1)]

    def ds(p):
        ph = (p.shape[0] + 1) // 2 * 2
        pw = (p.shape[1] + 1) // 2 * 2
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                    mode="edge")
        return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2]
                + pp[1::2, 1::2]) / 4.0

    return [y, ds(cb), ds(cr)], [(2, 2), (1, 1), (1, 1)]


def _mag_bits(v: int) -> tuple[int, int]:
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def write_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    successive: bool = True,
) -> bytes:
    """Encode (H, W) gray or (H, W, 3) RGB uint8 as PROGRESSIVE
    (SOF2) JPEG — the variant most real web JPEGs use. Scan script:
    one interleaved DC scan (at point transform 1 when ``successive``)
    + DC refinement, then per component an AC 1-63 scan (Al=1 when
    ``successive``) + an AC successive-approximation refinement scan
    (the correction-bit algorithm of T.81 G.1.2.3). With
    ``successive=False`` only spectral selection is used. Same
    quantization and self-generated canonical tables as the baseline
    writer, so ``read_jpeg(write_jpeg_progressive(x))`` exercises
    every progressive decode path."""
    a = np.asarray(arr)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"need (H, W) or (H, W, 3), got {a.shape}")
    h, w = a.shape[:2]
    q = _qtable(quality)
    dct, act = _HuffTable(_DC_BITS, _DC_VALS), _HuffTable(_AC_BITS, _AC_VALS)
    planes, samp = _color_planes(a, subsample)
    nc = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # quantized zigzag coefficient planes per component
    coef = []
    for p, (sh, sv) in zip(planes, samp):
        nby, nbx = mcuy * sv, mcux * sh
        pp = np.pad(
            p,
            ((0, nby * 8 - p.shape[0]), (0, nbx * 8 - p.shape[1])),
            mode="edge",
        )
        blocks = pp.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        # per-block _fdct2, NOT a fused einsum: the two-matmul
        # association order must match write_jpeg exactly, or .5-
        # boundary coefficients round differently between the two
        # encoders of the same image
        cz = np.empty((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                cz[by, bx] = (
                    np.round(_fdct2(blocks[by, bx]) / q)
                    .astype(np.int64)
                    .reshape(-1)
                )
        # store in ZIGZAG order (index k = zigzag position), matching
        # the decoder's coefficient planes
        coef.append(cz[..., _ZIGZAG])
    al_dc = 1 if successive else 0
    al_ac = 1 if successive else 0

    out = bytearray(b"\xff\xd8")
    zzq = q.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zzq
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i in range(nc):
        out += struct.pack(">BBB", i + 1, (samp[i][0] << 4) | samp[i][1], 0)
    for cls, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([cls << 4]) + bytes(bits) + bytes(vals)

    def sos_header(comp_ids, ss, se, ah, al):
        seg = bytearray()
        seg += struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for ci in comp_ids:
            seg += struct.pack(">BB", ci + 1, 0x00)
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + bytes(seg)

    # scan 1: interleaved DC first at Al=al_dc
    out += sos_header(list(range(nc)), 0, 0, 0, al_dc)
    ew = _EntropyWriter()
    pred = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(coef[ci][my * sv + by, mx * sh + bx, 0])
                        v = dc >> al_dc
                        s, bitsv = _mag_bits(v - pred[ci])
                        code, ln = dct.encode[s]
                        ew.write(code, ln)
                        if s:
                            ew.write(bitsv, s)
                        pred[ci] = v
    ew.flush()
    out += bytes(ew.out)

    # scan 2: DC refinement (one raw bit per block, two's complement)
    if al_dc:
        out += sos_header(list(range(nc)), 0, 0, al_dc, 0)
        ew = _EntropyWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            dc = int(coef[ci][my * sv + by, mx * sh + bx, 0])
                            ew.write(dc & 1, 1)
        ew.flush()
        out += bytes(ew.out)

    # per component: AC first scan at Al=al_ac (non-interleaved)
    for ci in range(nc):
        sh, sv = samp[ci]
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)
        out += sos_header([ci], 1, 63, 0, al_ac)
        ew = _EntropyWriter()
        for by in range(nby):
            for bx in range(nbx):
                zz = coef[ci][by, bx]
                r = 0
                wrote = False
                for k in range(1, 64):
                    v = int(zz[k])
                    mag = abs(v) >> al_ac
                    if mag == 0:
                        r += 1
                        continue
                    while r > 15:
                        code, ln = act.encode[0xF0]
                        ew.write(code, ln)
                        r -= 16
                    s = mag.bit_length()
                    sv2 = mag if v > 0 else -mag
                    _, bitsv = _mag_bits(sv2)
                    code, ln = act.encode[(r << 4) | s]
                    ew.write(code, ln)
                    ew.write(bitsv, s)
                    r = 0
                    wrote = True
                if r > 0 or not wrote:
                    code, ln = act.encode[0x00]  # EOB (run of 1)
                    ew.write(code, ln)
        ew.flush()
        out += bytes(ew.out)

    # per component: AC successive-approximation refinement Ah=1 -> Al=0
    if al_ac:
        for ci in range(nc):
            sh, sv = samp[ci]
            cw = -(-(w * sh) // hmax)
            ch = -(-(h * sv) // vmax)
            nbx, nby = -(-cw // 8), -(-ch // 8)
            out += sos_header([ci], 1, 63, al_ac, 0)
            ew = _EntropyWriter()
            for by in range(nby):
                for bx in range(nbx):
                    zz = coef[ci][by, bx]
                    absv = [abs(int(zz[k])) for k in range(64)]
                    eobpos = 0
                    for k in range(1, 64):
                        if absv[k] == 1:
                            eobpos = k
                    r = 0
                    buffered: list[int] = []
                    for k in range(1, 64):
                        t = absv[k]
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and k <= eobpos:
                            code, ln = act.encode[0xF0]
                            ew.write(code, ln)
                            for b in buffered:
                                ew.write(b, 1)
                            buffered = []
                            r -= 16
                        if t > 1:
                            buffered.append(t & 1)
                            continue
                        code, ln = act.encode[(r << 4) | 1]
                        ew.write(code, ln)
                        ew.write(1 if int(zz[k]) > 0 else 0, 1)
                        for b in buffered:
                            ew.write(b, 1)
                        buffered = []
                        r = 0
                    if r > 0 or buffered:
                        code, ln = act.encode[0x00]  # EOB run of 1
                        ew.write(code, ln)
                        for b in buffered:
                            ew.write(b, 1)
            ew.flush()
            out += bytes(ew.out)

    out += b"\xff\xd9"
    return bytes(out)
