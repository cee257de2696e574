"""Numpy-only baseline JPEG codec (ITU-T T.81 / ISO 10918-1) — r9
late: upgrades the LAST image env seam from "raise NotImplementedError"
to a native decoder + encoder. JPEG is lossy, so unlike PNG/TIFF/FLAC
there is no lossless hash gate; conformance lives in pytest instead:
hand-derived DC-only blocks, a naive O(N^4) cosine-formula IDCT twin,
and round-trip error bounds (see tests/test_jpeg.py).

Decoder: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/EOI marker walk, arbitrary
quantization and Huffman tables (8- and 16-bit DQT precision),
interleaved MCUs with any sampling factors (4:4:4, 4:2:2, 4:2:0, ...),
restart markers, byte destuffing, per-component DC prediction, EXTEND
sign decoding, dezigzag, dequantize, matrix-form 8x8 IDCT, nearest
upsampling, JFIF YCbCr -> RGB. Baseline sequential (SOF0) only —
progressive (SOF2) raises a ValueError naming the limitation.

Encoder: grayscale or RGB at 4:4:4 or 4:2:0, quality-scaled
quantization, canonical Huffman tables GENERATED here (all 4-bit DC /
9-bit AC codes — spec-valid, embedded in DHT like any table; choosing
our own tables avoids transcribing the Annex K constants and changes
nothing for decoders, which must read DHT anyway), optional restart
intervals, 0xFF byte stuffing.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_jpeg", "write_jpeg"]

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


def _read_jpeg_markers(data: bytes) -> np.ndarray:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    sof = None
    restart_interval = 0
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            sof = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential (SOF0/SOF1) JPEG supported; "
                f"got SOF marker 0x{marker:02X} (progressive/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tdta = struct.unpack_from(">BB", seg, 1 + 2 * c)
                sel[cs] = (tdta >> 4, tdta & 0xF)
            height, width, comps = sof
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            planes = {}
            for c in comps:
                pw, ph = 8 * mcux * c["h"], 8 * mcuy * c["v"]
                planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)
            er = _EntropyReader(data, pos + seglen)
            pred = {c["id"]: 0 for c in comps}
            nmcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and nmcu and nmcu % restart_interval == 0:
                        er.restart()
                        pred = {c["id"]: 0 for c in comps}
                    for c in comps:
                        td, ta = sel[c["id"]]
                        dct, act = huff[(0, td)], huff[(1, ta)]
                        q = qt[c["tq"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                zz = np.zeros(64, dtype=np.int64)
                                s = er.decode(dct)
                                diff = _extend(er.read(s), s) if s else 0
                                pred[c["id"]] += diff
                                zz[0] = pred[c["id"]]
                                k = 1
                                while k < 64:
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
                                    zz[k] = _extend(er.read(sz), sz)
                                    k += 1
                                coeff = np.zeros(64, dtype=np.int64)
                                coeff[_ZIGZAG] = zz
                                block = _idct2(coeff.reshape(8, 8) * q)
                                y0 = (my * c["v"] + by) * 8
                                x0 = (mx * c["h"] + bx) * 8
                                planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
                    nmcu += 1
            out_planes = []
            for c in comps:
                p = planes[c["id"]]
                # nearest upsample to full-resolution grid
                ry, rx = vmax // c["v"], hmax // c["h"]
                p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
                out_planes.append(p[:height, :width])
            if len(out_planes) == 1:
                g = np.clip(np.round(out_planes[0] + 128), 0, 255)
                return g.astype(np.uint8)
            y, cb, cr = out_planes[0] + 128, out_planes[1], out_planes[2]
            r = y + 1.402 * cr
            g = y - 0.344136 * cb - 0.714136 * cr
            b = y + 1.772 * cb
            rgb = np.stack([r, g, b], axis=2)
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        pos += seglen
    raise ValueError("no SOS segment found")


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
