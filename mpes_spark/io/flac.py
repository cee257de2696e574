"""Numpy/stdlib-only FLAC codec (RFC 9639 / the public FLAC format
spec) — r9 late: closes the lossless third of the audio env seam the
same way TIFF/LZW closed the image one (MP3/OGG are lossy
entropy-coded formats and stay legitimately library-bound).

Decoder: fLaC stream marker, metadata walk (STREAMINFO parsed, the
rest skipped), fixed- and variable-blocking frames, UTF-8-style coded
frame numbers, all four subframe types (CONSTANT, VERBATIM, FIXED
orders 0-4, LPC orders 1-32), wasted bits, Rice residual methods 0/1
with partitioning and the raw-bits escape, and all four channel
assignments (independent, left/side, right/side, mid/side).

Encoder: 8/16-bit, any channel count (independent), fixed 4096-sample
blocks, per-block best-of FIXED order 0-2 with a single Rice
partition (parameter chosen by exact bit-cost sweep) vs VERBATIM
fallback — a REAL compressed encoder, so the encode -> decode
round-trip under the driver's hash gate proves Rice decode and the
fixed predictors, not just container framing. CRC-8/CRC-16 are
computed and verified.

Reference parity: the reference has no audio path at all; this module
exists for the multimodal-pipeline pillar (decode/feature-extract at
100 TB runs inside Arrow batches via extras/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_flac", "write_flac"]


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader over bytes, tracking byte position so
    frame CRCs can be sliced out of the underlying buffer."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position of the NEXT unread byte
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        val = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _coded_number_read(br: _BitReader) -> int:
    """UTF-8-style frame/sample number (up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    val = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad coded-number continuation byte")
        val = (val << 6) | (c & 0x3F)
    return val


def _coded_number_write(bw: _BitWriter, val: int) -> None:
    if val < 0x80:
        bw.write(val, 8)
        return
    # t-byte UTF-8-style sequence carries (7 - t) + 6*(t - 1) = 5t + 1
    # payload bits; FLAC allows up to t = 7 (36 bits)
    for t in range(2, 8):
        if val < (1 << (5 * t + 1)):
            break
    else:
        raise ValueError("coded number exceeds 36 bits")
    prefix = (0xFF << (8 - t)) & 0xFF  # t ones then a zero
    bw.write(prefix | (val >> (6 * (t - 1))), 8)
    for i in range(t - 2, -1, -1):
        bw.write(0x80 | ((val >> (6 * i)) & 0x3F), 8)


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _read_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("partition count does not divide block size")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(n):
                out[idx] = br.read_signed(raw) if raw else 0
                idx += 1
            continue
        for i in range(n):
            q = br.read_unary()
            u = (q << param) | br.read(param) if param else q
            out[idx] = (u >> 1) ^ -(u & 1)  # un-zigzag
            idx += 1
    return out


def _read_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if ftype == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = np.full(blocksize, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.fromiter(
            (br.read_signed(eff) for _ in range(blocksize)),
            dtype=np.int64,
            count=blocksize,
        )
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = res[i - order] + pred
    elif ftype >= 32:  # LPC, order 1-32
        order = (ftype & 0x1F) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid qlp precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    return out << wasted if wasted else out


def read_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream -> (samples[n, channels] int32, rate)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        hdr = data[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("truncated metadata block header")
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        (length,) = struct.unpack(">I", b"\0" + hdr[1:4])
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:
            if length != 34:
                raise ValueError("bad STREAMINFO length")
            bits = int.from_bytes(body, "big")
            # layout (from MSB): 16+16+24+24+20+3+5+36+128
            rate = (bits >> (128 + 36 + 5 + 3)) & ((1 << 20) - 1)
            nchan = ((bits >> (128 + 36 + 5)) & 0x7) + 1
            bps = ((bits >> (128 + 36)) & 0x1F) + 1
            total = (bits >> 128) & ((1 << 36) - 1)
            info = (rate, nchan, bps, total)
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    s_rate, s_nchan, s_bps, s_total = info
    chans: list[np.ndarray] = [np.empty(0, dtype=np.int64) for _ in range(s_nchan)]
    got = 0
    while pos < len(data) and (s_total == 0 or got < s_total):
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _coded_number_read(br)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        rate = s_rate if sr_code == 0 else _RATE_TABLE.get(sr_code, s_rate)
        bps = {
            0: s_bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32,
        }.get(ss_code)
        if bps is None:
            raise ValueError("reserved sample size code")
        hdr_end = br.pos  # CRC-8 covers [frame_start, hdr_end)
        if _crc8(data[frame_start:hdr_end]) != br.read(8):
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code < 8:
            nch = ch_code + 1
            subs = [_read_subframe(br, blocksize, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            b0 = bps + (1 if ch_code == 9 else 0)
            b1 = bps + (1 if ch_code in (8, 10) else 0)
            c0 = _read_subframe(br, blocksize, b0)
            c1 = _read_subframe(br, blocksize, b1)
            if ch_code == 8:  # left/side
                subs = [c0, c0 - c1]
            elif ch_code == 9:  # side/right
                subs = [c0 + c1, c1]
            else:  # mid/side
                left = c0 + ((c1 + (c1 & 1)) >> 1)
                subs = [left, left - c1]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        if nch != s_nchan:
            raise ValueError("frame channel count differs from STREAMINFO")
        br.align()
        if _crc16(data[frame_start : br.pos]) != br.read(16):
            raise ValueError("frame CRC-16 mismatch")
        for c in range(nch):
            chans[c] = np.concatenate([chans[c], subs[c]])
        got += blocksize
        pos = br.pos
    out = np.stack(chans, axis=1).astype(np.int32)
    if s_total:
        out = out[: int(s_total)]
    return out, s_rate


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """(param, bits) minimizing exact Rice cost for zigzagged values."""
    best_k, best_cost = 0, None
    for k in range(15):
        cost = int((u >> k).sum()) + u.size * (k + 1)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
        if (u >> k).max(initial=0) == 0 and k > 0:
            break
    return best_k, best_cost


def _write_residual(bw: _BitWriter, res: np.ndarray) -> None:
    u = ((res << 1) ^ (res >> 63)).astype(np.uint64)  # zigzag
    k, _ = _best_rice_param(u.astype(np.int64))
    bw.write(0, 2)  # method 0: 4-bit params
    bw.write(0, 4)  # partition order 0
    bw.write(k, 4)
    for val in u.tolist():
        q = val >> k
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        if k:
            bw.write(val & ((1 << k) - 1), k)


def _write_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    n = x.size
    if np.all(x == x[0]):
        bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    # candidate FIXED orders 0-2: pick the cheapest exact bit cost
    best = None
    for order in range(0, min(3, n)):
        res = x.astype(np.int64)
        for _ in range(order):
            res = np.diff(res)
        u = ((res << 1) ^ (res >> 63)).astype(np.int64)
        _, cost = _best_rice_param(u)
        total = order * bps + cost + 10
        if best is None or total < best[0]:
            best = (total, order, res)
    verbatim_cost = n * bps
    if best is None or best[0] >= verbatim_cost:
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
        for v in x.tolist():
            bw.write(int(v) & ((1 << bps) - 1), bps)
        return
    _, order, res = best
    bw.write(0, 1); bw.write(8 + order, 6); bw.write(0, 1)
    for v in x[:order].tolist():
        bw.write(int(v) & ((1 << bps) - 1), bps)
    _write_residual(bw, res[: n - order] if order == 0 else res)


def write_flac(
    samples: np.ndarray, rate: int, blocksize: int = 4096
) -> bytes:
    """Encode int PCM (n,) or (n, channels) as FLAC: independent
    channels, fixed ``blocksize`` blocks, best-of FIXED-order-0..2
    subframes with single-partition Rice residuals (VERBATIM/CONSTANT
    where cheaper) — a real compressed encoder whose output any
    conforming FLAC decoder reads back bit-exactly."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError("need (n,) or (n, channels) samples")
    if not (1 <= blocksize <= 65536):
        raise ValueError("blocksize must be in [1, 65536]")
    n, nchan = a.shape
    if not (1 <= nchan <= 8):
        raise ValueError("1-8 channels supported")
    bps = 16 if a.dtype.itemsize >= 2 else 8
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if a.size and (a.min() < lo or a.max() > hi):
        raise ValueError(f"samples exceed {bps}-bit range")
    a = a.astype(np.int64)
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    bits = 0
    bits = (bits << 16) | blocksize
    bits = (bits << 16) | blocksize
    bits = (bits << 24) | 0
    bits = (bits << 24) | 0
    bits = (bits << 20) | rate
    bits = (bits << 3) | (nchan - 1)
    bits = (bits << 5) | (bps - 1)
    bits = (bits << 36) | n
    bits <<= 128  # MD5 unset (0 = unknown, permitted)
    out += bytes([0x80, 0, 0, 34]) + bits.to_bytes(34, "big")
    for fi, start in enumerate(range(0, max(n, 1), blocksize)):
        block = a[start : start + blocksize]
        bs = block.shape[0]
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # blocksize-1 in 16 bits at header end
        bw.write(0, 4)  # sample rate from STREAMINFO
        bw.write(nchan - 1, 4)  # independent channels
        bw.write(4 if bps == 16 else 1, 3)
        bw.write(0, 1)  # reserved
        _coded_number_write(bw, fi)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bw.bytes()
        bw.write(_crc8(hdr), 8)
        for c in range(nchan):
            _write_subframe(bw, block[:, c], bps)
        bw.align()
        frame = bw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)
