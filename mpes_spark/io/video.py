"""Numpy-only AVI container parsing + uncompressed-frame decode (the
video leg of the multimodal pillar, r8 — same discipline as images/
audio: container structure parses for real; only genuinely
codec-compressed streams stay env-gated).

Supported: RIFF/AVI with a single video stream — header parse
(dimensions, frame count, fps), frame index (from the 'idx1' chunk or
a linear 'movi' walk), and FULL decode of uncompressed DIB frames
(BI_RGB 24-bit / 8-bit, the 'DIB ' / raw biCompression==0 case).
MJPG/H264/etc. frame payloads raise the documented env gate — the
container-level operations (frame count, sampling manifest, byte
slicing) still work on them.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "read_avi_header",
    "avi_frame_index",
    "decode_avi_frame",
    "write_avi_dib",
]


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_offset, size) RIFF subchunks in [start, end)."""
    pos = start
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def read_avi_header(data: bytes) -> dict:
    """Parse the avih main header: (width, height, n_frames,
    usec_per_frame, codec fourcc of stream 0)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    out: dict = {}
    for cid, off, size in _chunks(data, 12, len(data)):
        if cid == b"LIST" and data[off : off + 4] == b"hdrl":
            for c2, o2, s2 in _chunks(data, off + 4, off + size):
                if c2 == b"avih":
                    us, _rate, _pad, _flags, nf = struct.unpack_from("<IIIII", data, o2)
                    w, h = struct.unpack_from("<II", data, o2 + 32)
                    out.update(
                        usec_per_frame=us, n_frames=nf, width=w, height=h
                    )
                elif c2 == b"LIST" and data[o2 : o2 + 4] == b"strl":
                    for c3, o3, s3 in _chunks(data, o2 + 4, o2 + s2):
                        if c3 == b"strh" and data[o3 : o3 + 4] == b"vids":
                            out["codec"] = data[o3 + 4 : o3 + 8].decode(
                                "ascii", "replace"
                            )
    if "n_frames" not in out:
        raise ValueError("missing avih header")
    return out


def avi_frame_index(data: bytes) -> list[tuple[int, int]]:
    """(offset, size) of each video frame chunk ('NNdb'/'NNdc'), from
    the idx1 chunk when present (offsets there are relative to the
    start of the 'movi' list body) else a linear movi walk."""
    movi_off = None
    idx1 = None
    for cid, off, size in _chunks(data, 12, len(data)):
        if cid == b"LIST" and data[off : off + 4] == b"movi":
            movi_off = off
            movi_end = off + size
        elif cid == b"idx1":
            idx1 = (off, size)
    if movi_off is None:
        raise ValueError("missing movi list")
    frames: list[tuple[int, int]] = []
    if idx1 is not None:
        off, size = idx1
        for pos in range(off, off + size, 16):
            ckid, _flags, rel, csize = struct.unpack_from("<4sIII", data, pos)
            if ckid[2:4] in (b"db", b"dc"):
                # rel points at the chunk header, relative to 'movi'
                frames.append((movi_off + rel + 8, csize))
    else:
        for cid, off, size in _chunks(data, movi_off + 4, movi_end):
            if cid[2:4] in (b"db", b"dc"):
                frames.append((off, size))
    return frames


def decode_avi_frame(
    data: bytes, offset: int, size: int, width: int, height: int, codec: str
) -> np.ndarray:
    """Decode one frame payload. Uncompressed DIB ('DIB ' or raw RGB,
    bottom-up BGR rows padded to 4 bytes — the BMP pixel layout without
    headers) decodes natively to (H, W, 3) RGB; compressed codecs
    raise the documented env gate."""
    if codec not in ("DIB ", "RGB ", "\x00\x00\x00\x00"):
        raise NotImplementedError(
            f"codec {codec!r} requires a video library not present in this "
            "runtime; plug ffmpeg in here — container parsing, frame "
            "indexing and DIB decode are native"
        )
    row_bytes = (width * 3 + 3) & ~3
    raw = data[offset : offset + size]
    rows = np.frombuffer(raw[: row_bytes * height], dtype="u1").reshape(
        height, row_bytes
    )[:, : width * 3]
    return rows.reshape(height, width, 3)[::-1, :, ::-1].copy()  # bottom-up BGR


def write_avi_dib(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """Encode (H, W, 3) RGB frames as an uncompressed-DIB AVI with an
    idx1 index — the library-free twin of a real writer, and the test
    fixture generator for the decode path."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    row_bytes = (w * 3 + 3) & ~3
    payloads = []
    for f in frames:
        body = b"".join(
            row[:, ::-1].tobytes() + b"\x00" * (row_bytes - w * 3)
            for row in np.asarray(f, dtype="u1")[::-1]
        )
        payloads.append(body)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    avih = struct.pack(
        "<IIIIIIIIII",
        1_000_000 // fps, row_bytes * h * fps, 0, 0, len(frames),
        0, 1, row_bytes * h, w, h,
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), row_bytes * h, 0, 0, 0)
    )
    strf = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h, 0, 0, 0, 0)
    strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl = b"hdrl" + chunk(b"avih", avih) + chunk(b"LIST", strl)

    movi_body = b"movi"
    idx_entries = []
    for body in payloads:
        rel = len(movi_body) - 4  # relative to movi body start
        movi_body += chunk(b"00db", body)
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, rel + 4, len(body)))
    # idx1 rel offsets point at the chunk header relative to 'movi'
    idx1 = b"".join(idx_entries)

    riff_body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi_body) + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
