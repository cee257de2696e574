"""Numpy-only AVI container codec (io/video.py): header parse, idx1
frame index, DIB frame decode round-trip, env gate for compressed
codecs."""

from __future__ import annotations

import numpy as np
import pytest

from mpes_spark.io.video import (
    avi_frame_index,
    decode_avi_frame,
    read_avi_header,
    write_avi_dib,
)


def _frames(n=3, h=4, w=5, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_avi_roundtrip_header_index_decode():
    frames = _frames()
    avi = write_avi_dib(frames, fps=10)
    hdr = read_avi_header(avi)
    assert hdr["n_frames"] == 3 and hdr["width"] == 5 and hdr["height"] == 4
    assert hdr["codec"] == "DIB " and hdr["usec_per_frame"] == 100_000
    idx = avi_frame_index(avi)
    assert len(idx) == 3
    for (off, size), want in zip(idx, frames):
        got = decode_avi_frame(avi, off, size, 5, 4, hdr["codec"])
        np.testing.assert_array_equal(got, want)


def test_avi_index_matches_linear_walk():
    frames = _frames(n=4, h=2, w=2, seed=1)
    avi = write_avi_dib(frames)
    with_idx = avi_frame_index(avi)
    # strip the idx1 chunk -> forces the linear movi walk
    import struct

    pos, end = 12, len(avi)
    no_idx = avi[:12]
    while pos + 8 <= end:
        cid = avi[pos : pos + 4]
        size = struct.unpack_from("<I", avi, pos + 4)[0]
        total = 8 + size + (size & 1)
        if cid != b"idx1":
            no_idx += avi[pos : pos + total]
        pos += total
    no_idx = b"RIFF" + struct.pack("<I", len(no_idx) - 8) + no_idx[8:]
    walked = avi_frame_index(no_idx)
    assert len(walked) == 4
    # same frame payloads behind both index styles
    for (o1, s1), (o2, s2) in zip(with_idx, walked):
        assert s1 == s2 and avi[o1 : o1 + s1] == no_idx[o2 : o2 + s2]


def test_avi_env_gate_for_compressed_codecs():
    frames = _frames(n=1)
    avi = write_avi_dib(frames)
    off, size = avi_frame_index(avi)[0]
    with pytest.raises(NotImplementedError, match="MJPG"):
        decode_avi_frame(avi, off, size, 5, 4, "MJPG")
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        read_avi_header(b"RIFF....WAVE")


def test_sample_frames_decoded_distributed(spark):
    """Real distributed frame extraction: DIB-AVI payloads in a binary
    column decode per Arrow batch; every sampled frame's pixel stats
    match the source arrays exactly."""
    from mpes_spark.extras.multimodal import sample_frames_decoded

    rng = np.random.default_rng(7)
    vids = {
        i: [rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8) for _ in range(5)]
        for i in range(6)
    }
    rows = [(i, bytearray(write_avi_dib(f))) for i, f in vids.items()]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = sample_frames_decoded(assets, every_n=2).collect()
    assert len(out) == 6 * 3  # frames 0, 2, 4 of each clip
    for r in out:
        src = vids[r.asset_id][r.frame_idx]
        assert r.sum_pixels == int(src.astype("int64").sum())
        assert r.max_pixel == int(src.max())
