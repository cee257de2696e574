"""Baseline JPEG codec (io/jpeg.py): conformance against a naive
O(N^4) cosine-formula IDCT, hand-derived DC-only exactness, round-trip
error bounds across quality/subsampling/restart settings, and the
constant-block lossless class the hash gate relies on."""

from __future__ import annotations

import numpy as np
import pytest

from mpes_spark.io.images import decode_image_bytes
from mpes_spark.io.jpeg import _C, _idct2, read_jpeg, write_jpeg


def test_idct_matches_naive_cosine_formula():
    """The matrix-form IDCT must equal the T.81 Annex A definition
    computed directly from the cosine double sum."""
    rng = np.random.default_rng(3)
    coeff = rng.integers(-200, 200, (8, 8)).astype(np.float64)
    naive = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coeff[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            naive[y, x] = s / 4.0
    np.testing.assert_allclose(_idct2(coeff), naive, atol=1e-9)
    # and the basis is orthonormal (decoder inverts the encoder)
    np.testing.assert_allclose(_C @ _C.T, np.eye(8), atol=1e-12)


def test_constant_block_lossless():
    """Constant 8x8 blocks at quality 100 are DC-only with exactly
    representable coefficients: the round-trip is pixel-exact. This is
    the content class the jpeg_decode_stats hash gate relies on."""
    for v in (0, 1, 77, 128, 254, 255):
        img = np.full((24, 16), v, dtype=np.uint8)
        np.testing.assert_array_equal(read_jpeg(write_jpeg(img, 100)), img)
    rng = np.random.default_rng(9)
    tiles = rng.integers(0, 256, (5, 7)).astype(np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    np.testing.assert_array_equal(read_jpeg(write_jpeg(img, 100)), img)


def test_quality100_gradient_near_lossless():
    yy, xx = np.mgrid[0:40, 0:33]
    img = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    got = read_jpeg(write_jpeg(img, quality=100))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 1


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("quality", [75, 95])
def test_rgb_roundtrip_error_bound(subsample, quality):
    rng = np.random.default_rng(11)
    base = rng.integers(40, 216, (4, 6, 3)).astype(np.float64)
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype(np.uint8)
    got = read_jpeg(write_jpeg(img, quality=quality, subsample=subsample))
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int)).max()
    # subsampled chroma blocks straddle the color-tile edges after
    # downsampling, so 4:2:0 carries real quantization error there
    bound = {(75, False): 4, (75, True): 24, (95, False): 2, (95, True): 8}
    assert err <= bound[(quality, subsample)], err


def test_restart_markers_and_odd_sizes():
    yy, xx = np.mgrid[0:19, 0:21]
    img = ((yy * 7 + xx * 5) % 256).astype(np.uint8)
    got = read_jpeg(write_jpeg(img, quality=95, restart_interval=1))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 6


def test_dispatch_and_rejects():
    g = np.full((8, 8), 42, dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_image_bytes(write_jpeg(g, 100)), g
    )
    with pytest.raises(ValueError, match="SOI"):
        read_jpeg(b"nope")
    # lossless SOF3 named explicitly, not silently garbled
    buf = bytearray(write_jpeg(g, 100))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF"):
        read_jpeg(bytes(buf))


def test_decoder_reads_16bit_dqt():
    """16-bit DQT precision is spec-legal; re-encode a stream with the
    table widened to 16-bit entries and decode it."""
    import struct

    g = np.full((8, 8), 90, dtype=np.uint8)
    buf = write_jpeg(g, 100)
    i = buf.find(b"\xff\xdb")
    (seglen,) = struct.unpack_from(">H", buf, i + 2)
    tbl8 = buf[i + 5 : i + 5 + 64]
    wide = b"".join(struct.pack(">H", b) for b in tbl8)
    newseg = (
        b"\xff\xdb" + struct.pack(">H", 3 + 128)
        + bytes([0x10]) + wide
    )
    out = buf[:i] + newseg + buf[i + 2 + seglen:]
    np.testing.assert_array_equal(read_jpeg(out), g)


# -- progressive (SOF2) ----------------------------------------------------

from mpes_spark.io.jpeg import write_jpeg_progressive  # noqa: E402


@pytest.mark.parametrize("successive", [False, True])
def test_progressive_gray_exact_at_q100(successive):
    yy, xx = np.mgrid[0:32, 0:40]
    img = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    got = read_jpeg(write_jpeg_progressive(img, 100, successive=successive))
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("successive", [False, True])
@pytest.mark.parametrize("subsample", [False, True])
def test_progressive_rgb_matches_baseline(successive, subsample):
    """Progressive and baseline encodings of the same image decode to
    the same pixels (identical quantized coefficients, different scan
    scripts)."""
    rng = np.random.default_rng(5)
    base = rng.integers(60, 196, (4, 5, 3)).astype(np.float64)
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype(np.uint8)
    prog = read_jpeg(
        write_jpeg_progressive(img, 95, subsample=subsample,
                               successive=successive)
    )
    seq = read_jpeg(write_jpeg(img, 95, subsample=subsample))
    np.testing.assert_array_equal(prog, seq)


def test_progressive_marker_is_sof2_and_multiscan():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    buf = write_jpeg_progressive(g, 90, successive=True)
    assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf
    # gray successive script = DC first + DC refine + AC first + AC refine
    assert buf.count(b"\xff\xda") == 4


def test_progressive_negative_coefficients_match_baseline():
    """Two's-complement DC refinement and signed AC refinement both
    handle negative coefficients (dark-to-bright alternation drives
    DC negative and ACs both signs): the progressive scan script must
    reconstruct the IDENTICAL coefficients the baseline scan carries,
    so both decodes agree pixel-for-pixel (the busy sine content
    itself is not exactly representable at q100 — DCT roundoff — so
    the original is not the reference; the coefficients are)."""
    yy, xx = np.mgrid[0:24, 0:24]
    img = (128 + 120 * np.sin(yy / 2.0) * np.cos(xx / 3.0)).astype(np.uint8)
    prog = read_jpeg(write_jpeg_progressive(img, 100, successive=True))
    seq = read_jpeg(write_jpeg(img, 100))
    np.testing.assert_array_equal(prog, seq)
    assert np.abs(prog.astype(int) - img.astype(int)).max() <= 1


def test_progressive_odd_sizes_and_dispatch():
    from mpes_spark.io.images import decode_image_bytes

    yy, xx = np.mgrid[0:17, 0:13]
    img = ((yy * 5 + xx * 7) % 256).astype(np.uint8)
    buf = write_jpeg_progressive(img, 100)
    np.testing.assert_array_equal(decode_image_bytes(buf), img)
