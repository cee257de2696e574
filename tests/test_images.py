"""Numpy-only image codecs (io/images.py): PNM round-trips, hand-built
BMP golden bytes, ARPES txt loader vs the reference's slicing
semantics, and mat2im's exact scaling arithmetic."""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

from mpes_spark.io.images import (
    decode_image_bytes,
    im2mat,
    mat2im,
    read_arpes_txt,
    read_bmp,
    read_pnm,
    readimg,
    write_pnm,
)


def test_pnm_binary_roundtrip_gray_and_rgb(tmp_path):
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    np.testing.assert_array_equal(read_pnm(write_pnm(gray)), gray)
    np.testing.assert_array_equal(read_pnm(write_pnm(rgb)), rgb)
    # file path round-trip through readimg/im2mat
    p = str(tmp_path / "x.pgm")
    write_pnm(gray, p)
    np.testing.assert_array_equal(readimg(p), gray)
    np.testing.assert_array_equal(im2mat(p), gray)


def test_pnm_16bit_and_ascii():
    deep = np.array([[0, 300], [65535, 12345]], dtype=np.uint16)
    got = read_pnm(write_pnm(deep))
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, deep)
    # ascii P2 with comments and irregular whitespace
    p2 = b"P2 # magic comment\n# another\n 3 2\n255\n0 1 2\n3   4\t5\n"
    np.testing.assert_array_equal(
        read_pnm(p2), np.array([[0, 1, 2], [3, 4, 5]], dtype=np.uint8)
    )
    # ascii P3 rgb
    p3 = b"P3\n2 1\n255\n255 0 0  0 255 0\n"
    np.testing.assert_array_equal(
        read_pnm(p3), np.array([[[255, 0, 0], [0, 255, 0]]], dtype=np.uint8)
    )


def _bmp24(pixels: np.ndarray) -> bytes:
    """Hand-assemble a bottom-up 24-bit BI_RGB BMP from (H, W, 3) RGB."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    body = b""
    for row in pixels[::-1]:  # bottom-up storage
        line = row[:, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (row_bytes - len(line))
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + info + body


def test_bmp24_golden():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(read_bmp(_bmp24(px)), px)
    np.testing.assert_array_equal(decode_image_bytes(_bmp24(px)), px)


def test_bmp8_palette():
    # 2x2 8-bit with a 4-entry palette (stored BGRA)
    pal = [(10, 20, 30), (200, 100, 0), (0, 0, 255), (7, 7, 7)]  # RGB
    pal_bytes = b"".join(bytes([b, g, r, 0]) for (r, g, b) in pal)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    row_bytes = 4  # width 2 padded to 4
    body = b""
    for row in idx[::-1]:
        body += row.tobytes() + b"\x00" * (row_bytes - 2)
    off = 14 + 40 + len(pal_bytes)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiihHIIiiII", 40, 2, 2, 1, 8, 0, len(body), 0, 0, 4, 0)
    img = read_bmp(hdr + info + pal_bytes + body)
    want = np.array([[pal[0], pal[1]], [pal[2], pal[3]]], dtype=np.uint8)
    np.testing.assert_array_equal(img, want)


def test_bmp_rejects_compressed():
    info = struct.pack("<IiihHIIiiII", 40, 2, 2, 1, 24, 1, 0, 0, 0, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    with pytest.raises(ValueError, match="compressed"):
        read_bmp(hdr + info)


def test_read_arpes_txt_slicing_matches_reference():
    """Reference semantics (mpes/fprocessing.py:354-379): row 0 col 1+
    is the angle axis, col 0 row 1+ the energy axis, the rest the
    intensity matrix; a short angle row NaN-pads on the right."""
    txt = "0.0\t-5.0\t-4.0\t-3.0\n" \
          "1.1\t10\t11\t12\n" \
          "1.2\t20\t21\t22\n"
    arpes, energy, angle = read_arpes_txt(io.StringIO(txt))
    np.testing.assert_array_equal(arpes, [[10, 11, 12], [20, 21, 22]])
    np.testing.assert_array_equal(energy, [1.1, 1.2])
    np.testing.assert_array_equal(angle, [-5.0, -4.0, -3.0])
    # ragged angle row: NaN-padded (the reference's names=dataidx read)
    ragged = "0.0\t-5.0\t-4.0\n1.1\t10\t11\t12\n1.2\t20\t21\t22\n"
    _, _, ang2 = read_arpes_txt(io.StringIO(ragged))
    assert ang2[0] == -5.0 and ang2[1] == -4.0 and np.isnan(ang2[2])
    # with_coords=False drops only the first row
    raw = read_arpes_txt(io.StringIO(txt), with_coords=False)
    np.testing.assert_array_equal(raw[:, 0], [1.1, 1.2])


def test_mat2im_scaling_arithmetic(tmp_path):
    """mat2im must reproduce the reference's exact formulas
    (mpes/fprocessing.py:395-419), including gamma parsing from
    'gamma<a>-<g>' and the (255/max)*(x - min) normal map."""
    mat = np.array([[-1.0, 2.0], [3.0, 4.0]])
    # normal: (255/max(|x|)) * (|x| - min(|x|))
    want = (255 / 4.0) * (np.abs(mat) - 1.0)
    np.testing.assert_array_equal(mat2im(mat), want.astype(np.uint8))
    # gamma0.5-2 then normal: y = 0.5*x^2 -> (255/8)*(y - 0.5)
    y = 0.5 * np.abs(mat) ** 2
    want_g = (255 / y.max()) * (y - y.min())
    got_g = mat2im(mat, scaling=["gamma0.5-2", "normal"])
    np.testing.assert_array_equal(got_g, want_g.astype(np.uint8))
    # inv without normal
    want_i = 255 - (255 / 4.0) * (np.abs(mat) - 1.0)
    np.testing.assert_array_equal(mat2im(mat, scaling=["inv"]), want_i.astype(np.uint8))
    # savename writes a decodable PGM
    p = str(tmp_path / "m.pgm")
    out = mat2im(mat, savename=p)
    np.testing.assert_array_equal(readimg(p), out)


def test_decode_image_bytes_unknown_magic():
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image_bytes(b"\x00\x01\x02\x03junk")


def test_resample_nearest_kernel():
    from mpes_spark.io.images import resample_nearest

    img = np.arange(16, dtype="uint8").reshape(4, 4)
    up = resample_nearest(img, 8, 8)
    assert up.shape == (8, 8)
    # each source pixel tiles a 2x2 block under nearest-neighbor 2x
    np.testing.assert_array_equal(up[0:2, 0:2], np.full((2, 2), img[0, 0]))
    np.testing.assert_array_equal(up[6:8, 6:8], np.full((2, 2), img[3, 3]))
    down = resample_nearest(img, 2, 2)
    # pixel centers at (1,1),(1,3),(3,1),(3,3)
    np.testing.assert_array_equal(down, img[[1, 3]][:, [1, 3]])
    # rgb passthrough of the channel axis
    rgb = np.stack([img] * 3, axis=-1)
    assert resample_nearest(rgb, 2, 2).shape == (2, 2, 3)


def test_resize_images_decoded_end_to_end(spark):
    """REAL multimodal resize (r8): PNM payloads decode, resample, and
    re-encode per Arrow batch; output dims and pixels are exact."""
    from mpes_spark.extras.multimodal import resize_images_decoded
    from mpes_spark.io.images import read_pnm, resample_nearest, write_pnm

    rng = np.random.default_rng(2)
    imgs = {i: rng.integers(0, 256, size=(6 + i, 8, 3), dtype=np.uint8) for i in range(4)}
    rows = [
        (i, "image", bytearray(write_pnm(im)), {"width": im.shape[1], "height": im.shape[0], "sample_rate": 0, "n_frames": 0})
        for i, im in imgs.items()
    ]
    assets = spark.createDataFrame(
        rows,
        "asset_id long, modality string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>",
    )
    out = resize_images_decoded(assets, width=4, height=3).collect()
    assert len(out) == 4
    for r in out:
        want = resample_nearest(imgs[r.asset_id], 4, 3)
        got = read_pnm(bytes(r.payload))
        assert got.shape == (3, 4, 3)
        np.testing.assert_array_equal(got, want)
        assert r.meta.width == 4 and r.meta.height == 3


# -- hypothesis round-trip fuzz (r8 codecs) ---------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


@given(
    arr=arrays(
        dtype=st.sampled_from([np.uint8, np.uint16]),
        shape=st.tuples(st.integers(1, 12), st.integers(1, 12)),
    )
)
@settings(max_examples=80, deadline=None)
def test_pnm_gray_roundtrip_fuzz(arr):
    got = read_pnm(write_pnm(arr))
    np.testing.assert_array_equal(got, arr.astype(got.dtype))


@given(
    arr=arrays(
        dtype=np.uint8,
        shape=st.tuples(st.integers(1, 9), st.integers(1, 9), st.just(3)),
    )
)
@settings(max_examples=60, deadline=None)
def test_pnm_rgb_roundtrip_fuzz(arr):
    np.testing.assert_array_equal(read_pnm(write_pnm(arr)), arr)


# ---------------------------------------------------------------------------
# PNG (r9): stdlib-zlib + numpy-unfilter decoder, filter-0 encoder
# ---------------------------------------------------------------------------

import zlib

from mpes_spark.io.images import _PNG_SIG, read_png, write_png


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _encode_filtered(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-encoder that can emit ANY per-row filter type (the library
    encoder always writes filter 0), so the decoder's Sub/Up/Average/
    Paeth paths are exercised against independently-encoded bytes."""
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    a = img.reshape(h, w * c).astype(np.int64)
    body = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    bpp = c
    for r in range(h):
        f, line = filters[r % len(filters)], a[r]
        if f == 0:
            enc = line
        elif f == 1:
            left = np.zeros_like(line)
            left[bpp:] = line[:-bpp]
            enc = (line - left) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            left = np.zeros_like(line)
            left[bpp:] = line[:-bpp]
            enc = (line - (left + prev) // 2) % 256
        else:  # Paeth
            enc = np.empty_like(line)
            for i in range(len(line)):
                A = line[i - bpp] if i >= bpp else 0
                B = prev[i]
                C = prev[i - bpp] if i >= bpp else 0
                p = A + B - C
                pa, pb, pc = abs(p - A), abs(p - B), abs(p - C)
                pred = A if (pa <= pb and pa <= pc) else (B if pb <= pc else C)
                enc[i] = (line[i] - pred) % 256
        body.append(f)
        body.extend((enc % 256).astype("u1").tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2}[c], 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((7, 5), np.uint8),
        ((7, 5), np.uint16),
        ((4, 6, 2), np.uint8),
        ((9, 3, 3), np.uint8),
        ((3, 4, 3), np.uint16),
        ((5, 5, 4), np.uint8),
        ((1, 1), np.uint8),
        ((2, 300, 3), np.uint8),
    ],
)
def test_png_roundtrip(shape, dtype):
    rng = np.random.default_rng(7)
    hi = 65535 if dtype == np.uint16 else 255
    arr = rng.integers(0, hi, size=shape).astype(dtype)
    got = read_png(write_png(arr))
    assert got.shape == arr.shape and got.dtype == arr.dtype
    np.testing.assert_array_equal(got, arr)


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filters(filters):
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 255, size=(12, 9, 3)).astype(np.uint8)
    np.testing.assert_array_equal(read_png(_encode_filtered(rgb, filters)), rgb)
    gray = rng.integers(0, 255, size=(10, 7)).astype(np.uint8)
    np.testing.assert_array_equal(read_png(_encode_filtered(gray, filters)), gray)


def test_png_palette_decode():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 255, size=(16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, size=(6, 8)).astype(np.uint8)
    body = bytearray()
    for r in range(6):
        body.append(0)
        body.extend(idx[r].tobytes())
    ihdr = struct.pack(">IIBBBBB", 8, 6, 8, 3, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
        + _png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(read_png(png), pal[idx])


def test_png_dispatch_and_rejects():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 255, size=(4, 4)).astype(np.uint8)
    np.testing.assert_array_equal(decode_image_bytes(write_png(g)), g)
    # interlaced -> explicit unsupported, not silent garbage
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    png = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlace"):
        read_png(png)
    with pytest.raises(ValueError, match="not a PNG"):
        read_png(b"nope")
    # JPEG now dispatches to the native baseline decoder (r9 late);
    # malformed JPEG bytes fail with a decoder error, not an env gate
    with pytest.raises(ValueError):
        decode_image_bytes(b"\xff\xd8\xff\xe0rest")


# -- TIFF (r9 late: uncompressed / PackBits / LZW + predictor 2) ------------

from mpes_spark.io.images import (  # noqa: E402
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
    read_tiff,
    write_tiff,
)


def test_lzw_hand_vector():
    # ABABABA -> codes [Clear=256, 65, 66, 258, 260, EOI=257], all
    # 9-bit MSB-first: bitstream hand-packed to these exact bytes.
    enc = lzw_encode(b"ABABABA")
    assert enc == bytes([0x80, 0x10, 0x48, 0x50, 0x28, 0x24, 0x04])
    assert lzw_decode(enc) == b"ABABABA"


def test_lzw_width_bumps_and_table_flush():
    rng = np.random.default_rng(13)
    # incompressible stream long enough to cross 511/1023/2047 and the
    # 4094-entry table flush several times
    data = rng.integers(0, 256, 200_000).astype("u1").tobytes()
    assert lzw_decode(lzw_encode(data)) == data
    # highly-compressible long runs exercise the KwKwK path
    runs = b"".join(bytes([b]) * 997 for b in range(40))
    assert lzw_decode(lzw_encode(runs)) == runs
    assert lzw_decode(lzw_encode(b"")) == b""


def test_packbits_roundtrip_and_packets():
    rng = np.random.default_rng(17)
    for n in (0, 1, 2, 3, 128, 129, 385, 5000):
        d = rng.integers(0, 4, n).astype("u1").tobytes()
        assert packbits_decode(packbits_encode(d)) == d
    # >=3 runs become 2-byte repeat packets
    assert packbits_encode(b"\x07" * 5) == bytes([257 - 5, 7])
    assert len(packbits_encode(b"\x07" * 400)) <= 8


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((13, 9), np.uint8),
        ((7, 5), np.uint16),
        ((6, 11, 3), np.uint8),
        ((4, 4, 4), np.uint8),
        ((1, 1), np.uint8),
    ],
)
@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
def test_tiff_roundtrip(shape, dtype, comp):
    rng = np.random.default_rng(7)
    hi = 65535 if dtype == np.uint16 else 255
    arr = rng.integers(0, hi, size=shape).astype(dtype)
    for pred in (1, 2):
        for bo in ("<", ">"):
            got = read_tiff(
                write_tiff(arr, compression=comp, predictor=pred, byte_order=bo)
            )
            assert got.shape == arr.shape and got.dtype == arr.dtype
            np.testing.assert_array_equal(got, arr)


def test_tiff_multistrip_external_arrays():
    # 13 rows at rows_per_strip=3 -> 5 strips -> StripOffsets and
    # StripByteCounts no longer fit inline in the IFD entry (the
    # external-array writer path) and decode reassembles the strips
    rng = np.random.default_rng(23)
    arr = rng.integers(0, 255, size=(13, 6)).astype(np.uint8)
    buf = write_tiff(arr, compression="lzw", predictor=2, rows_per_strip=3)
    np.testing.assert_array_equal(read_tiff(buf), arr)


def test_tiff_dispatch_and_rejects(tmp_path):
    rng = np.random.default_rng(29)
    g = rng.integers(0, 255, size=(5, 7)).astype(np.uint8)
    np.testing.assert_array_equal(
        decode_image_bytes(write_tiff(g, compression="lzw")), g
    )
    p = tmp_path / "img.tiff"
    write_tiff(g, path=str(p))
    np.testing.assert_array_equal(readimg(str(p)), g)
    with pytest.raises(ValueError, match="not a TIFF"):
        read_tiff(b"nope")
    # JPEG-in-TIFF stays the documented env seam
    buf = bytearray(write_tiff(g))
    # patch Compression tag (259) value to 7 (JPEG)
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    for e in range(n):
        base = ifd_off + 2 + 12 * e
        (tag,) = struct.unpack_from("<H", buf, base)
        if tag == 259:
            struct.pack_into("<H", buf, base + 8, 7)
    with pytest.raises(NotImplementedError, match="JPEG"):
        read_tiff(bytes(buf))


@given(
    arrays(
        dtype=np.uint8,
        shape=st.tuples(
            st.integers(1, 9), st.integers(1, 9)
        ),
        elements=st.integers(0, 255),
    ),
    st.sampled_from(["none", "packbits", "lzw"]),
    st.sampled_from([1, 2]),
)
@settings(max_examples=60, deadline=None)
def test_tiff_gray_roundtrip_fuzz(arr, comp, pred):
    got = read_tiff(write_tiff(arr, compression=comp, predictor=pred))
    np.testing.assert_array_equal(got, arr)


@given(st.binary(max_size=3000))
@settings(max_examples=120, deadline=None)
def test_lzw_packbits_roundtrip_fuzz(data):
    assert lzw_decode(lzw_encode(data)) == data
    assert packbits_decode(packbits_encode(data)) == data
