"""Pure-numpy Level-5 MAT-file reader/writer (no scipy).

Closes the last environment-bound seam of the reference's I/O surface:
``sio.savemat`` / ``sio.loadmat`` appear in the reference at
``fprocessing.py:841`` (hdf5 -> mat convert of the summary dict),
``fprocessing.py:908`` (``saveDict``'s mat sink, with
``do_compression``), ``base.py:363`` (``saveClassAttributes``), and
``analysis.py:889-892`` (EnergyCalibrator trace/tof load). The runtime
has no scipy, so this module implements the subset of the public
MAT-File Format (Level 5, MathWorks "MAT-File Format" specification)
those call sites exercise:

- numeric arrays of every integer/float width, real and complex;
- logical (bool) arrays;
- char arrays (written as miUINT16 code units, scipy-compatible);
- 1x1 structs from dicts (nested arbitrarily);
- cell arrays from object ndarrays / inhomogeneous lists;
- zlib-compressed elements (``do_compression=True``) on write, and
  transparently on read;
- both byte orders on read (writes native little-endian).

Deliberate reader divergences from scipy, documented for callers:
structs come back as plain dicts (scipy: structured object arrays with
``mat_struct``/recarray machinery) and 1-row char arrays come back as
python ``str`` (scipy: ndarray of unicode). Sparse matrices and MATLAB
objects are out of scope and raise.

Data is serialized Fortran-order, as the format requires. Unsupported
value types raise ``TypeError`` rather than silently pickling.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["savemat", "loadmat", "whosmat", "mat_bytes"]

# -- MAT-file data types (mi*) and array classes (mx*), per the spec ---------
miINT8, miUINT8, miINT16, miUINT16, miINT32, miUINT32 = 1, 2, 3, 4, 5, 6
miSINGLE, miDOUBLE, miINT64, miUINT64 = 7, 9, 12, 13
miMATRIX, miCOMPRESSED, miUTF8, miUTF16, miUTF32 = 14, 15, 16, 17, 18

mxCELL, mxSTRUCT, mxOBJECT, mxCHAR, mxSPARSE = 1, 2, 3, 4, 5
mxDOUBLE, mxSINGLE = 6, 7
mxINT8, mxUINT8, mxINT16, mxUINT16 = 8, 9, 10, 11
mxINT32, mxUINT32, mxINT64, mxUINT64 = 12, 13, 14, 15

_MI_DTYPE = {
    miINT8: "i1", miUINT8: "u1", miINT16: "i2", miUINT16: "u2",
    miINT32: "i4", miUINT32: "u4", miSINGLE: "f4", miDOUBLE: "f8",
    miINT64: "i8", miUINT64: "u8",
}
_CLASS_DTYPE = {
    mxDOUBLE: "f8", mxSINGLE: "f4",
    mxINT8: "i1", mxUINT8: "u1", mxINT16: "i2", mxUINT16: "u2",
    mxINT32: "i4", mxUINT32: "u4", mxINT64: "i8", mxUINT64: "u8",
}
_DTYPE_CLASS = {
    "f8": (mxDOUBLE, miDOUBLE), "f4": (mxSINGLE, miSINGLE),
    "i1": (mxINT8, miINT8), "u1": (mxUINT8, miUINT8),
    "i2": (mxINT16, miINT16), "u2": (mxUINT16, miUINT16),
    "i4": (mxINT32, miINT32), "u4": (mxUINT32, miUINT32),
    "i8": (mxINT64, miINT64), "u8": (mxUINT64, miUINT64),
}
_FLAG_COMPLEX, _FLAG_GLOBAL, _FLAG_LOGICAL = 0x08, 0x04, 0x02


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _pad8(b: bytes) -> bytes:
    r = len(b) % 8
    return b if r == 0 else b + b"\0" * (8 - r)


def _element(mdtype: int, data: bytes) -> bytes:
    """Full or small-element encoding with 8-byte padding."""
    n = len(data)
    if 0 < n <= 4:
        # small element: nbytes in the high half-word, data in-line
        return struct.pack("<HH", mdtype, n) + _pad8(data + b"\0" * (4 - n))[:4]
    return struct.pack("<II", mdtype, n) + _pad8(data)


def _matrix(
    name: str, cls: int, dims: tuple[int, ...], flags: int, body: bytes
) -> bytes:
    head = _element(miUINT32, struct.pack("<II", cls | (flags << 8), 0))
    head += _element(miINT32, struct.pack(f"<{len(dims)}i", *dims))
    head += _element(miINT8, name.encode("latin-1"))
    payload = head + body
    return struct.pack("<II", miMATRIX, len(payload)) + payload


def _canonical(value, oned_as: str):
    """Python value -> writable form; mirrors scipy's coercions."""
    if isinstance(value, (bool, np.bool_)):
        return np.asarray([[value]], dtype=bool)
    if isinstance(value, (int, float, complex, np.generic)):
        return np.atleast_2d(np.asarray(value))
    if isinstance(value, str):
        return value
    if isinstance(value, bytes):
        return np.atleast_2d(np.frombuffer(value, dtype="u1"))
    if isinstance(value, dict):
        return value
    if isinstance(value, (list, tuple)):
        arr = None
        try:
            arr = np.asarray(value)
        except (ValueError, TypeError):
            pass
        if arr is None or arr.dtype == object:
            cell = np.empty((1, len(value)), dtype=object)
            for i, v in enumerate(value):
                cell[0, i] = v
            return cell
        value = arr
    if isinstance(value, np.ndarray):
        if value.ndim == 0:
            value = value.reshape(1, 1)
        elif value.ndim == 1:
            value = value.reshape(1, -1) if oned_as == "row" else value.reshape(-1, 1)
        return value
    raise TypeError(f"cannot write value of type {type(value).__name__} to mat")


def _write_value(name: str, value, oned_as: str) -> bytes:
    if len(name) > 63:
        raise ValueError(
            f"MAT variable name {name!r} exceeds MATLAB's 63-char limit"
        )
    value = _canonical(value, oned_as)

    if isinstance(value, str):
        # UTF-16 code units (surrogate pairs for non-BMP), as MATLAB
        # stores char data; dims count code units, not codepoints
        enc = value.encode("utf-16-le")
        dims = (1, len(enc) // 2) if enc else (0, 0)
        return _matrix(name, mxCHAR, dims, 0, _element(miUINT16, enc))

    if isinstance(value, dict):
        names = list(value)
        for k in names:
            if not isinstance(k, str) or not k:
                raise TypeError("struct field names must be non-empty strings")
            if len(k) > 63:
                # clamping maxlen while ljust'ing the full name would
                # misalign the field-name table -> unreadable file
                raise ValueError(
                    f"struct field name {k!r} exceeds MATLAB's 63-char limit"
                )
        maxlen = max((len(k) for k in names), default=0) + 1
        maxlen = min(max(maxlen, 2), 64)  # MATLAB caps field names at 63 chars
        body = _element(miINT32, struct.pack("<i", maxlen))
        fn = b"".join(k.encode("latin-1").ljust(maxlen, b"\0") for k in names)
        body += _element(miINT8, fn)
        for k in names:
            body += _write_value("", value[k], oned_as)
        return _matrix(name, mxSTRUCT, (1, 1), 0, body)

    if value.dtype == object:
        body = b"".join(
            _write_value("", v, oned_as) for v in value.flatten(order="F")
        )
        return _matrix(name, mxCELL, value.shape, 0, body)

    if value.dtype == bool:
        data = np.asfortranarray(value).astype("<u1")
        return _matrix(
            name, mxUINT8, value.shape, _FLAG_LOGICAL,
            _element(miUINT8, data.tobytes(order="F")),
        )

    if value.dtype.kind == "c":
        cls, mdt = _DTYPE_CLASS["f8" if value.itemsize == 16 else "f4"]
        re = np.asfortranarray(value.real).astype(f"<{_CLASS_DTYPE[cls]}")
        im = np.asfortranarray(value.imag).astype(f"<{_CLASS_DTYPE[cls]}")
        body = _element(mdt, re.tobytes(order="F"))
        body += _element(mdt, im.tobytes(order="F"))
        return _matrix(name, cls, value.shape, _FLAG_COMPLEX, body)

    if value.dtype.kind in "iuf":
        key = value.dtype.kind + str(value.itemsize)
        if key not in _DTYPE_CLASS:
            raise TypeError(f"unsupported numeric dtype {value.dtype}")
        cls, mdt = _DTYPE_CLASS[key]
        data = np.asfortranarray(value).astype(f"<{key}")
        return _matrix(name, cls, value.shape, 0, _element(mdt, data.tobytes(order="F")))

    if value.dtype.kind == "U":
        if value.size != 1:
            raise TypeError("string arrays: write one char matrix per string")
        return _write_value(name, str(value.flatten()[0]), oned_as)

    raise TypeError(f"cannot write dtype {value.dtype} to mat")


def mat_bytes(
    mdict: dict,
    do_compression: bool = False,
    oned_as: str = "row",
) -> bytes:
    """Serialize ``{name: value}`` to Level-5 MAT-file bytes
    (the in-memory core of :func:`savemat`; pairs with
    :func:`loadmat` accepting bytes, mirroring igor's
    ``pxp_bytes``/``load_pxp``)."""
    if oned_as not in ("row", "col"):
        raise ValueError("oned_as must be 'row' or 'col'")
    desc = b"MATLAB 5.0 MAT-file, created by mpes_spark.io.matlib"
    header = desc.ljust(116, b" ") + b"\0" * 8 + struct.pack("<H", 0x0100) + b"IM"
    out = [header]
    for name, value in mdict.items():
        if not isinstance(name, str) or not name:
            raise TypeError("variable names must be non-empty strings")
        el = _write_value(name, value, oned_as)
        if do_compression:
            comp = zlib.compress(el)
            el = struct.pack("<II", miCOMPRESSED, len(comp)) + comp
        out.append(el)
    return b"".join(out)


def savemat(
    path: str,
    mdict: dict,
    do_compression: bool = False,
    oned_as: str = "row",
) -> None:
    """Write ``{name: value}`` to a Level-5 MAT-file.

    ``sio.savemat`` analog (reference call sites listed in the module
    docstring). ``do_compression`` zlib-wraps each variable element,
    matching the reference's ``mat_compression`` kwarg
    (``fprocessing.py:907-908``)."""
    with open(path, "wb") as fh:
        fh.write(mat_bytes(mdict, do_compression=do_compression, oned_as=oned_as))


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

class _Cursor:
    def __init__(self, buf: bytes, bo: str):
        self.buf, self.pos, self.bo = buf, 0, bo

    def tag(self) -> tuple[int, int, bytes]:
        """-> (mdtype, nbytes, data); advances past padding."""
        word = struct.unpack_from(f"{self.bo}I", self.buf, self.pos)[0]
        if word >> 16:  # small element
            mdtype, n = word & 0xFFFF, word >> 16
            data = self.buf[self.pos + 4 : self.pos + 4 + n]
            self.pos += 8
            return mdtype, n, data
        mdtype = word
        n = struct.unpack_from(f"{self.bo}I", self.buf, self.pos + 4)[0]
        data = self.buf[self.pos + 8 : self.pos + 8 + n]
        self.pos += 8 + n
        if mdtype != miCOMPRESSED:  # compressed elements are not padded
            self.pos += (-n) % 8
        return mdtype, n, data

    def done(self) -> bool:
        return self.pos + 8 > len(self.buf)


def _num(data: bytes, mdtype: int, bo: str) -> np.ndarray:
    if mdtype not in _MI_DTYPE:
        raise ValueError(f"unexpected storage type {mdtype} in numeric data")
    return np.frombuffer(data, dtype=f"{bo}{_MI_DTYPE[mdtype]}")


def _chars(data: bytes, mdtype: int, bo: str) -> list[str]:
    if mdtype in (miUINT16, miUTF16):
        units = np.frombuffer(data, dtype=f"{bo}u2")
        # decode as UTF-16 so surrogate pairs reassemble (MATLAB chars
        # are UTF-16 code units); fall back to unit-wise chr for
        # malformed data (lone surrogates). Multi-row grids reshape by
        # code unit, so callers only get fewer-than-dims chars for
        # non-BMP text, which is 1-row in practice.
        try:
            return list(units.astype("<u2").tobytes().decode("utf-16-le"))
        except UnicodeDecodeError:
            return [chr(u) for u in units]
    if mdtype == miUTF8:
        return list(data.decode("utf-8"))
    if mdtype in (miINT8, miUINT8):
        return list(data.decode("latin-1"))
    if mdtype == miUTF32:
        return [chr(u) for u in np.frombuffer(data, dtype=f"{bo}u4")]
    raise ValueError(f"unexpected char storage type {mdtype}")


def _parse_matrix(payload: bytes, bo: str):
    """-> (name, value). Nameless sub-matrices return name ''."""
    cur = _Cursor(payload, bo)
    _, _, flagdata = cur.tag()
    flagword = struct.unpack_from(f"{bo}I", flagdata, 0)[0]
    cls, flags = flagword & 0xFF, (flagword >> 8) & 0xFF
    _, _, dimdata = cur.tag()
    dims = tuple(np.frombuffer(dimdata, dtype=f"{bo}i4").tolist())
    _, _, namedata = cur.tag()
    name = namedata.rstrip(b"\0").decode("latin-1")
    n = int(np.prod(dims)) if dims else 0

    if cls == mxCHAR:
        mdt, _, data = cur.tag()
        chars = _chars(data, mdt, bo)
        if not dims or dims[0] <= 1:
            return name, "".join(chars)
        g = np.array(chars, dtype="U1").reshape(dims, order="F")
        return name, np.array(["".join(row) for row in g], dtype=object)

    if cls == mxSTRUCT:
        _, _, fl = cur.tag()
        maxlen = struct.unpack_from(f"{bo}i", fl, 0)[0]
        _, _, fn = cur.tag()
        fields = [
            fn[i : i + maxlen].rstrip(b"\0").decode("latin-1")
            for i in range(0, len(fn), maxlen)
        ]
        records = []
        for _ in range(max(n, 0)):
            rec = {}
            for f in fields:
                mdt, _, sub = cur.tag()
                if mdt != miMATRIX:
                    raise ValueError("struct field is not a matrix element")
                rec[f] = _parse_matrix(sub, bo)[1]
            records.append(rec)
        if n == 1:
            return name, records[0]
        out = np.empty(dims, dtype=object)
        for i, rec in enumerate(records):
            out[np.unravel_index(i, dims, order="F")] = rec
        return name, out

    if cls in (mxCELL, mxOBJECT):
        if cls == mxOBJECT:  # class name element precedes the fields
            raise NotImplementedError("MATLAB objects are not supported")
        vals = []
        for _ in range(max(n, 0)):
            mdt, _, sub = cur.tag()
            if mdt != miMATRIX:
                raise ValueError("cell element is not a matrix element")
            vals.append(_parse_matrix(sub, bo)[1])
        out = np.empty(dims, dtype=object)
        for i, v in enumerate(vals):
            out[np.unravel_index(i, dims, order="F")] = v
        return name, out

    if cls == mxSPARSE:
        raise NotImplementedError("sparse matrices are not supported")

    if cls not in _CLASS_DTYPE:
        raise ValueError(f"unsupported array class {cls}")

    mdt, _, data = cur.tag()
    re = _num(data, mdt, bo).astype(_CLASS_DTYPE[cls])
    if flags & _FLAG_COMPLEX:
        mdt, _, data = cur.tag()
        im = _num(data, mdt, bo).astype(_CLASS_DTYPE[cls])
        re = re + 1j * im
    arr = re.reshape(dims, order="F") if dims else re
    if flags & _FLAG_LOGICAL:
        arr = arr.astype(bool)
    return name, arr


def _header_bo(buf: bytes) -> str:
    """Validate the 128-byte MAT5 header, return the byte order."""
    if len(buf) < 128:
        raise ValueError("not a Level-5 MAT-file (truncated header)")
    endian = buf[126:128]
    if endian == b"IM":
        return "<"
    if endian == b"MI":
        return ">"
    raise ValueError("not a Level-5 MAT-file (bad endian indicator)")


def loadmat(path: str | bytes) -> dict:
    """Read a Level-5 MAT-file (path, or raw bytes for in-memory
    containers) -> ``{name: value}``.

    ``sio.loadmat`` analog (``analysis.py:889-892``), with the
    documented divergences: 1x1 structs -> dict, one-row char -> str.
    Handles zlib-compressed elements and both byte orders."""
    if isinstance(path, (bytes, bytearray)):
        buf = bytes(path)
    else:
        with open(path, "rb") as fh:
            buf = fh.read()
    bo = _header_bo(buf)
    out: dict = {}
    cur = _Cursor(buf[128:], bo)
    while not cur.done():
        mdtype, _, data = cur.tag()
        if mdtype == miCOMPRESSED:
            inner = zlib.decompress(data)
            icur = _Cursor(inner, bo)
            mdtype, _, data = icur.tag()
        if mdtype != miMATRIX:
            raise ValueError(f"unexpected top-level element type {mdtype}")
        name, value = _parse_matrix(data, bo)
        out[name] = value
    return out


def whosmat(path: str) -> list[tuple[str, tuple[int, ...], str]]:
    """(name, dims, class) per variable without materializing data."""
    _CLS = {v: k for k, v in {
        "cell": mxCELL, "struct": mxSTRUCT, "char": mxCHAR,
        "double": mxDOUBLE, "single": mxSINGLE, "int8": mxINT8,
        "uint8": mxUINT8, "int16": mxINT16, "uint16": mxUINT16,
        "int32": mxINT32, "uint32": mxUINT32, "int64": mxINT64,
        "uint64": mxUINT64, "sparse": mxSPARSE, "object": mxOBJECT,
    }.items()}
    with open(path, "rb") as fh:
        buf = fh.read()
    bo = _header_bo(buf)
    rows = []
    cur = _Cursor(buf[128:], bo)
    while not cur.done():
        mdtype, _, data = cur.tag()
        if mdtype == miCOMPRESSED:
            icur = _Cursor(zlib.decompress(data), bo)
            mdtype, _, data = icur.tag()
        sub = _Cursor(data, bo)
        _, _, flagdata = sub.tag()
        cls = struct.unpack_from(f"{bo}I", flagdata, 0)[0] & 0xFF
        _, _, dimdata = sub.tag()
        dims = tuple(np.frombuffer(dimdata, dtype=f"{bo}i4").tolist())
        _, _, namedata = sub.tag()
        rows.append((
            namedata.rstrip(b"\0").decode("latin-1"),
            dims,
            _CLS.get(cls, f"class{cls}"),
        ))
    return rows
