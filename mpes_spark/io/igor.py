"""Igor Binary Wave (.ibw) reader/writer, numpy-native and h5py-free.

Re-expresses ``igoribw.loadibw`` (``/root/reference/mpes/igoribw.py:
413-548``) from the PUBLIC on-disk layout in WaveMetrics Technical
Note 003 ("Igor Binary Format"): a version-tagged binary header
(BinHeader1/2/3/5), a wave header (WaveHeader2 for versions 1-3,
WaveHeader5 for version 5), the data block (Fortran order, scaled
axes ``index = sfA[d]*e + sfB[d]``), and version-specific post-data
sections (note, dependency formula, extended units, dimension
labels). All multi-byte fields are 2-byte packed — the flat
``struct`` format strings below ARE the on-disk layout, no padding.

Differences from the reference implementation (by design):

- parses a single ``bytes`` buffer with plain format strings and
  offsets instead of a stream + C-struct emulation layer;
- ships a version-5 WRITER (the reference's ``saveibw`` is
  ``NotImplementedError``), which is what lets the parser be
  round-trip tested without fixture files;
- integer-overflow-free checksum (int64 accumulate, fold to 16 bits)
  instead of emulated C rollover;
- complex-integer waves (Igor's packed (re, im) int pairs) raise
  ``NotImplementedError`` instead of using custom record dtypes —
  they do not occur in photoemission data.

Spark integration: :func:`read_waves_ibw` maps a file plan through
``mapInPandas`` (one row per wave: name, units, shape, axis scaling,
flattened float64 payload), and :func:`ibw_to_binned` bridges a
loaded wave into :class:`~mpes_spark.grid.binned.BinnedArray` with
coordinates materialized from (sfA, sfB) — the reference's pattern of
using Igor waves as image/axis input to the correction workflows.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

MAXDIMS = 4

# IgorMath.h type codes -> numpy dtype strings (byte order applied at
# read time). NT_CMPLX (0x01) combines with the float flags.
_TYPES = {
    0x02: "f4",
    0x04: "f8",
    0x08: "i1",
    0x10: "i2",
    0x20: "i4",
    0x48: "u1",
    0x50: "u2",
    0x60: "u4",
    0x03: "c8",
    0x05: "c16",
}

# On-disk struct layouts (TN003, 2-byte packing -> flat, no padding).
# 'L' stands in for the 32-bit in-memory handle fields ("write zero,
# ignore on read").
_BIN1 = "hlh"
_BIN2 = "hlllh"
_BIN3 = "hhlllh"
_BIN5 = "hh" + "l" * 15
# WaveHeader2: type next bname[20] whVersion srcFldr fileName
#   dataUnits[4] xUnits[4] npnts aModified hsA hsB wModified
#   swModified fsValid topFullScale botFullScale useBits kindBits
#   formula depID creationDate wUnused[2] modDate waveNoteH wData[16]
_WAVE2 = "hL20shhL4s4slhddhhhddBBLlL2sLL16s"
# WaveHeader5: next creationDate modDate npnts type dLock whpad1[6]
#   whVersion bname[32] whpad2 dFolder nDim[4] sfA[4] sfB[4]
#   dataUnits[4] dimUnits[4][4] fsValid whpad3 topFullScale
#   botFullScale dataEUnits dimEUnits[4] dimLabels[4] waveNoteH
#   whUnused[16] aModified wModified swModified useBits kindBits
#   formula depID whpad4 srcFldr fileName sIndices wData[4]
_WAVE5 = "LLLlhh6sh32slL4l4d4d4s16shhddL4L4LL16lhhhBBLlhhLL4s"


def _cstr(raw: bytes) -> str:
    return raw.split(b"\x00", 1)[0].decode("latin-1")


def _checksum16(buf: bytes, order: str) -> int:
    """Sum of int16 words over ``buf`` folded to 16 bits — a valid
    file's header region (version..wave header, wData excluded in v5)
    sums to 0 because the stored checksum field was chosen to cancel
    it."""
    n = len(buf) // 2
    words = np.frombuffer(buf[: 2 * n], dtype=np.dtype(order + "i2"))
    return int(words.sum(dtype=np.int64)) & 0xFFFF


@dataclass
class IgorWave:
    """One parsed wave: the payload plus the metadata a query needs."""

    data: np.ndarray
    name: str
    version: int
    wave_type: int
    data_units: str = ""
    dim_units: list[str] = field(default_factory=list)
    sfA: list[float] = field(default_factory=list)  # axis step per dim
    sfB: list[float] = field(default_factory=list)  # axis start per dim
    note: str = ""
    formula: str = ""
    dim_labels: list[list[str]] = field(default_factory=list)

    def dim_coords(self, d: int) -> np.ndarray:
        """Coordinate vector of dimension ``d``: sfA[d]*e + sfB[d]."""
        n = self.data.shape[d]
        return self.sfA[d] * np.arange(n) + self.sfB[d]


def load_ibw(src, strict: bool = True) -> IgorWave:
    """Parse ``src`` (path or bytes) into an :class:`IgorWave`.

    Versions 1, 2, 3 (WaveHeader2) and 5 (WaveHeader5); numeric waves
    only (text waves and complex-integer waves raise
    ``NotImplementedError``). ``strict=False`` downgrades checksum /
    size-accounting mismatches from errors to acceptance (the
    reference's ``strict`` flag gates its post-data padding assert
    the same way)."""
    buf = src if isinstance(src, (bytes, bytearray)) else open(src, "rb").read()
    buf = bytes(buf)
    if len(buf) < 2:
        raise ValueError("not an IBW file: shorter than the version field")
    (version,) = struct.unpack("<h", buf[:2])
    # zero low byte => file written on an opposite-endian platform
    order = ">" if (version & 0xFF) == 0 else "<"
    (version,) = struct.unpack(order + "h", buf[:2])
    if version not in (1, 2, 3, 5):
        raise ValueError(f"unsupported IBW version {version}")

    binfmt = {1: _BIN1, 2: _BIN2, 3: _BIN3, 5: _BIN5}[version]
    wavefmt = _WAVE2 if version < 5 else _WAVE5
    bsize = struct.calcsize(order + binfmt)
    wsize = struct.calcsize(order + wavefmt)
    cksum_size = bsize + wsize - (4 if version == 5 else 0)
    if strict and _checksum16(buf[:cksum_size], order) != 0:
        raise ValueError("IBW checksum mismatch: corrupt or not an IBW file")
    bin_vals = struct.unpack_from(order + binfmt, buf, 0)
    wav = struct.unpack_from(order + wavefmt, buf, bsize)

    if version == 5:
        (
            _next, creation, mod, npnts, wtype, _dlock, _pad1, _whv, bname,
            _pad2, _dfolder, *rest,
        ) = wav
        ndim = list(rest[0:4])
        sfA = list(rest[4:8])
        sfB = list(rest[8:12])
        data_units = _cstr(rest[12])
        dim_units_raw = rest[13]
        dim_units = [
            _cstr(dim_units_raw[4 * d : 4 * d + 4]) for d in range(MAXDIMS)
        ]
        shape = [n for n in ndim if n > 0] or [0]
        data_off = bsize + wsize - 4  # wData overlays the data block
        (
            _v, _ck, wfm_size, formula_size, note_size, deu_size,
        ) = bin_vals[:6]
        dim_eu_sizes = bin_vals[6:10]
        dim_label_sizes = bin_vals[10:14]
    else:
        (
            wtype, _next, bname, _whv, _src, _fn, data_units_raw, _xunits,
            npnts, _amod, hsA, hsB, *_rest,
        ) = wav
        data_units = _cstr(data_units_raw)
        dim_units = [_cstr(_xunits)]
        sfA, sfB = [hsA], [hsB]
        shape = [npnts]
        data_off = bsize + wsize - 16
        wfm_size = bin_vals[1]
        note_size = bin_vals[2] if version in (2, 3) else 0
        formula_size = bin_vals[3] if version == 3 else 0
        deu_size = 0
        dim_eu_sizes = (0, 0, 0, 0)
        dim_label_sizes = (0, 0, 0, 0)

    if wtype == 0:
        raise NotImplementedError("text waves are not supported")
    if wtype not in _TYPES or (wtype & 0x01 and wtype not in (0x03, 0x05)):
        raise NotImplementedError(f"unsupported wave type 0x{wtype:x}")
    dt = np.dtype(order + _TYPES[wtype])
    nbytes = npnts * dt.itemsize
    if strict and version == 5 and wfm_size - (wsize - 4) != nbytes:
        raise ValueError(
            f"wfmSize accounting mismatch: {wfm_size - (wsize - 4)} != {nbytes}"
        )
    data = (
        np.frombuffer(buf, dtype=dt, count=npnts, offset=data_off)
        .reshape(shape, order="F")
        .astype(dt.newbyteorder("="))  # native order out, whatever came in
    )

    name = _cstr(bname)
    wave = IgorWave(
        data=data,
        name=name,
        version=version,
        wave_type=wtype,
        data_units=data_units,
        dim_units=dim_units[: data.ndim],
        sfA=list(sfA[: data.ndim]),
        sfB=list(sfB[: data.ndim]),
    )

    # post-data sections
    pos = data_off + nbytes
    if version in (2, 3):
        pos += 16  # zero padding
    if version == 3 or version == 5:
        if version == 5:  # v5 order: formula then note
            wave.formula = buf[pos : pos + formula_size].decode("latin-1").strip()
            pos += formula_size
            wave.note = buf[pos : pos + note_size].decode("latin-1").strip()
            pos += note_size + deu_size
            for sz in dim_eu_sizes:
                pos += sz
            for sz in dim_label_sizes:
                labels = buf[pos : pos + sz].split(b"\x00")
                wave.dim_labels.append(
                    [g.decode("latin-1") for g in labels if g]
                )
                pos += sz
        else:  # v3 order: note then formula
            wave.note = buf[pos : pos + note_size].decode("latin-1").strip()
            pos += note_size
            wave.formula = buf[pos : pos + formula_size].decode("latin-1").strip()
    elif version == 2:
        wave.note = buf[pos : pos + note_size].decode("latin-1").strip()
    return wave


def save_ibw(
    path,
    data: np.ndarray,
    name: str = "wave0",
    sfA=None,
    sfB=None,
    data_units: str = "",
    note: str = "",
    byte_order: str = "<",
) -> None:
    """Write ``data`` as a version-5 .ibw (the format every Igor since
    the 90s reads — and the reference leaves unimplemented). Numeric
    dtypes from the TN003 table only; axis scaling defaults to
    identity (sfA=1, sfB=0)."""
    blob = ibw_bytes(data, name, sfA, sfB, data_units, note, byte_order)
    with open(path, "wb") as fh:
        fh.write(blob)


def ibw_bytes(
    data: np.ndarray,
    name: str = "wave0",
    sfA=None,
    sfB=None,
    data_units: str = "",
    note: str = "",
    byte_order: str = "<",
) -> bytes:
    """The version-5 IBW byte image of :func:`save_ibw` — reusable as
    the wave-record payload of a packed experiment
    (:func:`save_pxp`)."""
    data = np.asarray(data)
    rev = {v: k for k, v in _TYPES.items()}
    key = data.dtype.newbyteorder("=").str.lstrip("<>=|")
    if key not in rev:
        raise NotImplementedError(f"dtype {data.dtype} has no IBW type code")
    wtype = rev[key]
    if data.ndim > MAXDIMS:
        raise ValueError(f"IBW supports at most {MAXDIMS} dims")
    ndim = list(data.shape) + [0] * (MAXDIMS - data.ndim)
    sfA = list(sfA or []) + [1.0] * (MAXDIMS - len(list(sfA or [])))
    sfB = list(sfB or []) + [0.0] * (MAXDIMS - len(list(sfB or [])))
    payload = np.asfortranarray(data).astype(
        data.dtype.newbyteorder(byte_order), copy=False
    ).tobytes(order="F")
    note_b = note.encode("latin-1")

    wsize = struct.calcsize(byte_order + _WAVE5)
    wfm_size = (wsize - 4) + len(payload)
    args = (
        # next creationDate modDate npnts type dLock whpad1 whVersion
        [0, 0, 0, data.size, wtype, 0, b"\x00" * 6, 1]
        + [name.encode("latin-1")[:31].ljust(32, b"\x00")]  # bname
        + [0, 0]  # whpad2 dFolder
        + ndim + sfA + sfB
        + [data_units.encode("latin-1")[:3].ljust(4, b"\x00")]
        + [b"\x00" * 16]  # dimUnits
        + [0, 0, 0.0, 0.0]  # fsValid whpad3 topFullScale botFullScale
        + [0] * 10  # dataEUnits dimEUnits[4] dimLabels[4] waveNoteH
        + [0] * 16  # whUnused
        + [0, 0, 0, 0, 0]  # aModified wModified swModified useBits kindBits
        + [0] * 6  # formula depID whpad4 srcFldr fileName sIndices
        + [payload[:4].ljust(4, b"\x00")]  # wData overlays the data block
    )
    wave = struct.pack(byte_order + _WAVE5, *args)
    bin5 = struct.pack(
        byte_order + _BIN5,
        5, 0, wfm_size, 0, len(note_b), 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    )
    # choose the checksum field so the header region sums to 0 (int16)
    s = _checksum16(bin5 + wave[:-4], byte_order)
    ck = (-s) & 0xFFFF
    if ck >= 0x8000:
        ck -= 0x10000
    bin5 = struct.pack(
        byte_order + _BIN5,
        5, ck, wfm_size, 0, len(note_b), 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    )
    return bin5 + wave[:-4] + payload + note_b


def ibw_to_binned(wave: IgorWave, dims: list[str] | None = None):
    """Bridge a loaded wave into the engine's grid type: dims default
    to the wave's dimension labels/units or ``dim{d}``; coordinates
    come from the wave's (sfA, sfB) scaling."""
    from mpes_spark.grid.binned import BinnedArray

    nd = wave.data.ndim
    if dims is None:
        dims = []
        for d in range(nd):
            if d < len(wave.dim_labels) and wave.dim_labels[d]:
                dims.append(wave.dim_labels[d][0])
            elif d < len(wave.dim_units) and wave.dim_units[d]:
                dims.append(wave.dim_units[d])
            else:
                dims.append(f"dim{d}")
    coords = {dims[d]: wave.dim_coords(d) for d in range(nd)}
    return BinnedArray(
        data=np.asarray(wave.data, dtype="float64"),
        dims=list(dims),
        coords=coords,
        attrs={
            "name": wave.name,
            "data_units": wave.data_units,
            "note": wave.note,
        },
    )


def read_waves_ibw(spark, paths: list[str], strict: bool = True):
    """Distributed .ibw catalog scan: one output row per wave file —
    (file, name, wave_type, shape, sfA, sfB, data_units, note,
    values float64-flattened in Fortran order). The file list is the
    parallelism unit (``mapInPandas`` over a path plan, like
    ``binary_source._chunk_plan``); waves are config/image-sized, so
    a row per wave is the right granularity — event-sized data lives
    in the binary-event seam, not IBW."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("wave_type", T.IntegerType()),
            T.StructField("shape", T.ArrayType(T.IntegerType())),
            T.StructField("sfA", T.ArrayType(T.DoubleType())),
            T.StructField("sfB", T.ArrayType(T.DoubleType())),
            T.StructField("data_units", T.StringType()),
            T.StructField("note", T.StringType()),
            T.StructField("values", T.ArrayType(T.DoubleType())),
        ]
    )

    def parse(batches):
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                w = load_ibw(p, strict=strict)
                rows.append(
                    {
                        "file": p,
                        "name": w.name,
                        "wave_type": int(w.wave_type),
                        "shape": list(w.data.shape),
                        "sfA": [float(v) for v in w.sfA],
                        "sfB": [float(v) for v in w.sfB],
                        "data_units": w.data_units,
                        "note": w.note,
                        "values": np.ravel(w.data, order="F")
                        .astype("float64")
                        .tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    plan = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(max(1, len(paths)))
    return plan.mapInPandas(parse, schema=schema)


# ---------------------------------------------------------------------------
# Packed experiments (.pxp) — PTN003's PackedFileRecordHeader walk.
# The reference reads these through the third-party ``igor`` package
# (``readIgorBinFile``, /root/reference/mpes/fprocessing.py:326-346);
# here the container is parsed natively: wave records embed complete
# IBW images, so :func:`load_ibw` decodes each one in place.
# ---------------------------------------------------------------------------

#: PackedFileRecordHeader: ushort recordType, short version, int32 size
_PXP_HDR = "HhI"
_PXP_WAVE = 3
_PXP_FOLDER_START = 9
_PXP_FOLDER_END = 10


def load_pxp(src, strict: bool = True) -> dict:
    """Parse a packed experiment into ``{folder-qualified name:
    IgorWave}`` (folders joined with '/', root elided). Non-wave
    records (history, procedures, variables, recreation macros) are
    skipped — the data model only needs the wave payloads, exactly
    what the reference keeps from ``igor.load``. ``strict`` gates the
    per-wave IBW checksum as in :func:`load_ibw`."""
    buf = src if isinstance(src, (bytes, bytearray)) else open(src, "rb").read()
    buf = bytes(buf)
    order = "<"
    hsize = struct.calcsize(order + _PXP_HDR)
    pos = 0
    folders: list[str] = []
    waves: dict = {}
    while pos + hsize <= len(buf):
        rtype, _ver, nbytes = struct.unpack_from(order + _PXP_HDR, buf, pos)
        rtype &= 0x7FFF
        pos += hsize
        if pos + nbytes > len(buf):
            if strict:
                raise ValueError("truncated packed-experiment record")
            break
        payload = buf[pos : pos + nbytes]
        pos += nbytes
        if rtype == _PXP_FOLDER_START:
            folders.append(_cstr(payload[:32]))
        elif rtype == _PXP_FOLDER_END:
            if folders:
                folders.pop()
        elif rtype == _PXP_WAVE:
            w = load_ibw(payload, strict=strict)
            prefix = [f for f in folders if f and f != "root"]
            waves["/".join([*prefix, w.name])] = w
    return waves


def save_pxp(path, waves: dict, byte_order: str = "<") -> None:
    """Write ``{name-or-folder/qualified/name: ndarray-or-IgorWave}``
    as a packed experiment: folder start/end records bracket each
    '/'-segment, every wave rides as a complete v5 IBW image
    (:func:`ibw_bytes`). Fixture-grade writer so the pxp reader and
    catalog scan are testable without Igor."""
    with open(path, "wb") as fh:
        fh.write(pxp_bytes(waves, byte_order))


def pxp_bytes(waves: dict, byte_order: str = "<") -> bytes:
    """The in-memory byte image of :func:`save_pxp` — lets the packed
    container round-trip inside an Arrow batch (the decode-stats hash
    gate) without touching disk."""

    def _rec(rtype: int, payload: bytes) -> bytes:
        return struct.pack(byte_order + _PXP_HDR, rtype, 5, len(payload)) + payload

    out = bytearray()
    open_stack: list[str] = []

    def _goto(target: list[str]) -> None:
        common = 0
        while (
            common < len(open_stack)
            and common < len(target)
            and open_stack[common] == target[common]
        ):
            common += 1
        while len(open_stack) > common:
            open_stack.pop()
            out.extend(_rec(_PXP_FOLDER_END, b""))
        for f in target[common:]:
            open_stack.append(f)
            out.extend(
                _rec(
                    _PXP_FOLDER_START,
                    f.encode("latin-1")[:31].ljust(32, b"\x00"),
                )
            )

    for qname in sorted(waves):
        *folders, name = qname.split("/")
        _goto(folders)
        w = waves[qname]
        if isinstance(w, IgorWave):
            blob = ibw_bytes(
                w.data, name, w.sfA or None, w.sfB or None,
                w.data_units, w.note, byte_order,
            )
        else:
            blob = ibw_bytes(np.asarray(w), name, byte_order=byte_order)
        out.extend(_rec(_PXP_WAVE, blob))
    _goto([])
    return bytes(out)


def read_waves_pxp(spark, paths: list[str], strict: bool = True):
    """Distributed .pxp catalog scan — the packed-experiment sibling
    of :func:`read_waves_ibw`: one row per wave per file, ``name``
    folder-qualified. Same plan shape (path-list parallelism,
    mapInPandas) and the same schema, so the two scans union."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("wave_type", T.IntegerType()),
            T.StructField("shape", T.ArrayType(T.IntegerType())),
            T.StructField("sfA", T.ArrayType(T.DoubleType())),
            T.StructField("sfB", T.ArrayType(T.DoubleType())),
            T.StructField("data_units", T.StringType()),
            T.StructField("note", T.StringType()),
            T.StructField("values", T.ArrayType(T.DoubleType())),
        ]
    )

    def parse(batches):
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                for qname, w in load_pxp(p, strict=strict).items():
                    rows.append(
                        {
                            "file": p,
                            "name": qname,
                            "wave_type": int(w.wave_type),
                            "shape": list(w.data.shape),
                            "sfA": [float(v) for v in w.sfA],
                            "sfB": [float(v) for v in w.sfB],
                            "data_units": w.data_units,
                            "note": w.note,
                            "values": np.ravel(w.data, order="F")
                            .astype("float64")
                            .tolist(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    plan = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(max(1, len(paths)))
    return plan.mapInPandas(parse, schema=schema)
