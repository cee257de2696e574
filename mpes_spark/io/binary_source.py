"""Pluggable binary event-source ingest: the HDF5 seam, h5py-free.

The reference's native acquisition format is single-event HDF5
(``hdf5Reader``, ``/root/reference/mpes/fprocessing.py:468-856``):
per-file ``Stream_*`` datasets carrying one column of events each, an
attribute ``Name`` per dataset giving the physical alias (X, Y, t,
ADC), an ``msMarkers`` dataset mapping wall-clock milliseconds to
event indices, and file attributes like ``FirstEventTimeStamp``. The
reference assembles those into a dask dataframe by hand-chunking
``CHUNK_SIZE = 1e6`` events per partition
(``fprocessing.py:476,787-806``).

Spark re-expression: ingest is a *source adapter*, not a format.
Everything format-specific sits behind :class:`BinaryEventBackend` —
four small methods a backend implements per file. The Spark side is
backend-agnostic and real:

- driver plans (path, amin, amax) chunk rows from per-file event
  counts — the analog of the reference's partition loop, except the
  plan is a tiny DataFrame and the reads happen on executors;
- ``mapInPandas`` turns each chunk row into Arrow batches of events
  (alias columns cast to ``float32``, exactly like
  ``_assembleGroups``'s ``dtyp='float32'``,
  ``fprocessing.py:628-660``);
- optional per-event ``timeStamps`` reconstruction from msMarkers
  (``fprocessing.py:664-698``): events before the first marker get
  the file start time, events between markers n and n+1 get
  ``start + n/1000`` s, events after the last marker get
  ``start + len(markers)/1000`` s. (The reference's tail fill adds
  ``len(markers)`` *seconds* — a unit inconsistency with its own
  ``n/1000`` interior fill; we use ``/1000`` consistently.)

At 100 TB this shape is the right one: the chunk plan is metadata
(thousands of rows), each executor task opens only its own file
range, batches flow driver-free as Arrow, and the converted output is
written once to parquet (``convert_to_parquet``, the
``hdf5Reader.convert('parquet')`` analog, ``fprocessing.py:823-856``)
so every later query gets real pushdown/pruning from the columnar
format instead of re-paying ingest.

``read_events_hdf5`` in ``readers.py`` is the thin h5py binding of
this seam; the in-memory :class:`DictBackend` exercises the whole
path in tests without h5py.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field
from typing import Iterator, Protocol

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class BinaryEventBackend(Protocol):
    """Format adapter for one binary event-file family. Instances are
    pickled into executor tasks — keep them lightweight (paths/config,
    not open handles)."""

    def list_streams(self, path: str) -> list[tuple[str, str]]:
        """(group_name, alias) pairs for the event-stream datasets of
        ``path``, in stable order. Alias falls back to the group name
        when the format carries none (``readAttribute`` nullval
        semantics, fprocessing.py:582-610)."""
        ...

    def n_events(self, path: str) -> int:
        """Event count of ``path`` (the reference's ``estimator``
        dataset size, fprocessing.py:479-481)."""
        ...

    def read_stream(self, path: str, group: str, amin: int, amax: int) -> np.ndarray:
        """Values of ``group`` over the half-open index range
        [amin, amax)."""
        ...

    def ms_markers(self, path: str) -> np.ndarray:
        """The msMarkers dataset (event index at each elapsed
        millisecond), empty array if absent."""
        ...

    def start_time(self, path: str) -> float:
        """Epoch seconds of the first event (FirstEventTimeStamp
        attribute; a file-mtime fallback in the h5 binding,
        fprocessing.py:670-686)."""
        ...

    def attributes(self, path: str) -> dict:
        """File-level attribute (metadata) map — the root of the
        ``metaReadHDF5`` attribute tree (fprocessing.py:430-465)."""
        ...


@dataclass
class IngestSpec:
    """What to assemble from each file (the ``_assembleGroups``
    contract): which aliases, the event dtype, chunk size, and whether
    to reconstruct per-event timeStamps."""

    aliases: list[str] | None = None  # None = every stream
    dtype: str = "float32"
    chunk_size: int = 1_000_000
    timestamps: bool = False
    with_file: bool = False


def _reconstruct_timestamps(
    n: int, amin: int, amax: int, markers: np.ndarray, start: float
) -> np.ndarray:
    """Per-event epoch-seconds for events [amin, amax) of a file with
    ``n`` events — vectorized np.searchsorted over the marker list
    instead of the reference's per-marker python loop
    (fprocessing.py:688-698)."""
    idx = np.arange(amin, amax)
    if markers.size == 0:
        return np.full(idx.size, start, dtype="float64")
    # reference piecewise fill: idx < m[0] -> start;
    # idx in [m[n], m[n+1]) -> start + n/1000 (duplicates collapse to
    # the largest such n); idx >= m[-1] -> start + len(m)/1000
    k = np.searchsorted(markers, idx, side="right")
    ms = np.where(k == 0, 0, np.where(k == markers.size, markers.size, k - 1))
    return start + ms / 1000.0


def _chunk_plan(
    spark: SparkSession, paths: list[str], backend: BinaryEventBackend, chunk: int
) -> DataFrame:
    rows = []
    for p in paths:
        n = backend.n_events(p)
        for a in range(0, max(n, 1), chunk):
            rows.append((p, a, min(a + chunk, n)))
    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("amin", T.LongType()),
            T.StructField("amax", T.LongType()),
        ]
    )
    # one chunk per task: the chunk row IS the unit of parallelism
    return spark.createDataFrame(rows, schema).repartition(len(rows))


def read_events_binary(
    spark: SparkSession,
    paths: list[str],
    backend: BinaryEventBackend,
    spec: IngestSpec | None = None,
) -> DataFrame:
    """Distributed ingest of binary event files through a
    :class:`BinaryEventBackend`: plan chunks on the driver, read and
    assemble them on executors via ``mapInPandas`` (Arrow batches).

    Replaces ``hdf5Reader.summarize(form='dataframe')``
    (fprocessing.py:787-811) — same alias lookup, same float32 cast,
    same chunked assembly — with the chunk loop distributed instead of
    dask-delayed on one node."""
    spec = spec or IngestSpec()
    if not paths:
        raise ValueError("no paths to ingest")

    # resolve the output schema from the first file's stream catalog
    streams = backend.list_streams(paths[0])
    if spec.aliases is not None:
        by_alias = {a: g for g, a in streams}
        missing = [a for a in spec.aliases if a not in by_alias]
        if missing:
            raise KeyError(f"aliases not in stream catalog: {missing}")
        streams = [(by_alias[a], a) for a in spec.aliases]

    spark_t = {"float32": T.FloatType(), "float64": T.DoubleType()}.get(
        spec.dtype, T.DoubleType()
    )
    fields = [T.StructField(a, spark_t) for _, a in streams]
    if spec.timestamps:
        fields.append(T.StructField("timeStamps", T.DoubleType()))
    if spec.with_file:
        fields.append(T.StructField("file", T.StringType()))
    out_schema = T.StructType(fields)

    dtype = spec.dtype
    timestamps = spec.timestamps
    with_file = spec.with_file

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for plan in batches:
            for row in plan.itertuples(index=False):
                path, amin, amax = row.path, int(row.amin), int(row.amax)
                cols: dict[str, np.ndarray] = {}
                for g, a in streams:
                    cols[a] = backend.read_stream(path, g, amin, amax).astype(dtype)
                if timestamps:
                    cols["timeStamps"] = _reconstruct_timestamps(
                        backend.n_events(path),
                        amin,
                        amax,
                        np.asarray(backend.ms_markers(path)),
                        backend.start_time(path),
                    )
                out = pd.DataFrame(cols)
                if with_file:
                    out["file"] = path
                yield out

    plan = _chunk_plan(spark, paths, backend, spec.chunk_size)
    return plan.mapInPandas(assemble, schema=out_schema)


def convert_to_parquet(
    spark: SparkSession,
    paths: list[str],
    backend: BinaryEventBackend,
    save_addr: str,
    spec: IngestSpec | None = None,
    mode: str = "overwrite",
) -> None:
    """``hdf5Reader.convert('parquet')`` analog
    (fprocessing.py:823-856): ingest once, persist columnar. ``mode``
    maps the reference's ``pq_append`` flag ('append'/'overwrite')."""
    read_events_binary(spark, paths, backend, spec).write.mode(mode).parquet(save_addr)


def convert_to_mat(
    paths: list[str],
    backend: BinaryEventBackend,
    save_addr: str,
    do_compression: bool = False,
) -> None:
    """``hdf5Reader.convert('mat')`` analog (fprocessing.py:839-841):
    each file's per-stream event arrays packed into one dict (aliased
    stream name -> array; multi-file inputs concatenated per alias)
    and written as a Level-5 MAT-file via the pure-python writer.
    Driver-side by design, exactly as the reference's ``sio.savemat``
    export — this is the small-export path, not an ingest path."""
    import numpy as _np

    from mpes_spark.io.matlib import savemat

    cols: dict[str, list] = {}
    for p in paths:
        n = backend.n_events(p)
        for g, a in backend.list_streams(p):
            cols.setdefault(a, []).append(backend.read_stream(p, g, 0, n))
    savemat(
        save_addr,
        {a: _np.concatenate(v) for a, v in cols.items()},
        do_compression=do_compression,
    )


def read_metadata(
    paths: list[str],
    backend: BinaryEventBackend,
    attributes: list[str] | None = None,
) -> dict[str, dict]:
    """``metaReadHDF5`` analog (fprocessing.py:430-465): per-file
    attribute dictionaries, optionally projected to ``attributes``
    ([] / None = all, matching the reference's selection semantics).
    Driver-side — metadata trees are config-sized, never data-sized."""
    out: dict[str, dict] = {}
    for p in paths:
        attrs = dict(backend.attributes(p))
        if attributes:
            attrs = {k: v for k, v in attrs.items() if k in attributes}
        attrs["n_events"] = backend.n_events(p)
        out[p] = attrs
    return out


def summarize_source(
    spark: SparkSession, paths: list[str], backend: BinaryEventBackend
) -> DataFrame:
    """Catalog relation of a binary source: one row per (file, group,
    alias) with the file's event count and start time — the queryable
    analog of ``hdf5Reader.summarize(form='text'/'metadict')``
    (fprocessing.py:704-760). Driver-side metadata only (stream
    catalogs are tiny); the event payload never moves."""
    rows = []
    for p in paths:
        n = backend.n_events(p)
        st = backend.start_time(p)
        for g, a in backend.list_streams(p):
            rows.append((p, g, a, n, float(st)))
    schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("group", T.StringType()),
            T.StructField("alias", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("start_time", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# in-memory fake backend (tests; also the reference for new bindings)
# ---------------------------------------------------------------------------

@dataclass
class DictBackend:
    """In-memory backend: ``files[path] = {"streams": [(group, alias,
    np.ndarray)], "ms_markers": np.ndarray, "start_time": float |
    None, "mtime": float}``. Mirrors the h5 layout closely enough to
    exercise alias lookup, chunked assembly, dtype cast and timestamp
    reconstruction without h5py."""

    files: dict[str, dict] = field(default_factory=dict)

    def list_streams(self, path: str) -> list[tuple[str, str]]:
        return [(g, a if a is not None else g) for g, a, _ in self.files[path]["streams"]]

    def n_events(self, path: str) -> int:
        return len(self.files[path]["streams"][0][2])

    def read_stream(self, path: str, group: str, amin: int, amax: int) -> np.ndarray:
        for g, _, vals in self.files[path]["streams"]:
            if g == group:
                return np.asarray(vals)[amin:amax]
        raise KeyError(group)

    def ms_markers(self, path: str) -> np.ndarray:
        return np.asarray(self.files[path].get("ms_markers", ()))

    def start_time(self, path: str) -> float:
        st = self.files[path].get("start_time")
        if st is not None:
            return float(st)
        # mtime fallback, corrected by write duration (fprocessing.py:678-686)
        return float(self.files[path]["mtime"]) - len(self.ms_markers(path)) / 1000.0

    def attributes(self, path: str) -> dict:
        return dict(self.files[path].get("attrs", {}))


@dataclass
class SyntheticBackend:
    """Compute-on-read backend: stream values are a deterministic
    function of (file index, stream index, event index), so NOTHING
    but this config dataclass is pickled into executor tasks — each
    task materializes exactly its own [amin, amax) range. This is the
    bench driver for the ingest seam (arbitrary volume, zero driver
    payload) and the scale template for real bindings: at 100 TB the
    backend object must be paths/config, never data. Paths look like
    ``anything_<k>``; ``<k>`` seeds the per-file offset."""

    events_per_file: int = 250_000
    aliases: tuple[str, ...] = ("X", "Y", "t", "ADC")
    ms_marker_step: int = 1_000

    @staticmethod
    def _fidx(path: str) -> int:
        return int(path.rsplit("_", 1)[1])

    def list_streams(self, path: str) -> list[tuple[str, str]]:
        return [(f"Stream_{i}", a) for i, a in enumerate(self.aliases)]

    def n_events(self, path: str) -> int:
        return self.events_per_file

    def read_stream(self, path: str, group: str, amin: int, amax: int) -> np.ndarray:
        i = int(group.rsplit("_", 1)[1])
        f = self._fidx(path)
        idx = np.arange(amin, amax, dtype="float64")
        # branch-free quasi-uniform sweep over [0, 1000), distinct per
        # (file, stream): golden-ratio stride defeats periodic aliasing
        return (idx * (0.61803398875 + 0.1 * i) + f * 1013.0) % 1000.0

    def ms_markers(self, path: str) -> np.ndarray:
        return np.arange(0, self.events_per_file, self.ms_marker_step)

    def start_time(self, path: str) -> float:
        return 1.7e9 + self._fidx(path) * 3600.0

    def attributes(self, path: str) -> dict:
        return {"format": "synthetic", "file_index": self._fidx(path)}


def parse_first_event_timestamp(s: str) -> float:
    """FirstEventTimeStamp attribute parser
    (``%Y-%m-%dT%H:%M:%S.%f%z``, fprocessing.py:671-678)."""
    return datetime.datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()


@dataclass
class Hdf5LiteBackend:
    """Pure-python HDF5 binding of the seam (r9, VERDICT #8 — closes
    the last env gate): the same group/alias discovery contract as
    :class:`Hdf5Backend` (``Stream_*`` datasets, ``Name`` attribute as
    alias, ``Stream_0`` as the event estimator, ``msMarkers`` dataset,
    ``FirstEventTimeStamp`` root attribute — ``hdf5Reader.__init__``,
    /root/reference/mpes/fprocessing.py:479-484) implemented over
    :mod:`mpes_spark.io.hdf5lite` instead of h5py. Contiguous-layout
    event files resolve a chunk's [amin, amax) slice to one byte-range
    decode, so executor tasks read only their own window; chunked or
    compressed files raise toward the real libhdf5 binding. Only the
    estimator name is pickled into tasks — each task opens its own
    file handle (the 100 TB discipline: config travels, data does
    not)."""

    estimator: str = "Stream_0"

    def _open(self, path: str):
        from mpes_spark.io.hdf5lite import read_hdf5

        return read_hdf5(path)

    def list_streams(self, path: str) -> list[tuple[str, str]]:
        f = self._open(path)
        out = []
        for g, ds in f.datasets.items():
            if "Stream" in g:
                out.append((g, str(ds.attrs.get("Name", g))))
        return out

    def n_events(self, path: str) -> int:
        return self._open(path).n_rows(self.estimator)

    def read_stream(self, path: str, group: str, amin: int, amax: int) -> np.ndarray:
        return self._open(path).read(group, amin, amax)

    def ms_markers(self, path: str) -> np.ndarray:
        f = self._open(path)
        return f.read("msMarkers") if "msMarkers" in f.datasets else np.array([])

    def start_time(self, path: str) -> float:
        import os

        f = self._open(path)
        s = f.attrs.get("FirstEventTimeStamp")
        if s is not None:
            return parse_first_event_timestamp(str(s))
        return os.path.getmtime(path) - len(self.ms_markers(path)) / 1000.0

    def attributes(self, path: str) -> dict:
        return dict(self._open(path).attrs)


class Hdf5Backend:
    """h5py binding of the seam — group/alias discovery per
    ``hdf5Reader.__init__`` (fprocessing.py:479-484: ``Stream_*``
    groups, ``Name`` attribute as alias, ``Stream_0`` as the event
    estimator). Import-gated: constructing it without h5py raises, but
    nothing else in this module needs h5py. When files are plain
    contiguous streams (the reference's own layout) the pure-python
    :class:`Hdf5LiteBackend` reads them with no library at all."""

    def __init__(self, estimator: str = "Stream_0"):
        try:
            import h5py  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env has no h5py
            raise NotImplementedError(
                "h5py unavailable: use DictBackend for tests or convert "
                "HDF5 to parquet offline"
            ) from exc
        self.estimator = estimator

    # pragma: no cover - exercised only where h5py exists
    def _open(self, path: str):
        import h5py

        return h5py.File(path, "r")

    def list_streams(self, path: str) -> list[tuple[str, str]]:
        with self._open(path) as f:
            out = []
            for g in f:
                if "Stream" in g:
                    name = f[g].attrs.get("Name", g)
                    out.append((g, name.decode() if isinstance(name, bytes) else str(name)))
            return out

    def n_events(self, path: str) -> int:
        with self._open(path) as f:
            return int(f[self.estimator].size)

    def read_stream(self, path: str, group: str, amin: int, amax: int) -> np.ndarray:
        with self._open(path) as f:
            return f[group][amin:amax]

    def ms_markers(self, path: str) -> np.ndarray:
        with self._open(path) as f:
            return f["msMarkers"][:] if "msMarkers" in f else np.array([])

    def start_time(self, path: str) -> float:
        import os

        with self._open(path) as f:
            s = f.attrs.get("FirstEventTimeStamp")
            if s is not None:
                return parse_first_event_timestamp(
                    s.decode() if isinstance(s, bytes) else str(s)
                )
            return os.path.getmtime(path) - len(self.ms_markers(path)) / 1000.0

    def attributes(self, path: str) -> dict:
        with self._open(path) as f:
            return {
                k: (v.decode() if isinstance(v, bytes) else v)
                for k, v in f.attrs.items()
            }
