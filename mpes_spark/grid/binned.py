"""Dense labeled N-D histogram container (driver-side, small data).

Plays the role of the reference's ``histdict`` + xarray wrappers
(``res_to_xarray``, ``/root/reference/mpes/fprocessing.py:3320-3352``;
``BandStructure``/``MPESDataset``,
``/root/reference/mpes/bandstructure.py``). xarray is not a hard
dependency — the container is a thin numpy wrapper with an optional
``to_xarray()`` export when the library is available.

These post-aggregation ops never exceed ~1e7-1e8 cells (the binned
grid), so they deliberately stay on the driver; distributing them
would add shuffles for no gain (SURVEY §2.6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class BinnedArray:
    """Dense counts array with named dims and per-axis coordinate
    vectors (bin midpoints by default)."""

    data: np.ndarray
    dims: list[str]
    coords: dict[str, np.ndarray]
    attrs: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if len(self.dims) != self.data.ndim:
            raise ValueError("dims must name every array axis")
        for d, n in zip(self.dims, self.data.shape):
            if d not in self.coords or len(self.coords[d]) != n:
                raise ValueError(f"coords[{d!r}] must have length {n}")

    # -- lookups ------------------------------------------------------

    def axis_index(self, dim: str) -> int:
        return self.dims.index(dim)

    def _nearest(self, dim: str, value: float) -> int:
        """Nearest-coordinate index (find_nearest,
        /root/reference/mpes/utils.py:15-30)."""
        return int(np.argmin(np.abs(self.coords[dim] - value)))

    # -- slicing / cropping -------------------------------------------

    def isel(self, **indexers: int | slice) -> "BinnedArray":
        """Integer-position selection (xarray-style)."""
        slicer = [slice(None)] * self.data.ndim
        for dim, idx in indexers.items():
            slicer[self.axis_index(dim)] = idx
        new = self.data[tuple(slicer)]
        dims, coords = [], {}
        for dim, ix in zip(self.dims, slicer):
            if isinstance(ix, slice):
                dims.append(dim)
                coords[dim] = self.coords[dim][ix]
        return BinnedArray(new, dims, coords, dict(self.attrs))

    def sel(self, **indexers: float | tuple[float, float]) -> "BinnedArray":
        """Value-based selection: scalar -> nearest bin; (lo, hi) ->
        inclusive coordinate crop (``updateHistogram``,
        /root/reference/mpes/fprocessing.py:1324-1343)."""
        pos: dict[str, int | slice] = {}
        for dim, v in indexers.items():
            if isinstance(v, tuple):
                c = self.coords[dim]
                mask = (c >= v[0]) & (c <= v[1])
                ix = np.nonzero(mask)[0]
                pos[dim] = slice(int(ix[0]), int(ix[-1]) + 1) if len(ix) else slice(0, 0)
            else:
                pos[dim] = self._nearest(dim, float(v))
        return self.isel(**pos)

    # -- rebin / resize (u.arraybin, /root/reference/mpes/utils.py:295-333;
    #    BandStructure.resize, /root/reference/mpes/bandstructure.py:144-174)

    def rebin(self, factors: dict[str, int], method: str = "sum") -> "BinnedArray":
        """Shrink each named axis by an integer factor (trailing
        remainder bins are truncated), aggregating with sum or mean;
        coordinates are averaged per block."""
        facs = [factors.get(d, 1) for d in self.dims]
        trimmed = self.data[
            tuple(slice(0, (s // f) * f) for s, f in zip(self.data.shape, facs))
        ]
        shape = []
        for s, f in zip(trimmed.shape, facs):
            shape.extend([s // f, f])
        blocks = trimmed.reshape(shape)
        ax = tuple(range(1, 2 * self.data.ndim, 2))
        out = blocks.sum(axis=ax) if method == "sum" else blocks.mean(axis=ax)
        coords = {}
        for d, f, s in zip(self.dims, facs, trimmed.shape):
            c = self.coords[d][:s]
            coords[d] = c.reshape(s // f, f).mean(axis=1)
        return BinnedArray(out, list(self.dims), coords, dict(self.attrs))

    # -- reductions / differences (MPESDataset.subset / slicediff,
    #    /root/reference/mpes/bandstructure.py:268-372)

    def subset(self, dim: str, rng: tuple[float, float], reduce: str = "mean") -> "BinnedArray":
        """Crop one axis to a value range then reduce it away."""
        cropped = self.sel(**{dim: rng})
        axis = cropped.axis_index(dim)
        fn = {"mean": np.mean, "sum": np.sum}[reduce]
        new = fn(cropped.data, axis=axis)
        dims = [d for d in cropped.dims if d != dim]
        coords = {d: cropped.coords[d] for d in dims}
        return BinnedArray(new, dims, coords, dict(self.attrs))

    def slicediff(self, dim: str, a: float, b: float) -> "BinnedArray":
        """Difference of two hyperslices along ``dim`` (nearest bins)."""
        return BinnedArray(
            self.isel(**{dim: self._nearest(dim, a)}).data
            - self.isel(**{dim: self._nearest(dim, b)}).data,
            [d for d in self.dims if d != dim],
            {d: self.coords[d] for d in self.dims if d != dim},
            dict(self.attrs),
        )

    # -- intensity ops (BandStructure scale/norm,
    #    /root/reference/mpes/bandstructure.py:98-123)

    def scale(self, factor: float) -> "BinnedArray":
        return BinnedArray(self.data * factor, list(self.dims), dict(self.coords), dict(self.attrs))

    def normalize(self) -> "BinnedArray":
        m = self.data.max()
        return self.scale(1.0 / m) if m else self

    def rename_dims(self, keypair: dict[str, str] | None = None) -> "BinnedArray":
        """Rename axes per a mapping — the ``BandStructure`` keypair
        convention ``{'ADC': 'tpp', 'X': 'kx', 'Y': 'ky', 't': 'E'}``
        (``/root/reference/mpes/bandstructure.py:22-57``); unmapped
        dims keep their names. Bin-index suffixes (``X_bin``) map via
        their base name."""
        keypair = keypair or {"ADC": "tpp", "X": "kx", "Y": "ky", "t": "E"}

        def re_name(d: str) -> str:
            if d in keypair:
                return keypair[d]
            if d.endswith("_bin") and d[:-4] in keypair:
                return keypair[d[:-4]]
            return d

        dims = [re_name(d) for d in self.dims]
        coords = {re_name(d): c for d, c in self.coords.items()}
        return BinnedArray(self.data, dims, coords, dict(self.attrs))

    # -- exports -------------------------------------------------------

    def to_dict(self) -> dict:
        """The reference's ``histdict`` shape: {'binned': arr, ax: coords}."""
        out = {"binned": self.data}
        out.update({d: self.coords[d] for d in self.dims})
        return out

    def to_xarray(self):
        """Optional xarray export (not installed in the test env)."""
        try:
            import xarray as xr
        except ImportError as exc:  # pragma: no cover
            raise ImportError("xarray is not available in this environment") from exc
        return xr.DataArray(
            self.data,
            dims=self.dims,
            coords={d: self.coords[d] for d in self.dims},
            attrs=self.attrs,
        )
