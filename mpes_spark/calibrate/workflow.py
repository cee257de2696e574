"""EnergyCalibrator — the end-to-end calibration session.

Driver-side workflow (reference behavior: ``EnergyCalibrator``,
/root/reference/mpes/analysis.py:808-1147): take the per-bias EDC
trace matrix (produced distributed by
:func:`mpes_spark.binning.engine.histogram_per_group`), normalize,
propagate one feature range to all traces by DTW alignment, extract
the peak landmark per trace, then solve the poly (or drift-model)
calibration. The solved coefficients compile into Spark ``Column`` /
oracle SQL expressions via the §2.2 factories — the cluster only ever
sees literals.
"""

from __future__ import annotations

import numpy as np

from mpes_spark.analysis.peaks import peaksearch
from mpes_spark.calibrate.dtw import dtw_path, normspec, range_convert
from mpes_spark.calibrate.energy import calibrate_energy_poly, fit_energy_tof


class EnergyCalibrator:
    """Calibration session over an EDC trace matrix.

    Parameters
    ----------
    biases : (n,) bias voltage per trace
    traces : (n, m) EDC intensity matrix (one row per bias scan)
    tof    : (m,) time-of-flight axis shared by all traces
    """

    def __init__(self, biases, traces, tof):
        self.biases = np.asarray(biases, dtype=float)
        self.traces = np.asarray(traces, dtype=float)
        self.tof = np.asarray(tof, dtype=float)
        if self.traces.shape != (self.biases.size, self.tof.size):
            raise ValueError("traces must be (n_biases, n_tof)")
        self.traces_normed = self.traces
        self.featranges: list[tuple[float, float]] = []
        self.peaks: np.ndarray | None = None
        self.calibration: dict | None = None

    @classmethod
    def from_mat(
        cls,
        files: list[str],
        biases,
        tracename: str = "EDCs",
        tofname: str = "ToF",
    ) -> "EnergyCalibrator":
        """Build a session from MATLAB trace files — the reference's
        ``EnergyCalibrator.read(form='mat')`` branch
        (``/root/reference/mpes/analysis.py:883-892``): ``tracename``
        from each file stacked into the trace matrix, ``tofname``
        ravelled from the last file. Uses the pure-python MAT5 reader
        (:mod:`mpes_spark.io.matlib`), so no scipy is needed."""
        from mpes_spark.io.matlib import loadmat

        traces: list[np.ndarray] = []
        tof = None
        for f in files:
            d = loadmat(f)
            tr = np.asarray(d[tracename], dtype=float)
            traces.extend(tr if tr.ndim == 2 else [tr])
            tof = np.asarray(d[tofname], dtype=float).ravel()
        return cls(biases, np.asarray(traces, dtype=float), tof)

    # -- workflow steps ---------------------------------------------------

    def normalize(self) -> "EnergyCalibrator":
        self.traces_normed = normspec(*self.traces)
        return self

    def add_features(
        self, rng: tuple[float, float], refid: int = 0, infer_others: bool = True
    ) -> "EnergyCalibrator":
        """Register the peak-search range; with ``infer_others`` the
        range is DTW-transported from the reference trace to each
        other trace."""
        if not infer_others:
            self.featranges = [rng] * self.biases.size
            return self
        ref = self.traces_normed[refid]
        ranges = []
        for i in range(self.biases.size):
            path = dtw_path(ref, self.traces_normed[i])
            ranges.append(range_convert(self.tof, rng, path))
        self.featranges = ranges
        return self

    def feature_extract(self, pkwindow: int = 3) -> "EnergyCalibrator":
        self.peaks = peaksearch(
            self.traces_normed, self.tof, self.featranges, pkwindow=pkwindow
        )
        return self

    def calibrate(
        self, refid: int = 0, method: str = "lstsq", order: int = 3, Eref: float | None = None, **kw
    ) -> dict:
        if self.peaks is None:
            raise RuntimeError("run feature_extract() first")
        landmarks = self.peaks[:, 0]
        if method == "lmfit":
            self.calibration = fit_energy_tof(landmarks, self.biases, **kw)
        else:
            self.calibration = calibrate_energy_poly(
                landmarks, self.biases, order=order, refid=refid, Eref=Eref, **kw
            )
        return self.calibration

    # -- compile to engine expressions ------------------------------------

    def energy_expr(self, t: str = "t"):
        """Spark Column for the solved calibration."""
        from mpes_spark.transforms.energy import tof2ev_expr, tof2ev_poly_expr

        cal = self._need_cal()
        if "coeffs" in cal:
            return tof2ev_poly_expr(cal["coeffs"], cal["E0"] or 0.0, t)
        return tof2ev_expr(cal["d"], cal["t0"], cal["E0"], t)

    def energy_sql(self, t_sql: str = "t") -> str:
        from mpes_spark.transforms.energy import tof2ev_poly_sql, tof2ev_sql

        cal = self._need_cal()
        if "coeffs" in cal:
            return tof2ev_poly_sql(cal["coeffs"], cal["E0"] or 0.0, t_sql)
        return tof2ev_sql(cal["d"], cal["t0"], cal["E0"], t_sql)

    def _need_cal(self) -> dict:
        if self.calibration is None:
            raise RuntimeError("run calibrate() first")
        return self.calibration
