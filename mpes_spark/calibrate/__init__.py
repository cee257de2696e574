"""Driver-side calibration solvers (SURVEY §2.6 / §7 Phase 4).

Small-data numpy solves whose outputs parameterize the distributed
§2.2 column transforms: energy (poly lstsq + drift-model LM fit),
momentum (two-point scale), thin-plate-spline warp (Bookstein solve),
inverse deformation fields, and the DTW-aligned
:class:`~mpes_spark.calibrate.workflow.EnergyCalibrator` session.
"""

from mpes_spark.calibrate.dfield import generate_dfield
from mpes_spark.calibrate.dtw import dtw_path, normspec, range_convert
from mpes_spark.calibrate.energy import (
    calibrate_energy_poly,
    fit_energy_tof,
    poly_energy_axis,
    tof2ev_model,
)
from mpes_spark.calibrate.momentum import calibrate_k
from mpes_spark.calibrate.tps import tps_coeffs, tps_eval
from mpes_spark.calibrate.workflow import EnergyCalibrator

__all__ = [
    "EnergyCalibrator",
    "calibrate_energy_poly",
    "calibrate_k",
    "dtw_path",
    "fit_energy_tof",
    "generate_dfield",
    "normspec",
    "poly_energy_axis",
    "range_convert",
    "tof2ev_model",
    "tps_coeffs",
    "tps_eval",
]
