"""End-to-end workflow integration test — the reference's EP1->EP3
lifecycle (SURVEY §3) on synthetic event data with known ground
truth:

1. generate single-electron events whose true (kx, ky) form a
   symmetric hexagon of gaussian spots, observed through a known
   homography distortion (detector coordinates), written to parquet;
2. EP1: coarse-bin the detector image distributed;
3. EP3: extract landmark peaks from the binned image, solve the
   linear warp on the driver (MomentumCorrector);
4. EP2: apply the solved correction to the *event table* as column
   math and re-bin distributed;
5. verify: corrected landmarks are measurably more symmetric than the
   distorted ones and match the true hexagon geometry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mpes_spark.analysis.image import peakdetect2d
from mpes_spark.analysis.registration import (
    MomentumCorrector,
    symmetry_score,
    vertex_generator,
)
from mpes_spark.binning.engine import bin_dataframe
from mpes_spark.binning.spec import BinAxis
from mpes_spark.pipeline import EventPipeline


GRID = 128
CENTER = (64.0, 64.0)
RADIUS = 40.0
N_PER_SPOT = 4000


@pytest.fixture(scope="module")
def event_parquet(spark, tmp_path_factory):
    """Synthetic event table: hexagon spots + center, warped by a
    known distortion into detector coordinates."""
    from mpes_spark.analysis.registration import homography_from_params

    rng = np.random.default_rng(42)
    true_pts = np.vstack(
        [vertex_generator(CENTER, (CENTER[0], CENTER[1] + RADIUS), rotsym=6), CENTER]
    )
    distort = homography_from_params(
        scale=(1.2, 0.85), angle=4.0, center=CENTER
    )
    rows = []
    for p in true_pts:
        pts = rng.normal(0, 2.0, (N_PER_SPOT, 2)) + p
        ph = np.column_stack([pts, np.ones(len(pts))]) @ distort.T
        det = ph[:, :2] / ph[:, 2:]
        rows.append(det)
    det = np.vstack(rows)
    pdf = pd.DataFrame({"X": det[:, 0], "Y": det[:, 1]})
    path = str(tmp_path_factory.mktemp("wf") / "events.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    return path


def _image(spark, path, x="X", y="Y"):
    ev = EventPipeline(spark.read.parquet(path))
    ba = ev.bin(
        [
            BinAxis(x, nbins=GRID, lo=0.0, hi=float(GRID), name="r"),
            BinAxis(y, nbins=GRID, lo=0.0, hi=float(GRID), name="c"),
        ]
    )
    return ba.data


def test_full_correction_workflow(spark, event_parquet):
    # EP1: coarse distributed binning of the distorted detector image
    img = _image(spark, event_parquet)
    assert img.sum() > 0.9 * 7 * N_PER_SPOT  # most events land on-grid

    # EP3: landmark extraction + driver-side warp solve
    mc = MomentumCorrector(img, rotsym=6).feature_extract(radius=4, threshold=20.0)
    before = mc.symmetry()
    mc.make_targets()
    M = mc.lin_warp_estimate()

    # EP2: apply the solved homography to the EVENT TABLE (column
    # math, no UDF) and re-bin distributed
    corrected = (
        EventPipeline(spark.read.parquet(event_parquet))
        .apply_homography(M, x="X", y="Y", out_x="Xc", out_y="Yc")
    )
    img_c = corrected.bin(
        [
            BinAxis("Xc", nbins=GRID, lo=0.0, hi=float(GRID), name="r"),
            BinAxis("Yc", nbins=GRID, lo=0.0, hi=float(GRID), name="c"),
        ]
    ).data

    # verify: peaks of the corrected image are more symmetric and sit
    # on the true hexagon
    pk = peakdetect2d(img_c, radius=4, threshold=20.0, num_peaks=7)
    assert len(pk) == 7
    center_i = int(np.argmin(np.linalg.norm(pk - np.asarray(CENTER), axis=1)))
    ring = np.delete(pk, center_i, axis=0).astype(float)
    after = symmetry_score(ring, CENTER)
    assert after["radial_spread"] < before["radial_spread"]
    assert after["radial_spread"] < 0.05
    # ring radius restored to truth within a couple of bins
    rad = np.linalg.norm(ring - np.asarray(CENTER), axis=1).mean()
    assert rad == pytest.approx(RADIUS, abs=2.5)


def test_energy_calibration_workflow_distributed(spark, tmp_path):
    """Energy arm of EP3: a bias scan whose per-bias ToF peak follows
    a known poly energy law -> distributed EDC matrix
    (histogram_per_group) -> EnergyCalibrator solve on the driver ->
    solved axis applied to the event table -> binned energy peaks land
    at the bias energies."""
    from mpes_spark.binning.engine import densify, histogram_per_group
    from mpes_spark.calibrate import EnergyCalibrator, poly_energy_axis

    rng = np.random.default_rng(7)
    a_true = np.array([3e-9, -2e-6, 0.04])
    biases = np.array([10.0, 12.0, 14.0, 16.0, 18.0])
    tof_axis = np.linspace(200.0, 800.0, 1201)
    e_of_t = poly_energy_axis(a_true, 0.0, tof_axis)
    peak_tofs = [float(tof_axis[np.argmin(np.abs(e_of_t - b))]) for b in biases]

    frames = []
    for b, pt in zip(biases, peak_tofs):
        frames.append(
            pd.DataFrame(
                {"bias": f"b{b:.0f}", "t": rng.normal(pt, 5.0, 20_000)}
            )
        )
    path = str(tmp_path / "bias_scan.parquet")
    spark.createDataFrame(pd.concat(frames)).write.parquet(path)
    ev = spark.read.parquet(path)

    # distributed EDC matrix: one trace per bias file/group
    ax = BinAxis("t", nbins=600, lo=200.0, hi=800.0)
    edc = histogram_per_group(ev, ax, "bias")
    pdf = edc.toPandas().pivot_table(
        index="bias", columns=ax.out, values="cnt", fill_value=0.0
    )
    order = [f"b{b:.0f}" for b in biases]
    traces = np.zeros((len(biases), ax.nbins))
    cols = {c: i for i, c in enumerate(pdf.columns)}
    for r, name in enumerate(order):
        for c, v in pdf.loc[name].items():
            traces[r, cols[c] if isinstance(c, str) else int(c)] = v
    tof = ax.centers()

    cal = (
        EnergyCalibrator(biases, traces, tof)
        .normalize()
        .add_features((peak_tofs[0] - 30, peak_tofs[0] + 30), refid=0)
        .feature_extract(pkwindow=8)
        .calibrate(order=3, refid=0, Eref=float(biases[0]))
    )

    # apply the SOLVED axis distributed and bin each bias group: the
    # energy peak of group b must land at energy b
    from pyspark.sql import functions as F

    from mpes_spark.binning.engine import bin_sparse

    calib = EnergyCalibrator(biases, traces, tof)
    calib.calibration = cal
    with_e = ev.withColumn("E", calib.energy_expr("t"))
    eax = BinAxis("E", nbins=200, lo=8.0, hi=20.0)
    for b in biases:
        grp = with_e.filter(F.col("bias") == f"b{b:.0f}")
        hist = densify(bin_sparse(grp, [eax]), [eax])
        peak_e = hist.coords[eax.out][int(np.argmax(hist.data))]
        assert peak_e == pytest.approx(b, abs=0.15)


def test_workflow_persists_roundtrip(spark, event_parquet, tmp_path):
    """The produced histogram survives a save/load cycle with the
    calibration parameters alongside — the session-resume story."""
    from mpes_spark.io.writers import load_binned, load_params, save_binned, save_params

    img = _image(spark, event_parquet)
    mc = MomentumCorrector(img, rotsym=6).feature_extract(radius=4, threshold=20.0)
    mc.make_targets()
    M = mc.lin_warp_estimate()

    ba = EventPipeline(spark.read.parquet(event_parquet)).bin(
        [
            BinAxis("X", nbins=64, lo=0.0, hi=float(GRID)),
            BinAxis("Y", nbins=64, lo=0.0, hi=float(GRID)),
        ]
    )
    save_binned(ba, str(tmp_path / "h.npz"))
    save_params({"warping": M, "landmarks": mc.landmarks}, str(tmp_path / "cal.json"))
    back = load_binned(str(tmp_path / "h.npz"))
    cal = load_params(str(tmp_path / "cal.json"))
    np.testing.assert_array_equal(back.data, ba.data)
    np.testing.assert_allclose(cal["warping"], M)
