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
