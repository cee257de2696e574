"""Tests for image registration, lineshape fitting, and volume
alignment — numpy parity on synthetic inputs, plus the compile-to-
Spark-expression path of the MomentumCorrector workflow."""

from __future__ import annotations

import numpy as np
import pytest

from mpes_spark.analysis.align import (
    apply_alignment,
    calc_shift_scale,
    calc_shift_scale_map,
)
from mpes_spark.analysis.fitting import (
    Model,
    bootstrapfit,
    erf,
    func_add,
    gaussian,
    lm_fit,
    lorentzian,
    pseudo_voigt,
    skewed_gaussian,
)
from mpes_spark.analysis.registration import (
    MomentumCorrector,
    apply_warping,
    compose_deform_fields,
    deform_field_from_homography,
    find_homography,
    homography_from_params,
    symmetry_score,
    vertex_generator,
    warp_image,
)


# -- registration ----------------------------------------------------------

def test_vertex_generator_hexagon():
    v = vertex_generator((50.0, 50.0), (50.0, 70.0), rotsym=6)
    assert v.shape == (6, 2)
    d = np.linalg.norm(v - [50, 50], axis=1)
    np.testing.assert_allclose(d, 20.0, atol=1e-9)
    s = symmetry_score(v, (50.0, 50.0))
    assert s["radial_spread"] < 1e-12 and s["angular_spread"] < 1e-12


def test_find_homography_recovers_exact():
    rng = np.random.default_rng(2)
    H_true = np.array([[0.95, 0.08, 3.0], [-0.05, 1.05, -2.0], [1e-4, -5e-5, 1.0]])
    src = rng.uniform(0, 100, (12, 2))
    sh = np.column_stack([src, np.ones(12)]) @ H_true.T
    dst = sh[:, :2] / sh[:, 2:]
    H = find_homography(src, dst)
    np.testing.assert_allclose(H, H_true, atol=1e-8)


def test_homography_from_params_rotation():
    M = homography_from_params(angle=90.0, center=(10.0, 10.0))
    p = M @ np.array([12.0, 10.0, 1.0])
    np.testing.assert_allclose(p[:2] / p[2], [10.0, 12.0], atol=1e-9)
    # identity params -> identity matrix
    np.testing.assert_allclose(homography_from_params(), np.eye(3), atol=1e-12)


def test_warp_image_translation():
    img = np.zeros((30, 30))
    img[10, 12] = 5.0
    M = homography_from_params(translation=(3.0, 2.0))  # (x=row?, see convention)
    out = warp_image(img, M)
    # the bright pixel moves by the translation vector
    r, c = np.unravel_index(np.nanargmax(out), out.shape)
    assert (r, c) == (13, 12 + 2)


def test_apply_warping_stack_and_fields():
    img = np.zeros((20, 20))
    img[5, 5] = 1.0
    M = homography_from_params(translation=(1.0, 0.0))
    stack = np.stack([img, img])
    out = apply_warping(stack, M)
    assert np.nanargmax(out[0]) == np.nanargmax(out[1])
    rd, cd = deform_field_from_homography(M, (20, 20))
    np.testing.assert_allclose(rd[5, 5], 6.0)
    np.testing.assert_allclose(cd[5, 5], 5.0)
    # composing with the inverse lands back on the identity
    Mi = np.linalg.inv(M)
    rdi, cdi = deform_field_from_homography(Mi, (20, 20))
    rr, cc = compose_deform_fields(rd, cd, rdi, cdi)
    np.testing.assert_allclose(rr[5, 5], 5.0, atol=1e-9)


def _hex_image(center=(32.0, 32.0), radius=18.0, distort=None):
    img = np.zeros((64, 64))
    v = vertex_generator(center, (center[0], center[1] + radius), rotsym=6)
    pts = np.vstack([v, center])
    if distort is not None:
        ph = np.column_stack([pts, np.ones(len(pts))]) @ np.asarray(distort).T
        pts = ph[:, :2] / ph[:, 2:]
    rr, cc = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    for p in pts:
        img += np.exp(-((rr - p[0]) ** 2 + (cc - p[1]) ** 2) / 3.0)
    return img


def test_momentum_corrector_workflow(spark):
    distort = homography_from_params(scale=(1.15, 0.9), center=(32.0, 32.0))
    img = _hex_image(distort=distort)
    mc = MomentumCorrector(img, rotsym=6).feature_extract(radius=3, threshold=0.5)
    assert mc.landmarks.shape == (6, 2)
    before = mc.symmetry()
    mc.make_targets()
    M = mc.lin_warp_estimate()
    # warping the landmarks by M must land on the symmetric targets
    lm_h = np.column_stack([mc.landmarks, np.ones(6)]) @ M.T
    lm_w = lm_h[:, :2] / lm_h[:, 2:]
    after = symmetry_score(lm_w, mc.center)
    assert after["radial_spread"] < before["radial_spread"]
    assert after["radial_spread"] < 0.02
    # spline estimate pins the landmarks exactly
    co, src = mc.spline_warp_estimate()
    from mpes_spark.calibrate.tps import tps_eval

    gx, gy = tps_eval(co, src, mc.landmarks[:, 0], mc.landmarks[:, 1])
    np.testing.assert_allclose(np.c_[gx, gy], mc.targets, atol=1e-6)
    # compiled Spark exprs evaluate
    xt, yt = mc.homography_exprs("X", "Y")
    df = spark.createDataFrame([(10.0, 20.0)], "X double, Y double")
    row = df.select(xt.alias("xt"), yt.alias("yt")).collect()[0]
    assert np.isfinite(row.xt) and np.isfinite(row.yt)


# -- fitting ---------------------------------------------------------------

def test_erf_accuracy():
    import math

    xs = np.linspace(-3, 3, 25)
    np.testing.assert_allclose(erf(xs), [math.erf(v) for v in xs], atol=2e-7)


def test_model_fit_gaussian():
    x = np.linspace(-5, 5, 201)
    y = gaussian(x, amp=3.0, xc=0.7, sig=1.2)
    m = Model(lambda x, p: gaussian(x, *p), ["amp", "xc", "sig"])
    res = m.fit(x, y, [1.0, 0.0, 1.0])
    assert res["params"]["amp"] == pytest.approx(3.0, rel=1e-4)
    assert res["params"]["xc"] == pytest.approx(0.7, rel=1e-3)


def test_func_add_two_peaks():
    fn, names = func_add(
        ("gaussian", ["amp", "xc", "sig"]), ("lorentzian", ["amp", "xc", "gam"])
    )
    assert names == ["amp_0", "xc_0", "sig_0", "amp_1", "xc_1", "gam_1"]
    x = np.linspace(-10, 10, 401)
    true = [2.0, -3.0, 1.0, 1.5, 4.0, 1.5]
    y = fn(x, true)
    res = Model(fn, names).fit(x, y, [1.0, -2.5, 1.2, 1.0, 3.5, 1.0])
    np.testing.assert_allclose(res["p"], true, rtol=1e-3)


def test_pseudo_voigt_and_skewed():
    x = np.linspace(-5, 5, 101)
    pv = pseudo_voigt(x, amp=1.0, xc=0.0, sig=1.0, gam=1.0, eta=0.3)
    assert pv.max() == pytest.approx(1.0, rel=1e-6)
    sk = skewed_gaussian(x, amp=1.0, xc=0.0, sig=1.0, alpha=3.0)
    # positive skew pushes mass to the right
    assert sk[x > 0].sum() > sk[x < 0].sum()


def test_bootstrapfit_tracks_moving_peak():
    x = np.linspace(-5, 5, 201)
    centers = np.linspace(-1.0, 1.0, 8)
    data = np.stack([gaussian(x, amp=2.0, xc=c, sig=0.8) for c in centers])
    m = Model(lambda x, p: gaussian(x, *p), ["amp", "xc", "sig"])
    params = bootstrapfit(data, x, m, [1.5, -1.2, 1.0])
    np.testing.assert_allclose(params[:, 1], centers, atol=0.02)


def test_lm_fit_with_bounds():
    p, cost = lm_fit(lambda p: np.array([p[0] - 5.0]), np.array([0.0]), bounds=[(None, 2.0)])
    assert p[0] == pytest.approx(2.0)


# -- alignment -------------------------------------------------------------

def test_calc_shift_scale_recovers():
    x = np.arange(100, dtype=float)
    ref = np.exp(-((x - 50) ** 2) / 30.0)
    shifted = np.exp(-(((x - 4) - 50) ** 2) / 30.0)  # ref shifted by +4
    sh, sc, _ = calc_shift_scale(ref, shifted, np.arange(-6, 7), np.array([1.0]))
    assert sh == -4.0


def test_alignment_roundtrip():
    x = np.arange(60, dtype=float)
    base = np.exp(-((x - 30) ** 2) / 20.0)
    vol_ref = np.tile(base[:, None, None], (1, 3, 3))
    shift_true = np.array([[2.0, -1.0, 0.0]] * 3).T
    vol_mov = np.empty_like(vol_ref)
    for i in range(3):
        for j in range(3):
            vol_mov[:, i, j] = np.interp(x - shift_true[i, j], x, base)
    sh_map, sc_map = calc_shift_scale_map(
        vol_ref, vol_mov, np.arange(-3, 4, 0.5), np.array([1.0])
    )
    aligned = apply_alignment(vol_mov, sh_map, sc_map)
    assert np.abs(aligned - vol_ref).max() < 0.05


def test_view_event_histogram(spark):
    from mpes_spark.pipeline import EventPipeline
    from mpes_spark.registry import t
    from tests.conftest import SF_SMALL

    ev = t(spark, SF_SMALL, "events")
    hists = EventPipeline(ev).view_event_histogram(["value", "user_id"], nbins=20)
    assert set(hists) == {"value", "user_id"}
    assert hists["value"].data.sum() == ev.filter("value is not null").count()
    assert hists["value"].data.shape == (20,)
