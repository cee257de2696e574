"""Numpy-parity tests for the post-aggregation analysis operators on
synthetic spectra/images, plus the distributed applyInPandas adapters."""

from __future__ import annotations

import numpy as np
import pytest

from mpes_spark.analysis.background import shirley, shirley2d
from mpes_spark.analysis.image import (
    apply_mask,
    apply_mask_along,
    bandpath_map,
    circmask,
    curvature2d,
    gradn,
    interp2d_bilinear,
    label_components,
    line_generator,
    peakdetect2d,
    points2path,
    rectmask,
    region_expand,
    segment2d,
)
from mpes_spark.analysis.smooth import blocknorm, nnmean, savgol_filter


def _gauss(x, mu, sig):
    return np.exp(-((x - mu) ** 2) / (2 * sig**2))


# -- shirley ---------------------------------------------------------------

def test_shirley_step_background():
    """Peak on a step: the background must run monotonically from the
    left to the right baseline and absorb the step."""
    x = np.linspace(0, 100, 501)
    yl, yr = 5.0, 1.0
    y = yr + (yl - yr) * (x < 50) + 10 * _gauss(x, 50, 3)
    # smooth the artificial step a little so edges are flat
    y[:10] = yl + 10 * _gauss(x[:10], 50, 3)
    bg = shirley(x, y)
    assert bg[0] == pytest.approx(yl, rel=0.05)
    assert bg[-1] == pytest.approx(yr, rel=0.05)
    d = np.diff(bg)
    assert (d <= 1e-9).all()  # monotone non-increasing
    # background transitions through the peak region
    assert bg[240] > bg[260]


def test_shirley_flat_spectrum_is_flat():
    x = np.linspace(0, 10, 101)
    y = np.full_like(x, 2.0)
    bg = shirley(x, y)
    np.testing.assert_allclose(bg, 2.0, atol=1e-9)


def test_shirley2d_stack():
    x = np.linspace(0, 100, 201)
    tr = np.stack([1 + 5 * _gauss(x, 40, 4), 2 + 3 * _gauss(x, 60, 5)])
    bgs = shirley2d(x, tr)
    assert bgs.shape == tr.shape


# -- smoothing -------------------------------------------------------------

def test_savgol_preserves_polynomial():
    """An SG filter of order p reproduces polynomials of degree <= p
    exactly (away from boundary effects — reflection padding keeps
    linear exact everywhere)."""
    x = np.arange(50, dtype=float)
    y = 3.0 + 2.0 * x
    np.testing.assert_allclose(savgol_filter(y, 7, 2), y, atol=1e-9)


def test_savgol_smooths_noise():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 4 * np.pi, 400)
    clean = np.sin(x)
    noisy = clean + rng.normal(0, 0.2, x.size)
    sm = savgol_filter(noisy, 21, 3)
    assert np.std(sm - clean) < 0.5 * np.std(noisy - clean)


def test_blocknorm():
    data = np.array([[1.0, 2.0], [2.0, 4.0], [4.0, 8.0]])
    out = blocknorm(data, mavg_axis=0, blockwidth=0)
    np.testing.assert_allclose(out, [[0.5, 1.0], [0.5, 1.0], [0.5, 1.0]])


def test_nnmean_fills_and_smooths():
    v = np.ones((4, 4))
    v[1, 1] = np.nan
    out = nnmean(v[None])[0]
    assert out[1, 1] == pytest.approx(1.0)


# -- image ops -------------------------------------------------------------

def test_gradn_and_curvature_on_ridge():
    rr, cc = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    img = np.exp(-((rr - 32) ** 2) / 18.0)  # horizontal ridge at row 32
    g = gradn(img, [0])
    assert abs(g[32]).max() < abs(g[28]).max()  # zero-gradient at crest
    c = curvature2d(img, cx=1.0, cy=1.0)
    assert c[32].mean() < 0  # negative curvature along the crest


def test_peakdetect2d():
    img = np.zeros((40, 40))
    rr, cc = np.meshgrid(np.arange(40), np.arange(40), indexing="ij")
    img += 5 * np.exp(-((rr - 10) ** 2 + (cc - 12) ** 2) / 4.0)
    img += 3 * np.exp(-((rr - 30) ** 2 + (cc - 28) ** 2) / 4.0)
    pk = peakdetect2d(img, radius=2, threshold=1.0, num_peaks=2)
    assert [tuple(p) for p in pk] == [(10, 12), (30, 28)]


def test_masks_and_algebra():
    disk = circmask((20, 20), 10, 10, 4)
    rect = rectmask((20, 20), 0, 10, 0, 20)
    assert disk[10, 10] and not disk[0, 0]
    both = disk & rect
    assert both.sum() <= min(disk.sum(), rect.sum())
    masked = apply_mask(np.ones((20, 20)), disk)
    assert np.isnan(masked[0, 0]) and masked[10, 10] == 1.0


def test_apply_mask_along():
    vol = np.ones((3, 4, 5))
    mask = np.zeros((4, 5))
    mask[1, 2] = 1
    out = apply_mask_along(vol, mask, axes=(1, 2))
    assert out.sum() == 3.0


def test_label_components():
    m = np.zeros((10, 10), dtype=bool)
    m[1:3, 1:3] = True
    m[6:9, 6:9] = True
    labels, n = label_components(m)
    assert n == 2
    assert labels[1, 1] != labels[7, 7]
    assert (labels[m] > 0).all() and (labels[~m] == 0).all()


def test_segment2d_finds_bands():
    rr, cc = np.meshgrid(np.arange(50), np.arange(50), indexing="ij")
    img = np.exp(-((rr - 15) ** 2) / 8.0) + np.exp(-((rr - 35) ** 2) / 8.0)
    labels = segment2d(img, nbands=2)
    assert labels.max() >= 2


def test_region_expand():
    m = np.zeros((9, 9), dtype=bool)
    m[4, 4] = True
    out = region_expand(m, iterations=2)
    assert out[2, 4] and out[4, 2] and not out[0, 0]
    assert out.sum() == 13  # L1 ball of radius 2


def test_bandpath_extraction():
    # volume whose value equals the row coordinate -> the path map
    # must reproduce the path's row values at every energy
    vol = np.tile(np.arange(32, dtype=float)[:, None, None], (1, 16, 8))
    vol = np.moveaxis(vol, 0, 0)  # (row, col, E) with E = last axis
    vol3 = np.tile(np.arange(16, dtype=float)[None, :, None], (32, 1, 8))
    path = points2path(np.array([[2.0, 3.0], [20.0, 3.0], [20.0, 12.0]]), 10)
    bm = bandpath_map(vol3, path[:, 0], path[:, 1], eaxis=2)
    assert bm.shape == (8, len(path))
    np.testing.assert_allclose(bm[0], path[:, 1], atol=1e-9)


def test_interp2d_bilinear_exact_on_plane():
    img = np.add.outer(np.arange(10, dtype=float), 2 * np.arange(12, dtype=float))
    rows = np.array([0.5, 3.25, 8.9])
    cols = np.array([1.5, 7.75, 0.0])
    np.testing.assert_allclose(
        interp2d_bilinear(img, rows, cols), rows + 2 * cols, atol=1e-9
    )
    assert np.isnan(interp2d_bilinear(img, np.array([-1.0]), np.array([0.0]))[0])


def test_line_generator():
    pts = line_generator([0, 0], [10, 5], 11)
    np.testing.assert_allclose(pts[0], [0, 0])
    np.testing.assert_allclose(pts[-1], [10, 5])
    np.testing.assert_allclose(np.diff(pts[:, 0]), 1.0)


def test_bootstrapfit_per_group_distributed(spark):
    """Two groups of synthetic line scans with drifting gaussian
    centers: the distributed bootstrapped fit must track each group's
    drift independently."""
    import pandas as pd

    from mpes_spark.analysis.grouped import bootstrapfit_per_group

    x = np.linspace(-5, 5, 101)
    rows = []
    truth = {}
    for g, (c0, dc) in {"a": (-1.0, 0.25), "b": (1.5, -0.3)}.items():
        for line in range(6):
            c = c0 + dc * line
            truth[(g, line)] = c
            for xi, yi in zip(x, _gauss(x, c, 0.8) * 2.0):
                rows.append((g, line, float(xi), float(yi)))
    pdf = pd.DataFrame(rows, columns=["grp", "line", "bin", "cnt"])
    hist = spark.createDataFrame(pdf)
    out = bootstrapfit_per_group(
        hist, "grp", "line", "bin", p0=[1.5, 0.0, 1.0]
    ).collect()
    assert len(out) == 12
    for r in out:
        assert r.xc == pytest.approx(truth[(r.grp, r.line)], abs=0.05)


# -- distributed adapters --------------------------------------------------

def test_shirley_per_group_distributed(spark):
    from mpes_spark.analysis.grouped import peaks_per_group, shirley_per_group
    from mpes_spark.binning.engine import histogram_per_group
    from mpes_spark.binning.spec import BinAxis
    from mpes_spark.registry import t
    from tests.conftest import SF_SMALL

    hist = histogram_per_group(
        t(spark, SF_SMALL, "events"), BinAxis("value", 60, 0.0, 480.0), "event_type"
    )
    out = shirley_per_group(hist, "event_type", "value_bin").toPandas()
    assert set(out.columns) == {"event_type", "value_bin", "cnt", "background", "signal"}
    assert (out.groupby("event_type").size() > 0).all()
    np.testing.assert_allclose(out.cnt - out.background, out.signal)

    pks = peaks_per_group(hist, "event_type", "value_bin", num_peaks=2).toPandas()
    assert (pks["rank"] <= 2).all()
    assert set(pks.event_type) <= set(out.event_type)


def test_shirley_window_matches_numpy(spark):
    """The window-algebra Shirley (pure JVM plan, r8 oracle twin) must
    reproduce the numpy reference recurrence run for the same fixed
    iteration count on every group trace."""
    from mpes_spark.analysis.background import shirley
    from mpes_spark.analysis.grouped import shirley_window
    from mpes_spark.binning.engine import histogram_per_group
    from mpes_spark.binning.spec import BinAxis
    from mpes_spark.registry import t
    from tests.conftest import SF_SMALL

    hist = histogram_per_group(
        t(spark, SF_SMALL, "events"), BinAxis("value", 60, 0.0, 480.0), "event_type"
    )
    out = shirley_window(hist, "event_type", "value_bin", niter=6).toPandas()
    for grp, sub in out.groupby("event_type"):
        sub = sub.sort_values("value_bin")
        x = sub.value_bin.to_numpy(dtype="float64")
        y = sub.cnt.to_numpy(dtype="float64")
        # numpy shirley with tol=0 never early-exits on tolerance; cap
        # maxiter at the same fixed count the window form unrolls.
        # The window form grid-quantizes its recurrence state to 1e-6
        # per iteration (cross-engine sync, r9), so parity vs the
        # unquantized numpy recurrence holds only up to the snapping
        # amplified by the (yl - yr) trace scale through six linear
        # iterations (measured ~7e-4 at sf0.001) — atol reflects
        # that; cross-engine the quantized recurrence is bit-exact.
        want = shirley(x, y, tol=0.0, maxiter=6, edge_pts=3)
        np.testing.assert_allclose(sub.background.to_numpy(), want, atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(sub.signal.to_numpy(), y - want, atol=2e-3, rtol=1e-4)


def test_peaks_window_rule_bruteforce(spark):
    """peaks_window's strict-left / >=-right lookahead rule checked
    against a brute-force evaluation of the same rule on each trace."""
    from mpes_spark.analysis.grouped import peaks_window
    from mpes_spark.binning.engine import histogram_per_group
    from mpes_spark.binning.spec import BinAxis
    from mpes_spark.registry import t
    from tests.conftest import SF_SMALL

    L, K = 3, 3
    hist = histogram_per_group(
        t(spark, SF_SMALL, "events"), BinAxis("value", 60, 0.0, 480.0), "event_type"
    )
    got = peaks_window(hist, "event_type", "value_bin", lookahead=L, num_peaks=K)
    got = got.toPandas().sort_values(["event_type", "rank"], ignore_index=True)
    traces = hist.toPandas().sort_values(["event_type", "value_bin"])
    for grp, sub in traces.groupby("event_type"):
        y = sub.cnt.to_numpy()
        b = sub.value_bin.to_numpy()
        peaks = [
            (int(b[i]), int(y[i]))
            for i in range(len(y))
            if (y[i] > y[max(0, i - L):i].max(initial=-1))
            and (y[i] >= y[i + 1 : i + 1 + L].max(initial=-1))
        ]
        peaks.sort(key=lambda p: (-p[1], p[0]))
        want = peaks[:K]
        sel = got[got.event_type == grp]
        assert list(zip(sel.peak_bin, sel.peak_height)) == want, grp
