"""Image registration / distortion-correction workflow (driver-side).

The engine analog of the reference's ``MomentumCorrector``
(/root/reference/mpes/analysis.py:2102-2852) without opencv/scipy:
- ``vertex_generator`` — symmetric polygon landmark targets (:1965-2038);
- ``find_homography`` — normalized DLT least-squares homography
  estimate (public algorithm; replaces ``cv2.findHomography``,
  :2041-2069);
- ``homography_from_params`` — parametric translation/rotation/
  scaling/shear composition (``coordinateTransform``, :2594-2659);
- ``warp_image`` / ``apply_warping`` — inverse-mapped bilinear image
  warp (:2072-2099);
- ``deform_field_from_homography`` + ``compose_deform_fields`` —
  coordinate-mapping fields for the ``generateDfield`` /
  ``dfieldapply`` pipeline (/root/reference/mpes/base.py:541-576);
- ``MomentumCorrector`` — the workflow object: landmark extraction
  (2-D peaks), symmetry scoring, linear (homography) and spline (TPS)
  warp estimates, and compilation into Spark Column expressions.

Everything here runs on the binned image (driver-small); only the
*compiled expressions* (homography column math, TPS column math, or a
broadcast dfield lookup) touch the event table.
"""

from __future__ import annotations

import numpy as np

from mpes_spark.analysis.image import interp2d_bilinear, peakdetect2d


# ---------------------------------------------------------------------------
# landmarks & targets
# ---------------------------------------------------------------------------

def vertex_generator(
    center: tuple[float, float],
    fixedvertex: tuple[float, float],
    arot: float | None = None,
    rotsym: int = 6,
    scale: float = 1.0,
) -> np.ndarray:
    """Vertices of a symmetric polygon: rotate ``fixedvertex`` about
    ``center`` by multiples of the symmetry angle (default
    ``360/rotsym``). Returns (rotsym, 2) of (row, col)."""
    angle = 360.0 / rotsym if arot is None else arot
    c = np.asarray(center, dtype=float)
    v = np.asarray(fixedvertex, dtype=float) - c
    out = []
    for k in range(rotsym):
        th = np.deg2rad(angle * k)
        rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        out.append(c + scale * rot @ v)
    return np.asarray(out)


def symmetry_score(landmarks: np.ndarray, center: tuple[float, float]) -> dict:
    """Geometric symmetry metrics of a landmark ring: spread of
    center distances and of consecutive arc angles (the reference's
    ``ascale``/rotational-symmetry diagnostics, analysis.py:2342-2362)."""
    lm = np.asarray(landmarks, dtype=float)
    c = np.asarray(center, dtype=float)
    rel = lm - c
    dists = np.linalg.norm(rel, axis=1)
    angles = np.sort(np.arctan2(rel[:, 0], rel[:, 1]))
    darc = np.diff(np.concatenate([angles, [angles[0] + 2 * np.pi]]))
    return {
        "radial_spread": float(dists.std() / dists.mean()) if dists.mean() else 0.0,
        "angular_spread": float(darc.std() / darc.mean()) if darc.mean() else 0.0,
    }


# ---------------------------------------------------------------------------
# homography estimation (normalized DLT)
# ---------------------------------------------------------------------------

def find_homography(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares 3x3 homography mapping src -> dst ((n>=4, 2)
    point sets) via the normalized direct linear transform: stack the
    2n DLT equations, solve with SVD, denormalize, fix scale M22=1."""
    src = np.asarray(src, dtype=float)
    dst = np.asarray(dst, dtype=float)
    if src.shape != dst.shape or len(src) < 4:
        raise ValueError("need matching point sets with >= 4 points")

    def _norm(pts):
        c = pts.mean(axis=0)
        d = np.linalg.norm(pts - c, axis=1).mean()
        s = np.sqrt(2) / d if d else 1.0
        T = np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1]])
        ph = np.column_stack([pts, np.ones(len(pts))]) @ T.T
        return ph[:, :2], T

    sn, Ts = _norm(src)
    dn, Td = _norm(dst)
    rows = []
    for (x, y), (u, v) in zip(sn, dn):
        rows.append([-x, -y, -1, 0, 0, 0, u * x, u * y, u])
        rows.append([0, 0, 0, -x, -y, -1, v * x, v * y, v])
    _, _, vt = np.linalg.svd(np.asarray(rows))
    Hn = vt[-1].reshape(3, 3)
    H = np.linalg.inv(Td) @ Hn @ Ts
    return H / H[2, 2]


def homography_from_params(
    translation: tuple[float, float] = (0.0, 0.0),
    angle: float = 0.0,
    scale: tuple[float, float] | float = 1.0,
    shear: float = 0.0,
    center: tuple[float, float] = (0.0, 0.0),
) -> np.ndarray:
    """Compose a parametric transform about ``center`` —
    translation/rotation/scaling/shearing, the ``coordinateTransform``
    menu (/root/reference/mpes/analysis.py:2594-2659). ``angle`` and
    ``shear`` in degrees; coordinates are (x, y) = (col-like, row-like)
    consistent with ``perspective_expr``."""
    sx, sy = (scale, scale) if np.isscalar(scale) else scale
    th = np.deg2rad(angle)
    sh = np.tan(np.deg2rad(shear))
    cx, cy = center
    to0 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], dtype=float)
    lin = np.array(
        [
            [sx * np.cos(th), sx * (sh * np.cos(th) - np.sin(th)), 0],
            [sy * np.sin(th), sy * (sh * np.sin(th) + np.cos(th)), 0],
            [0, 0, 1],
        ]
    )
    back = np.array(
        [[1, 0, cx + translation[0]], [0, 1, cy + translation[1]], [0, 0, 1]],
        dtype=float,
    )
    return back @ lin @ to0


# ---------------------------------------------------------------------------
# image warping & deformation fields
# ---------------------------------------------------------------------------

def warp_image(img: np.ndarray, M: np.ndarray, out_shape: tuple[int, int] | None = None) -> np.ndarray:
    """Warp an image by homography ``M`` (maps source (row, col) ->
    target): inverse-map each output pixel through ``M^-1`` and sample
    bilinearly; unmapped pixels -> NaN."""
    img = np.asarray(img, dtype=float)
    h, w = out_shape or img.shape
    Minv = np.linalg.inv(np.asarray(M, dtype=float))
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ones = np.ones_like(rr, dtype=float)
    src = np.einsum("ij,jhw->ihw", Minv, np.stack([rr.astype(float), cc.astype(float), ones]))
    sr = src[0] / src[2]
    sc = src[1] / src[2]
    return interp2d_bilinear(img, sr.ravel(), sc.ravel()).reshape(h, w)


def apply_warping(stack: np.ndarray, M: np.ndarray, axis: int = 0) -> np.ndarray:
    """Warp every slice of a volume along ``axis`` (``applyWarping``)."""
    stack = np.moveaxis(np.asarray(stack, dtype=float), axis, 0)
    out = np.stack([warp_image(sl, M) for sl in stack])
    return np.moveaxis(out, 0, axis)


def deform_field_from_homography(M: np.ndarray, shape: tuple[int, int]) -> tuple[np.ndarray, np.ndarray]:
    """Forward (row, col) deformation fields of a homography on a
    grid: where each source pixel lands."""
    h, w = shape
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ones = np.ones_like(rr, dtype=float)
    dstp = np.einsum("ij,jhw->ihw", np.asarray(M, dtype=float), np.stack([rr.astype(float), cc.astype(float), ones]))
    return dstp[0] / dstp[2], dstp[1] / dstp[2]


def compose_deform_fields(
    rd1: np.ndarray, cd1: np.ndarray, rd2: np.ndarray, cd2: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Compose two deformations (apply 1 then 2): sample field 2 at
    field 1's landing points (the reference's ``keep=True`` field
    update, analysis.py:2540-2592)."""
    rr = interp2d_bilinear(rd2, rd1.ravel(), cd1.ravel()).reshape(rd1.shape)
    cc = interp2d_bilinear(cd2, rd1.ravel(), cd1.ravel()).reshape(cd1.shape)
    return rr, cc


# ---------------------------------------------------------------------------
# workflow object
# ---------------------------------------------------------------------------

class MomentumCorrector:
    """Distortion-correction session on one energy slice of the binned
    volume. Produces either a homography (linear estimate), TPS
    coefficients (spline estimate), or deformation fields — each
    compilable to the distributed §2.2 transforms."""

    def __init__(self, image: np.ndarray, rotsym: int = 6):
        self.image = np.asarray(image, dtype=float)
        self.rotsym = rotsym
        self.landmarks: np.ndarray | None = None
        self.center: np.ndarray | None = None
        self.targets: np.ndarray | None = None
        self.M: np.ndarray | None = None
        self.tps: tuple[np.ndarray, np.ndarray] | None = None

    def feature_extract(self, radius: int = 4, threshold: float | None = None) -> "MomentumCorrector":
        """Landmark extraction: the ``rotsym`` strongest 2-D peaks +
        the most central peak as center."""
        pk = peakdetect2d(self.image, radius=radius, threshold=threshold,
                          num_peaks=self.rotsym + 1)
        if len(pk) < self.rotsym + 1:
            raise ValueError(f"found only {len(pk)} peaks, need {self.rotsym + 1}")
        img_c = np.asarray(self.image.shape, dtype=float) / 2
        d = np.linalg.norm(pk - img_c, axis=1)
        ci = int(np.argmin(d))
        self.center = pk[ci].astype(float)
        self.landmarks = np.delete(pk, ci, axis=0)[: self.rotsym].astype(float)
        return self

    def symmetry(self) -> dict:
        return symmetry_score(self.landmarks, self.center)

    def make_targets(self, scale: float = 1.0) -> "MomentumCorrector":
        """Ideal symmetric ring: equal radius (mean of landmark radii),
        equal arcs, anchored at the first landmark's angle."""
        rel = self.landmarks - self.center
        radius = float(np.linalg.norm(rel, axis=1).mean()) * scale
        # order landmarks by angle so targets pair with neighbors
        order = np.argsort(np.arctan2(rel[:, 0], rel[:, 1]))
        self.landmarks = self.landmarks[order]
        rel = self.landmarks - self.center
        th0 = float(np.arctan2(rel[0, 0], rel[0, 1]))
        ths = th0 + 2 * np.pi * np.arange(self.rotsym) / self.rotsym
        self.targets = self.center + radius * np.column_stack([np.sin(ths), np.cos(ths)])
        return self

    def lin_warp_estimate(self) -> np.ndarray:
        """Homography landmarks -> targets (+center fixed)."""
        src = np.vstack([self.landmarks, self.center])
        dst = np.vstack([self.targets, self.center])
        self.M = find_homography(src, dst)
        return self.M

    def spline_warp_estimate(self) -> tuple[np.ndarray, np.ndarray]:
        """TPS landmarks(+center) -> targets(+center)."""
        from mpes_spark.calibrate.tps import tps_coeffs

        src = np.vstack([self.landmarks, self.center])
        dst = np.vstack([self.targets, self.center])
        self.tps = (tps_coeffs(src, dst), src)
        return self.tps

    def correct(self, image: np.ndarray | None = None) -> np.ndarray:
        """Apply the linear estimate to an image (driver-side check
        before committing the event-table transform)."""
        if self.M is None:
            raise RuntimeError("run lin_warp_estimate() first")
        return warp_image(self.image if image is None else image, self.M)

    # -- compile to distributed transforms --------------------------------

    def homography_exprs(self, x: str = "X", y: str = "Y"):
        from mpes_spark.transforms.corrections import perspective_expr

        if self.M is None:
            raise RuntimeError("run lin_warp_estimate() first")
        return perspective_expr(x, y, self.M)

    def tps_exprs(self, x: str = "X", y: str = "Y"):
        from mpes_spark.transforms.corrections import tps_expr

        if self.tps is None:
            raise RuntimeError("run spline_warp_estimate() first")
        co, src = self.tps
        return tps_expr(x, y, co, src, 0), tps_expr(x, y, co, src, 1)
