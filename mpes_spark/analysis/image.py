"""Image-domain operators on binned arrays (driver-side numpy).

Covers SURVEY §2.6's segmentation/masking/band-path surface without
scipy/skimage/opencv: gradients and curvature maps, 2-D peak
detection, binary masks and mask algebra, connected-component
labeling, region expansion, polyline band-path extraction with
bilinear interpolation. Reference behaviors: ``gradn``/``curvature2d``
(/root/reference/mpes/analysis.py:1211-1262), ``peakdetect2d``
(:430-479), masks (:1411-1606), ``segment2d`` (:1265-1297),
``regionExpand`` (:1359-1408), path extraction (:1609-1800).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# gradients & curvature
# ---------------------------------------------------------------------------

def gradn(arr: np.ndarray, axes: list[int]) -> np.ndarray:
    """Repeated ``np.gradient`` along the given axis sequence."""
    out = np.asarray(arr, dtype=float)
    for ax in axes:
        out = np.gradient(out, axis=ax)
    return out


def curvature2d(image: np.ndarray, cx: float = 1.0, cy: float = 1.0) -> np.ndarray:
    """2-D curvature map (Zhang et al., RSI 82, 043712 (2011) — the
    public band-sharpening formula): C = [(1+cx*fx^2)*cy*fyy -
    2*cx*cy*fx*fy*fxy + (1+cy*fy^2)*cx*fxx] / (1+cx*fx^2+cy*fy^2)^1.5."""
    img = np.asarray(image, dtype=float)
    fx = np.gradient(img, axis=1)
    fy = np.gradient(img, axis=0)
    fxx = np.gradient(fx, axis=1)
    fyy = np.gradient(fy, axis=0)
    fxy = np.gradient(fx, axis=0)
    num = (
        (1 + cx * fx * fx) * cy * fyy
        - 2 * cx * cy * fx * fy * fxy
        + (1 + cy * fy * fy) * cx * fxx
    )
    den = (1 + cx * fx * fx + cy * fy * fy) ** 1.5
    return num / den


# ---------------------------------------------------------------------------
# 2-D peak detection
# ---------------------------------------------------------------------------

def peakdetect2d(
    img: np.ndarray, radius: int = 2, threshold: float | None = None, num_peaks: int | None = None
) -> np.ndarray:
    """Local-maximum 2-D peak detection: a pixel is a peak when it is
    >= every value in its (2r+1)^2 neighborhood and above
    ``threshold`` (default: mean + 2*std). Plateau ties (count images
    routinely have equal-max adjacent bins) are resolved by greedy
    non-max suppression: candidates within ``radius`` of an accepted
    stronger peak are dropped. Returns (k, 2) peak (row, col) sorted
    by descending intensity (top ``num_peaks``)."""
    img = np.asarray(img, dtype=float)
    if threshold is None:
        threshold = float(img.mean() + 2 * img.std())
    p = np.pad(img, radius, constant_values=-np.inf)
    neigh_max = np.full(img.shape, -np.inf)
    for di in range(-radius, radius + 1):
        for dj in range(-radius, radius + 1):
            if di == 0 and dj == 0:
                continue
            win = p[
                radius + di : radius + di + img.shape[0],
                radius + dj : radius + dj + img.shape[1],
            ]
            neigh_max = np.maximum(neigh_max, win)
    rows, cols = np.nonzero((img >= neigh_max) & (img >= threshold))
    order = np.argsort(img[rows, cols])[::-1]
    cand = np.column_stack([rows[order], cols[order]]).astype(float)
    kept: list[np.ndarray] = []
    for c in cand:
        if all(np.abs(c - k).max() > radius for k in kept):
            kept.append(c)
        if num_peaks is not None and len(kept) >= num_peaks:
            break
    return np.asarray(kept, dtype=int).reshape(-1, 2)


# ---------------------------------------------------------------------------
# masks & mask algebra
# ---------------------------------------------------------------------------

def circmask(img_shape: tuple[int, int], rcent: float, ccent: float, rad: float) -> np.ndarray:
    """Boolean disk mask (``circmask`` sign=1 analog)."""
    rr, cc = np.ogrid[: img_shape[0], : img_shape[1]]
    return (rr - rcent) ** 2 + (cc - ccent) ** 2 <= rad * rad


def rectmask(
    img_shape: tuple[int, int], r0: float, r1: float, c0: float, c1: float
) -> np.ndarray:
    rr, cc = np.ogrid[: img_shape[0], : img_shape[1]]
    return (rr >= r0) & (rr < r1) & (cc >= c0) & (cc < c1)


def apply_mask(img: np.ndarray, mask: np.ndarray, fill: float = np.nan) -> np.ndarray:
    """Apply a boolean mask (keep True); outside -> ``fill`` (the
    reference's 0/1/nan signed-mask convention)."""
    out = np.array(img, dtype=float, copy=True)
    out[~mask] = fill
    return out


def apply_mask_along(arr: np.ndarray, mask: np.ndarray, axes: tuple[int, ...]) -> np.ndarray:
    """Broadcast a low-D mask through an N-D array along ``axes``."""
    shape = [1] * arr.ndim
    for ax, s in zip(axes, mask.shape):
        shape[ax] = s
    return arr * mask.reshape(shape)


class BoundedArea:
    """Composable mask region with boolean algebra (``&``, ``|``,
    ``~``, ``-``) and linear / circular decision boundaries —
    reference behavior: ``BoundedArea``
    (/root/reference/mpes/analysis.py:1803-1958). Wraps a boolean
    array; factory methods add half-plane and disk constraints."""

    def __init__(self, shape: tuple[int, int], mask: np.ndarray | None = None):
        self.shape = tuple(shape)
        self.mask = (
            np.ones(self.shape, dtype=bool) if mask is None else np.asarray(mask, bool)
        )

    @classmethod
    def halfplane(
        cls, shape: tuple[int, int], a: float, b: float, c: float
    ) -> "BoundedArea":
        """Linear boundary: keep pixels with a*row + b*col + c >= 0."""
        rr, cc = np.ogrid[: shape[0], : shape[1]]
        return cls(shape, a * rr + b * cc + c >= 0)

    @classmethod
    def disk(
        cls, shape: tuple[int, int], rcent: float, ccent: float, rad: float
    ) -> "BoundedArea":
        return cls(shape, circmask(shape, rcent, ccent, rad))

    @classmethod
    def rect(cls, shape, r0, r1, c0, c1) -> "BoundedArea":
        return cls(shape, rectmask(shape, r0, r1, c0, c1))

    def _bin(self, other: "BoundedArea", op) -> "BoundedArea":
        if other.shape != self.shape:
            raise ValueError("shape mismatch")
        return BoundedArea(self.shape, op(self.mask, other.mask))

    def __and__(self, other):
        return self._bin(other, np.logical_and)

    def __or__(self, other):
        return self._bin(other, np.logical_or)

    def __sub__(self, other):
        return self._bin(other, lambda a, b: a & ~b)

    def __invert__(self):
        return BoundedArea(self.shape, ~self.mask)

    def apply(self, img: np.ndarray, fill: float = np.nan) -> np.ndarray:
        return apply_mask(img, self.mask, fill)

    def predicate_expr(self):
        """The same region as a Spark boolean Column over (row, col)
        event coordinates — masks are predicate columns at event
        scale (SURVEY §2.6 note), evaluated in-scan, no image."""
        raise NotImplementedError(
            "use the factory predicates directly: halfplane -> "
            "a*col('row') + b*col('col') + c >= 0; disk -> "
            "(col('row')-rc)**2 + (col('col')-cc)**2 <= r**2"
        )


def intensity_transform_rotsym(img: np.ndarray, rotsym: int, center: tuple[float, float]) -> np.ndarray:
    """Rotational-symmetry intensity averaging: mean of the image over
    its ``rotsym`` rotations about ``center`` (``intensityTransform``,
    /root/reference/mpes/analysis.py:2661-2682). NaN-aware mean so
    out-of-frame rotated pixels don't bite."""
    from mpes_spark.analysis.registration import homography_from_params, warp_image

    stack = []
    for k in range(rotsym):
        M = homography_from_params(angle=360.0 * k / rotsym, center=center)
        stack.append(warp_image(img, M))
    with np.errstate(invalid="ignore"):
        return np.nanmean(np.stack(stack), axis=0)


# ---------------------------------------------------------------------------
# connected components & region ops
# ---------------------------------------------------------------------------

def label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected component labeling (two-pass union-find). Returns
    (labels, nlabels) with labels starting at 1."""
    mask = np.asarray(mask, dtype=bool)
    labels = np.zeros(mask.shape, dtype=np.int64)
    parent: list[int] = [0]

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    nxt = 0
    for i in range(mask.shape[0]):
        for j in range(mask.shape[1]):
            if not mask[i, j]:
                continue
            up = labels[i - 1, j] if i > 0 else 0
            left = labels[i, j - 1] if j > 0 else 0
            if up and left:
                ru, rl = find(up), find(left)
                labels[i, j] = ru
                if ru != rl:
                    parent[max(ru, rl)] = min(ru, rl)
            elif up or left:
                labels[i, j] = up or left
            else:
                nxt += 1
                parent.append(nxt)
                labels[i, j] = nxt
    # second pass: canonicalize + compact label ids
    remap: dict[int, int] = {}
    for i in range(mask.shape[0]):
        for j in range(mask.shape[1]):
            if labels[i, j]:
                r = find(labels[i, j])
                if r not in remap:
                    remap[r] = len(remap) + 1
                labels[i, j] = remap[r]
    return labels, len(remap)


def segment2d(img: np.ndarray, nbands: int = 1, **kw) -> np.ndarray:
    """Threshold + connected components, lowering the threshold until
    at least ``nbands`` labels emerge (``segment2d`` loop semantics)."""
    img = np.asarray(img, dtype=float)
    for q in (75, 60, 50, 40, 30, 20, 10):
        mask = img > np.percentile(img, q)
        labels, n = label_components(mask)
        if n >= nbands:
            return labels
    return labels


def region_expand(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    """Binary dilation by shifted ORs (4-neighborhood per iteration)."""
    out = np.asarray(mask, dtype=bool).copy()
    for _ in range(iterations):
        p = np.pad(out, 1, constant_values=False)
        out = (
            out
            | p[:-2, 1:-1]
            | p[2:, 1:-1]
            | p[1:-1, :-2]
            | p[1:-1, 2:]
        )
    return out


# ---------------------------------------------------------------------------
# band-path extraction
# ---------------------------------------------------------------------------

def line_generator(A, B, npoints: int) -> np.ndarray:
    """Evenly spaced points on segment AB, endpoints included."""
    A = np.asarray(A, dtype=float)
    B = np.asarray(B, dtype=float)
    frac = np.linspace(0, 1, npoints)[:, None]
    return A[None, :] * (1 - frac) + B[None, :] * frac


def points2path(points: np.ndarray, npoints_per_seg: int = 50) -> np.ndarray:
    """Polyline through landmark points (analog path: equidistant
    samples per segment, duplicate joints removed)."""
    points = np.asarray(points, dtype=float)
    segs = []
    for a, b in zip(points[:-1], points[1:]):
        seg = line_generator(a, b, npoints_per_seg)
        segs.append(seg[:-1])
    segs.append(points[-1:])
    return np.vstack(segs)


def interp2d_bilinear(img: np.ndarray, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Bilinear sampling of a 2-D array at fractional (row, col)
    coordinates; out-of-bounds -> NaN."""
    img = np.asarray(img, dtype=float)
    rows = np.asarray(rows, dtype=float)
    cols = np.asarray(cols, dtype=float)
    h, w = img.shape
    r0 = np.floor(rows).astype(int)
    c0 = np.floor(cols).astype(int)
    ok = (rows >= 0) & (cols >= 0) & (rows <= h - 1) & (cols <= w - 1)
    r0c = np.clip(r0, 0, h - 2)
    c0c = np.clip(c0, 0, w - 2)
    fr = rows - r0c
    fc = cols - c0c
    val = (
        img[r0c, c0c] * (1 - fr) * (1 - fc)
        + img[r0c + 1, c0c] * fr * (1 - fc)
        + img[r0c, c0c + 1] * (1 - fr) * fc
        + img[r0c + 1, c0c + 1] * fr * fc
    )
    return np.where(ok, val, np.nan)


def bandpath_map(
    vol: np.ndarray, pathr: np.ndarray, pathc: np.ndarray, eaxis: int = 2
) -> np.ndarray:
    """E-vs-path intensity map from a 3-D volume: bilinear sample each
    energy slice along the (row, col) path. Returns (nE, npath)."""
    vol = np.moveaxis(np.asarray(vol, dtype=float), eaxis, 0)
    return np.stack([interp2d_bilinear(sl, pathr, pathc) for sl in vol])
