"""Small array/dict helpers mirroring the reference's utility surface
— notably the four functions covered by the reference's only unit-test
file (``/root/reference/tests/test_utils.py``: dictmerge, intify,
to_odd, replist), plus the axis/format helpers the workflows use
(``/root/reference/mpes/utils.py``).
"""

from __future__ import annotations

import numpy as np


def find_nearest(val: float, narray: np.ndarray) -> int:
    """Index of the element nearest to ``val``
    (``/root/reference/mpes/utils.py:15-30``)."""
    return int(np.argmin(np.abs(np.asarray(narray) - val)))


def dictmerge(D: dict, others) -> dict:
    """Merge a dict with a dict or a list/tuple of dicts; later
    entries win (``/root/reference/mpes/utils.py:246-268``)."""
    if isinstance(others, (list, tuple)):
        for oth in others:
            D = {**D, **oth}
    elif isinstance(others, dict):
        D = {**D, **others}
    return D


def to_odd(num: float) -> int:
    """Nearest odd integer at or above int(num)
    (``/root/reference/mpes/utils.py:69-86``): even truncations round
    up by one, odd truncations stay."""
    rnum = int(num)
    return rnum + (1 - rnum % 2)


def intify(*nums) -> list:
    """Convert each element to int where possible; leave None (and
    other unconvertibles) untouched
    (``/root/reference/mpes/utils.py:89-108``)."""
    out = list(nums)
    for i, num in enumerate(nums):
        try:
            out[i] = int(num)
        except TypeError:
            pass
    return out


def replist(entry, row: int, column: int) -> list[list]:
    """row x column nested list of identical entries, rows independent
    (``/root/reference/mpes/utils.py:132-149``)."""
    return [[entry] * column for _ in range(row)]


def riffle(*arr) -> np.ndarray:
    """Interleave equal-length arrays elementwise
    (``/root/reference/mpes/utils.py:271-293``)."""
    return np.vstack(arr).reshape((-1,), order="F")


def revaxis(arr: np.ndarray, axis: int = -1) -> np.ndarray:
    """Reverse an ndarray along one axis
    (``/root/reference/mpes/utils.py:111-129``)."""
    arr = np.asarray(arr).swapaxes(axis, 0)
    return arr[::-1, ...].swapaxes(0, axis)


def num_format_conversion(seq, form=int, length: int | None = None) -> list:
    """Convert a sequence elementwise to ``form`` when its length
    matches ``length`` (default: its own length); pass through
    otherwise (``/root/reference/mpes/utils.py:33-66`` — without the
    reference's string-eval of the type name)."""
    lseq = len(seq)
    want = lseq if length is None else length
    if lseq == want:
        return list(map(form, seq))
    return seq


def calcax(lo: float, hi: float, nbins: int, ret: str = "midpoint") -> np.ndarray:
    """Axis values for a regular grid: bin edges or midpoints
    (``u.calcax``, ``/root/reference/mpes/utils.py:336-353``)."""
    edges = np.linspace(lo, hi, nbins + 1, endpoint=True)
    if ret == "edge":
        return edges
    return (edges[1:] + edges[:-1]) / 2.0
