"""Utility-helper tests — mirrors the scope of the reference's only
unit-test file (tests/test_utils.py: dictmerge, intify, to_odd,
replist) plus the extra helpers the workflows lean on."""

from __future__ import annotations

import numpy as np

from mpes_spark.utils import (
    calcax,
    dictmerge,
    find_nearest,
    intify,
    num_format_conversion,
    replist,
    revaxis,
    riffle,
    to_odd,
)


def test_dictmerge():
    assert dictmerge({"a": 1}, {"b": 2}) == {"a": 1, "b": 2}
    assert dictmerge({"a": 1}, [{"a": 2}, {"c": 3}]) == {"a": 2, "c": 3}
    assert dictmerge({"a": 1}, ({"b": 2},)) == {"a": 1, "b": 2}
    d = {"a": 1}
    assert dictmerge(d, {}) == d


def test_intify():
    assert intify(1.7, None, "3") == [1, None, 3]
    assert intify() == []


def test_to_odd():
    assert to_odd(4) == 5
    assert to_odd(5) == 5
    assert to_odd(4.9) == 5
    assert to_odd(-4.2) == -3
    assert to_odd(-3.5) == -3
    assert all(to_odd(v) % 2 != 0 for v in (-7.3, -2, 0, 1.1, 8, 100.5))


def test_replist():
    out = replist(0, 2, 3)
    assert out == [[0, 0, 0], [0, 0, 0]]
    out[0][0] = 9  # rows must be independent lists
    assert out[1][0] == 0


def test_riffle_and_revaxis():
    np.testing.assert_array_equal(
        riffle(np.array([1, 3, 5]), np.array([2, 4, 6])), [1, 2, 3, 4, 5, 6]
    )
    a = np.arange(6).reshape(2, 3)
    np.testing.assert_array_equal(revaxis(a, axis=1), a[:, ::-1])
    np.testing.assert_array_equal(revaxis(a, axis=0), a[::-1])


def test_find_nearest_and_calcax():
    assert find_nearest(2.7, np.array([0.0, 1.0, 2.0, 3.0])) == 3
    edges = calcax(0.0, 10.0, 5, ret="edge")
    mids = calcax(0.0, 10.0, 5)
    np.testing.assert_allclose(edges, [0, 2, 4, 6, 8, 10])
    np.testing.assert_allclose(mids, [1, 3, 5, 7, 9])


def test_num_format_conversion():
    assert num_format_conversion([1.5, 2.5]) == [1, 2]
    assert num_format_conversion([1, 2], form=float) == [1.0, 2.0]
    assert num_format_conversion([1, 2], length=3) == [1, 2]  # passthrough


def test_rename_dims():
    from mpes_spark.grid.binned import BinnedArray

    ba = BinnedArray(
        np.zeros((2, 3)),
        ["X_bin", "t_bin"],
        {"X_bin": np.arange(2.0), "t_bin": np.arange(3.0)},
    )
    out = ba.rename_dims()
    assert out.dims == ["kx", "E"]
    assert set(out.coords) == {"kx", "E"}
    keep = ba.rename_dims({"nope": "x"})
    assert keep.dims == ["X_bin", "t_bin"]
