"""Igor binary wave (.ibw) reader/writer — round-trip over the TN003
v5 layout (both byte orders, every supported dtype family), header
guards, the BinnedArray bridge, and the distributed catalog scan."""

from __future__ import annotations

import numpy as np
import pytest

from mpes_spark.io.igor import (
    ibw_to_binned,
    load_ibw,
    read_waves_ibw,
    save_ibw,
)


@pytest.mark.parametrize(
    "dt,shape,order",
    [
        ("f4", (7,), "<"),
        ("f8", (5, 4), "<"),
        ("i2", (3, 4, 2), "<"),
        ("i4", (2, 2, 2, 2), "<"),
        ("u2", (11,), "<"),
        ("f8", (6, 3), ">"),
        ("f4", (4, 5), ">"),
    ],
)
def test_ibw_roundtrip(tmp_path, dt, shape, order):
    a = (np.arange(np.prod(shape)).reshape(shape) % 120).astype(dt)
    p = str(tmp_path / f"w_{dt}_{len(shape)}_{ord(order)}.ibw")
    nd = len(shape)
    save_ibw(
        p, a, name="mywave", sfA=[0.5] * nd, sfB=[1.0] * nd,
        data_units="eV", note="acq note", byte_order=order,
    )
    w = load_ibw(p)
    assert np.array_equal(w.data, a)
    assert w.data.dtype == a.dtype
    assert w.name == "mywave" and w.note == "acq note"
    assert w.data_units == "eV"
    assert w.sfA == [0.5] * nd and w.sfB == [1.0] * nd
    assert np.allclose(w.dim_coords(0), 0.5 * np.arange(shape[0]) + 1.0)


def test_ibw_fortran_order_is_preserved(tmp_path):
    """Igor stores column-major; a C-order mixup transposes images."""
    a = np.arange(12, dtype="f8").reshape(3, 4)
    p = str(tmp_path / "f.ibw")
    save_ibw(p, a)
    w = load_ibw(p)
    assert np.array_equal(w.data, a)
    # the on-disk byte stream must be F-order: first 3 values = col 0
    raw = np.frombuffer(open(p, "rb").read(), dtype="<f8", count=3, offset=384)
    assert np.array_equal(raw, a[:, 0])


def test_ibw_checksum_guard(tmp_path):
    p = str(tmp_path / "c.ibw")
    save_ibw(p, np.arange(5, dtype="f4"))
    raw = bytearray(open(p, "rb").read())
    raw[2] ^= 0xFF  # flip a checksum byte
    with pytest.raises(ValueError, match="checksum"):
        load_ibw(bytes(raw))
    w = load_ibw(bytes(raw), strict=False)  # reference's strict flag
    assert np.array_equal(w.data, np.arange(5, dtype="f4"))


def test_ibw_rejects_garbage_and_bad_version():
    with pytest.raises(ValueError):
        load_ibw(b"\x00")
    with pytest.raises(ValueError, match="version"):
        load_ibw(b"\x07\x00" + b"\x00" * 100)


def test_ibw_to_binned_bridge(tmp_path):
    a = np.arange(20, dtype="f8").reshape(4, 5)
    p = str(tmp_path / "b.ibw")
    save_ibw(p, a, name="edc_map", sfA=[0.1, 2.0], sfB=[-1.0, 5.0])
    b = ibw_to_binned(load_ibw(p), dims=["E", "k"])
    assert b.dims == ["E", "k"] and b.data.shape == (4, 5)
    assert np.allclose(b.coords["E"], 0.1 * np.arange(4) - 1.0)
    assert np.allclose(b.coords["k"], 2.0 * np.arange(5) + 5.0)
    assert b.attrs["name"] == "edc_map"


def test_read_waves_ibw_distributed(spark, tmp_path):
    paths = []
    for k in range(3):
        a = np.full((4, 3), float(k), dtype="f8") + np.arange(12).reshape(4, 3)
        p = str(tmp_path / f"scan_{k}.ibw")
        save_ibw(p, a, name=f"scan{k}", sfA=[0.5, 1.0], sfB=[0.0, 0.0])
        paths.append(p)
    got = read_waves_ibw(spark, paths).toPandas().sort_values("name")
    assert list(got["name"]) == ["scan0", "scan1", "scan2"]
    assert all(tuple(s) == (4, 3) for s in got["shape"])
    for _, row in got.iterrows():
        k = int(row["name"][-1])
        want = np.full((4, 3), float(k)) + np.arange(12).reshape(4, 3)
        assert np.array_equal(
            np.asarray(row["values"]).reshape(4, 3, order="F"), want
        )


def test_pxp_roundtrip_with_folders(tmp_path):
    """r10 packed-experiment container (VERDICT r9 #6): waves in
    nested folders round-trip byte-exactly through the PTN003 record
    walk, with folder-qualified names and axis scaling intact."""
    import numpy as np

    from mpes_spark.io.igor import IgorWave, load_pxp, save_pxp

    rng = np.random.default_rng(9)
    waves = {
        "top": rng.standard_normal(7).astype("f8"),
        "run1/spectrum": rng.standard_normal((5, 4)).astype("f4"),
        "run1/sub/counts": rng.integers(0, 1000, size=6).astype("i4"),
        "run2/spectrum": rng.standard_normal((3, 3)).astype("f4"),
    }
    p = str(tmp_path / "exp.pxp")
    save_pxp(p, waves)
    back = load_pxp(p)
    assert sorted(back) == sorted(waves)
    for q, w in back.items():
        assert np.array_equal(w.data, waves[q]), q
        assert w.name == q.rsplit("/", 1)[-1]

    # IgorWave values preserve scaling metadata through the container
    wv = IgorWave(
        data=np.arange(8, dtype="f4"),
        name="ignored",  # the qualified key names the wave
        version=5,
        wave_type=2,
        sfA=[0.25],
        sfB=[-1.0],
    )
    p2 = str(tmp_path / "scaled.pxp")
    save_pxp(p2, {"cal/axis": wv})
    got = load_pxp(p2)["cal/axis"]
    assert got.sfA[0] == 0.25 and got.sfB[0] == -1.0
    assert np.allclose(got.dim_coords(0), 0.25 * np.arange(8) - 1.0)


def test_pxp_catalog_scan(spark, tmp_path):
    """read_waves_pxp: one row per wave per file, folder-qualified
    names, unionable with the ibw scan."""
    import numpy as np

    from mpes_spark.io.igor import read_waves_ibw, read_waves_pxp, save_ibw, save_pxp

    rng = np.random.default_rng(4)
    p1 = str(tmp_path / "a.pxp")
    p2 = str(tmp_path / "b.pxp")
    save_pxp(p1, {"f1/w1": rng.standard_normal(5).astype("f8"),
                  "w0": rng.standard_normal(3).astype("f4")})
    save_pxp(p2, {"w2": rng.integers(0, 9, size=4).astype("i2")})
    df = read_waves_pxp(spark, [p1, p2])
    rows = {(r.file, r.name): r for r in df.collect()}
    assert set(n for _, n in rows) == {"f1/w1", "w0", "w2"}
    assert rows[(p1, "f1/w1")].shape == [5]

    # unions with the ibw catalog scan (same schema)
    p3 = str(tmp_path / "c.ibw")
    save_ibw(p3, rng.standard_normal(6).astype("f4"), name="solo")
    both = read_waves_pxp(spark, [p1]).unionByName(
        read_waves_ibw(spark, [p3])
    )
    assert both.count() == 3
