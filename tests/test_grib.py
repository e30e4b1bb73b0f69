"""Native GRIB1 codec: encode → decode round trips."""

import numpy as np
import pytest

from ecwam_tpu.io import grib


def test_regular_latlon_roundtrip(tmp_path):
    ny, nx = 19, 36
    lats = np.linspace(90, -90, ny)
    lons = np.linspace(0, 350, nx)
    la, lo = np.meshgrid(lats, lons, indexing="ij")
    field = 8.0 * np.sin(np.deg2rad(3 * la)) + np.cos(np.deg2rad(lo))
    meta = dict(param=165, table2_version=128, data_date=20230101,
                data_time=600, grid_type=0, ni=nx, nj=ny,
                lat1=90000, lon1=0, lat2=-90000, lon2=350000,
                di=10000, dj=10000, bits_per_value=16)
    fn = str(tmp_path / "t.grib")
    grib.write_messages(fn, [(field, meta)])
    msgs = grib.read_messages(fn)
    assert len(msgs) == 1
    m = msgs[0]
    assert m.meta["param"] == 165
    assert m.meta["ni"] == nx and m.meta["nj"] == ny
    assert m.date14 == "20230101060000"
    got = m.grid_values()
    # 16-bit packing: relative error ~ range/65535
    assert np.allclose(got, field, atol=(field.max() - field.min()) / 6e4)
    np.testing.assert_allclose(m.lats, lats)
    np.testing.assert_allclose(m.lons, lons)


def test_bitmap_missing_values(tmp_path):
    ny, nx = 10, 20
    field = np.random.default_rng(0).random((ny, nx)) * 5.0
    field[::3, ::4] = grib.MISSING
    meta = dict(param=229, grid_type=0, ni=nx, nj=ny,
                lat1=85000, lon1=0, lat2=-85000, lon2=342000,
                di=18000, dj=18000, bits_per_value=24,
                data_date=20221231, data_time=1200)
    fn = str(tmp_path / "bm.grib")
    grib.write_messages(fn, [(field, meta)])
    m = grib.read_messages(fn)[0]
    got = m.grid_values()
    miss = field == grib.MISSING
    assert (got[miss] == grib.MISSING).all()
    assert np.allclose(got[~miss], field[~miss], atol=1e-5)


def test_reduced_grid_roundtrip(tmp_path):
    """Reduced lat-lon grid with PL row lengths (wave-product layout)."""
    pl = np.array([4, 8, 12, 12, 8, 4])
    n = int(pl.sum())
    vals = np.linspace(0.0, 6.5, n)
    meta = dict(param=229, grid_type=0, ni=-1, nj=len(pl),
                lat1=75000, lon1=0, lat2=-75000, lon2=359000,
                dj=30000, bits_per_value=16,
                data_date=20230101, data_time=0)
    fn = str(tmp_path / "red.grib")
    grib.write_messages(fn, [(vals, meta, pl)])
    m = grib.read_messages(fn)[0]
    assert m.meta["ni"] == -1
    assert m.meta["n_pl"] == len(pl)
    np.testing.assert_array_equal(m.pl, pl)
    assert m.values.size == n
    assert np.allclose(m.values, vals, atol=6.5 / 6e4)


def test_multi_message_file(tmp_path):
    nx, ny = 12, 6
    meta = dict(param=165, grid_type=0, ni=nx, nj=ny,
                lat1=75000, lon1=0, lat2=-75000, lon2=330000,
                di=30000, dj=30000, data_date=20230101)
    msgs = []
    for t in range(4):
        f = np.full((ny, nx), float(t + 1))
        msgs.append((f, {**meta, "data_time": t * 600}))
    fn = str(tmp_path / "multi.grib")
    grib.write_messages(fn, msgs)
    back = grib.read_messages(fn)
    assert len(back) == 4
    for t, m in enumerate(back):
        assert m.meta["data_time"] == t * 600
        assert np.allclose(m.values, t + 1)


def test_constant_field(tmp_path):
    """Zero range → nbits still encodes, decode returns the constant."""
    f = np.full((5, 8), 3.14159)
    meta = dict(param=229, grid_type=0, ni=8, nj=5,
                lat1=60000, lon1=0, lat2=-60000, lon2=315000,
                di=45000, dj=30000, data_date=20230101)
    fn = str(tmp_path / "c.grib")
    grib.write_messages(fn, [(f, meta)])
    m = grib.read_messages(fn)[0]
    assert np.allclose(m.values, 3.14159, atol=1e-6)


def test_negative_and_scaled_values(tmp_path):
    """Negative lats/values and decimal scaling survive the round trip."""
    f = np.linspace(-3.0, 2.0, 48).reshape(6, 8)
    meta = dict(param=140, grid_type=0, ni=8, nj=6,
                lat1=-10000, lon1=-5000, lat2=-60000, lon2=310000,
                di=45000, dj=10000, decimal_scale=2,
                bits_per_value=20, data_date=19991231, data_time=2300)
    fn = str(tmp_path / "neg.grib")
    grib.write_messages(fn, [(f, meta)])
    m = grib.read_messages(fn)[0]
    assert m.meta["lat1"] == -10000 and m.meta["lon1"] == -5000
    assert m.meta["data_date"] == 19991231
    assert np.allclose(m.values.reshape(6, 8), f, atol=1e-4)
