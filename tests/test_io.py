import numpy as np
import pytest

from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.io import norms, products, restart


def test_ieee_hex_format():
    import struct
    assert norms.ieee_hex(1.0) == "0x3FF0000000000000"
    assert norms.ieee_hex(-2.0) == "0xC000000000000000"
    # O48 reference norm (tests/etopo1_oper_an_fc_O48.yml:57-62): the YAML
    # 16-digit decimal is within 1 ulp of the hashed double
    ref = struct.unpack(">d", bytes.fromhex("3FF565D5FD0CA556"))[0]
    assert abs(ref - 1.337362278436861) < 1e-15


def test_statistics_log_roundtrip(tmp_path):
    log = norms.StatisticsLog()
    vals = np.array([1.0, 2.0, 3.0])
    log.add("swh", "20230101000000", vals)
    p = tmp_path / "statistics.log"
    log.write(str(p))
    lines = [l for l in p.read_text().splitlines() if not l.startswith("#")]
    parts = lines[0].split()
    assert parts[0] == "20230101000000"
    assert parts[2] == "swh"
    assert float(parts[3]) == 2.0          # average
    assert parts[4] == norms.ieee_hex(2.0)
    assert float(parts[5]) == 1.0 and float(parts[7]) == 3.0
    assert int(parts[9]) == 3


def test_validation_comparator():
    entries = [norms.norm_entry("swh", "20230101000000",
                                np.array([1.0, 2.0]))]
    ok = norms.validate(entries, [dict(
        name="swh", time="20230101 000000", average=1.5,
        relative_tolerance=1e-12)])
    assert ok == []
    bad = norms.validate(entries, [dict(
        name="swh", time="20230101 000000", average=1.6,
        relative_tolerance=1e-12)])
    assert len(bad) == 1


def test_restart_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    fl1 = rng.random((12, 25, 40)).astype(np.float32)
    stress = {k: rng.random(40).astype(np.float32)
              for k in restart.STRESS_KEYS}
    fn = restart.save_restart(str(tmp_path), "20230101000000", fl1, stress)
    data = restart.load_restart(fn)
    assert data["date"] == "20230101000000"
    np.testing.assert_array_equal(data["fl1"], fl1)
    np.testing.assert_array_equal(data["stress"]["ufric"], stress["ufric"])


def test_restart_resolution_change(tmp_path):
    fl1 = np.ones((12, 25, 10), np.float32)
    stress = {k: np.zeros(10, np.float32) for k in restart.STRESS_KEYS}
    fn = restart.save_restart(str(tmp_path), "20230101000000", fl1, stress)
    data = restart.load_restart(fn, nang=24, nfre=30)
    assert data["fl1"].shape == (24, 30, 10)
    assert (data["fl1"][:12, :25] == 1.0).all()
    assert (data["fl1"][12:, :] < 1e-30).all()


def test_products_on_synthetic_spectrum():
    import jax.numpy as jnp
    tb = build_spectral_tables(nang=12, nfre=25)
    # unidirectional spectrum peaked at bin 10
    fl1 = np.zeros((12, 25, 4), np.float32)
    fl1[3, 10, :] = 1.0
    fl1j = jnp.asarray(fl1)
    s = np.asarray(products.swh(fl1j, tb))
    assert (s > 0).all()
    d = np.asarray(products.mwd(fl1j, tb))
    expected = (np.degrees(tb.th[3]) + 180.0) % 360.0
    np.testing.assert_allclose(d, expected, atol=0.1)
    p = np.asarray(products.pp1d(fl1j, tb))
    np.testing.assert_allclose(p, 1.0 / tb.fr[10], rtol=0.05)
    t1 = np.asarray(products.mwp1(fl1j, tb))
    assert (np.abs(t1 - 1.0 / tb.fr[10]) / t1 < 0.1).all()


def test_grib2wgrid_missing_data_rules():
    """grib2wgrid.F90:34-37: bilinear unless a corner is missing, then
    nearest grid point, then average of non-missing corners."""
    from ecwam_tpu.io import forcing as fo
    lats = np.array([0.0, 1.0, 2.0, 3.0])
    lons = np.array([0.0, 1.0, 2.0, 3.0])
    f = np.arange(16.0).reshape(4, 4)
    MISS = -9e9
    w = fo.bilinear_weights(lats, lons, np.array([0.25]), np.array([0.25]))
    # clean corners: plain bilinear
    v = fo.interp_field(f, w, missing=MISS)
    exp = fo.interp_field(f, w)
    np.testing.assert_allclose(v, exp)
    # nearest fallback: one far corner missing
    f2 = f.copy(); f2[1, 1] = MISS
    v2 = fo.interp_field(f2, w, missing=MISS)
    np.testing.assert_allclose(v2, f2[0, 0])   # nearest = (0,0) corner
    # average fallback: nearest corner missing too
    f3 = f.copy(); f3[0, 0] = MISS
    w3 = fo.bilinear_weights(lats, lons, np.array([0.1]), np.array([0.1]))
    v3 = fo.interp_field(f3, w3, missing=MISS)
    np.testing.assert_allclose(v3, (f3[0, 1] + f3[1, 0] + f3[1, 1]) / 3.0)
    # all four missing stays missing
    f4 = np.full_like(f, MISS)
    v4 = fo.interp_field(f4, w, missing=MISS)
    np.testing.assert_allclose(v4, MISS)


def test_grib2wgrid_irregular_and_rotated():
    from ecwam_tpu.io import forcing as fo
    # irregular longitudes: interpolation must still be exact for a
    # linear-in-lon field
    lats = np.array([0.0, 1.0, 2.0])
    lons = np.array([0.0, 0.5, 2.0, 5.0])
    f = np.broadcast_to(lons, (3, 4)).copy()
    w = fo.bilinear_weights(lats, lons, np.array([1.0, 1.0]),
                            np.array([1.25, 3.5]))
    np.testing.assert_allclose(fo.interp_field(f, w), [1.25, 3.5])

    # rotated grid: with the south pole at (-90, 0) the rotation is the
    # identity; a generic pole must round-trip a linear field sampled in
    # rotated coords
    rlat, rlon = fo.rotate_coords(np.array([10.0]), np.array([20.0]),
                                  -90.0, 0.0)
    np.testing.assert_allclose(rlat, [10.0], atol=1e-12)
    np.testing.assert_allclose(rlon, [20.0], atol=1e-12)

    sp = (-60.0, 15.0)
    plat = np.array([5.0, -12.0, 40.0])
    plon = np.array([10.0, 100.0, 250.0])
    rlat, rlon = fo.rotate_coords(plat, plon, *sp)
    lats_r = np.linspace(-89.0, 89.0, 179)
    lons_r = np.arange(0.0, 360.0, 1.0)
    fld = (np.broadcast_to(lats_r[:, None], (179, 360))
           + 0.0 * lons_r[None, :])
    w = fo.bilinear_weights(lats_r, lons_r, plat, plon, rotation=sp)
    got = fo.interp_field(fld, w)
    np.testing.assert_allclose(got, rlat, atol=1e-2)
