"""WAMASSI surface + OI SWH analysis (yowassi.F90:20-60 registry;
analysis in the Lionello-Günther-Janssen OI spirit)."""

import numpy as np
import pytest

from ecwam_tpu.model import assimilation as da


def test_registry_abort_semantics():
    old = da._HANDLER
    try:
        da.register_wamassi(None)
        with pytest.raises(RuntimeError, match="WAMASSI"):
            da.wamassi()
    finally:
        da.register_wamassi(old)


def test_oi_pulls_toward_obs_locally():
    # sea points on a 1-deg line; one observation in the middle
    n = 181
    lat = np.zeros(n)
    lon = np.arange(n, dtype=float)
    hs_fg = np.full(n, 2.0)
    hs_an = da.oi_swh_analysis(hs_fg, lat, lon,
                               obs_lat=np.array([0.0]),
                               obs_lon=np.array([90.0]),
                               obs_hs=np.array([3.0]))
    i0 = 90
    # strong local pull (bg_err²/(bg_err²+obs_err²) ≈ 0.74 of innovation)
    assert hs_an[i0] > 2.6
    # far field untouched
    assert abs(hs_an[0] - 2.0) < 1e-6
    assert abs(hs_an[-1] - 2.0) < 1e-6
    # monotone decay away from the observation
    assert hs_an[i0] > hs_an[i0 + 5] > hs_an[i0 + 15] >= 2.0 - 1e-12


def test_oi_exact_at_zero_obs_error():
    lat = np.zeros(5)
    lon = np.arange(5.0) * 20.0
    hs_fg = np.full(5, 1.0)
    hs_an = da.oi_swh_analysis(
        hs_fg, lat, lon, obs_lat=np.array([0.0]),
        obs_lon=np.array([40.0]), obs_hs=np.array([2.0]),
        obs_err=1e-6)
    assert abs(hs_an[2] - 2.0) < 1e-3


def test_spectra_update_scales_energy():
    rng = np.random.default_rng(0)
    fl1 = rng.random((12, 25, 10))
    hs_fg = np.full(10, 2.0)
    hs_an = np.full(10, 3.0)
    out = da.update_spectra_from_swh(fl1, hs_fg, hs_an)
    np.testing.assert_allclose(out, fl1 * 2.25, rtol=1e-12)


def test_default_wamassi_end_to_end():
    import jax.numpy as jnp
    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.model import driver as driver_mod
    from ecwam_tpu.io import products as products_mod
    from ecwam_tpu.io import forcing as forcing_mod

    ms = setup_mod.build_model(grid_name="12.0", nang=12, nfre=25,
                               idelpro=900.0, idelt=900.0,
                               dtype=jnp.float64)
    ff = forcing_mod.synthetic_forcing_file([20220101000000])
    lat = np.asarray(ms.grid.lats)[ms.blk.kxlt]
    lon = ms.grid.amowep + ms.blk.ixlg * \
        np.asarray(ms.grid.zdello)[ms.blk.kxlt]
    import datetime as dt
    model = driver_mod.WaveModel(ms, ff.provider(lat, lon),
                                 dt.datetime(2022, 1, 1))
    hs0 = np.asarray(products_mod.swh(model.fl1, ms.tb))[: ms.n_real]
    j = int(np.argmax(hs0))
    obs = dict(lat=np.array([lat[j]]), lon=np.array([lon[j]]),
               swh=np.array([hs0[j] * 1.5]))
    hs_an = da.wamassi(model, obs)
    hs1 = np.asarray(products_mod.swh(model.fl1, ms.tb))[: ms.n_real]
    assert hs_an[j] > hs0[j] * 1.2
    np.testing.assert_allclose(hs1, hs_an, rtol=2e-2)
