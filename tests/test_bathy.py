"""Bathymetry preprocessor + obstruction tests.

Covers the create_wam_bathymetry_ETOPO1/mubuf replacement
(ecwam_tpu/core/bathy.py): cell-mean depth construction, per-direction
obstruction factors on synthetic topographies, the preproc hard-fail
(VERDICT r1 item 2), and the end-to-end strait-blocking behavior.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ecwam_tpu.core import bathy as bathy_mod
from ecwam_tpu.core import grid as grid_mod
from ecwam_tpu.core.spectral import build_spectral_tables


def test_open_ocean_no_obstruction():
    topo = bathy_mod.synthetic_topo(invres=4)
    wg = grid_mod.regular_grid(6.0, name="t6")
    tb = build_spectral_tables(nang=12, nfre=25)
    b, obs = bathy_mod.make_bathymetry(topo, wg, tb.fr, nfre_red=5)
    # deep ocean everywhere away from the polar caps (within valid row
    # widths — the reduced grid shortens high-latitude rows)
    cols = np.arange(wg.ngx)[None, :]
    valid = cols < wg.nlonrgg[:, None]
    mid = valid.copy()
    mid[:2] = mid[-2:] = False
    assert (b[mid] > 900.0).all()
    # polar rows are land
    assert (b[0][valid[0]] < -990).all() and (b[-1][valid[-1]] < -990).all()
    # interior open ocean is unobstructed; cells whose transport strips
    # touch the polar coastline legitimately pick up partial blocking,
    # so exclude the two rows adjacent to the caps
    interior = valid.copy()
    interior[:3] = interior[-3:] = False
    for key in ("kobslat", "kobslon", "kobscor"):
        v = obs[key][:, interior]
        np.testing.assert_allclose(v, 1.0, err_msg=key)


def test_island_blocks_crossing_direction():
    """A sub-grid island inside one cell reduces the N-S and E-W factors
    of that cell but leaves far-away cells open."""
    # island covering ~60% of one 6° cell centred at (lon=33, lat=3)
    topo = bathy_mod.synthetic_topo(invres=4, features=[
        dict(kind="land", lon=(31.0, 35.0), lat=(1.0, 5.0), elev=200.0)])
    wg = grid_mod.regular_grid(6.0, name="t6")
    tb = build_spectral_tables(nang=12, nfre=25)
    b, obs = bathy_mod.make_bathymetry(topo, wg, tb.fr, nfre_red=3)

    # island (lon 31-35, lat 1-5) straddles the corner between cells
    # (row 15 @ 0°, row 16 @ 6°) × (i=5 @ 30°, i=6 @ 36°): each adjacent
    # cell is obstructed only on the side facing the island, all stay sea
    k = 15
    assert wg.lats[k] == 0.0
    for kk, ii in ((15, 5), (15, 6), (16, 5), (16, 6)):
        assert b[kk, ii] > -990.0
    # row 15 cells: island to the north → kobslat IS=2 (from north) < 1
    assert obs["kobslat"][0, 15, 5, 1] < 0.9
    assert obs["kobslat"][0, 15, 6, 1] < 0.9
    assert obs["kobslat"][0, 15, 5, 0] == 1.0      # open from the south
    # cell i=5: island to its east → kobslon IS=2 (from east) < 1
    assert obs["kobslon"][0, 15, 5, 1] < 0.9
    assert obs["kobslon"][0, 15, 6, 0] < 0.9       # i=6 blocked from west
    # the NE corner of cell (15,5) is blocked hardest
    assert obs["kobscor"][0, 15, 5, 0] < 0.5
    # a far-away open-ocean cell is untouched
    j = 25
    np.testing.assert_allclose(obs["kobslat"][:, k, j, :], 1.0)


def test_shallow_sill_blocks_short_waves_less():
    """A submerged sill blocks via the kd threshold; deep cells' low
    frequencies (long waves, small k) feel the bottom more than high
    frequencies, matching the XKDMAX=1.5 rule."""
    topo = bathy_mod.synthetic_topo(invres=4, features=[
        dict(kind="shoal", lon=(20.0, 24.0), lat=(0.0, 6.0), elev=-8.0)])
    wg = grid_mod.regular_grid(6.0, name="t6")
    tb = build_spectral_tables(nang=12, nfre=25)
    b, obs = bathy_mod.make_bathymetry(topo, wg, tb.fr, nfre_red=10)
    k = int(np.argmin(np.abs(wg.lats - 3.0)))
    i = int(np.round((22.0 - wg.amowep) / wg.zdello[k]))
    # cell mean is dominated by the shallow fraction rule → shallow sea
    assert -990.0 < b[k, i]
    ob_lo = obs["kobslon"][0, k, i, :].min()    # lowest frequency
    ob_hi = obs["kobslon"][-1, k, i, :].min()   # higher frequency
    assert ob_lo <= ob_hi + 1e-12


def test_preproc_hard_fails_without_topo(tmp_path):
    from ecwam_tpu.cli.main import (_resolve_bathymetry,
                                    BathymetryUnavailable)
    from ecwam_tpu.config.schema import RunConfig
    cfg = RunConfig.from_yaml("""
grid: "12.0"
directions: 12
frequencies: 25
bathymetry: ETOPO1
begin: 2023-01-01 00:00:00
end: 2023-01-01 06:00:00
timestep: { advection: 900, physics: 900 }
""")
    with pytest.raises(BathymetryUnavailable):
        _resolve_bathymetry(cfg, str(tmp_path))


def test_preproc_consumes_raw_topo(tmp_path):
    from ecwam_tpu.cli.main import _resolve_bathymetry
    from ecwam_tpu.config.schema import RunConfig
    topo = bathy_mod.synthetic_topo(invres=2)
    bathy_mod.save_topo(str(tmp_path / "wam_topo.npz"), topo)
    cfg = RunConfig.from_yaml("""
grid: "12.0"
directions: 12
frequencies: 25
bathymetry: ETOPO1
begin: 2023-01-01 00:00:00
end: 2023-01-01 06:00:00
timestep: { advection: 900, physics: 900 }
""")
    b, obs = _resolve_bathymetry(cfg, str(tmp_path))
    assert b is not None and obs is not None
    assert (b[1:-1] > 0).any()


def test_strait_blocks_propagation():
    """End-to-end: a meridional land wall with a one-cell strait must cut
    the energy passing through compared to open water (VERDICT r1 #2).

    Uses the propagation stencil directly with obstruction tables from
    the preprocessor on a synthetic topo.
    """
    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.model import stepper as stepper_mod

    # thin (sub-grid: 2° of a 6° cell) meridional wall at lon≈60° from
    # lat -33..33 with a gap at |lat|<3 (one 6° row).  The wall is too
    # narrow to turn any cell into land, but every sub-grid E-W transport
    # line through the wall cells crosses land → near-total blocking.
    topo = bathy_mod.synthetic_topo(invres=4, features=[
        dict(kind="land", lon=(59.0, 61.0), lat=(-33.0, -3.0), elev=300.0),
        dict(kind="land", lon=(59.0, 61.0), lat=(3.0, 33.0), elev=300.0),
    ])
    wg = grid_mod.regular_grid(6.0, name="t6")
    tb = build_spectral_tables(nang=12, nfre=3)
    b, obs = bathy_mod.make_bathymetry(topo, wg, tb.fr, nfre_red=3)
    blk = grid_mod.build_sea_point_block(wg, b)
    obstr = bathy_mod.obstructions_to_block(obs, blk)

    # initial energy: a zonal band west of the wall, eastward-travelling
    lats = wg.lats[blk.kxlt]
    lons = wg.amowep + blk.ixlg * wg.zdello[blk.kxlt]
    init = ((lons > 30.0) & (lons < 54.0) &
            (np.abs(lats) < 24.0)).astype(np.float64)

    out = {}
    for name, ob in (("open", None), ("obs", obstr)):
        ms = setup_mod.build_model(
            grid=wg, bathy=b, nang=12, nfre=3, nfre_red=3,
            idelpro=3600.0, idelt=3600.0, obstructions=ob,
            dtype=jnp.float64, pad_to=64)
        fl = np.zeros((12, 3, ms.n_pad))
        fl[2:4, :, :len(init)] = init[None, None, :]
        _, step_adv, _ = stepper_mod.make_step(ms)
        f = jnp.asarray(fl)
        for _ in range(30):
            f = step_adv(f)
        out[name] = np.asarray(f)[:, :, :blk.nsea]

    east_of_wall = lons > 66.0
    e_open = out["open"][:, :, east_of_wall].sum()
    e_obs = out["obs"][:, :, east_of_wall].sum()
    assert e_open > 1e-3                      # waves did cross in open water
    # the wall blocks most—but not all—transport (the strait leaks)
    assert e_obs < 0.25 * e_open, (e_obs, e_open)
    assert e_obs > 0.0
