import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import dispersion
from ecwam_tpu.core import grid as gmod
from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.ops import propagation as prop

NANG, NFRE = 12, 5


@pytest.fixture(scope="module")
def aqua():
    wg = gmod.regular_grid(3.0, name="aqua3")        # reduced aqua planet
    bathy = gmod.aqua_bathymetry(wg)
    blk = gmod.build_sea_point_block(wg, bathy)
    tb = build_spectral_tables(nang=NANG, nfre=NFRE, nfre_red=NFRE)
    st = prop.build_stencil(wg, blk, NFRE)
    depth_ext = np.concatenate([blk.depth, [dispersion.BATHYMAX]])
    props = dispersion.depth_properties(depth_ext, tb.fr)
    cg_ext = jnp.asarray(props["cgroup"].T, jnp.float32)          # (nfre, npts+1)
    return wg, blk, tb, st, cg_ext


def test_stencil_indices_valid(aqua):
    wg, blk, tb, st, cg_ext = aqua
    n = st.npts
    for arr in (st.klat, st.klon, st.kcor):
        assert arr.min() >= 0 and arr.max() <= n
    # interior points (away from land rows) must have live neighbours
    mid = np.flatnonzero((blk.kxlt > 2) & (blk.kxlt < wg.ngy - 3))
    assert (st.klat[mid] != st.nland).all()
    assert (st.klon[mid] != st.nland).all()
    assert (st.wlat >= 0).all() and (st.wlat <= 1).all()
    assert (st.wcor >= 0).all() and (st.wcor <= 1).all()


def test_ctuw_weights_cfl_ok(aqua):
    wg, blk, tb, st, cg_ext = aqua
    w = prop.ctuw_weights(450.0, st, tb, cg_ext)
    assert not bool(jnp.any(w["cflfail"]))
    assert float(jnp.min(w["sumwn"])) >= 0.0
    assert float(jnp.max(w["sumwn"])) <= 1.0
    for key in ("wlonn", "wlatn", "wcorn", "wkpmn"):
        assert float(jnp.min(w[key])) >= 0.0, key


def test_propags2_moves_energy_downstream(aqua):
    wg, blk, tb, st, cg_ext = aqua
    w = prop.ctuw_weights(450.0, st, tb, cg_ext)
    # a point on the equator row
    krow = wg.ngy // 2
    p0 = int(blk.grid2blk[krow, 5])
    f1 = np.zeros((NANG, NFRE, st.npts + 1))
    # put energy in the most-eastward direction bin (th closest to 90°)
    k_east = int(np.argmin(np.abs(np.asarray(tb.th) - np.pi / 2)))
    f1[k_east, 2, p0] = 1.0
    f3 = prop.propags2(jnp.asarray(f1, jnp.float32), w, st, tb)
    f3 = np.asarray(f3)
    assert f3[k_east, 2, p0] < 1.0
    east = int(st.klon[p0, 1])
    west = int(st.klon[p0, 0])
    assert f3[k_east, 2, east] > 0.0, "energy must appear east"
    assert f3[k_east, 2, west] == 0.0, "no energy upstream"
    # nothing negative anywhere
    assert f3.min() >= 0.0


def test_propags2_mass_conservation_interior(aqua):
    """CTU conserves ΣF·Δλ·Δφ when transport stays within uniform rows."""
    wg, blk, tb, st, cg_ext = aqua
    w = prop.ctuw_weights(450.0, st, tb, cg_ext)
    rng = np.random.default_rng(0)
    f1 = np.zeros((NANG, NFRE, st.npts + 1))
    # fill a mid-latitude band (identical rows on the aqua reduced grid)
    band = np.flatnonzero(np.abs(blk.kxlt - wg.ngy // 2) < 8)
    f1[:, :, band] = rng.random((NANG, NFRE, band.size))
    f3 = np.asarray(prop.propags2(jnp.asarray(f1, jnp.float32), w, st, tb))
    area = st.zdello_pt * st.xdella
    m1 = float(np.sum(f1[:, :, : st.npts] * area))
    m3 = float(np.sum(f3 * area))
    assert abs(m3 - m1) / m1 < 6e-3, (m1, m3)


def test_great_circle_turning_offequator(aqua):
    wg, blk, tb, st, cg_ext = aqua
    w = prop.ctuw_weights(450.0, st, tb, cg_ext)
    # at high northern latitude the turning weights must be non-zero
    hi = np.flatnonzero(blk.kxlt == wg.ngy - 5)
    wk = np.asarray(w["wkpmn"])[:, :, hi, :]
    assert wk.max() > 0.0
    # and zero on the equator row for a symmetric grid (tanφ ≈ 0)
    eq_lat_idx = np.argmin(np.abs(wg.lats))
    eq = np.flatnonzero(blk.kxlt == eq_lat_idx)
    if abs(wg.lats[eq_lat_idx]) < 0.1:
        wk_eq = np.asarray(w["wkpmn"])[:, :, eq, :]
        assert wk_eq.max() < 1e-6


def test_multi_step_advection_stays_positive_and_bounded(aqua):
    wg, blk, tb, st, cg_ext = aqua
    w = prop.ctuw_weights(450.0, st, tb, cg_ext)
    f1 = np.zeros((NANG, NFRE, st.npts + 1))
    krow = wg.ngy // 2
    p0 = int(blk.grid2blk[krow, 5])
    f1[:, :, p0] = 1.0
    f = jnp.asarray(f1, jnp.float32)
    step = jax.jit(lambda f: prop.propags2(f, w, st, tb))
    land = st.nland
    for _ in range(20):
        out = step(f)
        f = jnp.concatenate([out, jnp.zeros_like(out[:, :, :1])], axis=2)
    fa = np.asarray(f)
    assert np.isfinite(fa).all()
    assert fa.min() >= 0.0
    assert fa.max() <= 1.0 + 1e-9   # monotone scheme: no new maxima
    assert fa[:, :, land].max() == 0.0
