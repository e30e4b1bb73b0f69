"""Golden test: CTU advection weights vs the ctuw.F90 oracle (f64).

Runs on a real-bathymetry grid (synthetic topo → obstructions) so the
obstruction multiplication (ctuw.F90:700-730) is exercised, for
irefra=0 and irefra=3 (depth + current refraction with θ̇/σ̇ terms).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from types import SimpleNamespace

from ecwam_tpu.core import bathy as bathy_mod
from ecwam_tpu.core import grid as grid_mod
from ecwam_tpu.core import constants as c
from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.model import setup as setup_mod
from ecwam_tpu.ops import propagation as prop

from oracle import ctuw as octuw

NANG, NFRE = 12, 8
RTOL = 1e-12


def _setup(irefra):
    topo = bathy_mod.synthetic_topo(invres=2, features=[
        dict(kind="land", lon=(40.0, 44.0), lat=(0.0, 12.0), elev=300.0),
        dict(kind="shoal", lon=(80.0, 92.0), lat=(-12.0, 0.0),
             elev=-15.0)])
    wg = grid_mod.regular_grid(12.0, name="t12")
    tb = build_spectral_tables(nang=NANG, nfre=NFRE)
    b, obs = bathy_mod.make_bathymetry(topo, wg, tb.fr, nfre_red=NFRE)
    blk = grid_mod.build_sea_point_block(wg, b)
    obstr = bathy_mod.obstructions_to_block(obs, blk)
    rng = np.random.default_rng(2)
    cur = (0.4 * rng.standard_normal(blk.nsea),
           0.4 * rng.standard_normal(blk.nsea)) if irefra else None
    ms = setup_mod.build_model(
        grid=wg, bathy=b, nang=NANG, nfre=NFRE, idelpro=900.0,
        idelt=900.0, pad_to=8, dtype=jnp.float64, obstructions=obstr,
        irefra=irefra, currents=cur)
    return ms, tb


@pytest.mark.parametrize("irefra", [0, 3])
def test_ctuw_weights_oracle(irefra):
    ms, tb = _setup(irefra)
    st = ms.stencil
    nfr = tb.nfre_red
    cg_ext = np.asarray(ms.env["cgroup_ext"], np.float64)[:nfr]
    omos_ext = np.asarray(ms.env["omosnh2kd_ext"], np.float64)[:nfr]
    u_ext = np.asarray(ms.env["ucur_ext"], np.float64)
    v_ext = np.asarray(ms.env["vcur_ext"], np.float64)

    refr = {}
    curmask = None
    if irefra:
        thdd, thdc, sdot = prop.propdot(
            st, tb, jnp.asarray(ms.env["wavnum_ext"])[:nfr],
            jnp.asarray(cg_ext), jnp.asarray(omos_ext),
            jnp.asarray(ms.env["depth_ext"]), jnp.asarray(u_ext),
            jnp.asarray(v_ext), irefra)
        refr = dict(thdd=thdd, thdc=thdc, sdot=sdot,
                    omosnh2kd_ext=jnp.asarray(omos_ext),
                    u_ext=jnp.asarray(u_ext), v_ext=jnp.asarray(v_ext))

    got = prop.ctuw_weights(900.0, st, tb, jnp.asarray(cg_ext),
                            irefra=irefra, **refr)

    ost = SimpleNamespace(
        klat=st.klat, klon=st.klon, kcor=st.kcor, wlat=st.wlat,
        wcor=st.wcor, dp=st.dp, zdello_pt=st.zdello_pt,
        xdella=st.xdella, tanph_pt=st.tanph_pt,
        obslat=st.obslat, obslon=st.obslon, obscor=st.obscor)
    want = octuw.ctuw(
        900.0, tb, ost, cg_ext, omos_ext,
        np.asarray(st.cosphm1_pt, np.float64), u_ext, v_ext,
        irefra=irefra,
        thdd=None if not irefra else np.asarray(refr["thdd"]),
        thdc=None if not irefra else np.asarray(refr["thdc"]),
        sdot=None if not irefra else np.asarray(refr["sdot"]),
        circ=c.CIRC, r_earth=c.R_EARTH)

    def tr(a, extra):
        """oracle (npts, nang, nf, ...) → (nang, nf, npts, ...)"""
        return np.moveaxis(a, 0, 2)

    for key, sl in (("sumwn", None), ("wlatn", None), ("wlonn", None),
                    ("wcorn", None)):
        g = np.asarray(got[key])
        w = tr(want[key], None)
        scale = max(np.abs(w).max(), 1e-300)
        np.testing.assert_allclose(g, w, rtol=RTOL, atol=RTOL * scale,
                                   err_msg=key)

    # wkpmn: oracle slots [0]=from k−1, [2]=from k+1; jax [...,0], [...,1]
    wk = tr(want["wkpmn"], None)
    g = np.asarray(got["wkpmn"])
    scale = max(np.abs(wk).max(), 1e-300)
    np.testing.assert_allclose(g[..., 0], wk[..., 0], rtol=RTOL,
                               atol=RTOL * scale, err_msg="wkpmn m1")
    np.testing.assert_allclose(g[..., 1], wk[..., 2], rtol=RTOL,
                               atol=RTOL * scale, err_msg="wkpmn p1")

    if irefra:
        wm = tr(want["wmpmn"], None)
        g = np.asarray(got["wmpmn"])
        scale = max(np.abs(wm).max(), 1e-300)
        np.testing.assert_allclose(g[..., 0], wm[..., 0], rtol=RTOL,
                                   atol=RTOL * scale, err_msg="wmpmn m1")
        np.testing.assert_allclose(g[..., 1], wm[..., 2], rtol=RTOL,
                                   atol=RTOL * scale, err_msg="wmpmn p1")
