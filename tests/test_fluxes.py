"""Ocean-flux (WNFLUXES) and Stokes-drift (STOKESTRN) diagnostics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import dispersion
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.ops.physics import implsch as impl
from ecwam_tpu.ops.physics import stokes as stokes_mod

from test_physics import jonswap

NANG, NFRE, NPTS = 12, 25, 8
DT = jnp.float32


@pytest.fixture(scope="module")
def setup():
    tb = build_spectral_tables(nang=NANG, nfre=NFRE)
    params = pp.set_phys_params(iphys=1, nang=NANG)
    cfg = impl.make_physics_config(tb, params, idelt=900.0, lstrn=True)
    depth = np.full(NPTS, dispersion.BATHYMAX)
    props = dispersion.depth_properties(depth, tb.fr)
    env = {k: jnp.asarray(v.T, DT) for k, v in props.items()}
    env["depth"] = jnp.asarray(depth, DT)
    env["emaxdpt"] = jnp.asarray(dispersion.depth_limited_energy(depth), DT)
    f2d = jonswap(tb, hs=2.0, fp=0.1)
    fl1 = jnp.asarray(np.broadcast_to(f2d[:, :, None], (NANG, NFRE, NPTS)), DT)
    frc = dict(
        wswave=jnp.full(NPTS, 12.0, DT),
        wdwave=jnp.zeros(NPTS, DT),
        aird=jnp.full(NPTS, 1.225, DT),
        wstar=jnp.zeros(NPTS, DT),
        cicover=jnp.zeros(NPTS, DT),
        cithick=jnp.zeros(NPTS, DT),
    )
    u10 = np.asarray(frc["wswave"])
    cd = np.minimum(8.0e-4 + 8.0e-5 * u10, 0.0025)
    ustar = u10 * np.sqrt(cd)
    stress = dict(
        ufric=jnp.asarray(ustar, DT), tauw=jnp.zeros(NPTS, DT),
        tauwdir=jnp.zeros(NPTS, DT),
        z0m=jnp.asarray(np.maximum(0.018 / c.G * ustar**2, 1e-6), DT),
        z0b=jnp.zeros(NPTS, DT), chrnck=jnp.full(NPTS, 0.018, DT))
    step = jax.jit(lambda *a, **kw: impl.implsch(cfg, *a, **kw))
    _, state = step(fl1, env, frc, **stress)
    return tb, env, fl1, frc, state


def test_flux_diagnostics_present_and_bounded(setup):
    _, _, _, _, state = setup
    for k in ("tauxd", "tauyd", "tauocxd", "tauocyd", "tauoc",
              "phiocd", "phieps", "phiaw", "ustokes", "vstokes", "strnms"):
        assert k in state, k
        assert np.isfinite(np.asarray(state[k])).all(), k
    phieps = np.asarray(state["phieps"])
    assert (phieps >= c.PHIEPSMIN).all() and (phieps <= c.PHIEPSMAX).all()
    tauoc = np.asarray(state["tauoc"])
    assert (tauoc >= c.TAUOCMIN).all() and (tauoc <= c.TAUOCMAX).all()
    # growing windsea: waves absorb momentum, so ocean stress < total
    assert (tauoc < 1.0).all()
    # energy enters the waves from the wind
    assert (np.asarray(state["phiaw"]) > 0.0).all()
    # flux to ocean is defined negative (leaving the waves)
    assert (np.asarray(state["phiocd"]) < 0.0).all()


def test_total_stress_is_downwind(setup):
    _, _, _, frc, state = setup
    tauxd, tauyd = np.asarray(state["tauxd"]), np.asarray(state["tauyd"])
    # wdwave=0 (oceanographic: towards north) → stress along +y
    assert np.allclose(tauxd, 0.0, atol=1e-6)
    assert (tauyd > 0.0).all()


def test_stokes_drift_downwind_and_capped(setup):
    tb, env, fl1, frc, state = setup
    us, vs = np.asarray(state["ustokes"]), np.asarray(state["vstokes"])
    assert (np.abs(us) <= stokes_mod.STMAX).all()
    assert (vs > 0.0).all()          # along-wind component
    assert (np.abs(us) < 0.2 * vs).all()   # cross-wind small
    # typical magnitude: a few cm/s to tens of cm/s for Hs≈2 m
    assert (vs < 0.5).all()


def test_strain_zero_without_ice(setup):
    _, _, _, _, state = setup
    assert np.allclose(np.asarray(state["strnms"]), 0.0)


def test_aki_ice_reduces_to_open_water():
    tb = build_spectral_tables(nang=NANG, nfre=NFRE)
    depth = np.full(4, 100.0)
    props = dispersion.depth_properties(depth, tb.fr)
    wavnum = jnp.asarray(props["wavnum"].T, DT)
    cith0 = jnp.zeros(4, DT)
    out = stokes_mod.aki_ice(wavnum, jnp.asarray(depth, DT), cith0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(wavnum))
    # with ice: k is reduced (flexural stiffening) for short waves
    cith = jnp.full(4, 1.0, DT)
    out_ice = np.asarray(stokes_mod.aki_ice(
        wavnum, jnp.asarray(depth, DT), cith))
    assert np.isfinite(out_ice).all()
    assert (out_ice[-1] < np.asarray(wavnum)[-1]).all()
