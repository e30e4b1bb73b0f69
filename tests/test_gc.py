"""Gravity-capillary subsystem: tables, stress closure, mean square slope.

Covers the LLGCBZ0 code paths (reference: initgc.F90, ns_gc.F90,
stress_gc.F90, taut_z0.F90:146-281, halphap.F90, meansqs*.F90).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.ops.physics import airsea, gc

DT = jnp.float32


@pytest.fixture(scope="module")
def gct():
    return gc.gc_tables()


@pytest.fixture(scope="module")
def params():
    return pp.set_phys_params(
        iphys=1, nang=24, llgcbz0=True, llnormagam=True, llcapchnk=True)


def test_gc_tables(gct):
    # NWAV = nint(log(20000/0.006)/log(1.2)) (initgc.F90:49)
    assert gct.nwav == 82
    # dispersion identity omega² = g k + T k³
    np.testing.assert_allclose(
        gct.omega**2, c.G * gct.xk + c.SURFT * gct.xk**3, rtol=1e-12)
    # group-velocity minimum of gravity-capillary waves sits near
    # k ≈ 0.36·sqrt(g/T) ≈ 134 rad/m
    kmin = gct.xk[np.argmin(gct.vg)]
    assert 100 < kmin < 200
    assert np.all(gct.delkcc > 0) and np.all(gct.delkcc_ns > 0)


def test_ns_gc_monotone(gct):
    ust = jnp.asarray(np.linspace(0.01, 2.0, 64), DT)
    ns, xks, oms = gc.omegagc(ust, gct)
    ns = np.asarray(ns)
    # cut-off wavenumber decreases with u* (ns_gc.F90:22: XKS ∝ 1/(1.48+2.05 u*))
    assert np.all(np.diff(ns) <= 0)
    assert ns.min() >= 0 and ns.max() <= gct.nwav - 2
    np.testing.assert_allclose(np.asarray(xks), gct.xk[ns], rtol=1e-6)


def test_stress_gc_positive_increasing(gct, params):
    n = 16
    ust = jnp.asarray(np.linspace(0.1, 1.5, n), DT)
    # Charnock-consistent roughness for each u*
    z0 = (0.011 * ust**2 / c.G + pp.RNUM / ust).astype(DT)
    halp = jnp.full(n, 0.006, DT)
    rnfac = jnp.ones(n, DT)
    tau = np.asarray(gc.stress_gc(
        jnp.full(n, 0.8, DT), ust, z0, 1e-6, halp, rnfac, gct, params))
    assert np.all(np.isfinite(tau)) and np.all(tau > 0)
    # a higher Phillips level carries more gravity-capillary stress
    tau2 = np.asarray(gc.stress_gc(
        jnp.full(n, 0.8, DT), ust, z0, 1e-6, 2.0 * halp, rnfac, gct, params))
    assert np.all(tau2 > tau)
    # in the balanced closure the gc stress is a fraction of the total:
    # at moderate-to-high u* with Charnock-consistent z0 this already holds
    assert np.all(tau[8:] < np.asarray(ust[8:])**2)


def test_taut_z0_gc_physical(gct, params):
    """Cd from the GC closure must lie in the observed 1e-3..3e-3 band and
    grow with wind speed for moderate winds."""
    n = 12
    u10 = jnp.asarray(np.linspace(4.0, 25.0, n), DT)
    zeros = jnp.zeros(n, DT)
    ustar0 = u10 * jnp.sqrt(jnp.minimum(c.ACD + c.BCD * u10, c.CDMAX))
    halp = jnp.full(n, 0.006, DT)
    rnfac = jnp.ones(n, DT)
    ust, z0, z0b, chrnck = jax.jit(
        lambda *a: airsea.taut_z0_gc(*a, params))(
            u10, zeros, 0.5 * ustar0**2, zeros, ustar0, halp, rnfac)
    cd = np.asarray(ust)**2 / np.asarray(u10)**2
    assert np.all(cd > 8e-4) and np.all(cd < 3.5e-3)
    assert np.all(np.asarray(z0) > 0) and np.all(np.asarray(chrnck) > 0)
    # drag rises with wind in this range
    assert cd[-1] > cd[0]


def test_taut_z0_gc_iusfg_consistency(gct, params):
    """iusfg=1 (warm start from the converged u*) must reproduce iusfg=0."""
    n = 8
    u10 = jnp.asarray(np.linspace(5.0, 20.0, n), DT)
    zeros = jnp.zeros(n, DT)
    ustar0 = u10 * jnp.sqrt(jnp.minimum(c.ACD + c.BCD * u10, c.CDMAX))
    halp = jnp.full(n, 0.006, DT)
    rnfac = jnp.ones(n, DT)
    tauw = 0.4 * ustar0**2
    ust1, *_ = airsea.taut_z0_gc(
        u10, zeros, tauw, zeros, ustar0, halp, rnfac, params, iusfg=0)
    ust2, *_ = airsea.taut_z0_gc(
        u10, zeros, tauw, zeros, ust1, halp, rnfac, params, iusfg=1)
    np.testing.assert_allclose(np.asarray(ust2), np.asarray(ust1), rtol=2e-2)


def _jonswap(tb, hs=2.0, fp=0.1):
    fr = tb.fr
    sigma = np.where(fr <= fp, 0.07, 0.09)
    r = np.exp(-((fr - fp) ** 2) / (2 * sigma**2 * fp**2))
    s = (0.0081 * c.G**2 / (2 * np.pi) ** 4 * fr**-5
         * np.exp(-1.25 * (fp / fr) ** 4) * 3.3**r)
    spread = np.maximum(np.cos(tb.th), 0.0) ** 2
    spread = spread / (np.sum(spread) * tb.delth)
    f2d = spread[:, None] * s[None, :]
    em = np.sum(f2d * tb.dfim[None, :])
    f2d *= (hs / 4.0) ** 2 / em
    return f2d


def test_halphap_and_meansqs(gct, params):
    tb = build_spectral_tables(nang=24, nfre=29)
    npts = 6
    f2d = _jonswap(tb)
    fl1 = jnp.asarray(np.broadcast_to(
        f2d[:, :, None], (24, 29, npts)), DT)
    from ecwam_tpu.core import dispersion
    depth = np.full(npts, dispersion.BATHYMAX)
    wavnum = jnp.asarray(dispersion.depth_properties(
        depth, tb.fr)["wavnum"].T, DT)
    coswdif = jnp.cos(jnp.asarray(tb.th, DT)[:, None])
    ust = jnp.full(npts, 0.4, DT)

    halp = np.asarray(gc.halphap(fl1, wavnum, coswdif, tb, params))
    assert np.all(halp > 0) and np.all(halp <= 0.5 * params.alphapmax + 1e-9)

    xk_model = float((2 * np.pi * tb.fr[-1])**2 / c.G)
    m_model = np.asarray(gc.meansqs(
        xk_model, fl1, wavnum, ust, coswdif, tb, params, gct))
    m_283 = np.asarray(gc.meansqs(
        283.0, fl1, wavnum, ust, coswdif, tb, params, gct))
    assert np.all(m_model > 0)
    # a larger cut-off wavenumber integrates strictly more slope variance
    assert np.all(m_283 > m_model)
    # total mss at moderate seas is O(0.01..0.1)
    assert np.all(m_283 < 0.2)


def test_implsch_llgcbz0_end_to_end(params):
    """Full physics step with the GC closure stays finite and grows wind sea."""
    from ecwam_tpu.core import dispersion
    from ecwam_tpu.ops.physics import implsch as impl
    nang, nfre, npts = 12, 25, 4
    tb = build_spectral_tables(nang=nang, nfre=nfre)
    par = pp.set_phys_params(
        iphys=1, nang=nang, llgcbz0=True, llnormagam=True, llcapchnk=True)
    cfg = impl.make_physics_config(tb, par, idelt=900.0)
    depth = np.full(npts, dispersion.BATHYMAX)
    props = dispersion.depth_properties(depth, tb.fr)
    env = {k: jnp.asarray(v.T, DT) for k, v in props.items()}
    env["depth"] = jnp.asarray(depth, DT)
    env["emaxdpt"] = jnp.asarray(dispersion.depth_limited_energy(depth), DT)
    fl1 = jnp.asarray(np.broadcast_to(
        _jonswap(tb, hs=1.0)[:, :, None], (nang, nfre, npts)), DT)
    frc = dict(wswave=jnp.full(npts, 15.0, DT), wdwave=jnp.zeros(npts, DT),
               aird=jnp.full(npts, 1.225, DT), wstar=jnp.zeros(npts, DT),
               cicover=jnp.zeros(npts, DT))
    u10 = frc["wswave"]
    cd = jnp.minimum(c.ACD + c.BCD * u10, c.CDMAX)
    stress = dict(
        ufric=u10 * jnp.sqrt(cd), tauw=jnp.zeros(npts, DT),
        tauwdir=jnp.zeros(npts, DT), z0m=jnp.full(npts, 1e-4, DT),
        z0b=jnp.zeros(npts, DT), chrnck=jnp.full(npts, 0.018, DT))
    step = jax.jit(lambda *a: impl.implsch(cfg, *a))
    f, st = step(fl1, env, frc, stress["ufric"], stress["tauw"],
                 stress["tauwdir"], stress["z0m"], stress["z0b"],
                 stress["chrnck"])
    assert np.isfinite(np.asarray(f)).all()
    em0 = np.sum(np.asarray(fl1[..., 0]) * tb.dfim[None, :])
    assert float(st["emean"][0]) > em0      # strong wind grows a small sea
    assert np.all(np.asarray(st["ufric"]) > 0.3)
