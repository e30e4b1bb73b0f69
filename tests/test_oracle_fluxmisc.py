"""Golden tests: WNFLUXES / STOKESDRIFT / SETICE / HALPHAP vs oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.core import dispersion
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.ops.physics import fluxes as fluxes_mod
from ecwam_tpu.ops.physics import stokes as stokes_mod
from ecwam_tpu.ops.physics import gc as gc_mod
from ecwam_tpu.ops.physics import tail_ice

from oracle import reftables as ort
from oracle import fluxmisc as ofx

NANG, NFRE, NPTS = 12, 25, 12
RTOL = 1e-12


@pytest.fixture(scope="module")
def data():
    tb = build_spectral_tables(nang=NANG, nfre=NFRE)
    otb = ort.build(NANG, NFRE)
    rng = np.random.default_rng(9)
    fl1 = np.exp(rng.normal(-4.0, 2.0, (NANG, NFRE, NPTS)))
    depth = rng.uniform(20.0, 4000.0, NPTS)
    props = dispersion.depth_properties(depth, tb.fr)
    wswave = rng.uniform(2.0, 22.0, NPTS)
    wdwave = rng.uniform(0.0, 2 * np.pi, NPTS)
    ufric = rng.uniform(0.05, 1.2, NPTS)
    aird = rng.uniform(1.1, 1.3, NPTS)
    cicover = np.where(rng.uniform(size=NPTS) > 0.5,
                       rng.uniform(0.0, 1.0, NPTS), 0.0)
    coswdif = np.cos(np.asarray(tb.th)[:, None] - wdwave[None, :])
    return dict(tb=tb, otb=otb, rng=rng, fl1=fl1, props=props,
                wswave=wswave, wdwave=wdwave, ufric=ufric, aird=aird,
                cicover=cicover, coswdif=coswdif)


def check(got, want, name):
    got = np.asarray(got)
    scale = max(np.abs(want).max(), 1e-300)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=RTOL * scale,
                               err_msg=name)


def test_wnfluxes_oracle(data):
    tb, otb, rng = data["tb"], data["otb"], data["rng"]
    params = pp.set_phys_params(iphys=1, nang=NANG)
    ssource = rng.normal(0.0, 1e-5, (NANG, NFRE, NPTS))
    phiwa = rng.normal(0.0, 1e-2, NPTS)
    em = rng.uniform(0.01, 5.0, NPTS)
    f1 = rng.uniform(0.06, 0.3, NPTS)
    mij = rng.integers(10, NFRE, NPTS)
    from ecwam_tpu.ops.physics import stress as stress_mod
    _, rhow = stress_mod.frcutindex(
        jnp.asarray(f1), jnp.asarray(f1), jnp.asarray(data["ufric"]),
        jnp.zeros(NPTS), tb, params)
    rhow = np.asarray(rhow)

    got = fluxes_mod.wnfluxes(
        jnp.asarray(ssource), jnp.asarray(data["props"]["cinv"].T),
        jnp.asarray(rhow), jnp.asarray(data["cicover"]),
        jnp.asarray(phiwa), jnp.asarray(em), jnp.asarray(f1),
        jnp.asarray(data["wswave"]), jnp.asarray(data["wdwave"]),
        jnp.asarray(data["ufric"]), jnp.asarray(data["aird"]),
        tb, params)
    want = ofx.wnfluxes(
        mij, rhow.T.copy(), data["props"]["cinv"],
        ssource.transpose(2, 0, 1), data["cicover"], phiwa, em, f1,
        data["wswave"], data["wdwave"], data["ufric"], data["aird"],
        otb, params)
    for k in ("tauxd", "tauyd", "tauocxd", "tauocyd", "tauoc",
              "phiocd", "phieps", "phiaw", "em_oc", "f1_oc"):
        check(got[k], want[k], k)


def test_stokesdrift_oracle(data):
    tb, otb = data["tb"], data["otb"]
    stokfac = data["props"]["stokfac"]           # (npts, nfre)
    gu, gv = stokes_mod.stokesdrift(
        jnp.asarray(data["fl1"]), jnp.asarray(stokfac.T),
        jnp.asarray(data["wswave"]), jnp.asarray(data["wdwave"]),
        jnp.asarray(data["cicover"]), tb)
    wu, wv = ofx.stokesdrift(
        data["fl1"].transpose(2, 0, 1), stokfac, data["wswave"],
        data["wdwave"], data["cicover"], otb)
    check(gu, wu, "ustokes")
    check(gv, wv, "vstokes")


def test_setice_oracle(data):
    got = tail_ice.setice(
        jnp.asarray(data["fl1"]), jnp.asarray(data["cicover"]),
        jnp.asarray(data["coswdif"]))
    want = ofx.setice(data["fl1"].transpose(2, 0, 1), data["cicover"],
                      data["coswdif"].T.copy())
    check(np.asarray(got).transpose(2, 0, 1), want, "setice")


def test_halphap_oracle(data):
    tb, otb = data["tb"], data["otb"]
    params = pp.set_phys_params(iphys=1, nang=NANG, llgcbz0=True)
    got = gc_mod.halphap(
        jnp.asarray(data["fl1"]), jnp.asarray(data["props"]["wavnum"].T),
        jnp.asarray(data["coswdif"]), tb, params)
    want = ofx.halphap(
        data["fl1"].transpose(2, 0, 1), data["props"]["wavnum"],
        data["coswdif"].T.copy(), otb, alphapmax=params.alphapmax)
    check(got, want, "halp")


def test_gc_subsystem_oracle():
    """INITGC tables / NS_GC / OMEGAGC / STRESS_GC vs the transcription
    (initgc.F90, ns_gc.F90, stress_gc.F90)."""
    import jax.numpy as jnp
    from ecwam_tpu.ops.physics import gc as gc_mod
    from oracle import gco

    t = gco.initgc()
    gct = gc_mod.gc_tables()
    assert gct.nwav == t["nwav"]
    for mine, want in (
            (gct.xk, t["xk"]), (gct.omega, t["omega"]),
            (gct.c2osqrtvg, t["c2osqrtvg"]),
            (gct.delkcc_ns, t["delkcc_ns"]),
            (gct.delkcc, t["delkcc"])):
        np.testing.assert_allclose(np.asarray(mine), want, rtol=1e-13)

    rng = np.random.default_rng(23)
    n = 16
    ust = rng.uniform(0.03, 1.8, n)
    ns, xks, oms = gc_mod.omegagc(jnp.asarray(ust), gct)
    ons, oxks, ooms = gco.omegagc(ust, t)
    np.testing.assert_array_equal(np.asarray(ns) + 1, ons)
    np.testing.assert_allclose(np.asarray(xks), oxks, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(oms), ooms, rtol=1e-13)

    params = pp.set_phys_params(iphys=1, nang=12, llgcbz0=True,
                                llnormagam=True)
    z0 = np.exp(rng.uniform(np.log(1e-5), np.log(3e-3), n))
    halp = rng.uniform(0.002, 0.015, n)
    rnf = rng.uniform(0.8, 1.2, n)
    ang = rng.uniform(0.3, 1.0, n)
    got = gc_mod.stress_gc(jnp.asarray(ang), jnp.asarray(ust),
                           jnp.asarray(z0), 1e-6, jnp.asarray(halp),
                           jnp.asarray(rnf), gct, params)
    want = np.array([gco.stress_gc(ang[i], ust[i], z0[i], 1e-6, halp[i],
                                   rnf[i], t, params) for i in range(n)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-11)
