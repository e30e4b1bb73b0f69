"""Golden tests: wind input / dissipation / stress closure vs oracles (f64).

Covers SINPUT_ARD (with and without tauw-sheltering/gustiness/normagam),
SINPUT_JAN, SDISSIP_ARD, SDISSIP_JAN, WSIGSTAR, STRESSO+TAU_PHI_HF and
TAUT_Z0 (both LLGCBZ0 branches).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.core import dispersion
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.ops.physics import airsea as airsea_mod
from ecwam_tpu.ops.physics import means as means_mod
from ecwam_tpu.ops.physics import sinput as sinput_mod
from ecwam_tpu.ops.physics import sdissip as sdissip_mod
from ecwam_tpu.ops.physics import stress as stress_mod
from ecwam_tpu.ops.physics import tables as tables_mod

from oracle import reftables as ort
from oracle import srcterms as osrc

NANG, NFRE, NPTS = 12, 25, 8
RTOL = 1e-11


@pytest.fixture(scope="module")
def tb():
    return build_spectral_tables(nang=NANG, nfre=NFRE)


@pytest.fixture(scope="module")
def otb():
    return ort.build(NANG, NFRE)


def make_fields(tb, seed=3):
    rng = np.random.default_rng(seed)
    fl1 = np.exp(rng.normal(-4.0, 2.0, (NANG, NFRE, NPTS)))
    depth = np.concatenate([
        rng.uniform(5.0, 60.0, NPTS // 2),
        rng.uniform(100.0, 5000.0, NPTS - NPTS // 2)])
    props = dispersion.depth_properties(depth, tb.fr)
    wswave = rng.uniform(2.0, 25.0, NPTS)
    wdwave = rng.uniform(0.0, 2.0 * np.pi, NPTS)
    ufric = rng.uniform(0.05, 1.5, NPTS)
    z0m = np.exp(rng.uniform(np.log(1e-5), np.log(5e-3), NPTS))
    aird = rng.uniform(1.1, 1.3, NPTS)
    raorw = np.maximum(aird, 1.0) * ort.ROWATERM1
    wstar = rng.uniform(0.0, 1.5, NPTS)
    rnfac = rng.uniform(0.8, 1.2, NPTS)
    th = np.asarray(tb.th)
    coswdif = np.cos(th[:, None] - wdwave[None, :])      # (nang, npts)
    sinwdif2 = np.sin(th[:, None] - wdwave[None, :]) ** 2
    return dict(fl1=fl1, depth=depth, props=props, wswave=wswave,
                wdwave=wdwave, ufric=ufric, z0m=z0m, aird=aird,
                raorw=raorw, wstar=wstar, rnfac=rnfac, coswdif=coswdif,
                sinwdif2=sinwdif2, rng=rng)


def check(got, want, name, rtol=RTOL):
    got = np.asarray(got)
    want = np.asarray(want)
    scale = max(np.abs(want).max(), 1e-300)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol * scale,
                               err_msg=name)


@pytest.mark.parametrize("llgcbz0,llnormagam", [(False, False),
                                                (True, True)])
def test_wsigstar_oracle(tb, llgcbz0, llnormagam):
    f = make_fields(tb)
    params = pp.set_phys_params(iphys=1, nang=NANG, llgcbz0=llgcbz0,
                                llnormagam=llnormagam)
    got = airsea_mod.wsigstar(
        jnp.asarray(f["wswave"]), jnp.asarray(f["ufric"]),
        jnp.asarray(f["z0m"]), jnp.asarray(f["wstar"]), params)
    want = osrc.wsigstar(f["wswave"], f["ufric"], f["z0m"], f["wstar"],
                         params)
    check(got, want, "sig_n")


@pytest.mark.parametrize("ngst,llsneg,llnormagam", [
    (2, True, False), (1, False, False), (2, True, True)])
def test_sinput_ard_oracle(tb, otb, ngst, llsneg, llnormagam):
    f = make_fields(tb)
    params = pp.set_phys_params(iphys=1, nang=NANG, llnormagam=llnormagam)
    pr = f["props"]
    args = (jnp.asarray(f["fl1"]), jnp.asarray(pr["wavnum"].T),
            jnp.asarray(pr["cinv"].T), jnp.asarray(pr["xk2cg"].T),
            jnp.asarray(f["wdwave"]), jnp.asarray(f["wswave"]),
            jnp.asarray(f["ufric"]), jnp.asarray(f["z0m"]),
            jnp.asarray(f["coswdif"]), jnp.asarray(f["sinwdif2"]),
            jnp.asarray(f["raorw"]), jnp.asarray(f["wstar"]),
            jnp.asarray(f["rnfac"]), tb, params)
    got = sinput_mod.sinput_ard(*args, ngst=ngst, llsneg=llsneg)
    want = osrc.sinput_ard(
        ngst, llsneg, f["fl1"].transpose(2, 0, 1), pr["wavnum"],
        pr["cinv"], pr["xk2cg"], f["wdwave"], f["wswave"], f["ufric"],
        f["z0m"], f["coswdif"].T.copy(), f["sinwdif2"].T.copy(),
        f["raorw"], f["wstar"], f["rnfac"], otb, params,
        tables_mod.tabu_swellft())
    for g, w, name in zip(got, want, ("fld", "sl", "spos", "xllws")):
        check(np.asarray(g).transpose(2, 0, 1), w, name)


@pytest.mark.parametrize("ngst,llsneg,llnormagam", [
    (2, True, False), (2, True, True), (1, False, False)])
def test_sinput_jan_oracle(tb, otb, ngst, llsneg, llnormagam):
    f = make_fields(tb)
    params = pp.set_phys_params(iphys=0, nang=NANG, llnormagam=llnormagam)
    pr = f["props"]
    args = (jnp.asarray(f["fl1"]), jnp.asarray(pr["wavnum"].T),
            jnp.asarray(pr["cinv"].T), jnp.asarray(pr["xk2cg"].T),
            jnp.asarray(f["wdwave"]), jnp.asarray(f["wswave"]),
            jnp.asarray(f["ufric"]), jnp.asarray(f["z0m"]),
            jnp.asarray(f["coswdif"]), jnp.asarray(f["sinwdif2"]),
            jnp.asarray(f["raorw"]), jnp.asarray(f["wstar"]),
            jnp.asarray(f["rnfac"]), tb, params)
    got = sinput_mod.sinput_jan(*args, ngst=ngst, llsneg=llsneg)
    want = osrc.sinput_jan(
        ngst, llsneg, f["fl1"].transpose(2, 0, 1), pr["wavnum"],
        pr["cinv"], pr["xk2cg"], f["wdwave"], f["wswave"], f["ufric"],
        f["z0m"], f["coswdif"].T.copy(), f["sinwdif2"].T.copy(),
        f["raorw"], f["wstar"], f["rnfac"], otb, params)
    for g, w, name in zip(got, want, ("fld", "sl", "spos", "xllws")):
        check(np.asarray(g).transpose(2, 0, 1), w, name)


def test_sdissip_ard_oracle(tb, otb):
    f = make_fields(tb)
    params = pp.set_phys_params(iphys=1, nang=NANG)
    pr = f["props"]
    rng = f["rng"]
    fld = rng.normal(size=f["fl1"].shape)
    sl = rng.normal(size=f["fl1"].shape)
    nsdsnth, sat_idx, sat_w = pp.saturation_weights(NANG, tb.th, tb.delth)

    gfld, gsl = sdissip_mod.sdissip_ard(
        jnp.asarray(f["fl1"]), jnp.asarray(fld), jnp.asarray(sl),
        jnp.asarray(pr["wavnum"].T), jnp.asarray(pr["cgroup"].T),
        jnp.asarray(pr["xk2cg"].T), jnp.asarray(f["ufric"]),
        jnp.asarray(f["coswdif"]), jnp.asarray(f["raorw"]), tb, params,
        sat_idx, sat_w)
    ofld, osl = osrc.sdissip_ard(
        f["fl1"].transpose(2, 0, 1), fld.transpose(2, 0, 1),
        sl.transpose(2, 0, 1), pr["wavnum"], pr["cgroup"], pr["xk2cg"],
        f["ufric"], f["coswdif"].T.copy(), f["raorw"], otb, params)
    check(np.asarray(gfld).transpose(2, 0, 1), ofld, "fld")
    check(np.asarray(gsl).transpose(2, 0, 1), osl, "sl")


def test_sdissip_jan_oracle(tb, otb):
    f = make_fields(tb)
    params = pp.set_phys_params(iphys=0, nang=NANG)
    pr = f["props"]
    rng = f["rng"]
    fld = rng.normal(size=f["fl1"].shape)
    sl = rng.normal(size=f["fl1"].shape)
    emean, fm1, f1m, akm, xkm = means_mod.fkmean(
        jnp.asarray(f["fl1"]), jnp.asarray(pr["wavnum"].T), tb)

    gfld, gsl = sdissip_mod.sdissip_jan(
        jnp.asarray(f["fl1"]), jnp.asarray(fld), jnp.asarray(sl),
        jnp.asarray(pr["wavnum"].T), emean, f1m, xkm, tb, params)
    ofld, osl = osrc.sdissip_jan(
        f["fl1"].transpose(2, 0, 1), fld.transpose(2, 0, 1),
        sl.transpose(2, 0, 1), pr["wavnum"], np.asarray(emean),
        np.asarray(f1m), np.asarray(xkm), otb, params)
    check(np.asarray(gfld).transpose(2, 0, 1), ofld, "fld")
    check(np.asarray(gsl).transpose(2, 0, 1), osl, "sl")


@pytest.mark.parametrize("iphys,llnormagam", [(1, False), (1, True),
                                              (0, False)])
def test_stresso_oracle(tb, otb, iphys, llnormagam):
    f = make_fields(tb)
    params = pp.set_phys_params(iphys=iphys, nang=NANG,
                                llnormagam=llnormagam)
    pr = f["props"]
    rng = f["rng"]
    sl = rng.normal(0.0, 1e-5, f["fl1"].shape)
    spos = np.abs(rng.normal(0.0, 1e-5, f["fl1"].shape))
    mij0 = rng.integers(NFRE // 2, NFRE, NPTS)
    # rhowgdfth exactly as frcutindex builds it
    _, rhow = stress_mod.frcutindex(
        jnp.asarray(rng.uniform(0.08, 0.3, NPTS)),
        jnp.asarray(rng.uniform(0.08, 0.3, NPTS)),
        jnp.asarray(f["ufric"]), jnp.zeros(NPTS), tb, params)
    rhow = np.asarray(rhow)
    x0 = tables_mod.x0_tauhf(params)
    wt = tables_mod.wtauhf(params)

    gtauw, gtauwdir, gphiwa = stress_mod.stresso(
        jnp.asarray(f["fl1"]), jnp.asarray(sl), jnp.asarray(spos),
        jnp.asarray(pr["cinv"].T), jnp.asarray(mij0),
        jnp.asarray(rhow), jnp.asarray(f["wdwave"]),
        jnp.asarray(f["ufric"]), jnp.asarray(f["z0m"]),
        jnp.asarray(f["aird"]), jnp.asarray(f["rnfac"]),
        jnp.asarray(f["coswdif"]), jnp.asarray(f["sinwdif2"]),
        tb, params, x0tauhf=x0, wtauhf=wt, llphiwa=True)
    otauw, otauwdir, ophiwa = osrc.stresso(
        f["fl1"].transpose(2, 0, 1), sl.transpose(2, 0, 1),
        spos.transpose(2, 0, 1), pr["cinv"], mij0 + 1, rhow.T.copy(),
        f["wdwave"], f["ufric"], f["z0m"], f["aird"], f["rnfac"],
        f["coswdif"].T.copy(), f["sinwdif2"].T.copy(), otb, params,
        x0, wt, True, gamnconst=params.gamnconst())
    check(gtauw, otauw, "tauw")
    check(gtauwdir, otauwdir, "tauwdir")
    check(gphiwa, ophiwa, "phiwa")


@pytest.mark.parametrize("iusfg,llcapchnk", [(0, False), (1, False),
                                             (0, True)])
def test_taut_z0_oracle(tb, iusfg, llcapchnk):
    """Non-LLGCBZ0 Newton branch (taut_z0.F90:223-290)."""
    f = make_fields(tb)
    params = pp.set_phys_params(iphys=1, nang=NANG, llcapchnk=llcapchnk)
    rng = f["rng"]
    tauw = rng.uniform(0.0, 0.8, NPTS) * f["ufric"] ** 2
    tauwdir = f["wdwave"] + rng.normal(0.0, 0.3, NPTS)

    gust, gz0, gz0b, gchrnck = airsea_mod.taut_z0(
        jnp.asarray(f["wswave"]), jnp.asarray(f["wdwave"]),
        jnp.asarray(tauw), jnp.asarray(tauwdir), jnp.asarray(f["ufric"]),
        params, iusfg=iusfg)
    oust, oz0, oz0b, ochrnck = osrc.taut_z0(
        iusfg, np.zeros(NPTS), f["wswave"], f["wdwave"], tauw, tauwdir,
        f["rnfac"], f["ufric"], params)
    # rtol 1e-8, not the global 1e-11: a sub-ulp codegen difference can
    # flip one point across the Newton early-exit threshold for one
    # extra/fewer iteration (~1e-10 relative near the fixed point)
    check(gust, oust, "ustar", rtol=1e-8)
    check(gz0, oz0, "z0", rtol=1e-8)
    check(gz0b, oz0b, "z0b", rtol=1e-8)
    check(gchrnck, ochrnck, "chrnck", rtol=1e-8)


def check_gc(got, want, name):
    check(got, want, name, rtol=1e-8)   # Newton early-exit flips (see above)


def test_taut_z0_gc_oracle(tb):
    """LLGCBZ0 branch; the oracle reuses the JAX stress_gc pointwise, so
    this pins the iteration/fallback structure (taut_z0.F90:146-281)."""
    from ecwam_tpu.ops.physics import gc as gc_mod

    f = make_fields(tb, seed=11)
    params = pp.set_phys_params(iphys=1, nang=NANG, llgcbz0=True,
                                llnormagam=True, llcapchnk=True)
    rng = f["rng"]
    tauw = rng.uniform(0.0, 0.8, NPTS) * f["ufric"] ** 2
    tauwdir = f["wdwave"] + rng.normal(0.0, 0.3, NPTS)
    halp = rng.uniform(0.002, 0.03, NPTS)
    gct = gc_mod.gc_tables()

    def stress_gc_scalar(ang, ust, z0, z0min, hal, rnf):
        return float(gc_mod.stress_gc(
            jnp.asarray([ang]), jnp.asarray([ust]), jnp.asarray([z0]),
            z0min, jnp.asarray([hal]), jnp.asarray([rnf]), gct, params)[0])

    gust, gz0, gz0b, gchrnck = airsea_mod.taut_z0_gc(
        jnp.asarray(f["wswave"]), jnp.asarray(f["wdwave"]),
        jnp.asarray(tauw), jnp.asarray(tauwdir), jnp.asarray(f["ufric"]),
        jnp.asarray(halp), jnp.asarray(f["rnfac"]), params, iusfg=0)
    oust, oz0, oz0b, ochrnck = osrc.taut_z0(
        0, halp, f["wswave"], f["wdwave"], tauw, tauwdir,
        f["rnfac"], f["ufric"], params, stress_gc=stress_gc_scalar)
    check(gust, oust, "ustar", rtol=1e-9)
    check(gz0, oz0, "z0", rtol=1e-9)
    check(gz0b, oz0b, "z0b", rtol=1e-9)
    check(gchrnck, ochrnck, "chrnck", rtol=1e-9)
