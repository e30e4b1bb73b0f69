"""Golden tests: JAX kernels vs straight-line Fortran oracles (f64).

Every test compares an ecwam_tpu kernel against the literal NumPy
transcription in tests/oracle/ on randomized spectra at double precision.
Agreement bound is 1e-12 relative (pure round-off), far tighter than any
physical tolerance — a failure means the implementations diverge
structurally.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.core import dispersion
from ecwam_tpu.ops.physics import means as means_mod
from ecwam_tpu.ops.physics import shallow as shallow_mod
from ecwam_tpu.ops.physics import stress as stress_mod
from ecwam_tpu.ops.physics import tail_ice
from ecwam_tpu.core import physparams as pp

from oracle import reftables as ort
from oracle import means as omeans
from oracle import shallow as oshallow

NANG, NFRE, NPTS = 12, 25, 16
RTOL = 1e-12
ATOL = 1e-13


@pytest.fixture(scope="module")
def tb():
    return build_spectral_tables(nang=NANG, nfre=NFRE)


@pytest.fixture(scope="module")
def otb():
    return ort.build(NANG, NFRE)


@pytest.fixture(scope="module")
def rngfields(tb):
    """Random but physically-shaped spectra/env in f64."""
    rng = np.random.default_rng(42)
    # lognormal spectra spanning several orders of magnitude
    fl1 = np.exp(rng.normal(-4.0, 2.0, (NANG, NFRE, NPTS)))
    depth = np.concatenate([
        rng.uniform(3.0, 40.0, NPTS // 2),      # shallow incl. breaking zone
        rng.uniform(100.0, 5000.0, NPTS - NPTS // 2)])
    wavnum = dispersion.depth_properties(depth, tb.fr)["wavnum"].T.copy()
    return dict(fl1=fl1, depth=depth, wavnum=wavnum, rng=rng)


def to_oracle(a):
    """(nang, nfre, npts) → (npts, nang, nfre)."""
    return np.asarray(a, np.float64).transpose(2, 0, 1)


def test_tables_match_reference_formulas(tb, otb):
    for name in ("fr", "th", "dfim", "dfimofr", "dfimfr", "dfimfr2",
                 "zpifr", "fr5", "cofrm4", "rhowg_dfim"):
        np.testing.assert_allclose(
            getattr(tb, name), getattr(otb, name), rtol=1e-14,
            err_msg=name)
    assert tb.delth == otb.delth
    assert tb.flogsprdm1 == otb.flogsprdm1


def test_fkmean_oracle(tb, otb, rngfields):
    fl1, wavnum = rngfields["fl1"], rngfields["wavnum"]
    got = means_mod.fkmean(jnp.asarray(fl1), jnp.asarray(wavnum), tb)
    want = omeans.fkmean(to_oracle(fl1), wavnum.T.copy(), otb)
    for g, w, name in zip(got, want, ("em", "fm1", "f1", "ak", "xk")):
        np.testing.assert_allclose(np.asarray(g), w, rtol=RTOL, atol=ATOL, err_msg=name)


def test_semean_femean_femeanws_oracle(tb, otb, rngfields):
    fl1 = rngfields["fl1"]
    xllws = (rngfields["rng"].uniform(size=fl1.shape) > 0.5).astype(float)

    em = means_mod.semean(jnp.asarray(fl1), tb)
    np.testing.assert_allclose(
        np.asarray(em), omeans.semean(to_oracle(fl1), otb), rtol=RTOL, atol=ATOL)

    em, fm = means_mod.femean(jnp.asarray(fl1), tb)
    oem, ofm = omeans.femean(to_oracle(fl1), otb)
    np.testing.assert_allclose(np.asarray(em), oem, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(fm), ofm, rtol=RTOL, atol=ATOL)

    em, fm = means_mod.femeanws(jnp.asarray(fl1), jnp.asarray(xllws), tb)
    oem, ofm = omeans.femeanws(to_oracle(fl1), to_oracle(xllws), otb)
    np.testing.assert_allclose(np.asarray(em), oem, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(fm), ofm, rtol=RTOL, atol=ATOL)


def test_frcutindex_oracle(tb, otb, rngfields):
    rng = rngfields["rng"]
    params = pp.set_phys_params(iphys=1, nang=NANG)
    fm = rng.uniform(0.05, 0.4, NPTS)
    fmws = rng.uniform(0.05, 0.6, NPTS)
    ufric = rng.uniform(0.01, 2.0, NPTS)
    cicover = np.where(rng.uniform(size=NPTS) > 0.8,
                       rng.uniform(0.4, 1.0, NPTS), 0.0)
    mij, rhow = stress_mod.frcutindex(
        jnp.asarray(fm), jnp.asarray(fmws), jnp.asarray(ufric),
        jnp.asarray(cicover), tb, params)
    omij, orhow = omeans.frcutindex(
        fm, fmws, ufric, cicover, otb,
        tailfactor=params.tailfactor, tailfactor_pm=params.tailfactor_pm)
    np.testing.assert_array_equal(np.asarray(mij) + 1, omij)
    np.testing.assert_allclose(np.asarray(rhow).T, orhow, rtol=RTOL, atol=ATOL)


def test_imphftail_oracle(tb, otb, rngfields):
    rng = rngfields["rng"]
    fl1, wavnum, depth = (rngfields["fl1"], rngfields["wavnum"],
                          rngfields["depth"])
    props = dispersion.depth_properties(rngfields["depth"], tb.fr)
    xk2cg = props["xk2cg"].T.copy()
    mij0 = rng.integers(0, NFRE, NPTS)
    flm = np.exp(rng.normal(-14.0, 1.0, (NANG, NPTS)))
    got = tail_ice.imphftail(
        jnp.asarray(fl1), jnp.asarray(mij0), jnp.asarray(flm),
        jnp.asarray(wavnum), jnp.asarray(xk2cg))
    want = omeans.imphftail(mij0 + 1, flm.T.copy(), wavnum.T.copy(),
                            xk2cg.T.copy(), to_oracle(fl1))
    np.testing.assert_allclose(to_oracle(got), want, rtol=RTOL, atol=ATOL)


def test_sdepthlim_oracle(tb, otb, rngfields):
    rng = rngfields["rng"]
    fl1 = rngfields["fl1"]
    emaxdpt = rng.uniform(0.01, 10.0, NPTS)
    got = means_mod.sdepthlim(jnp.asarray(fl1), jnp.asarray(emaxdpt), tb)
    want = omeans.sdepthlim(emaxdpt, to_oracle(fl1), otb)
    np.testing.assert_allclose(to_oracle(got), want, rtol=RTOL, atol=ATOL)


def test_sbottom_sdiwbk_oracle(tb, otb, rngfields):
    rng = rngfields["rng"]
    fl1, wavnum, depth = (rngfields["fl1"], rngfields["wavnum"],
                          rngfields["depth"])
    fld = rng.normal(size=fl1.shape)
    sl = rng.normal(size=fl1.shape)
    nfre_red = NFRE - 3

    gfld, gsl = shallow_mod.sbottom(
        jnp.asarray(fl1), jnp.asarray(fld), jnp.asarray(sl),
        jnp.asarray(wavnum), jnp.asarray(depth), nfre_red)
    ofld, osl = oshallow.sbottom(
        to_oracle(fl1), to_oracle(fld), to_oracle(sl), wavnum.T.copy(),
        depth, nfre_red)
    np.testing.assert_allclose(to_oracle(gfld), ofld, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(to_oracle(gsl), osl, rtol=RTOL, atol=ATOL)

    emean, _, f1mean, _, _ = means_mod.fkmean(
        jnp.asarray(fl1), jnp.asarray(wavnum), tb)
    emaxdpt = rng.uniform(0.005, 5.0, NPTS)
    gfld, gsl = shallow_mod.sdiwbk(
        jnp.asarray(fl1), jnp.asarray(fld), jnp.asarray(sl),
        jnp.asarray(depth), jnp.asarray(emaxdpt), emean, f1mean, nfre_red)
    ofld, osl = oshallow.sdiwbk(
        to_oracle(fl1), to_oracle(fld), to_oracle(sl), depth, emaxdpt,
        np.asarray(emean), np.asarray(f1mean), nfre_red)
    np.testing.assert_allclose(to_oracle(gfld), ofld, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(to_oracle(gsl), osl, rtol=RTOL, atol=ATOL)


def test_implsch_update_oracle(tb, otb, rngfields):
    """The semi-implicit update block (implsch.F90:380-395)."""
    from ecwam_tpu.ops.physics.implsch import _flmax

    rng = rngfields["rng"]
    fl1 = rngfields["fl1"]
    fld = rng.normal(0.0, 1e-4, fl1.shape)
    sl = rng.normal(0.0, 1e-5, fl1.shape)
    ufric = rng.uniform(0.01, 2.0, NPTS)
    fmean = rng.uniform(0.05, 0.4, NPTS)
    fmeanws = rng.uniform(0.05, 0.6, NPTS)
    flm = np.exp(rng.normal(-14.0, 1.0, (NANG, NPTS)))
    idelt = 900.0
    params = pp.set_phys_params(iphys=1, nang=NANG)

    # replicate the jax update exactly as implsch.py does it
    delt5 = idelt
    cofrm4 = jnp.asarray(tb.cofrm4)[None, :, None]
    usfm = (jnp.asarray(ufric)
            * jnp.maximum(jnp.asarray(fmeanws), jnp.asarray(fmean)))
    temp = usfm[None, None, :] * (cofrm4 * idelt)
    gtemp1 = jnp.maximum(1.0 - delt5 * jnp.asarray(fld), 1.0)
    gtemp2 = idelt * jnp.asarray(sl) / gtemp1
    flhab = jnp.minimum(jnp.abs(gtemp2), temp)
    fl_new = jnp.asarray(fl1) + jnp.sign(gtemp2) * flhab
    fl_new = jnp.maximum(fl_new, jnp.asarray(flm)[:, None, :])
    flmax = jnp.asarray(_flmax(tb, params))[None, :, None]
    fl_new = jnp.minimum(fl_new, flmax)

    otb2 = ort.build(NANG, NFRE, alphapmax=params.alphapmax)
    want, _ = oshallow.implsch_update(
        to_oracle(fl1), to_oracle(fld), to_oracle(sl), ufric, fmean,
        fmeanws, flm.T.copy(), otb2, idelt=idelt)
    np.testing.assert_allclose(to_oracle(fl_new), want, rtol=RTOL, atol=ATOL)
