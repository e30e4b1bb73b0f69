"""Golden tests: second-order spectrum subsystem vs Fortran oracle (f64).

Compares the vectorized table builder (tables_2nd.F90 / secondhh_gen.F90)
and the einsum-formulated correction (secspom.F90 /
cal_second_order_spec.F90) against the straight-line transcription in
tests/oracle/second.py on randomized spectra.
"""

import numpy as np
import pytest

from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.core import dispersion
from ecwam_tpu.ops import secondorder as so_mod
from ecwam_tpu.ops.physics import means as means_mod

from oracle import second as osec

NANG, NFRE, NPTS = 8, 12, 7
NDEPTH, DEPTHA, DEPTHD = 6, 1.0, 2.1


@pytest.fixture(scope="module")
def tb():
    return build_spectral_tables(nang=NANG, nfre=NFRE)


@pytest.fixture(scope="module")
def so(tb):
    return so_mod.build_second_order_tables(
        tb, ndepth=NDEPTH, deptha=DEPTHA, depthd=DEPTHD)


@pytest.fixture(scope="module")
def oso(tb):
    # inject the repo aki so both sides see bit-identical wavenumbers: the
    # del-regularized resonance denominators in V2 amplify a 1e-16 input
    # difference by ~1e11, which would swamp a structural comparison
    aki_fn = lambda om, d: float(dispersion.aki(np.float64(om), np.float64(d)))
    return osec.build_oracle_tables(tb.fr, tb.th, NANG, NFRE, tb.fratio,
                                    NDEPTH, DEPTHA, DEPTHD, aki_fn=aki_fn)


@pytest.fixture(scope="module")
def fields(tb):
    rng = np.random.default_rng(7)
    fl1 = np.exp(rng.normal(-4.0, 1.5, (NANG, NFRE, NPTS)))
    # depths spanning the whole table range so jd varies per point
    depth = np.concatenate([
        rng.uniform(2.0, 8.0, NPTS // 2),
        rng.uniform(20.0, 300.0, NPTS - NPTS // 2)])
    wavnum = dispersion.depth_properties(depth, tb.fr)["wavnum"].T.copy()
    return dict(fl1=fl1, depth=depth, wavnum=wavnum)


def test_thinned_grids_match(so, oso):
    np.testing.assert_allclose(so.omega_h, oso["omega"], rtol=1e-14)
    np.testing.assert_allclose(so.thh, oso["thh"], rtol=1e-14)
    np.testing.assert_allclose(so.dfdth, oso["dfdth"], rtol=1e-14)
    assert so.nmax == oso["nmax"]
    assert so.mr == oso["mr"] and so.ma == oso["ma"]


def test_interaction_tables_match(so, oso):
    # oracle indices are 1-based Fortran content; builder stores 0-based
    np.testing.assert_array_equal(
        so.im_p, np.clip(oso["im_p"], 1, oso["nmax"]) - 1)
    np.testing.assert_array_equal(
        so.im_m, np.clip(oso["im_m"], 1, oso["nmax"]) - 1)
    for name in ("ta", "tb", "tc_ql"):
        got = getattr(so, "tb" if name == "tb" else name)
        np.testing.assert_allclose(
            got, oso[name], rtol=1e-9, atol=1e-12, err_msg=name)
    # The Stokes-shift tables go through V2, whose DEL1=1e-5-regularized
    # resonance denominators amplify 1-ulp libm-vs-SIMD transcendental
    # differences by ~1e11 (measured): a bitwise-faithful comparison is
    # impossible even between two Fortran compilers.  2e-3 bounds the
    # measured 1.1e-4 worst case with headroom.
    for name in ("tt_4m", "tt_4p"):
        np.testing.assert_allclose(
            getattr(so, name), oso[name], rtol=2e-3, atol=1e-10,
            err_msg=name)


def test_im_indices_within_extended_range(so, oso):
    # the clip in the builder must be inert: the Fortran relies on NMAX
    # covering every ω0+ω1 bin (tables_2nd.F90:159-161)
    assert oso["im_p"].max() <= oso["nmax"]
    assert oso["im_p"].min() >= 1
    assert oso["im_m"][oso["ta"][0, 0] != 0.0].min() >= 1


def _with_oracle_tables(so, oso):
    """Clone of the builder tables with the oracle's table values, so the
    secspom/cal machinery is compared on bit-identical inputs (isolating
    it from the V2 conditioning issue above)."""
    import dataclasses
    return dataclasses.replace(
        so, ta=oso["ta"], tb=oso["tb"], tc_ql=oso["tc_ql"],
        tt_4m=oso["tt_4m"], tt_4p=oso["tt_4p"],
        im_p=np.clip(oso["im_p"], 1, oso["nmax"]) - 1,
        im_m=np.clip(oso["im_m"], 1, oso["nmax"]) - 1)


def test_secspom_matches_oracle(tb, so, oso, fields):
    fl1, depth, wavnum = fields["fl1"], fields["depth"], fields["wavnum"]
    _, _, _, akmean, _ = (np.asarray(v, np.float64) for v in
                          means_mod.fkmean(fl1, wavnum, tb))
    pf1 = fl1[so.k_half][:, so.m_half]

    got = np.asarray(so_mod.secspom(pf1, depth, akmean,
                                    _with_oracle_tables(so, oso)))

    st = oso
    want = osec.secspom(
        pf1.transpose(2, 0, 1), st["nfreh"], st["nangh"], st["nmax"],
        DEPTHA, DEPTHD, NDEPTH, st["omstart"], st["frac"], st["mr"],
        st["dfdth"], st["omega"], depth, akmean, st["ta"], st["tb"],
        st["tc_ql"], st["tt_4m"], st["tt_4p"], st["im_p"], st["im_m"])
    np.testing.assert_allclose(got, want.transpose(1, 2, 0),
                               rtol=1e-9, atol=1e-14)


def test_cal_second_order_spec_matches_oracle(tb, so, oso, fields):
    fl1, depth, wavnum = fields["fl1"], fields["depth"], fields["wavnum"]
    em, _, _, ak, _ = (np.asarray(v, np.float64) for v in
                       means_mod.fkmean(fl1, wavnum, tb))

    got = np.asarray(so_mod.cal_second_order_spec(
        fl1, wavnum, depth, tb, _with_oracle_tables(so, oso), sig=1.0))
    want = osec.cal_second_order_spec(
        fl1.transpose(2, 0, 1), depth, em, ak, tb.fr, tb.th, tb.fratio,
        NANG, NFRE, oso, sig=1.0)
    np.testing.assert_allclose(got, want.transpose(1, 2, 0),
                               rtol=1e-9, atol=1e-14)
    # the gate must actually fire for the shallow points (steep sea /
    # shallow water → no correction) and pass for the deep ones
    assert not np.allclose(got, fl1)


def test_inverse_mapping_roundtrip(tb, so, fields):
    """sig=-1 then sig=+1 is close to identity where the correction is
    small (the mapping is first-order in the correction)."""
    fl1, depth, wavnum = fields["fl1"], fields["depth"], fields["wavnum"]
    fwd = np.asarray(so_mod.cal_second_order_spec(
        fl1, wavnum, depth, tb, so, sig=1.0))
    back = np.asarray(so_mod.cal_second_order_spec(
        fwd, wavnum, depth, tb, so, sig=-1.0))
    scale = np.abs(fl1).max()
    assert np.abs(back - fl1).max() < 0.15 * scale
