"""Golden tests: DIA nonlinear transfer vs the Fortran-oracle transcription.

Pins the full SNONLIN chain — NLWEIGT/INISNONLIN tables and the
three-branch scatter — at double precision on randomized spectra for both
operational spectral resolutions (12×25 and 36×29) and both shallow-water
enhancement modes ISNONLIN∈{0,1}.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.core import dispersion
from ecwam_tpu.ops.physics import dia as dia_mod

from oracle import snl as osnl
from oracle import reftables as ort

NPTS = 8
RTOL = 1e-12


def _fields(nang, nfre, seed):
    tb = build_spectral_tables(nang=nang, nfre=nfre)
    rng = np.random.default_rng(seed)
    fl1 = np.exp(rng.normal(-4.0, 2.0, (nang, nfre, NPTS)))
    depth = np.concatenate([
        rng.uniform(3.0, 60.0, NPTS // 2),
        rng.uniform(100.0, 5000.0, NPTS - NPTS // 2)])
    wavnum = dispersion.depth_properties(depth, tb.fr)["wavnum"].T.copy()
    akmean = rng.uniform(0.005, 0.3, NPTS)
    fld = rng.normal(size=fl1.shape)
    sl = rng.normal(size=fl1.shape)
    return tb, fl1, depth, wavnum, akmean, fld, sl


def test_dia_tables_match_oracle():
    """build_dia_tables vs nlweigt/inisnonlin transcription (36 dirs)."""
    nang, nfre = 36, 29
    tb = build_spectral_tables(nang=nang, nfre=nfre)
    dia = dia_mod.build_dia_tables(nang, nfre, tb.fr, tb.delth, tb.fratio)
    t = osnl.inisnonlin(nang, nfre, tb.fr, tb.delth)

    assert dia.mfrstlw == t["mfrstlw"]
    assert dia.mlsthg == t["mlsthg"]
    assert dia.kfrh == t["kfrh"]
    np.testing.assert_allclose(dia.dal1, t["dal1"], rtol=1e-15)
    np.testing.assert_allclose(dia.dal2, t["dal2"], rtol=1e-15)

    for mc in range(1, t["mlsthg"] + 1):
        j = mc - 1
        assert dia.ikp[j] == t["ikp"][mc], ("ikp", mc)
        assert dia.ikm[j] == t["ikm"][mc], ("ikm", mc)
        np.testing.assert_allclose(dia.af11[j], t["af11"][mc], rtol=1e-14)
        ic, ip, ip1, im, im1 = t["inlcoef"][mc]
        assert (dia.ic[j] + 1, dia.ip[j] + 1, dia.ip1[j] + 1,
                dia.im[j] + 1, dia.im1[j] + 1) == (ic, ip, ip1, im, im1), mc
        np.testing.assert_allclose(
            dia.rnl[:, j], np.asarray(t["rnlcoef"][mc]), rtol=1e-14,
            err_msg=f"rnlcoef mc={mc}")

    for kh in (1, 2):
        for k in range(1, nang + 1):
            assert dia.k1w[k - 1, kh - 1] + 1 == t["k1w"][(k, kh)]
            assert dia.k2w[k - 1, kh - 1] + 1 == t["k2w"][(k, kh)]
            assert dia.k11w[k - 1, kh - 1] + 1 == t["k11w"][(k, kh)]
            assert dia.k21w[k - 1, kh - 1] + 1 == t["k21w"][(k, kh)]


@pytest.mark.parametrize("nang,nfre", [(12, 25), (36, 29)])
@pytest.mark.parametrize("isnonlin", [0, 1, 2])
def test_snonlin_oracle(nang, nfre, isnonlin):
    tb, fl1, depth, wavnum, akmean, fld, sl = _fields(nang, nfre, seed=7)
    dia = dia_mod.build_dia_tables(nang, nfre, tb.fr, tb.delth, tb.fratio)

    gfld, gsl = dia_mod.snonlin(
        jnp.asarray(fl1), jnp.asarray(fld), jnp.asarray(sl),
        jnp.asarray(wavnum), jnp.asarray(depth), jnp.asarray(akmean),
        tb, dia, isnonlin=isnonlin)

    otb = ort.build(nang, nfre)
    ofld, osl = osnl.snonlin(
        fl1.transpose(2, 0, 1), fld.transpose(2, 0, 1),
        sl.transpose(2, 0, 1), wavnum.T.copy(), depth, akmean, otb,
        isnonlin=isnonlin)

    scale = np.abs(osl).max()
    np.testing.assert_allclose(
        np.asarray(gsl).transpose(2, 0, 1), osl,
        rtol=RTOL, atol=RTOL * scale, err_msg="SL")
    scale = np.abs(ofld).max()
    np.testing.assert_allclose(
        np.asarray(gfld).transpose(2, 0, 1), ofld,
        rtol=RTOL, atol=RTOL * scale, err_msg="FLD")
