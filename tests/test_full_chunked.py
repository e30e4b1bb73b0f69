"""Chunked full-diagnostics physics step (phys_srl_full_chunked) vs the
unchunked full mode — the at-scale output-date path that never
materializes global xllws (VERDICT r4 missing #3; wamodel.F90:363,
outblock.F90:153-612)."""

import numpy as np
import jax.numpy as jnp

from ecwam_tpu.io import products as products_mod
from ecwam_tpu.model import setup as setup_mod, stepper as stepper_mod
from ecwam_tpu.model.fusedstep import FusedPropagation


def _build():
    nang, nfre, nfre_red = 12, 15, 12
    ms = setup_mod.build_model(
        grid_name="12.0", nang=nang, nfre=nfre, nfre_red=nfre_red,
        idelpro=900.0, idelt=900.0, pad_to=128, dtype=jnp.float32,
        weights_mode="fused")
    fp = FusedPropagation(ms)
    n = ms.n_pad
    rng = np.random.default_rng(3)
    wswave = (6.0 + 8.0 * rng.random(n)).astype(np.float32)
    wdwave = (rng.random(n) * 2 * np.pi).astype(np.float32)
    frc = dict(
        wswave=jnp.asarray(wswave), wdwave=jnp.asarray(wdwave),
        aird=jnp.full(n, 1.225, jnp.float32),
        wstar=jnp.zeros(n, jnp.float32),
        cicover=jnp.zeros(n, jnp.float32))
    stress = stepper_mod.initial_stress(ms, dict(wswave=wswave,
                                                 wdwave=wdwave))
    env2d, denv, frc6, stress6 = fp.build_phys_srl(frc, stress)
    f_srl, tail = fp.initial_srl(wswave, wdwave)
    return ms, fp, env2d, denv, frc6, stress6, f_srl, tail


def test_chunked_matches_unchunked_full():
    ms, fp, env2d, denv, frc6, stress6, f_srl, tail = _build()
    tb = ms.tb

    fu, s6u, tu, st_u = fp.phys_srl_pallas(
        f_srl, stress6, frc6, denv, env2d, tail, full=True)
    fc, s6c, tc, st_c = fp.phys_srl_full_chunked(
        f_srl, stress6, frc6, denv, env2d, tail, chunk=256)

    np.testing.assert_array_equal(np.asarray(fu), np.asarray(fc))
    np.testing.assert_array_equal(np.asarray(tu), np.asarray(tc))
    np.testing.assert_array_equal(np.asarray(s6u), np.asarray(s6c))
    for k in st_u:
        if k in ("xllws",):
            continue
        np.testing.assert_array_equal(
            np.asarray(st_u[k]), np.asarray(st_c[k]), err_msg=k)
    assert "xllws" not in st_c
    assert "xllws" in st_u

    # the separation rows must equal sepwisw applied to the unchunked
    # outputs (the consumer io/products.py would otherwise run)
    nang, nfre_red = tb.nang, tb.nfre_red
    L = nang * nfre_red
    lt = nang * (tb.nfre - nfre_red)
    nsrl = fu.shape[0]
    fl = jnp.transpose(fu, (1, 0))[:L].reshape(nang, nfre_red, nsrl)
    tl3 = jnp.transpose(tu, (1, 0))[:lt].reshape(
        nang, tb.nfre - nfre_red, nsrl)
    fl = jnp.concatenate([fl, tl3], axis=1)
    cinv = env2d[tb.nfre:2 * tb.nfre]
    want = products_mod.sepwisw(
        fl, st_u["xllws"], cinv, st_u["ufric"], frc6[0], frc6[1], tb)
    for k in fp.SEP_KEYS:
        # the chunked rows are stored f32; the reference here promotes
        # to f64 under the suite's x64 flag
        np.testing.assert_allclose(
            np.asarray(st_c["sep"][k]), np.asarray(want[k]),
            rtol=5e-5, atol=1e-6, err_msg=k)


def test_chunked_products_match_whole_field():
    """products.compute_chunked (the at-scale output path) vs whole-
    field compute on the fast driver (outblock.F90 NPROMA role)."""
    from ecwam_tpu.model import driver

    nang, nfre, nfre_red = 12, 15, 12
    ms = setup_mod.build_model(
        grid_name="12.0", nang=nang, nfre=nfre, nfre_red=nfre_red,
        idelpro=900.0, idelt=900.0, pad_to=128, dtype=jnp.float32,
        weights_mode="fused")
    m = driver.FastWaveModel(
        ms, driver.constant_wind_forcing(ms.n_real, 11.0),
        "20230101000000", backend="pallas", interpret=True)
    m.advance(2, full_phys=True)

    names = ("swh", "mwp", "mwd", "shww", "shts", "mdww", "dwps",
             "tauoc", "ust")
    known = tuple(n for n in names if n in products_mod.CATALOG)
    assert len(known) >= 6
    state = {**m.state, **m.stress}
    whole = products_mod.compute(
        known, m.fl1, ms.tb, state, m.frc, ms.phys.params, env=ms.env)
    chunked = products_mod.compute_chunked(
        known, m.fl1_chunk, ms.n_pad, ms.tb, state, m.frc,
        ms.phys.params, env=ms.env, chunk=256)
    for nme in known:
        np.testing.assert_allclose(
            np.asarray(chunked[nme]), np.asarray(whole[nme]),
            rtol=1e-6, atol=1e-7, err_msg=nme)
