"""Sharded FUSED propagation vs the single-device fused model.

The memory-scalable fused path must be NPROC-invariant: stepping the
same state on a 1/2/4/8-shard mesh reproduces the single-device result
(VERDICT r2 item 3; mpexchng.F90 + the fused kernel's local windows)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from ecwam_tpu.model import setup as setup_mod
from ecwam_tpu.model import preset, stepper as stepper_mod
from ecwam_tpu.parallel import sharded


def _build(**kw):
    base = dict(grid_name="6.0", nang=12, nfre=25, idelpro=900.0,
                idelt=900.0, pad_to=64, dtype=jnp.float64,
                weights_mode="fused")
    base.update(kw)
    return setup_mod.build_model(**base)


def _inputs(ms, seed=0):
    rng = np.random.default_rng(seed)
    n = ms.n_pad
    wswave = 6.0 + 6.0 * rng.random(n)
    wdwave = rng.random(n) * 2.0 * np.pi
    frc = dict(
        wswave=jnp.asarray(wswave, ms.dtype),
        wdwave=jnp.asarray(wdwave, ms.dtype),
        aird=jnp.full(n, 1.225, ms.dtype),
        wstar=jnp.zeros(n, ms.dtype),
        cicover=jnp.zeros(n, ms.dtype))
    fl1 = jnp.asarray(preset.mstart(ms.tb, wswave, wdwave), ms.dtype)
    stress = stepper_mod.initial_stress(ms, frc)
    return fl1, frc, stress


def _run_sharded(ms, n_shards, fl1, frc, stress, nsteps=2):
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("pts",))
    sm = sharded.build_sharded_model(ms, mesh)
    f = sm.device_put(np.asarray(fl1))
    frc_s = {k: sm.device_put(np.asarray(v)) for k, v in frc.items()}
    st_s = {k: sm.device_put(np.asarray(v)) for k, v in stress.items()}
    for _ in range(nsteps):
        f, state = sm.step_full(f, frc_s, st_s)
        st_s = {k: state[k] for k in st_s}
    return sm.from_layout(np.asarray(f))[..., : ms.n_real]


@pytest.mark.parametrize("config", ["plain", "fastwaves", "currents3"])
def test_sharded_fused_nproc_invariance(config):
    kw = {}
    if config == "fastwaves":
        kw = dict(delpro_lf=450.0, ifrelfmax=4)
    elif config == "currents3":
        ms0 = _build()
        rng = np.random.default_rng(5)
        kw = dict(irefra=3,
                  currents=(0.3 * rng.standard_normal(ms0.n_real),
                            0.3 * rng.standard_normal(ms0.n_real)))
    ms = _build(**kw)
    fl1, frc, stress = _inputs(ms)

    # single-device fused reference
    sb = stepper_mod.make_step(ms)
    f_ref, state = sb.step_full(fl1, frc, stress)
    st2 = {k: state[k] for k in stress}
    f_ref, _ = sb.step_full(f_ref, frc, st2)
    ref = np.asarray(f_ref)[..., : ms.n_real]

    for n_shards in (2, 8):
        got = _run_sharded(ms, n_shards, fl1, frc, stress)
        np.testing.assert_allclose(
            got, ref, rtol=1e-11, atol=1e-11 * max(ref.max(), 1e-30),
            err_msg=f"n_shards={n_shards} config={config}")


def test_device_norms_match_host_norms():
    """psum-tree monitoring norms (mpminmaxavg.F90 non-global mode) vs
    the reproducible gather-to-host path."""
    ms = _build()
    fl1, frc, stress = _inputs(ms)
    mesh = Mesh(np.array(jax.devices()[:4]), ("pts",))
    sm = sharded.build_sharded_model(ms, mesh)
    from ecwam_tpu.ops.physics import means as means_mod
    swh = 4.0 * np.sqrt(np.asarray(means_mod.semean(fl1, ms.tb)))
    swh_dev = sm.device_put(swh)
    host = sm.norms(np.asarray(swh_dev))
    dev = sm.norms_device(swh_dev)
    assert dev["count"] == host["count"]
    np.testing.assert_allclose(dev["average"], host["average"],
                               rtol=1e-12)
    np.testing.assert_allclose(dev["minimum"], host["minimum"])
    np.testing.assert_allclose(dev["maximum"], host["maximum"])


# ---------------------------------------------------------------------------
# kernel architecture: SRL rows + Pallas advection + fused Pallas physics
# ---------------------------------------------------------------------------

def _single_chip_kernel_steps(ms, fl1, frc, stress, nsteps=2):
    """Reference trajectory on the single-chip kernel architecture
    (FusedPropagation + implsch_pallas_srl, interpret mode)."""
    from ecwam_tpu.model.fusedstep import FusedPropagation
    from ecwam_tpu.ops.physics import implsch_pallas as ipk

    tb = ms.tb
    nang, nfre, nfre_red = tb.nang, tb.nfre, tb.nfre_red
    fp = FusedPropagation(ms, backend="pallas", interpret=True)
    env2d, denv, frc6, stress6 = fp.build_phys_srl(frc, stress)
    f_srl = fp.to_srl(jnp.asarray(fl1)[:, :nfre_red], fp.bundle)
    tail = None
    LT = nang * (nfre - nfre_red)
    if LT:
        LTP = -(-LT // 128) * 128
        rows3 = np.asarray(fl1).transpose(2, 0, 1)[:, :, nfre_red:]
        tl = np.zeros((ms.n_pad + 1, LTP), np.float32)
        tl[:ms.n_pad, :LT] = rows3.reshape(ms.n_pad, LT)
        tail = jnp.asarray(tl[np.asarray(ms.fused.srl_src)])
    for _ in range(nsteps):
        f_srl = fp.advect_srl(f_srl, fp.bundle)
        res = fp.phys_srl_pallas(f_srl, stress6, frc6, denv, env2d,
                                 tail)
        f_srl, stress6 = res[0], res[1]
        if tail is not None:
            tail = res[2]
    out = np.asarray(fp.from_srl(f_srl, fp.bundle))
    if LT:
        fsp = np.asarray(ms.fused.from_srl)
        t = np.asarray(tail)[fsp][:, :LT].reshape(
            -1, nang, nfre - nfre_red).transpose(1, 2, 0)
        pad = np.repeat(t[:, :, :1], ms.n_pad - t.shape[2], axis=2)
        out = np.concatenate([out, np.concatenate([t, pad], axis=2)],
                             axis=1)
    return out


@pytest.mark.parametrize("nfre_red", [25, 20])
def test_sharded_kernel_architecture_matches_single_chip(nfre_red):
    """The sharded step_rows path (SRL rows + Pallas advect + fused
    Pallas physics inside shard_map — the bench architecture, VERDICT
    r3 #2) reproduces the single-chip kernel trajectory, including the
    operational NFRE>NFRE_RED diagnostic-tail split."""
    ms = _build(dtype=jnp.float32, nfre=25, nfre_red=nfre_red)
    fl1, frc, stress = _inputs(ms)
    ref = _single_chip_kernel_steps(ms, fl1, frc, stress)

    got = {}
    for n_shards in (2, 4):
        mesh = Mesh(np.array(jax.devices()[:n_shards]), ("pts",))
        sm = sharded.build_sharded_model(ms, mesh, backend="pallas",
                                         interpret=True)
        assert sm.kernel_arch
        rows, tail = sm.put_rows(np.asarray(fl1))
        s6 = sm.put_stress6(stress)
        frc_s = {k: sm.device_put(np.asarray(v))
                 for k, v in frc.items()}
        for _ in range(2):
            rows, tail, s6 = sm.step_rows(rows, tail, s6, frc_s)
        got[n_shards] = sm.rows_to_compact(rows, tail)[..., :ms.n_real]

    # shard-count invariance of the kernel architecture (tight)
    np.testing.assert_allclose(got[2], got[4], rtol=2e-5, atol=1e-10)
    # vs the single chip (tile sizes/halo windows differ -> f32 noise
    # through the DIA cancellations; the f64 XLA-path invariance test
    # above pins the algebra exactly)
    scale = np.abs(ref[..., : ms.n_real]).max()
    np.testing.assert_allclose(got[2], ref[..., : ms.n_real],
                               rtol=5e-3, atol=5e-3 * scale)


def test_sharded_kernel_full_state_for_products():
    """step_rows_full produces the diagnostics io/products.py consumes
    (fluxes, Stokes, means, mij, xllws) in own-point order."""
    ms = _build(dtype=jnp.float32)
    fl1, frc, stress = _inputs(ms)
    mesh = Mesh(np.array(jax.devices()[:2]), ("pts",))
    sm = sharded.build_sharded_model(ms, mesh, backend="pallas",
                                     interpret=True)
    rows, tail = sm.put_rows(np.asarray(fl1))
    s6 = sm.put_stress6(stress)
    frc_s = {k: sm.device_put(np.asarray(v)) for k, v in frc.items()}
    rows, tail, s6, state = sm.step_rows_full(rows, tail, s6, frc_s)
    n = ms.n_real
    em = sm.from_layout(np.asarray(state["emean"]))[:n]
    assert np.all(np.isfinite(em)) and np.all(em > 0)
    swh = 4.0 * np.sqrt(em)
    assert 0.05 < swh.mean() < 15.0
    # per-bin xllws is no longer materialized (chunked full mode);
    # the windsea separation rows take its place for products
    assert "xllws" not in state
    esea = sm.from_layout(np.asarray(state["sep"]["esea"]))[:n]
    eswell = sm.from_layout(np.asarray(state["sep"]["eswell"]))[:n]
    assert np.all(np.isfinite(esea)) and np.all(np.isfinite(eswell))
    assert np.all(esea + eswell > 0)
    mij = sm.from_layout(np.asarray(state["mij"]))[:n]
    assert mij.min() >= 0 and mij.max() <= ms.tb.nfre - 1
    to = sm.from_layout(np.asarray(state["tauoc"]))[:n]
    # TAUOC is clipped to [TAUOCMIN, TAUOCMAX] (wnfluxes.F90); young
    # growing seas sit near 1, slightly above when swell returns
    # momentum to the atmosphere
    assert np.all((to > 0.5) & (to < 1.5))
