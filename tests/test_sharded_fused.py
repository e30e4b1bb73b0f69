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
