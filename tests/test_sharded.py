"""Multi-device sharding: NPROC-invariance of the full step.

The invariant the reference tests with its MPI 1/4-rank matrix
(tests/CMakeLists.txt:11-13): results must not depend on the decomposition.
Here: 8 virtual CPU devices vs single-device reference step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from ecwam_tpu.model import setup as setup_mod
from ecwam_tpu.model import stepper as stepper_mod
from ecwam_tpu.model import preset
from ecwam_tpu.parallel import decomp, sharded


@pytest.fixture(scope="module")
def ms():
    return setup_mod.build_model(
        grid_name="6.0", nang=12, nfre=25,
        idelpro=900.0, idelt=900.0, pad_to=8 * 8, dtype=jnp.float32)


def _inputs(ms):
    n = ms.n_pad
    rng = np.random.default_rng(42)
    wswave = 8.0 + 4.0 * rng.random(n)
    wdwave = rng.random(n) * 2 * np.pi
    DT = ms.dtype
    frc = dict(
        wswave=jnp.asarray(wswave, DT), wdwave=jnp.asarray(wdwave, DT),
        aird=jnp.full(n, 1.225, DT), wstar=jnp.zeros(n, DT),
        cicover=jnp.zeros(n, DT))
    fl1 = jnp.asarray(preset.mstart(ms.tb, wswave, wdwave), DT)
    stress = stepper_mod.initial_stress(ms, frc)
    return fl1, frc, stress


def test_halo_width_reasonable(ms):
    h = decomp.compute_halo_width(ms.stencil, 8)
    assert 8 <= h <= ms.n_pad // 8


def test_sharded_step_matches_single_device(ms):
    fl1, frc, stress = _inputs(ms)

    # single-device reference
    step_full, _, _ = stepper_mod.make_step(ms)
    ref_fl1, ref_state = step_full(fl1, frc, stress)

    mesh = Mesh(np.array(jax.devices()[:8]), ("pts",))
    sm = sharded.build_sharded_model(ms, mesh)
    fl1_s = sm.device_put(np.asarray(fl1))
    frc_s = {k: sm.device_put(np.asarray(v)) for k, v in frc.items()}
    stress_s = {k: sm.device_put(np.asarray(v)) for k, v in stress.items()}
    out_fl1, out_state = sm.step_full(fl1_s, frc_s, stress_s)

    # decomposition invariance: identical math modulo f32 fusion order
    np.testing.assert_allclose(
        np.asarray(out_fl1), np.asarray(ref_fl1), rtol=2e-4, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out_state["emean"]), np.asarray(ref_state["emean"]),
        rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_state["ufric"]), np.asarray(ref_state["ufric"]),
        rtol=2e-4)


def test_sharded_multi_step_stable(ms):
    fl1, frc, stress = _inputs(ms)
    mesh = Mesh(np.array(jax.devices()[:8]), ("pts",))
    sm = sharded.build_sharded_model(ms, mesh)
    f = sm.device_put(np.asarray(fl1))
    frc_s = {k: sm.device_put(np.asarray(v)) for k, v in frc.items()}
    stress_s = {k: sm.device_put(np.asarray(v)) for k, v in stress.items()}
    for _ in range(3):
        f, state = sm.step_full(f, frc_s, stress_s)
        stress_s = {k: state[k] for k in stress_s}
    fa = np.asarray(f)
    assert np.isfinite(fa).all()
    assert fa.min() >= 0.0
