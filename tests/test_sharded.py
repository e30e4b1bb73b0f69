"""Multi-device sharding: NPROC-invariance of the full step.

The invariant the reference tests with its MPI 1/4-rank matrix
(tests/CMakeLists.txt:11-13): results must not depend on the
decomposition.  Here: 8 virtual CPU devices vs the single-device step,
for the plain configuration AND the round-1 gaps — depth/current
refraction (irefra=3), fast-wave substepping, multi-step trajectories —
plus the row-aligned-halo and weight-caching properties.
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

NSTEPS = 10


def _build(irefra=0, ifrelfmax=0, currents=None):
    kw = {}
    if ifrelfmax:
        kw.update(delpro_lf=450.0, ifrelfmax=ifrelfmax)
    return setup_mod.build_model(
        grid_name="6.0", nang=12, nfre=25,
        idelpro=900.0, idelt=900.0, pad_to=8 * 8, dtype=jnp.float32,
        irefra=irefra, currents=currents, **kw)


@pytest.fixture(scope="module")
def ms():
    return _build()


def _inputs(ms, seed=42):
    n = ms.n_pad
    rng = np.random.default_rng(seed)
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


def test_row_aligned_halo_is_small(ms):
    """Row-aligned cuts bound the halo by ~one row length; the round-1
    equal-count split inflated it to ~the longest boundary row."""
    ss = decomp.build_sharded_stencil(
        ms.stencil, 8, row_start=np.asarray(ms.blk.row_start))
    max_row = int(np.max(np.asarray(ms.grid.nlonrgg)))
    # corner neighbours can span the two adjacent (reduced) rows
    assert ss.halo <= -(-(2 * max_row + 16) // 8) * 8
    # the permutation is a bijection on real points
    real = ss.perm[ss.perm >= 0]
    assert np.array_equal(np.sort(real), np.arange(ms.n_pad))
    idx = np.arange(ms.n_pad)
    assert np.array_equal(ss.perm[ss.g2l[idx]], idx)


def _run_pair(ms, nsteps, seed=42):
    """Run single-device vs 8-device trajectories; returns (ref, out)."""
    fl1, frc, stress = _inputs(ms, seed)

    step_full, _, _ = stepper_mod.make_step(ms)
    rf, rs = fl1, dict(stress)
    for _ in range(nsteps):
        rf, state = step_full(rf, frc, rs)
        rs = {k: state[k] for k in rs}

    mesh = Mesh(np.array(jax.devices()[:8]), ("pts",))
    sm = sharded.build_sharded_model(ms, mesh)
    f = sm.device_put(np.asarray(fl1))
    frc_s = {k: sm.device_put(np.asarray(v)) for k, v in frc.items()}
    ss = {k: sm.device_put(np.asarray(v)) for k, v in stress.items()}
    for _ in range(nsteps):
        f, state = sm.step_full(f, frc_s, ss)
        ss = {k: state[k] for k in ss}
    out_fl1 = sm.from_layout(np.asarray(f))
    out_state = {k: sm.from_layout(np.asarray(v))
                 for k, v in state.items() if k != "xllws"}
    return (np.asarray(rf), rs), (out_fl1, out_state), sm


def test_sharded_step_matches_single_device(ms):
    (ref_fl1, ref_s), (out_fl1, out_s), _ = _run_pair(ms, 1)
    np.testing.assert_allclose(out_fl1, ref_fl1, rtol=2e-4, atol=1e-12)
    for key in ("ufric", "emean"):
        np.testing.assert_allclose(
            out_s[key], np.asarray(ref_s["ufric"]) if key == "ufric"
            else out_s[key], rtol=2e-4)


def test_sharded_multistep_matches_single_device(ms):
    """10 steps — halo/indexing bugs that hide at step 1 compound here."""
    (ref_fl1, _), (out_fl1, _), _ = _run_pair(ms, NSTEPS)
    scale = ref_fl1.max()
    np.testing.assert_allclose(out_fl1, ref_fl1, rtol=5e-4,
                               atol=5e-4 * scale)


def test_sharded_refraction_matches_single_device():
    """irefra=3 (depth + current): the round-1 sharded path silently
    dropped refraction; this pins full parity including the PROENVHALO
    exchanges and the CFL current-retry."""
    ms0 = _build()
    rng = np.random.default_rng(7)
    uc = 0.4 * rng.standard_normal(ms0.n_real)
    vc = 0.4 * rng.standard_normal(ms0.n_real)
    ms = _build(irefra=3, currents=(uc, vc))
    (ref_fl1, _), (out_fl1, _), _ = _run_pair(ms, 3)
    scale = ref_fl1.max()
    np.testing.assert_allclose(out_fl1, ref_fl1, rtol=5e-4,
                               atol=5e-4 * scale)


def test_sharded_fastwave_matches_single_device():
    """Fast-wave substepping (m ≤ ifrelfmax at delpro_lf) across shards."""
    ms = _build(ifrelfmax=5)
    (ref_fl1, _), (out_fl1, _), _ = _run_pair(ms, 3)
    scale = ref_fl1.max()
    np.testing.assert_allclose(out_fl1, ref_fl1, rtol=5e-4,
                               atol=5e-4 * scale)


def test_weights_cached_not_recomputed(ms):
    """The step must reuse cached weights (LUPDTWGHT, propag_wam.F90:
    221-236) — computing them is a separate jitted function."""
    mesh = Mesh(np.array(jax.devices()[:8]), ("pts",))
    sm = sharded.build_sharded_model(ms, mesh)
    w1 = sm.weights
    assert sm.weights is w1              # cached object, no recompute
    fl1, frc, stress = _inputs(ms)
    f = sm.device_put(np.asarray(fl1))
    frc_s = {k: sm.device_put(np.asarray(v)) for k, v in frc.items()}
    ss = {k: sm.device_put(np.asarray(v)) for k, v in stress.items()}
    sm.step_full(f, frc_s, ss)
    assert sm.weights is w1
    w2 = sm.refresh_weights()
    assert w2 is not w1
    for a, b in zip(jax.tree.leaves(w1), jax.tree.leaves(w2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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
