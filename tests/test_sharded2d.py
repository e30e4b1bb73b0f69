"""2-D patch decomposition: NPROC-invariance vs the single-device step.

The reference's 2-D MPDECOMP (mpdecomp.F90, LL1D=.FALSE.) splits the grid
into latitude-band × within-row patches; results must be independent of
the decomposition.  Here: a 2×4 patch layout on 8 virtual CPU devices vs
the single-device step, including refraction and fast-wave substepping,
plus structural checks on the gather-based exchange tables.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from ecwam_tpu.model import setup as setup_mod
from ecwam_tpu.model import stepper as stepper_mod
from ecwam_tpu.model import preset
from ecwam_tpu.parallel import decomp2d, sharded

LAYOUT = (2, 4)


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


def test_patch_layout_structure(ms):
    """Bijection + every stencil reference resolves inside the 8-torus."""
    ss = decomp2d.build_sharded2d_stencil(
        ms.stencil, *LAYOUT, row_start=np.asarray(ms.blk.row_start))
    real = ss.perm[ss.perm >= 0]
    assert np.array_equal(np.sort(real), np.arange(ms.n_pad))
    idx = np.arange(ms.n_pad)
    assert np.array_equal(ss.perm[ss.g2l[idx]], idx)
    # all local indices within the ext layout
    for tab in (ss.klat, ss.klon, ss.kcor):
        assert tab.min() >= 0 and tab.max() <= ss.nland_local
    # each direction's permutation is injective on sources and dests
    for pairs in ss.perm_pairs:
        src = [p[0] for p in pairs]
        dst = [p[1] for p in pairs]
        assert len(set(src)) == len(src) and len(set(dst)) == len(dst)


def test_patch_halo_is_perimeter_scaled(ms):
    """2-D patch exchange volume must undercut the 1-D slab halo: the
    whole point of the reference's 2-D mode (O(perimeter) vs O(row))."""
    from ecwam_tpu.parallel import decomp
    ss2 = decomp2d.build_sharded2d_stencil(
        ms.stencil, *LAYOUT, row_start=np.asarray(ms.blk.row_start))
    ss1 = decomp.build_sharded_stencil(
        ms.stencil, 8, row_start=np.asarray(ms.blk.row_start))
    assert sum(ss2.recv_sizes) < 2 * ss1.halo


def _run_pair(ms, nsteps, seed=42):
    fl1, frc, stress = _inputs(ms, seed)

    step_full, _, _ = stepper_mod.make_step(ms)
    rf, rs = fl1, dict(stress)
    for _ in range(nsteps):
        rf, state = step_full(rf, frc, rs)
        rs = {k: state[k] for k in rs}

    mesh = Mesh(np.array(jax.devices()[:8]), ("pts",))
    sm = sharded.build_sharded_model(ms, mesh, layout2d=LAYOUT)
    f = sm.device_put(np.asarray(fl1))
    frc_s = {k: sm.device_put(np.asarray(v)) for k, v in frc.items()}
    ss = {k: sm.device_put(np.asarray(v)) for k, v in stress.items()}
    for _ in range(nsteps):
        f, state = sm.step_full(f, frc_s, ss)
        ss = {k: state[k] for k in ss}
    out_fl1 = sm.from_layout(np.asarray(f))
    return np.asarray(rf), out_fl1


def test_2d_step_matches_single_device(ms):
    ref, out = _run_pair(ms, 1)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-12)


def test_2d_multistep_matches_single_device(ms):
    ref, out = _run_pair(ms, 10)
    scale = ref.max()
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4 * scale)


def test_2d_refraction_matches_single_device():
    ms0 = _build()
    rng = np.random.default_rng(7)
    uc = 0.4 * rng.standard_normal(ms0.n_real)
    vc = 0.4 * rng.standard_normal(ms0.n_real)
    ms = _build(irefra=3, currents=(uc, vc))
    ref, out = _run_pair(ms, 3)
    scale = ref.max()
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4 * scale)


def test_2d_fastwave_matches_single_device():
    ms = _build(ifrelfmax=5)
    ref, out = _run_pair(ms, 3)
    scale = ref.max()
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4 * scale)
