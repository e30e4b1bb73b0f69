"""Pallas fused kernel vs the XLA fused formulation (interpret mode).

Runs the TPU kernel through the Pallas interpreter on CPU and checks it
reproduces ops/propagation_fused.advect_xla bit-for-bit-ish (f32) across
the feature matrix.  On real TPU hardware the same kernel is selected
automatically (fusedstep.default_backend).
"""

import numpy as np
import jax.numpy as jnp

from ecwam_tpu.model import setup as setup_mod
from ecwam_tpu.model import preset
from ecwam_tpu.model.fusedstep import FusedPropagation


def _build(**kw):
    base = dict(grid_name="6.0", nang=12, nfre=25, idelpro=900.0,
                idelt=900.0, pad_to=64, dtype=jnp.float32,
                weights_mode="fused")
    base.update(kw)
    return setup_mod.build_model(**base)


def _spectrum(ms, seed=0):
    rng = np.random.default_rng(seed)
    n = ms.n_pad
    wswave = 6.0 + 6.0 * rng.random(n)
    wdwave = rng.random(n) * 2.0 * np.pi
    return jnp.asarray(preset.mstart(ms.tb, wswave, wdwave), ms.dtype)


def _compare(ms, rtol=2e-6):
    f = _spectrum(ms)
    fx = FusedPropagation(ms, backend="xla")
    fk = FusedPropagation(ms, backend="pallas", interpret=True)
    ax = fx.advect(f, fx.bundle)
    ak = fk.advect(f, fk.bundle)
    a = np.asarray(ax)[..., : ms.n_real]
    b = np.asarray(ak)[..., : ms.n_real]
    np.testing.assert_allclose(b, a, rtol=rtol, atol=1e-8)


def test_pallas_matches_xla_basic():
    _compare(_build())


def test_pallas_matches_xla_fast_waves():
    _compare(_build(delpro_lf=450.0, ifrelfmax=5))


def test_pallas_matches_xla_depth_refraction():
    from ecwam_tpu.core.grid import regular_grid
    grid = regular_grid(6.0)
    bathy = np.full((grid.ngy, grid.ngx), -999.0)
    lats = np.linspace(0, np.pi, grid.ngy)[:, None]
    lons = np.linspace(0, 2 * np.pi, grid.ngx)[None, :]
    depth = 200.0 + 150.0 * np.sin(3 * lats) * np.cos(2 * lons)
    for k in range(1, grid.ngy - 1):
        bathy[k, : grid.nlonrgg[k]] = depth[k, : grid.nlonrgg[k]]
    _compare(_build(grid=grid, grid_name=None, bathy=bathy, irefra=1))


def test_pallas_matches_xla_currents():
    ms_probe = _build()
    rng = np.random.default_rng(7)
    n = ms_probe.n_real
    uc = 0.4 * (rng.random(n) - 0.5)
    vc = 0.4 * (rng.random(n) - 0.5)
    _compare(_build(irefra=3, currents=(uc, vc)), rtol=5e-6)
