"""Jitted time-step kernels: the WAMINTGR equivalent.

One advection step (/root/reference/src/ecwam/wamintgr.F90:94-186):
  - CTU propagation of the first nfre_red frequencies, with fast-wave
    sub-stepping for m < ifrelfmax (propag_wam.F90:247-313)
  - semi-implicit physics when the physics date is due

Weights are precomputed once (depth/current independent runs) exactly as the
reference caches them behind LUPDTWGHT (propag_wam.F90:221-236).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ecwam_tpu.model.setup import ModelSetup
from ecwam_tpu.ops import propagation as prop
from ecwam_tpu.ops.physics import implsch as impl


def make_weights(setup: ModelSetup):
    """CTUWUPDT equivalent: weights for the main band and, if configured,
    the fast-wave band (ctuwupdt.F90:185-215)."""
    cg_ext = setup.env["cgroup_ext"][: setup.tb.nfre_red]
    if setup.ifrelfmax > 0:
        w_lf = prop.ctuw_weights(
            setup.delpro_lf, setup.stencil, setup.tb, cg_ext,
            mstart=0, mend=setup.ifrelfmax, irefra=setup.irefra)
        w_hf = prop.ctuw_weights(
            setup.idelpro, setup.stencil, setup.tb, cg_ext,
            mstart=setup.ifrelfmax, mend=setup.tb.nfre_red,
            irefra=setup.irefra)
        return (w_lf, w_hf)
    w = prop.ctuw_weights(setup.idelpro, setup.stencil, setup.tb, cg_ext,
                          irefra=setup.irefra)
    return (w,)


def _with_land(f, dtype):
    return jnp.concatenate(
        [f, jnp.zeros(f.shape[:-1] + (1,), dtype)], axis=-1)


def propagate(setup: ModelSetup, weights, fl1):
    """One full advection step over all sub-bands (propag_wam.F90:240-330).

    ``fl1`` is (nang, nfre, n_pad); only the first nfre_red frequencies
    advect (see SURVEY §5.6: physics integrates all NFRE, advection only
    NFRE_RED).
    """
    nfre_red = setup.tb.nfre_red
    st = setup.stencil
    tb = setup.tb
    if setup.ifrelfmax > 0:
        w_lf, w_hf = weights
        nsub = max(1, round(setup.idelpro / setup.delpro_lf))
        lf = fl1[:, : setup.ifrelfmax]
        for _ in range(nsub):
            lf = prop.propags2(_with_land(lf, fl1.dtype), w_lf, st, tb)
        hf = prop.propags2(
            _with_land(fl1[:, setup.ifrelfmax:nfre_red], fl1.dtype),
            w_hf, st, tb)
        out = jnp.concatenate([lf, hf], axis=1)
    else:
        (w,) = weights
        out = prop.propags2(
            _with_land(fl1[:, :nfre_red], fl1.dtype), w, st, tb)
    if nfre_red < setup.tb.nfre:
        out = jnp.concatenate([out, fl1[:, nfre_red:]], axis=1)
    return out


def make_step(setup: ModelSetup):
    """Build the jitted step functions.

    Returns (step_full, step_adv):
      step_full(fl1, frc, stress) → (fl1, state)   advection + physics
      step_adv(fl1)               → fl1            advection only
    """
    weights = make_weights(setup)

    @jax.jit
    def step_adv(fl1):
        return propagate(setup, weights, fl1)

    @jax.jit
    def step_full(fl1, frc, stress):
        fl1 = propagate(setup, weights, fl1)
        fl1, state = impl.implsch(setup.phys, fl1, setup.env, frc, **stress)
        return fl1, state

    @jax.jit
    def step_phys(fl1, frc, stress):
        fl1, state = impl.implsch(setup.phys, fl1, setup.env, frc, **stress)
        return fl1, state

    return step_full, step_adv, step_phys


def initial_stress(setup: ModelSetup, frc):
    """First-guess stress state before the first physics call
    (the role of BUILDSTRESS when no LAW restart exists)."""
    dt = setup.dtype
    u10 = frc["wswave"]
    cd = jnp.minimum(8.0e-4 + 8.0e-5 * u10, 0.0025)
    ustar = u10 * jnp.sqrt(cd)
    z0 = jnp.maximum(0.0065 / 9.806 * ustar**2, 1.0e-6).astype(dt)
    zeros = jnp.zeros_like(u10)
    return dict(ufric=ustar.astype(dt), tauw=zeros, tauwdir=zeros,
                z0m=z0, z0b=zeros, chrnck=jnp.full_like(u10, 0.018))
