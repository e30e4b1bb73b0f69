"""Jitted time-step kernels: the WAMINTGR equivalent.

One advection step (/root/reference/src/ecwam/wamintgr.F90:94-186):
  - CTU propagation of the first nfre_red frequencies, with fast-wave
    sub-stepping for m < ifrelfmax (propag_wam.F90:247-313)
  - semi-implicit physics when the physics date is due

Weights are precomputed once on device (the reference caches them behind
LUPDTWGHT, propag_wam.F90:221-236).  All large arrays — weights, stencil
index tables, env fields — are passed as jit *arguments*, never closed
over: closure constants are embedded into the serialized HLO, which breaks
large grids (and bloats compile time).
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp

from ecwam_tpu.model.setup import ModelSetup
from ecwam_tpu.ops import propagation as prop
from ecwam_tpu.ops.physics import implsch as impl

ENV_KEYS = ("wavnum", "cinv", "cgroup", "xk2cg", "omosnh2kd", "stokfac",
            "depth", "emaxdpt")


def stencil_device_arrays(setup: ModelSetup) -> dict:
    """Stencil tables as device arrays (indices int32, weights model dtype)."""
    st = setup.stencil
    dt = setup.dtype
    return dict(
        klat=jnp.asarray(st.klat, jnp.int32),
        klon=jnp.asarray(st.klon, jnp.int32),
        kcor=jnp.asarray(st.kcor, jnp.int32),
        wlat=jnp.asarray(st.wlat, dt), wcor=jnp.asarray(st.wcor, dt),
        dp=jnp.asarray(st.dp, dt),
        zdello_pt=jnp.asarray(st.zdello_pt, dt),
        cosphm1_pt=jnp.asarray(st.cosphm1_pt, dt),
        tanph_pt=jnp.asarray(st.tanph_pt, dt),
        obslat=jnp.asarray(st.obslat, dt),
        obslon=jnp.asarray(st.obslon, dt),
        obscor=jnp.asarray(st.obscor, dt))


def _st_ns(st_a: dict, xdella: float) -> SimpleNamespace:
    return SimpleNamespace(xdella=xdella, **st_a)


def _with_land(f, dtype):
    return jnp.concatenate(
        [f, jnp.zeros(f.shape[:-1] + (1,), dtype)], axis=-1)


def _compute_weights(setup: ModelSetup, st, cg_ext, env=None):
    """CTUWUPDT equivalent (ctuwupdt.F90:185-215).

    With refraction (irefra>0) the θ̇/σ̇ rates come from PROPDOT; a CFL
    failure with current refraction triggers the reference's retry with
    the current terms disabled at the failing points (ctuw.F90:114-123)."""
    refr = {}
    if setup.irefra:
        nfr = setup.tb.nfre_red
        thdd, thdc, sdot = prop.propdot(
            st, setup.tb, env["wavnum_ext"][:nfr], env["cgroup_ext"][:nfr],
            env["omosnh2kd_ext"][:nfr], env["depth_ext"],
            env["ucur_ext"], env["vcur_ext"], setup.irefra)
        refr = dict(thdd=thdd, thdc=thdc, sdot=sdot,
                    omosnh2kd_ext=env["omosnh2kd_ext"][:nfr],
                    u_ext=env["ucur_ext"], v_ext=env["vcur_ext"])

    def bands(refr_):
        if setup.ifrelfmax > 0:
            w_lf = prop.ctuw_weights(
                setup.delpro_lf, st, setup.tb, cg_ext,
                mstart=0, mend=setup.ifrelfmax, irefra=setup.irefra,
                **refr_)
            w_hf = prop.ctuw_weights(
                setup.idelpro, st, setup.tb, cg_ext,
                mstart=setup.ifrelfmax, mend=setup.tb.nfre_red,
                irefra=setup.irefra, **refr_)
            return (w_lf, w_hf)
        return (prop.ctuw_weights(setup.idelpro, st, setup.tb, cg_ext,
                                  irefra=setup.irefra, **refr_),)

    w = bands(refr)
    if setup.irefra in (2, 3):
        fail = w[0]["cflfail"]
        for wb in w[1:]:
            fail = fail | wb["cflfail"]
        curmask = 1.0 - fail.astype(cg_ext.dtype)
        refr2 = dict(refr, thdc=refr["thdc"] * curmask[None, :],
                     sdot=refr["sdot"] * curmask[None, None, :])
        w = bands(refr2)
    return w


def propagate(setup: ModelSetup, weights, fl1, st):
    """One full advection step over all sub-bands (propag_wam.F90:240-330).

    Only the first nfre_red frequencies advect (SURVEY §5.6: physics
    integrates all NFRE, advection only NFRE_RED)."""
    nfre_red = setup.tb.nfre_red
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
    """Build jitted step functions.

    Returns (step_full, step_adv, step_phys); each takes only the dynamic
    state — weights/stencil/env ride along as bound jit arguments.
    """
    st_arrays = stencil_device_arrays(setup)
    xdella = setup.stencil.xdella
    env = {k: setup.env[k] for k in ENV_KEYS}
    cg_ext = setup.env["cgroup_ext"][: setup.tb.nfre_red]
    wenv_keys = ("wavnum_ext", "cgroup_ext", "omosnh2kd_ext", "depth_ext",
                 "ucur_ext", "vcur_ext")
    wenv = {k: setup.env[k] for k in wenv_keys if k in setup.env}

    @jax.jit
    def compute_weights(st_a, cg_ext, wenv):
        return _compute_weights(setup, _st_ns(st_a, xdella), cg_ext, wenv)

    weights = compute_weights(st_arrays, cg_ext, wenv)

    @jax.jit
    def _adv(fl1, weights, st_a):
        return propagate(setup, weights, fl1, _st_ns(st_a, xdella))

    @jax.jit
    def _full(fl1, frc, stress, weights, st_a, env):
        fl1 = propagate(setup, weights, fl1, _st_ns(st_a, xdella))
        return impl.implsch(setup.phys, fl1, env, frc, **stress)

    @jax.jit
    def _phys(fl1, frc, stress, env):
        return impl.implsch(setup.phys, fl1, env, frc, **stress)

    def step_full(fl1, frc, stress):
        return _full(fl1, frc, stress, weights, st_arrays, env)

    def step_adv(fl1):
        return _adv(fl1, weights, st_arrays)

    def step_phys(fl1, frc, stress):
        return _phys(fl1, frc, stress, env)

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
