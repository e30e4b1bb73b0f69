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
            # with σ̇ shifting the sub-band weights carry one extra
            # frequency for the band-edge m+1 read (propag_wam.F90:262)
            mw = (setup.ifrelfmax + 1 if setup.irefra in (2, 3)
                  else setup.ifrelfmax)
            w_lf = prop.ctuw_weights(
                setup.delpro_lf, st, setup.tb, cg_ext,
                mstart=0, mend=mw, irefra=setup.irefra, **refr_)
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
        mlf = setup.ifrelfmax
        mw = mlf + 1 if setup.irefra in (2, 3) else mlf
        hf = prop.propags2(
            _with_land(fl1[:, mlf:nfre_red], fl1.dtype), w_hf, st, tb)
        lf_win = fl1[:, :mw]
        for _ in range(nsub):
            lf = prop.propags2(_with_land(lf_win, fl1.dtype), w_lf,
                               st, tb)[:, :mlf]
            if mw > mlf:
                # band-edge extra frequency: the once-advected high-band
                # value (propag_wam.F90:276-283 FL1=FL3 copy)
                lf_win = jnp.concatenate([lf, hf[:, :1]], axis=1)
            else:
                lf_win = lf
        out = jnp.concatenate([lf, hf], axis=1)
    else:
        (w,) = weights
        out = prop.propags2(
            _with_land(fl1[:, :nfre_red], fl1.dtype), w, st, tb)
    if nfre_red < setup.tb.nfre:
        out = jnp.concatenate([out, fl1[:, nfre_red:]], axis=1)
    return out


def _otf_blocks(setup: ModelSetup):
    """Frequency-block windows [(mstart, mend, delpro, nsub), ...] that never
    straddle the fast-wave band boundary."""
    nfre_red = setup.tb.nfre_red
    bs = max(1, setup.otf_block)
    nsub = (max(1, round(setup.idelpro / setup.delpro_lf))
            if setup.ifrelfmax > 0 else 1)
    blocks = []
    for lo, hi, dtp, ns in (((0, setup.ifrelfmax, setup.delpro_lf, nsub),)
                            if setup.ifrelfmax > 0 else ()) + \
            ((setup.ifrelfmax, nfre_red, setup.idelpro, 1),):
        m = lo
        while m < hi:
            blocks.append((m, min(m + bs, hi), dtp, ns))
            m += bs
    return blocks


def propagate_otf(setup: ModelSetup, fl1, st, cg_ext, wenv):
    """Advection with ON-THE-FLY weights per frequency block.

    The memory-scalable variant (propags1.F90 computes fluxes on the fly
    instead of caching them): dense CTU weights (~17 floats/bin) never
    materialize beyond ``otf_block`` frequencies, so an O1280-shaped shard
    fits in HBM at the cost of recomputing the weights each step.
    """
    tb = setup.tb
    nfre_red = tb.nfre_red
    refr = {}
    if setup.irefra:
        thdd, thdc, sdot = prop.propdot(
            st, tb, wenv["wavnum_ext"][:nfre_red],
            wenv["cgroup_ext"][:nfre_red],
            wenv["omosnh2kd_ext"][:nfre_red], wenv["depth_ext"],
            wenv["ucur_ext"], wenv["vcur_ext"], setup.irefra)
        refr = dict(thdd=thdd, thdc=thdc, sdot=sdot,
                    omosnh2kd_ext=wenv["omosnh2kd_ext"][:nfre_red],
                    u_ext=wenv["ucur_ext"], v_ext=wenv["vcur_ext"])
    blocks = _otf_blocks(setup)

    def wgt(mstart, mend, dtp, refr_):
        return prop.ctuw_weights(
            dtp, st, tb, cg_ext, mstart=mstart, mend=mend,
            irefra=setup.irefra, **refr_)

    if setup.irefra in (2, 3):
        # CFL current-retry needs the global failure mask first
        fail = None
        for (m0, m1, dtp, _) in blocks:
            f = wgt(m0, m1, dtp, refr)["cflfail"]
            fail = f if fail is None else (fail | f)
        curmask = 1.0 - fail.astype(cg_ext.dtype)
        refr = dict(refr, thdc=refr["thdc"] * curmask[None, :],
                    sdot=refr["sdot"] * curmask[None, None, :])

    # σ̇ frequency shifting (irefra 2/3) couples m±1: blocks then need a
    # one-frequency overlap so the shift stencil sees its true neighbours
    shift = setup.irefra in (2, 3)
    outs = []
    for (m0, m1, dtp, nsub) in blocks:
        e0 = max(0, m0 - 1) if shift else m0
        e1 = min(nfre_red, m1 + 1) if shift else m1
        w = wgt(e0, e1, dtp, refr)
        f = fl1[:, e0:e1]
        for _ in range(nsub):
            f = prop.propags2(_with_land(f, fl1.dtype), w, st, tb)
        outs.append(f[:, m0 - e0: m0 - e0 + (m1 - m0)])
    if nfre_red < tb.nfre:
        outs.append(fl1[:, nfre_red:])
    return jnp.concatenate(outs, axis=1)


def _chunked_implsch(setup: ModelSetup, fl1, env, frc, stress):
    """NPROMA-style physics chunking (mchunk.F90:44-45): lax.map over
    point chunks bounds the source-term intermediates to chunk size."""
    C = setup.phys_chunk
    n = fl1.shape[-1]
    if not C or n % C != 0 or n == C:
        return impl.implsch(setup.phys, fl1, env, frc, **stress)
    nch = n // C

    def split(a):
        a = jnp.asarray(a)
        return jnp.moveaxis(a.reshape(a.shape[:-1] + (nch, C)), -2, 0)

    def join(a):
        a = jnp.moveaxis(a, 0, -2)
        return a.reshape(a.shape[:-2] + (n,))

    xs = (split(fl1), jax.tree.map(split, env),
          jax.tree.map(split, frc), jax.tree.map(split, stress))

    def body(args):
        f, e, fr, srx = args
        return impl.implsch(setup.phys, f, e, fr, **srx)

    f_out, state = jax.lax.map(body, xs)
    return join(f_out), jax.tree.map(join, state)


class StepBundle:
    """The three jitted step functions + the GETCURR/LUPDTWGHT hook.

    Unpacks like the historical 3-tuple:
        step_full, step_adv, step_phys = make_step(setup)
    and additionally exposes ``refresh_currents(uc, vc)`` which installs
    new (n_pad,) surface currents and re-derives the cached CTU weights
    (getcurr.F90 → LUPDTWGHT → CTUWUPDT; in OTF mode the weights are
    recomputed every step so only the env updates).
    """

    def __init__(self, step_full, step_adv, step_phys, refresh_currents,
                 cfl_diagnostics=None):
        self.step_full = step_full
        self.step_adv = step_adv
        self.step_phys = step_phys
        self.refresh_currents = refresh_currents
        # CHECKCFL-role diagnostics hook (fused mode), else None
        self.cfl_diagnostics = cfl_diagnostics

    def __iter__(self):
        return iter((self.step_full, self.step_adv, self.step_phys))


def make_step(setup: ModelSetup):
    """Build jitted step functions.

    Returns a StepBundle (unpacks to step_full, step_adv, step_phys);
    each takes only the dynamic state — weights/stencil/env ride along as
    bound jit arguments.
    """
    st_arrays = stencil_device_arrays(setup)
    xdella = setup.stencil.xdella
    env = {k: setup.env[k] for k in ENV_KEYS}
    cg_ext = setup.env["cgroup_ext"][: setup.tb.nfre_red]
    wenv_keys = ("wavnum_ext", "cgroup_ext", "omosnh2kd_ext", "depth_ext",
                 "ucur_ext", "vcur_ext")
    wenv = {k: setup.env[k] for k in wenv_keys if k in setup.env}

    if setup.weights_mode == "fused":
        from ecwam_tpu.model import fusedstep
        fp = fusedstep.FusedPropagation(setup)

        @jax.jit
        def _adv_f(fl1, bundle):
            with jax.named_scope("propag_fused"):
                return fp.advect(fl1, bundle)

        @jax.jit
        def _full_f(fl1, frc, stress, bundle, env):
            with jax.named_scope("propag_fused"):
                fl1 = fp.advect(fl1, bundle)
            with jax.named_scope("physics"):
                return _chunked_implsch(setup, fl1, env, frc, stress)

        @jax.jit
        def _phys_f(fl1, frc, stress, env):
            with jax.named_scope("physics"):
                return _chunked_implsch(setup, fl1, env, frc, stress)

        def step_full(fl1, frc, stress):
            return _full_f(fl1, frc, stress, fp.bundle, env)

        def step_adv(fl1):
            return _adv_f(fl1, fp.bundle)

        def step_phys(fl1, frc, stress):
            return _phys_f(fl1, frc, stress, env)

        def refresh_currents(uc, vc):
            fp.refresh(np.asarray(uc), np.asarray(vc))

        return StepBundle(step_full, step_adv, step_phys,
                          refresh_currents,
                          cfl_diagnostics=fp.cfl_diagnostics)

    if setup.weights_mode == "otf":
        @jax.jit
        def _adv_otf(fl1, st_a, cg_ext, wenv):
            with jax.named_scope("propag_otf"):
                return propagate_otf(setup, fl1, _st_ns(st_a, xdella),
                                     cg_ext, wenv)

        @jax.jit
        def _full_otf(fl1, frc, stress, st_a, cg_ext, wenv, env):
            with jax.named_scope("propag_otf"):
                fl1 = propagate_otf(setup, fl1, _st_ns(st_a, xdella),
                                    cg_ext, wenv)
            with jax.named_scope("physics"):
                return _chunked_implsch(setup, fl1, env, frc, stress)

        @jax.jit
        def _phys(fl1, frc, stress, env):
            with jax.named_scope("physics"):
                return _chunked_implsch(setup, fl1, env, frc, stress)

        def step_full(fl1, frc, stress):
            return _full_otf(fl1, frc, stress, st_arrays, cg_ext, wenv,
                             env)

        def step_adv(fl1):
            return _adv_otf(fl1, st_arrays, cg_ext, wenv)

        def step_phys(fl1, frc, stress):
            return _phys(fl1, frc, stress, env)

        def refresh_currents(uc, vc):
            dt_ = setup.dtype
            uce = jnp.concatenate([jnp.asarray(uc, dt_),
                                   jnp.zeros(1, dt_)])
            vce = jnp.concatenate([jnp.asarray(vc, dt_),
                                   jnp.zeros(1, dt_)])
            wenv.update(ucur_ext=uce, vcur_ext=vce)

        return StepBundle(step_full, step_adv, step_phys,
                          refresh_currents)

    @jax.jit
    def compute_weights(st_a, cg_ext, wenv):
        return _compute_weights(setup, _st_ns(st_a, xdella), cg_ext, wenv)

    cache = {"weights": compute_weights(st_arrays, cg_ext, wenv)}

    @jax.jit
    def _adv(fl1, weights, st_a):
        with jax.named_scope("propag"):
            return propagate(setup, weights, fl1, _st_ns(st_a, xdella))

    @jax.jit
    def _full(fl1, frc, stress, weights, st_a, env):
        with jax.named_scope("propag"):
            fl1 = propagate(setup, weights, fl1, _st_ns(st_a, xdella))
        with jax.named_scope("physics"):
            return _chunked_implsch(setup, fl1, env, frc, stress)

    @jax.jit
    def _phys(fl1, frc, stress, env):
        with jax.named_scope("physics"):
            return _chunked_implsch(setup, fl1, env, frc, stress)

    def step_full(fl1, frc, stress):
        return _full(fl1, frc, stress, cache["weights"], st_arrays, env)

    def step_adv(fl1):
        return _adv(fl1, cache["weights"], st_arrays)

    def step_phys(fl1, frc, stress):
        return _phys(fl1, frc, stress, env)

    def refresh_currents(uc, vc):
        dt_ = setup.dtype
        uce = jnp.concatenate([jnp.asarray(uc, dt_), jnp.zeros(1, dt_)])
        vce = jnp.concatenate([jnp.asarray(vc, dt_), jnp.zeros(1, dt_)])
        wenv.update(ucur_ext=uce, vcur_ext=vce)
        cache["weights"] = compute_weights(st_arrays, cg_ext, wenv)

    return StepBundle(step_full, step_adv, step_phys, refresh_currents)


def initial_stress(setup: ModelSetup, frc):
    """First-guess stress state before the first physics call: the
    BUILDSTRESS no-restart path (buildstress.F90:236-242) — CDUSTARZ0's
    Hersbach-2011 CD(U10) (cdustarz0.F90:68-72) with TAUW = 0.1·u*² and
    TAUWDIR = the wind direction."""
    from ecwam_tpu.core import constants as c
    from ecwam_tpu.core import physparams as pp

    # computed in numpy with single device pushes: on a relay-attached
    # accelerator every eager device op costs a remote compile
    dt = setup.dtype
    wspmin = 1.0                       # userin.F90:917 default
    u10 = np.maximum(np.asarray(frc["wswave"], np.float64), wspmin)
    cd = np.minimum((c.C1CD + c.C2CD * u10**c.P1CD) * u10**c.P2CD,
                    c.CDMAX)
    ustar = np.maximum(np.sqrt(cd) * u10, c.EPSUS)
    z0 = np.maximum(
        pp.XNLEV / (np.exp(pp.XKAPPA
                           * np.minimum(u10 / ustar, 100.0)) - 1.0),
        1.0e-6)
    return dict(ufric=jnp.asarray(ustar, dt),
                tauw=jnp.asarray(0.1 * ustar**2, dt),
                tauwdir=jnp.asarray(frc["wdwave"], dt),
                z0m=jnp.asarray(z0, dt),
                z0b=jnp.zeros(u10.shape[0], dt),
                chrnck=jnp.asarray(
                    np.maximum(c.G * z0 / ustar**2,
                               setup.phys.params.alpha), dt))
