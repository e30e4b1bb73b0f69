"""Air-sea momentum closure: friction velocity / roughness length.

JAX re-derivations (vectorized over the point axis) of:
  - CHNKMIN    minimum Charnock vs wind       (/root/reference/src/ecwam/chnkmin.F90:28)
  - Z0WAVE     z0 from u* and tauw            (z0wave.F90:40-60)
  - TAUT_Z0    Newton solve for u*, z0 given U10 and wave stress
               (taut_z0.F90:25-360; the default non-LLGCBZ0 branch)
  - AIRSEA     dispatch by wind-forcing code  (airsea.F90:44-70)
  - WSIGSTAR   gustiness std dev of u*        (wsigstar.F90:48-86)

All arrays are shape (npts,).  Newton iterations run the reference's fixed
NITER=18 steps; the loop body is idempotent at the fixed point so skipping
the reference's early-exit does not change converged results.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.ops.physics import kernelmode


def _niter_loop(body, init):
    """NITER fixed-trip loop; unrolled inside Pallas kernels — Mosaic's
    scf.for adds per-iteration overhead comparable to the tiny per-point
    vector work of the Newton body."""
    if kernelmode.PALLAS_SAFE:
        carry = init
        for i in range(NITER):
            carry = body(i, carry)
        return carry
    return jax.lax.fori_loop(0, NITER, body, init)

EPS1 = 0.00001            # tauw/u*² margin (yowtabl.F90:34)
NITER = 18
WSPMIN_DEFAULT = 1.0      # standalone minimum wind speed (userin.F90:917)


def chnkmin(u10, params: pp.PhysParams):
    """Minimum Charnock parameter for very high winds (chnkmin.F90:28)."""
    return params.alphamin + (params.alpha - params.alphamin) * 0.5 * (
        1.0 - jnp.tanh(u10 - params.chnkmin_u))


def z0wave(us, tauw, u10, params: pp.PhysParams):
    """Roughness length from u* and wave stress (z0wave.F90:40-60).

    Returns (z0, z0b, chrnck).
    """
    if params.llcapchnk:
        alphaog = chnkmin(u10, params) * c.GM1
    else:
        alphaog = params.alpha * c.GM1
    ust2 = us**2
    arg = jnp.maximum(ust2 - tauw, EPS1)
    z0 = alphaog * us**3 / jnp.sqrt(arg)
    z0b = alphaog * ust2
    chrnck = c.G * z0 / ust2
    return z0, z0b, chrnck


def _cdm(u):
    """Empirical neutral drag curve CDM (taut_z0 cdm.func.h)."""
    return jnp.maximum(
        jnp.minimum(0.0006 + 0.00008 * u,
                    0.001 + 0.0018 * jnp.exp(-0.05 * (u - 33.0))), 0.001)


def taut_z0_gc(utop, udir, tauw, tauwdir, ustar_guess, halp, rnfac,
               params: pp.PhysParams, *, iusfg: int = 0, gct=None):
    """LLGCBZ0 branch of the stress solve (taut_z0.F90:146-281).

    The total stress balance  u*² = tauw_eff + tau_visc + tau_gc  is solved
    by under-relaxed fixed-point iteration with the gravity-capillary stress
    from STRESS_GC, then z0/Charnock by a Newton iteration on the log
    profile.  The reference's per-point early exits become convergence
    masks; 'no convergence after NITER' fallbacks are applied per point.

    Returns (ustar, z0, z0b, chrnck).
    """
    from ecwam_tpu.ops.physics import gc as gc_mod
    if gct is None:
        gct = gc_mod.gc_tables()
    dt = utop.dtype
    z0min = 1.0e-6
    pmax = 0.99
    pce_gc = 0.001 if iusfg == 1 else 0.005
    rnukappam1 = 0.04 * pp.RNU / pp.XKAPPA
    epsus = jnp.asarray(c.EPSUS, dt)

    cosdiff = jnp.cos(udir - tauwdir)
    tauwact = jnp.maximum(tauw * cosdiff, jnp.asarray(c.EPSMIN, dt))
    llcosdiff = cosdiff > 0.9

    if params.llcapchnk:
        alphaog = chnkmin(utop, params) * c.GM1
    else:
        alphaog = jnp.zeros_like(utop)

    usmax = jnp.maximum(
        -0.21339 + utop * (0.093698 + utop * (-0.0020944 + 5.5091e-5 * utop)),
        0.03)
    tauweff = jnp.minimum(tauwact * (1.0 + EPS1), usmax**2)

    if iusfg == 0:
        # first-guess drag coefficient (taut_z0.F90:163-180)
        x = jnp.minimum(tauwact / jnp.maximum(ustar_guess, epsus)**2, pmax)
        zchar = jnp.minimum(
            params.alpha * c.GM1 * ustar_guess**2 / jnp.sqrt(1.0 - x),
            0.05 * jnp.exp(-0.05 * (utop - 35.0)))
        zchar = jnp.minimum(zchar, pp.ALPHAMAX)
        cdfg = jnp.where(
            utop < 1.0, 0.002,
            jnp.where(llcosdiff,
                      c.ACDLIN + c.BCDLIN * jnp.sqrt(zchar) * utop,
                      _cdm(utop)))
        ustar = utop * jnp.sqrt(cdfg)
    else:
        ustar = ustar_guess

    w1 = 0.85 - 0.05 * (jnp.tanh(10.0 * (utop - 5.0)) + 1.0)
    xkutop = pp.XKAPPA * utop

    def body1(_, carry):
        # ``done`` is a 0/1 float: Mosaic cannot legalize loops with i1
        # vector carries, and the kernel path unrolls anyway
        ustold, tauold, ust, z0c, tauunr, done = carry
        z0n = jnp.maximum(
            pp.XNLEV / (jnp.exp(jnp.minimum(xkutop / ustold, 50.0)) - 1.0),
            z0min)
        tauv = rnukappam1 * ustold / z0n
        ang = (params.ang_gc_a
               + params.ang_gc_b * jnp.tanh(params.ang_gc_c * tauold))
        tauunr_n = gc_mod.stress_gc(
            ang, ustold, z0n, z0min, halp, rnfac, gct, params)
        taunew = tauweff + tauv + tauunr_n
        ustmix = w1 * ustold + (1.0 - w1) * jnp.sqrt(taunew)
        done_new = jnp.maximum(
            done,
            (jnp.abs(ustmix - ustold) < pce_gc * ustmix).astype(done.dtype))
        ust = jnp.where(done > 0.5, ust, ustmix)
        z0c = jnp.where(done > 0.5, z0c, z0n)
        tauunr = jnp.where(done > 0.5, tauunr, tauunr_n)
        tauold = jnp.where(done_new > 0.5, tauold, ustmix**2)
        ustold = jnp.where(done_new > 0.5, ustold, ustmix)
        return ustold, tauold, ust, z0c, tauunr, done_new

    init1 = (ustar, ustar**2, ustar, jnp.zeros_like(ustar),
             jnp.zeros_like(ustar), jnp.zeros_like(ustar))
    _, tauold1, ustar, z0raw, tauunr, conv1f = _niter_loop(body1, init1)
    conv1 = conv1f > 0.5

    x1 = tauweff / tauold1
    fallback = (~conv1) & (x1 >= pmax)
    ust_fb = utop * jnp.sqrt(_cdm(utop))
    z0minrst = ust_fb**2 * params.alpha * c.GM1
    z0_fb = jnp.maximum(
        pp.XNLEV / (jnp.exp(jnp.minimum(xkutop / ust_fb, 50.0)) - 1.0),
        z0minrst)
    z0_ok = jnp.maximum(
        pp.XNLEV / (jnp.exp(jnp.minimum(xkutop / ustar, 50.0)) - 1.0), z0min)
    z0b_ok = z0_ok * jnp.sqrt(tauunr / tauold1)
    ustar = jnp.where(fallback, ust_fb, ustar)
    z0 = jnp.where(fallback, z0_fb, z0_ok)
    z0b = jnp.where(fallback, z0minrst, z0b_ok)

    # --- second stage: Newton solve for z0/Charnock where x1 < pmax
    usnrf, z0nrf, z0bnrf = ustar, z0, z0b
    tau0 = jnp.maximum(ustar**2, tauweff)
    alpog = jnp.maximum(jnp.minimum(z0b / tau0, pp.ALPHAMAX), alphaog)

    def body2(_, carry):
        ustold, tauold, ust, z0c, z0bc, xk, done = carry
        x = jnp.minimum(tauweff / tauold, pmax)
        ustm1 = 1.0 / jnp.maximum(ustold, epsus)
        z0vis = pp.RNUM * ustm1
        h = 0.5 * z0vis / (1.0 - x)
        z0b_n = alpog * tauold
        z0_n = h + jnp.sqrt(h**2 + z0b_n**2 / (1.0 - x))
        xologz0 = 1.0 / jnp.log(pp.XNLEV / z0_n + 1.0)
        f = ustold - xkutop * xologz0
        zz = (2.0 * ustm1 * (3.0 * z0b_n**2 + 0.5 * z0vis * z0_n - z0_n**2)
              / (2.0 * z0_n**2 * (1.0 - x) - z0vis * z0_n))
        delf = 1.0 - xkutop * xologz0**2 * zz
        ust_n = jnp.where(delf != 0.0, ustold - f / delf, ustold)
        taunew = jnp.maximum(ust_n**2, tauweff)
        ust_n = jnp.sqrt(taunew)
        done_new = jnp.maximum(
            done,
            (jnp.abs(taunew - tauold) < pce_gc * tauold).astype(done.dtype))
        ust = jnp.where(done > 0.5, ust, ust_n)
        z0c = jnp.where(done > 0.5, z0c, z0_n)
        z0bc = jnp.where(done > 0.5, z0bc, z0b_n)
        xk = jnp.where(done > 0.5, xk, x)
        tauold = jnp.where(done_new > 0.5, tauold, taunew)
        ustold = jnp.where(done_new > 0.5, ustold, ust_n)
        return ustold, tauold, ust, z0c, z0bc, xk, done_new

    init2 = (ustar, tau0, ustar, z0, z0b, jnp.zeros_like(ustar),
             jnp.zeros_like(ustar))
    _, _, ust2, z02, z0b2, x2, conv2f = _niter_loop(body2, init2)
    conv2 = conv2f > 0.5

    # no-convergence restore (taut_z0.F90:266-273)
    ust2 = jnp.where(conv2, ust2, usnrf)
    z02 = jnp.where(conv2, z02, z0nrf)
    z0b2 = jnp.where(conv2, z0b2, z0bnrf)
    ustm1_2 = 1.0 / jnp.maximum(ust2, epsus)
    chrnck_nc = jnp.maximum(
        c.G * (z02 - pp.RNUM * ustm1_2) * ustm1_2**2, params.alphamin)
    chrnck_c = jnp.maximum(
        c.G * (z0b2 / jnp.sqrt(1.0 - x2)) * ustm1_2**2, params.alphamin)
    chrnck2 = jnp.where(conv2, chrnck_c, chrnck_nc)

    # x1 >= pmax points skip the second stage (taut_z0.F90:278-281)
    second = x1 < pmax
    ustm1_1 = 1.0 / jnp.maximum(ustar, epsus)
    chrnck1 = jnp.maximum(
        c.G * (z0 - pp.RNUM * ustm1_1) * ustm1_1**2, params.alphamin)
    ustar = jnp.where(second, ust2, ustar)
    z0 = jnp.where(second, z02, z0)
    z0b = jnp.where(second, z0b2, z0b)
    chrnck = jnp.where(second, chrnck2, chrnck1)
    return ustar, z0, z0b, chrnck


def taut_z0(utop, udir, tauw, tauwdir, ustar_guess, params: pp.PhysParams,
            *, iusfg: int = 0):
    """Total stress / roughness closure, non-gravity-capillary branch
    (taut_z0.F90:230-290 "ELSE" branch of LLGCBZ0).

    Newton iteration on  u* = κ·U10 / log(XNLEV/z0tot)  with
    z0 = α·u*²/g / sqrt(1 - tauw/τ) + viscous sublayer.

    Returns (ustar, z0, z0b, chrnck).
    """
    dt = utop.dtype
    cosdiff = jnp.cos(udir - tauwdir)
    tauwact = jnp.maximum(tauw * cosdiff, jnp.asarray(c.EPSMIN, dt))
    us2totauw = 1.0 + EPS1
    tauweff = tauwact * us2totauw

    if params.llcapchnk:
        charnock_min = chnkmin(utop, params)
        xmin = 0.15 * (params.alpha - charnock_min)
        alphaog = charnock_min * c.GM1
    else:
        xmin = jnp.zeros_like(utop)
        alphaog = jnp.full_like(utop, params.alpha * c.GM1)

    xkutop = pp.XKAPPA * utop
    xlogxl = math.log(pp.XNLEV)

    cd_first = jnp.minimum(c.ACD + c.BCD * utop, c.CDMAX)
    ustold = jnp.where(
        jnp.asarray(iusfg == 1), ustar_guess, utop * jnp.sqrt(cd_first))
    tauold = jnp.maximum(ustold**2, tauweff)
    ustar = jnp.sqrt(tauold)
    ustm1 = 1.0 / jnp.maximum(ustar, jnp.asarray(c.EPSUS, dt))

    def body(_, carry):
        ustar, ustm1, tauold, _ = carry
        x = jnp.maximum(tauwact / tauold, xmin)
        z0ch = alphaog * tauold / jnp.sqrt(1.0 - x)
        z0vis = pp.RNUM * ustm1
        z0tot = z0ch + z0vis
        xologz0 = 1.0 / (xlogxl - jnp.log(z0tot))
        f = ustar - xkutop * xologz0
        zz = ustm1 * (z0ch * (2.0 - 3.0 * x) / (1.0 - x) - z0vis) / z0tot
        delf = 1.0 - xkutop * xologz0**2 * zz
        ustar = jnp.where(delf != 0.0, ustar - f / delf, ustar)
        taunew = jnp.maximum(ustar**2, tauweff)
        ustar = jnp.sqrt(taunew)
        ustm1 = 1.0 / jnp.maximum(ustar, jnp.asarray(c.EPSUS, dt))
        return ustar, ustm1, taunew, z0ch

    init = (ustar, ustm1, tauold, jnp.zeros_like(ustar))
    ustar, ustm1, tauold, z0ch = _niter_loop(body, init)

    z0 = z0ch
    z0b = alphaog * tauold
    chrnck = jnp.maximum(c.G * z0 * ustm1**2, jnp.asarray(params.alphamin, dt))
    return ustar, z0, z0b, chrnck


def airsea(u10, udir, tauw, tauwdir, ustar, params: pp.PhysParams,
           *, icode_wnd: int = 3, iusfg: int = 0,
           wspmin: float = WSPMIN_DEFAULT, halp=None, rnfac=None):
    """Surface-stress dispatch (airsea.F90:44-70).

    icode_wnd==3: wind-speed forcing → TAUT_Z0 solve (the standard path;
    LLGCBZ0 selects the gravity-capillary closure and requires halp/rnfac).
    icode_wnd in (1, 2): u* forcing → Z0WAVE + log-profile U10.

    Returns (u10, ustar, z0, z0b, chrnck).
    """
    if icode_wnd == 3:
        if params.llgcbz0:
            ustar, z0, z0b, chrnck = taut_z0_gc(
                u10, udir, tauw, tauwdir, ustar, halp, rnfac,
                params, iusfg=iusfg)
        else:
            ustar, z0, z0b, chrnck = taut_z0(
                u10, udir, tauw, tauwdir, ustar, params, iusfg=iusfg)
        return u10, ustar, z0, z0b, chrnck
    elif icode_wnd in (1, 2):
        z0, z0b, chrnck = z0wave(ustar, tauw, u10, params)
        u10_new = (1.0 / pp.XKAPPA) * ustar * (
            math.log(pp.XNLEV) - jnp.log(z0))
        u10_new = jnp.maximum(u10_new, wspmin)
        return u10_new, ustar, z0, z0b, chrnck
    raise ValueError(f"invalid ICODE_WND={icode_wnd}")


def wsigstar(wswave, ufric, z0m, wstar, params: pp.PhysParams,
             *, wspmin: float = WSPMIN_DEFAULT):
    """Relative standard deviation of u* from gustiness (wsigstar.F90:48-86)."""
    dt = wswave.dtype
    sig_nmax = 0.9
    bg_gust = 0.0
    onethird = 1.0 / 3.0
    if params.llgcbz0 or params.llnormagam:
        u10m1 = 1.0 / jnp.maximum(wswave, wspmin)
        z0vis = pp.RNUM / jnp.maximum(ufric, jnp.asarray(c.EPSUS, dt))
        zchar = c.G * (z0m - z0vis) / jnp.maximum(
            ufric**2, jnp.asarray(c.EPSUS, dt))
        zchar = jnp.clip(zchar, params.alphamin, pp.ALPHAMAX)
        bcd_loc = c.BCDLIN * jnp.sqrt(zchar)
        c_d = c.ACDLIN + bcd_loc * wswave
        dc_ddu = bcd_loc
        sig_conv = 1.0 + 0.5 * wswave / c_d * dc_ddu
        u10 = wswave
    else:
        u10 = jnp.maximum(
            ufric / pp.XKAPPA * (math.log(10.0) - jnp.log(z0m)), wspmin)
        u10m1 = 1.0 / u10
        c2u10p1 = c.C2CD * u10**c.P1CD
        u10p2 = u10**c.P2CD
        c_d = (c.C1CD + c2u10p1) * u10p2
        dc_ddu = (c.P2CD * c.C1CD + (c.P1CD + c.P2CD) * c2u10p1) * u10p2 * u10m1
        sig_conv = 1.0 + 0.5 * u10 / c_d * dc_ddu
    sig_n = jnp.minimum(
        sig_nmax,
        sig_conv * u10m1 * (bg_gust * ufric**3
                            + 0.5 * pp.XKAPPA * wstar**3) ** onethird)
    return sig_n
