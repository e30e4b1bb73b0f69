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

    if params.llgcbz0:
        raise NotImplementedError(
            "gravity-capillary z0 model (LLGCBZ0) not yet implemented")

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
    ustar, ustm1, tauold, z0ch = jax.lax.fori_loop(0, NITER, body, init)

    z0 = z0ch
    z0b = alphaog * tauold
    chrnck = jnp.maximum(c.G * z0 * ustm1**2, jnp.asarray(params.alphamin, dt))
    return ustar, z0, z0b, chrnck


def airsea(u10, udir, tauw, tauwdir, ustar, params: pp.PhysParams,
           *, icode_wnd: int = 3, iusfg: int = 0, wspmin: float = WSPMIN_DEFAULT):
    """Surface-stress dispatch (airsea.F90:44-70).

    icode_wnd==3: wind-speed forcing → TAUT_Z0 solve (the standard path).
    icode_wnd in (1, 2): u* forcing → Z0WAVE + log-profile U10.

    Returns (u10, ustar, z0, z0b, chrnck).
    """
    if icode_wnd == 3:
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
