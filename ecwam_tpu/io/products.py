"""Derived output parameters (the OUTBS/OUTBLOCK catalog).

JAX re-derivations of the integrated-parameter computations
(/root/reference/src/ecwam/outblock.F90:153-612 and the helpers it calls):
  swh    significant wave height 4√E          (outblock.F90:180)
  mwd    mean wave direction                  (sthq.F90:40-75)
  mwp    mean wave period 1/FM                (outblock.F90:190-200, femean)
  pp1d   peak (dominant) period               (dominant_period.F90:42-85)
  dwi    10m wind direction                   (outblock.F90:205)
  cdww   drag coefficient with waves          (outbeta.F90:58-80)
  wind   10m wind speed                       (outblock.F90:235)
  ustar  friction velocity
  tauw_over_ust2  wave-stress fraction        (outblock.F90:225)
  mwp1 / mwp2     mean periods from f / f² moments (mwp1.F90, mwp2.F90)

Direction convention: output directions are degrees in meteorological
convention ``mod(deg·θ + 180, 360)`` (outblock.F90:186).

All functions take fl1 (nang, nfre, npts) and return (npts,).
"""

from __future__ import annotations

import jax.numpy as jnp

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.core import spectral as sp
from ecwam_tpu.ops.physics import means as means_mod


def swh(fl1, tb):
    em, _ = means_mod.femean(fl1, tb)
    return 4.0 * jnp.sqrt(jnp.maximum(em, 0.0))


def mean_direction(fl1, tb):
    """THQ in radians (sthq.F90:40-75)."""
    dt = fl1.dtype
    dfim = jnp.asarray(tb.dfim, dt)[None, :, None]
    temp = jnp.sum(fl1 * dfim, axis=1)            # (nang, npts)
    si = jnp.sum(jnp.asarray(tb.sinth, dt)[:, None] * temp, axis=0)
    ci = jnp.sum(jnp.asarray(tb.costh, dt)[:, None] * temp, axis=0)
    ci = jnp.where(ci == 0.0, c.EPSMIN, ci)
    thq = jnp.arctan2(si, ci)
    return jnp.where(thq < 0.0, thq + c.ZPI, thq)


def mwd(fl1, tb):
    return jnp.mod(c.DEG * mean_direction(fl1, tb) + 180.0, 360.0)


def mwp(fl1, tb, zmiss: float = c.ZMISS):
    _, fm = means_mod.femean(fl1, tb)
    return jnp.where(fm > 0.0, 1.0 / fm, zmiss)


def pp1d(fl1, tb, zmiss: float = c.ZMISS):
    """Dominant period (dominant_period.F90:42-85)."""
    dt = fl1.dtype
    fcrop = 0.1 * jnp.max(fl1, axis=(0, 1), keepdims=True)
    f1d4 = jnp.sum(jnp.where(fl1 > fcrop, fl1, 0.0), axis=0) * tb.delth
    f1d4 = f1d4**4                                # (nfre, npts)
    em = jnp.sum(jnp.asarray(tb.dfim, dt)[:, None] * f1d4, axis=0)
    dp = jnp.sum(jnp.asarray(tb.dfimfr, dt)[:, None] * f1d4, axis=0)
    good = (em > 0.0) & (dp > c.EPSMIN)
    return jnp.where(good, em / jnp.where(good, dp, 1.0), 0.0)


def wind_direction(wdwave):
    return jnp.mod(c.DEG * wdwave + 180.0, 360.0)


def cdww(u10, ustar, z0b, chrnck, params, *, llgcbz0: bool = False):
    """Drag coefficient from the wave-modified Charnock (outbeta.F90:58-80)."""
    if llgcbz0:
        alphamax_u10 = pp.ALPHAMAX
    else:
        alphamax_u10 = jnp.minimum(pp.ALPHAMAX, 0.02 + 0.01 * u10)
    usm = 1.0 / jnp.maximum(ustar, c.EPSUS)
    betam = jnp.maximum(jnp.minimum(chrnck, alphamax_u10), params.alphamin)
    z0atm = pp.RNUM * usm + c.GM1 * betam * ustar**2
    cd = (pp.XKAPPA / jnp.log(1.0 + pp.XNLEV / z0atm)) ** 2
    return jnp.minimum(cd, 0.01)


def _simpson_period(fl1, tb, moment_weight, tail_coef, sqrt_out: bool):
    dt = fl1.dtype
    nfre_odd = tb.nfre - 1 + tb.nfre % 2
    temp = jnp.sum(fl1[:, :nfre_odd], axis=0)     # (nfre_odd, npts)
    em = jnp.sum(jnp.asarray(tb.dfim_sim[:nfre_odd], dt)[:, None] * temp,
                 axis=0)
    mw = jnp.sum(jnp.asarray(moment_weight[:nfre_odd], dt)[:, None] * temp,
                 axis=0)
    t_last = temp[-1]
    delt25 = sp.WETAIL * tb.fr[nfre_odd - 1] * tb.delth
    em = em + delt25 * t_last
    mw = mw + tail_coef * t_last
    good = (em > 0.0) & (mw > c.EPSMIN)
    ratio = em / jnp.where(good, mw, 1.0)
    if sqrt_out:
        ratio = jnp.sqrt(ratio)
    return jnp.where(good, jnp.minimum(ratio, 1.0 / tb.fr[0]), 0.0)


def mwp1(fl1, tb):
    """Mean period from the f-moment, Simpson rule (mwp1.F90:55-95)."""
    nfre_odd = tb.nfre - 1 + tb.nfre % 2
    coef = sp.WP1TAIL * tb.delth * tb.fr[nfre_odd - 1] ** 2
    return _simpson_period(fl1, tb, tb.dfimfr_sim, coef, sqrt_out=False)


def mwp2(fl1, tb):
    """Mean period from the f²-moment, Simpson rule (mwp2.F90:48-90)."""
    nfre_odd = tb.nfre - 1 + tb.nfre % 2
    coef = sp.WP2TAIL * tb.delth * tb.fr[nfre_odd - 1] ** 3
    return _simpson_period(fl1, tb, tb.dfimfr2_sim, coef, sqrt_out=True)


CATALOG = {
    "swh": lambda fl1, tb, st, frc, params: swh(fl1, tb),
    "mwd": lambda fl1, tb, st, frc, params: mwd(fl1, tb),
    "mwp": lambda fl1, tb, st, frc, params: mwp(fl1, tb),
    "pp1d": lambda fl1, tb, st, frc, params: pp1d(fl1, tb),
    "dwi": lambda fl1, tb, st, frc, params: wind_direction(frc["wdwave"]),
    "wind": lambda fl1, tb, st, frc, params: frc["wswave"],
    "ustar": lambda fl1, tb, st, frc, params: st["ufric"],
    "cdww": lambda fl1, tb, st, frc, params: cdww(
        frc["wswave"], st["ufric"], st["z0b"], st["chrnck"], params),
    "tauw_over_ust2": lambda fl1, tb, st, frc, params: st["tauw"]
    / jnp.maximum(st["ufric"] ** 2, c.EPSUS),
    "mwp1": lambda fl1, tb, st, frc, params: mwp1(fl1, tb),
    "mwp2": lambda fl1, tb, st, frc, params: mwp2(fl1, tb),
}


def compute(names, fl1, tb, stress_state, frc, params):
    """Evaluate a list of catalog fields → dict name → (npts,)."""
    return {n: CATALOG[n](fl1, tb, stress_state, frc, params) for n in names}
