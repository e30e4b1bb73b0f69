"""Sea-ice wave-attenuation source terms (SDICE dispatcher + 3 models).

Re-derivations of:
  - SDICE1 scattering model with the tabulated deactivation rates CIDEAC
    (/root/reference/src/ecwam/sdice1.F90:60-140, table built by
    cigetdeac.F90:60-560; extracted to ecwam_tpu/data/cideac.npz)
  - SDICE2 ice-water drag model           (sdice2.F90:45-70)
  - SDICE3 empirical h^1.25 f^4.5 model   (sdice3.F90:55-95, IMODEL=2)
  - ICEBREAK_MODIFY_ATTENUATION           (icebreak_modify_attenuation.F90)

All take fl1/fld/sl (nang, nfre, npts) and return (fld, sl, slice_) with
``slice_`` the implicit-factor-modulated pure-ice term fed to WNFLUXES'
radiative-stress integral.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ecwam_tpu.core import constants as c

XIMP = 1.0
CDICWA = 0.01           # ice-water drag for LCIWA2 (userin.F90:973-975)
ZALPFACB = 1.0          # attenuation scale factor (mpuserin.F90:780)
ZALPFACX = 10.0         # broken-ice attenuation reduction
ZIBRW_THRSH = 0.5       # ice-break memory threshold

_DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "data", "cideac.npz")


def load_cideac():
    with np.load(_DATA) as z:
        return dict(cideac=z["cideac"], ticmin=float(z["ticmin"]),
                    dtic=float(z["dtic"]), nict=int(z["nict"]),
                    hicmin=float(z["hicmin"]), dhic=float(z["dhic"]),
                    nich=int(z["nich"]))


def _apply(fl1, fld, sl, alp, cgroup, cicover, idelt, *, sdice3=False):
    """Common SL/FLD/SLICE update (sdice1.F90:125-140 and twins)."""
    delt5 = XIMP * idelt
    fldice = -alp * cgroup[None]                 # (nang, nfre, npts) via bc
    slice_ = fl1 * fldice
    sl = sl + cicover[None, None, :] * slice_
    fld = fld + cicover[None, None, :] * fldice
    gtemp1 = jnp.maximum(1.0 - delt5 * fldice, 1.0)
    slice_ = slice_ / gtemp1
    return fld, sl, slice_


def icebreak_modify_attenuation(ibrmem, alpfac=None):
    """Reduce attenuation where the ice-break memory says ice is broken
    (icebreak_modify_attenuation.F90)."""
    base = jnp.ones_like(ibrmem) if alpfac is None else alpfac
    return jnp.where(ibrmem <= ZIBRW_THRSH, 1.0 / ZALPFACX, base)


def sdice1(fl1, fld, sl, wavnum, cgroup, cicover, cithick, tb, idelt,
           tables=None):
    """Scattering attenuation from tabulated deactivation rates
    (sdice1.F90:60-140)."""
    dt = fl1.dtype
    tbl = tables or load_cideac()
    cideac = jnp.asarray(tbl["cideac"], dt)        # (nict, nich)
    nict, nich = tbl["nict"], tbl["nich"]

    # mean floe size → 1/D (sdice1.F90:65-100)
    cifrgl, cidmin, cifrgmt = 0.955, 20.0, 2.0
    a_, c_ = 200.0, 300.0
    maxicm = int(np.log(a_ / cidmin) / np.log(cifrgmt))
    cidmax = a_ + c_ * cicover
    icm = jnp.minimum(jnp.floor(
        jnp.log(cidmax / cidmin) / np.log(cifrgmt)).astype(jnp.int32),
        maxicm)
    i = jnp.arange(maxicm + 1, dtype=dt)[:, None]       # (maxicm+1, npts)
    active = (i <= icm[None, :].astype(dt))
    x = (cifrgmt**2 * cifrgl) ** i
    sn = jnp.sum(jnp.where(active, x * cidmax[None] / cifrgmt**i, 0.0),
                 axis=0)
    sd = jnp.sum(jnp.where(active, x, 0.0), axis=0)
    dinv = jnp.where(cithick > 0.0, sd / sn, cidmin)

    # bilinear table lookup in (period, thickness) (sdice1.F90:100-124)
    tw = 1.0 / jnp.asarray(tb.fr, dt)                   # (nfre,)
    it = jnp.clip(jnp.floor((tw - tbl["ticmin"]) / tbl["dtic"]).astype(
        jnp.int32), 0, nict - 1)
    it1 = jnp.clip(it + 1, 0, nict - 1)
    wt1 = jnp.clip((tw - (tbl["ticmin"] + it.astype(dt) * tbl["dtic"]))
                   / tbl["dtic"], 0.0, 1.0)
    wt = 1.0 - wt1
    ih = jnp.clip(jnp.floor((cithick - tbl["hicmin"]) / tbl["dhic"]).astype(
        jnp.int32), 0, nich - 1)
    ih1 = jnp.clip(ih + 1, 0, nich - 1)
    wh1 = jnp.clip((cithick - (tbl["hicmin"] + ih.astype(dt) * tbl["dhic"]))
                   / tbl["dhic"], 0.0, 1.0)
    wh = 1.0 - wh1
    # (nfre, npts) interpolation
    deac = (wt[:, None] * (wh[None] * cideac[it][:, ih]
                           + wh1[None] * cideac[it][:, ih1])
            + wt1[:, None] * (wh[None] * cideac[it1][:, ih]
                              + wh1[None] * cideac[it1][:, ih1]))
    alp = jnp.where(cithick[None, :] > 0.0,
                    jnp.exp(deac) * dinv[None, :] * ZALPFACB, 0.0)
    return _apply(fl1, fld, sl, alp[None], cgroup, cicover, idelt)


def sdice2(fl1, fld, sl, wavnum, cgroup, cicover, tb, idelt,
           cdicwa: float = CDICWA):
    """Turbulent ice-water drag attenuation (sdice2.F90:45-70).

    α depends on the local spectral bin amplitude, so it is per
    (k, m, point)."""
    dt = fl1.dtype
    dfim = jnp.asarray(tb.dfim, dt)[None, :, None]
    ewh = 4.0 * jnp.sqrt(jnp.maximum(c.EPSMIN, fl1 * dfim))
    alp = cdicwa * (wavnum**2)[None] * ewh * ZALPFACB
    return _apply(fl1, fld, sl, alp, cgroup, cicover, idelt)


def sdice3(fl1, fld, sl, wavnum, cgroup, cicover, cithick, tb, idelt,
           alpfac=None):
    """Empirical attenuation ~ h^1.25 f^4.5 (sdice3.F90:55-95, IMODEL=2,
    the cy50r1 LCIWA3 default)."""
    dt = fl1.dtype
    cdice = 0.1274 * (c.ZPI / np.sqrt(c.G)) ** 4.5
    fr45 = jnp.asarray(np.asarray(tb.fr) ** 4.5, dt)
    af = jnp.ones_like(cicover) if alpfac is None else alpfac
    alp = (2.0 * cdice * cithick[None, :] ** 1.25 * fr45[:, None]
           * af[None, :])                                  # (nfre, npts)
    return _apply(fl1, fld, sl, alp[None], cgroup, cicover, idelt)


def sdice(fl1, fld, sl, wavnum, cgroup, cicover, cithick, tb, idelt, *,
          lciwa1=False, lciwa2=False, lciwa3=False, alpfac=None,
          cideac_tables=None):
    """Dispatcher (sdice.F90): apply the enabled attenuation models."""
    slice_ = jnp.zeros_like(fl1)
    if lciwa1:
        fld, sl, slice_ = sdice1(fl1, fld, sl, wavnum, cgroup, cicover,
                                 cithick, tb, idelt, tables=cideac_tables)
    if lciwa2:
        fld, sl, slice_ = sdice2(fl1, fld, sl, wavnum, cgroup, cicover,
                                 tb, idelt)
    if lciwa3:
        fld, sl, slice_ = sdice3(fl1, fld, sl, wavnum, cgroup, cicover,
                                 cithick, tb, idelt, alpfac=alpfac)
    return fld, sl, slice_
