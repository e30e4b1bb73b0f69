"""Oracle: sea-ice attenuation source terms SDICE1/2/3.

Transcribes sdice1.F90:60-140 (scattering with the CIDEAC deactivation
table + floe-size distribution), sdice2.F90:45-75 (ice-water drag) and
sdice3.F90:55-100 (IMODEL=2 empirical h^1.25 f^4.5 damping).
"""

from __future__ import annotations

import math

import numpy as np

from . import reftables as rt

XIMP = 1.0
CDICWA = 0.01            # LCIWA2 drag (userin.F90:973-975)
ZALPFACB = 1.0
FLMIN_EPS = 0.1e-32


def _apply(fl1, fld, sl, alp, cgroup, cicv, idelt, *, sdice3=False):
    """The shared SL/FLD/SLICE update (sdice1.F90:118-140)."""
    npts, nang, nfre = fl1.shape
    delt5 = XIMP * idelt
    fld = fld.copy()
    sl = sl.copy()
    slice_ = np.zeros_like(fl1)
    for m in range(nfre):
        for k in range(nang):
            for ij in range(npts):
                fldice = -alp[ij, m] * cgroup[ij, m]
                slice_[ij, k, m] = fl1[ij, k, m] * fldice
                sl[ij, k, m] += cicv[ij] * slice_[ij, k, m]
                fld[ij, k, m] += cicv[ij] * fldice
                gtemp1 = max(1.0 - delt5 * fldice, 1.0)
                slice_[ij, k, m] /= gtemp1
    return fld, sl, slice_


def sdice1(fl1, fld, sl, wavnum, cgroup, cicv, cith, tb, idelt, cid):
    """sdice1.F90:60-140; ``cid`` = dict from sdice.load_cideac()."""
    npts, nang, nfre = fl1.shape
    cifrgl = 0.955
    cidmin = 20.0
    cifrgmt = 2.0
    a, cc = 200.0, 300.0
    maxicm = int(math.log(a / cidmin) / math.log(cifrgmt))
    dinv = np.zeros(npts)
    for ij in range(npts):
        if cith[ij] > 0.0:
            cidmax = a + cc * cicv[ij]
            icm = min(int(math.log(cidmax / cidmin) / math.log(cifrgmt)),
                      maxicm)
            sn = sd = 0.0
            for i in range(icm + 1):
                x = (cifrgmt**2 * cifrgl) ** i
                sn += x * cidmax / cifrgmt**i
                sd += x
            dinv[ij] = 1.0 / (sn / sd)
        else:
            dinv[ij] = cidmin

    cideac = cid["cideac"]
    ticmin, dtic, nict = cid["ticmin"], cid["dtic"], cid["nict"]
    hicmin, dhic, nich = cid["hicmin"], cid["dhic"], cid["nich"]
    alp = np.zeros((npts, nfre))
    for m in range(nfre):
        tw = 1.0 / tb.fr[m]
        it = int(math.floor((tw - ticmin) / dtic + 1))
        it = max(1, min(it, nict))
        it1 = max(1, min(it + 1, nict))
        wt1 = max(min(1.0, (tw - (ticmin + (it - 1) * dtic)) / dtic), 0.0)
        wt = 1.0 - wt1
        for ij in range(npts):
            if cith[ij] > 0.0:
                ih = int(math.floor((cith[ij] - hicmin) / dhic + 1))
                ih = max(1, min(ih, nich))
                ih1 = max(1, min(ih + 1, nich))
                wh1 = max(min(1.0, (cith[ij] - (hicmin + (ih - 1) * dhic))
                              / dhic), 0.0)
                wh = 1.0 - wh1
                ci = wt * (wh * cideac[it - 1, ih - 1]
                           + wh1 * cideac[it - 1, ih1 - 1]) \
                    + wt1 * (wh * cideac[it1 - 1, ih - 1]
                             + wh1 * cideac[it1 - 1, ih1 - 1])
                alp[ij, m] = math.exp(ci) * dinv[ij] * ZALPFACB
    return _apply(fl1, fld, sl, alp, cgroup, cicv, idelt)


def sdice2(fl1, fld, sl, wavnum, cgroup, cicv, tb, idelt):
    """sdice2.F90:45-75 — EWH-dependent drag (Gauss-Seidel free)."""
    npts, nang, nfre = fl1.shape
    delt5 = XIMP * idelt
    fld = fld.copy()
    sl = sl.copy()
    slice_ = np.zeros_like(fl1)
    for m in range(nfre):
        for k in range(nang):
            for ij in range(npts):
                ewh = 4.0 * math.sqrt(max(FLMIN_EPS,
                                          fl1[ij, k, m] * tb.dfim[m]))
                alp = CDICWA * wavnum[ij, m] ** 2 * ewh * ZALPFACB
                fldice = -alp * cgroup[ij, m]
                slice_[ij, k, m] = fl1[ij, k, m] * fldice
                sl[ij, k, m] += cicv[ij] * slice_[ij, k, m]
                fld[ij, k, m] += cicv[ij] * fldice
                gtemp1 = max(1.0 - delt5 * fldice, 1.0)
                slice_[ij, k, m] /= gtemp1
    return fld, sl, slice_


def sdice3(fl1, fld, sl, wavnum, cgroup, cicv, cith, alpfac, tb, idelt):
    """sdice3.F90:55-100, IMODEL=2."""
    npts, nang, nfre = fl1.shape
    cdice = 0.1274 * (rt.ZPI / math.sqrt(rt.G)) ** 4.5
    alp = np.zeros((npts, nfre))
    for m in range(nfre):
        for ij in range(npts):
            alp[ij, m] = (2.0 * cdice * cith[ij] ** 1.25
                          * tb.fr[m] ** 4.5) * alpfac[ij]
    return _apply(fl1, fld, sl, alp, cgroup, cicv, idelt)
