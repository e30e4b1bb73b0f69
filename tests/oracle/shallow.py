"""Oracle: bottom friction, depth-induced breaking, implicit update.

Transcribes sbottom.F90, sdiwbk.F90 and the semi-implicit update block of
implsch.F90:352-395 (non-UNSTR branch).
"""

from __future__ import annotations

import numpy as np

from . import reftables as rt

BATHYMAX = 998.999  # yowshal.F90:22


def sbottom(fl1, fld, sl, wavnum, depth, nfre_red):
    """sbottom.F90:60-105 — adds onto (fld, sl); returns updated copies."""
    fld = fld.copy()
    sl = sl.copy()
    npts, nang, nfre = fl1.shape
    const = -2.0 * 0.038 * rt.GM1
    for m in range(nfre_red):
        sbo = np.zeros(npts)
        for ij in range(npts):
            if depth[ij] < BATHYMAX:
                arg = 2.0 * depth[ij] * wavnum[ij, m]
                arg = min(arg, 50.0)
                sbo[ij] = const * wavnum[ij, m] / np.sinh(arg)
        for k in range(nang):
            sl[:, k, m] += sbo * fl1[:, k, m]
            fld[:, k, m] += sbo
    return fld, sl


def sdiwbk(fl1, fld, sl, depth, emaxdpt, emean, f1mean, nfre_red,
           *, lbiwbk=True):
    """sdiwbk.F90:60-115 — Battjes-Janssen depth-induced breaking."""
    fld = fld.copy()
    sl = sl.copy()
    if not lbiwbk:
        return fld, sl
    npts, nang, nfre = fl1.shape
    depthtrs = 50.0
    coef_b_j = 2.0 * 1.0
    sds = np.zeros(npts)
    for ij in range(npts):
        if depth[ij] < depthtrs:
            alph = 2.0 * emaxdpt[ij] / emean[ij]
            arg = min(alph, 50.0)
            q_old = np.exp(-arg)
            for _ in range(15):
                expq = np.exp(-arg * (1.0 - q_old))
                q = q_old - (expq - q_old) / (arg * expq - 1.0)
                rel_err = abs(q - q_old) / q_old
                if rel_err < 0.00001:
                    break
                q_old = q
            q = min(q, 1.0)
            sds[ij] = coef_b_j * alph * q * f1mean[ij]
    for m in range(nfre_red):
        for k in range(nang):
            for ij in range(npts):
                if depth[ij] < depthtrs:
                    sl[ij, k, m] -= sds[ij] * fl1[ij, k, m]
                    fld[ij, k, m] -= sds[ij]
    return fld, sl


def implsch_update(fl1, fld, sl, ufric, fmean, fmeanws, flm, tb,
                   *, idelt, ximp=1.0):
    """implsch.F90:352-395 — semi-implicit update, limiter, floor, cap.

    Returns (fl1_new, ssource_delta) where ssource_delta is the
    DELTM*MIN(FLMAX-FL1,0) cap term added to SSOURCE.
    """
    npts, nang, nfre = fl1.shape
    delt = idelt
    deltm = 1.0 / delt
    delt5 = ximp * delt
    fl1 = fl1.copy()
    ssrc = np.zeros_like(fl1)
    delfl = tb.cofrm4 * delt
    usfm = ufric * np.maximum(fmeanws, fmean)
    for k in range(nang):
        for m in range(nfre):
            for ij in range(npts):
                temp = usfm[ij] * delfl[m]
                gtemp1 = max(1.0 - delt5 * fld[ij, k, m], 1.0)
                gtemp2 = delt * sl[ij, k, m] / gtemp1
                flhab = abs(gtemp2)
                flhab = min(flhab, temp)
                fl1[ij, k, m] += np.sign(gtemp2) * flhab
                fl1[ij, k, m] = max(fl1[ij, k, m], flm[ij, k])
                ssrc[ij, k, m] = deltm * min(tb.flmax[m] - fl1[ij, k, m], 0.0)
                fl1[ij, k, m] = min(fl1[ij, k, m], tb.flmax[m])
    return fl1, ssrc
