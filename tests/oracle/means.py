"""Oracle: spectral means / cut index / tail imposition / depth limit.

Transcribes fkmean.F90, semean.F90, femean.F90, femeanws.F90,
frcutindex.F90, imphftail.F90, sdepthlim.F90 (loop-for-loop).

Array layout here is Fortran-ish: fl1[npts, nang, nfre].
"""

from __future__ import annotations

import numpy as np

from . import reftables as rt


def fkmean(fl1, wavnum, tb):
    """fkmean.F90:104-150 → (em, fm1, f1, ak, xk), each (npts,)."""
    npts, nang, nfre = fl1.shape
    em = np.full(npts, rt.EPSMIN)
    fm1 = np.full(npts, rt.EPSMIN)
    f1 = np.full(npts, rt.EPSMIN)
    ak = np.full(npts, rt.EPSMIN)
    xk = np.full(npts, rt.EPSMIN)

    delt25 = rt.WETAIL * tb.fr[nfre - 1] * tb.delth
    coefm1 = rt.FRTAIL * tb.delth
    coef1 = rt.WP1TAIL * tb.delth * tb.fr[nfre - 1] ** 2
    coefa = coefm1 * np.sqrt(rt.G) / rt.ZPI
    coefx = coef1 * (rt.ZPI / np.sqrt(rt.G))

    temp2 = np.zeros(npts)
    for m in range(1, nfre + 1):
        for ij in range(npts):
            sqrtk = np.sqrt(wavnum[ij, m - 1])
            tempa = tb.dfim[m - 1] / sqrtk
            tempx = sqrtk * tb.dfim[m - 1]
            t2 = 0.0
            for k in range(1, nang + 1):
                t2 += fl1[ij, k - 1, m - 1]
            temp2[ij] = t2
            em[ij] += tb.dfim[m - 1] * t2
            fm1[ij] += tb.dfimofr[m - 1] * t2
            f1[ij] += tb.dfimfr[m - 1] * t2
            ak[ij] += tempa * t2
            xk[ij] += tempx * t2

    for ij in range(npts):
        em[ij] = em[ij] + delt25 * temp2[ij]
        fm1[ij] = fm1[ij] + coefm1 * temp2[ij]
        fm1[ij] = em[ij] / fm1[ij]
        f1[ij] = f1[ij] + coef1 * temp2[ij]
        f1[ij] = f1[ij] / em[ij]
        ak[ij] = ak[ij] + coefa * temp2[ij]
        ak[ij] = (em[ij] / ak[ij]) ** 2
        xk[ij] = xk[ij] + coefx * temp2[ij]
        xk[ij] = (xk[ij] / em[ij]) ** 2
    return em, fm1, f1, ak, xk


def semean(fl1, tb, llepsmin=True):
    """semean.F90:60-105 → em (npts,)."""
    npts, nang, nfre = fl1.shape
    em = np.full(npts, rt.EPSMIN if llepsmin else 0.0)
    temp = np.zeros(npts)
    for m in range(nfre):
        temp[:] = fl1[:, 0, m]
        for k in range(1, nang):
            temp += fl1[:, k, m]
        em += tb.dfim[m] * temp
    delt25 = rt.WETAIL * tb.fr[nfre - 1] * tb.delth
    em += delt25 * temp
    return em


def femean(fl1, tb):
    """femean.F90:60-120 → (em, fm) with EPSMIN bin floor + fr(1) floor."""
    npts, nang, nfre = fl1.shape
    em = np.full(npts, rt.EPSMIN)
    fm = np.full(npts, rt.EPSMIN)
    temp2 = np.zeros(npts)
    for m in range(nfre):
        temp2[:] = 0.0
        for k in range(nang):
            temp2 += np.maximum(fl1[:, k, m], rt.EPSMIN)
        em += tb.dfim[m] * temp2
        fm += tb.dfimofr[m] * temp2
    delt25 = rt.WETAIL * tb.fr[nfre - 1] * tb.delth
    delt2 = rt.FRTAIL * tb.delth
    em += delt25 * temp2
    fm += delt2 * temp2
    fm = np.maximum(em / fm, tb.fr[0])
    return em, fm


def femeanws(fl1, xllws, tb):
    """femeanws.F90:80-125 → (em, fm)."""
    npts, nang, nfre = fl1.shape
    em = np.full(npts, rt.EPSMIN)
    fm = np.full(npts, rt.EPSMIN)
    temp2 = np.zeros(npts)
    for m in range(nfre):
        temp2[:] = 0.0
        for k in range(nang):
            temp2 += xllws[:, k, m] * fl1[:, k, m]
        em += tb.dfim[m] * temp2
        fm += tb.dfimofr[m] * temp2
    delt25 = rt.WETAIL * tb.fr[nfre - 1] * tb.delth
    delt2 = rt.FRTAIL * tb.delth
    em += delt25 * temp2
    fm += delt2 * temp2
    fm = em / fm
    return em, fm


def frcutindex(fm, fmws, ufric, cicover, tb, *, tailfactor, tailfactor_pm,
               cithrsh_tail=0.3):
    """frcutindex.F90:80-112 → (mij 1-based, rhowgdfth).

    cithrsh_tail default 0.3 = the LMASKICE=T setting (userin.F90:957-961).
    """
    npts = fm.shape[0]
    nfre = tb.nfre
    mij = np.zeros(npts, dtype=int)
    rhowgdfth = np.zeros((npts, nfre))
    fpmh = tailfactor / tb.fr[0]
    fppm = tailfactor_pm * rt.G / (rt.FRIC * tb.zpifr[0])
    for ij in range(npts):
        if cicover[ij] <= cithrsh_tail:
            fm2 = max(fmws[ij], fm[ij]) * fpmh
            fpm = fppm / max(ufric[ij], rt.EPSMIN)
            fpm4 = max(fm2, fpm)
            m = int(np.rint(np.log10(fpm4) * tb.flogsprdm1)) + 1
            mij[ij] = min(max(1, m), nfre)
        else:
            mij[ij] = nfre
    for ij in range(npts):
        for m in range(1, mij[ij] + 1):
            rhowgdfth[ij, m - 1] = tb.rhowg_dfim[m - 1]
        if mij[ij] != nfre:
            rhowgdfth[ij, mij[ij] - 1] *= 0.5
        # M=MIJ+1..NFRE already zero
    return mij, rhowgdfth


def imphftail(mij, flm, wavnum, xk2cg, fl1):
    """imphftail.F90:60-105 — in-place f^-5-ish tail above MIJ; returns fl1."""
    fl1 = fl1.copy()
    npts, nang, nfre = fl1.shape
    for ij in range(npts):
        mi = mij[ij]                     # 1-based
        temp1 = 1.0 / xk2cg[ij, mi - 1] / wavnum[ij, mi - 1]
        for m in range(mi + 1, nfre + 1):
            temp2 = 1.0 / xk2cg[ij, m - 1] / wavnum[ij, m - 1]
            temp2 = temp2 / temp1
            for k in range(nang):
                tfac = fl1[ij, k, mi - 1]
                fl1[ij, k, m - 1] = max(temp2 * tfac, flm[ij, k])
    return fl1


def sdepthlim(emaxdpt, fl1, tb):
    """sdepthlim.F90:30-60 — returns clipped fl1."""
    fl1 = fl1.copy()
    em = semean(fl1, tb, llepsmin=True)
    em = np.minimum(emaxdpt / em, 1.0)
    npts, nang, nfre = fl1.shape
    for m in range(nfre):
        for k in range(nang):
            fl1[:, k, m] = np.maximum(fl1[:, k, m] * em, rt.EPSMIN)
    return fl1
