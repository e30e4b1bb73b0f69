"""Oracle: ocean fluxes, Stokes drift, ice mask, Phillips parameter.

Transcribes wnfluxes.F90 (non-NEMO/non-coupled paths), stokesdrift.F90,
setice.F90, halphap.F90 (+ meansqs_lf.F90).
"""

from __future__ import annotations

import math

import numpy as np

from . import reftables as rt
from . import means as omeans

PHIOC_ICE = -3.75
PHIAW_ICE = 3.75
C1, C2, P1, P2 = 1.03e-3, 0.04e-3, 1.48, -0.21
CDMAX_LOC = 0.003
EFD_MIN, EFD_MAX = 0.0625, 6.25
EPSU10 = math.sqrt(1.0e-3)
TAUOCMIN, TAUOCMAX = 0.01, 50.0
PHIEPSMIN, PHIEPSMAX = -3276.80, -0.05
FLMIN = 0.00001
ALPHAMAX = 0.11             # unused here; yowphys
STMAX = 1.5


def wnfluxes(mij, rhowgdfth, cinv, ssurf, cicover, phiwa, em, f1,
             wswave, wdwave, ufric, aird, tb, p, *, licerun=True,
             lwamrsetci=True, lciwa=False, cithrsh=0.3, ciblock=0.0):
    """wnfluxes.F90:100-270 (LWNEMOCOUWRS=F, LWCOUAST=F, LWNEMOCOU=F)."""
    npts, nang, nfre = ssurf.shape
    epsus3 = rt.EPSUS * math.sqrt(rt.EPSUS)
    if lciwa:
        zcithrs, cithrsh_inv, zmaxexp = 0.0, 50.0, 20.0
    else:
        zcithrs = ciblock
        cithrsh_inv = 1.0 / max(cithrsh, 0.01)
        zmaxexp = 10.0
    efd_fac = 4.0 * p.egrcrv / rt.G**2
    ffd_fac = (p.egrcrv / p.afcrv) ** (1.0 / p.bfcrv) * rt.G

    philf = np.zeros(npts)
    xstress = np.zeros(npts)
    ystress = np.zeros(npts)
    for m in range(nfre):
        sumt = ssurf[:, :, m].sum(axis=1)
        sumx = (np.sin(tb.th)[None, :] * ssurf[:, :, m]).sum(axis=1)
        sumy = (np.cos(tb.th)[None, :] * ssurf[:, :, m]).sum(axis=1)
        philf += sumt * rhowgdfth[:, m]
        cmr = cinv[:, m] * rhowgdfth[:, m]
        xstress += sumx * cmr
        ystress += sumy * cmr

    ooval = np.ones(npts)
    ustar = ufric.copy()
    em_oc = em.copy()
    f1_oc = f1.copy()
    if licerun and lwamrsetci:
        for ij in range(npts):
            if cicover[ij] > zcithrs:
                ooval[ij] = math.exp(-min((cicover[ij] * cithrsh_inv) ** 4,
                                          zmaxexp))
                u10p = max(wswave[ij], EPSU10)
                cd_bulk = min((C1 + C2 * u10p**P1) * u10p**P2, CDMAX_LOC)
                cd_wave = (ufric[ij] / u10p) ** 2
                cd_ice = ooval[ij] * cd_wave + (1.0 - ooval[ij]) * cd_bulk
                ustar[ij] = max(math.sqrt(cd_ice) * u10p, rt.EPSUS)
                efd = min(efd_fac * ustar[ij] ** 4, EFD_MAX)
                em_oc[ij] = max(ooval[ij] * em[ij]
                                + (1.0 - ooval[ij]) * efd, EFD_MIN)
                ffd = ffd_fac / ustar[ij]
                f1_oc[ij] = ooval[ij] * f1[ij] + (1.0 - ooval[ij]) * ffd
                f1_oc[ij] = min(max(f1_oc[ij], tb.fr[1]), tb.fr[nfre - 1])

    tauxd = np.zeros(npts)
    tauyd = np.zeros(npts)
    tauocxd = np.zeros(npts)
    tauocyd = np.zeros(npts)
    tauoc = np.zeros(npts)
    phiocd = np.zeros(npts)
    phieps = np.zeros(npts)
    phiaw = np.zeros(npts)
    for ij in range(npts):
        tau = aird[ij] * max(ustar[ij] ** 2, rt.EPSUS)
        tauxd[ij] = tau * math.sin(wdwave[ij])
        tauyd[ij] = tau * math.cos(wdwave[ij])
        tauocxd[ij] = tauxd[ij] - ooval[ij] * xstress[ij]
        tauocyd[ij] = tauyd[ij] - ooval[ij] * ystress[ij]
        tauo = math.sqrt(tauocxd[ij] ** 2 + tauocyd[ij] ** 2)
        tauoc[ij] = min(max(tauo / tau, TAUOCMIN), TAUOCMAX)

        xn = aird[ij] * max(ustar[ij] ** 3, epsus3)
        phiocd[ij] = ooval[ij] * (philf[ij] - phiwa[ij]) \
            + (1.0 - ooval[ij]) * PHIOC_ICE * xn
        phieps[ij] = phiocd[ij] / xn
        phieps[ij] = min(max(phieps[ij], PHIEPSMIN), PHIEPSMAX)
        phiocd[ij] = phieps[ij] * xn
        phiaw[ij] = ooval[ij] * phiwa[ij] / xn \
            + (1.0 - ooval[ij]) * PHIAW_ICE
    return dict(tauxd=tauxd, tauyd=tauyd, tauocxd=tauocxd,
                tauocyd=tauocyd, tauoc=tauoc, phiocd=phiocd,
                phieps=phieps, phiaw=phiaw, em_oc=em_oc, f1_oc=f1_oc)


def stokesdrift(fl1, stokfac, wswave, wdwave, cicover, tb, *,
                licerun=True, lwamrsetci=True, cithrsh=0.3):
    """stokesdrift.F90:50-115."""
    npts, nang, nfre = fl1.shape
    nfre_odd = nfre - 1 + nfre % 2
    # DFIM_SIM Simpson weights (initmdl.F90:486-495)
    dfim_sim = np.zeros(nfre)
    xlog = math.log(rt.FRATIO)
    dfim_sim[0] = tb.delth * xlog * tb.fr[0] / 3.0
    m = 1
    while m <= nfre_odd - 2:
        dfim_sim[m] = 4.0 * tb.delth * xlog * tb.fr[m] / 3.0
        dfim_sim[m + 1] = 2.0 * tb.delth * xlog * tb.fr[m + 1] / 3.0
        m += 2
    dfim_sim[nfre_odd - 1] = tb.delth * xlog * tb.fr[nfre_odd - 1] / 3.0

    const = 2.0 * tb.delth * rt.ZPI**3 / rt.G * tb.fr[nfre_odd - 1] ** 4
    ustokes = np.zeros(npts)
    vstokes = np.zeros(npts)
    for m in range(nfre_odd):
        stfac = stokfac[:, m] * dfim_sim[m]
        for k in range(nang):
            fac3 = stfac * fl1[:, k, m]
            ustokes += fac3 * math.sin(tb.th[k])
            vstokes += fac3 * math.cos(tb.th[k])
    for k in range(nang):
        ustokes += const * math.sin(tb.th[k]) * fl1[:, k, nfre_odd - 1]
        vstokes += const * math.cos(tb.th[k]) * fl1[:, k, nfre_odd - 1]
    if licerun and lwamrsetci:
        iced = cicover > cithrsh
        ustokes = np.where(
            iced, 0.016 * wswave * np.sin(wdwave) * (1.0 - cicover),
            ustokes)
        vstokes = np.where(
            iced, 0.016 * wswave * np.cos(wdwave) * (1.0 - cicover),
            vstokes)
    return (np.clip(ustokes, -STMAX, STMAX),
            np.clip(vstokes, -STMAX, STMAX))


def setice(fl1, cicover, coswdif, *, cithrsh=0.3):
    """setice.F90:38-75 — returns the masked spectrum."""
    fl1 = fl1.copy()
    npts, nang, nfre = fl1.shape
    for ij in range(npts):
        if cicover[ij] > cithrsh:
            cireduc = max(rt.EPSMIN, 1.0 - cicover[ij])
            icefree = 0.0
        else:
            cireduc = 0.0
            icefree = 1.0
        temp = cireduc * FLMIN
        for m in range(nfre):
            for k in range(nang):
                fl1[ij, k, m] = fl1[ij, k, m] * icefree \
                    + temp * max(0.0, coswdif[ij, k]) ** 2
    return fl1


def meansqs_lf(nfre_eff, f, wavnum, tb):
    """meansqs_lf.F90:40-70."""
    npts, nang, nfre = f.shape
    kfre = min(nfre_eff, nfre)
    xmss = np.zeros(npts)
    for m in range(kfre):
        temp1 = tb.dfim[m] * wavnum[:, m] ** 2
        temp2 = f[:, :, m].sum(axis=1)
        xmss += temp1 * temp2
    return xmss


def halphap(fl1, wavnum, coswdif, tb, *, alphapmax):
    """halphap.F90:50-120 — ½ Phillips parameter."""
    npts, nang, nfre = fl1.shape
    zlnfrnfre = math.log(tb.fr[nfre - 1])
    wd = 0.5 + 0.5 * np.sign(coswdif)                  # (npts, nang)
    flwd = fl1 * wd[:, :, None]
    xmss = meansqs_lf(nfre, flwd, wavnum, tb)
    em, fm = omeans.femean(flwd, tb)
    halp = np.zeros(npts)
    for ij in range(npts):
        if em[ij] > 0.0 and fm[ij] < tb.fr[nfre - 3]:
            alphap = xmss[ij] / (zlnfrnfre - math.log(fm[ij]))
            if alphap > alphapmax:
                f1d = flwd[ij, :, nfre - 1].sum() * tb.delth
                alphap = rt.ZPI4GM2 * tb.fr5[nfre - 1] * f1d
        else:
            f1d = flwd[ij, :, nfre - 1].sum() * tb.delth
            alphap = rt.ZPI4GM2 * tb.fr5[nfre - 1] * f1d
        halp[ij] = 0.5 * min(alphap, alphapmax)
    return halp
