"""Oracle: DIA nonlinear transfer (NLWEIGT + INISNONLIN + SNONLIN).

Transcribes nlweigt.F90, jafu.F90, inisnonlin.F90, transf.F90 and
snonlin.F90 with Fortran-index dictionaries, preserving the three
frequency-boundary branches and the exact scatter ordering.
"""

from __future__ import annotations

import math

import numpy as np

from . import reftables as rt

ALAMD = 0.25
CON = 3000.0
ENH_MAX = 10.0
ENH_MIN = 0.1
DKMAX = 40.0
BATHYMAX = 998.999  # yowshal.F90:22


def jafu(cl, j, ian):
    """jafu.F90:88-96."""
    idph = int(cl)
    ja = j + idph
    if ja <= 0:
        ja = ian + ja - 1
    if ja >= ian:
        ja = ja - ian + 1
    return ja


def nlweigt(nang, nfre, fr, delth):
    """nlweigt.F90:90-262 — returns dict of Fortran-indexed tables."""
    f1p1 = math.log10(rt.FRATIO)
    isp = int(math.log10(1.0 + ALAMD) / f1p1 + 0.000001)
    ism = math.floor(math.log10(1.0 - ALAMD) / f1p1 + 0.0000001)
    mfrstlw = 1 + ism
    mlsthg = nfre - ism
    kfrh = -ism + isp + 2

    xf = ((1.0 + ALAMD) / (1.0 - ALAMD)) ** 4
    costh3 = (1.0 + 2.0 * ALAMD + 2.0 * ALAMD**3) / (1.0 + ALAMD) ** 2
    delphi1 = -180.0 / rt.PI * math.acos(costh3)
    costh4 = math.sqrt(1.0 - xf + xf * costh3**2)
    delphi2 = 180.0 / rt.PI * math.acos(costh4)

    deltha = delth * rt.DEG
    cl1 = delphi1 / deltha
    cl2 = delphi2 / deltha

    klp1 = nang + 1
    ja1 = {}
    ja2 = {}
    ic = 1
    for kh in (1, 2):
        klh = nang if kh == 1 else klp1
        for k in range(1, klh + 1):
            ks = k if kh == 1 else klp1 - k + 1
            if ks > nang:
                continue
            ja1[(ks, kh)] = jafu(ic * cl1, k, klp1)
            ja2[(ks, kh)] = jafu(ic * cl2, k, klp1)
        ic = -1

    cl1 = cl1 - int(cl1)
    cl2 = cl2 - int(cl2)
    acl1 = abs(cl1)
    acl2 = abs(cl2)
    cl11 = 1.0 - acl1
    cl21 = 1.0 - acl2
    al11 = (1.0 + ALAMD) ** 4
    al12 = (1.0 - ALAMD) ** 4
    dal1 = 1.0 / al11
    dal2 = 1.0 / al12

    k1w = {}
    k2w = {}
    k11w = {}
    k21w = {}
    isg = 1
    for kh in (1, 2):
        cl1h = isg * cl1
        cl2h = isg * cl2
        for k in range(1, nang + 1):
            ks = k if kh == 1 else nang - k + 2
            if k == 1:
                ks = 1
            k1 = ja1[(k, kh)]
            k1w[(ks, kh)] = k1
            if cl1h < 0.0:
                k11 = k1 - 1
                if k11 < 1:
                    k11 = nang
            else:
                k11 = k1 + 1
                if k11 > nang:
                    k11 = 1
            k11w[(ks, kh)] = k11
            k2 = ja2[(k, kh)]
            k2w[(ks, kh)] = k2
            if cl2h < 0.0:
                k21 = k2 - 1
                if k21 < 1:
                    k21 = nang
            else:
                k21 = k2 + 1
                if k21 > nang:
                    k21 = 1
            k21w[(ks, kh)] = k21
        isg = -1

    frlon = {}
    for m in range(1, nfre + 1):
        frlon[m] = fr[m - 1]
    for m in range(0, mfrstlw - 1, -1):
        frlon[m] = frlon[m + 1] / rt.FRATIO
    for m in range(nfre + 1, nfre + kfrh + 1):
        frlon[m] = rt.FRATIO * frlon[m - 1]

    ikp = {}
    ikp1 = {}
    ikm = {}
    ikm1 = {}
    af11 = {}
    fklap = {}
    fklap1 = {}
    fklam = {}
    fklam1 = {}
    for m in range(mfrstlw, mlsthg + 1):
        frg = frlon[m]
        af11[m] = CON * frg**11
        flp = frg * (1.0 + ALAMD)
        flm = frg * (1.0 - ALAMD)
        ikn = m + isp
        ikp[m] = ikn
        fkp = frlon[ikp[m]]
        ikp1[m] = ikp[m] + 1
        fklap[m] = (flp - fkp) / (frlon[ikp1[m]] - fkp)
        fklap1[m] = 1.0 - fklap[m]
        ikn = m + ism
        if ikn >= mfrstlw:
            ikm[m] = ikn
            fkm = frlon[ikm[m]]
            ikm1[m] = ikm[m] + 1
            fklam[m] = (flm - fkm) / (frlon[ikm1[m]] - fkm)
            fklam1[m] = 1.0 - fklam[m]
        elif ikn + 1 == mfrstlw:
            ikm[m] = 1
            ikm1[m] = mfrstlw
            fkm = frlon[ikm1[m]] / rt.FRATIO
            fklam[m] = (flm - fkm) / (frlon[ikm1[m]] - fkm)
            fklam1[m] = 0.0
        else:
            ikm[m] = 1
            fklam[m] = 0.0
            ikm1[m] = 1
            fklam1[m] = 0.0

    frh = {}
    for i in range(1, kfrh + 1):
        m = nfre + i - 1
        frh[i] = (frlon[nfre] / frlon[m]) ** 5

    return dict(
        mfrstlw=mfrstlw, mlsthg=mlsthg, kfrh=kfrh,
        ikp=ikp, ikp1=ikp1, ikm=ikm, ikm1=ikm1,
        k1w=k1w, k2w=k2w, k11w=k11w, k21w=k21w,
        af11=af11, fklap=fklap, fklap1=fklap1, fklam=fklam, fklam1=fklam1,
        acl1=acl1, acl2=acl2, cl11=cl11, cl21=cl21, dal1=dal1, dal2=dal2,
        frh=frh, frlon=frlon)


def inisnonlin(nang, nfre, fr, delth):
    """inisnonlin.F90:84-291 — adds FTRF, INLCOEF, RNLCOEF to nlweigt dict."""
    t = nlweigt(nang, nfre, fr, delth)
    mfrstlw = t["mfrstlw"]
    mlsthg = t["mlsthg"]

    def epmma(x):
        return math.exp(-min(1.25 * x**4, 50.0)) * x**5

    ftrf = {}
    alph = 1.0 / epmma(1.0)
    frr = 1.0
    for mc in range(1, mfrstlw - 1, -1):
        ftrf[mc] = alph * epmma(frr)
        frr = frr * rt.FRATIO

    inlcoef = {}
    rnlcoef = {}
    for mc in range(1, mlsthg + 1):
        mp = t["ikp"][mc]
        mp1 = t["ikp1"][mc]
        mm = t["ikm"][mc]
        mm1 = t["ikm1"][mc]
        ffacp = 1.0
        ffacp1 = 1.0
        ffacm = 1.0
        ffacm1 = 1.0
        ftail = 1.0
        ic = mc
        if ic < 1:
            ic = 1
        ip = mp
        ip1 = mp1
        im = mm
        im1 = mm1
        if ip < 1:
            ffacp = ftrf[ip]
            ip = 1
        if ip1 < 1:
            ffacp1 = ftrf[ip1]
            ip1 = 1
        if im < mfrstlw:
            ffacm = 0.0
            im = 1
        elif im < 1:
            ffacm = ftrf[im]
            im = 1
        if im1 < mfrstlw:
            ffacm1 = 0.0
            im1 = 1
        elif im1 < 1:
            ffacm1 = ftrf[im1]
            im1 = 1
        if ip1 > nfre:
            itemp = ip1 - nfre + 1
            if itemp > t["kfrh"]:
                itemp = t["kfrh"]
            ffacp1 = t["frh"][itemp]
            ip1 = nfre
            if ip > nfre:
                ffacp = t["frh"][ip - nfre + 1]
                ip = nfre
                if ic > nfre:
                    ftail = t["frh"][ic - nfre + 1]
                    ic = nfre
                    if im1 > nfre:
                        ffacm1 = t["frh"][im1 - nfre + 1]
                        im1 = nfre
        inlcoef[mc] = (ic, ip, ip1, im, im1)

        fklamp = t["fklap"][mc]
        fklamp1 = t["fklap1"][mc]
        gw2 = fklamp1 * ffacp * t["dal1"]
        gw1 = gw2 * t["cl11"]
        gw2 = gw2 * t["acl1"]
        gw4 = fklamp * ffacp1 * t["dal1"]
        gw3 = gw4 * t["cl11"]
        gw4 = gw4 * t["acl1"]
        fklampa = fklamp * t["cl11"]
        fklampb = fklamp * t["acl1"]
        fklamp2 = fklamp1 * t["acl1"]
        fklamp1 = fklamp1 * t["cl11"]
        fklapa2 = fklampa**2
        fklapb2 = fklampb**2
        fklap12 = fklamp1**2
        fklap22 = fklamp2**2

        fklamm = t["fklam"][mc]
        fklamm1 = t["fklam1"][mc]
        gw6 = fklamm1 * ffacm * t["dal2"]
        gw5 = gw6 * t["cl21"]
        gw6 = gw6 * t["acl2"]
        gw8 = fklamm * ffacm1 * t["dal2"]
        gw7 = gw8 * t["cl21"]
        gw8 = gw8 * t["acl2"]
        fklamma = fklamm * t["cl21"]
        fklammb = fklamm * t["acl2"]
        fklamm2 = fklamm1 * t["acl2"]
        fklamm1 = fklamm1 * t["cl21"]
        fklama2 = fklamma**2
        fklamb2 = fklammb**2
        fklam12 = fklamm1**2
        fklam22 = fklamm2**2

        rnlcoef[mc] = (ftail, gw1, gw2, gw3, gw4, fklampa, fklampb,
                       fklamp2, fklamp1, fklapa2, fklapb2, fklap12,
                       fklap22, gw5, gw6, gw7, gw8, fklamma, fklammb,
                       fklamm2, fklamm1, fklama2, fklamb2, fklam12,
                       fklam22)
    t["ftrf"] = ftrf
    t["inlcoef"] = inlcoef
    t["rnlcoef"] = rnlcoef
    return t


def transf(xk, d):
    """transf.F90:40-69 — shallow-water SNL transfer function."""
    eps = 0.0001
    if d < BATHYMAX and d > 0.0:
        x = xk * d
        if x > DKMAX:
            return 1.0
        t_0 = math.tanh(x)
        om = math.sqrt(rt.G * xk * t_0)
        c_0 = om / xk
        if x < eps:
            v_g = c_0
        else:
            v_g = 0.5 * c_0 * (1.0 + 2.0 * x / math.sinh(2.0 * x))
        dv_g = (t_0 - x * (1.0 - t_0**2)) ** 2 + \
            4.0 * x**2 * t_0**2 * (1.0 - t_0**2)
        xnl_1 = (9.0 * t_0**4 - 10.0 * t_0**2 + 9.0) / (8.0 * t_0**3)
        xnl_2 = ((2.0 * v_g - 0.5 * c_0) ** 2 / (rt.G * d - v_g**2) + 1.0) / x
        xnl = xnl_1 - xnl_2
        return xnl**2 / (dv_g * t_0**8)
    return 1.0


WETAIL = 0.25
WP1TAIL = 1.0 / 3.0
WP2TAIL = 0.5
XKDMIN = 0.75


def peak_ang(fl1, tb):
    """peak_ang.F90:60-160 → (xnu, sig_th); fl1 (npts, nang, nfre)."""
    npts, nang, nfre = fl1.shape
    zeps = 10.0 * np.finfo(np.float64).eps
    nsh = 1 + int(math.log(1.5) / math.log(rt.FRATIO))
    xnu = np.zeros(npts)
    sig_th = np.zeros(npts)
    for ij in range(npts):
        sum0, sum1, sum2 = zeps, 0.0, 0.0
        temp = 0.0
        for m in range(nfre):
            temp = fl1[ij, :, m].sum()
            sum0 += temp * tb.dfim[m]
            sum1 += temp * tb.dfimfr[m]
            sum2 += temp * tb.dfimfr2[m]
        delt25 = WETAIL * tb.fr[nfre - 1] * tb.delth
        coef_fr = WP1TAIL * tb.delth * tb.fr[nfre - 1] ** 2
        coef_fr2 = WP2TAIL * tb.delth * tb.fr[nfre - 1] ** 3
        sum0 += delt25 * temp
        sum1 += coef_fr * temp
        sum2 += coef_fr2 * temp
        if sum0 > zeps:
            xnu[ij] = math.sqrt(max(zeps, sum2 * sum0 / sum1**2 - 1.0))
        else:
            xnu[ij] = zeps

        xmax, mmax = 0.0, 2                      # 1-based MMAX
        for m in range(2, nfre):                 # Fortran M=2..NFRE-1
            for k in range(nang):
                if fl1[ij, k, m - 1] > xmax:
                    mmax = m
                    xmax = fl1[ij, k, m - 1]
        s1, s2 = zeps, 0.0
        sum_s, sum_c = 0.0, zeps
        mmstart = max(1, mmax - nsh)
        mmstop = min(nfre, mmax + nsh)
        for m in range(mmstart, mmstop + 1):
            for k in range(nang):
                sum_s += tb.sinth[k] * fl1[ij, k, m - 1]
                sum_c += tb.costh[k] * fl1[ij, k, m - 1]
            thmean = math.atan2(sum_s, sum_c)
            for k in range(nang):
                s1 += fl1[ij, k, m - 1] * tb.dfim[m - 1]
                s2 += math.cos(tb.th[k] - thmean) * fl1[ij, k, m - 1] \
                    * tb.dfim[m - 1]
        if s1 > zeps:
            r1 = s2 / s1
            sig_th[ij] = math.sqrt(2.0 * (1.0 - r1))
        else:
            sig_th[ij] = 0.0
    return xnu, sig_th


def transf_snl(xk0, d, xnu, sig_th):
    """transf_snl.F90:30-85."""
    eps = 0.0001
    if d < BATHYMAX and d > 0.0:
        x = xk0 * d
        if x > DKMAX:
            return 1.0
        xk = max(xk0, XKDMIN / d)
        x = xk * d
        t_0 = math.tanh(x)
        t_0_sq = t_0**2
        om = math.sqrt(rt.G * xk * t_0)
        c_0 = om / xk
        c_s_sq = rt.G * d
        if x < eps:
            v_g = c_0
        else:
            v_g = 0.5 * c_0 * (1.0 + 2.0 * x / math.sinh(2.0 * x))
        v_g_sq = v_g**2
        dv_g = (t_0 - x * (1.0 - t_0_sq)) ** 2 + \
            4.0 * x**2 * t_0_sq * (1.0 - t_0_sq)
        xnl_1 = (9.0 * t_0_sq**2 - 10.0 * t_0_sq + 9.0) / \
            (8.0 * t_0_sq * t_0)
        xnl_2 = ((2.0 * v_g - 0.5 * c_0) ** 2 / (rt.G * d - v_g_sq)
                 + 1.0) / x
        xnl_4 = 1.0 / (4.0 * t_0) * (2.0 * c_0 + v_g
                                     * (1.0 - t_0_sq)) ** 2 / \
            (c_s_sq - v_g_sq)
        alp = (1.0 - v_g_sq / c_s_sq) * c_0**2 / v_g_sq
        zfac = sig_th**2 / (sig_th**2 + alp * xnu**2)
        xnl = xnl_1 - xnl_2 + zfac * xnl_4
        out = xnl**2 / (dv_g * t_0_sq**4)
        return max(min(10.0, out), 0.1)
    return 1.0


def snonlin(fl1, fld, sl, wavnum, depth, akmean, tb, *, isnonlin=1):
    """snonlin.F90:120-495 — adds the DIA transfer onto (fld, sl)."""
    fld = fld.copy()
    sl = sl.copy()
    npts, nang, nfre = fl1.shape
    t = inisnonlin(nang, nfre, tb.fr, tb.delth)
    mfrstlw = t["mfrstlw"]
    mlsthg = t["mlsthg"]
    kfrh = t["kfrh"]

    enh = np.zeros((npts, mlsthg + 1))      # Fortran ENH(IJ, 1:MLSTHG)
    if isnonlin == 0:
        enhfr = np.maximum(0.75 * depth * akmean, 0.5)
        enhfr = 1.0 + (5.5 / enhfr) * (1.0 - 0.833 * enhfr) * \
            np.exp(-1.25 * enhfr)
        for mc in range(1, mlsthg + 1):
            enh[:, mc] = enhfr
    elif isnonlin == 1:
        for mc in range(1, nfre + 1):
            for ij in range(npts):
                enh[ij, mc] = max(min(ENH_MAX,
                                      transf(wavnum[ij, mc - 1], depth[ij])),
                                  ENH_MIN)
        for mc in range(nfre + 1, mlsthg + 1):
            xk = rt.GM1 * (tb.zpifr[nfre - 1]
                           * rt.FRATIO ** (mc - nfre)) ** 2
            for ij in range(npts):
                enh[ij, mc] = max(min(ENH_MAX, transf(xk, depth[ij])),
                                  ENH_MIN)
    elif isnonlin == 2:
        xnu, sig_th = peak_ang(fl1, tb)
        for mc in range(1, nfre + 1):
            for ij in range(npts):
                enh[ij, mc] = transf_snl(wavnum[ij, mc - 1], depth[ij],
                                         xnu[ij], sig_th[ij])
        for mc in range(nfre + 1, mlsthg + 1):
            xk = rt.GM1 * (tb.zpifr[nfre - 1]
                           * rt.FRATIO ** (mc - nfre)) ** 2
            for ij in range(npts):
                enh[ij, mc] = transf_snl(xk, depth[ij], xnu[ij],
                                         sig_th[ij])
    else:
        raise NotImplementedError

    mfr1stfr = -mfrstlw + 1
    mfrlstfr = nfre - kfrh + mfr1stfr

    # index helper: FL1(IJ,K,M) with 1-based K,M
    def f(ij, k, m):
        return fl1[ij, k - 1, m - 1]

    for mc in range(1, mlsthg + 1):
        mp = t["ikp"][mc]
        mp1 = t["ikp1"][mc]
        mm = t["ikm"][mc]
        mm1 = t["ikm1"][mc]
        ic, ip, ip1, im, im1 = t["inlcoef"][mc]
        (ftail, gw1, gw2, gw3, gw4, fklampa, fklampb, fklamp2, fklamp1,
         fklapa2, fklapb2, fklap12, fklap22, gw5, gw6, gw7, gw8, fklamma,
         fklammb, fklamm2, fklamm1, fklama2, fklamb2, fklam12,
         fklam22) = t["rnlcoef"][mc]

        ftemp = np.array([t["af11"][mc] * enh[ij, mc] for ij in range(npts)])

        for kh in (1, 2):
            for k in range(1, nang + 1):
                k1 = t["k1w"][(k, kh)]
                k2 = t["k2w"][(k, kh)]
                k11 = t["k11w"][(k, kh)]
                k21 = t["k21w"][(k, kh)]

                ad = np.zeros(npts)
                delad = np.zeros(npts)
                delap = np.zeros(npts)
                delam = np.zeros(npts)
                for ij in range(npts):
                    sap = gw1 * f(ij, k1, ip) + gw2 * f(ij, k11, ip) \
                        + gw3 * f(ij, k1, ip1) + gw4 * f(ij, k11, ip1)
                    sam = gw5 * f(ij, k2, im) + gw6 * f(ij, k21, im) \
                        + gw7 * f(ij, k2, im1) + gw8 * f(ij, k21, im1)
                    fij = f(ij, k, ic) * ftail
                    fad1 = fij * (sap + sam)
                    fad2 = fad1 - 2.0 * sap * sam
                    fad1 = fad1 + fad2
                    fcen = ftemp[ij] * fij
                    ad[ij] = fad2 * fcen
                    delad[ij] = fad1 * ftemp[ij]
                    delap[ij] = (fij - 2.0 * sam) * t["dal1"] * fcen
                    delam[ij] = (fij - 2.0 * sap) * t["dal2"] * fcen

                if mfr1stfr < mc < mfrlstfr:
                    # interior: all nine targets in range
                    sl[:, k - 1, mc - 1] -= 2.0 * ad
                    fld[:, k - 1, mc - 1] -= 2.0 * delad
                    sl[:, k2 - 1, mm - 1] += ad * fklamm1
                    fld[:, k2 - 1, mm - 1] += delam * fklam12
                    sl[:, k21 - 1, mm - 1] += ad * fklamm2
                    fld[:, k21 - 1, mm - 1] += delam * fklam22
                    sl[:, k2 - 1, mm1 - 1] += ad * fklamma
                    fld[:, k2 - 1, mm1 - 1] += delam * fklama2
                    sl[:, k21 - 1, mm1 - 1] += ad * fklammb
                    fld[:, k21 - 1, mm1 - 1] += delam * fklamb2
                    sl[:, k1 - 1, mp - 1] += ad * fklamp1
                    fld[:, k1 - 1, mp - 1] += delap * fklap12
                    sl[:, k11 - 1, mp - 1] += ad * fklamp2
                    fld[:, k11 - 1, mp - 1] += delap * fklap22
                    sl[:, k1 - 1, mp1 - 1] += ad * fklampa
                    fld[:, k1 - 1, mp1 - 1] += delap * fklapa2
                    sl[:, k11 - 1, mp1 - 1] += ad * fklampb
                    fld[:, k11 - 1, mp1 - 1] += delap * fklapb2
                elif mc >= mfrlstfr:
                    sl[:, k2 - 1, mm - 1] += ad * fklamm1
                    fld[:, k2 - 1, mm - 1] += delam * fklam12
                    sl[:, k21 - 1, mm - 1] += ad * fklamm2
                    fld[:, k21 - 1, mm - 1] += delam * fklam22
                    if mm1 <= nfre:
                        sl[:, k2 - 1, mm1 - 1] += ad * fklamma
                        fld[:, k2 - 1, mm1 - 1] += delam * fklama2
                        sl[:, k21 - 1, mm1 - 1] += ad * fklammb
                        fld[:, k21 - 1, mm1 - 1] += delam * fklamb2
                        if mc <= nfre:
                            sl[:, k - 1, mc - 1] -= 2.0 * ad
                            fld[:, k - 1, mc - 1] -= 2.0 * delad
                            if mp <= nfre:
                                sl[:, k1 - 1, mp - 1] += ad * fklamp1
                                fld[:, k1 - 1, mp - 1] += delap * fklap12
                                sl[:, k11 - 1, mp - 1] += ad * fklamp2
                                fld[:, k11 - 1, mp - 1] += delap * fklap22
                                if mp1 <= nfre:
                                    sl[:, k1 - 1, mp1 - 1] += ad * fklampa
                                    fld[:, k1 - 1, mp1 - 1] += delap * fklapa2
                                    sl[:, k11 - 1, mp1 - 1] += ad * fklampb
                                    fld[:, k11 - 1, mp1 - 1] += delap * fklapb2
                else:
                    if mm1 >= 1:
                        sl[:, k2 - 1, mm1 - 1] += ad * fklamma
                        fld[:, k2 - 1, mm1 - 1] += delam * fklama2
                        sl[:, k21 - 1, mm1 - 1] += ad * fklammb
                        fld[:, k21 - 1, mm1 - 1] += delam * fklamb2
                    sl[:, k - 1, mc - 1] -= 2.0 * ad
                    fld[:, k - 1, mc - 1] -= 2.0 * delad
                    sl[:, k1 - 1, mp - 1] += ad * fklamp1
                    fld[:, k1 - 1, mp - 1] += delap * fklap12
                    sl[:, k11 - 1, mp - 1] += ad * fklamp2
                    fld[:, k11 - 1, mp - 1] += delap * fklap22
                    sl[:, k1 - 1, mp1 - 1] += ad * fklampa
                    fld[:, k1 - 1, mp1 - 1] += delap * fklapa2
                    sl[:, k11 - 1, mp1 - 1] += ad * fklampb
                    fld[:, k11 - 1, mp1 - 1] += delap * fklapb2

    return fld, sl
