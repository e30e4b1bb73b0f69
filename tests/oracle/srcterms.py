"""Oracle: wind input, dissipation, wave stress, stress closure.

Transcribes (loop-for-loop, per-point scalars):
  - wsigstar.F90:48-120          gustiness std dev of u*
  - sinput_ard.F90:88-434        Ardhuin wind input + swell damping
  - sinput_jan.F90:84-300        Janssen quasi-linear wind input
  - init_sdiss_ardh.F90:44-98    saturation direction weights
  - sdissip_ard.F90:90-318       saturation + cumulative dissipation
  - sdissip_jan.F90:60-120       cycle-4 whitecapping
  - tau_phi_hf.F90:73-290        high-frequency stress/energy integrals
  - stresso.F90:63-240           wave stress from positive input
  - taut_z0.F90:93-344           u*/z0 Newton closure (both branches,
                                 LLGCBZ0 branch needs a stress_gc callable)
  - chnkmin.F90:28               minimum Charnock

Layout: fl1[npts, nang, nfre]; tunables come in via a PhysParams-like
object ``p`` (its values are pinned against setwavphys.F90 in
tests/test_oracle_srcterms.py).
"""

from __future__ import annotations

import math

import numpy as np

from . import reftables as rt

XKAPPA = 0.40
XNLEV = 10.0
ALPHAMAX = 0.11
SWELLF = 0.66
SWELLF2 = -0.018
SWELLF3 = 0.022
SWELLF5 = 1.2
SWELLF6 = 1.0
ABMIN = 0.3
ABMAX = 8.0
IAB = 200
SDSBR = 9.0e-4
ISDSDTH = 80
ISB = 2
IPSAT = 2
SSDSC2 = -2.2e-5
SSDSC4 = 1.0
SSDSC6 = 0.3
MICHE = 1.0
SSDSC3 = 0.0
SSDSBRF1 = 0.5
BRKPBCOEF = 28.16
RNU = 1.5e-5
RNUM = 0.11 * RNU
JTOT_TAUHF = 19
IDAMPING = 1
EPS1 = 0.00001          # yowtabl.F90 EPS1
WSPMIN = 1.0


def wsigstar(wswave, ufric, z0m, wstar, p):
    """wsigstar.F90:48-120 → sig_n (npts,)."""
    npts = wswave.shape[0]
    sig_n = np.zeros(npts)
    bg_gust = 0.0
    onethird = 1.0 / 3.0
    sig_nmax = 0.9
    c1, c2, p1, p2 = 1.03e-3, 0.04e-3, 1.48, -0.21
    if p.llgcbz0 or p.llnormagam:
        zn = RNUM
        for ij in range(npts):
            u10m1 = 1.0 / max(wswave[ij], WSPMIN)
            z0vis = zn / max(ufric[ij], rt.EPSUS)
            zchar = rt.G * (z0m[ij] - z0vis) / max(ufric[ij] ** 2, rt.EPSUS)
            zchar = max(min(zchar, ALPHAMAX), p.alphamin)
            bcd_loc = rt.BCDLIN * math.sqrt(zchar)
            c_d = rt.ACDLIN + bcd_loc * wswave[ij]
            dc_ddu = bcd_loc
            sig_conv = 1.0 + 0.5 * wswave[ij] / c_d * dc_ddu
            sig_n[ij] = min(sig_nmax, sig_conv * u10m1 * (
                bg_gust * ufric[ij] ** 3
                + 0.5 * XKAPPA * wstar[ij] ** 3) ** onethird)
    else:
        xkappad = 1.0 / XKAPPA
        for ij in range(npts):
            u10 = ufric[ij] * xkappad * (math.log(10.0) - math.log(z0m[ij]))
            u10 = max(u10, WSPMIN)
            u10m1 = 1.0 / u10
            c2u10p1 = c2 * u10**p1
            u10p2 = u10**p2
            c_d = (c1 + c2u10p1) * u10p2
            dc_ddu = (p2 * c1 + (p1 + p2) * c2u10p1) * u10p2 * u10m1
            sig_conv = 1.0 + 0.5 * u10 / c_d * dc_ddu
            sig_n[ij] = min(sig_nmax, sig_conv * u10m1 * (
                bg_gust * ufric[ij] ** 3
                + 0.5 * XKAPPA * wstar[ij] ** 3) ** onethird)
    return sig_n


def sinput_ard(ngst, llsneg, fl1, wavnum, cinv, xk2cg, wdwave, wswave,
               ufric, z0m, coswdif, sinwdif2, raorw, wstar, rnfac,
               tb, p, swellft):
    """sinput_ard.F90:88-434 → (fld, sl, spos, xllws)."""
    npts, nang, nfre = fl1.shape
    fld = np.zeros_like(fl1)
    sl = np.zeros_like(fl1)
    spos = np.zeros_like(fl1)
    xllws = np.zeros_like(fl1)

    avg_gst = 1.0 / ngst
    const1 = p.betamaxoxkappa2
    constn = tb.delth / (XKAPPA * rt.ZPI)
    abs_tauwshelter = abs(p.tauwshelter)
    ltauwshelter = abs_tauwshelter != 0.0

    if ngst > 1:
        sig_n = wsigstar(wswave, ufric, z0m, wstar, p)

    cstrnfac = constn * rnfac / raorw if p.llnormagam else None

    if llsneg:
        nu_air = RNU
        facm1_nu_air = 4.0 / nu_air
        fac_nu_air = RNUM
        fu = abs(SWELLF3)
        fud = SWELLF2
        delabm1 = float(IAB) / (ABMAX - ABMIN)

        uorbt = np.full(npts, rt.EPSMIN)
        aorb = np.full(npts, rt.EPSMIN)
        for m in range(nfre):
            sig = tb.zpifr[m]
            dfim_sig2 = tb.dfim[m] * sig**2
            temp = fl1[:, :, m].sum(axis=1)
            uorbt += dfim_sig2 * temp
            aorb += tb.dfim[m] * temp
        uorbt = 2.0 * np.sqrt(uorbt)
        aorb = 2.0 * np.sqrt(aorb)
        re = facm1_nu_air * uorbt * aorb
        fww = np.zeros(npts)
        temp2 = np.zeros(npts)
        for ij in range(npts):
            z0vis = fac_nu_air / max(ufric[ij], 0.0001)
            z0tub = p.z0rat * min(p.z0tubmax, z0m[ij])
            z0noz = max(z0vis, z0tub)
            zorb = aorb[ij] / z0noz
            xi = (math.log10(max(zorb, 3.0)) - ABMIN) * delabm1
            ind = min(IAB - 1, int(xi))
            deli1 = min(1.0, xi - float(ind))
            deli2 = 1.0 - deli1
            # Fortran SWELLFT(1..IAB); swellft[i] = SWELLFT(i+1)
            fww[ij] = swellft[ind - 1] * deli2 + swellft[ind] * deli1
            temp2[ij] = fww[ij] * uorbt[ij]
        if SWELLF6 == 1.0:
            re_c = np.full(npts, p.swellf4)
        else:
            re_c = p.swellf4 * (2.0 / aorb) ** (1.0 - SWELLF6)
        if p.swellf7 > 0.0:
            smooth = 0.5 * np.tanh((re - re_c) * p.swellf7m1)
            pturb = 0.5 + smooth
            pvisc = 0.5 - smooth
        else:
            pturb = np.where(re <= re_c, 0.0, 0.5)
            pvisc = np.where(re <= re_c, 0.5, 0.0)
        aird_pvisc = pvisc * raorw

    ustp = np.zeros((npts, 2))
    if ngst == 1:
        ustp[:, 0] = ufric
    else:
        ustp[:, 0] = ufric * (1.0 + sig_n)
        ustp[:, 1] = ufric * (1.0 - sig_n)
    ustpm1 = np.zeros((npts, 2))
    for igst in range(ngst):
        ustpm1[:, igst] = 1.0 / np.maximum(ustp[:, igst], rt.EPSUS)

    if ltauwshelter:
        xstress = np.zeros((npts, 2))
        ystress = np.zeros((npts, 2))
        taux = np.zeros((npts, 2))
        tauy = np.zeros((npts, 2))
        for igst in range(ngst):
            usg2 = ustp[:, igst] ** 2
            taux[:, igst] = usg2 * np.sin(wdwave)
            tauy[:, igst] = usg2 * np.cos(wdwave)
        rogoroair = rt.G / raorw
        usdirp = np.zeros((npts, 2))
    else:
        coslp = np.zeros((npts, nang, 2))
        for igst in range(2):
            coslp[:, :, igst] = coswdif

    gamnorma = np.ones((npts, 2))
    dstab = np.zeros((npts, nang, 2))

    for m in range(nfre):
        sig = tb.zpifr[m]
        sig2 = sig**2
        const = sig * const1
        if llsneg:
            coef = -SWELLF * 16.0 * sig2 / rt.G
            coef5 = -SWELLF5 * 2.0 * math.sqrt(2.0 * nu_air * sig)

        if ltauwshelter:
            for igst in range(ngst):
                taupx = taux[:, igst] - abs_tauwshelter * xstress[:, igst]
                taupy = tauy[:, igst] - abs_tauwshelter * ystress[:, igst]
                usdirp[:, igst] = np.arctan2(taupx, taupy)
                ustp[:, igst] = (taupx**2 + taupy**2) ** 0.25
                ustpm1[:, igst] = 1.0 / np.maximum(ustp[:, igst], rt.EPSUS)
            constf = rogoroair * cinv[:, m] * tb.dfim[m]
            coslp = np.zeros((npts, nang, 2))
            for igst in range(ngst):
                for k in range(nang):
                    coslp[:, k, igst] = np.cos(tb.th[k] - usdirp[:, igst])

        ucn = np.zeros((npts, 2))
        ucnzalpd = np.zeros((npts, 2))
        for igst in range(ngst):
            ucn[:, igst] = ustp[:, igst] * cinv[:, m]
            ucnzalpd[:, igst] = XKAPPA / (ucn[:, igst] + p.zalp)
        zcn = np.log(wavnum[:, m] * z0m)
        cnsn = const * raorw

        if p.llnormagam:
            xngamconst = cstrnfac * xk2cg[:, m]

        if llsneg:
            dstab1 = coef5 * aird_pvisc * wavnum[:, m]
            temp1 = coef * raorw

        gam0 = np.zeros((npts, nang, 2))
        for igst in range(ngst):
            for k in range(nang):
                for ij in range(npts):
                    if coslp[ij, k, igst] > 0.01:
                        x = coslp[ij, k, igst] * ucn[ij, igst]
                        zlog = zcn[ij] + \
                            ucnzalpd[ij, igst] / coslp[ij, k, igst]
                        if zlog < 0.0:
                            zlog2x = zlog * zlog * x
                            gam0[ij, k, igst] = (math.exp(zlog) * zlog2x
                                                 * zlog2x * cnsn[ij])
                            xllws[ij, k, m] = 1.0

            if p.llnormagam:
                sumf = np.zeros(npts)
                sumfsin2 = np.zeros(npts)
                for k in range(nang):
                    sumf += gam0[:, k, igst] * fl1[:, k, m]
                    sumfsin2 += gam0[:, k, igst] * fl1[:, k, m] \
                        * sinwdif2[:, k]
                znz = xngamconst * ustpm1[:, igst]
                gamnorma[:, igst] = (1.0 + znz * sumfsin2) / \
                    (1.0 + znz * sumf)

            if llsneg:
                for k in range(nang):
                    dstab2 = temp1 * (temp2 + (fu + fud * coslp[:, k, igst])
                                      * ustp[:, igst])
                    dstab[:, k, igst] = dstab1 + pturb * dstab2

        for k in range(nang):
            slp_avg = np.zeros(npts)
            flp_avg = np.zeros(npts)
            for igst in range(ngst):
                slp = gam0[:, k, igst] * gamnorma[:, igst]
                flp = slp + dstab[:, k, igst]
                slp = slp * fl1[:, k, m]
                if ltauwshelter:
                    const11 = constf * tb.sinth[k]
                    const22 = constf * tb.costh[k]
                    xstress[:, igst] += slp * const11
                    ystress[:, igst] += slp * const22
                slp_avg += slp
                flp_avg += flp
            spos[:, k, m] = avg_gst * slp_avg
            fld[:, k, m] = avg_gst * flp_avg
            sl[:, k, m] = fld[:, k, m] * fl1[:, k, m]
    return fld, sl, spos, xllws


def sinput_jan(ngst, llsneg, fl1, wavnum, cinv, xk2cg, wdwave, wswave,
               ufric, z0m, coswdif, sinwdif2, raorw, wstar, rnfac, tb, p):
    """sinput_jan.F90:84-300 → (fld, sl, spos, xllws)."""
    npts, nang, nfre = fl1.shape
    fld = np.zeros_like(fl1)
    sl = np.zeros_like(fl1)
    spos = np.zeros_like(fl1)
    xllws = np.zeros_like(fl1)

    const1 = p.betamaxoxkappa2
    const3 = IDAMPING * 2.0 * XKAPPA / const1
    xkappad = 1.0 / XKAPPA
    constn = tb.delth / (XKAPPA * rt.ZPI)

    if ngst > 1:
        sig_n = wsigstar(wswave, ufric, z0m, wstar, p)

    lz = coswdif > 0.01
    cstrnfac = constn * rnfac / raorw if p.llnormagam else None

    if ngst == 1:
        wsin = [1.0]
        sigdev = np.ones((npts, 1))
    else:
        wsin = [0.5, 0.5]
        sigdev = np.stack([1.0 - sig_n, 1.0 + sig_n], axis=1)

    us = ufric[:, None] * sigdev
    ustpm1 = 1.0 / np.maximum(us, rt.EPSUS)

    for m in range(nfre):
        const = tb.zpifr[m] * const1
        ztanhkd = tb.zpifr[m] ** 2 / (rt.G * wavnum[:, m])
        cnsn = const * ztanhkd * raorw

        ucn = np.zeros((npts, ngst))
        const3_ucn2 = np.zeros((npts, ngst))
        ucnd = np.zeros((npts, ngst))
        zcn = np.zeros((npts, ngst))
        xvd = np.zeros((npts, ngst))
        for igst in range(ngst):
            ucn[:, igst] = us[:, igst] * cinv[:, m] + p.zalp
            const3_ucn2[:, igst] = const3 * ucn[:, igst] ** 2
            ucnd[:, igst] = 1.0 / ucn[:, igst]
            zcn[:, igst] = np.log(wavnum[:, m] * z0m)
            xvd[:, igst] = 1.0 / (-us[:, igst] * xkappad * zcn[:, igst]
                                  * cinv[:, m])

        gam0 = np.zeros((npts, nang, ngst))
        for k in range(nang):
            for igst in range(ngst):
                for ij in range(npts):
                    if lz[ij, k]:
                        zlog = zcn[ij, igst] + \
                            XKAPPA / coswdif[ij, k] * ucnd[ij, igst]
                        if zlog < 0.0:
                            x = coswdif[ij, k] * ucn[ij, igst]
                            zlog2x = zlog * zlog * x
                            gam0[ij, k, igst] = (zlog2x * zlog2x
                                                 * math.exp(zlog) * cnsn[ij])
                            xllws[ij, k, m] = 1.0

        gamnorma = np.ones((npts, ngst))
        if p.llnormagam:
            xngamconst = cstrnfac * xk2cg[:, m]
            for igst in range(ngst):
                sumf = np.zeros(npts)
                sumfsin2 = np.zeros(npts)
                for k in range(nang):
                    sumf += gam0[:, k, igst] * fl1[:, k, m]
                    sumfsin2 += gam0[:, k, igst] * fl1[:, k, m] \
                        * sinwdif2[:, k]
                znz = xngamconst * ustpm1[:, igst]
                gamnorma[:, igst] = (1.0 + znz * sumfsin2) / \
                    (1.0 + znz * sumf)

        for k in range(nang):
            ufac1 = wsin[0] * gam0[:, k, 0] * gamnorma[:, 0]
            if ngst == 2:
                ufac1 = ufac1 + wsin[1] * gam0[:, k, 1] * gamnorma[:, 1]
            if llsneg:
                zbeta = const3_ucn2[:, 0] * (coswdif[:, k] - xvd[:, 0])
                ufac2 = wsin[0] * zbeta
                if ngst == 2:
                    zbeta = const3_ucn2[:, 1] * (coswdif[:, k] - xvd[:, 1])
                    ufac2 = ufac2 + wsin[1] * zbeta
            else:
                ufac2 = np.zeros(npts)
            fld[:, k, m] = ufac1 + ufac2 * cnsn
            spos[:, k, m] = ufac1 * fl1[:, k, m]
            sl[:, k, m] = fld[:, k, m] * fl1[:, k, m]
    return fld, sl, spos, xllws


def init_sdiss_ardh(nang, th, delth):
    """init_sdiss_ardh.F90:44-98 → (nsdsnth, indicessat 1-based, satweights)."""
    nangd = nang // 2
    nsdsnth = min(int(np.rint(ISDSDTH * rt.RAD / delth)), nangd - 1)
    delth_trunc = (th[0] + ISDSDTH * rt.RAD) - (th[nsdsnth] - 0.5 * delth)
    delth_trunc = max(0.0, min(delth_trunc, delth))
    indicessat = np.zeros((nang, nsdsnth * 2 + 1), dtype=int)
    satweights = np.zeros((nang, nsdsnth * 2 + 1))
    for k in range(1, nang + 1):
        for i_int in range(k - nsdsnth, k + nsdsnth + 1):
            j_int = i_int
            if i_int < 1:
                j_int = i_int + nang
            if i_int > nang:
                j_int = i_int - nang
            col = i_int - (k - nsdsnth)
            indicessat[k - 1, col] = j_int
            if i_int == k - nsdsnth or i_int == k + nsdsnth:
                delth_loc = delth_trunc
            else:
                delth_loc = delth
            satweights[k - 1, col] = delth_loc * \
                math.cos(th[k - 1] - th[j_int - 1]) ** ISB
    return nsdsnth, indicessat, satweights


def sdissip_ard(fl1, fld, sl, wavnum, cgroup, xk2cg, ufric, coswdif,
                raorw, tb, p):
    """sdissip_ard.F90:90-318 — adds onto (fld, sl)."""
    fld = fld.copy()
    sl = sl.copy()
    npts, nang, nfre = fl1.shape
    nsdsnth, indicessat, satweights = init_sdiss_ardh(nang, tb.th, tb.delth)

    epsr = math.sqrt(SDSBR)
    tpiinv = 1.0 / rt.ZPI
    tmp03 = 1.0 / (SDSBR * MICHE)
    ssdsc6m1 = 1.0 - SSDSC6

    facsat = wavnum * tpiinv * xk2cg              # (npts, nfre)
    bth = np.zeros((npts, nang, nfre))
    bth0 = np.zeros((npts, nfre))
    for m in range(nfre):
        for k in range(nang):
            for k2 in range(nsdsnth * 2 + 1):
                kk = indicessat[k, k2]            # 1-based
                bth[:, k, m] += satweights[k, k2] * fl1[:, kk - 1, m]
            bth[:, k, m] *= facsat[:, m]
            bth0[:, m] = np.maximum(bth0[:, m], bth[:, k, m])

    d = np.zeros((npts, nang, nfre))
    for m in range(nfre):
        ssdsc2_sig = SSDSC2 * tb.zpifr[m]
        zcoef = ssdsc2_sig * SSDSC6
        zcoefm1 = ssdsc2_sig * ssdsc6m1
        for k in range(nang):
            d[:, k, m] = (zcoef * np.maximum(
                0.0, bth0[:, m] * tmp03 - SSDSC4) ** IPSAT
                + zcoefm1 * np.maximum(
                    0.0, bth[:, k, m] * tmp03 - SSDSC4) ** IPSAT)

    if SSDSC3 != 0.0:
        nangd = nang // 2
        xlogdfrth = math.log(rt.FRATIO) * tb.delth
        brlambda = BRKPBCOEF / (2.0 * rt.ZPI**2)
        tmp02 = SSDSC3 * brlambda
        ndikcumul = int(np.rint(-math.log(SSDSBRF1) / math.log(rt.FRATIO)))
        c_ = tb.zpifr[None, :] / wavnum
        c_c = c_**2
        dsip = tmp02 * tb.zpifr[None, :] * xlogdfrth / cgroup
        temp1 = (bth0 > SDSBR).astype(float)
        scumul = np.zeros((npts, nang, nfre))
        for m2 in range(nfre - ndikcumul):
            for k2 in range(nang):
                scumul[:, k2, m2] = temp1[:, m2] * np.maximum(
                    np.sqrt(bth[:, k2, m2]) - epsr, 0.0) ** 2
        renewalfreq = np.zeros((npts, nang, nfre))
        for m in range(ndikcumul, nfre):       # Fortran M=NDIKCUMUL+1..NFRE
            mi = m + 1                          # 1-based M
            nm2 = mi - ndikcumul                # M-NDIKCUMUL
            trpz_dsip = np.zeros((npts, nfre))
            if nm2 >= 3:
                trpz_dsip[:, 0] = 0.5 * dsip[:, 0]
                for m2 in range(1, nm2 - 1):
                    trpz_dsip[:, m2] = dsip[:, m2]
                trpz_dsip[:, nm2 - 1] = 0.5 * dsip[:, nm2 - 1]
            else:
                for m2 in range(nm2):
                    trpz_dsip[:, m2] = dsip[:, m2]
            wcumul = np.zeros((npts, nangd + 1, nfre))
            for m2 in range(nm2):
                for kk in range(nangd + 1):
                    wcumul[:, kk, m2] = np.sqrt(np.abs(
                        c_c[:, m] + c_c[:, m2]
                        - 2.0 * c_[:, m] * c_[:, m2]
                        * math.cos(kk * tb.delth))) * trpz_dsip[:, m2]
            for k in range(1, nang + 1):
                for m2 in range(nm2):
                    for k2 in range(1, nang + 1):
                        kk = abs(k2 - k)
                        if kk > nangd:
                            kk = kk - nangd
                        renewalfreq[:, k - 1, m] += \
                            wcumul[:, kk, m2] * scumul[:, k2 - 1, m2]
        d += renewalfreq

    if p.ssdsc5 != 0.0:
        tmp01 = 2.0 * p.ssdsc5 / rt.G
        facturb = tmp01 * raorw * ufric * ufric
        for m in range(nfre):
            facwtrb = tb.zpifr[m] * wavnum[:, m] * facturb
            for k in range(nang):
                d[:, k, m] -= facwtrb * coswdif[:, k]

    for m in range(nfre):
        for k in range(nang):
            sl[:, k, m] += d[:, k, m] * fl1[:, k, m]
            fld[:, k, m] += d[:, k, m]
    return fld, sl


def sdissip_jan(fl1, fld, sl, wavnum, emean, f1mean, xkmean, tb, p):
    """sdissip_jan.F90:60-120 — adds onto (fld, sl)."""
    fld = fld.copy()
    sl = sl.copy()
    npts, nang, nfre = fl1.shape
    delta_sdism1 = 1.0 - p.delta_sdis
    conss = p.cdis * rt.ZPI
    sds = conss * f1mean * emean**2 * xkmean**4
    cvis = RNU * p.cdisvis
    for m in range(nfre):
        x = wavnum[:, m] / xkmean
        xk2 = wavnum[:, m] ** 2
        temp1 = sds * x * (delta_sdism1 + p.delta_sdis * x) + cvis * xk2
        for k in range(nang):
            fld[:, k, m] += temp1
            sl[:, k, m] += temp1 * fl1[:, k, m]
    return fld, sl


def tau_phi_hf(mij, ltauwshelter, ufric, z0m, fl1, aird, rnfac,
               coswdif, sinwdif2, ust, tb, p, x0tauhf, wtauhf,
               llphihf, *, gamnconst):
    """tau_phi_hf.F90:73-290 (non-LLGCBZ0: ZSUP=log 1) →
    (tauhf, phihf, ust_out). mij is 1-based."""
    npts, nang, nfre = fl1.shape
    ust = ust.copy()
    tauhf = np.zeros(npts)
    phihf = np.zeros(npts)
    x0g = x0tauhf * rt.G
    ustph = ust.copy()

    xloggz0 = np.log(rt.G * z0m)
    sqrtz0og = np.sqrt(z0m * rt.GM1)
    sqrtgz0 = 1.0 / sqrtz0og
    zinf = np.zeros(npts)
    consttau = np.zeros(npts)
    f1dcos3 = np.zeros(npts)
    f1dcos2 = np.zeros(npts)
    f1dsin2 = np.zeros(npts)
    f1d = np.zeros(npts)
    for ij in range(npts):
        omegacc = max(tb.zpifr[mij[ij] - 1], x0g / ust[ij])
        zinf[ij] = math.log(omegacc * sqrtz0og[ij])
        consttau[ij] = rt.ZPI4GM2 * tb.fr5[mij[ij] - 1]
        for k in range(nang):
            cosw = max(coswdif[ij, k], 0.0)
            fcosw2 = fl1[ij, k, mij[ij] - 1] * cosw**2
            f1dcos3[ij] += fcosw2 * cosw
            f1dcos2[ij] += fcosw2
            f1dsin2[ij] += fl1[ij, k, mij[ij] - 1] * sinwdif2[ij, k]
            f1d[ij] += fl1[ij, k, mij[ij] - 1]
    f1dcos3 *= tb.delth
    f1dcos2 *= tb.delth
    f1dsin2 *= tb.delth
    f1d *= tb.delth

    const1 = np.zeros(npts)
    const2 = np.zeros(npts)
    if p.llnormagam:
        for ij in range(npts):
            confg = gamnconst * tb.fr5[mij[ij] - 1] * rnfac[ij] * sqrtgz0[ij]
            const1[ij] = confg * f1dsin2[ij]
            const2[ij] = confg * f1d[ij]

    zsup = np.zeros(npts)                 # ZSUPMAX = log(1)
    taul = ust**2
    delz = np.maximum((zsup - zinf) / (JTOT_TAUHF - 1), 0.0)

    if ltauwshelter:
        for ij in range(npts):
            for j in range(JTOT_TAUHF):
                y = math.exp(zinf[ij] + j * delz[ij])
                omega = y * sqrtgz0[ij]
                cm1 = omega * rt.GM1
                zx = ust[ij] * cm1 + p.zalp
                zarg = XKAPPA / zx
                zlog = xloggz0[ij] + 2.0 * math.log(cm1) + zarg
                zlog = min(zlog, 0.0)
                zbeta = zlog**4 * math.exp(zlog)
                znz = zbeta * ust[ij] * y
                gamnorma = (1.0 + const1[ij] * znz) / \
                    (1.0 + const2[ij] * znz)
                fnc2 = (f1dcos3[ij] * consttau[ij] * zbeta * taul[ij]
                        * wtauhf[j] * delz[ij] * gamnorma)
                taul[ij] = max(taul[ij] - p.tauwshelter * fnc2, 0.0)
                ust[ij] = math.sqrt(taul[ij])
                tauhf[ij] += fnc2
    else:
        for ij in range(npts):
            for j in range(JTOT_TAUHF):
                y = math.exp(zinf[ij] + j * delz[ij])
                omega = y * sqrtgz0[ij]
                cm1 = omega * rt.GM1
                zx = ust[ij] * cm1 + p.zalp
                zarg = XKAPPA / zx
                zlog = xloggz0[ij] + 2.0 * math.log(cm1) + zarg
                zlog = min(zlog, 0.0)
                zbeta = zlog**4 * math.exp(zlog)
                fnc2 = zbeta * wtauhf[j]
                znz = zbeta * ust[ij] * y
                gamnorma = (1.0 + const1[ij] * znz) / \
                    (1.0 + const2[ij] * znz)
                tauhf[ij] += fnc2 * gamnorma
            tauhf[ij] = f1dcos3[ij] * consttau[ij] * taul[ij] \
                * tauhf[ij] * delz[ij]

    if llphihf:
        taul = ustph**2
        delz = np.maximum((0.0 - zinf) / (JTOT_TAUHF - 1), 0.0)
        constphi = aird * rt.ZPI4GM1 * np.array(
            [tb.fr5[mij[ij] - 1] for ij in range(npts)])
        if ltauwshelter:
            for ij in range(npts):
                for j in range(JTOT_TAUHF):
                    y = math.exp(zinf[ij] + j * delz[ij])
                    omega = y * sqrtgz0[ij]
                    cm1 = omega * rt.GM1
                    zx = ustph[ij] * cm1 + p.zalp
                    zarg = XKAPPA / zx
                    zlog = xloggz0[ij] + 2.0 * math.log(cm1) + zarg
                    zlog = min(zlog, 0.0)
                    zbeta = zlog**4 * math.exp(zlog)
                    znz = zbeta * ust[ij] * y
                    gamnorma = (1.0 + const1[ij] * znz) / \
                        (1.0 + const2[ij] * znz)
                    fnc2 = zbeta * taul[ij] * wtauhf[j] * delz[ij] * gamnorma
                    taul[ij] = max(
                        taul[ij] - p.tauwshelter * f1dcos3[ij]
                        * consttau[ij] * fnc2, 0.0)
                    ustph[ij] = math.sqrt(taul[ij])
                    phihf[ij] += fnc2 / y
                phihf[ij] = f1dcos2[ij] * constphi[ij] * sqrtz0og[ij] \
                    * phihf[ij]
        else:
            for ij in range(npts):
                for j in range(JTOT_TAUHF):
                    y = math.exp(zinf[ij] + j * delz[ij])
                    omega = y * sqrtgz0[ij]
                    cm1 = omega * rt.GM1
                    zx = ustph[ij] * cm1 + p.zalp
                    zarg = XKAPPA / zx
                    zlog = xloggz0[ij] + 2.0 * math.log(cm1) + zarg
                    zlog = min(zlog, 0.0)
                    zbeta = zlog**4 * math.exp(zlog)
                    znz = zbeta * ust[ij] * y
                    gamnorma = (1.0 + const1[ij] * znz) / \
                        (1.0 + const2[ij] * znz)
                    fnc2 = zbeta * wtauhf[j] * gamnorma
                    phihf[ij] += fnc2 / y
                phihf[ij] = f1dcos2[ij] * constphi[ij] * sqrtz0og[ij] \
                    * taul[ij] * phihf[ij] * delz[ij]
    return tauhf, phihf, ust


def stresso(fl1, sl, spos, cinv, mij, rhowgdfth, wdwave, ufric, z0m,
            aird, rnfac, coswdif, sinwdif2, tb, p, x0tauhf, wtauhf,
            llphiwa, *, gamnconst):
    """stresso.F90:63-240 → (tauw, tauwdir, phiwa). mij 1-based."""
    npts, nang, nfre = fl1.shape
    phiwa = np.zeros(npts)
    xstress = np.zeros(npts)
    ystress = np.zeros(npts)

    if llphiwa:
        for m in range(nfre):
            for k in range(nang):
                phiwa += (sl[:, k, m] - spos[:, k, m]) * tb.rhowg_dfim[m]

    for m in range(nfre):
        sumx = np.zeros(npts)
        sumy = np.zeros(npts)
        sumt = np.zeros(npts)
        for k in range(nang):
            sumx += spos[:, k, m] * tb.sinth[k]
            sumy += spos[:, k, m] * tb.costh[k]
            sumt += spos[:, k, m]
        cmrhowgdfth = rhowgdfth[:, m] * cinv[:, m]
        xstress += cmrhowgdfth * sumx
        ystress += cmrhowgdfth * sumy
        if llphiwa:
            phiwa += rhowgdfth[:, m] * sumt

    xstress /= np.maximum(aird, 1.0)
    ystress /= np.maximum(aird, 1.0)

    if p.iphys == 0 or p.tauwshelter == 0.0:
        ltauwshelter = False
        usdirp = wdwave.copy()
        ust = ufric.copy()
    else:
        ltauwshelter = True
        taux = ufric**2 * np.sin(wdwave)
        tauy = ufric**2 * np.cos(wdwave)
        taupx = taux - p.tauwshelter * xstress
        taupy = tauy - p.tauwshelter * ystress
        usdirp = np.arctan2(taupx, taupy)
        ust = (taupx**2 + taupy**2) ** 0.25

    tauhf, phihf, _ = tau_phi_hf(
        mij, ltauwshelter, ufric, z0m, fl1, aird, rnfac, coswdif,
        sinwdif2, ust, tb, p, x0tauhf, wtauhf, llphiwa,
        gamnconst=gamnconst)

    xstress += tauhf * np.sin(usdirp)
    ystress += tauhf * np.cos(usdirp)
    tauw = np.sqrt(xstress**2 + ystress**2)
    tauw = np.maximum(tauw, 0.0)
    tauwdir = np.arctan2(xstress, ystress)
    if not p.llgcbz0:
        tautous2 = 1.0 / (1.0 + EPS1)
        tauw = np.minimum(tauw, ufric**2 * tautous2)
    if llphiwa:
        phiwa += phihf
    return tauw, tauwdir, phiwa


def chnkmin(u10, p):
    """chnkmin.F90:28."""
    return p.alphamin + (p.alpha - p.alphamin) * 0.5 * \
        (1.0 - np.tanh(u10 - p.chnkmin_u))


def cdm(u):
    """cdm.func.h."""
    return max(min(0.0006 + 0.00008 * u,
                   0.001 + 0.0018 * math.exp(-0.05 * (u - 33.0))), 0.001)


def taut_z0(iusfg, halp, utop, udir, tauw, tauwdir, rnfac, ustar_in, p,
            *, stress_gc=None, omegagc=None):
    """taut_z0.F90:93-344 → (ustar, z0, z0b, chrnck).

    Non-LLGCBZ0 branch is self-contained; the LLGCBZ0 branch needs
    ``stress_gc(ang_gc, ustar, z0, z0min, halp, rnfac) -> tau`` passed in.
    """
    npts = utop.shape[0]
    niter = 18
    twoxmp1 = 3.0
    pmax = 0.99
    z0min = 0.000001
    ustar = ustar_in.copy()
    z0 = np.zeros(npts)
    z0b = np.zeros(npts)
    chrnck = np.zeros(npts)

    xlogxl = math.log(XNLEV)
    us2totauw = 1.0 + EPS1
    rnueff = 0.04 * RNU
    rnukappam1 = rnueff / XKAPPA
    pce_gc = 0.001 * iusfg + (1 - iusfg) * 0.005

    cosdiff = np.cos(udir - tauwdir)
    tauwact = np.maximum(tauw * cosdiff, rt.EPSMIN)
    llcosdiff = cosdiff > 0.9

    if p.llgcbz0:
        if p.llcapchnk:
            alphaog = chnkmin(utop, p) * rt.GM1
        else:
            alphaog = np.zeros(npts)

        usmax = np.maximum(
            -0.21339 + 0.093698 * utop - 0.0020944 * utop**2
            + 5.5091e-5 * utop**3, 0.03)
        tauweff = np.minimum(tauwact * us2totauw, usmax**2)

        if iusfg == 0:
            alphagm1 = p.alpha * rt.GM1
            for ij in range(npts):
                if utop[ij] < 1.0:
                    cdfg = 0.002
                elif llcosdiff[ij]:
                    x = min(tauwact[ij] / max(ustar[ij], rt.EPSUS) ** 2,
                            pmax)
                    zchar = min(
                        alphagm1 * ustar[ij] ** 2 / math.sqrt(1.0 - x),
                        0.05 * math.exp(-0.05 * (utop[ij] - 35.0)))
                    zchar = min(zchar, ALPHAMAX)
                    cdfg = rt.ACDLIN + rt.BCDLIN * math.sqrt(zchar) * utop[ij]
                else:
                    cdfg = cdm(utop[ij])
                ustar[ij] = utop[ij] * math.sqrt(cdfg)

        w1 = 0.85 - 0.05 * (np.tanh(10.0 * (utop - 5.0)) + 1.0)

        for ij in range(npts):
            xkutop = XKAPPA * utop[ij]
            ustold = ustar[ij]
            tauold = ustold**2
            tauunr = 0.0
            converged = False
            for _ in range(niter):
                z0[ij] = max(XNLEV / (math.exp(min(xkutop / ustold, 50.0))
                                      - 1.0), z0min)
                tauv = rnukappam1 * ustold / z0[ij]
                ang_gc = p.ang_gc_a + p.ang_gc_b * \
                    math.tanh(p.ang_gc_c * tauold)
                tauunr = stress_gc(ang_gc, ustar[ij], z0[ij], z0min,
                                   halp[ij], rnfac[ij])
                taunew = tauweff[ij] + tauv + tauunr
                ustnew = math.sqrt(taunew)
                ustar[ij] = w1[ij] * ustold + (1.0 - w1[ij]) * ustnew
                delu = ustar[ij] - ustold
                if abs(delu) < pce_gc * ustar[ij]:
                    converged = True
                    break
                tauold = ustar[ij] ** 2
                ustold = ustar[ij]

            x = tauweff[ij] / tauold
            if (not converged) and x >= pmax:
                cdfg = cdm(utop[ij])
                ustar[ij] = utop[ij] * math.sqrt(cdfg)
                z0minrst = ustar[ij] ** 2 * p.alpha * rt.GM1
                z0[ij] = max(XNLEV / (math.exp(xkutop / ustar[ij]) - 1.0),
                             z0minrst)
                z0b[ij] = z0minrst
            else:
                z0[ij] = max(XNLEV / (math.exp(xkutop / ustar[ij]) - 1.0),
                             z0min)
                z0b[ij] = z0[ij] * math.sqrt(tauunr / tauold)

            if x < pmax:
                usnrf = ustar[ij]
                z0nrf = z0[ij]
                z0bnrf = z0b[ij]
                ustold = ustar[ij]
                tauold = max(ustold**2, tauweff[ij])
                alpog = max(min(z0b[ij] / tauold, ALPHAMAX), alphaog[ij])
                converged2 = False
                xloc = 0.0
                for _ in range(niter):
                    xloc = min(tauweff[ij] / tauold, pmax)
                    ustm1 = 1.0 / max(ustold, rt.EPSUS)
                    z0vis = RNUM * ustm1
                    hz0viso1mx = 0.5 * z0vis / (1.0 - xloc)
                    z0b[ij] = alpog * tauold
                    z0[ij] = hz0viso1mx + math.sqrt(
                        hz0viso1mx**2 + z0b[ij] ** 2 / (1.0 - xloc))
                    xologz0 = 1.0 / math.log(XNLEV / z0[ij] + 1.0)
                    f = ustold - xkutop * xologz0
                    zz = 2.0 * ustm1 * (3.0 * z0b[ij] ** 2
                                        + 0.5 * z0vis * z0[ij]
                                        - z0[ij] ** 2) / \
                        (2.0 * z0[ij] ** 2 * (1.0 - xloc) - z0vis * z0[ij])
                    delf = 1.0 - xkutop * xologz0**2 * zz
                    if delf != 0.0:
                        ustar[ij] = ustold - f / delf
                    taunew = max(ustar[ij] ** 2, tauweff[ij])
                    ustar[ij] = math.sqrt(taunew)
                    delt = taunew - tauold
                    if abs(delt) < pce_gc * tauold:
                        converged2 = True
                        break
                    tauold = taunew
                    ustold = ustar[ij]
                if not converged2:
                    ustar[ij] = usnrf
                    z0[ij] = z0nrf
                    z0b[ij] = z0bnrf
                    ustm1 = 1.0 / max(ustar[ij], rt.EPSUS)
                    z0vis = RNUM * ustm1
                    chrnck[ij] = max(
                        rt.G * (z0[ij] - z0vis) * ustm1**2, p.alphamin)
                else:
                    chrnck[ij] = max(
                        rt.G * (z0b[ij] / math.sqrt(1.0 - xloc))
                        / max(ustar[ij], rt.EPSUS) ** 2, p.alphamin)
            else:
                ustm1 = 1.0 / max(ustar[ij], rt.EPSUS)
                z0vis = RNUM * ustm1
                chrnck[ij] = max(
                    rt.G * (z0[ij] - z0vis) * ustm1**2, p.alphamin)
    else:
        tauweff = tauwact * us2totauw
        if p.llcapchnk:
            charnock_min = chnkmin(utop, p)
            xmin = 0.15 * (p.alpha - charnock_min)
            alphaog = charnock_min * rt.GM1
        else:
            xmin = np.zeros(npts)
            alphaog = np.full(npts, p.alpha * rt.GM1)

        for ij in range(npts):
            xkutop = XKAPPA * utop[ij]
            ustold = (1 - iusfg) * utop[ij] * math.sqrt(
                min(rt.ACD + rt.BCD * utop[ij], rt.CDMAX)) \
                + iusfg * ustar_in[ij]
            tauold = max(ustold**2, tauweff[ij])
            ustar[ij] = math.sqrt(tauold)
            ustm1 = 1.0 / max(ustar[ij], rt.EPSUS)
            z0ch = 0.0
            for _ in range(niter):
                x = max(tauwact[ij] / tauold, xmin[ij])
                z0ch = alphaog[ij] * tauold / math.sqrt(1.0 - x)
                z0vis = RNUM * ustm1
                z0tot = z0ch + z0vis
                xologz0 = 1.0 / (xlogxl - math.log(z0tot))
                f = ustar[ij] - xkutop * xologz0
                zz = ustm1 * (z0ch * (2.0 - twoxmp1 * x) / (1.0 - x)
                              - z0vis) / z0tot
                delf = 1.0 - xkutop * xologz0**2 * zz
                if delf != 0.0:
                    ustar[ij] = ustar[ij] - f / delf
                taunew = max(ustar[ij] ** 2, tauweff[ij])
                ustar[ij] = math.sqrt(taunew)
                if taunew == tauold:
                    break
                ustm1 = 1.0 / max(ustar[ij], rt.EPSUS)
                tauold = taunew
            z0[ij] = z0ch
            z0b[ij] = alphaog[ij] * tauold
            chrnck[ij] = max(rt.G * z0[ij] * ustm1**2, p.alphamin)
    return ustar, z0, z0b, chrnck
