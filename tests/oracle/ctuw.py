"""Oracle: CTU advection weights (ctuw.F90, ICASE=1 spherical branch).

Transcribes ctuw.F90:90-745 per-point: edge group velocities, up/downwind
displacement splits, the JXO/JYO/KCR slot bookkeeping from ctuwupdt.F90:
92-155, great-circle turning and refraction θ̇/σ̇ weights, and the final
obstruction multiplication (ctuw.F90:700-730).

Conventions: 0-based point indices with the land slot at ``nland``;
direction/frequency indices 0-based; weight slot layouts follow the JAX
implementation (wkpmn[...,0] = inflow from k−1, [...,1] = from k+1;
wmpmn likewise in frequency).
"""

from __future__ import annotations

import numpy as np

from . import reftables as rt

CIRC = 40000000.0 * 1.000199849   # see grid metrics; passed in instead


def dir_selectors(nang, costh, sinth):
    """ctuwupdt.F90:110-155 — JXO/JYO (1-based ic) and KCR (1-based
    physical corners 1=NE 2=SE 3=SW 4=NW)."""
    jxo = np.zeros((nang, 2), dtype=int)
    jyo = np.zeros((nang, 2), dtype=int)
    kcr = np.zeros((nang, 4), dtype=int)
    for k in range(nang):
        if costh[k] >= 0.0:
            jyo[k] = (1, 2)
            if sinth[k] >= 0.0:
                jxo[k] = (1, 2)
                kcr[k] = (3, 2, 4, 1)
            else:
                jxo[k] = (2, 1)
                kcr[k] = (2, 3, 1, 4)
        else:
            jyo[k] = (2, 1)
            if sinth[k] >= 0.0:
                jxo[k] = (1, 2)
                kcr[k] = (4, 1, 3, 2)
            else:
                jxo[k] = (2, 1)
                kcr[k] = (1, 4, 2, 3)
    return jxo, jyo, kcr


def ctuw(delpro, tb, st, cgroup_ext, omosnh2kd_ext, cosphm1_ext,
         u_ext, v_ext, *, irefra=0, thdd=None, thdc=None, sdot=None,
         curmask=None, circ, r_earth, irgg=1):
    """Returns dict of weights over all points (npts, nang, nfre_red...).

    ``st`` needs: klat (npts,2,2), klon (npts,2), kcor (npts,4,2) —
    0-based ext indices with land at nland; wlat (npts,2), wcor (npts,4),
    dp (npts,2), zdello_pt (npts,), xdella, tanph_pt (npts,);
    obslat/obslon (nfre_red, npts, 2), obscor (nfre_red, npts, 4).
    ``cgroup_ext``/``omosnh2kd_ext`` are (nfre_red, npts+1).
    """
    nfre_red, nptsp1 = cgroup_ext.shape
    npts = nptsp1 - 1
    nang = tb.nang
    costh, sinth = tb.costh, tb.sinth
    jxo, jyo, kcr = dir_selectors(nang, costh, sinth)
    cmtodeg = 360.0 / circ
    xdella = st.xdella
    if curmask is None:
        curmask = np.ones(npts)

    wlatn = np.zeros((npts, nang, nfre_red, 2, 2))
    wlonn = np.zeros((npts, nang, nfre_red, 2))
    wcorn = np.zeros((npts, nang, nfre_red, 4, 2))
    wkpmn = np.zeros((npts, nang, nfre_red, 3))   # slots [-1,0,1] → 0,1,2
    wmpmn = np.zeros((npts, nang, nfre_red, 3))
    sumwn = np.zeros((npts, nang, nfre_red))
    lcflfail = np.zeros(npts, dtype=bool)

    have_cur = irefra in (2, 3)

    for m in range(nfre_red):
        cg = cgroup_ext[m]
        for k in range(nang):
            for ij in range(npts):
                adxp = np.zeros(3)         # 1-based slots 1..2
                adyp = np.zeros(3)
                dxup = np.zeros(3)
                dxdw = np.zeros(3)
                dyup = np.zeros(3)
                dydw = np.zeros(3)
                for ic in (1, 2):
                    cgx = 0.5 * (cg[ij] + cg[st.klon[ij, ic - 1]]) \
                        * sinth[k] * cosphm1_ext[ij]
                    if irgg == 1:
                        cgyp = st.wlat[ij, ic - 1] \
                            * cg[st.klat[ij, ic - 1, 0]] \
                            + (1.0 - st.wlat[ij, ic - 1]) \
                            * cg[st.klat[ij, ic - 1, 1]]
                    else:
                        cgyp = cg[st.klat[ij, ic - 1, 0]]
                    cgy = 0.5 * (cg[ij] + st.dp[ij, ic - 1] * cgyp) \
                        * costh[k]
                    if have_cur:
                        uu = u_ext[ij] * cosphm1_ext[ij]
                        urel = cgx + uu
                        issu = 1 if np.sign(urel) == np.sign(cgx) else 0
                        vv = v_ext[ij] * 0.5 * (1.0 + st.dp[ij, ic - 1])
                        vrel = cgy + vv
                        issv = 1 if np.sign(vrel) == np.sign(cgy) else 0
                    else:
                        urel, issu = cgx, 1
                        vrel, issv = cgy, 1
                    dxp = -delpro * urel * cmtodeg
                    dyp = -delpro * vrel * cmtodeg
                    adxp[ic] = abs(dxp)
                    adyp[ic] = abs(dyp)
                    dxup[ic] = adxp[ic] * issu
                    dxdw[ic] = adxp[ic] * (1 - issu)
                    dyup[ic] = adyp[ic] * issv
                    dydw[ic] = adyp[ic] * (1 - issv)

                zdello = st.zdello_pt[ij]
                dxx = zdello - dxup[jxo[k, 1]] - dxdw[jxo[k, 0]]
                dyy = xdella - dyup[jyo[k, 1]] - dydw[jyo[k, 0]]
                aream1 = 1.0 / (zdello * xdella)

                weight = np.zeros(5)
                weight[jyo[k, 0]] = dxx * dyup[jyo[k, 0]] * aream1
                weight[jyo[k, 1]] = dxx * dydw[jyo[k, 1]] * aream1
                wlatn[ij, k, m, 0, 0] = st.wlat[ij, 0] * weight[1]
                wlatn[ij, k, m, 0, 1] = (1.0 - st.wlat[ij, 0]) * weight[1]
                wlatn[ij, k, m, 1, 0] = st.wlat[ij, 1] * weight[2]
                wlatn[ij, k, m, 1, 1] = (1.0 - st.wlat[ij, 1]) * weight[2]

                wlonn[ij, k, m, jxo[k, 0] - 1] = \
                    dyy * dxup[jxo[k, 0]] * aream1
                wlonn[ij, k, m, jxo[k, 1] - 1] = \
                    dyy * dxdw[jxo[k, 1]] * aream1

                wgt = [dxup[jxo[k, 0]] * dyup[jyo[k, 0]] * aream1,
                       dxdw[jxo[k, 1]] * dyup[jyo[k, 0]] * aream1,
                       dxup[jxo[k, 0]] * dydw[jyo[k, 1]] * aream1,
                       dxdw[jxo[k, 1]] * dydw[jyo[k, 1]] * aream1]
                for icr in range(4):
                    pc = kcr[k, icr] - 1
                    wcorn[ij, k, m, icr, 0] = st.wcor[ij, pc] * wgt[icr]
                    wcorn[ij, k, m, icr, 1] = \
                        (1.0 - st.wcor[ij, pc]) * wgt[icr]

                sumwn[ij, k, m] = (
                    zdello * (dydw[jyo[k, 0]] + dyup[jyo[k, 1]])
                    + xdella * (dxup[jxo[k, 1]] + dxdw[jxo[k, 0]])
                    - (dxdw[jxo[k, 0]] + dxup[jxo[k, 1]])
                    * (dydw[jyo[k, 0]] + dyup[jyo[k, 1]])) * aream1

                if adxp[1] > zdello or adxp[2] > zdello:
                    lcflfail[ij] = True
                if adyp[1] > xdella or adyp[2] > xdella:
                    lcflfail[ij] = True

    # ---- direction / frequency turning (ctuw.F90:345-420)
    delth0 = 0.25 * delpro / tb.delth
    for k in range(nang):
        kp1 = (k + 1) % nang
        km1 = (k - 1) % nang
        sp = delth0 * (sinth[k] + sinth[kp1]) / r_earth
        sm = delth0 * (sinth[k] + sinth[km1]) / r_earth
        for ij in range(npts):
            drgp = st.tanph_pt[ij] * sp
            drgm = st.tanph_pt[ij] * sm
            if irefra == 1 or irefra == 3:
                drdp = (thdd[k, ij] + thdd[kp1, ij]) * delth0
                drdm = (thdd[k, ij] + thdd[km1, ij]) * delth0
            else:
                drdp = drdm = 0.0
            if irefra in (2, 3):
                drcp = curmask[ij] * (thdc[k, ij] + thdc[kp1, ij]) * delth0
                drcm = curmask[ij] * (thdc[k, ij] + thdc[km1, ij]) * delth0
            else:
                drcp = drcm = 0.0
            for m in range(nfre_red):
                if irefra == 0:
                    dthp = drgp * cgroup_ext[m, ij] + drcp
                    dthm = drgm * cgroup_ext[m, ij] + drcm
                else:
                    dthp = drgp * cgroup_ext[m, ij] \
                        + omosnh2kd_ext[m, ij] * drdp + drcp
                    dthm = drgm * cgroup_ext[m, ij] \
                        + omosnh2kd_ext[m, ij] * drdm + drcm
                wkpmn[ij, k, m, 1] = (dthp + abs(dthp)) + \
                    (abs(dthm) - dthm)
                wkpmn[ij, k, m, 2] = -dthp + abs(dthp)
                wkpmn[ij, k, m, 0] = dthm + abs(dthm)
            if irefra in (2, 3):
                delfr0 = 0.25 * delpro / ((rt.FRATIO - 1.0) * rt.ZPI)
                for m in range(nfre_red):
                    mp1 = min(nfre_red - 1, m + 1)
                    mm1 = max(0, m - 1)
                    dfp = delfr0 / tb.fr[m]
                    dfm = delfr0 / tb.fr[mm1]
                    dthp = curmask[ij] * (sdot[k, m, ij]
                                          + sdot[k, mp1, ij]) * dfp
                    dthm = curmask[ij] * (sdot[k, m, ij]
                                          + sdot[k, mm1, ij]) * dfm
                    wmpmn[ij, k, m, 1] = (dthp + abs(dthp)) + \
                        (abs(dthm) - dthm)
                    wmpmn[ij, k, m, 2] = (-dthp + abs(dthp)) / rt.FRATIO
                    wmpmn[ij, k, m, 0] = (dthm + abs(dthm)) * rt.FRATIO

    # bounds checks + sumwn closure (ctuw.F90:430-560)
    for ij in range(npts):
        for k in range(nang):
            for m in range(nfre_red):
                sumwn[ij, k, m] += wkpmn[ij, k, m, 1]
                if irefra in (2, 3):
                    sumwn[ij, k, m] += wmpmn[ij, k, m, 1]
                if sumwn[ij, k, m] > 1.0 or sumwn[ij, k, m] < 0.0:
                    lcflfail[ij] = True

    # obstruction multiplication (ctuw.F90:700-730)
    for k in range(nang):
        for m in range(nfre_red):
            for ij in range(npts):
                for ic in range(2):
                    for icl in range(2):
                        wlatn[ij, k, m, ic, icl] *= \
                            st.obslat[m, ij, ic]
                    wlonn[ij, k, m, ic] *= st.obslon[m, ij, ic]
                for icr in range(4):
                    pc = kcr[k, icr] - 1
                    for icl in range(2):
                        wcorn[ij, k, m, icr, icl] *= \
                            st.obscor[m, ij, pc]

    return dict(sumwn=sumwn, wlatn=wlatn, wlonn=wlonn, wcorn=wcorn,
                wkpmn=wkpmn, wmpmn=wmpmn if irefra in (2, 3) else None,
                lcflfail=lcflfail)
