"""Great-circle CTU (corner-transport-upstream) advection on the reduced grid.

Host-side stencil construction re-derives the reference's neighbour tables
and interpolation weights:
  - KLAT/KLON/KCOR neighbour indices + WLAT/WCOR weights
    (/root/reference/src/ecwam/propconnect.F90:44-950)
  - land adjustment of WLAT/WCOR + DP metric factors (ctuwini.F90:45-125)
  - per-direction upstream selectors JXO/JYO/KCR, KPM/MPM
    (ctuwupdt.F90:95-150)

Device code re-derives:
  - CTUW      CTU weights incl. obstructions and CFL flag (ctuw.F90:90-745)
  - PROPAGS2  the weighted gather stencil (propags2.F90:49-130)

Layout: spectra (nang, nfre_red, npts+1) with the last slot the "land"
point (zero energy, deep-water wave properties) — the analogue of the
reference's NSUP+1 slot.  All neighbour indices pointing to land use that
slot.  Weights are (nang, nfre_red, npts, ...) dense arrays computed by XLA
(a fused Pallas weights+stencil kernel is the planned fast path).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ecwam_tpu.core import constants as c
from ecwam_tpu.core.grid import WaveGrid, SeaPointBlock


def _nint(x):
    """Fortran NINT: round half away from zero (x >= -0.5 here)."""
    return int(np.floor(x + 0.5))


@dataclasses.dataclass(frozen=True)
class StencilTables:
    """Static propagation stencil for one (sub)domain; all indices 0-based,
    ``nland = npts`` is the land slot."""

    npts: int
    nland: int
    # neighbour indices
    klat: np.ndarray      # (npts, 2, 2)  [ic: 0=south,1=north][icl: 2 candidates]
    klon: np.ndarray      # (npts, 2)     [0=west, 1=east]
    kcor: np.ndarray      # (npts, 4, 2)  physical corners 0=NE,1=SE,2=SW,3=NW
    # interpolation weights (land-adjusted, ctuwini.F90:45-75)
    wlat: np.ndarray      # (npts, 2)
    wlatm1: np.ndarray
    wcor: np.ndarray      # (npts, 4)
    wcorm1: np.ndarray
    dp: np.ndarray        # (npts, 2) cosφ(row±1)/cosφ(row)
    # geometry
    zdello_pt: np.ndarray   # (npts,) lon increment of the point's row (deg)
    xdella: float           # lat increment (deg)
    cosphm1_pt: np.ndarray  # (npts,) 1/cosφ
    tanph_pt: np.ndarray    # (npts,) tanφ (polar-capped, readmdlconf.F90:158)
    # per-direction static selectors (True where sinth>=0 / costh>=0)
    # derived on the fly from tables in ctuw
    # obstruction coefficients (1 = open water)
    obslat: np.ndarray    # (nfre_red, npts, 2)
    obslon: np.ndarray
    obscor: np.ndarray    # (nfre_red, npts, 4) per physical corner


def build_stencil(grid: WaveGrid, blk: SeaPointBlock, nfre_red: int,
                  obstructions=None) -> StencilTables:
    """Build neighbour tables + weights (propconnect.F90 + ctuwini.F90).

    Fully vectorized over the sea-point block (the per-point Python loop
    cost ~75 s at O512 model build; this form is bit-identical — pinned
    during the rewrite on octahedral/regular grids with land — and runs
    in under a second)."""
    npts = blk.nsea
    nland = npts
    ngy = grid.ngy
    nl = np.asarray(grid.nlonrgg, np.int64)
    zd = np.asarray(grid.zdello, np.float64)
    iper = grid.iper
    irgg = grid.irgg
    g2b = blk.grid2blk            # (ngy, ngx) → block index or -1
    ngx = g2b.shape[1]

    i = blk.ixlg.astype(np.int64)
    k = blk.kxlt.astype(np.int64)
    d0 = i * zd[k]
    zk = zd[k]

    def nint(x):
        # Fortran NINT for the x >= -0.5 range used here
        return np.floor(x + 0.5).astype(np.int64)

    def sea_at(iv, kv):
        icl = np.clip(iv, 0, ngx - 1)
        return (iv >= 0) & (iv < nl[kv]) & (g2b[kv, icl] >= 0)

    def blk_at(iv, kv, ok):
        icl = np.clip(iv, 0, ngx - 1)
        return np.where(ok & sea_at(iv, kv), g2b[kv, icl], nland)

    klat = np.full((npts, 2, 2), nland, dtype=np.int64)
    klon = np.full((npts, 2), nland, dtype=np.int64)
    kcor = np.full((npts, 4, 2), nland, dtype=np.int64)
    wlat = np.ones((npts, 2))
    wcor = np.ones((npts, 4))

    # ---- KLAT + WLAT (propconnect.F90:55-135, :680-900)
    for ic in range(2):
        krow = k + (2 * ic - 1)
        inb = (krow >= 0) & (krow < ngy)
        krc = np.clip(krow, 0, ngy - 1)
        xm = d0 / zd[krc]
        imin0 = nint(xm)
        klat[:, ic, 0] = blk_at(imin0, krc, inb)
        if irgg:
            i2 = np.where(xm <= imin0, np.maximum(imin0 - 1, 0),
                          np.minimum(imin0 + 1, nl[krc] - 1))
            klat[:, ic, 1] = blk_at(i2, krc, inb)
        else:
            klat[:, ic, 1] = klat[:, ic, 0]

        if irgg:
            d3 = d0 - 0.5 * zk
            d5 = d0 + 0.5 * zk
            xp = imin0 * zd[krc]
            d4 = xp - 0.5 * zd[krc]
            d6 = xp + 0.5 * zd[krc]
            w_le = np.where((d4 <= d3) | (d6 <= d5), 1.0,
                            np.minimum(1.0, (zk - (d4 - d3)) / zk))
            w_gt = np.where((d4 >= d3) | (d6 >= d5), 1.0,
                            np.minimum(1.0, (zk - (d5 - d6)) / zk))
            wlat[:, ic] = np.where(inb, np.where(d0 <= xp, w_le, w_gt),
                                   1.0)

    # ---- KLON (propconnect.F90:140-170), periodic in lon
    allp = np.ones(npts, bool)
    iw = np.where(i > 0, i - 1, np.where(iper, nl[k] - 1, -1))
    klon[:, 0] = blk_at(iw, k, allp)
    ie = np.where(i < nl[k] - 1, i + 1, np.where(iper, 0, -1))
    klon[:, 1] = blk_at(ie, k, allp)

    # ---- KCOR + WCOR (propconnect.F90:183-375): physical corners
    # 0=NE(k+1,east) 1=SE(k-1,east) 2=SW(k-1,west) 3=NW(k+1,west)
    for icr, (dk, dsign) in enumerate(
            ((1, +1), (-1, +1), (-1, -1), (1, -1))):
        krow = k + dk
        inb = (krow >= 0) & (krow < ngy)
        krc = np.clip(krow, 0, ngy - 1)
        nlr = nl[krc]
        xl = d0 + dsign * zk
        xm = xl / zd[krc]
        imin0 = nint(xm)
        if iper:
            low = imin0 < 0
            imin0 = np.where(low, imin0 + nlr, imin0)
            xm = np.where(low, xm + nlr, xm)
            high = imin0 > nlr - 1
            imin0 = np.where(high, imin0 - nlr, imin0)
            xm = np.where(high, xm - nlr, xm)
        valid0 = (imin0 >= 0) & (imin0 <= nlr - 1)
        kcor[:, icr, 0] = blk_at(imin0, krc, inb & valid0)
        i2 = np.where(xm <= imin0,
                      np.where(imin0 <= 0, nlr - 1, imin0 - 1),
                      np.where(imin0 >= nlr - 1, 0, imin0 + 1))
        kcor[:, icr, 1] = blk_at(i2, krc, inb & valid0)

        if irgg:
            xll = xl - 0.5 * zk
            xlr = xl + 0.5 * zk
            imin0w = nint(xl / zd[krc])          # unwrapped (reference)
            xp = imin0w * zd[krc]
            xpl = xp - 0.5 * zd[krc]
            xpr = xp + 0.5 * zd[krc]
            d1 = np.where((xpl > xll) & (xpr < xlr), zk,
                          np.minimum(xlr, xpr) - np.maximum(xll, xpl))
            wcor[:, icr] = np.where(inb, np.minimum(1.0, d1 / zk), 1.0)

    # ---- land adjustment (ctuwini.F90:45-75)
    for ic in range(2):
        nearest_land = klat[:, ic, 0] == nland
        second_land = klat[:, ic, 1] == nland
        wlat[:, ic] = np.where(
            nearest_land & (wlat[:, ic] <= 0.75), 0.0, wlat[:, ic])
        wlat[:, ic] = np.where(
            ~nearest_land & second_land & (wlat[:, ic] >= 0.5),
            1.0, wlat[:, ic])
    for icr in range(4):
        nearest_land = kcor[:, icr, 0] == nland
        second_land = kcor[:, icr, 1] == nland
        wcor[:, icr] = np.where(
            nearest_land & (wcor[:, icr] <= 0.75), 0.0, wcor[:, icr])
        wcor[:, icr] = np.where(
            ~nearest_land & second_land & (wcor[:, icr] > 0.5),
            1.0, wcor[:, icr])

    # ---- DP metric factor (ctuwini.F90:112-121)
    kxlt = blk.kxlt.astype(int)
    cosph = grid.cosph
    dp = np.ones((npts, 2))
    for ic in range(2):
        kk = np.clip(kxlt + (2 * (ic + 1) - 3), 0, ngy - 1)
        dp[:, ic] = cosph[kk] / cosph[kxlt]

    if obstructions is None:
        obslat = np.ones((nfre_red, npts, 2))
        obslon = np.ones((nfre_red, npts, 2))
        obscor = np.ones((nfre_red, npts, 4))
    else:
        obslat, obslon, obscor = obstructions

    return StencilTables(
        npts=npts, nland=nland,
        klat=klat.astype(np.int32), klon=klon.astype(np.int32),
        kcor=kcor.astype(np.int32),
        wlat=wlat, wlatm1=1.0 - wlat, wcor=wcor, wcorm1=1.0 - wcor,
        dp=dp,
        zdello_pt=zd[kxlt], xdella=grid.xdella,
        cosphm1_pt=1.0 / cosph[kxlt],
        tanph_pt=grid.sinph[kxlt] / cosph[kxlt],
        obslat=obslat, obslon=obslon, obscor=obscor)


CURRENT_GRADIENT_MAX = 1.0e-5    # max current gradient (yowcurr.F90:19)


def gradi(st, depth_ext, u_ext, v_ext, irefra: int):
    """Depth/current gradients on the sea-point block (gradi.F90:60-185).

    Centred differences over the KLAT/KLON neighbours with the reference's
    land fallbacks; current gradients additionally treat (u,v)==(0,0)
    points as land and are clipped to CURRENT_GRADIENT_MAX·cosφ.
    Returns dict of (npts,) arrays ddphi/ddlam/duphi/dulam/dvphi/dvlam.
    """
    dt = depth_ext.dtype
    npts = st.klon.shape[0]
    nland = depth_ext.shape[0] - 1      # land slot trails the ext layout
    oneo2delphi = 0.5 / (st.xdella * c.CIRC / 360.0)
    dellam2 = 2.0 * jnp.asarray(st.zdello_pt, dt) * (c.CIRC / 360.0)
    zero = jnp.zeros(npts, dt)

    def merid_grad(f_ext, treat_zero_as_land=False):
        ipp, ipp2 = st.klat[:, 1, 0], st.klat[:, 1, 1]
        ipm, ipm2 = st.klat[:, 0, 0], st.klat[:, 0, 1]
        wp = jnp.asarray(st.wlat[:, 1], dt)
        wm = jnp.asarray(st.wlat[:, 0], dt)

        def land(idx):
            l = jnp.asarray(idx == nland)
            if treat_zero_as_land:
                l = l | ((u_ext[idx] == 0.0) & (v_ext[idx] == 0.0))
            return l
        lpp, lpp2, lpm, lpm2 = land(ipp), land(ipp2), land(ipm), land(ipm2)
        all4 = ~(lpp | lpp2 | lpm | lpm2)
        prim = ~(lpp | lpm)
        sec = ~(lpp2 | lpm2)
        fp = jnp.where(all4, wp * f_ext[ipp] + (1.0 - wp) * f_ext[ipp2],
                       jnp.where(prim, f_ext[ipp], f_ext[ipp2]))
        fm = jnp.where(all4, wm * f_ext[ipm] + (1.0 - wm) * f_ext[ipm2],
                       jnp.where(prim, f_ext[ipm], f_ext[ipm2]))
        ok = all4 | prim | sec
        return jnp.where(ok, (fp - fm) * oneo2delphi, zero)

    def zonal_grad(f_ext, treat_zero_as_land=False):
        ilp, ilm = st.klon[:, 1], st.klon[:, 0]

        def land(idx):
            l = jnp.asarray(idx == nland)
            if treat_zero_as_land:
                l = l | ((u_ext[idx] == 0.0) & (v_ext[idx] == 0.0))
            return l
        ok = ~(land(ilp) | land(ilm))
        return jnp.where(ok, (f_ext[ilp] - f_ext[ilm]) / dellam2, zero)

    out = dict(ddphi=zero, ddlam=zero, duphi=zero, dulam=zero,
               dvphi=zero, dvlam=zero)
    if irefra in (1, 3):
        out["ddphi"] = merid_grad(depth_ext)
        out["ddlam"] = zonal_grad(depth_ext)
    if irefra in (2, 3):
        cgmax = CURRENT_GRADIENT_MAX / jnp.asarray(st.cosphm1_pt, dt)

        def clip(g):
            return jnp.sign(g) * jnp.minimum(jnp.abs(g), cgmax)
        out["duphi"] = clip(merid_grad(u_ext, True))
        out["dvphi"] = clip(merid_grad(v_ext, True))
        out["dulam"] = clip(zonal_grad(u_ext, True))
        out["dvlam"] = clip(zonal_grad(v_ext, True))
    return out


def propdot(st, tb, wavnum_ext, cgroup_ext, omosnh2kd_ext,
            depth_ext, u_ext, v_ext, irefra: int, *,
            own: slice | None = None):
    """Refraction rates θ̇_depth, θ̇_current and σ̇ (propdot.F90:60-150).

    Returns (thdd, thdc, sdot): thdd/thdc (nang, npts) or None, sdot
    (nang, nfre_red, npts) or None, over the owned points.
    """
    dt = cgroup_ext.dtype
    npts = st.klon.shape[0]
    if own is None:
        own = slice(0, npts)
    g = gradi(st, depth_ext, u_ext, v_ext, irefra)
    dco = jnp.asarray(st.cosphm1_pt, dt)[None, :]        # ICASE=1 spherical
    sd = jnp.asarray(tb.sinth, dt)[:, None]
    cd = jnp.asarray(tb.costh, dt)[:, None]

    thdd = thdc = sdot = None
    if irefra in (1, 3):
        thdd = sd * g["ddphi"][None] - cd * g["ddlam"][None] * dco
    if irefra in (2, 3):
        if irefra == 3:
            omdd = (v_ext[own] * g["ddphi"]
                    + u_ext[own] * g["ddlam"] * dco[0])
        else:
            omdd = jnp.zeros_like(g["ddphi"])
        ss, sc, cc = sd * sd, sd * cd, cd * cd
        sdot_nf = (-sc * g["duphi"][None] - cc * g["dvphi"][None]
                   - (ss * g["dulam"][None] + sc * g["dvlam"][None]) * dco)
        thdc = (ss * g["duphi"][None] + sc * g["dvphi"][None]
                - (sc * g["dulam"][None] + cc * g["dvlam"][None]) * dco)
        cg_own = cgroup_ext[:, own]                      # (nfre_red, npts)
        sdot = ((sdot_nf[:, None, :] * cg_own[None]
                 + omdd[None, None, :] * omosnh2kd_ext[:, own][None])
                * wavnum_ext[:, own][None])
    return thdd, thdc, sdot


def _dir_selectors(tb):
    """JXO/JYO/KCR selectors as boolean masks (ctuwupdt.F90:95-150).

    Returns (east, north, kcr) with east/north (nang,) booleans and kcr
    (nang, 4) int: logical corner slot → physical corner index, using the
    physical ordering 0=NE, 1=SE, 2=SW, 3=NW.
    """
    east = np.asarray(tb.sinth) >= 0.0
    north = np.asarray(tb.costh) >= 0.0
    # reference 1-based physical corners: 1=NE, 2=SE, 3=SW, 4=NW
    kcr = np.zeros((tb.nang, 4), dtype=np.int32)
    for k in range(tb.nang):
        if north[k] and east[k]:
            kcr[k] = (2, 1, 3, 0)       # SW, SE, NW, NE
        elif north[k] and not east[k]:
            kcr[k] = (1, 2, 0, 3)       # SE, SW, NE, NW
        elif not north[k] and east[k]:
            kcr[k] = (3, 0, 2, 1)       # NW, NE, SW, SE
        else:
            kcr[k] = (0, 3, 1, 2)       # NE, NW, SE, SW
    return east, north, kcr


def ctuw_weights(delpro: float, st, tb,
                 cgroup_ext, omosnh2kd_ext=None, u_ext=None, v_ext=None,
                 *, irefra: int = 0, thdd=None, thdc=None, sdot=None,
                 mstart: int = 0, mend: int | None = None,
                 own: slice | None = None):
    """CTU weights on the sphere (ctuw.F90:90-745, ICASE=1 spherical).

    ``cgroup_ext`` is (nfre_red, npts+1).  Returns dict of weight arrays
    over the frequency window [mstart, mend) plus the CFL violation mask:
      sumwn (nang, nf, npts)      total outflow (incl. θ- and f-shift)
      wlonn (nang, nf, npts, 2)
      wlatn (nang, nf, npts, 2, 2)
      wcorn (nang, nf, npts, 4, 2)   [logical corner slots]
      wkpmn (nang, nf, npts, 2)      [slot 0: from k-1, slot 1: from k+1]
      wmpmn (nang, nf, npts, 2) or None
      cflfail (npts,) bool
    """
    dt = cgroup_ext.dtype
    nf_all = cgroup_ext.shape[0]
    npts = st.klon.shape[0]          # owned points (halo/land slots extra)
    if own is None:
        own = slice(0, npts)         # owned points lead the ext layout
    if mend is None:
        mend = nf_all
    nf = mend - mstart
    nang = tb.nang

    cg = cgroup_ext[mstart:mend]                       # (nf, npts_ext)
    sinth = jnp.asarray(tb.sinth, dt)[:, None, None]
    costh = jnp.asarray(tb.costh, dt)[:, None, None]
    east, north, kcr = _dir_selectors(tb)
    east_b = jnp.asarray(east)[:, None, None]
    north_b = jnp.asarray(north)[:, None, None]

    cosphm1 = jnp.asarray(st.cosphm1_pt, dt)[None, :]
    zdello = jnp.asarray(st.zdello_pt, dt)[None, None, :]
    xdella = jnp.asarray(st.xdella, dt)
    cmtodeg = 360.0 / c.CIRC
    wlat = jnp.asarray(st.wlat, dt)
    dp = jnp.asarray(st.dp, dt)

    have_cur = irefra in (2, 3) and u_ext is not None

    # per-(ic) edge velocities → |displacement| split up/down stream
    adxp, dxup, dxdw, adyp, dyup, dydw = [], [], [], [], [], []
    cg_own = cg[:, own]
    for ic in range(2):
        cg_lon = cg[:, st.klon[:, ic]]                 # (nf, npts)
        cgx = 0.5 * (cg_own + cg_lon) * sinth * cosphm1[None]
        cgyp = (wlat[None, :, ic] * cg[:, st.klat[:, ic, 0]]
                + (1.0 - wlat[None, :, ic]) * cg[:, st.klat[:, ic, 1]])
        cgy = 0.5 * (cg_own + dp[None, :, ic] * cgyp) * costh
        if have_cur:
            uu = u_ext[None, None, own] * cosphm1[None]
            urel = cgx + uu
            issu = (jnp.sign(urel) == jnp.sign(cgx)).astype(dt)
            vv = (v_ext[None, None, own]
                  * 0.5 * (1.0 + dp[:, ic][None, None, :]))
            vrel = cgy + vv
            issv = (jnp.sign(vrel) == jnp.sign(cgy)).astype(dt)
        else:
            urel, issu = cgx, jnp.asarray(1.0, dt)
            vrel, issv = cgy, jnp.asarray(1.0, dt)
        adx = jnp.abs(delpro * urel * cmtodeg)
        ady = jnp.abs(delpro * vrel * cmtodeg)
        adxp.append(adx)
        adyp.append(ady)
        dxup.append(adx * issu)
        dxdw.append(adx * (1.0 - issu))
        dyup.append(ady * issv)
        dydw.append(ady * (1.0 - issv))

    def sel(pair, cond):
        """pair[0] where cond (per direction) else pair[1]."""
        return jnp.where(cond, pair[0], pair[1])

    # jxo(k,1)=ic0 for east, ic1 for west; jxo(k,2) the other
    dxup_1 = sel(dxup, east_b)       # upstream-x slot
    dxup_2 = sel(dxup, ~east_b)
    dxdw_1 = sel(dxdw, east_b)
    dxdw_2 = sel(dxdw, ~east_b)
    dyup_1 = sel(dyup, north_b)
    dyup_2 = sel(dyup, ~north_b)
    dydw_1 = sel(dydw, north_b)
    dydw_2 = sel(dydw, ~north_b)

    dxx = zdello - dxup_2 - dxdw_1
    dyy = xdella - dyup_2 - dydw_1
    aream1 = 1.0 / (zdello * xdella)

    # latitude weights: slot ic receives weight iff it is jyo(k,1)/jyo(k,2)
    w_lat_ic = [None, None]
    # weight(jyo(k,1)) = dxx*dyup(jyo1); weight(jyo(k,2)) = dxx*dydw(jyo2)
    w_jyo1 = dxx * dyup_1 * aream1
    w_jyo2 = dxx * dydw_2 * aream1
    w_lat_ic[0] = jnp.where(north_b, w_jyo1, w_jyo2)   # ic=0 south slot
    w_lat_ic[1] = jnp.where(north_b, w_jyo2, w_jyo1)
    obslat = jnp.asarray(st.obslat[mstart:mend], dt)
    wlatn = jnp.stack([
        jnp.stack([w_lat_ic[ic] * wlat[None, :, ic] * obslat[None, :, :, ic],
                   w_lat_ic[ic] * (1.0 - wlat[None, :, ic])
                   * obslat[None, :, :, ic]], axis=-1)
        for ic in range(2)], axis=-2)                  # (nang, nf, npts, 2, 2)

    # longitude weights
    w_jxo1 = dyy * dxup_1 * aream1
    w_jxo2 = dyy * dxdw_2 * aream1
    obslon = jnp.asarray(st.obslon[mstart:mend], dt)
    wlonn = jnp.stack([
        jnp.where(east_b, w_jxo1, w_jxo2) * obslon[None, :, :, 0],
        jnp.where(east_b, w_jxo2, w_jxo1) * obslon[None, :, :, 1]], axis=-1)

    # corner weights (logical slots 1..4 → physical via kcr)
    wgt = [dxup_1 * dyup_1 * aream1,
           dxdw_2 * dyup_1 * aream1,
           dxup_1 * dydw_2 * aream1,
           dxdw_2 * dydw_2 * aream1]
    wcor = jnp.asarray(st.wcor, dt)
    obscor = jnp.asarray(st.obscor[mstart:mend], dt)
    wcor_k = wcor.T[kcr]                 # (nang, 4, npts)
    obscor_k = obscor.transpose(2, 0, 1)[kcr]   # (nang, 4, nf, npts)
    wcorn = jnp.stack([
        jnp.stack([wgt[icr] * wcor_k[:, icr, None, :] * obscor_k[:, icr],
                   wgt[icr] * (1.0 - wcor_k[:, icr, None, :])
                   * obscor_k[:, icr]], axis=-1)
        for icr in range(4)], axis=-2)               # (nang, nf, npts, 4, 2)

    sumwn = (zdello * (dydw_1 + dyup_2) + xdella * (dxup_2 + dxdw_1)
             - (dxdw_1 + dxup_2) * (dydw_1 + dyup_2)) * aream1

    # ---- direction (great-circle turning) weights (ctuw.F90:345-420)
    delth0 = 0.25 * delpro / tb.delth
    sinth_v = np.asarray(tb.sinth)
    kp1 = np.roll(np.arange(nang), -1)
    km1 = np.roll(np.arange(nang), 1)
    sp = jnp.asarray(delth0 * (sinth_v + sinth_v[kp1]) / c.R_EARTH,
                     dt)[:, None, None]
    sm = jnp.asarray(delth0 * (sinth_v + sinth_v[km1]) / c.R_EARTH,
                     dt)[:, None, None]
    tanph = jnp.asarray(st.tanph_pt, dt)[None, None, :]
    drgp = tanph * sp
    drgm = tanph * sm

    dthp = drgp * cg_own[None]
    dthm = drgm * cg_own[None]
    if irefra in (1, 3) and thdd is not None:
        drdp = (thdd[:, None, :] + thdd[kp1][:, None, :]) * delth0
        drdm = (thdd[:, None, :] + thdd[km1][:, None, :]) * delth0
        omos_own = omosnh2kd_ext[mstart:mend, own]
        dthp = dthp + omos_own[None] * drdp
        dthm = dthm + omos_own[None] * drdm
    if irefra in (2, 3) and thdc is not None:
        dthp = dthp + (thdc[:, None, :] + thdc[kp1][:, None, :]) * delth0
        dthm = dthm + (thdc[:, None, :] + thdc[km1][:, None, :]) * delth0

    wkpmn0 = (dthp + jnp.abs(dthp)) + (jnp.abs(dthm) - dthm)
    wkpmn_p1 = -dthp + jnp.abs(dthp)      # inflow from k+1
    wkpmn_m1 = dthm + jnp.abs(dthm)       # inflow from k-1
    wkpmn = jnp.stack([wkpmn_m1, wkpmn_p1], axis=-1)
    sumwn = sumwn + wkpmn0

    wmpmn = None
    if irefra in (2, 3) and sdot is not None:
        delfr0 = 0.25 * delpro / ((tb.fratio - 1.0) * c.ZPI)
        fr = np.asarray(tb.fr)
        m_idx = np.arange(mstart, mend)
        mp1 = np.minimum(nf_all - 1, m_idx + 1)
        mm1 = np.maximum(0, m_idx - 1)
        dfp = jnp.asarray(delfr0 / fr[m_idx], dt)[None, :, None]
        dfm = jnp.asarray(delfr0 / fr[mm1], dt)[None, :, None]
        sd = sdot                                  # (nang, nf_all, npts)
        dthp_f = (sd[:, m_idx] + sd[:, mp1]) * dfp
        dthm_f = (sd[:, m_idx] + sd[:, mm1]) * dfm
        wmpmn0 = (dthp_f + jnp.abs(dthp_f)) + (jnp.abs(dthm_f) - dthm_f)
        wmpmn = jnp.stack([
            (dthm_f + jnp.abs(dthm_f)) * tb.fratio,      # from m-1
            (-dthp_f + jnp.abs(dthp_f)) / tb.fratio],    # from m+1
            axis=-1)
        sumwn = sumwn + wmpmn0

    # ---- CFL check (ctuw.F90:238-300,560-690)
    cfl_x = jnp.maximum(adxp[0], adxp[1]) > zdello
    cfl_y = jnp.maximum(adyp[0], adyp[1]) > xdella
    bad = cfl_x | cfl_y | (sumwn > 1.0) | (sumwn < 0.0)
    cflfail = jnp.any(bad, axis=(0, 1))

    return dict(sumwn=sumwn, wlonn=wlonn, wlatn=wlatn, wcorn=wcorn,
                wkpmn=wkpmn, wmpmn=wmpmn, cflfail=cflfail,
                mstart=mstart, mend=mend)


def propags2(f1_ext, weights, st, tb, *, own: slice | None = None):
    """CTU stencil update (propags2.F90:49-130, general branch).

    ``f1_ext`` is (nang, nf, npts_ext) over the same frequency window the
    weights were built for; ``own`` selects the owned points (default: all
    but the trailing land slot).  Returns (nang, nf, npts_owned).
    """
    nang, nf, npts1 = f1_ext.shape
    npts = st.klon.shape[0]
    if own is None:
        own = slice(0, npts)
    _, _, kcr = _dir_selectors(tb)

    f1 = f1_ext[:, :, own]
    out = (1.0 - weights["sumwn"]) * f1

    # longitudes
    for ic in range(2):
        out = out + weights["wlonn"][..., ic] * f1_ext[:, :, st.klon[:, ic]]
    # latitudes (2 candidates)
    for ic in range(2):
        for icl in range(2):
            out = out + (weights["wlatn"][..., ic, icl]
                         * f1_ext[:, :, st.klat[:, ic, icl]])
    # corners: logical slot icr gathers physical corner kcr[k, icr]
    kcor_k = jnp.asarray(st.kcor)[:, kcr, :]     # (npts, nang, 4, 2)
    for icr in range(4):
        for icl in range(2):
            idx = jnp.transpose(kcor_k[:, :, icr, icl])   # (nang, npts)
            gathered = jnp.take_along_axis(
                f1_ext, idx[:, None, :], axis=2)
            out = out + weights["wcorn"][..., icr, icl] * gathered
    # direction turning
    out = out + weights["wkpmn"][..., 0] * jnp.roll(f1, 1, axis=0)
    out = out + weights["wkpmn"][..., 1] * jnp.roll(f1, -1, axis=0)
    # frequency shifting (current refraction)
    if weights.get("wmpmn") is not None:
        f_mm1 = jnp.concatenate([f1[:, :1], f1[:, :-1]], axis=1)
        f_mp1 = jnp.concatenate([f1[:, 1:], f1[:, -1:]], axis=1)
        out = out + weights["wmpmn"][..., 0] * f_mm1
        out = out + weights["wmpmn"][..., 1] * f_mp1
    return out
