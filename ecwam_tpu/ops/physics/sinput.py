"""Wind-input source term S_in.

JAX re-derivations of the reference wind input:
  - SINPUT_ARD  Ardhuin et al. (2010) positive input + gustiness averaging +
    tail-stress sheltering + negative (swell damping) part
    (/root/reference/src/ecwam/sinput_ard.F90:88-434)
  - SINPUT_JAN  Janssen quasi-linear input (WAM cy4)
    (sinput_jan.F90:84-280)

Layout: fl1 (nang, nfre, npts); per-frequency env (nfre, npts); scalars
(npts,).  The Ardhuin version runs a `lax.scan` over frequency because the
tauw-sheltering stress accumulates low→high frequency; the Janssen version is
frequency-parallel.

Returns (fld, sl, spos, xllws) with fld = ∂S/∂F diagonal, sl = S_in,
spos = positive part only, xllws = windsea mask.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.ops.physics import kernelmode
from ecwam_tpu.ops.physics import tables
from ecwam_tpu.ops.physics.airsea import wsigstar

IDAMPING = 1              # mpuserin.F90:609


def _swellft_interp(zorb, dt):
    """Linear interpolation in the swell friction table
    (sinput_ard.F90:187-194)."""
    table = jnp.asarray(tables.tabu_swellft(), dt)
    delabm1 = tables.IAB / (tables.ABMAX - tables.ABMIN)
    xi = (jnp.log10(jnp.maximum(zorb, 3.0)) - tables.ABMIN) * delabm1
    ind = jnp.minimum(tables.IAB - 1, xi.astype(jnp.int32))  # Fortran IND
    deli1 = jnp.minimum(1.0, xi - ind.astype(dt))
    deli2 = 1.0 - deli1
    # Fortran SWELLFT(IND) is table[ind-1] (our table drops the unused 0 slot)
    if kernelmode.PALLAS_SAFE:
        return (kernelmode.take_table(table, ind - 1) * deli2
                + kernelmode.take_table(table, ind) * deli1)
    return table[ind - 1] * deli2 + table[ind] * deli1


def sinput_ard(fl1, wavnum, cinv, xk2cg,
               wdwave, wswave, ufric, z0m,
               coswdif, sinwdif2, raorw, wstar, rnfac,
               tb, params: pp.PhysParams,
               *, ngst: int = 2, llsneg: bool = True):
    """Ardhuin wind input (sinput_ard.F90:88-434)."""
    dt = fl1.dtype
    nang, nfre, npts = fl1.shape
    th = jnp.asarray(tb.th, dt)[:, None]             # (nang, 1)
    sinth = jnp.asarray(tb.sinth, dt)[:, None]
    costh = jnp.asarray(tb.costh, dt)[:, None]
    dfim = jnp.asarray(tb.dfim, dt)
    zpifr = jnp.asarray(tb.zpifr, dt)

    avg_gst = 1.0 / ngst
    const1 = params.betamaxoxkappa2
    constn = tb.delth / (pp.XKAPPA * c.ZPI)
    abs_tauwshelter = abs(params.tauwshelter)
    ltauwshelter = abs_tauwshelter != 0.0

    if ngst > 1:
        sig_n = wsigstar(wswave, ufric, z0m, wstar, params)
        ustp0 = jnp.stack([ufric * (1.0 + sig_n), ufric * (1.0 - sig_n)])
    else:
        ustp0 = ufric[None, :]

    cstrnfac = constn * rnfac / raorw if params.llnormagam else None

    # ---- negative-input (swell damping) precompute (sinput_ard.F90:122-205)
    if llsneg:
        nu_air = pp.RNU
        fu = abs(pp.SWELLF3)
        fud = pp.SWELLF2
        e1d = jnp.sum(fl1, axis=0)                   # (nfre, npts)
        uorbt = 2.0 * jnp.sqrt(
            c.EPSMIN + jnp.sum((dfim * zpifr**2)[:, None] * e1d, axis=0))
        aorb = 2.0 * jnp.sqrt(
            c.EPSMIN + jnp.sum(dfim[:, None] * e1d, axis=0))
        re = (4.0 / nu_air) * uorbt * aorb
        z0vis = pp.RNUM / jnp.maximum(ufric, 1.0e-4)
        z0tub = params.z0rat * jnp.minimum(params.z0tubmax, z0m)
        z0noz = jnp.maximum(z0vis, z0tub)
        zorb = aorb / z0noz
        fww = _swellft_interp(zorb, dt)
        temp2 = fww * uorbt
        if pp.SWELLF6 == 1.0:
            re_c = jnp.full_like(re, params.swellf4)
        else:
            re_c = params.swellf4 * (2.0 / aorb) ** (1.0 - pp.SWELLF6)
        if params.swellf7 > 0.0:
            smooth = 0.5 * jnp.tanh((re - re_c) * params.swellf7m1)
            pturb, pvisc = 0.5 + smooth, 0.5 - smooth
        else:
            pturb = jnp.where(re <= re_c, 0.0, 0.5).astype(dt)
            pvisc = jnp.where(re <= re_c, 0.5, 0.0).astype(dt)
        aird_pvisc = pvisc * raorw

    if ltauwshelter:
        usg2 = ustp0**2
        taux = usg2 * jnp.sin(wdwave)[None, :]
        tauy = usg2 * jnp.cos(wdwave)[None, :]
        rogoroair = c.G / raorw

    def _ix(a, i, axis=0):
        return (kernelmode.sidx(a, i, axis) if isinstance(i, int)
                else jnp.take(a, i, axis=axis))

    # hoisted per-frequency rows (one big op each instead of nfre small
    # ops inside the sequential sheltering loop)
    zcn_all = jnp.log(wavnum * z0m[None, :])         # (nfre, npts)
    cnsn_all = (zpifr * const1)[:, None] * raorw[None, :]
    if llsneg:
        coef_v = -pp.SWELLF * 16.0 * zpifr**2 / c.G
        coef5_v = -pp.SWELLF5 * 2.0 * jnp.sqrt(2.0 * nu_air * zpifr)
        dstab1_all = coef5_v[:, None] * aird_pvisc[None, :] * wavnum
        temp1_all = coef_v[:, None] * raorw[None, :]

    def _coslp_shelter(taupx, taupy, ustpm1):
        """cos(th − usdirp) for usdirp = atan2(taupx, taupy) — the exact
        identity (sinθ·τx + cosθ·τy)/|τ| (|τ| = ustp²) replaces
        atan2 + cos on the sheltering critical path; atan2(0,0)=0 maps
        to cosθ."""
        r2 = taupx**2 + taupy**2
        num = (sinth[None] * taupx[:, None, :]
               + costh[None] * taupy[:, None, :])
        return jnp.where(r2[:, None, :] > 0.0,
                         num * (ustpm1**2)[:, None, :],
                         jnp.broadcast_to(costh[None], num.shape))

    def per_freq(stress, m):
        """One frequency step; stress = (xstress, ystress) each (ngst, npts)."""
        xstress, ystress = stress
        sig = _ix(zpifr, m)
        cinv_m = _ix(cinv, m)
        fl1_m = _ix(fl1, m, axis=1)                  # (nang, npts)

        if ltauwshelter:
            taupx = taux - abs_tauwshelter * xstress
            taupy = tauy - abs_tauwshelter * ystress
            ustp = (taupx**2 + taupy**2) ** 0.25
            constf = rogoroair * cinv_m * _ix(dfim, m)
        else:
            ustp = ustp0
        ustpm1 = 1.0 / jnp.maximum(ustp, jnp.asarray(c.EPSUS, dt))

        ucn = ustp * cinv_m[None, :]                 # (ngst, npts)
        ucnzalpd = pp.XKAPPA / (ucn + params.zalp)
        zcn = _ix(zcn_all, m)                        # (npts,)
        cnsn = _ix(cnsn_all, m)

        if llsneg:
            dstab1 = _ix(dstab1_all, m)
            temp1 = _ix(temp1_all, m)

        if kernelmode.PALLAS_SAFE and ngst > 1:
            # batched gust dimension (leading axis): one set of
            # (ngst, nang, npts) ops instead of ngst small repeats —
            # fewer, larger vector ops for the Mosaic kernel
            if ltauwshelter:
                coslp = _coslp_shelter(taupx, taupy, ustpm1)
            else:
                coslp = jnp.broadcast_to(coswdif[None],
                                         (ngst, nang, npts))
            x = coslp * ucn[:, None, :]
            zlog = zcn[None, None, :] + ucnzalpd[:, None, :] / \
                jnp.where(coslp > 0.01, coslp, 1.0)
            active = (coslp > 0.01) & (zlog < 0.0)
            zlog2x = zlog * zlog * x
            gam0 = jnp.where(
                active,
                jnp.exp(zlog) * zlog2x * zlog2x * cnsn[None, None, :],
                0.0)
            xllws_m = jnp.max(active.astype(dt), axis=0)
            if params.llnormagam:
                sumf = jnp.sum(gam0 * fl1_m[None], axis=1)
                sumfsin2 = jnp.sum(
                    gam0 * fl1_m[None] * sinwdif2[None], axis=1)
                znz = (cstrnfac[None] * _ix(xk2cg, m)[None]) * ustpm1
                gamnorma = (1.0 + znz * sumfsin2) / (1.0 + znz * sumf)
            else:
                gamnorma = jnp.ones((ngst, npts), dt)
            if llsneg:
                dstab2 = temp1[None, None, :] * (
                    temp2[None, None, :]
                    + (fu + fud * coslp) * ustp[:, None, :])
                dstab = dstab1[None, None, :] + \
                    pturb[None, None, :] * dstab2
            else:
                dstab = jnp.zeros((ngst, nang, npts), dt)
            slp = gam0 * gamnorma[:, None, :]
            flp = slp + dstab
            slpf = slp * fl1_m[None]
            if ltauwshelter:
                xstress = xstress + jnp.sum(
                    slpf * sinth[None], axis=1) * constf[None, :]
                ystress = ystress + jnp.sum(
                    slpf * costh[None], axis=1) * constf[None, :]
            spos_m = avg_gst * jnp.sum(slpf, axis=0)
            fld_m = avg_gst * jnp.sum(flp, axis=0)
            sl_m = fld_m * fl1_m
            return (xstress, ystress), (fld_m, sl_m, spos_m, xllws_m)

        xllws_m = jnp.zeros((nang, npts), dt)
        spos_sum = jnp.zeros((nang, npts), dt)
        fld_sum = jnp.zeros((nang, npts), dt)
        xstress_new, ystress_new = [], []
        for igst in range(ngst):
            if ltauwshelter:
                tx = kernelmode.sidx(taupx, igst)
                ty = kernelmode.sidx(taupy, igst)
                um1 = kernelmode.sidx(ustpm1, igst)
                coslp = jnp.where(
                    (tx**2 + ty**2)[None, :] > 0.0,
                    (sinth * tx[None, :] + costh * ty[None, :])
                    * (um1**2)[None, :],
                    costh)
            else:
                coslp = coswdif
            # growth rate (sinput_ard.F90:337-351)
            x = coslp * kernelmode.sidx(ucn, igst)[None, :]
            zlog = zcn[None, :] + kernelmode.sidx(ucnzalpd, igst)[None, :] / jnp.where(
                coslp > 0.01, coslp, 1.0)
            active = (coslp > 0.01) & (zlog < 0.0)
            zlog2x = zlog * zlog * x
            gam0 = jnp.where(
                active, jnp.exp(zlog) * zlog2x * zlog2x * cnsn[None, :], 0.0)
            xllws_m = jnp.maximum(xllws_m, active.astype(dt))

            if params.llnormagam:
                sumf = jnp.sum(gam0 * fl1_m, axis=0)
                sumfsin2 = jnp.sum(gam0 * fl1_m * sinwdif2, axis=0)
                znz = cstrnfac * _ix(xk2cg, m) * kernelmode.sidx(ustpm1, igst)
                gamnorma = (1.0 + znz * sumfsin2) / (1.0 + znz * sumf)
            else:
                gamnorma = jnp.ones((npts,), dt)

            if llsneg:
                dstab2 = temp1[None, :] * (
                    temp2[None, :] + (fu + fud * coslp) * kernelmode.sidx(ustp, igst)[None, :])
                dstab = dstab1[None, :] + pturb[None, :] * dstab2
            else:
                dstab = jnp.zeros((nang, npts), dt)

            slp = gam0 * gamnorma[None, :]
            flp = slp + dstab
            slp = slp * fl1_m
            if ltauwshelter:
                xstress_new.append(
                    kernelmode.sidx(xstress, igst) + jnp.sum(slp * sinth, axis=0) * constf)
                ystress_new.append(
                    kernelmode.sidx(ystress, igst) + jnp.sum(slp * costh, axis=0) * constf)
            spos_sum = spos_sum + slp
            fld_sum = fld_sum + flp

        if ltauwshelter:
            xstress = jnp.stack(xstress_new)
            ystress = jnp.stack(ystress_new)

        spos_m = avg_gst * spos_sum
        fld_m = avg_gst * fld_sum
        sl_m = fld_m * fl1_m
        return (xstress, ystress), (fld_m, sl_m, spos_m, xllws_m)

    zeros = jnp.zeros((ustp0.shape[0], npts), dt)
    if kernelmode.PALLAS_SAFE:
        # unrolled frequency loop (Mosaic: no scan with stacked outputs);
        # nfre is a compile-time constant so the slices are static
        stress, outs = (zeros, zeros), []
        for m in range(nfre):
            stress, out_m = per_freq(stress, m)
            outs.append(out_m)
        stk = lambda i: jnp.stack([o[i] for o in outs], axis=1)
        return stk(0), stk(1), stk(2), stk(3)
    (_, _), (fld, sl, spos, xllws) = jax.lax.scan(
        per_freq, (zeros, zeros), jnp.arange(nfre))
    # stacked (nfre, nang, npts) → (nang, nfre, npts)
    tr = lambda a: jnp.transpose(a, (1, 0, 2))
    return tr(fld), tr(sl), tr(spos), tr(xllws)


def sinput_jan(fl1, wavnum, cinv, xk2cg,
               wdwave, wswave, ufric, z0m,
               coswdif, sinwdif2, raorw, wstar, rnfac,
               tb, params: pp.PhysParams,
               *, ngst: int = 2, llsneg: bool = True):
    """Janssen quasi-linear wind input (sinput_jan.F90:84-280)."""
    dt = fl1.dtype
    nang, nfre, npts = fl1.shape
    zpifr = jnp.asarray(tb.zpifr, dt)[:, None]       # (nfre, 1)

    const1 = params.betamaxoxkappa2
    const3 = IDAMPING * 2.0 * pp.XKAPPA / const1
    constn = tb.delth / (pp.XKAPPA * c.ZPI)
    xkappad = 1.0 / pp.XKAPPA

    lz = coswdif > 0.01                              # (nang, npts)

    if ngst > 1:
        sig_n = wsigstar(wswave, ufric, z0m, wstar, params)
        sigdev = jnp.stack([1.0 - sig_n, 1.0 + sig_n])
        wsin = (0.5, 0.5)
    else:
        sigdev = jnp.ones((1, npts), dt)
        wsin = (1.0,)
    us = ufric[None, :] * sigdev                     # (ngst, npts)
    ustpm1 = 1.0 / jnp.maximum(us, jnp.asarray(c.EPSUS, dt))

    ztanhkd = zpifr**2 / (c.G * wavnum)              # (nfre, npts)
    cnsn = zpifr * const1 * ztanhkd * raorw[None, :]

    cstrnfac = constn * rnfac / raorw if params.llnormagam else None

    ufac1 = jnp.zeros((nang, nfre, npts), dt)
    ufac2 = jnp.zeros((nang, nfre, npts), dt)
    xllws = jnp.zeros((nang, nfre, npts), dt)
    for igst in range(len(wsin)):
        us_g = kernelmode.sidx(us, igst)
        ucn = us_g[None, :] * cinv + params.zalp     # (nfre, npts)
        const3_ucn2 = const3 * ucn**2
        ucnd = 1.0 / ucn
        zcn = jnp.log(wavnum * z0m[None, :])
        xvd = 1.0 / (-us_g[None, :] * xkappad * zcn * cinv)

        cosw = jnp.where(lz, coswdif, 1.0)[:, None, :]
        zlog = zcn[None, :, :] + pp.XKAPPA / cosw * ucnd[None, :, :]
        active = lz[:, None, :] & (zlog < 0.0)
        x = coswdif[:, None, :] * ucn[None, :, :]
        zlog2x = zlog * zlog * x
        gam0 = jnp.where(
            active, zlog2x * zlog2x * jnp.exp(zlog) * cnsn[None, :, :], 0.0)
        xllws = jnp.maximum(xllws, active.astype(dt))

        if params.llnormagam:
            sumf = jnp.sum(gam0 * fl1, axis=0)       # (nfre, npts)
            sumfsin2 = jnp.sum(gam0 * fl1 * sinwdif2[:, None, :], axis=0)
            znz = (cstrnfac[None, :] * xk2cg) * kernelmode.sidx(ustpm1, igst)[None, :]
            gamnorma = (1.0 + znz * sumfsin2) / (1.0 + znz * sumf)
        else:
            gamnorma = jnp.ones((nfre, npts), dt)

        ufac1 = ufac1 + wsin[igst] * gam0 * gamnorma[None, :, :]
        if llsneg:
            zbeta = const3_ucn2[None, :, :] * (
                coswdif[:, None, :] - xvd[None, :, :])
            ufac2 = ufac2 + wsin[igst] * zbeta

    fld = ufac1 + ufac2 * cnsn[None, :, :]
    spos = ufac1 * fl1
    sl = fld * fl1
    return fld, sl, spos, xllws
