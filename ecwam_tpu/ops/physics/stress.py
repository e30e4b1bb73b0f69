"""Wave-supported stress: prognostic-range cut, tail stress, total wave stress.

JAX re-derivations of:
  - FRCUTINDEX  dynamic high-frequency cut index MIJ + RHOWGDFTH weights
                (/root/reference/src/ecwam/frcutindex.F90:64-108)
  - TAU_PHI_HF  analytic high-frequency tail stress/energy-flux integral
                (tau_phi_hf.F90:73-255)
  - STRESSO     wave stress from the positive input + tail contribution
                (stresso.F90:63-160)

Layout: fl1 (nang, nfre, npts); mij is the 0-based cut index (npts,) int32.
"""

from __future__ import annotations

import math

import jax
import numpy as np
import jax.numpy as jnp

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.core import spectral as sp
from ecwam_tpu.ops.physics import kernelmode
from ecwam_tpu.ops.physics import tables
from ecwam_tpu.ops.physics.airsea import EPS1

CITHRSH_TAIL = 0.3        # LMASKICE=T default (userin.F90:958-961)


def frcutindex(fm, fmws, ufric, cicover, tb, params: pp.PhysParams,
               *, cithrsh_tail: float = CITHRSH_TAIL):
    """Last prognostic frequency index (0-based) and RHOWGDFTH weights
    (frcutindex.F90:64-108).

    Returns (mij, rhowgdfth) with mij int32 (npts,) and rhowgdfth
    (nfre, npts).
    """
    dt = fm.dtype
    nfre = tb.nfre
    fpmh = params.tailfactor / tb.fr[0]
    fppm = params.tailfactor_pm * c.G / (sp.FRIC * tb.zpifr[0])
    fm2 = jnp.maximum(fmws, fm) * fpmh
    fpm = fppm / jnp.maximum(ufric, jnp.asarray(c.EPSMIN, dt))
    fpm4 = jnp.maximum(fm2, fpm)
    # Fortran: MIJ = NINT(LOG10(FPM4)*FLOGSPRDM1)+1, clipped to [1, NFRE]
    mij1 = jnp.rint(jnp.log10(fpm4) * tb.flogsprdm1).astype(jnp.int32) + 1
    mij1 = jnp.clip(mij1, 1, nfre)
    mij1 = jnp.where(cicover <= cithrsh_tail, mij1, nfre)
    mij = mij1 - 1                               # 0-based

    m_idx = jnp.arange(nfre, dtype=jnp.int32)[:, None]
    rhowg = jnp.asarray(tb.rhowg_dfim, dt)[:, None]
    w = jnp.where(m_idx <= mij[None, :], rhowg, 0.0)
    # halve at the cut itself unless the cut is the last frequency
    half = (m_idx == mij[None, :]) & (mij[None, :] != nfre - 1)
    w = jnp.where(half, 0.5 * w, w)
    return mij, w


def tau_phi_hf(mij, ufric, z0m, fl1, aird, rnfac, coswdif, sinwdif2,
               ust, tb, params: pp.PhysParams,
               *, x0tauhf: float, wtauhf, ltauwshelter: bool,
               llphiwa: bool = True):
    """High-frequency stress TAUHF and energy flux PHIHF
    (tau_phi_hf.F90:73-255, non-LLGCBZ0 path: zsup = log(1) = 0).

    ``ust`` is the (possibly sheltered) friction velocity input; returns
    (tauhf, phihf, ust_out) where ust_out is the tail-sheltered u*.
    """
    dt = fl1.dtype
    nang, nfre, npts = fl1.shape
    jtot = tables.JTOT_TAUHF
    wtauhf = jnp.asarray(wtauhf, dt)
    x0g = x0tauhf * c.G

    if kernelmode.PALLAS_SAFE:
        fr5_mij = kernelmode.take_table(jnp.asarray(tb.fr5, dt), mij)
        zpifr_mij = kernelmode.take_table(jnp.asarray(tb.zpifr, dt), mij)
    else:
        fr5_mij = jnp.asarray(tb.fr5, dt)[mij]         # (npts,)
        zpifr_mij = jnp.asarray(tb.zpifr, dt)[mij]

    xloggz0 = jnp.log(c.G * z0m)
    omegacc = jnp.maximum(zpifr_mij, x0g / ust)
    sqrtz0og = jnp.sqrt(z0m * c.GM1)
    sqrtgz0 = 1.0 / sqrtz0og
    zinf = jnp.log(omegacc * sqrtz0og)
    if params.llgcbz0:
        # TAUHF integral stops at the gravity-capillary cut-off
        # (tau_phi_hf.F90:125-127, 190-193); PHIHF keeps the full range.
        from ecwam_tpu.ops.physics import gc as gc_mod
        _, _, oms = gc_mod.omegagc(ufric, gc_mod.gc_tables())
        zsup = jnp.minimum(jnp.log(oms * sqrtz0og), 0.0)
    else:
        zsup = jnp.zeros_like(zinf)                    # log(1)

    consttau = c.ZPI4GM2 * fr5_mij

    def _jloop(body, init):
        # Mosaic kernels: unrolled (jtot=19 static) so the Simpson
        # weight lookup wtauhf[j] is a static slice
        if kernelmode.PALLAS_SAFE:
            carry = init
            for j in range(jtot):
                carry = body(j, carry)
            return carry
        return jax.lax.fori_loop(0, jtot, body, init)

    def _wj(j):
        return (kernelmode.sidx(wtauhf, j) if isinstance(j, int)
                else wtauhf[j])

    # direction sums at the cut frequency (tau_phi_hf.F90:97-125)
    if kernelmode.PALLAS_SAFE:
        fl1_mij = kernelmode.take_freq_at(fl1, mij, axis=1)  # (nang, npts)
    else:
        fl1_mij = jnp.take_along_axis(
            fl1, mij[None, None, :].astype(jnp.int32),
            axis=1)[:, 0, :]                                 # (nang, npts)
    cosw = jnp.maximum(coswdif, 0.0)
    fcosw2 = fl1_mij * cosw**2
    f1dcos3 = tb.delth * jnp.sum(fcosw2 * cosw, axis=0)
    f1dcos2 = tb.delth * jnp.sum(fcosw2, axis=0)
    f1dsin2 = tb.delth * jnp.sum(fl1_mij * sinwdif2, axis=0)
    f1d = tb.delth * jnp.sum(fl1_mij, axis=0)

    if params.llnormagam:
        confg = params.gamnconst() * fr5_mij * rnfac * sqrtgz0
        const1 = confg * f1dsin2
        const2 = confg * f1d
    else:
        const1 = jnp.zeros((npts,), dt)
        const2 = jnp.zeros((npts,), dt)

    delz = jnp.maximum((zsup - zinf) / (jtot - 1), 0.0)
    # PHIHF always integrates the full range up to log(1)=0
    # (tau_phi_hf.F90:251-254)
    delz_phi = jnp.maximum((0.0 - zinf) / (jtot - 1), 0.0)

    def zbeta_at(j, u, delz=delz):
        y = jnp.exp(zinf + j * delz)
        omega = y * sqrtgz0
        cm1 = omega * c.GM1
        zx = u * cm1 + params.zalp
        zlog = jnp.minimum(xloggz0 + 2.0 * jnp.log(cm1) + pp.XKAPPA / zx, 0.0)
        return zlog**4 * jnp.exp(zlog), y

    taul0 = ust**2
    if ltauwshelter:
        def body(j, carry):
            taul, ust_c, tauhf = carry
            zbeta, y = zbeta_at(j, ust_c)
            znz = zbeta * ust_c * y
            gamnorma = (1.0 + const1 * znz) / (1.0 + const2 * znz)
            fnc2 = (f1dcos3 * consttau * zbeta * taul
                    * _wj(j) * delz * gamnorma)
            taul = jnp.maximum(taul - params.tauwshelter * fnc2, 0.0)
            return taul, jnp.sqrt(taul), tauhf + fnc2
        _, ust_out, tauhf = _jloop(body, (taul0, ust, jnp.zeros_like(ust)))
    else:
        def body(j, carry):
            acc, = carry
            zbeta, y = zbeta_at(j, ust)
            znz = zbeta * ust * y
            gamnorma = (1.0 + const1 * znz) / (1.0 + const2 * znz)
            return (acc + zbeta * _wj(j) * gamnorma,)
        acc, = _jloop(body, (jnp.zeros_like(ust),))
        tauhf = f1dcos3 * consttau * taul0 * acc * delz
        ust_out = ust

    phihf = jnp.zeros_like(ust)
    if llphiwa:
        constphi = aird * c.ZPI4GM1 * fr5_mij
        taulp0 = ust**2 if not ltauwshelter else taul0
        # fresh integration from the unsheltered ust for PHIHF
        if ltauwshelter:
            def bodyp(j, carry):
                taul, ustph, acc = carry
                zbeta, y = zbeta_at(j, ustph, delz_phi)
                znz = zbeta * ust_out * y
                gamnorma = (1.0 + const1 * znz) / (1.0 + const2 * znz)
                fnc2 = zbeta * taul * _wj(j) * delz_phi * gamnorma
                taul = jnp.maximum(
                    taul - params.tauwshelter * f1dcos3 * consttau * fnc2, 0.0)
                return taul, jnp.sqrt(taul), acc + fnc2 / y
            _, _, acc = _jloop(bodyp, (ust**2, ust, jnp.zeros_like(ust)))
            phihf = f1dcos2 * constphi * sqrtz0og * acc
        else:
            def bodyp(j, carry):
                acc, = carry
                zbeta, y = zbeta_at(j, ust, delz_phi)
                znz = zbeta * ust * y
                gamnorma = (1.0 + const1 * znz) / (1.0 + const2 * znz)
                return (acc + zbeta * _wj(j) * gamnorma / y,)
            acc, = _jloop(bodyp, (jnp.zeros_like(ust),))
            phihf = f1dcos2 * constphi * sqrtz0og * taulp0 * acc * delz_phi
    return tauhf, phihf, ust_out


def stresso(fl1, sl, spos, cinv, mij, rhowgdfth,
            wdwave, ufric, z0m, aird, rnfac, coswdif, sinwdif2,
            tb, params: pp.PhysParams,
            *, x0tauhf: float, wtauhf, llphiwa: bool = True):
    """Wave stress τ_w from the positive input + high-frequency tail
    (stresso.F90:63-160).

    Returns (tauw, tauwdir, phiwa).
    """
    dt = fl1.dtype
    # pre-shaped in numpy: a (nang,)->(nang,1,1) reshape of a
    # traced value is the one layout cast Mosaic rejects
    sinth = jnp.asarray(np.asarray(tb.sinth)[:, None, None], dt)
    costh = jnp.asarray(np.asarray(tb.costh)[:, None, None], dt)
    rhowg_dfim = jnp.asarray(tb.rhowg_dfim, dt)[:, None]

    phiwa = jnp.zeros(fl1.shape[-1], dt)
    if llphiwa:
        # negative part over the full spectrum (stresso.F90:71-78)
        phiwa = jnp.sum((sl - spos) * rhowg_dfim[None, :, :], axis=(0, 1))

    sumx = jnp.sum(spos * sinth, axis=0)             # (nfre, npts)
    sumy = jnp.sum(spos * costh, axis=0)
    sumt = jnp.sum(spos, axis=0)
    cm_w = rhowgdfth * cinv
    xstress = jnp.sum(cm_w * sumx, axis=0)
    ystress = jnp.sum(cm_w * sumy, axis=0)
    if llphiwa:
        phiwa = phiwa + jnp.sum(rhowgdfth * sumt, axis=0)

    aird_floor = jnp.maximum(aird, 1.0)
    xstress = xstress / aird_floor
    ystress = ystress / aird_floor

    # tail contribution start point (stresso.F90:116-135)
    ltauwshelter = not (params.iphys == 0 or params.tauwshelter == 0.0)
    if ltauwshelter:
        taux = ufric**2 * jnp.sin(wdwave)
        tauy = ufric**2 * jnp.cos(wdwave)
        taupx = taux - params.tauwshelter * xstress
        taupy = tauy - params.tauwshelter * ystress
        usdirp = kernelmode.arctan2(taupx, taupy)
        ust = (taupx**2 + taupy**2) ** 0.25
    else:
        usdirp = wdwave
        ust = ufric

    tauhf, phihf, _ = tau_phi_hf(
        mij, ufric, z0m, fl1, aird, rnfac, coswdif, sinwdif2, ust,
        tb, params, x0tauhf=x0tauhf, wtauhf=wtauhf,
        ltauwshelter=ltauwshelter, llphiwa=llphiwa)

    xstress = xstress + tauhf * jnp.sin(usdirp)
    ystress = ystress + tauhf * jnp.cos(usdirp)
    tauw = jnp.sqrt(xstress**2 + ystress**2)
    tauwdir = kernelmode.arctan2(xstress, ystress)
    if not params.llgcbz0:
        tauw = jnp.minimum(tauw, ufric**2 / (1.0 + EPS1))
    if llphiwa:
        phiwa = phiwa + phihf
    return tauw, tauwdir, phiwa
