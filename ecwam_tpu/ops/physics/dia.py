"""DIA four-wave nonlinear transfer S_nl (the Hasselmann et al. discrete
interaction approximation at λ=0.25).

Host-side table construction re-derives:
  - NLWEIGT     quadruplet geometry, interpolation weights, tail factors
                (/root/reference/src/ecwam/nlweigt.F90:46-200, jafu.F90:28-34)
  - INISNONLIN  clamped gather indices + 25 packed real coefficients,
                front-tail reduction factors FTRF (inisnonlin.F90:56-230)

The device kernel re-derives SNONLIN (snonlin.F90:70-470): for each extended
frequency MC the quadruplet interaction increments SL/FLD at nine
(direction, frequency) targets.  All indices are compile-time constants, so
the kernel unrolls into pure gathers/FMAs over the (nang, npts) plane —
ideal for XLA/TPU (no dynamic scatter).

Shallow-water enhancement:
  - ISNONLIN=0  depth/mean-wavenumber factor (snonlin.F90:127-136)
  - ISNONLIN=1  TRANSF per-frequency factor  (transf.F90:40-69), the default
  - ISNONLIN=2  spread-dependent TRANSF_SNL with PEAK_ANG ν/σθ
                (snonlin.F90:151-165, peak_ang.F90, transf_snl.F90)
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import spectral as sp
from ecwam_tpu.core.dispersion import BATHYMAX
from ecwam_tpu.ops.physics import kernelmode

ALAMD = 0.25             # DIA lambda (nlweigt.F90:69)
CON = 3000.0             # numerical constant (nlweigt.F90:70)
ENH_MAX = 10.0
ENH_MIN = 0.1

# In-kernel SNONLIN formulation: "batched" (frequency-batched shifts,
# ~200 large VPU ops) with automatic fallback to "loop" (per-MC static
# scatter, the round-4 form) when the DIA geometry is not a pure ramp.
import os as _os
KERNEL_DIA = _os.environ.get("ECWAVE_KERNEL_DIA", "batched")


def _jafu(cl: float, j: int, ian: int) -> int:
    """Angular index shift (jafu.F90:28-34); 1-based in/out."""
    idph = int(cl)       # Fortran INT truncation toward zero
    ja = j + idph
    if ja <= 0:
        ja = ian + ja - 1
    if ja >= ian:
        ja = ja - ian + 1
    return ja


@dataclasses.dataclass(frozen=True)
class DiaTables:
    """All static DIA tables (indices 0-based unless suffixed _f)."""

    nang: int
    nfre: int
    mfrstlw: int          # Fortran index of lowest extended frequency (≤1)
    mlsthg: int           # Fortran index of highest extended frequency
    kfrh: int
    dal1: float
    dal2: float
    # per-MC (Fortran 1..MLSTHG → python list index mc-1):
    ikp: np.ndarray       # raw Fortran freq indices (may exceed [1, nfre])
    ikp1: np.ndarray
    ikm: np.ndarray
    ikm1: np.ndarray
    af11: np.ndarray
    # clamped gather indices, 0-based in [0, nfre-1]:
    ic: np.ndarray
    ip: np.ndarray
    ip1: np.ndarray
    im: np.ndarray
    im1: np.ndarray
    rnl: np.ndarray       # (25, mlsthg) packed real coefficients
    # direction maps (nang, 2), 0-based:
    k1w: np.ndarray
    k2w: np.ndarray
    k11w: np.ndarray
    k21w: np.ndarray


def build_dia_tables(nang: int, nfre: int, fr: np.ndarray,
                     delth: float, fratio: float = 1.1) -> DiaTables:
    """Host-side NLWEIGT + INISNONLIN (see module docstring)."""
    f1p1 = math.log10(fratio)
    isp = int(math.log10(1.0 + ALAMD) / f1p1 + 0.000001)
    ism = math.floor(math.log10(1.0 - ALAMD) / f1p1 + 0.0000001)
    mfrstlw = 1 + ism
    mlsthg = nfre - ism
    kfrh = -ism + isp + 2

    # ---- angular geometry (nlweigt.F90:100-170)
    xf = ((1.0 + ALAMD) / (1.0 - ALAMD)) ** 4
    costh3 = (1.0 + 2.0 * ALAMD + 2.0 * ALAMD**3) / (1.0 + ALAMD) ** 2
    delphi1 = -180.0 / c.PI * math.acos(costh3)   # reference PI literal
    costh4 = math.sqrt(1.0 - xf + xf * costh3**2)
    delphi2 = 180.0 / c.PI * math.acos(costh4)
    deltha = delth * c.DEG
    cl1 = delphi1 / deltha
    cl2 = delphi2 / deltha

    klp1 = nang + 1
    ja1 = np.zeros((nang + 1, 2), dtype=int)   # 1-based slots 1..nang
    ja2 = np.zeros((nang + 1, 2), dtype=int)
    ic_sign = 1
    for kh in (1, 2):
        klh = nang if kh == 1 else klp1
        for k in range(1, klh + 1):
            ks = k if kh == 1 else klp1 - k + 1
            if ks > nang:
                continue
            ja1[ks, kh - 1] = _jafu(ic_sign * cl1, k, klp1)
            ja2[ks, kh - 1] = _jafu(ic_sign * cl2, k, klp1)
        ic_sign = -1

    cl1 = cl1 - int(cl1)
    cl2 = cl2 - int(cl2)
    acl1, acl2 = abs(cl1), abs(cl2)
    cl11, cl21 = 1.0 - acl1, 1.0 - acl2
    dal1 = 1.0 / (1.0 + ALAMD) ** 4
    dal2 = 1.0 / (1.0 - ALAMD) ** 4

    k1w = np.zeros((nang + 1, 2), dtype=int)
    k2w = np.zeros((nang + 1, 2), dtype=int)
    k11w = np.zeros((nang + 1, 2), dtype=int)
    k21w = np.zeros((nang + 1, 2), dtype=int)
    isg = 1
    for kh in (1, 2):
        cl1h = isg * cl1
        cl2h = isg * cl2
        for k in range(1, nang + 1):
            ks = k if kh == 1 else nang - k + 2
            if k == 1:
                ks = 1
            k1 = ja1[k, kh - 1]
            k1w[ks, kh - 1] = k1
            k11 = k1 - 1 if cl1h < 0.0 else k1 + 1
            if k11 < 1:
                k11 = nang
            if k11 > nang:
                k11 = 1
            k11w[ks, kh - 1] = k11
            k2 = ja2[k, kh - 1]
            k2w[ks, kh - 1] = k2
            k21 = k2 - 1 if cl2h < 0.0 else k2 + 1
            if k21 < 1:
                k21 = nang
            if k21 > nang:
                k21 = 1
            k21w[ks, kh - 1] = k21
        isg = -1

    # ---- extended frequency ladder + interpolation (nlweigt.F90:172-205)
    # frlon over Fortran indices mfrstlw..nfre+kfrh
    def frl_idx(m_f):
        return m_f - mfrstlw

    nfrl = nfre + kfrh - mfrstlw + 1
    frlon = np.zeros(nfrl)
    for m in range(1, nfre + 1):
        frlon[frl_idx(m)] = fr[m - 1]
    for m in range(0, mfrstlw - 1, -1):
        frlon[frl_idx(m)] = frlon[frl_idx(m + 1)] / fratio
    for m in range(nfre + 1, nfre + kfrh + 1):
        frlon[frl_idx(m)] = fratio * frlon[frl_idx(m - 1)]

    nmc_ext = mlsthg - mfrstlw + 1

    def mc_idx(m_f):
        return m_f - mfrstlw

    ikp = np.zeros(nmc_ext, dtype=int)
    ikp1 = np.zeros(nmc_ext, dtype=int)
    ikm = np.zeros(nmc_ext, dtype=int)
    ikm1 = np.zeros(nmc_ext, dtype=int)
    af11 = np.zeros(nmc_ext)
    fklap = np.zeros(nmc_ext)
    fklap1 = np.zeros(nmc_ext)
    fklam = np.zeros(nmc_ext)
    fklam1 = np.zeros(nmc_ext)
    for m in range(mfrstlw, mlsthg + 1):
        i = mc_idx(m)
        frg = frlon[frl_idx(m)]
        af11[i] = CON * frg**11
        flp = frg * (1.0 + ALAMD)
        flm = frg * (1.0 - ALAMD)
        ikp[i] = m + isp
        fkp = frlon[frl_idx(ikp[i])]
        ikp1[i] = ikp[i] + 1
        fklap[i] = (flp - fkp) / (frlon[frl_idx(ikp1[i])] - fkp)
        fklap1[i] = 1.0 - fklap[i]
        ikn = m + ism
        if ikn >= mfrstlw:
            ikm[i] = ikn
            fkm = frlon[frl_idx(ikm[i])]
            ikm1[i] = ikm[i] + 1
            fklam[i] = (flm - fkm) / (frlon[frl_idx(ikm1[i])] - fkm)
            fklam1[i] = 1.0 - fklam[i]
        elif ikn + 1 == mfrstlw:
            ikm[i] = 1
            ikm1[i] = mfrstlw
            fkm = frlon[frl_idx(ikm1[i])] / fratio
            fklam[i] = (flm - fkm) / (frlon[frl_idx(ikm1[i])] - fkm)
            fklam1[i] = 0.0
        else:
            ikm[i] = 1
            ikm1[i] = 1
            fklam[i] = 0.0
            fklam1[i] = 0.0

    frh = np.zeros(kfrh)
    for i in range(1, kfrh + 1):
        m = nfre + i - 1
        frh[i - 1] = (frlon[frl_idx(nfre)] / frlon[frl_idx(m)]) ** 5

    # ---- front-tail reduction factors FTRF (inisnonlin.F90:56-66)
    def epmma(x):
        return math.exp(-min(1.25 * x**4, 50.0)) * x**5

    ftrf = {}                           # Fortran index mfrstlw..1
    alph = 1.0 / epmma(1.0)
    frr = 1.0
    for mc in range(1, mfrstlw - 1, -1):
        ftrf[mc] = alph * epmma(frr)
        frr = frr * fratio

    # ---- clamped indices + 25 packed coefficients (inisnonlin.F90:70-230)
    ic_a = np.zeros(mlsthg, dtype=int)
    ip_a = np.zeros(mlsthg, dtype=int)
    ip1_a = np.zeros(mlsthg, dtype=int)
    im_a = np.zeros(mlsthg, dtype=int)
    im1_a = np.zeros(mlsthg, dtype=int)
    rnl = np.zeros((25, mlsthg))
    for mc in range(1, mlsthg + 1):
        j = mc - 1
        i = mc_idx(mc)
        mp, mp1, mm, mm1 = ikp[i], ikp1[i], ikm[i], ikm1[i]
        ffacp = ffacp1 = ffacm = ffacm1 = ftail = 1.0
        ic = max(mc, 1)
        ip, ip1, im, im1 = mp, mp1, mm, mm1
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
            itemp = min(ip1 - nfre + 1, kfrh)
            ffacp1 = frh[itemp - 1]
            ip1 = nfre
            if ip > nfre:
                ffacp = frh[ip - nfre]      # FRH(IP-NFRE+1)
                ip = nfre
                if ic > nfre:
                    ftail = frh[ic - nfre]
                    ic = nfre
                    if im1 > nfre:
                        ffacm1 = frh[im1 - nfre]
                        im1 = nfre
        ic_a[j], ip_a[j], ip1_a[j] = ic - 1, ip - 1, ip1 - 1
        im_a[j], im1_a[j] = im - 1, im1 - 1

        fklamp, fklamp1 = fklap[i], fklap1[i]
        gw2 = fklamp1 * ffacp * dal1
        gw1 = gw2 * cl11
        gw2 = gw2 * acl1
        gw4 = fklamp * ffacp1 * dal1
        gw3 = gw4 * cl11
        gw4 = gw4 * acl1
        fklampa = fklamp * cl11
        fklampb = fklamp * acl1
        fklamp2 = fklamp1 * acl1
        fklamp1 = fklamp1 * cl11
        rnl[:, j][0:13] = [
            ftail, gw1, gw2, gw3, gw4, fklampa, fklampb, fklamp2,
            fklamp1, fklampa**2, fklampb**2, fklamp1**2, fklamp2**2]

        fklamm, fklamm1 = fklam[i], fklam1[i]
        gw6 = fklamm1 * ffacm * dal2
        gw5 = gw6 * cl21
        gw6 = gw6 * acl2
        gw8 = fklamm * ffacm1 * dal2
        gw7 = gw8 * cl21
        gw8 = gw8 * acl2
        fklamma = fklamm * cl21
        fklammb = fklamm * acl2
        fklamm2 = fklamm1 * acl2
        fklamm1 = fklamm1 * cl21
        rnl[:, j][13:25] = [
            gw5, gw6, gw7, gw8, fklamma, fklammb, fklamm2, fklamm1,
            fklamma**2, fklammb**2, fklamm1**2, fklamm2**2]

    sel = slice(mc_idx(1), mc_idx(mlsthg) + 1)   # per-MC views for MC≥1
    return DiaTables(
        nang=nang, nfre=nfre, mfrstlw=mfrstlw, mlsthg=mlsthg, kfrh=kfrh,
        dal1=dal1, dal2=dal2,
        ikp=ikp[sel], ikp1=ikp1[sel], ikm=ikm[sel], ikm1=ikm1[sel],
        af11=af11[sel],
        ic=ic_a, ip=ip_a, ip1=ip1_a, im=im_a, im1=im1_a, rnl=rnl,
        k1w=k1w[1:] - 1, k2w=k2w[1:] - 1,
        k11w=k11w[1:] - 1, k21w=k21w[1:] - 1)


def transf(xk, depth):
    """Shallow-water nonlinear-transfer enhancement (transf.F90:26-40)."""
    x = xk * depth
    xs = jnp.minimum(x, c.DKMAX)
    t0 = jnp.tanh(xs)
    om = jnp.sqrt(c.G * xk * t0)
    c0 = om / xk
    vg = jnp.where(xs < 1.0e-4, c0,
                   0.5 * c0 * (1.0 + 2.0 * xs / kernelmode.sinh(2.0 * xs)))
    dvg = (t0 - xs * (1.0 - t0**2)) ** 2 + 4.0 * xs**2 * t0**2 * (1.0 - t0**2)
    xnl1 = (9.0 * t0**4 - 10.0 * t0**2 + 9.0) / (8.0 * t0**3)
    xnl2 = ((2.0 * vg - 0.5 * c0) ** 2 / (c.G * depth - vg**2) + 1.0) / xs
    val = (xnl1 - xnl2) ** 2 / (dvg * t0**8)
    return jnp.where((depth < BATHYMAX) & (depth > 0.0) & (x <= c.DKMAX),
                     val, 1.0)


XKDMIN = 0.75            # minimum kd for TRANSF_SNL (yowshal.F90:23)
WP2TAIL = 0.5            # f² tail weight (yowfred.F90:54)


def peak_ang(fl1, tb):
    """Frequency spread ν and directional spread σθ at the peak
    (peak_ang.F90:60-160) — the inputs of the ISNONLIN=2 enhancement.

    fl1 (nang, nfre, npts) → (xnu, sig_th), each (npts,).
    """
    dt = fl1.dtype
    nang, nfre, npts = fl1.shape
    zeps = 10.0 * jnp.finfo(dt).eps
    nsh = 1 + int(math.log(1.5) / math.log(tb.fratio))

    dfim = jnp.asarray(tb.dfim, dt)[:, None]
    dfimfr = jnp.asarray(tb.dfimfr, dt)[:, None]
    dfimfr2 = jnp.asarray(tb.dfimfr2, dt)[:, None]
    temp = jnp.sum(fl1, axis=0)                       # (nfre, npts)
    sum0 = zeps + jnp.sum(dfim * temp, axis=0)
    sum1 = jnp.sum(dfimfr * temp, axis=0)
    sum2 = jnp.sum(dfimfr2 * temp, axis=0)
    # float() casts: numpy f64 SCALARS are strongly typed under x64 and
    # would promote the whole f32 chain (kernel refs reject f64 stores)
    delt25 = float(sp.WETAIL * tb.fr[-1] * tb.delth)
    coef_fr = float(sp.WP1TAIL * tb.delth * tb.fr[-1] ** 2)
    coef_fr2 = float(WP2TAIL * tb.delth * tb.fr[-1] ** 3)
    t_last = temp[-1]
    sum0 = sum0 + delt25 * t_last
    sum1 = sum1 + coef_fr * t_last
    sum2 = sum2 + coef_fr2 * t_last
    xnu = jnp.where(
        sum0 > zeps,
        jnp.sqrt(jnp.maximum(zeps, sum2 * sum0 / sum1**2 - 1.0)), zeps)

    # spectral-peak frequency index over m = 2..nfre-1 (Fortran),
    # initialised to MMAX=2 (peak_ang.F90:88-103)
    interior = fl1[:, 1:nfre - 1, :]
    xmax = jnp.max(interior, axis=(0, 1))
    colmax = jnp.max(interior, axis=0)               # (nfre-2, npts)
    if kernelmode.PALLAS_SAFE:
        # argmax via masked-min-iota (Mosaic has no argmax/gather);
        # first index on ties, matching jnp.argmax
        it = jax.lax.broadcasted_iota(jnp.int32, colmax.shape, 0)
        m_of = jnp.min(jnp.where(colmax == xmax[None, :], it,
                                 jnp.int32(nfre)), axis=0) + 1
    else:
        m_of = jnp.argmax(colmax, axis=0) + 1        # 0-based
    mmax = jnp.where(xmax > 0.0, m_of, 1)

    sinth = jnp.asarray(tb.sinth, dt)[:, None]
    costh = jnp.asarray(tb.costh, dt)[:, None]
    th = jnp.asarray(tb.th, dt)[:, None]
    sum_s = jnp.zeros(npts, dt)
    sum_c = jnp.full(npts, zeps, dt)
    s1 = jnp.full(npts, zeps, dt)
    s2 = jnp.zeros(npts, dt)
    # window m = mmax−nsh .. mmax+nsh clipped to range; the running
    # THMEAN update is sequential in m (Gauss-Seidel, peak_ang.F90:134-148)
    for off in range(-nsh, nsh + 1):
        m = mmax + off
        valid = (m >= 0) & (m <= nfre - 1)
        mc = jnp.clip(m, 0, nfre - 1)
        if kernelmode.PALLAS_SAFE:
            flm = kernelmode.take_freq_at(fl1, mc, axis=1)
            dfim_m = jnp.where(
                valid, kernelmode.take_table(
                    jnp.asarray(tb.dfim, dt), mc), 0.0)
        else:
            flm = jnp.take_along_axis(
                fl1, mc[None, None, :], axis=1)[:, 0, :]  # (nang, npts)
            dfim_m = jnp.where(valid, jnp.asarray(tb.dfim, dt)[mc], 0.0)
        flm = jnp.where(valid[None, :], flm, 0.0)
        sum_s = sum_s + jnp.sum(sinth * flm, axis=0)
        sum_c = sum_c + jnp.sum(costh * flm, axis=0)
        thmean = kernelmode.arctan2(sum_s, sum_c)
        s1 = s1 + jnp.sum(flm, axis=0) * dfim_m
        s2 = s2 + jnp.sum(jnp.cos(th - thmean[None, :]) * flm,
                          axis=0) * dfim_m
    r1 = s2 / s1
    sig_th = jnp.where(s1 > zeps, jnp.sqrt(2.0 * jnp.maximum(1.0 - r1,
                                                             0.0)), 0.0)
    return xnu, sig_th


def transf_snl(xk0, depth, xnu, sig_th):
    """Shallow-water SNL enhancement with spread dependence
    (transf_snl.F90:30-85)."""
    x0 = xk0 * depth
    xk = jnp.maximum(xk0, XKDMIN / depth)
    x = jnp.minimum(xk * depth, c.DKMAX)       # guard sinh overflow
    t0 = jnp.tanh(x)
    t0sq = t0**2
    om = jnp.sqrt(c.G * xk * t0)
    c0 = om / xk
    cs_sq = c.G * depth
    vg = jnp.where(x < 1.0e-4, c0,
                   0.5 * c0 * (1.0 + 2.0 * x / kernelmode.sinh(2.0 * x)))
    vg_sq = vg**2
    dvg = (t0 - x * (1.0 - t0sq)) ** 2 + 4.0 * x**2 * t0sq * (1.0 - t0sq)
    xnl1 = (9.0 * t0sq**2 - 10.0 * t0sq + 9.0) / (8.0 * t0sq * t0)
    xnl2 = ((2.0 * vg - 0.5 * c0) ** 2 / (cs_sq - vg_sq) + 1.0) / x
    xnl4 = 1.0 / (4.0 * t0) * (2.0 * c0 + vg * (1.0 - t0sq)) ** 2 / \
        (cs_sq - vg_sq)
    alp = (1.0 - vg_sq / cs_sq) * c0**2 / vg_sq
    zfac = sig_th**2 / (sig_th**2 + alp * xnu**2)
    xnl = xnl1 - xnl2 + zfac * xnl4
    val = jnp.clip(xnl**2 / (dvg * t0sq**4), 0.1, 10.0)
    return jnp.where((depth < BATHYMAX) & (depth > 0.0) & (x0 <= c.DKMAX),
                     val, 1.0)


def _enhancement(dia: DiaTables, tb, wavnum, depth, akmean, isnonlin: int,
                 fl1=None):
    """ENH(mc, npts) factor (snonlin.F90:123-165), vectorized over MC."""
    dt = wavnum.dtype
    npts = depth.shape[0]
    if isnonlin == 0:
        enhfr = jnp.maximum(0.75 * depth * akmean, 0.5)
        enhfr = 1.0 + (5.5 / enhfr) * (1.0 - 0.833 * enhfr) * jnp.exp(
            -1.25 * enhfr)
        return jnp.broadcast_to(enhfr[None, :], (dia.mlsthg, npts)).astype(dt)
    elif isnonlin == 1:
        # wavenumbers for the extension range NFRE+1..MLSTHG (deep water)
        next_f = np.arange(dia.nfre + 1, dia.mlsthg + 1)
        xk_ext = c.GM1 * (tb.zpifr[-1] * tb.fratio ** (next_f - dia.nfre)) ** 2
        xk = jnp.concatenate([
            wavnum,
            jnp.broadcast_to(jnp.asarray(xk_ext, dt)[:, None],
                             (len(next_f), npts))], axis=0)
        return jnp.clip(transf(xk, depth[None, :]), ENH_MIN, ENH_MAX)
    elif isnonlin == 2:
        # spread-dependent enhancement (snonlin.F90:151-165)
        xnu, sig_th = peak_ang(fl1, tb)
        next_f = np.arange(dia.nfre + 1, dia.mlsthg + 1)
        xk_ext = c.GM1 * (tb.zpifr[-1] * tb.fratio ** (next_f - dia.nfre)) ** 2
        xk = jnp.concatenate([
            wavnum,
            jnp.broadcast_to(jnp.asarray(xk_ext, dt)[:, None],
                             (len(next_f), npts))], axis=0)
        return transf_snl(xk, depth[None, :], xnu[None, :],
                          sig_th[None, :])
    raise ValueError(f"unknown ISNONLIN={isnonlin}")


@dataclasses.dataclass(frozen=True)
class DiaProjection:
    """Dense frequency-projection formulation of the SNONLIN scatter.

    The nine (direction, frequency) scatter targets of snonlin.F90:168-460
    collapse, per direction-rotation, into matrices W[f, mc] with validity
    (raw Fortran index in [1, NFRE]) and the interpolation weights folded
    in.  The scatter becomes einsum('fm,kmp->kfp', W, value) — a tiny
    matmul that XLA maps onto the MXU, replacing thousands of scatter ops.
    Shifts: per KH rotation amounts for K1/K11/K2/K21.
    """

    shifts: np.ndarray      # (2, 4): s1, s11, s2, s21 per KH
    wsl_c: np.ndarray       # (nfre, mlsthg) center  (value ad, shift 0)
    wfld_c: np.ndarray      #                      (value delad)
    wsl_k2: np.ndarray      # targets MM/MM1 at rotation K2  (value ad)
    wsl_k21: np.ndarray
    wfld_k2: np.ndarray     # (value delam)
    wfld_k21: np.ndarray
    wsl_k1: np.ndarray      # targets MP/MP1 at rotation K1  (value ad)
    wsl_k11: np.ndarray
    wfld_k1: np.ndarray     # (value delap)
    wfld_k11: np.ndarray


_PROJ_CACHE: dict = {}


def build_dia_projection(dia: DiaTables) -> DiaProjection:
    key = (dia.nang, dia.nfre)
    if key in _PROJ_CACHE:
        return _PROJ_CACHE[key]
    nfre, mlsthg = dia.nfre, dia.mlsthg

    def proj(raw_f):
        """P[f, mc] = 1 where clamp-free raw Fortran index raw_f[mc]-1 == f."""
        p = np.zeros((nfre, mlsthg))
        for j in range(mlsthg):
            t = int(raw_f[j])
            if 1 <= t <= nfre:
                p[t - 1, j] = 1.0
        return p

    mc_f = np.arange(1, mlsthg + 1)
    p_c = proj(mc_f)
    p_mm = proj(dia.ikm)
    p_mm1 = proj(dia.ikm1)
    p_mp = proj(dia.ikp)
    p_mp1 = proj(dia.ikp1)
    # low-frequency boundary: scatter to MM is skipped for MC ≤ -MFRSTLW+1
    # (snonlin.F90 "ELSE" branch has no (K2, MM) update); those MCs have
    # raw MM < 1 so proj() already drops them.

    r = dia.rnl
    (fklampa, fklampb, fklamp2, fklamp1) = r[5], r[6], r[7], r[8]
    (fklapa2, fklapb2, fklap12, fklap22) = r[9], r[10], r[11], r[12]
    (fklamma, fklammb, fklamm2, fklamm1) = r[17], r[18], r[19], r[20]
    (fklama2, fklamb2, fklam12, fklam22) = r[21], r[22], r[23], r[24]

    shifts = np.zeros((2, 4), dtype=int)
    for kh in range(2):
        for t, arr in enumerate((dia.k1w, dia.k11w, dia.k2w, dia.k21w)):
            m = arr[:, kh]
            s = int(m[0]) % dia.nang
            assert np.all((np.arange(dia.nang) + s) % dia.nang == m % dia.nang)
            shifts[kh, t] = s

    out = DiaProjection(
        shifts=shifts,
        wsl_c=-2.0 * p_c,
        wfld_c=-2.0 * p_c,
        wsl_k2=p_mm * fklamm1 + p_mm1 * fklamma,
        wsl_k21=p_mm * fklamm2 + p_mm1 * fklammb,
        wfld_k2=p_mm * fklam12 + p_mm1 * fklama2,
        wfld_k21=p_mm * fklam22 + p_mm1 * fklamb2,
        wsl_k1=p_mp * fklamp1 + p_mp1 * fklampa,
        wsl_k11=p_mp * fklamp2 + p_mp1 * fklampb,
        wfld_k1=p_mp * fklap12 + p_mp1 * fklapa2,
        wfld_k11=p_mp * fklap22 + p_mp1 * fklapb2,
    )
    _PROJ_CACHE[key] = out
    return out


def _ramp_offset(idx: np.ndarray, lo: int, hi: int):
    """If ``idx`` equals ``clip(arange + d, lo, hi)`` return d, else None."""
    j = np.arange(len(idx))
    d = int(idx[len(idx) // 2]) - len(idx) // 2
    if np.array_equal(idx, np.clip(j + d, lo, hi)):
        return d
    return None


def _affine_offset(raw: np.ndarray):
    """If raw Fortran index array is exactly ``arange(1..) + off`` return
    off (the scatter j = f - off inverse), else None."""
    mc = np.arange(1, len(raw) + 1)
    off = int(raw[0]) - 1
    if np.array_equal(raw, mc + off):
        return off
    return None


def _dia_is_rampable(dia: DiaTables) -> bool:
    """True when every DIA gather/scatter index is a pure (clipped)
    affine ramp AND the KH=2 direction shifts are the negatives of
    KH=1's (the quadruplet mirror) — holds for the standard λ=0.25
    geometry at any (nang, nfre, fratio); checked so the batched kernel
    form can fall back to the generic per-MC loop otherwise."""
    nf = dia.nfre - 1
    ramps = [_ramp_offset(a, 0, nf)
             for a in (dia.ic, dia.ip, dia.ip1, dia.im, dia.im1)]
    affs = [_affine_offset(a)
            for a in (dia.ikp, dia.ikp1, dia.ikm, dia.ikm1)]
    if not all(v is not None for v in ramps + affs):
        return False
    sh = build_dia_projection(dia).shifts
    return bool(np.all(sh[1] % dia.nang == (-sh[0]) % dia.nang))


def _snonlin_batched(fl1, fld, sl, enh, dia: DiaTables):
    """Frequency- AND KH-batched DIA for the Pallas kernel — the per-MC
    loop collapsed into ~100 large VPU ops (snonlin.F90:168-460
    semantics).

    All gather indices are clipped ramps and all scatter targets affine
    maps (see :func:`_dia_is_rampable`), so:
      * the five gathered spectra become edge-replicated frequency
        *shifts* of the direction-rolled spectrum, batched over the
        whole extended-frequency ladder;
      * the KH=2 configuration's direction shifts are the exact
        negatives of KH=1's (the quadruplet mirror), so both passes
        stack on a leading axis: (2, nang, mlsthg, C) tensors, one op
        stream for both;
      * each of the nine scatter targets is a per-MC-weighted
        zero-padded frequency shift accumulated per direction-rotation,
        with ONE direction roll per (rotation, KH).

    Static slices + concats only — Mosaic-lowerable (no gather, no
    dynamic indexing).  Algebraically identical to the projection
    formulation (pinned by tests/test_implsch_pallas.py).
    """
    dt = fl1.dtype
    nang, nfre, npts = fl1.shape
    mlsthg = dia.mlsthg
    pr = build_dia_projection(dia)

    d_ic = _ramp_offset(dia.ic, 0, nfre - 1)
    d_ip = _ramp_offset(dia.ip, 0, nfre - 1)
    d_ip1 = _ramp_offset(dia.ip1, 0, nfre - 1)
    d_im = _ramp_offset(dia.im, 0, nfre - 1)
    d_im1 = _ramp_offset(dia.im1, 0, nfre - 1)
    o_mp = _affine_offset(dia.ikp)
    o_mp1 = _affine_offset(dia.ikp1)
    o_mm = _affine_offset(dia.ikm)
    o_mm1 = _affine_offset(dia.ikm1)

    r = dia.rnl.astype(np.float64)

    def w(i):
        """Per-MC weight row as a pre-broadcast (1, 1, mlsthg, npts)
        constant — a lane-aligned operand (broadcasting a lane-size-1
        operand per use costs a splat per op in Mosaic)."""
        return jnp.asarray(
            np.broadcast_to(r[i].reshape(1, 1, mlsthg, 1),
                            (1, 1, mlsthg, npts)), dt)

    (ftail, gw1, gw2, gw3, gw4) = (w(i) for i in (0, 1, 2, 3, 4))
    (gw5, gw6, gw7, gw8) = (w(i) for i in (13, 14, 15, 16))
    (fklampa, fklampb, fklamp2, fklamp1) = (w(i) for i in (5, 6, 7, 8))
    (fklapa2, fklapb2, fklap12, fklap22) = (w(i) for i in (9, 10, 11, 12))
    (fklamma, fklammb, fklamm2, fklamm1) = (w(i) for i in (17, 18, 19, 20))
    (fklama2, fklamb2, fklam12, fklam22) = (w(i) for i in (21, 22, 23, 24))
    af11 = jnp.asarray(
        np.broadcast_to(
            np.asarray(dia.af11, np.float64).reshape(1, 1, mlsthg, 1),
            (1, 1, mlsthg, npts)), dt)

    def view(x, d):
        """x[..., clip(j+d, 0, nfre-1), :] for j in [0, mlsthg) — concat
        of an edge-replicated head/tail around a static middle slice."""
        lo = max(0, -d)
        hi = max(0, mlsthg + d - nfre)
        parts = [x[..., :1, :]] * lo
        parts.append(x[..., max(0, d):min(nfre, mlsthg + d), :])
        parts.extend([x[..., nfre - 1:nfre, :]] * hi)
        return parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=-2)

    def scat(wx, o):
        """out[..., f, :] = wx[..., f-o, :] (zero where f-o out of
        range), f in [0, nfre)."""
        lo = max(0, o)
        hi = max(0, nfre - o - mlsthg)        # top rows with f-o >= mlsthg
        body = wx[..., lo - o:min(nfre - o, mlsthg), :]
        parts = []
        if lo:
            parts.append(jnp.zeros(wx.shape[:-2] + (lo, npts), dt))
        parts.append(body)
        if hi:
            parts.append(jnp.zeros(wx.shape[:-2] + (hi, npts), dt))
        return parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=-2)

    enh_b = enh[None, None, :, :] if enh.ndim == 2 else enh
    ftemp = af11 * enh_b                             # (1, 1, mlsthg, C)

    s1, s11, s2, s21 = (int(x) for x in pr.shifts[0])

    def stk(s):
        """Both KH rotations of fl1 stacked: [rot_kh1, rot_kh2] where
        rot_kh1 = roll(-s) and the KH=2 shift is −s (mod nang)."""
        return jnp.stack(
            [jnp.roll(fl1, -s, axis=0), jnp.roll(fl1, s, axis=0)],
            axis=0)

    R = {s: stk(s) for s in {s1, s11, s2, s21}}
    F2 = jnp.broadcast_to(fl1[None], (2,) + fl1.shape)

    sap = (gw1 * view(R[s1], d_ip) + gw2 * view(R[s11], d_ip)
           + gw3 * view(R[s1], d_ip1) + gw4 * view(R[s11], d_ip1))
    sam = (gw5 * view(R[s2], d_im) + gw6 * view(R[s21], d_im)
           + gw7 * view(R[s2], d_im1) + gw8 * view(R[s21], d_im1))
    fij = view(F2, d_ic) * ftail
    fad1 = fij * (sap + sam)
    fad2 = fad1 - 2.0 * sap * sam
    fad1 = fad1 + fad2
    fcen = ftemp * fij
    ad = fad2 * fcen
    delad = fad1 * ftemp
    delap = (fij - 2.0 * sam) * float(dia.dal1) * fcen
    delam = (fij - 2.0 * sap) * float(dia.dal2) * fcen

    def unstack_ur(x, s):
        """Sum of the two KH halves unrotated by +s / −s respectively."""
        a, b = x[0], x[1]
        if s == 0:
            return a + b
        return jnp.roll(a, s, axis=0) + jnp.roll(b, -s, axis=0)

    # center target (shift 0)
    c_ad = ad[:, :, :nfre, :]
    c_delad = delad[:, :, :nfre, :]
    dsl = -2.0 * (c_ad[0] + c_ad[1])
    dfld = -2.0 * (c_delad[0] + c_delad[1])
    # MM/MM1 at rotations K2/K21
    dsl = dsl + unstack_ur(scat(fklamm1 * ad, o_mm)
                           + scat(fklamma * ad, o_mm1), s2)
    dsl = dsl + unstack_ur(scat(fklamm2 * ad, o_mm)
                           + scat(fklammb * ad, o_mm1), s21)
    dfld = dfld + unstack_ur(scat(fklam12 * delam, o_mm)
                             + scat(fklama2 * delam, o_mm1), s2)
    dfld = dfld + unstack_ur(scat(fklam22 * delam, o_mm)
                             + scat(fklamb2 * delam, o_mm1), s21)
    # MP/MP1 at rotations K1/K11
    dsl = dsl + unstack_ur(scat(fklamp1 * ad, o_mp)
                           + scat(fklampa * ad, o_mp1), s1)
    dsl = dsl + unstack_ur(scat(fklamp2 * ad, o_mp)
                           + scat(fklampb * ad, o_mp1), s11)
    dfld = dfld + unstack_ur(scat(fklap12 * delap, o_mp)
                             + scat(fklapa2 * delap, o_mp1), s1)
    dfld = dfld + unstack_ur(scat(fklap22 * delap, o_mp)
                             + scat(fklapb2 * delap, o_mp1), s11)

    return fld + dfld, sl + dsl


def _snonlin_mc_loop(fl1, fld, sl, enh, dia: DiaTables):
    """Per-MC static-scatter DIA — the Fortran loop structure
    (snonlin.F90:168-460) with every index a compile-time constant.

    This is the Pallas-kernel formulation: only (nang, npts) slices are
    live per MC iteration (VMEM-lean) and there are no batched einsums
    or gather ops, just static slices, rolls and adds.  Algebraically
    identical to the projection formulation in :func:`snonlin` (pinned
    by tests/test_implsch_pallas.py).
    """
    dt = fl1.dtype
    nang, nfre, npts = fl1.shape
    pr = build_dia_projection(dia)
    r = dia.rnl.astype(np.float64)
    (ftail, gw1, gw2, gw3, gw4) = r[0], r[1], r[2], r[3], r[4]
    (gw5, gw6, gw7, gw8) = r[13], r[14], r[15], r[16]
    (fklampa, fklampb, fklamp2, fklamp1) = r[5], r[6], r[7], r[8]
    (fklapa2, fklapb2, fklap12, fklap22) = r[9], r[10], r[11], r[12]
    (fklamma, fklammb, fklamm2, fklamm1) = r[17], r[18], r[19], r[20]
    (fklama2, fklamb2, fklam12, fklam22) = r[21], r[22], r[23], r[24]
    af11 = np.asarray(dia.af11, np.float64)

    dsl_c = [None] * nfre          # per-frequency (nang, npts) columns
    dfld_c = [None] * nfre

    def add(cols, f, val):
        cols[f] = val if cols[f] is None else cols[f] + val

    for kh in range(2):
        s1, s11, s2, s21 = (int(x) for x in pr.shifts[kh])
        # pre-rolled full-spectrum inputs (rot(a, s)[k] = a[(k+s) % nang]):
        # one 3-op roll per distinct shift replaces per-j slice rolls
        R = {s: (fl1 if s == 0 else jnp.roll(fl1, -s, axis=0))
             for s in {s1, s11, s2, s21}}

        for j in range(dia.mlsthg):
            ic, ip, ip1 = int(dia.ic[j]), int(dia.ip[j]), int(dia.ip1[j])
            im, im1 = int(dia.im[j]), int(dia.im1[j])
            sx = kernelmode.sidx
            sap = (float(gw1[j]) * sx(R[s1], ip, 1)
                   + float(gw2[j]) * sx(R[s11], ip, 1)
                   + float(gw3[j]) * sx(R[s1], ip1, 1)
                   + float(gw4[j]) * sx(R[s11], ip1, 1))
            sam = (float(gw5[j]) * sx(R[s2], im, 1)
                   + float(gw6[j]) * sx(R[s21], im, 1)
                   + float(gw7[j]) * sx(R[s2], im1, 1)
                   + float(gw8[j]) * sx(R[s21], im1, 1))
            fij = sx(fl1, ic, 1) * float(ftail[j])
            fad1 = fij * (sap + sam)
            fad2 = fad1 - 2.0 * sap * sam
            fad1 = fad1 + fad2
            ftemp_j = float(af11[j]) * kernelmode.sidx(enh, j, 0)
            fcen = ftemp_j * fij
            ad = fad2 * fcen
            delad = fad1 * ftemp_j
            delap = (fij - 2.0 * sam) * float(dia.dal1) * fcen
            delam = (fij - 2.0 * sap) * float(dia.dal2) * fcen

            # unrot(x, s)[k] = x[(k-s) % nang]; cache one roll per value
            # per shift — w·unrot(x, s) = unrot(w·x, s) lets the weight
            # multiply ride on the cached rolled value
            _rc = {}

            def ur(x, s, _rc=_rc):
                key = (id(x), s)
                if key not in _rc:
                    _rc[key] = x if s == 0 else jnp.roll(x, s, axis=0)
                return _rc[key]

            if j < nfre:                       # center target MC
                add(dsl_c, j, -2.0 * ad)
                add(dfld_c, j, -2.0 * delad)
            # MM/MM1 targets at rotations K2/K21 (raw index in range only)
            raw_mm, raw_mm1 = int(dia.ikm[j]), int(dia.ikm1[j])
            if 1 <= raw_mm <= nfre:
                add(dsl_c, raw_mm - 1, float(fklamm1[j]) * ur(ad, s2)
                    + float(fklamm2[j]) * ur(ad, s21))
                add(dfld_c, raw_mm - 1, float(fklam12[j]) * ur(delam, s2)
                    + float(fklam22[j]) * ur(delam, s21))
            if 1 <= raw_mm1 <= nfre:
                add(dsl_c, raw_mm1 - 1, float(fklamma[j]) * ur(ad, s2)
                    + float(fklammb[j]) * ur(ad, s21))
                add(dfld_c, raw_mm1 - 1, float(fklama2[j]) * ur(delam, s2)
                    + float(fklamb2[j]) * ur(delam, s21))
            # MP/MP1 targets at rotations K1/K11
            raw_mp, raw_mp1 = int(dia.ikp[j]), int(dia.ikp1[j])
            if 1 <= raw_mp <= nfre:
                add(dsl_c, raw_mp - 1, float(fklamp1[j]) * ur(ad, s1)
                    + float(fklamp2[j]) * ur(ad, s11))
                add(dfld_c, raw_mp - 1, float(fklap12[j]) * ur(delap, s1)
                    + float(fklap22[j]) * ur(delap, s11))
            if 1 <= raw_mp1 <= nfre:
                add(dsl_c, raw_mp1 - 1, float(fklampa[j]) * ur(ad, s1)
                    + float(fklampb[j]) * ur(ad, s11))
                add(dfld_c, raw_mp1 - 1, float(fklapa2[j]) * ur(delap, s1)
                    + float(fklapb2[j]) * ur(delap, s11))

    zero = jnp.zeros((nang, npts), dt)
    dsl = jnp.stack([c if c is not None else zero for c in dsl_c], axis=1)
    dfld = jnp.stack([c if c is not None else zero for c in dfld_c],
                     axis=1)
    return fld + dfld, sl + dsl


def snonlin(fl1, fld, sl, wavnum, depth, akmean, tb, dia: DiaTables,
            *, isnonlin: int = 1):
    """DIA nonlinear transfer, added onto (fld, sl) (snonlin.F90:70-470).

    Matmul formulation: all MC handled at once; gathers are static takes
    over the frequency axis, direction coupling is jnp.roll, and the
    frequency scatter is 10 small einsums (see DiaProjection).  Inside a
    Pallas kernel (kernelmode.PALLAS_SAFE) the per-MC static-scatter
    loop is used instead.
    """
    dt = fl1.dtype
    nang, nfre, npts = fl1.shape
    pr = build_dia_projection(dia)
    enh = _enhancement(dia, tb, wavnum, depth, akmean, isnonlin,
                       fl1=fl1)
    if kernelmode.PALLAS_SAFE:
        if KERNEL_DIA == "batched" and _dia_is_rampable(dia):
            return _snonlin_batched(fl1, fld, sl, enh, dia)
        return _snonlin_mc_loop(fl1, fld, sl, enh, dia)

    r = dia.rnl.astype(np.float64)
    ftail = jnp.asarray(r[0], dt)[None, :, None]
    gw = [jnp.asarray(r[i], dt)[None, :, None] for i in (1, 2, 3, 4)]
    gw5678 = [jnp.asarray(r[i], dt)[None, :, None] for i in (13, 14, 15, 16)]

    f_ic = jnp.take(fl1, jnp.asarray(dia.ic), axis=1)    # (nang, mlsthg, npts)
    f_ip = jnp.take(fl1, jnp.asarray(dia.ip), axis=1)
    f_ip1 = jnp.take(fl1, jnp.asarray(dia.ip1), axis=1)
    f_im = jnp.take(fl1, jnp.asarray(dia.im), axis=1)
    f_im1 = jnp.take(fl1, jnp.asarray(dia.im1), axis=1)

    ftemp = (jnp.asarray(dia.af11, dt)[:, None] * enh)[None, :, :]

    def pj(w, val):
        return jnp.einsum("fm,kmp->kfp", jnp.asarray(w, dt), val)

    dsl = jnp.zeros_like(fld)
    dfld = jnp.zeros_like(fld)
    for kh in range(2):
        s1, s11, s2, s21 = (int(x) for x in pr.shifts[kh])

        def rot(a, s):
            return a if s == 0 else jnp.roll(a, -s, axis=0)

        def unrot(a, s):
            return a if s == 0 else jnp.roll(a, s, axis=0)

        sap = (gw[0] * rot(f_ip, s1) + gw[1] * rot(f_ip, s11)
               + gw[2] * rot(f_ip1, s1) + gw[3] * rot(f_ip1, s11))
        sam = (gw5678[0] * rot(f_im, s2) + gw5678[1] * rot(f_im, s21)
               + gw5678[2] * rot(f_im1, s2) + gw5678[3] * rot(f_im1, s21))
        fij = f_ic * ftail
        fad1 = fij * (sap + sam)
        fad2 = fad1 - 2.0 * sap * sam
        fad1 = fad1 + fad2
        fcen = ftemp * fij
        ad = fad2 * fcen
        delad = fad1 * ftemp
        delap = (fij - 2.0 * sam) * dia.dal1 * fcen
        delam = (fij - 2.0 * sap) * dia.dal2 * fcen

        dsl = dsl + pj(pr.wsl_c, ad)
        dfld = dfld + pj(pr.wfld_c, delad)
        dsl = dsl + unrot(pj(pr.wsl_k2, ad), s2) + unrot(pj(pr.wsl_k21, ad), s21)
        dfld = dfld + unrot(pj(pr.wfld_k2, delam), s2) \
                    + unrot(pj(pr.wfld_k21, delam), s21)
        dsl = dsl + unrot(pj(pr.wsl_k1, ad), s1) + unrot(pj(pr.wsl_k11, ad), s11)
        dfld = dfld + unrot(pj(pr.wfld_k1, delap), s1) \
                    + unrot(pj(pr.wfld_k11, delap), s11)

    return fld + dfld, sl + dsl
