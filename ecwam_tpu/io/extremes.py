"""Freak-wave / extreme-sea-state diagnostics (the KURTOSIS chain).

JAX re-derivations of the reference's envelope-statistics output path:
  - peak_ang   L-H spectral width and angular width at the peak
               (/root/reference/src/ecwam/peak_ang.F90:74-180)
  - transf_r   narrow-band R transfer function   (transf_r.F90:49-74)
  - transf_bfi shallow-water BFI² transfer       (transf_bfi.F90:53-91)
  - stat_nl    skewness C3 / kurtosis C4 (bound + dynamic NLS part),
               wave-induced mean sea level       (stat_nl.F90:86-180)
  - h_max      expected maximum envelope wave height from the stretched
               exponential distribution          (h_max.F90:90-130)
  - kurtosis   driver producing C3, C4, BFI², QP (Goda peakedness),
               HMAX, TMAX, ETA_M, R, XNSLC, SIG_TH, EPS, XNU
               (kurtosis.F90:250-400)

All functions take fl1 (nang, nfre, npts) and return (npts,) arrays;
everything is fixed-trip-count and branch-free so it jits cleanly on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import spectral as sp

XKDMIN = 0.75          # min k·d for the freak-wave nonlinear terms (yowshal.F90:23)
BATHYMAX = 998.999


def aki_jax(om, depth, n_iter: int = 30):
    """Wave number from ω² = g·k·tanh(kd) — fixed-trip Newton (aki.F90:28-47)."""
    akm1 = om**2 / (4.0 * c.G)
    akm2 = om / (2.0 * jnp.sqrt(c.G * jnp.maximum(depth, 1e-6)))
    ao = jnp.maximum(akm1, akm2)
    deep = depth * ao > c.DKMAX

    def body(_, ak):
        bo = jnp.minimum(depth * ak, c.DKMAX)
        th = c.G * ak * jnp.tanh(bo)
        sth = jnp.sqrt(th)
        return ak + (om - sth) * sth * 2.0 / (
            th / ak + c.G * bo / jnp.cosh(bo) ** 2)

    ak = jax.lax.fori_loop(0, n_iter, body, ao)
    return jnp.where(deep, om**2 / c.G, ak)


def _group_velocity(x, c0):
    """V_g with the deep (x>DKMAX) and shallow (x→0) limits (transf_r.F90:58-66)."""
    xs = jnp.clip(x, 1e-4, c.DKMAX)
    vg = 0.5 * c0 * (1.0 + 2.0 * xs / jnp.sinh(2.0 * xs))
    vg = jnp.where(x < 1e-4, c0, vg)
    return jnp.where(x > c.DKMAX, 0.5 * c0, vg)


def peak_ang(fl1, tb):
    """Frequency width XNU and angular width SIG_TH (peak_ang.F90:74-180)."""
    dt = fl1.dtype
    eps = jnp.asarray(10.0 * np.finfo(np.float32).eps, dt)
    nang, nfre, npts = fl1.shape
    nsh = 1 + int(np.log(1.5) / np.log(tb.fratio))

    ff = jnp.sum(fl1, axis=0)                     # (nfre, npts)
    dfim = jnp.asarray(tb.dfim, dt)[:, None]
    dfimfr = jnp.asarray(tb.dfimfr, dt)[:, None]
    dfimfr2 = jnp.asarray(tb.dfimfr2, dt)[:, None]
    sum0 = eps + jnp.sum(ff * dfim, axis=0)
    sum1 = jnp.sum(ff * dfimfr, axis=0)
    sum2 = jnp.sum(ff * dfimfr2, axis=0)
    # tail corrections (peak_ang.F90:118-127)
    last = ff[-1]
    sum0 = sum0 + sp.WETAIL * tb.fr[-1] * tb.delth * last
    sum1 = sum1 + sp.WP1TAIL * tb.delth * tb.fr[-1] ** 2 * last
    sum2 = sum2 + sp.WP2TAIL * tb.delth * tb.fr[-1] ** 3 * last
    xnu = jnp.where(
        sum0 > eps,
        jnp.sqrt(jnp.maximum(eps, sum2 * sum0 / sum1**2 - 1.0)), eps)

    # 2-D spectral max over interior frequencies (peak_ang.F90:133-147)
    interior = fl1[:, 1 : nfre - 1]
    flat = interior.reshape(-1, npts)
    mmax = 1 + jnp.argmax(jnp.max(interior, axis=0), axis=0)   # (npts,)

    # frequency window mmax±nsh around the peak
    m_idx = jnp.arange(nfre)[:, None]
    in_win = ((m_idx >= jnp.maximum(0, mmax - nsh)[None, :])
              & (m_idx <= jnp.minimum(nfre - 1, mmax + nsh)[None, :]))
    win = jnp.where(in_win[None, :, :], fl1, 0.0)
    sinth = jnp.asarray(tb.sinth, dt)[:, None, None]
    costh = jnp.asarray(tb.costh, dt)[:, None, None]
    sum_s = jnp.sum(win * sinth, axis=(0, 1))
    sum_c = eps + jnp.sum(win * costh, axis=(0, 1))
    thmean = jnp.arctan2(sum_s, sum_c)
    th = jnp.asarray(tb.th, dt)[:, None, None]
    w = win * dfim[None, :, :]
    sum1w = eps + jnp.sum(w, axis=(0, 1))
    sum2w = jnp.sum(jnp.cos(th - thmean[None, None, :]) * w, axis=(0, 1))
    r1 = sum2w / sum1w
    sig_th = jnp.where(sum1w > eps,
                       jnp.sqrt(jnp.maximum(2.0 * (1.0 - r1), 0.0)), 0.0)
    return xnu, sig_th


def transf_r(xk0, d):
    """Narrow-band R transfer function (transf_r.F90:49-74)."""
    x0 = xk0 * d
    xk = jnp.maximum(xk0, XKDMIN / jnp.maximum(d, 1e-6))
    x = jnp.clip(xk * d, 1e-4, c.DKMAX)
    t0 = jnp.tanh(x)
    t0_sq = t0**2
    om = jnp.sqrt(c.G * xk * t0)
    c0 = om / xk
    vg = _group_velocity(x, c0)
    d2om = (t0 - x * (1.0 - t0_sq)) ** 2 + 4.0 * x**2 * t0_sq * (1.0 - t0_sq)
    val = 4.0 * (vg / c0) ** 3 * t0_sq / jnp.maximum(d2om, 1e-12)
    shallow_ok = (d < BATHYMAX) & (d > 0.0) & (xk0 > 0.0) & (x0 <= c.DKMAX)
    return jnp.where(shallow_ok, val, 0.5)


def transf_bfi(xk0, d, xnu, sig_th):
    """Shallow-water BFI² transfer function (transf_bfi.F90:53-91)."""
    x0 = xk0 * d
    xk = jnp.maximum(xk0, XKDMIN / jnp.maximum(d, 1e-6))
    x = jnp.clip(xk * d, 1e-4, c.DKMAX)
    t0 = jnp.tanh(x)
    t0_sq = t0**2
    om = jnp.sqrt(c.G * xk * t0)
    c0 = om / xk
    cs_sq = c.G * d
    vg = _group_velocity(x, c0)
    vg_sq = vg**2
    d2om = (t0 - x * (1.0 - t0_sq)) ** 2 + 4.0 * x**2 * t0_sq * (1.0 - t0_sq)
    guard = jnp.maximum(cs_sq - vg_sq, 1e-8)
    xnl_1 = (9.0 * t0_sq**2 - 10.0 * t0_sq + 9.0) / (8.0 * t0_sq * t0)
    xnl_2 = ((2.0 * vg - 0.5 * c0) ** 2 / guard + 1.0) / x
    xnl_4 = 1.0 / (4.0 * t0) * (2.0 * c0 + vg * (1.0 - t0_sq)) ** 2 / guard
    alp = (1.0 - vg_sq / jnp.maximum(cs_sq, 1e-8)) * c0**2 / vg_sq
    zfac = sig_th**2 / jnp.maximum(sig_th**2 + alp * xnu**2, 1e-12)
    t_nl = xnl_1 - xnl_2 + zfac * xnl_4
    val = 4.0 * (vg / c0) ** 2 * t_nl * t0 / jnp.maximum(d2om, 1e-12)
    val = jnp.clip(val, -4.0, 4.0)
    shallow_ok = (d < BATHYMAX) & (d > 0.0) & (xk0 > 0.0) & (x0 <= c.DKMAX)
    return jnp.where(shallow_ok, val, 1.0)


def stat_nl(xm0, xk0, bf2, xnu, sig_th, depth):
    """Skewness C3 & kurtosis C4 (bound + dynamic), mean sea level
    (stat_nl.F90:86-180)."""
    dt = xm0.dtype
    eps = jnp.asarray(10.0 * np.finfo(np.float32).eps, dt)
    c4_const = 0.9 * c.PI / (3.0 * np.sqrt(3.0))
    zc1 = 4.0 * np.sqrt(3.0) / c.PI
    zc2 = 1.0 / 3.0 + 2.0 * np.sqrt(3.0) / c.PI
    zc3 = 2.0 * np.sqrt(3.0) / c.PI - 4.0 / 3.0

    transf = transf_r(xk0, depth)
    xk = jnp.maximum(xk0, XKDMIN / jnp.maximum(depth, 1e-6))
    x = jnp.clip(xk * depth, 1e-4, c.DKMAX)
    t0 = jnp.tanh(x)
    t0_sq = t0**2
    om = jnp.sqrt(c.G * xk * t0)
    alph = xk / (4.0 * t0_sq * t0) * (3.0 - t0_sq)
    gam = -0.5 * alph**2
    c0 = om / xk
    cs_sq = c.G * depth
    vg = _group_velocity(x, c0)
    vg_sq = vg**2
    guard = jnp.maximum(cs_sq - vg_sq, 1e-8)

    zfac = -0.25 * xk * cs_sq / guard
    delta_1d = zfac * (2.0 * (1.0 - t0_sq) / t0 + 1.0 / x)
    zfac1 = 0.5 * c0 * cs_sq * vg / t0
    xkappa1 = zfac1 * (2.0 * c0 + vg * (1.0 - t0_sq)) / guard
    alpha = (1.0 - vg_sq / jnp.maximum(cs_sq, 1e-8)) * c0**2 / vg_sq
    zfac2 = sig_th**2 / jnp.maximum(sig_th**2 + alpha * xnu**2, 1e-12)
    delta_2d = 0.5 * xk**2 * xkappa1 / (om * jnp.maximum(cs_sq, 1e-8)) * zfac2
    delta = delta_1d + delta_2d

    eta_m = 2.0 * xm0 * delta
    c3 = jnp.clip(1.12 * 2.0 * jnp.sqrt(jnp.maximum(xm0, 0.0))
                  * (alph + 0.9 * delta), 0.0, 0.25)
    c4_b = 0.93 * 8.0 * xm0 * (gam + alph**2 + (alph + delta) ** 2)

    r = jnp.clip(transf * (sig_th / jnp.maximum(xnu, eps)) ** 2, 0.0, 16.0)
    zr = jnp.maximum(r, eps)
    xj_hi = -c4_const / zr * (1.0 - zc1 / jnp.sqrt(zr) + zc2 / zr
                              + zc3 / zr**2)
    xj_lo = c4_const * (1.0 - zc1 * jnp.sqrt(zr) + zc2 * zr + zc3 * zr**2)
    xj = jnp.where(zr > 1.0, xj_hi, xj_lo)
    c4_dyn = xj * bf2
    c4 = jnp.clip(c4_dyn + c4_b, -0.25, 0.25)

    valid = (xm0 > eps) & (depth > 0.0) & (xk0 > 0.0)
    zero = jnp.zeros_like(xm0)
    return tuple(jnp.where(valid, v, zero)
                 for v in (c3, c4, eta_m, r, c4_b, c4_dyn))


def h_max(c3, c4, xnslc):
    """Expected max envelope height / its width from the stretched
    exponential distribution (h_max.F90:90-130). Returns (aa, bb, hmaxn,
    sig_hm)."""
    dt = c3.dtype
    eps = jnp.asarray(10.0 * np.finfo(np.float32).eps, dt)
    gam = 0.5772
    twog1 = -2.0 * gam
    g2 = gam**2 + c.PI**2 / 6.0
    eb = 10.0
    ae = 0.5 * eb * (eb - 2.0)
    be = 0.5 * eb * (eb**2 - 6.0 * eb + 6.0)
    emin, emax = 2.0 * 1.0**2, 2.0 * 4.0**2

    dfnorma = c4 * ae + c3**2 * be
    f = jnp.log(jnp.maximum(1.0 + dfnorma, 0.1))
    aa = jnp.minimum(((eb - f) ** 2 - 2.0 * eb)
                     / jnp.maximum(2.0 * f, eps * jnp.sign(f) + eps), 1000.0)
    bb = 2.0 * (1.0 + aa)
    bbm1 = 1.0 / (bb + eps * jnp.sign(bb))

    e = jnp.full_like(c3, 2.0 * 2.0**2)
    z0 = jnp.zeros_like(c3)
    xn = jnp.maximum(xnslc, 1.0)
    for _ in range(5):
        z0 = jnp.log(xn * jnp.sqrt(0.5 * e))
        e = (g2 - twog1 * (aa + z0) + (2.0 * aa + z0) * z0) * bbm1
        e = jnp.clip(e, emin, emax)
    hmaxn = jnp.sqrt(0.5 * e)
    sig_hm = c.PI * hmaxn / (2.0 * np.sqrt(6.0) * (z0 + 0.5 * gam))

    valid = (xnslc > 0.0) & (jnp.abs(dfnorma) > eps)
    return (jnp.where(valid, aa, 0.0), jnp.where(valid, bb, 2.0),
            jnp.where(valid, hmaxn, 1.0), jnp.where(valid, sig_hm, 0.0))


def kurtosis(fl1, depth, tb):
    """Full freak-wave diagnostic set (kurtosis.F90:250-400).

    Returns dict with c3, c4, bfi2, qp, hmax, tmax, eta_m, r, xnslc,
    sig_th, eps (steepness), xnu — all (npts,)."""
    dt = fl1.dtype
    zeps = jnp.asarray(10.0 * np.finfo(np.float32).eps, dt)
    zsqeps = jnp.sqrt(zeps)
    frmax, frmin = float(tb.fr[-1]), float(tb.fr[0])

    xnu, sig_th = peak_ang(fl1, tb)

    ff = jnp.sum(fl1, axis=0)                    # (nfre, npts)
    ffmax = jnp.max(ff, axis=0)
    dfim = jnp.asarray(tb.dfim, dt)[:, None]
    dfimfr = jnp.asarray(tb.dfimfr, dt)[:, None]
    dfimfr2 = jnp.asarray(tb.dfimfr2, dt)[:, None]
    dfimofr = jnp.asarray(tb.dfimofr, dt)[:, None]
    sum0 = zeps + jnp.sum(ff * dfim, axis=0)
    sum1 = jnp.sum(ff * dfimfr, axis=0)
    sum2 = jnp.sum(ff * dfimfr2, axis=0)
    sum6 = jnp.sum(ff * dfimofr, axis=0)
    last = ff[-1]
    sum0 = sum0 + sp.WETAIL * tb.fr[-1] * tb.delth * last
    sum1 = sum1 + sp.WP1TAIL * tb.delth * tb.fr[-1] ** 2 * last
    sum2 = sum2 + sp.WP2TAIL * tb.delth * tb.fr[-1] ** 3 * last
    sum6 = sum6 + sp.FRTAIL * tb.delth * last

    # Goda peakedness QP over bins above 0.4·max (kurtosis.F90:312-327)
    fac4 = 2.0 * tb.delth * dfimfr
    above = ff > (0.4 * ffmax)[None, :]
    sum40 = zsqeps + jnp.sum(jnp.where(above, ff, 0.0) * dfim, axis=0)
    sum4 = jnp.sum(jnp.where(above, ff, 0.0) ** 2 * fac4, axis=0)

    ok = (sum1 > zsqeps) & (sum0 > zeps)
    f_m = jnp.clip(sum1 / sum0, frmin, frmax)
    qp = jnp.where(ok, jnp.clip(sum4 / sum40**2, 0.5, 15.0), 0.0)
    sig_om = jnp.where(ok, (1.0 / np.sqrt(c.PI)) / jnp.maximum(qp, 0.5), 0.0)

    om_mean = 0.89 * c.ZPI * jnp.clip(sum0 / jnp.maximum(sum6, zeps),
                                      frmin, frmax)
    om_mean = jnp.where(ok, om_mean, 0.89 * c.ZPI * frmax)
    xkp = jnp.where(ok, aki_jax(om_mean, depth), om_mean**2 / c.G)
    eps_st = jnp.where(ok, xkp * jnp.sqrt(sum0), 0.0)

    trans = transf_bfi(xkp, depth, xnu, sig_th)
    bf2 = 2.0 * trans * (eps_st / jnp.maximum(sig_om, zeps)) ** 2
    bf2 = jnp.where(ok, jnp.clip(bf2, -5.0, 5.0), 0.0)

    c3, c4, eta_m, r, _c4b, _c4d = stat_nl(sum0, xkp, bf2, xnu, sig_th,
                                           depth)

    # number of wave groups at the significant level (kurtosis.F90:355-368)
    dur = 1200.0
    om_up = 2.0 * c.ZPI / np.sqrt(c.PI) * xnu * f_m
    xnslc = jnp.where(f_m > 0.0, jnp.round(dur * om_up), 0.0)

    _aa, _bb, hmaxn, _sig = h_max(c3, c4, xnslc)
    zeps_h = xnu / (np.sqrt(2.0) * jnp.maximum(hmaxn, zeps))
    tmax = (1.0 + 0.5 * zeps_h**2 + 0.75 * zeps_h**4) * (
        sum0 / jnp.maximum(sum1, zeps))
    tmax = jnp.where((sum1 > zeps) & (hmaxn > zeps), tmax, 0.0)
    hs = 4.0 * jnp.sqrt(jnp.maximum(sum0, 0.0))
    hmax_out = jnp.where(sum0 > 0.0, hmaxn * hs, 0.0)
    xnu = jnp.where(sum0 > 0.0, xnu, 0.0)

    return dict(c3=c3, c4=c4, bfi2=bf2, qp=qp, hmax=hmax_out, tmax=tmax,
                eta_m=eta_m, r=r, xnslc=xnslc, sig_th=sig_th, eps=eps_st,
                xnu=xnu)
