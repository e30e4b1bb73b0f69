"""Gravity-capillary spectrum subsystem.

TPU-native re-derivations of the reference's gravity-capillary machinery,
used by the LLGCBZ0 surface-roughness closure and the mean-square-slope
products:

  - INITGC      log-spaced gravity-capillary wavenumber tables
                (/root/reference/src/ecwam/initgc.F90:19-77,
                 gc_dispersion.h: omega² = g·k + T·k³)
  - NS_GC       index of the u*-dependent cut-off wavenumber (ns_gc.F90:17-24)
  - OMEGAGC     cut-off wavenumber/frequency lookup (omegagc.F90:20-34)
  - STRESS_GC   wave-supported stress carried by the gravity-capillary
                range (stress_gc.F90:40-106)
  - MEANSQS_LF  mean square slope of the resolved spectrum (meansqs_lf.F90)
  - MEANSQS_GC  gravity-capillary msqs contribution (meansqs_gc.F90:30-79)
  - HALPHAP     half the Phillips parameter from the spectrum in the wind
                direction (halphap.F90:30-100)
  - MEANSQS     total mean square slope up to a cut-off wavenumber
                (meansqs.F90:37-98)

Tables are host NumPy (built once); the per-point functions are JAX with
point-dependent table indices vectorized as masked sums over the (small,
static) gravity-capillary wavenumber axis.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.ops.physics import kernelmode


def _tab(table, idx):
    """table[idx] for per-point int indices — one-hot inside Pallas
    kernels (Mosaic has no per-lane dynamic gather), plain gather in XLA
    (bit-identical results either way)."""
    if kernelmode.PALLAS_SAFE:
        return kernelmode.take_table(table, idx)
    return table[idx]

KRATIO_GC = 1.2          # yowfred.F90:62
XKS_GC = 0.006           # smallest gc wavenumber (yowfred.F90:64)
XKL_GC = 20000.0         # largest gc wavenumber (yowfred.F90:65)
XLOGKRATIOM1_GC = 1.0 / math.log(KRATIO_GC)


def _fomeg(k: np.ndarray) -> np.ndarray:
    """Gravity-capillary dispersion ω(k) (gc_dispersion.h)."""
    return np.sqrt(c.G * k + c.SURFT * k**3)


@dataclasses.dataclass(frozen=True)
class GCTables:
    """Log-spaced gravity-capillary wavenumber tables (initgc.F90:48-77)."""

    nwav: int
    xk: np.ndarray            # wavenumbers k_i = XKS_GC·KRATIO^(i)
    xkm: np.ndarray           # 1/k
    omega: np.ndarray         # ω(k)
    omxkm3: np.ndarray        # ω/k³
    vg: np.ndarray            # group speed
    cm: np.ndarray            # 1/c
    c2osqrtvg: np.ndarray     # c²/√vg
    xkmsqrtvgoc2: np.ndarray  # (1/k)/(c²/√vg)
    om3gmkm: np.ndarray       # ω³/(g·k)
    delkcc: np.ndarray        # centred Δk/(c²/√vg)
    delkcc_ns: np.ndarray     # one-sided Δk/(c²/√vg) for the cut-off bin
    delkcc_omxkm3: np.ndarray


def build_gc_tables() -> GCTables:
    nwav = int(round(math.log(XKL_GC / XKS_GC) / math.log(KRATIO_GC)))
    i = np.arange(nwav, dtype=np.float64)
    xk = XKS_GC * KRATIO_GC**i
    xkm = 1.0 / xk
    omega = _fomeg(xk)
    vg = 0.5 / omega * (c.G + 3.0 * c.SURFT * xk**2)
    cph = omega / xk
    c2osqrtvg = cph**2 / np.sqrt(vg)
    delkcc = np.empty(nwav)
    delkcc_ns = np.empty(nwav)
    delkcc[0] = 0.5 * (xk[1] - xk[0]) / c2osqrtvg[0]
    delkcc_ns[0] = delkcc[0]
    delkcc[1:-1] = 0.5 * (xk[2:] - xk[:-2]) / c2osqrtvg[1:-1]
    delkcc_ns[1:-1] = 0.5 * (xk[2:] - xk[1:-1]) / c2osqrtvg[1:-1]
    delkcc[-1] = 0.5 * (xk[-1] - xk[-2]) / c2osqrtvg[-1]
    delkcc_ns[-1] = delkcc[-1]
    omxkm3 = omega * xkm**3
    return GCTables(
        nwav=nwav, xk=xk, xkm=xkm, omega=omega, omxkm3=omxkm3, vg=vg,
        cm=1.0 / cph, c2osqrtvg=c2osqrtvg,
        xkmsqrtvgoc2=xkm / c2osqrtvg, om3gmkm=omega**3 / (c.G * xk),
        delkcc=delkcc, delkcc_ns=delkcc_ns,
        delkcc_omxkm3=delkcc * omxkm3)


_GC_CACHE: GCTables | None = None


def gc_tables() -> GCTables:
    global _GC_CACHE
    if _GC_CACHE is None:
        _GC_CACHE = build_gc_tables()
    return _GC_CACHE


def ns_gc(ustar, gct: GCTables):
    """0-based index of the u*-dependent gc cut-off (ns_gc.F90:21-23)."""
    xks = c.SQRTGOSURFT / (1.48 + 2.05 * ustar)
    # Fortran: NS = MIN(INT(...)+1, NWAV-1), 1-based → 0-based MIN(INT, NWAV-2)
    ns0 = jnp.astype(
        jnp.floor(jnp.log(jnp.maximum(xks * gct.xkm[0], 1.0))
                  * XLOGKRATIOM1_GC), jnp.int32)
    return jnp.minimum(ns0, gct.nwav - 2)


def omegagc(ustar, gct: GCTables):
    """Cut-off index, wavenumber and angular frequency (omegagc.F90:28-33)."""
    ns = ns_gc(ustar, gct)
    xk_d = jnp.asarray(gct.xk, ustar.dtype)
    om_d = jnp.asarray(gct.omega, ustar.dtype)
    return ns, _tab(xk_d, ns), _tab(om_d, ns)


def stress_gc(ang_gc, ustar, z0, z0min, halp, rnfac,
              gct: GCTables, params: pp.PhysParams):
    """Gravity-capillary wave-supported stress (stress_gc.F90:63-103).

    All inputs are (npts,).  The reference's scalar loop over wavenumbers
    NS..NWAV becomes a masked sum over the static gc axis.
    """
    dt = ustar.dtype
    xlama, xlamb, nlam = 0.25, 4.0, 4

    ns = ns_gc(ustar, gct)                                    # (npts,)
    xk = jnp.asarray(gct.xk, dt)[None, :]                     # (1, nwav)
    cm = jnp.asarray(gct.cm, dt)[None, :]
    om3gmkm = jnp.asarray(gct.om3gmkm, dt)[None, :]
    xkmsqrtvgoc2 = jnp.asarray(gct.xkmsqrtvgoc2, dt)[None, :]
    delkcc_omxkm3 = jnp.asarray(gct.delkcc_omxkm3, dt)[None, :]
    dns_omxkm3 = jnp.asarray(gct.delkcc_ns * gct.omxkm3, dt)
    c2osqrtvg_ns = _tab(jnp.asarray(gct.c2osqrtvg, dt), ns)

    tauwcg_min = (ustar * (z0min / z0))**2
    xlambda = 1.0 + xlama * jnp.tanh(xlamb * ustar**nlam)
    zabhrc = ang_gc * params.betamaxoxkappa2 * halp * c2osqrtvg_ns

    if params.llnormagam:
        const = (rnfac * params.bmaxokap * halp * c2osqrtvg_ns
                 / jnp.maximum(ustar, c.EPSUS))
    else:
        const = jnp.zeros_like(ustar)

    x = ustar[:, None] * cm
    # log(xk·z0) = log(xk) + log(z0): one (npts,) log instead of a
    # (npts, nwav) one — this sits inside TAUT_Z0's NITER=18 unrolled
    # fixed-point loop, the physics kernel's AIRSEA hot spot
    xlog = (jnp.log(xk) + jnp.log(z0)[:, None]
            + pp.XKAPPA / (x + params.zalp))
    zlog = jnp.minimum(xlog - jnp.log(xlambda)[:, None], 0.0)
    zlog2x = zlog * zlog * x
    gam_w = zlog2x * zlog2x * jnp.exp(xlog) * om3gmkm         # (npts, nwav)
    zn = const[:, None] * xkmsqrtvgoc2 * gam_w
    gamnorma = (1.0 + params.rn1_rn * zn) / (1.0 + zn)

    iwav = jnp.arange(gct.nwav, dtype=jnp.int32)[None, :]
    tail = jnp.sum(
        jnp.where(iwav > ns[:, None], gam_w * delkcc_omxkm3 * gamnorma, 0.0),
        axis=1)
    if kernelmode.PALLAS_SAFE:
        g_ns = jnp.sum(jnp.where(iwav == ns[:, None],
                                 gam_w * gamnorma, 0.0), axis=1)
    else:
        g_ns = jnp.take_along_axis(
            gam_w * gamnorma, ns[:, None], axis=1)[:, 0]
    tauwcg = g_ns * _tab(dns_omxkm3, ns) + tail
    return jnp.maximum(zabhrc * tauwcg, tauwcg_min)


def meansqs_lf(nfre_eff: int, fl1, wavnum, tb):
    """Mean square slope of the resolved spectrum below bin ``nfre_eff``
    (meansqs_lf.F90:38-56).  fl1: (nang, nfre, npts), wavnum: (nfre, npts)."""
    dt = fl1.dtype
    f1d = jnp.sum(fl1[:, :nfre_eff], axis=0)                  # (nfre_eff, npts)
    w = jnp.asarray(tb.dfim[:nfre_eff], dt)[:, None] * wavnum[:nfre_eff]**2
    return jnp.sum(w * f1d, axis=0)


def halphap(fl1, wavnum, coswdif, tb, params: pp.PhysParams):
    """Half the Phillips parameter (halphap.F90:54-99).

    fl1: (nang, nfre, npts), wavnum: (nfre, npts), coswdif: (nang, npts).
    """
    from ecwam_tpu.ops.physics import means as means_mod
    dt = fl1.dtype
    wd = 0.5 + 0.5 * jnp.sign(coswdif)                        # (nang, npts)
    flwd = fl1 * wd[:, None, :]
    xmss = meansqs_lf(tb.nfre, flwd, wavnum, tb)
    em, fm = means_mod.femean(flwd, tb)
    f1d_last = jnp.sum(flwd[:, -1, :], axis=0) * float(tb.delth)
    alphap_tail = float(c.ZPI4GM2 * tb.fr[-1]**5) * f1d_last  # reference literal
    ok = (em > 0.0) & (fm < tb.fr[tb.nfre - 3])
    alphap_spec = xmss / jnp.maximum(
        math.log(tb.fr[-1]) - jnp.log(jnp.maximum(fm, c.EPSMIN)), c.EPSMIN)
    alphap = jnp.where(ok & (alphap_spec <= params.alphapmax),
                       alphap_spec, alphap_tail)
    return 0.5 * jnp.minimum(alphap, jnp.asarray(params.alphapmax, dt))


def meansqs_gc(xkmss: float, halp, ustar, gct: GCTables):
    """Gravity-capillary mean-square-slope contribution
    (meansqs_gc.F90:56-78).  Returns (xmsscg, frgc)."""
    dt = ustar.dtype
    ne = min(max(
        int(round(math.log(xkmss * gct.xkm[0]) * XLOGKRATIOM1_GC)), 1),
        gct.nwav) - 1                                          # 0-based
    ns, xks, oms = omegagc(ustar, gct)
    frgc = oms / float(c.ZPI)
    xkm = jnp.asarray(gct.xkm, dt)
    dns_xkm = jnp.asarray(gct.delkcc_ns * gct.xkm, dt)
    dcc_xkm = jnp.asarray(gct.delkcc * gct.xkm, dt)[None, :]
    c2osqrtvg = jnp.asarray(gct.c2osqrtvg, dt)

    # where the spectral cut-off exceeds the msqs cut-off, integrate nothing
    over = xks > xkmss
    ns_eff = jnp.where(over, ne, ns)
    base = jnp.where(over, 0.0, _tab(dns_xkm, ns_eff))
    iwav = jnp.arange(gct.nwav, dtype=jnp.int32)[None, :]
    mask = (iwav > ns_eff[:, None]) & (iwav <= ne)
    xmss = base + jnp.sum(jnp.where(mask, dcc_xkm, 0.0), axis=1)
    return xmss * _tab(c2osqrtvg, ns_eff) * halp, frgc


def meansqs(xkmss: float, fl1, wavnum, ustar, coswdif, tb,
            params: pp.PhysParams, gct: GCTables | None = None):
    """Total mean square slope up to wavenumber ``xkmss`` (meansqs.F90:75-97)."""
    if gct is None:
        gct = gc_tables()
    halp = halphap(fl1, wavnum, coswdif, tb, params)
    xmss, frgc = meansqs_gc(xkmss, halp, ustar, gct)
    fcut = math.sqrt(c.G * xkmss) / c.ZPI
    nfre_mss = int(math.log(fcut / tb.fr[0]) / math.log(tb.fratio)) + 1
    nfre_eff = min(tb.nfre, nfre_mss)
    xmss = xmss + meansqs_lf(nfre_eff, fl1, wavnum, tb)
    xlogfs = math.log(tb.fr[nfre_eff - 1])
    tail = 2.0 * halp * jnp.maximum(
        jnp.log(jnp.minimum(frgc, fcut)) - xlogfs, 0.0)
    return xmss + tail
