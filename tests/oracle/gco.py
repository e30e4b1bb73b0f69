"""Oracle: gravity-capillary subsystem (INITGC / NS_GC / STRESS_GC).

Transcribes initgc.F90:30-90 (+gc_dispersion.h inline functions),
ns_gc.F90:20-35, omegagc.F90:20-40 and stress_gc.F90:40-95.
"""

from __future__ import annotations

import math

import numpy as np

from . import reftables as rt

SURFT = 0.0000717           # yowpcons.F90:47
KRATIO_GC = 1.2
XKS_GC = 0.006
XKL_GC = 20000.0
XKAPPA = 0.40
EPSUS = 1.0e-6


def fomeg(xk):
    return math.sqrt(rt.G * xk + SURFT * xk**3)


def fvg(xk):
    return 0.5 / fomeg(xk) * (rt.G + 3.0 * SURFT * xk**2)


def fc(xk):
    return fomeg(xk) / xk


def initgc():
    """initgc.F90:30-90 → dict of tables (1-based concepts, 0-based arrays)."""
    nwav = int(round(math.log(XKL_GC / XKS_GC) / math.log(KRATIO_GC)))
    xk = np.array([XKS_GC * KRATIO_GC**i for i in range(nwav)])
    xkm = 1.0 / xk
    omega = np.array([fomeg(k) for k in xk])
    omxkm3 = omega * xkm**3
    vg = np.array([fvg(k) for k in xk])
    c_ = np.array([fc(k) for k in xk])
    cm = 1.0 / c_
    c2osqrtvg = c_**2 / np.sqrt(vg)
    xkmsqrtvgoc2 = xkm / c2osqrtvg
    om3gmkm = omega**3 / (rt.G * xk)
    delkcc = np.zeros(nwav)
    delkcc_ns = np.zeros(nwav)
    delkcc[0] = 0.5 * (xk[1] - xk[0]) / c2osqrtvg[0]
    delkcc_ns[0] = delkcc[0]
    for i in range(1, nwav - 1):
        delkcc[i] = 0.5 * (xk[i + 1] - xk[i - 1]) / c2osqrtvg[i]
        delkcc_ns[i] = 0.5 * (xk[i + 1] - xk[i]) / c2osqrtvg[i]
    delkcc[-1] = 0.5 * (xk[-1] - xk[-2]) / c2osqrtvg[-1]
    delkcc_ns[-1] = delkcc[-1]
    delkcc_omxkm3 = delkcc * omxkm3
    return dict(nwav=nwav, xk=xk, xkm=xkm, omega=omega, omxkm3=omxkm3,
                vg=vg, c=c_, cm=cm, c2osqrtvg=c2osqrtvg,
                xkmsqrtvgoc2=xkmsqrtvgoc2, om3gmkm=om3gmkm,
                delkcc=delkcc, delkcc_ns=delkcc_ns,
                delkcc_omxkm3=delkcc_omxkm3)


def ns_gc(ustar, t):
    """ns_gc.F90:20-35 → 1-based index."""
    sqrtgosurft = math.sqrt(rt.G / SURFT)
    xks = sqrtgosurft / (1.48 + 2.05 * ustar)
    xlogkratiom1 = 1.0 / math.log(KRATIO_GC)
    return min(int(math.log(max(xks * t["xkm"][0], 1.0))
                   * xlogkratiom1) + 1, t["nwav"] - 1)


def omegagc(ust, t):
    """omegagc.F90:20-40 → (ns 1-based, xks, oms) arrays."""
    ns = np.array([ns_gc(u, t) for u in ust])
    return ns, t["xk"][ns - 1], t["omega"][ns - 1]


def stress_gc(ang_gc, ustar, z0, z0min, halp, rnfac, t, p):
    """stress_gc.F90:40-95 (scalar)."""
    xlama, xlamb, nlam = 0.25, 4.0, 4
    ns = ns_gc(ustar, t)
    i0 = ns - 1                         # 0-based
    tauwcg_min = (ustar * (z0min / z0)) ** 2
    xlambda = 1.0 + xlama * math.tanh(xlamb * ustar**nlam)
    zabhrc = ang_gc * p.betamaxoxkappa2 * halp * t["c2osqrtvg"][i0]
    if p.llnormagam:
        const = p.bmaxokap * halp * t["c2osqrtvg"][i0] * rnfac \
            / max(ustar, EPSUS)
    else:
        const = 0.0

    def gam_w(i):
        x = ustar * t["cm"][i]
        xlog = math.log(t["xk"][i] * z0) + XKAPPA / (x + p.zalp)
        zlog = min(xlog - math.log(xlambda), 0.0)
        zlog2x = zlog * zlog * x
        return zlog2x * zlog2x * math.exp(xlog) * t["om3gmkm"][i]

    gw = gam_w(i0)
    zn = const * t["xkmsqrtvgoc2"][i0] * gw
    gamnorma = (1.0 + p.rn1_rn * zn) / (1.0 + zn)
    tauwcg = gw * t["delkcc_ns"][i0] * t["omxkm3"][i0] * gamnorma
    for i in range(i0 + 1, t["nwav"]):
        gw = gam_w(i)
        zn = const * t["xkmsqrtvgoc2"][i] * gw
        gamnorma = (1.0 + p.rn1_rn * zn) / (1.0 + zn)
        tauwcg += gw * t["delkcc_omxkm3"][i] * gamnorma
    return max(zabhrc * tauwcg, tauwcg_min)
