"""Surface Stokes drift and mean-square strain in sea ice.

Equivalents of STOKESDRIFT (Kenyon 1969 integral + unresolved-tail term,
/root/reference/src/ecwam/stokesdrift.F90:95-145), CIMSSTRN (sea-ice
flexural strain, cimsstrn.F90:85-125) with the ice-modified dispersion
AKI_ICE (aki_ice.F90), and the STOKESTRN wrapper (stokestrn.F90:60-90).

Layout: fl1 (nang, nfre, npts); per-frequency env fields (nfre, npts).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ecwam_tpu.core import constants as c
from ecwam_tpu.ops.physics import kernelmode
from ecwam_tpu.ops.physics.kernelmode import sidx
from ecwam_tpu.ops.physics.tail_ice import FLMIN

STMAX = 1.5                  # Stokes magnitude cap (stokesdrift.F90:78)

# sea-ice material constants (aki_ice.F90)
YMICE = 5.5e9                # Young modulus of sea ice
RMUICE = 0.3                 # Poisson ratio
RHOI = 922.5                 # sea-ice density
AKI_MAX = 20.0
_NEWTON_ITERS = 25           # fixed-trip replacement of the while loop


def stokesdrift(fl1, stokfac, wswave, wdwave, cicover, tb, *,
                licerun: bool = True, lwamrsetci: bool = True,
                cithrsh: float = 0.3):
    """Surface Stokes drift vector (stokesdrift.F90:95-145).

    ``stokfac`` is the precomputed per-(freq, point) depth factor; the
    integral uses Simpson weights over the first NFRE_ODD frequencies plus
    an analytic f⁻⁵-tail contribution.
    """
    dt = fl1.dtype
    nfre_odd = tb.nfre - 1 + tb.nfre % 2
    const = 2.0 * tb.delth * c.ZPI**3 / c.G * tb.fr[nfre_odd - 1] ** 4

    stfac = (stokfac[:nfre_odd] *
             jnp.asarray(tb.dfim_sim[:nfre_odd], dt)[:, None])
    # pre-shaped in numpy: a (nang,)->(nang,1,1) reshape of a
    # traced value is the one layout cast Mosaic rejects
    sinth = jnp.asarray(np.asarray(tb.sinth)[:, None, None], dt)
    costh = jnp.asarray(np.asarray(tb.costh)[:, None, None], dt)
    fac3 = stfac[None, :, :] * fl1[:, :nfre_odd]
    ustokes = jnp.sum(fac3 * sinth, axis=(0, 1))
    vstokes = jnp.sum(fac3 * costh, axis=(0, 1))

    # unresolved-tail contribution (stokesdrift.F90:115-123)
    tail = sidx(fl1, nfre_odd - 1, 1)                       # (nang, npts)
    ustokes = ustokes + const * jnp.sum(
        jnp.asarray(tb.sinth, dt)[:, None] * tail, axis=0)
    vstokes = vstokes + const * jnp.sum(
        jnp.asarray(tb.costh, dt)[:, None] * tail, axis=0)

    if licerun and lwamrsetci:
        iced = cicover > cithrsh
        fac = 0.016 * wswave * (1.0 - cicover)
        ustokes = jnp.where(iced, fac * jnp.sin(wdwave), ustokes)
        vstokes = jnp.where(iced, fac * jnp.cos(wdwave), vstokes)

    return (jnp.clip(ustokes, -STMAX, STMAX),
            jnp.clip(vstokes, -STMAX, STMAX))


def aki_ice(xk, depth, cith):
    """Ice-modified wavenumber: Newton solve of the flexural dispersion
    ω² = (F·k⁵ + g·k) / (ρi/ρw·h·k + coth(kd)) (aki_ice.F90).

    Fixed-trip ``fori_loop`` with the reference's clipping; points with
    zero ice thickness return ``xk`` unchanged.  Shapes broadcast:
    xk (nfre, npts), depth/cith (npts,).
    """
    dt = xk.dtype
    ficstf = (YMICE * cith**3 / (12.0 * (1.0 - RMUICE**2))) / c.ROWATER
    rdh = (RHOI / c.ROWATER) * cith
    om2 = c.G * xk * jnp.tanh(xk * depth[None, :])
    aki0 = jnp.minimum(
        xk, (om2 / jnp.maximum(ficstf, 1.0)) ** jnp.asarray(0.2, dt))

    def body(_, aki):
        akid = jnp.minimum(depth[None, :] * aki, 50.0)
        tanh_ = jnp.tanh(akid)
        sinh2 = kernelmode.sinh(akid) ** 2
        f = ficstf * aki**5 + c.G * aki - om2 * (rdh * aki + 1.0 / tanh_)
        fp = 5.0 * ficstf * aki**4 + c.G - om2 * (rdh - depth[None, :] / sinh2)
        nxt = aki - f / fp
        return jnp.where(nxt <= 0.0, AKI_MAX, jnp.minimum(nxt, AKI_MAX))

    aki = jax.lax.fori_loop(0, _NEWTON_ITERS, body, aki0)
    return jnp.where(cith[None, :] <= 0.0, xk, aki)


def cimsstrn(fl1, wavnum, depth, cithick, tb):
    """Mean-square strain in sea ice (cimsstrn.F90:85-125)."""
    dt = fl1.dtype
    f1lim = FLMIN / tb.delth
    xki = aki_ice(wavnum, depth, cithick)
    e = 0.5 * cithick[None, :] * xki**3 / wavnum        # (nfre, npts)
    sume = jnp.sum(fl1, axis=0)                         # (nfre, npts)
    contrib = jnp.where(sume > f1lim,
                        e**2 * sume * jnp.asarray(tb.dfim, dt)[:, None],
                        0.0)
    return jnp.sum(contrib, axis=0)


def stokestrn(fl1, wavnum, stokfac, depth, wswave, wdwave, cicover,
              cithick, tb, *, licerun: bool = True,
              lwamrsetci: bool = True, cithrsh: float = 0.3,
              lstrn: bool = False):
    """STOKESTRN wrapper: Stokes drift + optional ice strain
    (stokestrn.F90:60-90)."""
    ustokes, vstokes = stokesdrift(
        fl1, stokfac, wswave, wdwave, cicover, tb,
        licerun=licerun, lwamrsetci=lwamrsetci, cithrsh=cithrsh)
    out = dict(ustokes=ustokes, vstokes=vstokes)
    if lstrn:
        out["strnms"] = cimsstrn(fl1, wavnum, depth, cithick, tb)
    return out
