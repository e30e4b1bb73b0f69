"""Spectral moment / mean-parameter computations.

JAX re-derivations of the reference mean routines, vectorized over the point
(lane) axis:
  - SEMEAN    total variance                    (/root/reference/src/ecwam/semean.F90:60-85)
  - FEMEAN    mean frequency (energy weighted)  (femean.F90:55-110)
  - FEMEANWS  windsea mean frequency            (femeanws.F90:52-100)
  - FKMEAN    variance + mean freqs f̄m1, f̄1 + mean wavenumbers (fkmean.F90:60-100)
  - SDEPTHLIM depth-limited variance clip       (sdepthlim.F90:32-46)

Array layout: ``fl1[nang, nfre, npts]``; per-frequency env fields
``(nfre, npts)``; outputs ``(npts,)``.  The high-frequency tail corrections
add ``const × Σ_k fl1[:, -1, :]`` exactly as the reference does (the
"TEMP2 of the last frequency" pattern).
"""

from __future__ import annotations

import jax.numpy as jnp

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import spectral as sp
from ecwam_tpu.ops.physics.kernelmode import sidx


def semean(fl1, tables, llepsmin: bool = True):
    """Total variance EM (semean.F90:60-85)."""
    dt = fl1.dtype
    dfim = jnp.asarray(tables.dfim, dt)[:, None]
    temp = jnp.sum(fl1, axis=0)                     # (nfre, npts)
    em = jnp.sum(dfim * temp, axis=0)
    delt25 = sp.WETAIL * tables.fr[-1] * tables.delth
    em = em + jnp.asarray(delt25, dt) * sidx(temp, -1, 0)
    if llepsmin:
        em = em + jnp.asarray(c.EPSMIN, dt)
    return em


def femean(fl1, tables):
    """Energy EM and mean frequency FM (femean.F90:55-110).

    Each spectral bin is floored at EPSMIN before summing, and the result
    FM is floored at fr[0] — both reference behaviors.
    """
    dt = fl1.dtype
    dfim = jnp.asarray(tables.dfim, dt)[:, None]
    dfimofr = jnp.asarray(tables.dfimofr, dt)[:, None]
    temp = jnp.sum(jnp.maximum(fl1, jnp.asarray(c.EPSMIN, dt)), axis=0)
    em = jnp.sum(dfim * temp, axis=0)
    fm = jnp.sum(dfimofr * temp, axis=0)
    delt25 = sp.WETAIL * tables.fr[-1] * tables.delth
    delt2 = sp.FRTAIL * tables.delth
    em = em + jnp.asarray(delt25, dt) * sidx(temp, -1, 0)
    fm = fm + jnp.asarray(delt2, dt) * sidx(temp, -1, 0)
    fm = jnp.maximum(em / fm, jnp.asarray(tables.fr[0], dt))
    return em, fm


def femeanws(fl1, xllws, tables):
    """Windsea energy and mean frequency (femeanws.F90:52-100).

    ``xllws`` is the 0/1 windsea mask produced by SINPUT.
    """
    dt = fl1.dtype
    dfim = jnp.asarray(tables.dfim, dt)[:, None]
    dfimofr = jnp.asarray(tables.dfimofr, dt)[:, None]
    temp = jnp.sum(xllws * fl1, axis=0)
    em = jnp.sum(dfim * temp, axis=0) + jnp.asarray(c.EPSMIN, dt)
    fm = jnp.sum(dfimofr * temp, axis=0) + jnp.asarray(c.EPSMIN, dt)
    delt25 = sp.WETAIL * tables.fr[-1] * tables.delth
    delt2 = sp.FRTAIL * tables.delth
    em = em + jnp.asarray(delt25, dt) * sidx(temp, -1, 0)
    fm = fm + jnp.asarray(delt2, dt) * sidx(temp, -1, 0)
    fm = em / fm
    return em, fm


def fkmean(fl1, wavnum, tables):
    """Variance, mean frequencies and mean wavenumbers (fkmean.F90:60-100).

    Returns (em, fm1, f1, ak, xk):
      em   total variance
      fm1  mean frequency based on 1/f weighting   em/∫f⁻¹
      f1   mean frequency based on f weighting     ∫f/em
      ak   mean wavenumber from 1/√k weighting     (em/∫k^-½)²
      xk   mean wavenumber from √k weighting       (∫k^½/em)²
    """
    dt = fl1.dtype
    eps = jnp.asarray(c.EPSMIN, dt)
    dfim = jnp.asarray(tables.dfim, dt)[:, None]
    dfimofr = jnp.asarray(tables.dfimofr, dt)[:, None]
    dfimfr = jnp.asarray(tables.dfimfr, dt)[:, None]

    sqrtk = jnp.sqrt(wavnum)                        # (nfre, npts)
    tempa = dfim / sqrtk
    tempx = sqrtk * dfim
    temp2 = jnp.sum(fl1, axis=0)                    # (nfre, npts)

    em = eps + jnp.sum(dfim * temp2, axis=0)
    fm1 = eps + jnp.sum(dfimofr * temp2, axis=0)
    f1 = eps + jnp.sum(dfimfr * temp2, axis=0)
    ak = eps + jnp.sum(tempa * temp2, axis=0)
    xk = eps + jnp.sum(tempx * temp2, axis=0)

    delt25 = jnp.asarray(sp.WETAIL * tables.fr[-1] * tables.delth, dt)
    coefm1 = jnp.asarray(sp.FRTAIL * tables.delth, dt)
    coef1 = jnp.asarray(sp.WP1TAIL * tables.delth * tables.fr[-1] ** 2, dt)
    coefa = coefm1 * jnp.asarray(jnp.sqrt(c.G) / c.ZPI, dt)
    coefx = coef1 * jnp.asarray(c.ZPI / jnp.sqrt(c.G), dt)

    t_last = sidx(temp2, -1, 0)
    em = em + delt25 * t_last
    fm1 = em / (fm1 + coefm1 * t_last)
    f1 = (f1 + coef1 * t_last) / em
    ak = (em / (ak + coefa * t_last)) ** 2
    xk = ((xk + coefx * t_last) / em) ** 2
    return em, fm1, f1, ak, xk


def sdepthlim(fl1, emaxdpt, tables):
    """Clip total variance to the depth-limited maximum (sdepthlim.F90:32-46)."""
    dt = fl1.dtype
    em = semean(fl1, tables, llepsmin=True)
    scale = jnp.minimum(emaxdpt / em, jnp.asarray(1.0, dt))
    return jnp.maximum(fl1 * scale[None, None, :], jnp.asarray(c.EPSMIN, dt))
