"""Diagnostic tail imposition and sea-ice masking.

JAX re-derivations of:
  - IMPHFTAIL  impose k⁻³/(k²·cg)-shaped tail above the cut MIJ
               (/root/reference/src/ecwam/imphftail.F90:40-55)
  - SETICE     reset spectra to directional noise under the ice mask
               (setice.F90:38-60)

Layout: fl1 (nang, nfre, npts), mij 0-based (npts,).
"""

from __future__ import annotations

import jax.numpy as jnp

from ecwam_tpu.core import constants as c
from ecwam_tpu.ops.physics import kernelmode

FLMIN = 0.00001          # minimum spectral energy (yowice.F90:22)
CITHRSH = 0.3            # ice mask threshold, LMASKICE=T (userin.F90:958)


def imphftail(fl1, mij, flm, wavnum, xk2cg):
    """Impose the diagnostic high-frequency tail (imphftail.F90:40-55).

    For m > mij:  F(k,m) = F(k,mij) · [1/(xk2cg·k)]_m / [1/(xk2cg·k)]_mij,
    floored at flm.
    """
    nang, nfre, npts = fl1.shape
    tailinv = 1.0 / (xk2cg * wavnum)                  # (nfre, npts)
    if kernelmode.PALLAS_SAFE:
        t_mij = kernelmode.take_freq_at(tailinv, mij, axis=0)
        fl1_mij = kernelmode.take_freq_at(fl1, mij, axis=1)
    else:
        t_mij = jnp.take_along_axis(
            tailinv, mij[None, :], axis=0)[0]         # (npts,)
        fl1_mij = jnp.take_along_axis(
            fl1, mij[None, None, :], axis=1)[:, 0, :]  # (nang, npts)
    ratio = tailinv / t_mij[None, :]
    tail = jnp.maximum(ratio[None, :, :] * fl1_mij[:, None, :],
                       flm[:, None, :])
    m_idx = jnp.arange(nfre)[None, :, None]
    return jnp.where(m_idx > mij[None, None, :], tail, fl1)


def setice(fl1, cicover, coswdif, *, cithrsh: float = CITHRSH):
    """Reset ice-covered points to directional noise (setice.F90:38-60)."""
    dt = fl1.dtype
    iced = cicover > cithrsh
    cireduc = jnp.where(iced, jnp.maximum(c.EPSMIN, 1.0 - cicover), 0.0)
    icefree = jnp.where(iced, 0.0, 1.0).astype(dt)
    temp = cireduc * FLMIN
    noise = temp[None, :] * jnp.maximum(0.0, coswdif) ** 2   # (nang, npts)
    return fl1 * icefree[None, None, :] + noise[:, None, :]
