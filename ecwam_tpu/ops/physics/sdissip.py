"""Whitecapping dissipation S_ds.

JAX re-derivations of:
  - SDISSIP_ARD  saturation-based dissipation, Ardhuin et al. (2010)
                 (/root/reference/src/ecwam/sdissip_ard.F90:70-256)
  - SDISSIP_JAN  WAM cycle-4 mean-steepness dissipation (Janssen)
                 (sdissip_jan.F90:50-120)
  - dispatch     (sdissip.F90:76-85)

Notes on reference dead code: the cumulative-breaking term is compiled out in
the reference by the PARAMETER SSDSC3=0.0 (yowphys.F90:140) and the
wave-turbulence term by SSDSC5=0.0 (setwavphys); we implement the SSDSC5 term
(it is a runtime tunable here) and omit the SSDSC3 block, asserting it is 0.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import physparams as pp


def sdissip_ard(fl1, fld, sl, wavnum, cgroup, xk2cg, ufric, coswdif, raorw,
                tb, params: pp.PhysParams, sat_indices, sat_weights):
    """Saturation-spectrum dissipation (sdissip_ard.F90:70-256).

    ``sat_indices``/``sat_weights`` come from
    :func:`ecwam_tpu.core.physparams.saturation_weights` (init_sdiss_ardh).
    """
    assert pp.SSDSC3 == 0.0, "cumulative breaking term disabled in reference"
    dt = fl1.dtype
    nang, nfre, npts = fl1.shape
    zpifr = jnp.asarray(tb.zpifr, dt)[:, None]            # (nfre, 1)
    tpiinv = 1.0 / c.ZPI
    tmp03 = 1.0 / (pp.SDSBR * pp.MICHE)

    facsat = wavnum * tpiinv * xk2cg                      # (nfre, npts)

    # directional half-integral saturation spectrum B(k,θ)
    # (sdissip_ard.F90:100-115): BTH[k] = Σ_k2 w[k,k2]·F[ind[k,k2]].
    # Collapsed into a dense (nang × nang) direction-coupling matrix so the
    # whole integral is ONE small matmul on the MXU — the naive per-
    # neighbour gather materializes a (nang, 2·NSDSNTH+1, nfre, npts)
    # intermediate (~33 GB at O320) and OOMs a 16 GB chip.
    nw = sat_indices.shape[1]
    wmat = np.zeros((nang, nang))
    for k in range(nang):
        for j in range(nw):
            wmat[k, sat_indices[k, j]] += sat_weights[k, j]
    bth = jnp.einsum("kj,jmp->kmp", jnp.asarray(wmat, dt),
                     fl1) * facsat[None, :, :]
    bth0 = jnp.max(bth, axis=0)                           # (nfre, npts)

    ssdsc2_sig = pp.SSDSC2 * zpifr                        # (nfre, 1)
    zcoef = ssdsc2_sig * pp.SSDSC6
    zcoefm1 = ssdsc2_sig * (1.0 - pp.SSDSC6)
    d = (zcoef[None] * jnp.maximum(0.0, bth0[None] * tmp03 - pp.SSDSC4) ** pp.IPSAT
         + zcoefm1[None] * jnp.maximum(0.0, bth * tmp03 - pp.SSDSC4) ** pp.IPSAT)

    if params.ssdsc5 != 0.0:
        facturb = (2.0 * params.ssdsc5 / c.G) * raorw * ufric**2
        facwtrb = zpifr * wavnum * facturb[None, :]
        d = d - facwtrb[None, :, :] * coswdif[:, None, :]

    sl = sl + d * fl1
    fld = fld + d
    return fld, sl


def sdissip_jan(fl1, fld, sl, wavnum, emean, f1mean, xkmean,
                tb, params: pp.PhysParams):
    """WAM cycle-4 dissipation (sdissip_jan.F90:50-120)."""
    dt = fl1.dtype
    delta_sdism1 = 1.0 - params.delta_sdis
    conss = params.cdis * c.ZPI
    sds = conss * f1mean * emean**2 * xkmean**4           # (npts,)
    x = wavnum / xkmean[None, :]                          # (nfre, npts)
    cvis = pp.RNU * params.cdisvis
    temp1 = (sds[None, :] * x * (delta_sdism1 + params.delta_sdis * x)
             + cvis * wavnum**2)
    fld = fld + temp1[None, :, :]
    sl = sl + temp1[None, :, :] * fl1
    return fld, sl
