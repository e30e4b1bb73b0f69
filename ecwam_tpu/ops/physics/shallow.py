"""Shallow-water source terms: bottom friction and depth-induced breaking.

JAX re-derivations of:
  - SBOTTOM  JONSWAP bottom friction  (/root/reference/src/ecwam/sbottom.F90:41-60)
  - SDIWBK   Battjes-Janssen depth-induced breaking (sdiwbk.F90:44-75)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ecwam_tpu.core import constants as c
from ecwam_tpu.ops.physics import kernelmode
from ecwam_tpu.core.dispersion import BATHYMAX

DEPTHTRS = 50.0          # breaking only where depth < 50 m (sdiwbk.F90)


def _add_lowfre(arr, add):
    """``arr[:, :m] += add`` without a scatter: pad+add (XLA fuses it;
    Mosaic has no scatter-add, and the m == nfre case would otherwise
    lower to a degenerate empty-index scatter)."""
    m = add.shape[1]
    nfre = arr.shape[1]
    if m == nfre:
        return arr + add
    return jnp.concatenate([arr[:, :m] + add, arr[:, m:]], axis=1)


def sbottom(fl1, fld, sl, wavnum, depth, nfre_red: int):
    """Bottom friction SB = −2·0.038/g · k/sinh(2kd) · F (sbottom.F90:41-60).

    Applied to the first ``nfre_red`` frequencies only.
    """
    const = -2.0 * 0.038 * c.GM1
    arg = jnp.minimum(2.0 * depth[None, :] * wavnum[:nfre_red], 50.0)
    sbo = jnp.where(depth[None, :] < BATHYMAX,
                    const * wavnum[:nfre_red] / kernelmode.sinh(arg), 0.0)
    sl = _add_lowfre(sl, sbo[None] * fl1[:, :nfre_red])
    fld = _add_lowfre(fld, jnp.broadcast_to(
        sbo[None], fld[:, :nfre_red].shape))
    return fld, sl


def sdiwbk(fl1, fld, sl, depth, emaxdpt, emean, f1mean, nfre_red: int,
           *, lbiwbk: bool = True):
    """Depth-induced wave breaking (sdiwbk.F90:44-75).

    Solves Q = exp(-alph·(1-Q)) for the breaking probability by 15 Newton
    steps (fixed-trip; converged values are fixed points).
    """
    if not lbiwbk:
        return fld, sl
    alph = 2.0 * emaxdpt / emean
    arg = jnp.minimum(alph, 50.0)

    # Newton iteration with the reference's early exit (sdiwbk.F90:64-71):
    # once |q−q_old|/q_old < 1e-5 the value is frozen — the reference uses
    # the just-updated q, so convergence order matters at the 1e-5 level.
    # ``done`` is a 0/1 float, not bool: Mosaic cannot legalize loops
    # with i1 vector carries (scf.for + vector<i1> yield).
    def newton(_, carry):
        q_old, q_out, done = carry
        expq = jnp.exp(-arg * (1.0 - q_old))
        q = q_old - (expq - q_old) / (arg * expq - 1.0)
        rel_err = jnp.abs(q - q_old) / q_old
        q_out = jnp.where(done > 0.5, q_out, q)
        done_new = jnp.maximum(done,
                               (rel_err < 1.0e-5).astype(done.dtype))
        q_old = jnp.where(done_new > 0.5, q_old, q)
        return q_old, q_out, done_new

    q0 = jnp.exp(-arg)
    _, q, _ = jax.lax.fori_loop(
        0, 15, newton, (q0, q0, jnp.zeros_like(q0)))
    q = jnp.minimum(q, 1.0)
    sds = 2.0 * alph * q * f1mean                     # COEF_B_J = 2
    active = depth < DEPTHTRS
    sds = jnp.where(active, sds, 0.0)
    sl = _add_lowfre(sl, -sds[None, None, :] * fl1[:, :nfre_red])
    fld = _add_lowfre(fld, jnp.broadcast_to(
        -sds[None, None, :], fld[:, :nfre_red].shape))
    return fld, sl
