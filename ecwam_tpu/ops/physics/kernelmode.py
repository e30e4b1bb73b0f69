"""Trace-mode switch for running the physics chain inside a Pallas kernel.

The IMPLSCH chain (ops/physics/*) is written in plain jnp over the
(nang, nfre, npts) layout.  Traced under XLA, every op may use the full
gather/scan surface; traced inside a Pallas TPU kernel (Mosaic), a few
ops are not lowerable:

  * per-point dynamic gathers into small tables (swell-friction table,
    fr5[mij]) — replaced by one-hot compare/reduce forms;
  * ``take_along_axis`` over the frequency axis with a per-point index
    (tail imposition at MIJ) — replaced by masked reductions;
  * ``lax.scan`` with stacked outputs (sinput_ard) — replaced by an
    unrolled Python loop (nfre is a compile-time constant);
  * batched ``einsum`` and static-index ``jnp.take`` (snonlin) — replaced
    by the per-MC static scatter loop (the Fortran structure,
    snonlin.F90:168-460), which is also the VMEM-lean formulation.

``PALLAS_SAFE`` is flipped at *trace time* by the kernel body
(ops/physics/implsch_pallas.py) so the same oracle-pinned source files
serve both paths; the one-hot forms are algebraically identical to the
gathers (pinned by tests/test_implsch_pallas.py).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

PALLAS_SAFE = False


@contextlib.contextmanager
def pallas_safe():
    """Trace-time context: physics modules pick Mosaic-lowerable forms."""
    global PALLAS_SAFE
    prev = PALLAS_SAFE
    PALLAS_SAFE = True
    try:
        yield
    finally:
        PALLAS_SAFE = prev


def arctan2(y, x):
    """``jnp.arctan2`` with a Mosaic-lowerable fallback.

    Mosaic has no atan/atan2 primitive; inside kernels we use the Cephes
    single-precision atanf polynomial (|err| ≲ 1e-7, plenty for wave
    direction angles) with the standard quadrant corrections.
    """
    if not PALLAS_SAFE:
        return jnp.arctan2(y, x)
    dt = jnp.result_type(y, x)
    pi = jnp.asarray(np_pi(dt))
    safe_x = jnp.where(x == 0.0, 1.0, x)
    t = _atan(y / safe_x)
    ang = jnp.where(x > 0.0, t,
                    jnp.where(y >= 0.0, t + pi, t - pi))
    # x == 0 column: ±π/2 (0 at the origin, matching atan2(0, 0) = 0)
    ang = jnp.where(x == 0.0,
                    jnp.where(y > 0.0, 0.5 * pi,
                              jnp.where(y < 0.0, -0.5 * pi, 0.0)),
                    ang)
    return ang.astype(dt)


def np_pi(dt):
    import math
    return math.pi


def sinh(x):
    """``jnp.sinh`` with an exp-based Mosaic fallback.  Arguments at the
    call sites are O(1e-2..50) (always clamped ≤ 50), where the naive
    form's cancellation error is ≤ ~1e-5 relative in f32."""
    if not PALLAS_SAFE:
        return jnp.sinh(x)
    e = jnp.exp(x)
    return 0.5 * (e - 1.0 / e)


def cosh(x):
    if not PALLAS_SAFE:
        return jnp.cosh(x)
    e = jnp.exp(x)
    return 0.5 * (e + 1.0 / e)


def _atan(x):
    """Cephes atanf: range reduction + degree-4 polynomial in x²."""
    import math
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    tan3pio8 = 2.414213562373095
    tanpio8 = 0.4142135623730950
    hi = ax > tan3pio8
    mid = (~hi) & (ax > tanpio8)
    safe_hi = jnp.where(ax == 0.0, 1.0, ax)
    xr = jnp.where(hi, -1.0 / safe_hi,
                   jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    y0 = jnp.where(hi, 0.5 * math.pi,
                   jnp.where(mid, 0.25 * math.pi, 0.0))
    z = xr * xr
    poly = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1) * z * xr + xr
    return sign * (y0 + poly)


def sidx(x, i: int, axis: int = 0):
    """Static scalar index ``x[..., i, ...]`` via ``lax.slice`` + squeeze.

    Plain ``x[i]`` lowers to ``dynamic_slice`` (even for a constant
    index), which Mosaic does not implement as a value op; a static
    slice + reshape lowers everywhere.  Used unconditionally — XLA
    treats both forms identically.
    """
    i = i % x.shape[axis]
    return jnp.squeeze(jax.lax.slice_in_dim(x, i, i + 1, axis=axis),
                       axis=axis)


def take_table(table, ind):
    """``table[ind]`` for a (T,) table and (npts,) int index — one-hot
    compare/reduce (Mosaic has no per-lane dynamic gather)."""
    table = jnp.asarray(table)
    t = table.shape[0]
    it = jax.lax.broadcasted_iota(jnp.int32, (t,) + ind.shape, 0)
    m = (it == ind[None].astype(jnp.int32)).astype(table.dtype)
    return jnp.sum(m * table.reshape((t,) + (1,) * ind.ndim), axis=0)


def take_freq_at(arr, mij, axis):
    """Select the per-point frequency slice at index ``mij`` (npts,) —
    the ``take_along_axis(arr, mij[..., None], axis)`` equivalent — via a
    masked reduction.  The point axis must be the last axis of ``arr``."""
    it = jax.lax.broadcasted_iota(jnp.int32, arr.shape, axis)
    sel = mij.reshape((1,) * (arr.ndim - 1) + mij.shape).astype(jnp.int32)
    return jnp.sum(jnp.where(it == sel, arr, 0.0), axis=axis)
