"""Fused IMPLSCH physics as a single Pallas TPU kernel.

One kernel invocation advances the full source-term chain (the reference
IMPLSCH, /root/reference/src/ecwam/implsch.F90:225-462) for a *tile* of
grid points with the whole NANG×NFRE spectrum resident in VMEM:

    depth-limit → means → 2×SINFLX (AIRSEA Newton, SINPUT, FRCUTINDEX,
    STRESSO tail integral) → SDISSIP → SNONLIN (per-MC static scatter)
    → SDIWBK/SBOTTOM (+ice) → semi-implicit update + limiter →
    means → IMPHFTAIL → SETICE (→ WNFLUXES/STOKESTRN in full mode)

The plain-XLA formulation (ops/physics/implsch.py) runs the same chain
as ~30 separate HBM spectrum passes (BENCH_r03: 1.92 s at O512, 0.26 of
stream bandwidth); here the only HBM traffic is one spectrum read + one
write per physics step plus small per-point rows — the kernel becomes
VPU-compute-bound, the speed-of-light regime for this op (BASELINE.md
north star; SURVEY §5.7 "spectrum-on-chip" design).

The kernel body *reuses the oracle-pinned physics modules*: it traces
``ops.physics.implsch.implsch`` under :mod:`kernelmode`'s PALLAS_SAFE
flag, which swaps the few non-Mosaic-lowerable ops (dynamic table
gathers, scan, batched einsum) for algebraically identical static forms.

Layouts:
  * compact entry: fl1 (nang, nfre, n) — points in lanes, the layout the
    physics modules already use; per-point forcing/stress packed into a
    (NSI, n) row matrix, per-frequency env into a (5·nfre, n) matrix.
  * SRL entry (the bench/fast path): the segmented-row-layout spectrum
    (nsrl, LP) used by the fused propagation kernel; rows are points,
    k-major lanes.  The kernel transposes each (C, LP) tile to the
    compact tile layout in VMEM (two lane↔sublane transposes per tile —
    negligible next to the chain's arithmetic), so advection and physics
    chain without any HBM layout round trip (the round-3 architecture
    gap: VERDICT r3 "what's missing" #1/#2).

Callers jit the surrounding step; these entry points only construct the
``pallas_call`` (PhysicsConfig holds numpy tables and is closed over,
never passed as a jit argument).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecwam_tpu.ops.physics import implsch as impl
from ecwam_tpu.ops.physics import kernelmode

# Mosaic scoped-VMEM budget for the kernel.  The default 16 MB limit is
# an XLA scheduling default, not the physical VMEM size; the chain at the
# operational 36-direction spectrum needs ~20 MB of peak live tile state.
VMEM_LIMIT = 100 * 1024 * 1024

# packed per-point scalar input rows (forcing + env + stress state)
SCAL_IN = ("wswave", "wdwave", "aird", "wstar", "cicover", "cithick",
           "depth", "emaxdpt",
           "ufric", "tauw", "tauwdir", "z0m", "z0b", "chrnck")
N_FRC = 6                     # leading forcing rows
STRESS_KEYS = ("ufric", "tauw", "tauwdir", "z0m", "z0b", "chrnck")

# per-frequency env fields → row-blocks of the (3·nfre, n) matrix.
# Only what the chain READS is stored resident (the O512/O1280 HBM
# margin): cgroup is unused by the default chain (sea-ice terms derive
# it in-kernel) and stokfac is derived in-kernel for the full mode
ENV_FIELDS = ("wavnum", "cinv", "xk2cg")

# minimal-mode outputs: exactly the state that feeds the next step
SCAL_OUT_MIN = STRESS_KEYS
# full-mode diagnostics (io/products.py consumers; implsch state keys).
# mij is carried as f32 in the packed row (cast back outside).
SCAL_OUT_FULL = STRESS_KEYS + (
    "mij", "phiwa", "emean", "fmean", "f1mean", "akmean", "xkmean",
    "emeanws", "fmeanws", "wsemean", "wsfmean",
    "tauxd", "tauyd", "tauocxd", "tauocyd", "tauoc",
    "phiocd", "phieps", "phiaw", "em_oc", "f1_oc",
    "ustokes", "vstokes", "strnms")


def pack_scal(frc: dict, stress: dict, env: dict, n: int, dtype):
    """Pack the per-point scalar rows → (NSI, n)."""
    rows = []
    zero = None
    for k in SCAL_IN:
        if k in frc:
            v = frc[k]
        elif k in stress:
            v = stress[k]
        elif k in env:
            v = env[k]
        else:
            if zero is None:
                zero = jnp.zeros((n,), dtype)
            v = zero
        rows.append(jnp.asarray(v, dtype).reshape(1, n))
    return jnp.concatenate(rows, axis=0)


def pack_env(env: dict, nfre: int, dtype):
    """Per-frequency env fields → (5·nfre, n)."""
    return jnp.concatenate(
        [jnp.asarray(env[k], dtype) for k in ENV_FIELDS], axis=0)


def unpack_scal_out(so, *, full: bool):
    """(NSO, n) packed output rows → state dict (mij back to int32)."""
    keys = SCAL_OUT_FULL if full else SCAL_OUT_MIN
    out = {k: so[i] for i, k in enumerate(keys)}
    if "mij" in out:
        out["mij"] = out["mij"].astype(jnp.int32)
    return out


def _tile_implsch(cfg, fl1, scal, env2d, *, full: bool):
    """Run the IMPLSCH chain on one (nang, nfre, C) tile.

    Returns (fl1_new, scal_out (NSO, C), xllws or None)."""
    nfre = cfg.tables.nfre
    env = {}
    for i, k in enumerate(ENV_FIELDS):
        env[k] = env2d[i * nfre:(i + 1) * nfre, :]
    si = {k: scal[i, :] for i, k in enumerate(SCAL_IN)}
    env["depth"] = si["depth"]
    env["emaxdpt"] = si["emaxdpt"]
    frc = {k: si[k] for k in SCAL_IN[:N_FRC]}
    with kernelmode.pallas_safe():
        out, state = impl.implsch(
            cfg, fl1, env, frc, si["ufric"], si["tauw"], si["tauwdir"],
            si["z0m"], si["z0b"], si["chrnck"])
    keys = SCAL_OUT_FULL if full else SCAL_OUT_MIN
    rows = []
    for k in keys:
        v = state.get(k)
        if v is None:
            v = jnp.zeros_like(si["ufric"])
        rows.append(v.astype(fl1.dtype).reshape(1, -1))
    scal_out = jnp.concatenate(rows, axis=0)
    xllws = state["xllws"].astype(fl1.dtype) if full else None
    return out, scal_out, xllws


def minimal_config(cfg) -> impl.PhysicsConfig:
    """A PhysicsConfig stripped of the pure-diagnostic work (fluxes,
    Stokes) for between-output-date steps — the prognostic state
    (fl1 + stress) is bit-identical; only output-time diagnostics are
    skipped (wamodel.F90 computes them for output/coupling)."""
    import dataclasses
    return dataclasses.replace(cfg, lcflx=False, lstokes=False,
                               lstrn=False)


# ---------------------------------------------------------------------------
# constant lifting: tables captured by the traced chain become kernel inputs
# ---------------------------------------------------------------------------

def _lift(fn, arg_sds):
    """Trace ``fn(*args)`` to a jaxpr and lift its array constants.

    The physics modules materialize the spectral/DIA tables as jnp
    constants at trace time; Pallas kernels cannot capture non-scalar
    constants, so the traced jaxpr's consts are returned as extra kernel
    inputs (1-D tables reshaped to (1, n) rows for Mosaic) and replayed
    with ``jax.core.eval_jaxpr`` inside the kernel.  Scalar/empty consts
    are re-created inline.
    """
    closed = jax.make_jaxpr(fn)(*arg_sds)
    inputs, spec = [], []
    for c in closed.consts:
        a = np.asarray(c)
        if a.size == 0 or a.ndim == 0:
            spec.append(("inline", a))
        else:
            a2 = a.reshape(1, -1) if a.ndim == 1 else a
            spec.append(("arg", len(inputs), a.shape))
            inputs.append(jnp.asarray(a2))
    return closed.jaxpr, spec, inputs


def _replay(jaxpr, spec, const_refs, *args):
    cvals = []
    for s in spec:
        if s[0] == "inline":
            cvals.append(jnp.asarray(s[1]))
        else:
            r = const_refs[s[1]][...]
            cvals.append(r.reshape(s[2]))
    return jax.core.eval_jaxpr(jaxpr, cvals, *args)


def _const_specs(inputs):
    return [pl.BlockSpec(a.shape, _zero_map(a.ndim)) for a in inputs]


def _zero_map(ndim):
    return lambda i: (0,) * ndim


def _sds(shape, dt):
    return jax.ShapeDtypeStruct(shape, dt)


# ---------------------------------------------------------------------------
# compact-layout entry: fl1 (nang, nfre, n)
# ---------------------------------------------------------------------------

def implsch_pallas(cfg, fl1, env2d, scal, *, full: bool = False,
                   tile: int = 128, interpret: bool = False):
    """IMPLSCH over the compact (nang, nfre, n) spectrum.

    ``env2d`` from :func:`pack_env`, ``scal`` from :func:`pack_scal`.
    Returns [fl1_new, scal_out(, xllws)].  ``n`` must be a multiple of
    ``tile``.
    """
    nang, nfre, n = fl1.shape
    if n % tile:
        raise ValueError(f"n={n} not a multiple of tile={tile}")
    _check_cfg(cfg)
    nsi = len(SCAL_IN)
    nso = len(SCAL_OUT_FULL if full else SCAL_OUT_MIN)
    dt = fl1.dtype

    def tile_fn(f_t, env_t, scal_t):
        out, so, xllws = _tile_implsch(cfg, f_t, scal_t, env_t,
                                       full=full)
        return (out, so, xllws) if full else (out, so)

    jaxpr, spec, consts = _lift(tile_fn, (
        _sds((nang, nfre, tile), dt), _sds((len(ENV_FIELDS) * nfre, tile), dt),
        _sds((nsi, tile), dt)))

    def kernel(*refs):
        crefs = refs[:len(consts)]
        f_ref, env_ref, scal_ref, *outs = refs[len(consts):]
        res = _replay(jaxpr, spec, crefs, f_ref[...], env_ref[...],
                      scal_ref[...])
        for o_ref, val in zip(outs, res):
            o_ref[...] = val

    out_shape = [_sds((nang, nfre, n), dt), _sds((nso, n), dt)]
    out_specs = [pl.BlockSpec((nang, nfre, tile), lambda i: (0, 0, i)),
                 pl.BlockSpec((nso, tile), lambda i: (0, i))]
    if full:
        out_shape.append(_sds((nang, nfre, n), dt))
        out_specs.append(
            pl.BlockSpec((nang, nfre, tile), lambda i: (0, 0, i)))
    return pl.pallas_call(
        kernel,
        grid=(n // tile,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        in_specs=_const_specs(consts) + [
            pl.BlockSpec((nang, nfre, tile), lambda i: (0, 0, i)),
            pl.BlockSpec((len(ENV_FIELDS) * nfre, tile), lambda i: (0, i)),
            pl.BlockSpec((nsi, tile), lambda i: (0, i)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*consts, fl1, env2d, scal)


# ---------------------------------------------------------------------------
# SRL-layout entry: f_srl (nsrl, LP), k-major lanes per row
# ---------------------------------------------------------------------------

def implsch_pallas_srl(cfg, f_srl, env2d, scal, tail=None, *,
                       nang: int, nfre_red: int,
                       full: bool = False, tile: int = 128,
                       interpret: bool = False):
    """IMPLSCH directly on the SRL spectrum (nsrl, LP).

    Physics is pure per-point, so it runs on ALL SRL rows including the
    wrap/pad duplicates (≈6% redundant work at O512) — removing the
    per-step gather/scatter between the advection layout and a compact
    layout entirely.  ``env2d``/``scal`` must be in SRL row order.

    With ``nfre > nfre_red`` the diagnostic tail frequencies ride in
    ``tail`` (nsrl, LTP) — k-major (nang, nfre-nfre_red) lanes padded to
    128 — advection never touches them (ecwam_run_model.sh:213-214
    operational split).  Returns [f_srl, scal_out(, tail)(, xllws)];
    xllws comes back (nang, nfre, nsrl).
    """
    nfre = cfg.tables.nfre
    nsrl0, LP = f_srl.shape
    if (nfre > nfre_red) != (tail is not None):
        raise ValueError("tail block required iff nfre > nfre_red")
    _check_cfg(cfg)
    # Mosaic lane-blocked inputs need tile % 128 == 0; pad the row axis
    # up to a tile multiple (zero spectra + replicated scalar columns —
    # benign, outputs sliced off) so small grids/shards work unchanged
    pad = (-nsrl0) % tile
    if pad:
        dtp = f_srl.dtype
        f_srl = jnp.concatenate(
            [f_srl, jnp.zeros((pad, LP), dtp)], axis=0)
        env2d = jnp.concatenate(
            [env2d, jnp.repeat(env2d[:, -1:], pad, axis=1)], axis=1)
        scal = jnp.concatenate(
            [scal, jnp.repeat(scal[:, -1:], pad, axis=1)], axis=1)
        if tail is not None:
            tail = jnp.concatenate(
                [tail, jnp.zeros((pad, tail.shape[1]), dtp)], axis=0)
    nsrl = nsrl0 + pad
    nsi = len(SCAL_IN)
    nso = len(SCAL_OUT_FULL if full else SCAL_OUT_MIN)
    dt = f_srl.dtype
    L = nang * nfre_red
    with_tail = tail is not None
    LTP = tail.shape[1] if with_tail else 0
    lt = nang * (nfre - nfre_red)

    def tile_fn(f_t, env_t, scal_t, *tail_t):
        C = f_t.shape[0]
        fl = jnp.transpose(f_t, (1, 0))[:L].reshape(nang, nfre_red, C)
        if with_tail:
            tl = jnp.transpose(tail_t[0], (1, 0))[:lt].reshape(
                nang, nfre - nfre_red, C)
            fl = jnp.concatenate([fl, tl], axis=1)
        out, so, xllws = _tile_implsch(cfg, fl, scal_t, env_t,
                                       full=full)
        body = out[:, :nfre_red, :].reshape(L, C)
        if LP > L:
            body = jnp.concatenate(
                [body, jnp.zeros((LP - L, C), body.dtype)], axis=0)
        res = [jnp.transpose(body, (1, 0)), so]
        if with_tail:
            tb = out[:, nfre_red:, :].reshape(lt, C)
            if LTP > lt:
                tb = jnp.concatenate(
                    [tb, jnp.zeros((LTP - lt, C), tb.dtype)], axis=0)
            res.append(jnp.transpose(tb, (1, 0)))
        if full:
            res.append(xllws)
        return tuple(res)

    arg_sds = [_sds((tile, LP), dt), _sds((len(ENV_FIELDS) * nfre, tile), dt),
               _sds((nsi, tile), dt)]
    if with_tail:
        arg_sds.append(_sds((tile, LTP), dt))
    jaxpr, spec, consts = _lift(tile_fn, tuple(arg_sds))

    def kernel(*refs):
        crefs = refs[:len(consts)]
        rest = refs[len(consts):]
        n_in = 3 + with_tail
        in_vals = [r[...] for r in rest[:n_in]]
        outs = rest[n_in:]
        res = _replay(jaxpr, spec, crefs, *in_vals)
        for o_ref, val in zip(outs, res):
            o_ref[...] = val

    in_specs = _const_specs(consts) + [
        pl.BlockSpec((tile, LP), lambda i: (i, 0)),
        pl.BlockSpec((len(ENV_FIELDS) * nfre, tile), lambda i: (0, i)),
        pl.BlockSpec((nsi, tile), lambda i: (0, i)),
    ]
    args = [f_srl, env2d, scal]
    out_shape = [_sds((nsrl, LP), dt), _sds((nso, nsrl), dt)]
    out_specs = [pl.BlockSpec((tile, LP), lambda i: (i, 0)),
                 pl.BlockSpec((nso, tile), lambda i: (0, i))]
    if with_tail:
        in_specs.append(pl.BlockSpec((tile, LTP), lambda i: (i, 0)))
        args.append(tail)
        out_shape.append(_sds((nsrl, LTP), dt))
        out_specs.append(pl.BlockSpec((tile, LTP), lambda i: (i, 0)))
    if full:
        out_shape.append(_sds((nang, nfre, nsrl), dt))
        out_specs.append(
            pl.BlockSpec((nang, nfre, tile), lambda i: (0, 0, i)))
    # in-place: each grid tile reads exactly the block it overwrites,
    # so the spectrum (and tail) buffers alias their outputs — halves
    # the kernel's HBM residency (the O1280/8 shard budget margin)
    nc = len(consts)
    aliases = {nc: 0}
    if with_tail:
        aliases[nc + 3] = 2
    res = pl.pallas_call(
        kernel,
        grid=(nsrl // tile,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(*consts, *args)
    if pad:
        res = list(res)
        res[0] = res[0][:nsrl0]
        res[1] = res[1][:, :nsrl0]
        if with_tail:
            res[2] = res[2][:nsrl0]
        if full:
            res[-1] = res[-1][..., :nsrl0]
        res = tuple(res)
    return res


def _check_cfg(cfg):
    # all physics options lower through Mosaic as of round 5
    # (ISNONLIN=2/PEAK_ANG was the last: one-hot argmax + masked
    # frequency selects in ops/physics/dia.py peak_ang)
    pass
