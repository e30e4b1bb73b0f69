"""Micro-bench: per-op-class throughput inside a Pallas TPU kernel.

Times K repetitions of one op class on a (nang, mf, C) tile across a
130k-row grid, reporting ns/op-application and effective vregs/cycle.
Classes: fma, mul, sub_shift (sublane-axis concat-shift), lead_roll
(leading-axis concat-roll), transpose (leading-two-dims), sub_reduce
(sum over sublane axis), lane_bcast ((1,mf,1)-operand multiply).

Run on the real device: python scripts/mosaic_opclass.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    nang, mf, C = 36, 40, 128
    rows = 128 * 1024
    K = int(os.environ.get("K", "64"))
    grid = rows // C

    def make(body_fn, n_extra=0):
        def kernel(x_ref, o_ref):
            x = x_ref[...]
            for i in range(K):
                x = body_fn(x, i)
            o_ref[...] = x[:nang] if x.shape[0] != nang else x

        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((nang, mf, C), lambda i: (0, 0, i))],
            out_specs=pl.BlockSpec((nang, mf, C), lambda i: (0, 0, i)),
            out_shape=jax.ShapeDtypeStruct((nang, mf, rows * C // C),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )

    # NOTE out_shape last dim must be total lanes: use (nang, mf, rows)
    def make2(body_fn):
        def kernel(x_ref, o_ref):
            x = x_ref[...]
            for i in range(K):
                x = body_fn(x, i)
            o_ref[...] = x

        f = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((nang, mf, C), lambda i: (0, 0, i))],
            out_specs=pl.BlockSpec((nang, mf, C), lambda i: (0, 0, i)),
            out_shape=jax.ShapeDtypeStruct((nang, mf, rows), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )
        return f

    ops = {}

    def fma(x, i):
        return x * 1.0000001 + 1e-9

    ops["fma"] = fma

    def sub_shift(x, i):
        return jnp.concatenate([x[:, 1:, :], x[:, :1, :]], axis=1)

    ops["sub_shift"] = sub_shift

    def sub_shift4(x, i):
        return jnp.concatenate([x[:, 4:, :], x[:, :4, :]], axis=1)

    ops["sub_shift4"] = sub_shift4

    def lead_roll(x, i):
        return jnp.concatenate([x[1:], x[:1]], axis=0)

    ops["lead_roll"] = lead_roll

    def transp(x, i):
        # transpose leading two dims there and back (keeps shape static)
        return jnp.transpose(jnp.transpose(x, (1, 0, 2)) * 1.0000001,
                             (1, 0, 2))

    ops["transpose2x"] = transp

    def sub_reduce(x, i):
        s = jnp.sum(x, axis=0)              # (mf, C) leading reduce
        return x + s[None, :, :] * 1e-12

    ops["lead_reduce"] = sub_reduce

    def sub_reduce1(x, i):
        s = jnp.sum(x, axis=1)              # (nang, C) sublane reduce
        return x + s[:, None, :] * 1e-12

    ops["sub_reduce"] = sub_reduce1

    w = jnp.asarray(np.linspace(0.99, 1.01, mf).reshape(1, mf, 1),
                    jnp.float32)

    def lane_bcast(x, i):
        return x * w

    # w is a captured non-scalar constant — not allowed; skip unless inlined
    # via iota trick. Use a computed vector instead:
    def lane_bcast2(x, i):
        wv = (jax.lax.broadcasted_iota(jnp.float32, (1, mf, 1), 1)
              * 1e-6 + 0.9999)
        return x * wv

    ops["lane_bcast"] = lane_bcast2

    def exp_op(x, i):
        return jnp.exp(x * 1e-6)

    ops["exp"] = exp_op

    x0 = jnp.asarray(
        np.random.default_rng(0).random((nang, mf, rows)), jnp.float32)
    probe = jax.jit(lambda a: a.reshape(-1)[0])

    def sync(v):
        jax.block_until_ready(v)
        return float(jax.device_get(probe(v)))

    reps = 8
    vregs = nang * (-(-mf // 8)) * 1  # per (nang,mf,C) tile: nang*ceil(mf/8)
    for name, body in ops.items():
        try:
            f = make2(body)
            t0 = time.time()
            y = f(x0)
            sync(y)
            compile_t = time.time() - t0
            t0 = time.perf_counter()
            for _ in range(reps):
                y = f(y)
            sync(y)
            dt = (time.perf_counter() - t0) / reps
            ns_per_app = dt / (K * grid) * 1e9
            cycles = ns_per_app * 0.94
            print(f"{name:12s}: {dt*1000:7.2f} ms total  "
                  f"{ns_per_app:8.1f} ns/app  ~{cycles:6.0f} cyc "
                  f"({vregs} vregs/tile) [compile {compile_t:.0f}s]",
                  flush=True)
            del y, f
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s}: FAILED {e!r}"[:300], flush=True)


if __name__ == "__main__":
    main()
