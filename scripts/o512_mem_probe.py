"""Probe O512 memory: compiled memory analysis of the advection and
physics steps without executing them (relay-safe)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.model.fusedstep import FusedPropagation

    t0 = time.time()
    ms = setup_mod.build_model(
        grid_name=sys.argv[1] if len(sys.argv) > 1 else "O512",
        nang=36, nfre=36, nfre_red=29,
        idelpro=450.0, idelt=900.0, pad_to=8192, dtype=jnp.float32,
        weights_mode="fused", cache_dir="/root/repo/.table_cache")
    print(f"build {time.time()-t0:.0f}s", flush=True)
    fp = FusedPropagation(ms)
    nsrl, LP = fp.ft.nsrl, fp.LP
    sds = jax.ShapeDtypeStruct

    @functools.partial(jax.jit, donate_argnums=(0,))
    def adv(f, bundle):
        return fp.advect_srl(f, bundle)

    absb = jax.tree.map(
        lambda a: sds(a.shape, a.dtype) if hasattr(a, "shape") else a,
        fp.bundle)
    lo = adv.lower(sds((nsrl, LP), jnp.float32), absb)
    ma = lo.compile().memory_analysis()
    print("adv:", {k: getattr(ma, k) / 1e9 for k in
                   ("argument_size_in_bytes", "output_size_in_bytes",
                    "temp_size_in_bytes", "alias_size_in_bytes")},
          flush=True)
    # resident device bytes right now
    total = sum(a.nbytes for a in jax.live_arrays()) / 1e9
    print(f"live device arrays: {total:.2f} GB", flush=True)
    for a in sorted(jax.live_arrays(), key=lambda x: -x.nbytes)[:12]:
        print(f"  {a.shape} {a.dtype} {a.nbytes/1e9:.2f} GB", flush=True)


if __name__ == "__main__" and not os.environ.get("FULLRUN"):
    main()


def run_full():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from ecwam_tpu.model import setup as setup_mod, stepper as stepper_mod
    from ecwam_tpu.model.fusedstep import FusedPropagation

    ms = setup_mod.build_model(
        grid_name="O512", nang=36, nfre=36, nfre_red=29,
        idelpro=450.0, idelt=900.0, pad_to=8192, dtype=jnp.float32,
        weights_mode="fused", cache_dir="/root/repo/.table_cache",
        env_on_device=bool(int(os.environ.get("ENVDEV", "1"))))
    fp = FusedPropagation(ms)
    n = ms.n_pad
    rng = np.random.default_rng(0)
    wswave = (8.0 + 4.0 * rng.random(n)).astype(np.float32)
    wdwave = (rng.random(n) * 2 * np.pi).astype(np.float32)
    frc = dict(wswave=jnp.asarray(wswave), wdwave=jnp.asarray(wdwave),
               aird=jnp.full(n, 1.225, jnp.float32),
               wstar=jnp.zeros(n, jnp.float32),
               cicover=jnp.zeros(n, jnp.float32))
    stress = stepper_mod.initial_stress(ms, dict(wswave=wswave,
                                                 wdwave=wdwave))
    env2d, denv, frc6, stress6 = fp.build_phys_srl(frc, stress)
    env2d.block_until_ready()

    def live(tag):
        tot = sum(a.nbytes for a in jax.live_arrays()) / 1e9
        print(f"[{tag}] live {tot:.2f} GB", flush=True)

    live("after phys inputs")
    f_srl, tail = fp.initial_srl(wswave, wdwave)
    f_srl.block_until_ready()
    live("after init")
    import jax as _j
    for a in sorted(_j.live_arrays(), key=lambda x: -x.nbytes)[:14]:
        print(f"  {a.shape} {a.dtype} {a.nbytes/1e9:.2f} GB", flush=True)

    import functools
    mode = os.environ.get("SYNCMODE", "")
    if mode == "tick":
        @functools.partial(jax.jit, donate_argnums=(0,))
        def adv(f, bundle):
            out = fp.advect_srl(f, bundle)
            return out, out[0, 0]
    else:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def adv(f, bundle):
            return fp.advect_srl(f, bundle)
    if mode == "chain":
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def phys(f, t, s6, f6, dv, e2):
            ff, s6n, tl = fp.phys_srl_pallas(f, s6, f6, dv, e2, t)
            return ff, tl, s6n
        drain = jax.jit(lambda s: s[0, 0] * 0.0 + s[1, 1])
        try:
            f_srl = adv(f_srl, fp.bundle)
            tail2 = tail
            f_srl, tail2, stress6 = phys(f_srl, tail2, stress6, frc6,
                                         denv, env2d)
            v = float(jax.device_get(drain(stress6)))
            live("after chain")
            print("CHAIN OK", v, flush=True)
        except Exception as e:
            print("CHAIN FAIL", repr(e)[:300], flush=True)
        raise SystemExit
    try:
        if mode == "tick":
            f_srl, tick = adv(f_srl, fp.bundle)
            print("tick:", float(jax.device_get(tick)), flush=True)
        else:
            f_srl = adv(f_srl, fp.bundle)
        if os.environ.get("SYNCMODE") == "probe":
            import bench
            bench.sync(jax, jnp, f_srl)
        else:
            f_srl.block_until_ready()
        live("after adv")
        print("ADV OK", flush=True)
    except Exception as e:
        print("ADV FAIL", repr(e)[:300], flush=True)


if __name__ == "__main__" and os.environ.get("FULLRUN"):
    run_full()
