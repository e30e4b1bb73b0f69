"""Benchmark: full model step throughput on the attached accelerator.

Prints ONE JSON line:
  {"metric": "point_bins_per_s_per_chip", "value": N, "unit": "bins/s",
   "vs_baseline": F, ...}

Metric: grid-points × spectral-bins advanced per second for one advection
step at the operational cadence — advection every step, physics every
``idelt/idelpro`` steps — on the largest aqua O-grid that fits this chip
at the O1280 spectral resolution (36 dirs × 29 freqs, Δt 450/900 s;
BASELINE.md problem sizes), using the memory-scalable on-the-fly weights
path.

``vs_baseline`` is an HONEST fraction-of-roofline: the achieved HBM
traffic (XLA's own cost analysis of the compiled step — "bytes accessed"
— divided by the measured step time) over this chip's MEASURED stream
bandwidth (a saturating triad kernel timed in the same process).  All the
inputs to the ratio are printed so it can be audited; values near 1 mean
the step runs at memory speed-of-light.

Env knobs: ECWAVE_BENCH_GRID (skip auto-sizing), ECWAVE_BENCH_STEPS,
ECWAVE_BENCH_PROFILE=dir (write a jax.profiler trace of the timed loop).
"""

import json
import os
import time


def sync(jax, jnp, x):
    """Force full synchronization.

    block_until_ready alone does not flush remote-relay backends (axon),
    so additionally pull one scalar to host — device_get cannot return
    before the producing computation finished."""
    jax.block_until_ready(x)
    leaf = jax.tree.leaves(x)[0]
    return float(jax.device_get(jnp.ravel(leaf)[0]))


def measure_stream_bw(jax, jnp, nbytes=2 << 30):
    """Measured triad bandwidth (bytes/s): y = a*x + y over ~2 GB."""
    n = nbytes // 8                    # two f32 arrays
    x = jnp.arange(n, dtype=jnp.float32)
    y = jnp.ones(n, dtype=jnp.float32)

    @jax.jit
    def triad(x, y):
        return 1.0001 * x + y

    sync(jax, jnp, triad(x, y))
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        y = triad(x, y)
    sync(jax, jnp, y)
    dt = (time.perf_counter() - t0) / reps
    return 3.0 * n * 4 / dt            # read x, read y, write y


def cost_bytes(lowered):
    """XLA 'bytes accessed' for a lowered computation (NaN if missing)."""
    try:
        c = lowered.compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("bytes accessed", float("nan")))
    except Exception:
        return float("nan")


def run_grid(grid_name, steps, profile_dir):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.model import preset, stepper as stepper_mod
    from ecwam_tpu.ops.physics import implsch as impl

    # O1280 operational spectral shape + cadence (BASELINE.md): 36×29
    # bins, Δt_adv = 450 s, Δt_phys = 900 s → physics every 2nd step.
    # phys_chunk bounds the source-term intermediates (NPROMA chunking);
    # pad_to == phys_chunk keeps the chunk count integral.
    import sys
    chunk = 32768
    otf_block = int(os.environ.get("ECWAVE_BENCH_OTF_BLOCK", "8"))
    print(f"[bench] building {grid_name}", file=sys.stderr, flush=True)
    ms = setup_mod.build_model(
        grid_name=grid_name, nang=36, nfre=29,
        idelpro=450.0, idelt=900.0, pad_to=chunk, dtype=jnp.float32,
        weights_mode="otf", otf_block=otf_block, phys_chunk=chunk)

    n = ms.n_pad
    rng = np.random.default_rng(0)
    wswave = 8.0 + 4.0 * rng.random(n)
    wdwave = rng.random(n) * 2.0 * np.pi
    frc = dict(
        wswave=jnp.asarray(wswave, ms.dtype),
        wdwave=jnp.asarray(wdwave, ms.dtype),
        aird=jnp.full(n, 1.225, ms.dtype),
        wstar=jnp.zeros(n, ms.dtype),
        cicover=jnp.zeros(n, ms.dtype))
    fl1 = jnp.asarray(preset.mstart(ms.tb, wswave, wdwave), ms.dtype)
    stress = stepper_mod.initial_stress(ms, frc)

    # jitted phases built directly so the compiled HLO is introspectable
    st_arrays = stepper_mod.stencil_device_arrays(ms)
    xdella = ms.stencil.xdella
    env = {k: ms.env[k] for k in stepper_mod.ENV_KEYS}
    cg_ext = ms.env["cgroup_ext"][: ms.tb.nfre_red]
    wenv = {k: ms.env[k] for k in
            ("wavnum_ext", "cgroup_ext", "omosnh2kd_ext", "depth_ext",
             "ucur_ext", "vcur_ext") if k in ms.env}

    @jax.jit
    def adv(f, st_a, cg, we):
        return stepper_mod.propagate_otf(
            ms, f, stepper_mod._st_ns(st_a, xdella), cg, we)

    @jax.jit
    def phys(f, frc, stress, env):
        return stepper_mod._chunked_implsch(ms, f, env, frc, stress)

    adv_args = (fl1, st_arrays, cg_ext, wenv)
    b_adv = b_phys = float("nan")
    if os.environ.get("ECWAVE_BENCH_COST", "0") == "1":
        # XLA cost analysis costs a second compile and is unreliable
        # through the axon relay — opt-in only.
        b_adv = cost_bytes(adv.lower(*adv_args))
        b_phys = cost_bytes(phys.lower(fl1, frc, stress, env))

    print("[bench] compiling advection", file=sys.stderr, flush=True)
    f = adv(*adv_args)
    sync(jax, jnp, f)
    print("[bench] compiling physics", file=sys.stderr, flush=True)
    f, state = phys(f, frc, stress, env)
    sync(jax, jnp, f)
    print("[bench] timing", file=sys.stderr, flush=True)

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # timed: cadence pairs = 2 advection steps + 1 physics step each
    stress_now = stress
    t0 = time.perf_counter()
    for _ in range(steps):
        f = adv(f, st_arrays, cg_ext, wenv)
        f, state = phys(f, frc, stress_now, env)
        stress_now = {k: state[k] for k in stress_now}
        f = adv(f, st_arrays, cg_ext, wenv)
    sync(jax, jnp, f)
    dt_pair = (time.perf_counter() - t0) / steps

    t0 = time.perf_counter()
    for _ in range(steps):
        f = adv(f, st_arrays, cg_ext, wenv)
    sync(jax, jnp, f)
    t_adv = (time.perf_counter() - t0) / steps
    t_phys = max(dt_pair - 2.0 * t_adv, 0.0)

    if profile_dir:
        jax.profiler.stop_trace()

    bins = ms.n_real * 36 * 29
    value = bins / (dt_pair / 2.0)
    bw = measure_stream_bw(jax, jnp)

    # hand-counted HBM model (VERDICT r1 #5/#6): OTF advection reads
    # fl1 once, writes it once, gathers 9 neighbours, and re-derives the
    # 17 weight floats/bin (writing + re-reading them block-locally)
    # ≈ (2 + 9 + 2·17) f32/bin = 180 B/bin; physics ≈ 30 spectrum passes
    # ≈ 120 B/bin, every 2nd step.
    hand_adv = 180.0 * ms.n_pad * 36 * 29
    hand_phys = 120.0 * ms.n_pad * 36 * 29
    achieved = (2.0 * hand_adv + hand_phys) / dt_pair

    return {
        "metric": "point_bins_per_s_per_chip",
        "value": value,
        "unit": "bins/s",
        "vs_baseline": achieved / bw,
        "grid": grid_name, "nang": 36, "nfre": 29,
        "sea_points": ms.n_real,
        "cadence": "adv 450 s / phys 900 s (physics every 2nd step)",
        "step_pair_seconds": dt_pair,
        "t_propag_seconds": t_adv,
        "t_phys_seconds": t_phys,
        "device": str(jax.devices()[0].device_kind),
        "stream_bw_bytes_per_s": bw,
        "xla_bytes_per_adv_step": b_adv,
        "xla_bytes_per_phys_step": b_phys,
        "hand_model_bytes_per_adv_step": hand_adv,
        "bytes_per_bin_adv": b_adv / (ms.n_pad * 36 * 29),
    }


def main():
    steps = int(os.environ.get("ECWAVE_BENCH_STEPS", "5"))
    forced = os.environ.get("ECWAVE_BENCH_GRID")
    profile_dir = os.environ.get("ECWAVE_BENCH_PROFILE")
    candidates = [forced] if forced else ["O512", "O400", "O320"]

    last_err = None
    for grid_name in candidates:
        try:
            out = run_grid(grid_name, steps, profile_dir)
            print(json.dumps(out))
            return 0
        except Exception as e:  # noqa: BLE001 - fall through to smaller
            last_err = e
            msg = repr(e)
            if forced or not any(s in msg for s in
                                 ("RESOURCE_EXHAUSTED", "Out of memory",
                                  "out of memory", "OOM",
                                  "exceed memory", "Allocation")):
                raise
            continue
    raise SystemExit(f"no benchmark grid fit this chip: {last_err!r}")


if __name__ == "__main__":
    main()
