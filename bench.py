"""Benchmark: full model step throughput on the attached accelerator.

Prints ONE JSON line:
  {"metric": "point_bins_per_s_per_chip", "value": N, "unit": "bins/s",
   "vs_baseline": F, ...}

Metric: grid-points × spectral-bins advanced per second for one advection
step at the operational cadence — advection every step, physics every
``idelt/idelpro`` steps — at the O1280 operational spectrum (36 dirs ×
NFRE=36 physics / NFRE_RED=29 advected, the reference's split from
ecwam_run_model.sh:213-214; Δt 450/900 s; BASELINE.md problem sizes), on
the largest grid from the ladder that fits this chip, using the FUSED
weights+stencil Pallas propagation (ops/propagation_pallas.py) and the
FUSED Pallas IMPLSCH physics kernel (ops/physics/implsch_pallas.py) on
SRL-resident state — the production architecture, not a bench special.

``vs_baseline`` is an HONEST fraction-of-roofline: modelled minimum
time over measured time, where the advection model is its HBM bytes
over the measured stream bandwidth (memory-bound by design) and the
physics model is max(bytes/BW, arith/FMA-rate + transcendentals/exp-
rate) with op counts taken from the traced kernel jaxpr and both rates
MEASURED in-process — every term is printed for audit.

This script NEVER exits non-zero for capacity reasons: it degrades down
a grid ladder (and finally a tiny CPU-sized grid), reporting the best
achieved configuration with "degraded": true.

Env knobs: ECWAVE_BENCH_GRID (skip auto-sizing), ECWAVE_BENCH_STEPS,
ECWAVE_BENCH_PROFILE=dir (jax.profiler trace of the timed loop),
ECWAVE_BENCH_SPECTRUM=red (legacy NFRE=NFRE_RED=29 spectrum).
"""

import functools
import json
import os
import sys
import time
import traceback


_PROBE = None


def sync(jax, jnp, x):
    """Force full synchronization (incl. the axon relay: device_get of a
    scalar cannot return before the producing computation finished).

    The probe MUST be jitted: an eager ``jnp.ravel(x)[0]`` on a relay-
    attached device remote-compiles + materializes the full array
    (~190 s for a 600 MB array, ~30 min at O512 sizes — the round-3
    "hang"); the jitted slice compiles once per shape and returns 4 B.
    """
    jax.block_until_ready(x)
    leaf = jax.tree.leaves(x)[0]
    return float(jax.device_get(sync_probe(jax)(leaf)))


def sync_probe(jax):
    """The jitted completion probe (slice first — a jitted reshape(-1)
    of a 5 GB array materializes a full flattened copy on device)."""
    global _PROBE
    if _PROBE is None:
        _PROBE = jax.jit(
            lambda a: a[(slice(0, 1),) * a.ndim].reshape(-1)[0])
    return _PROBE


def measure_stream_bw(jax, jnp, nbytes=2 << 30):
    """Measured triad bandwidth (bytes/s): y = a*x + y over ~2 GB."""
    n = nbytes // 8
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
    return 3.0 * n * 4 / dt


def measure_vpu_flops(jax, jnp, n=1 << 24, chain=128, lanes=4):
    """Measured elementwise arithmetic throughput (flops/s): ``lanes``
    independent LOGISTIC-MAP chains (3 flops + 2 scalings per step,
    counted as 5; non-affine so XLA cannot algebraically collapse the
    chain the way it folds an FMA ladder, and with enough ILP to cover
    pipeline latency).  Measures ~2.7 Tflop/s on v5e (calibrated
    2026-08; a collapsible probe reads 10x low)."""
    x = jnp.full(n, 0.6180339887, jnp.float32)

    @jax.jit
    def f(x):
        accs = [x * (1.0 - 1e-6 * i) for i in range(lanes)]
        for _ in range(chain):
            accs = [3.6 * a * (1.0 - a) * 0.2777778 + 0.18
                    for a in accs]
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        return out / (lanes + 1e-3)

    sync(jax, jnp, f(x))
    reps = 16
    t0 = time.perf_counter()
    for _ in range(reps):
        x = f(x)
    sync(jax, jnp, x)
    dt = (time.perf_counter() - t0) / reps
    return 5.0 * chain * lanes * n / dt


def measure_trans_rate(jax, jnp, n=1 << 24, chain=64, lanes=4):
    """Measured transcendental throughput (exp ops/s, ILP chains;
    ~700 G/s on v5e)."""
    x = jnp.full(n, 0.5, jnp.float32)

    @jax.jit
    def exps(x):
        accs = [x * (1.0 + 1e-6 * i) for i in range(lanes)]
        for _ in range(chain):
            accs = [jnp.exp(-a) for a in accs]
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        return out / (lanes + 1e-3)

    sync(jax, jnp, exps(x))
    reps = 16
    t0 = time.perf_counter()
    for _ in range(reps):
        x = exps(x)
    sync(jax, jnp, x)
    dt = (time.perf_counter() - t0) / reps
    return chain * lanes * n / dt


# transcendental-class primitives (counted separately and costed at the
# MEASURED transcendental rate, not by guessed op-equivalent weights)
_TRANS = {"exp", "log", "tanh", "sin", "cos", "atan2", "atan", "pow",
          "sinh", "cosh", "logistic", "erf", "sqrt", "rsqrt", "div"}
_ZERO_COST = {"reshape", "squeeze", "broadcast_in_dim", "slice",
              "concatenate", "transpose", "convert_element_type",
              "dynamic_slice", "dynamic_update_slice", "copy", "pad",
              "iota", "rev", "gather", "bitcast_convert_type",
              "stop_gradient", "custom_jvp_call", "custom_vjp_call"}


def jaxpr_flops(jaxpr):
    """(arith_ops, transcendental_ops) element counts of a jaxpr —
    audits the physics roofline; costed at separately MEASURED rates."""
    import numpy as _np
    arith = 0.0
    trans = 0.0
    for eq in jaxpr.eqns:
        name = eq.primitive.name
        sub = None
        length = 1
        for k, v in eq.params.items():
            vs = v if isinstance(v, (list, tuple)) else [v]
            for vv in vs:
                if hasattr(vv, "jaxpr"):
                    sub = vv.jaxpr if hasattr(vv.jaxpr, "eqns") else vv
                elif hasattr(vv, "eqns"):
                    sub = vv
        if name == "scan":
            length = eq.params.get("length", 1)
        if sub is not None:
            a, t = jaxpr_flops(sub)
            arith += length * a
            trans += length * t
            continue
        if name in _ZERO_COST:
            continue
        out_elems = max((int(_np.prod(v.aval.shape)) for v in eq.outvars),
                        default=0)
        if name == "dot_general":
            a, b = (eq.invars[0].aval.shape, eq.invars[1].aval.shape)
            k = eq.params["dimension_numbers"][0][0]
            kdim = int(_np.prod([a[i] for i in k])) if k else 1
            arith += 2.0 * out_elems * kdim
        elif name.startswith("reduce"):
            arith += max((int(_np.prod(v.aval.shape))
                          for v in eq.invars), default=0)
        elif name in _TRANS:
            trans += out_elems
        else:
            arith += out_elems
    return arith, trans


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


_RATES = None


def get_rates(jax, jnp):
    """Measured stream/VPU/transcendental rates — taken in a SEPARATE
    SUBPROCESS: buffers freed through the relay are not released back
    to later allocations within a process (measured: the probes OOM
    after an O512 model was resident, and a model OOMs after the
    probes ran), but a subprocess exit tears the session down fully."""
    global _RATES
    if _RATES is None:
        import subprocess
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--rates"],
                capture_output=True, text=True, timeout=900,
                check=True)
            _RATES = tuple(json.loads(out.stdout.strip().split("\n")[-1]))
            time.sleep(5.0)          # let the relay session tear down
        except Exception as e:  # noqa: BLE001
            log(f"subprocess rates failed ({e!r}); measuring in-process")
            _RATES = (measure_stream_bw(jax, jnp),
                      measure_vpu_flops(jax, jnp),
                      measure_trans_rate(jax, jnp))
    return _RATES


def run_fused(grid_name, steps, profile_dir, nang=36, nfre=36,
              nfre_red=29, idelpro=450.0, idelt=900.0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.model import stepper as stepper_mod
    from ecwam_tpu.model.fusedstep import FusedPropagation
    from ecwam_tpu.ops.physics import implsch_pallas as ipk

    if os.environ.get("ECWAVE_BENCH_SPECTRUM") == "red":
        nfre = nfre_red                  # legacy all-advected spectrum

    log(f"building {grid_name} (fused, nfre {nfre}/{nfre_red})")
    t0 = time.time()
    ms = setup_mod.build_model(
        grid_name=grid_name, nang=nang, nfre=nfre, nfre_red=nfre_red,
        idelpro=idelpro, idelt=idelt, pad_to=8192, dtype=jnp.float32,
        weights_mode="fused", env_on_device=False,
        cache_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".table_cache"))
    ft = ms.fused
    log(f"built in {time.time()-t0:.0f}s: n_real={ms.n_real} "
        f"nsrl={ft.nsrl} S={ft.S} EW={ft.EW}")

    t0 = time.time()
    fp = FusedPropagation(ms)
    log(f"tables on device in {time.time()-t0:.0f}s "
        f"(backend {fp.backend})")
    n = ms.n_pad
    nsrl = ft.nsrl
    rng = np.random.default_rng(0)
    wswave = 8.0 + 4.0 * rng.random(n)
    wdwave = rng.random(n) * 2.0 * np.pi
    frc = dict(
        wswave=jnp.asarray(wswave, ms.dtype),
        wdwave=jnp.asarray(wdwave, ms.dtype),
        aird=jnp.full(n, 1.225, ms.dtype),
        wstar=jnp.zeros(n, ms.dtype),
        cicover=jnp.zeros(n, ms.dtype))
    log("forcing on device")
    # host forcing into initial_stress: device->host pulls through an
    # accelerator relay cost minutes each
    frc_h = dict(wswave=wswave, wdwave=wdwave)
    stress = stepper_mod.initial_stress(ms, frc_h)
    log("stress on device")

    # SRL-ordered physics inputs (one jitted device gather)
    t0 = time.time()
    env2d, denv, frc6, stress6 = fp.build_phys_srl(frc, stress)
    env2d.block_until_ready()
    log(f"phys SRL inputs in {time.time()-t0:.0f}s")

    L = nang * nfre_red
    LPb = fp.LP if fp.backend == "pallas" else fp.L
    LT = nang * (nfre - nfre_red)
    LTP = -(-LT // 128) * 128 if LT else 0
    bundle = fp.bundle

    # RELAY RULES (measured, round 5):
    #  (a) block_until_ready is NOT a completion barrier through the
    #      relay — only device_get of a computed scalar is;
    #  (b) handing the 5 GB state to a separate non-donating executable
    #      (a sync-probe jit) costs a state-sized staging allocation;
    #  (c) fresh compiles dispatched while the big state is resident
    #      OOM.
    # So each step returns a [0,0] "tick" scalar computed INSIDE the
    # donating executable (no extra executable, no staging), and both
    # steps are AOT-compiled BEFORE the initial state is materialized;
    # the compiled objects are then called directly.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def adv_srl(f_srl, bundle):
        return fp.advect_srl(f_srl, bundle)

    # fused Pallas physics on SRL-resident state: one spectrum
    # read+write instead of the round-3 ~30 XLA passes
    if LT:
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def phys_srl(f_srl, tail, stress6, frc6, denv, env2d):
            f, s6, tl = fp.phys_srl_pallas(f_srl, stress6, frc6, denv,
                                           env2d, tail)
            return f, tl, s6
    else:
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def phys_srl(f_srl, stress6, frc6, denv, env2d):
            out, s6 = fp.phys_srl_pallas(f_srl, stress6, frc6, denv,
                                         env2d)
            return out, None, s6

    # the completion barrier: a SMALL-argument drain executable.  The
    # device runs enqueued programs in order, so a scalar computed from
    # the (small, always-resident) stress rows and device_get AFTER the
    # queued steps is a true barrier; a probe on the 5 GB state itself
    # costs a state-sized staging allocation (measured OOM)
    drain = jax.jit(lambda s6: s6[0, 0] * 0.0 + s6[1, 1])

    def abstract(*args):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
            if hasattr(a, "shape") else a, args)

    sds_f = jax.ShapeDtypeStruct((nsrl, LPb), ms.dtype)
    sds_t = (jax.ShapeDtypeStruct((nsrl, LTP), ms.dtype) if LT else None)
    abs_adv = (sds_f,) + abstract(bundle)
    abs_phys = ((sds_f, sds_t) + abstract(stress6, frc6, denv, env2d)
                if LT else
                (sds_f,) + abstract(stress6, frc6, denv, env2d))
    def xla_bytes(jfn, absargs):
        """XLA cost-analysis 'bytes accessed' (audits the hand model;
        NaN when unavailable; Pallas custom-call internals are NOT
        counted, so this undercounts both fused kernels)."""
        try:
            ca = jfn.lower(*absargs).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0] if ca else {}
            return float(ca.get("bytes accessed", float("nan")))
        except Exception:  # noqa: BLE001
            return float("nan")

    def compiled_mem(jfn, absargs):
        """Compiled memory analysis (works through the relay where
        device memory_stats does not)."""
        try:
            ma = jfn.lower(*absargs).compile().memory_analysis()
            return dict(
                args=float(getattr(ma, "argument_size_in_bytes", 0)),
                out=float(getattr(ma, "output_size_in_bytes", 0)),
                temp=float(getattr(ma, "temp_size_in_bytes", 0)),
                alias=float(getattr(ma, "alias_size_in_bytes", 0)))
        except Exception:  # noqa: BLE001
            return None

    # warm the PERSISTENT disk cache for every executable that must run
    # at high residency — a fresh compile dispatched through the relay
    # while the 5 GB state is resident OOMs regardless of program size
    # (measured: even the tiny drain's first compile).  The compiled
    # objects are dropped immediately: RETAINED AOT executables leave
    # server-side state resident that also collides with execution
    # (measured: r5m/n/o first-step OOMs)
    def phys_call(f_srl, tail, stress6):
        if LT:
            return phys_srl(f_srl, tail, stress6, frc6, denv, env2d)
        return phys_srl(f_srl, stress6, frc6, denv, env2d)

    # WARM-UP on a zeros state BEFORE the real one exists: compiles the
    # steps + the drain barrier while residency is low, and carves the
    # allocator's two spectrum-sized regions cleanly — building the
    # real state first fragments the arena so the advection temp no
    # longer fits (measured: the on-device-init OOM this round; the r4
    # host-push init never churned the arena).  The drain verifies the
    # warm-up chain actually executed (block_until_ready is NOT a
    # barrier through the relay and async failures stay silent).
    log("warm-up: compiling+running steps on a zeros state")
    t0 = time.time()
    f_srl = jnp.zeros((nsrl, LPb), ms.dtype)
    tail = jnp.zeros((nsrl, LTP), ms.dtype) if LT else None
    f_srl = adv_srl(f_srl, bundle)
    f_srl, tail, stress6_w = phys_call(
        f_srl, tail, jax.tree.map(lambda a: a + 0.0, stress6))
    float(jax.device_get(drain(stress6_w)))
    del f_srl, tail, stress6_w
    log(f"warm-up done in {time.time()-t0:.0f}s")

    # initial state built ON DEVICE directly in the SRL layout (MSTART
    # is closed-form per bin): the former host build + 5.2 GB relay push
    # cost ~11 min at O512; one jitted kernel replaces both
    t0 = time.time()
    f_srl, tail = fp.initial_srl(wswave.astype(np.float32),
                                 wdwave.astype(np.float32))
    f_srl.block_until_ready()
    log(f"initial SRL state on device in {time.time()-t0:.0f}s "
        f"({f_srl.nbytes/1e9:.1f} GB)")

    def barrier():
        return float(jax.device_get(drain(stress6)))

    log("first advection")
    t0 = time.time()
    f_srl = adv_srl(f_srl, bundle)
    barrier()
    log(f"advection first step {time.time()-t0:.0f}s")
    log("first physics")
    t0 = time.time()
    f_srl, tail, stress6 = phys_call(f_srl, tail, stress6)
    barrier()
    log(f"physics first step {time.time()-t0:.0f}s")

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # cadence pairs: 2 advection steps + 1 physics step each
    log("timing")
    t0 = time.perf_counter()
    for _ in range(steps):
        f_srl = adv_srl(f_srl, bundle)
        f_srl, tail, stress6 = phys_call(f_srl, tail, stress6)
        f_srl = adv_srl(f_srl, bundle)
    barrier()
    dt_pair = (time.perf_counter() - t0) / steps

    t0 = time.perf_counter()
    for _ in range(steps):
        f_srl = adv_srl(f_srl, bundle)
    barrier()
    t_adv = (time.perf_counter() - t0) / steps
    t_phys = max(dt_pair - 2.0 * t_adv, 0.0)

    if profile_dir:
        jax.profiler.stop_trace()

    try:
        mem = jax.local_devices()[0].memory_stats() or {}
        peak_bytes = mem.get("peak_bytes_in_use")
    except Exception:  # noqa: BLE001
        peak_bytes = None

    # AOT analyses AFTER the timing (pre-state AOT compiles leave
    # server-side executable state resident that collides with the
    # step execution — measured OOM)
    mem_adv = compiled_mem(adv_srl, abs_adv)
    mem_phys = compiled_mem(phys_srl, abs_phys)
    xla_adv = xla_bytes(adv_srl, abs_adv)

    bins = ms.n_real * nang * nfre
    value = bins / (dt_pair / 2.0)
    bw, vpu, trate = get_rates(jax, jnp)

    # ---- audited roofline models -------------------------------------
    # advection bytes (pallas kernel): 3 window reads + 1 write of the
    # lane-padded spectrum (dn/up windows S+EWG rows, own S+24), cg
    # windows on the 128-lane-padded cg table, the 128-col ptab row
    # (taps folded in), and the obstruction rows only when the grid has
    # actual obstructions (skipped statically on open water).  Extra
    # fast-wave sub-passes advect a band only.
    pk_tabs = fp.bundle.get("pk") if fp.backend == "pallas" else None
    if pk_tabs is not None:
        LPm = fp.LP
        ew2 = pk_tabs["ewtok"].shape[0]
        ewg = ((ew2 + 8 + 7) // 8) * 8
        winf = 3.0 + (2.0 * ewg + 24.0) / ft.S
        nfp = pk_tabs["cg"].shape[1]
        obs_cols = (pk_tabs["obs"].shape[1]
                    if pk_tabs["obs"].shape[0] == nsrl else 0)
        per_pass = (winf + 1.0) * nsrl * LPm
        per_pass += winf * nsrl * nfp
        per_pass += nsrl * (128.0 + obs_cols)
    else:
        win = 3.0 + (2.0 * ft.EW + 2.0) / ft.S
        per_pass = (win + 1.0) * nsrl * L
        per_pass += (win + 1.0) * nsrl * nfre_red
        per_pass += nsrl * (6.0 * ft.EW + 22.0 + 8.0 * nfre_red)
    adv_bytes = 4.0 * per_pass
    # physics bytes: ONE spectrum read + write (+ tail block) + env/scal
    # rows + state outputs — the whole point of the fused kernel
    LPp = fp.LP if fp.backend == "pallas" else L
    phys_bytes = 4.0 * nsrl * (2.0 * LPp + 2.0 * LTP
                               + float(len(ipk.ENV_FIELDS)) * nfre + 2.0 + 2.0 * 6.0 + 6.0)

    # physics op counts from the traced tile jaxpr (the same trace the
    # kernel executes): arithmetic costed at the measured FMA rate,
    # transcendentals at the measured exp rate
    phys_arith = phys_trans = float("nan")
    try:
        from ecwam_tpu.ops.physics import kernelmode
        cfg_min = ipk.minimal_config(ms.phys)
        tile = fp.phys_tile
        sds = jax.ShapeDtypeStruct

        def tfn(f, s, e):
            return ipk._tile_implsch(cfg_min, f, s, e, full=False)
        with kernelmode.pallas_safe():
            closed = jax.make_jaxpr(tfn)(
                sds((nang, nfre, tile), jnp.float32),
                sds((len(ipk.SCAL_IN), tile), jnp.float32),
                sds((len(ipk.ENV_FIELDS) * nfre, tile), jnp.float32))
        a, t = jaxpr_flops(closed.jaxpr)
        scale = -(-nsrl // tile)
        phys_arith, phys_trans = a * scale, t * scale
    except Exception as e:  # noqa: BLE001
        log(f"flop count failed: {e!r}")

    def model_time(bts, arith=0.0, trans=0.0):
        out = bts / bw
        if arith == arith:
            out = max(out, arith / vpu + trans / trate)
        return out

    # advection is memory-bound by design (the fused kernel's FIR taps
    # are a handful of FMAs per loaded element): bytes-only term
    t_model = 2.0 * model_time(adv_bytes) + model_time(
        phys_bytes, phys_arith, phys_trans)

    return {
        "metric": "point_bins_per_s_per_chip",
        "value": value,
        "unit": "bins/s",
        "vs_baseline": t_model / dt_pair,
        "grid": grid_name, "nang": nang, "nfre": nfre,
        "nfre_red": nfre_red,
        "sea_points": ms.n_real,
        "mode": f"fused/{fp.backend}+physkernel",
        "cadence": "adv 450 s / phys 900 s (physics every 2nd step)",
        "step_pair_seconds": dt_pair,
        "t_propag_seconds": t_adv,
        "t_phys_seconds": t_phys,
        "device": str(jax.devices()[0].device_kind),
        "stream_bw_bytes_per_s": bw,
        "vpu_flops_per_s": vpu,
        "trans_ops_per_s": trate,
        "model_bytes_per_adv_step": adv_bytes,
        "model_bytes_per_phys_step": phys_bytes,
        "model_arith_per_phys_step": phys_arith,
        "model_trans_per_phys_step": phys_trans,
        "model_step_pair_seconds": t_model,
        "xla_bytes_per_adv_step": xla_adv,
        "bytes_per_bin_adv": adv_bytes / bins,
        "device_peak_bytes": peak_bytes,
        "mem_analysis_adv": mem_adv,
        "mem_analysis_phys": mem_phys,
    }


def main():
    if "--rates" in sys.argv:
        import jax
        import jax.numpy as jnp
        print(json.dumps([measure_stream_bw(jax, jnp),
                          measure_vpu_flops(jax, jnp),
                          measure_trans_rate(jax, jnp)]))
        return 0
    steps = int(os.environ.get("ECWAVE_BENCH_STEPS", "5"))
    forced = os.environ.get("ECWAVE_BENCH_GRID")
    profile_dir = os.environ.get("ECWAVE_BENCH_PROFILE")
    # quick rung FIRST (guaranteed number in ~5 min), then the 1M-point
    # target, then smaller big rungs; stop at the first big success
    ladder = ([forced] if forced
              else ["O160", "O512", "O320", "O96", "3.0", "12.0"])

    try:  # persistent compile cache: O512 compiles cost ~20 min fresh
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        # EVERYTHING must persist: a sub-threshold program (the drain
        # barrier) would re-compile at high residency and OOM
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0)
    except Exception:  # noqa: BLE001
        pass
    # rate probes run in a subprocess BEFORE this process touches the
    # device (single-tenant grant + relay memory retention: see
    # get_rates)
    log("measuring device rates (subprocess)")
    import jax.numpy as jnp
    get_rates(jax, jnp)

    best = {"out": None}

    def emit_best(*_a):
        """Always leave a JSON line, even when the driver times us out
        (SIGTERM): print the best rung achieved so far."""
        if best["out"] is not None:
            print(json.dumps(best["out"]), flush=True)
            os._exit(0)
        print(json.dumps({
            "metric": "point_bins_per_s_per_chip", "value": 0.0,
            "unit": "bins/s", "vs_baseline": 0.0, "degraded": True,
            "errors": {g: e[:300] for g, e in errors.items()}}),
            flush=True)
        os._exit(0)

    import signal
    signal.signal(signal.SIGTERM, emit_best)

    errors = {}
    for i, grid_name in enumerate(ladder):
        try:
            out = run_fused(grid_name, steps, profile_dir)
            if errors:
                out["errors"] = {g: e[:300] for g, e in errors.items()}
            prev = best["out"]
            if prev is None or out["sea_points"] > prev["sea_points"]:
                best["out"] = out
            if not forced and i >= 1:
                # first post-quick-rung success: the ladder descends in
                # size, so this is the biggest grid that fits — stop
                out = dict(best["out"])
                out["degraded"] = grid_name != "O512"
                print(json.dumps(out))
                return 0
            if forced:
                print(json.dumps(out))
                return 0
        except Exception as e:  # noqa: BLE001 — degrade, never rc!=0
            errors[grid_name] = repr(e)
            log(f"{grid_name} failed: {e!r}")
            traceback.print_exc(file=sys.stderr)
            # HARD-release device memory: the exception traceback pins
            # the failed rung's frames (and their device arrays), so
            # without this every later rung inherits the OOM
            e.__traceback__ = None
            del e
            sys.last_traceback = None
            import gc
            gc.collect()
            try:
                import jax
                jax.clear_caches()
                for buf in jax.live_arrays():
                    buf.delete()
            except Exception as e2:  # noqa: BLE001
                log(f"device cleanup failed: {e2!r}")
            continue
    # absolute last resort: still emit a valid JSON line
    print(json.dumps({
        "metric": "point_bins_per_s_per_chip", "value": 0.0,
        "unit": "bins/s", "vs_baseline": 0.0, "degraded": True,
        "errors": {g: e[:300] for g, e in errors.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
