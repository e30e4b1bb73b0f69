"""Benchmark: full model step throughput on the attached accelerator.

Prints ONE JSON line:
  {"metric": "point_bins_per_s_per_chip", "value": N, "unit": "bins/s",
   "vs_baseline": F}

Metric: grid-points × spectral-bins advanced per second for a FULL step
(CTU advection + semi-implicit physics), the north-star from BASELINE.md.
``vs_baseline`` is the fraction of the HBM speed-of-light estimate for this
chip: the step is bandwidth-bound at roughly R ≈ 100 B of HBM traffic per
bin (state + weights + source terms), so SOL ≈ BW / R.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    size = os.environ.get("ECWAVE_BENCH_GRID", "O96")
    nang = int(os.environ.get("ECWAVE_BENCH_NANG", "24"))
    nfre = int(os.environ.get("ECWAVE_BENCH_NFRE", "29"))
    steps = int(os.environ.get("ECWAVE_BENCH_STEPS", "10"))

    import jax
    import jax.numpy as jnp
    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.model import preset, stepper as stepper_mod
    from ecwam_tpu.ops.physics import implsch as impl

    ms = setup_mod.build_model(
        grid_name=size, nang=nang, nfre=nfre,
        idelpro=450.0, idelt=900.0, pad_to=256, dtype=jnp.float32)

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

    step_full, _, _ = stepper_mod.make_step(ms)

    # warmup/compile
    f, state = step_full(fl1, frc, stress)
    jax.block_until_ready(f)

    t0 = time.perf_counter()
    for _ in range(steps):
        f, state = step_full(f, frc, stress)
    jax.block_until_ready(f)
    dt = (time.perf_counter() - t0) / steps

    bins = ms.n_real * nang * nfre
    value = bins / dt

    # speed-of-light estimate: ~100 bytes HBM traffic per bin per step,
    # v5e-class HBM ≈ 8.2e11 B/s
    sol = 8.2e11 / 100.0
    print(json.dumps({
        "metric": "point_bins_per_s_per_chip",
        "value": value,
        "unit": "bins/s",
        "vs_baseline": value / sol,
        "grid": size, "nang": nang, "nfre": nfre,
        "sea_points": ms.n_real, "step_seconds": dt,
    }))


if __name__ == "__main__":
    main()
