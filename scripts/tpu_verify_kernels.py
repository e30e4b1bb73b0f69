"""On-TPU kernel equivalence check (VERDICT r4 weak #7).

Runs the fused Pallas IMPLSCH kernel AND the plain-XLA physics chain on
identical inputs ON THE REAL CHIP, plus the Pallas advection kernel vs
the XLA fused engine, and reports max|Δ| for each.  The CPU suite pins
the kernels in interpret mode; this re-proves the Mosaic lowering on
hardware each round.

    python scripts/tpu_verify_kernels.py [grid]

Writes JSON {"phys_max_rel": .., "adv_max_rel": ..} to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    grid = sys.argv[1] if len(sys.argv) > 1 else "O160"
    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.model import stepper as stepper_mod
    from ecwam_tpu.model.fusedstep import FusedPropagation, _advect_xla_srl
    from ecwam_tpu.ops.physics import implsch_pallas as ipk
    from ecwam_tpu.ops.physics import implsch as impl

    nang, nfre, nfre_red = 36, 36, 29
    ms = setup_mod.build_model(
        grid_name=grid, nang=nang, nfre=nfre, nfre_red=nfre_red,
        idelpro=450.0, idelt=900.0, pad_to=8192, dtype=jnp.float32,
        weights_mode="fused",
        cache_dir=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".table_cache"))
    fp = FusedPropagation(ms)
    assert fp.backend == "pallas", fp.backend
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
    stress = stepper_mod.initial_stress(ms, dict(wswave=wswave,
                                                 wdwave=wdwave))
    env2d, denv, frc6, stress6 = fp.build_phys_srl(frc, stress)
    f_srl, tail = fp.initial_srl(wswave.astype(np.float32),
                                 wdwave.astype(np.float32))

    # ---- physics: fused kernel vs XLA chain on the SAME rows ---------
    t0 = time.time()
    out_k = fp.phys_srl_pallas(f_srl, stress6, frc6, denv, env2d, tail)
    fk = np.asarray(out_k[0])
    sk = np.asarray(out_k[1])
    tk = np.asarray(out_k[2]) if tail is not None else None
    print(f"[verify] kernel ran in {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)

    # XLA chain on a subset of rows (full nsrl would need the compact
    # round trip); compare CHUNK rows including wrap/pad structure
    CH = 4096
    sl = slice(0, CH)
    L = fp.L
    lt = nang * (nfre - nfre_red)

    def compact(rows_f, rows_t):
        f = np.asarray(rows_f)[:, :L].reshape(CH, nang, nfre_red)
        if rows_t is not None:
            t = np.asarray(rows_t)[:, :lt].reshape(CH, nang,
                                                   nfre - nfre_red)
            f = np.concatenate([f, t], axis=2)
        return jnp.asarray(f.transpose(1, 2, 0), ms.dtype)

    fl_c = compact(np.asarray(f_srl)[sl],
                   None if tail is None else np.asarray(tail)[sl])
    cfg_min = ipk.minimal_config(ms.phys)
    envk = {}
    nfre_t = ms.tb.nfre
    e2 = np.asarray(env2d)
    for i, k in enumerate(ipk.ENV_FIELDS):
        envk[k] = jnp.asarray(e2[i * nfre_t:(i + 1) * nfre_t, sl])
    d2 = np.asarray(denv)
    envk["depth"] = jnp.asarray(d2[0, sl])
    envk["emaxdpt"] = jnp.asarray(d2[1, sl])
    f6 = np.asarray(frc6)
    frck = {k: jnp.asarray(f6[i, sl]) for i, k in
            enumerate(ipk.SCAL_IN[:ipk.N_FRC])}
    s6 = np.asarray(stress6)

    @jax.jit
    def xla_chain(fl, s6c, envk, frck):
        return impl.implsch(cfg_min, fl, envk, frck,
                            s6c[0], s6c[1], s6c[2], s6c[3], s6c[4],
                            s6c[5])

    out_x, state_x = xla_chain(fl_c, jnp.asarray(s6[:, sl]), envk, frck)
    fx = np.asarray(out_x)
    scale = max(abs(fx).max(), 1e-30)
    got = np.asarray(fk)[sl][:, :L].reshape(CH, nang, nfre_red)
    want = fx[:, :nfre_red, :].transpose(2, 0, 1)
    phys_max = float(np.abs(got - want).max() / scale)
    if tk is not None:
        gt = tk[sl][:, :lt].reshape(CH, nang, nfre - nfre_red)
        wt = fx[:, nfre_red:, :].transpose(2, 0, 1)
        phys_max = max(phys_max, float(np.abs(gt - wt).max() / scale))
    # stress rows
    sx = [np.asarray(state_x[k]) for k in ipk.SCAL_OUT_MIN]
    s_max = float(max(
        np.abs(sk[i][sl] - sx[i]).max()
        / max(np.abs(sx[i]).max(), 1e-12)
        for i in range(len(ipk.SCAL_OUT_MIN))))

    # ---- advection: Pallas kernel vs XLA fused engine ----------------
    from ecwam_tpu.ops import propagation_fused as pfz
    xb = fp._xla_bundle()

    @jax.jit
    def adv_pair(f):
        fk2 = fp.advect_srl(f, fp.bundle)
        fr = pfz.refresh_wraps(f[:, :L], xb["dev"])
        fx2 = _advect_xla_srl(fp, fr, xb)
        return fk2, fx2

    ak, ax = adv_pair(f_srl)
    adv_k, adv_x = np.asarray(ak), np.asarray(ax)
    a_scale = max(abs(adv_x).max(), 1e-30)
    adv_max = float(np.abs(adv_k[:, :L] - adv_x[:, :L]).max() / a_scale)

    print(json.dumps({"grid": grid,
                      "phys_max_rel": phys_max,
                      "stress_max_rel": s_max,
                      "adv_max_rel": adv_max}))


if __name__ == "__main__":
    main()
