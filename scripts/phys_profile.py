"""On-TPU physics-kernel stage profiler.

Builds a small fused model, then times the SRL physics kernel with
individual chain stages stubbed out (monkeypatched before the kernel
trace).  The difference vs the full kernel attributes time per stage.

Run on the real device (NO JAX_PLATFORMS=cpu):
    python scripts/phys_profile.py [grid] [stage ...]

Stages: full nodia nosinput nosdissip nostresso noairsea nomeans
"""

import functools
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
    stages = sys.argv[2:] or ["full", "nodia", "nosinput", "nosdissip",
                              "nostresso"]

    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.model import preset, stepper as stepper_mod
    from ecwam_tpu.model.fusedstep import FusedPropagation

    nang, nfre, nfre_red = 36, 36, 29
    t0 = time.time()
    ms = setup_mod.build_model(
        grid_name=grid, nang=nang, nfre=nfre, nfre_red=nfre_red,
        idelpro=450.0, idelt=900.0, pad_to=8192, dtype=jnp.float32,
        weights_mode="fused")
    ft = ms.fused
    print(f"built {grid} in {time.time()-t0:.0f}s n_real={ms.n_real} "
          f"nsrl={ft.nsrl}", flush=True)
    fp = FusedPropagation(ms)
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
    env2d.block_until_ready()

    L = nang * nfre_red
    LPb = fp.LP
    LT = nang * (nfre - nfre_red)
    LTP = -(-LT // 128) * 128 if LT else 0
    fpk, alphaj = preset.peak(wswave, 50000.0, 0.2)
    et = np.asarray(preset.jonswap_1d(ms.tb.fr, fpk, alphaj,
                                      3.0, 0.07, 0.09), np.float32)
    st_sp = np.asarray(preset.spread(ms.tb.th, wdwave), np.float32)
    src = np.asarray(ft.srl_src)
    fll = np.zeros((n + 1, LPb), np.float32)
    np.einsum("nk,nm->nkm", st_sp, et[:, :nfre_red],
              out=fll[:n, :L].reshape(n, nang, nfre_red))
    f_srl0 = jnp.asarray(fll[src])
    tail0 = None
    if LT:
        tl = np.zeros((n + 1, LTP), np.float32)
        np.einsum("nk,nm->nkm", st_sp, et[:, nfre_red:],
                  out=tl[:n, :LT].reshape(n, nang, nfre - nfre_red))
        tail0 = jnp.asarray(tl[src])
    f_srl0.block_until_ready()

    probe = jax.jit(lambda a: a.reshape(-1)[0])

    def sync(x):
        jax.block_until_ready(x)
        return float(jax.device_get(probe(jax.tree.leaves(x)[0])))

    from ecwam_tpu.ops.physics import dia as dia_mod
    from ecwam_tpu.ops.physics import sinput as sinput_mod
    from ecwam_tpu.ops.physics import sdissip as sdissip_mod
    from ecwam_tpu.ops.physics import stress as stress_mod
    from ecwam_tpu.ops.physics import airsea as airsea_mod

    orig = dict(
        snonlin=dia_mod.snonlin,
        sinput_ard=sinput_mod.sinput_ard,
        sdissip_ard=sdissip_mod.sdissip_ard,
        stresso=stress_mod.stresso,
        airsea=airsea_mod.airsea,
    )

    def stub_snonlin(fl1, fld, sl, *a, **kw):
        return fld, sl

    def stub_sinput(fl1, wavnum, cinv, xk2cg, wdwave, wswave, ufric, z0m,
                    coswdif, sinwdif2, raorw, wstar, rnfac, tb, params,
                    **kw):
        z = fl1 * 1.0e-6
        return z, z, z, jnp.ones_like(fl1)

    def stub_sdissip(fl1, fld, sl, *a, **kw):
        return fld, sl

    def stub_stresso(fl1, sl, spos, cinv, mij, rhowgdfth, wdwave, ufric,
                     z0m, aird, rnfac, coswdif, sinwdif2, tb, params,
                     **kw):
        u2 = ufric * ufric
        return 0.1 * u2, wdwave, u2

    def stub_airsea(wswave, wdwave, tauw, tauwdir, ufric, params, **kw):
        z = jnp.full_like(wswave, 1.0e-4)
        return wswave, ufric, z, z, z * 100.0

    patches = {
        "full": {},
        "nodia": {"snonlin": stub_snonlin},
        "nosinput": {"sinput_ard": stub_sinput},
        "nosdissip": {"sdissip_ard": stub_sdissip},
        "nostresso": {"stresso": stub_stresso},
        "noairsea": {"airsea": stub_airsea},
    }

    results = {}
    reps = int(os.environ.get("REPS", "20"))
    for name in stages:
        pat = patches[name]
        for k, v in pat.items():
            mod = {"snonlin": dia_mod, "sinput_ard": sinput_mod,
                   "sdissip_ard": sdissip_mod, "stresso": stress_mod,
                   "airsea": airsea_mod}[k]
            setattr(mod, k, v)
        try:
            if LT:
                @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
                def phys(f_srl, tail, stress6, frc6, denv, env2d):
                    f, s6, tl = fp.phys_srl_pallas(
                        f_srl, stress6, frc6, denv, env2d, tail)
                    return f, tl, s6
                args0 = (f_srl0, tail0, stress6)
            else:
                @functools.partial(jax.jit, donate_argnums=(0, 1))
                def phys(f_srl, stress6, frc6, denv, env2d):
                    f, s6 = fp.phys_srl_pallas(
                        f_srl, stress6, frc6, denv, env2d)
                    return f, None, s6
                args0 = (f_srl0, stress6)
            t0 = time.time()
            if LT:
                f, tl, s6 = phys(f_srl0 + 0.0, tail0 + 0.0,
                                 jax.tree.map(lambda a: a + 0.0, stress6),
                                 frc6, denv, env2d)
            else:
                f, tl, s6 = phys(f_srl0 + 0.0,
                                 jax.tree.map(lambda a: a + 0.0, stress6),
                                 frc6, denv, env2d)
            sync(f)
            print(f"{name}: compile+first {time.time()-t0:.0f}s",
                  flush=True)
            t0 = time.perf_counter()
            for _ in range(reps):
                if LT:
                    f, tl, s6 = phys(f, tl, s6, frc6, denv, env2d)
                else:
                    f, tl, s6 = phys(f, s6, frc6, denv, env2d)
            sync(f)
            dt = (time.perf_counter() - t0) / reps
            results[name] = dt
            print(f"{name}: {dt*1000:.2f} ms", flush=True)
            del f, tl, s6
        finally:
            for k in pat:
                mod = {"snonlin": dia_mod, "sinput_ard": sinput_mod,
                       "sdissip_ard": sdissip_mod, "stresso": stress_mod,
                       "airsea": airsea_mod}[k]
                setattr(mod, k, orig[k])

    print("\n==== stage attribution ====", flush=True)
    base = results.get("full")
    for name, dt in results.items():
        if name == "full" or base is None:
            continue
        print(f"{name[2:]}: {1000*(base-dt):.2f} ms "
              f"({100*(base-dt)/base:.0f}%)", flush=True)
    if base is not None:
        print(f"full: {1000*base:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
