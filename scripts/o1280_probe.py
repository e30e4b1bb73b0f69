"""Build O1280 FOR REAL and compile its worst 8-way shard (VERDICT r4
missing #2).

Phase 1 (host): build the full O1280 fused model tables end-to-end
(grid → sea-point block → stencil → fused SRL tables → dispersion env),
with on-disk caching, and time it.

Phase 2 (relay): slice the real tables to the WORST shard of an 8-way
1-D row-band decomposition, pack the Pallas advection tables, and
AOT-compile BOTH production kernels (advection + fused IMPLSCH physics,
operational 36×36/29 spectrum) at that shard's true shape, recording
the compiled memory analysis against v5e HBM.

Writes O1280_PROBE.json at the repo root — the committed artifact.

    python scripts/o1280_probe.py
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

HBM_BYTES = 15.75e9
NANG, NFRE, NFRE_RED = 36, 36, 29


def worst_shard_rows(row_cnt, S, WD, n_shards=8):
    """Worst shard (rows incl pads, sea points) of an 8-way row-band
    split — same construction as tests/test_hbm_budget.py."""
    npts = int(row_cnt.sum())
    csum = np.concatenate([[0], np.cumsum(row_cnt)])
    targets = npts * (np.arange(1, n_shards) / n_shards)
    cuts = np.searchsorted(csum, targets)
    bounds = np.concatenate([[0], cuts, [len(row_cnt)]])
    best = (0, 0, 0, 0)
    for s in range(n_shards):
        lo = max(int(bounds[s]) - 1, 0)
        hi = min(int(bounds[s + 1]) + 1, len(row_cnt))
        seg = row_cnt[lo:hi]
        row_len = ((seg + 2 * WD + S - 1) // S) * S
        rows = int(row_len.sum()) + 3 * S
        size = int(csum[int(bounds[s + 1])] - csum[int(bounds[s])])
        if rows > best[0]:
            best = (rows, size, lo, hi)
    return best


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.ops import propagation_fused as pfz
    from ecwam_tpu.ops import propagation_pallas as pk
    from ecwam_tpu.ops.physics import implsch_pallas as ipk
    from ecwam_tpu.model import fusedstep as fstep

    out = {"grid": "O1280", "nang": NANG, "nfre": NFRE,
           "nfre_red": NFRE_RED}

    t0 = time.time()
    ms = setup_mod.build_model(
        grid_name="O1280", nang=NANG, nfre=NFRE, nfre_red=NFRE_RED,
        idelpro=450.0, idelt=900.0, pad_to=8192, dtype=jnp.float32,
        weights_mode="fused", env_on_device=False,
        cache_dir=os.path.join(ROOT, ".table_cache"))
    out["build_seconds"] = round(time.time() - t0, 1)
    ft = ms.fused
    out["sea_points"] = int(ms.n_real)
    out["nsrl_total"] = int(ft.nsrl)
    print(f"[o1280] built in {out['build_seconds']}s: "
          f"n_real={ms.n_real} nsrl={ft.nsrl} S={ft.S} EW={ft.EW}",
          flush=True)

    # ---- worst 8-shard shape from the REAL row structure -------------
    row_cnt = np.asarray(ms.grid.nlonrgg, np.int64)
    WD = ft.WD
    rows, size, lo, hi = worst_shard_rows(row_cnt, ft.S, WD)
    # round rows to a block multiple for the kernel grid
    nsrl_loc = -(-rows // ft.S) * ft.S
    nsrl_loc = min(nsrl_loc, (ft.nsrl // ft.S) * ft.S)
    out["worst_shard"] = {"rows": int(nsrl_loc), "sea_points": int(size),
                          "lat_rows": [int(lo), int(hi)]}
    print(f"[o1280] worst shard: {nsrl_loc} SRL rows, {size} pts",
          flush=True)

    # ---- slice the real tables to the shard and pack -----------------
    t0 = time.time()
    sl = slice(0, nsrl_loc)
    dtf = np.full(NFRE_RED, 450.0)
    lc_np = pfz.lane_consts(ms.tb, dtf, NFRE_RED)
    src_np = dict(
        taps_dn=ft.taps_dn[sl], taps_up=ft.taps_up[sl],
        sea_own=ft.sea_own[sl], cgland=ft.cgland[sl],
        geom=ft.geom[sl], valid=ft.valid[sl], obs=ft.obs[sl])
    nblocks_loc = nsrl_loc // ft.S
    dn_base = np.asarray(ft.dn_base)[:nblocks_loc - 1]
    up_base = np.asarray(ft.up_base)[:nblocks_loc - 1]
    cg_srl = np.asarray(ms.fused_env["cg_srl"])[sl]
    tabs = pk.pack_tables(
        src_np, lc_np, cg_srl, ms.fused_env["cg_land"],
        dn_base, up_base, S=ft.S, EW=ft.EW, nang=NANG, nfre=NFRE_RED,
        nsrl=nsrl_loc, dtype=jnp.float32, as_numpy=True)
    fratio = tabs.pop("fratio")
    out["pack_seconds"] = round(time.time() - t0, 1)
    print(f"[o1280] shard tables packed in {out['pack_seconds']}s",
          flush=True)

    # ---- AOT-compile both kernels at the shard shape -----------------
    sds = jax.ShapeDtypeStruct
    L = NANG * NFRE_RED
    LP = -(-L // 128) * 128
    LT = NANG * (NFRE - NFRE_RED)
    LTP = -(-LT // 128) * 128

    def abstract(tree):
        return jax.tree.map(
            lambda a: sds(a.shape, a.dtype) if hasattr(a, "shape")
            else a, tree)

    def adv(f, tabs):
        from ecwam_tpu.ops import propagation_fused as pfz2
        f = pfz2.refresh_wraps(f, {"wrap_pos": jnp.zeros(8, jnp.int32),
                                   "wrap_from": jnp.zeros(8, jnp.int32)})
        return pk.advect_pallas(
            f, tabs, nang=NANG, nfre=NFRE_RED, irefra=0, S=ft.S,
            EW=ft.EW, fratio=float(fratio))

    import functools
    jadv = jax.jit(adv, donate_argnums=(0,))
    t0 = time.time()
    ma = jadv.lower(sds((nsrl_loc, LP), jnp.float32),
                    abstract(tabs)).compile().memory_analysis()
    adv_mem = {k: float(getattr(ma, k)) for k in
               ("argument_size_in_bytes", "output_size_in_bytes",
                "temp_size_in_bytes", "alias_size_in_bytes")}
    out["adv_compile_seconds"] = round(time.time() - t0, 1)
    out["mem_analysis_adv"] = adv_mem
    print(f"[o1280] adv compiled in {out['adv_compile_seconds']}s: "
          f"{ {k: round(v/1e9, 2) for k, v in adv_mem.items()} }",
          flush=True)

    cfg_min = ipk.minimal_config(ms.phys)

    def phys(f, tail, scal, env2d):
        return ipk.implsch_pallas_srl(
            cfg_min, f, env2d, scal, tail,
            nang=NANG, nfre_red=NFRE_RED, full=False, tile=128)

    jphys = jax.jit(phys, donate_argnums=(0, 1))
    nsi = len(ipk.SCAL_IN)
    t0 = time.time()
    ma = jphys.lower(
        sds((nsrl_loc, LP), jnp.float32),
        sds((nsrl_loc, LTP), jnp.float32),
        sds((nsi, nsrl_loc), jnp.float32),
        sds((len(ipk.ENV_FIELDS) * NFRE, nsrl_loc), jnp.float32),
    ).compile().memory_analysis()
    phys_mem = {k: float(getattr(ma, k)) for k in
                ("argument_size_in_bytes", "output_size_in_bytes",
                 "temp_size_in_bytes", "alias_size_in_bytes")}
    out["phys_compile_seconds"] = round(time.time() - t0, 1)
    out["mem_analysis_phys"] = phys_mem
    print(f"[o1280] phys compiled in {out['phys_compile_seconds']}s: "
          f"{ {k: round(v/1e9, 2) for k, v in phys_mem.items()} }",
          flush=True)

    # ---- HBM verdict -------------------------------------------------
    # resident: state (aliased out) + tail + tables + env/scal rows;
    # transient peak adds the advection temp (the refreshed window copy)
    tables_b = sum(v.nbytes for v in tabs.values()
                   if hasattr(v, "nbytes"))
    state_b = nsrl_loc * (LP + LTP) * 4
    rows_b = nsrl_loc * (nsi + 3 * NFRE + 2 * 6) * 4
    peak = (state_b + tables_b + rows_b
            + adv_mem["temp_size_in_bytes"])
    out["resident_bytes"] = state_b + tables_b + rows_b
    out["peak_bytes_model"] = peak
    out["hbm_bytes"] = HBM_BYTES
    out["fits_hbm"] = bool(peak < HBM_BYTES)
    print(f"[o1280] peak model {peak/1e9:.2f} GB vs HBM "
          f"{HBM_BYTES/1e9:.2f} GB -> fits={out['fits_hbm']}",
          flush=True)

    with open(os.path.join(ROOT, "O1280_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
