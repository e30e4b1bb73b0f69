"""Pin the Pallas fused-physics kernel against the XLA IMPLSCH chain.

Three layers:
  1. the PALLAS_SAFE trace-mode substitutions (one-hot gathers, unrolled
     sinput scan, per-MC DIA scatter) against the default XLA forms —
     same inputs, plain jit, no Pallas involved;
  2. the compact-layout kernel in interpret mode vs the direct chain;
  3. the SRL-layout kernel (incl. the NFRE>NFRE_RED diagnostic-tail
     split, ecwam_run_model.sh:213-214) vs the compact result.

All f32: the TPU production dtype (the f64 oracle tier pins the XLA
chain itself; these tests pin the kernel against that chain).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import dispersion
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.ops.physics import implsch as impl
from ecwam_tpu.ops.physics import implsch_pallas as ipk
from ecwam_tpu.ops.physics import kernelmode

NANG, NFRE, NPTS = 12, 25, 256
DT = jnp.float32


def _jonswap(tb, hs, fp, wdir):
    fr = tb.fr
    sigma = np.where(fr <= fp, 0.07, 0.09)
    r = np.exp(-((fr - fp) ** 2) / (2 * sigma**2 * fp**2))
    s = (0.0081 * c.G**2 / (2 * np.pi) ** 4 * fr**-5
         * np.exp(-1.25 * (fp / fr) ** 4) * 3.3**r)
    spread = np.maximum(np.cos(tb.th - wdir), 0.0) ** 2
    spread = spread / (np.sum(spread) * tb.delth)
    f2d = spread[:, None] * s[None, :]
    em = np.sum(f2d * tb.dfim[None, :])
    return f2d * (hs / 4.0) ** 2 / em


def _problem(nang=NANG, nfre=NFRE, npts=NPTS, *, iphys=1, seed=0,
             idelt=900.0, **cfg_kw):
    tb = build_spectral_tables(nang=nang, nfre=nfre)
    params = pp.set_phys_params(iphys=iphys, nang=nang)
    cfg = impl.make_physics_config(tb, params, idelt=idelt, **cfg_kw)
    rng = np.random.default_rng(seed)
    depth = np.where(rng.random(npts) < 0.3,
                     20.0 + 200.0 * rng.random(npts),
                     dispersion.BATHYMAX)
    props = dispersion.depth_properties(depth, tb.fr)
    env = {k: jnp.asarray(v.T, DT) for k, v in props.items()}
    env["depth"] = jnp.asarray(depth, DT)
    env["emaxdpt"] = jnp.asarray(
        dispersion.depth_limited_energy(depth), DT)
    fl = np.empty((nang, nfre, npts), np.float32)
    for p in range(npts):
        fl[:, :, p] = _jonswap(tb, 0.5 + 4.0 * rng.random(),
                               0.06 + 0.1 * rng.random(),
                               rng.random() * 2 * np.pi)
    fl1 = jnp.asarray(fl, DT)
    frc = dict(
        wswave=jnp.asarray(3.0 + 15.0 * rng.random(npts), DT),
        wdwave=jnp.asarray(rng.random(npts) * 2 * np.pi, DT),
        aird=jnp.full(npts, 1.225, DT),
        wstar=jnp.asarray(0.2 * rng.random(npts), DT),
        cicover=jnp.asarray(
            np.where(rng.random(npts) < 0.1, 0.7, 0.0), DT),
        cithick=jnp.asarray(
            np.where(rng.random(npts) < 0.1, 0.5, 0.0), DT))
    stress = dict(
        ufric=jnp.asarray(0.2 + 0.4 * rng.random(npts), DT),
        tauw=jnp.asarray(0.02 * rng.random(npts), DT),
        tauwdir=frc["wdwave"],
        z0m=jnp.full(npts, 1e-4, DT),
        z0b=jnp.zeros(npts, DT),
        chrnck=jnp.full(npts, 0.018, DT))
    return tb, cfg, env, fl1, frc, stress


def _direct(cfg, env, fl1, frc, stress, *, safe=False):
    # env/frc/stress ride as jit ARGUMENTS: closed-over device arrays
    # become baked constants that XLA constant-folds with different
    # codegen than the runtime ops, which perturbs f32 results enough
    # (through the DIA cancellations) to defeat exact comparisons
    def run(fl1, env, frc, stress):
        if safe:
            with kernelmode.pallas_safe():
                return impl.implsch(cfg, fl1, env, frc, **stress)
        return impl.implsch(cfg, fl1, env, frc, **stress)
    return jax.jit(run)(fl1, env, frc, stress)


@pytest.mark.parametrize("iphys", [1, 0])
def test_pallas_safe_substitutions_match_xla_forms(iphys):
    # f32 tolerance is loose: the per-MC DIA accumulation order differs
    # from the einsum projection, and sub-ulp DIA differences amplify
    # through the semi-implicit update near cancellation points.  The
    # exact algebraic pin is the f64 test below (1e-11).
    tb, cfg, env, fl1, frc, stress = _problem(iphys=iphys)
    out_ref, st_ref = _direct(cfg, env, fl1, frc, stress)
    out_safe, st_safe = _direct(cfg, env, fl1, frc, stress, safe=True)
    np.testing.assert_allclose(np.asarray(out_safe), np.asarray(out_ref),
                               rtol=2e-2, atol=1e-7)
    for k in ("ufric", "tauw", "z0m", "emean", "fmean", "mij",
              "ustokes"):
        np.testing.assert_allclose(
            np.asarray(st_safe[k]), np.asarray(st_ref[k]),
            rtol=2e-2, atol=1e-7, err_msg=k)
    # flux diagnostics difference large source integrals — reorder noise
    # is amplified; looser check only
    np.testing.assert_allclose(
        np.asarray(st_safe["phiocd"]), np.asarray(st_ref["phiocd"]),
        rtol=0.15, atol=1e-2, err_msg="phiocd")


def test_snonlin_mc_loop_matches_projection_f64():
    # the strong pin: in f64 the per-MC static-scatter loop and the
    # einsum projection agree to reordering noise (~1e-11 relative)
    from ecwam_tpu.ops.physics import dia as dia_mod
    tb, cfg, env, fl1, frc, stress = _problem(npts=64)
    f64 = jnp.float64
    fl1 = fl1.astype(f64)
    wav, dep = env["wavnum"].astype(f64), env["depth"].astype(f64)
    fld = jnp.zeros_like(fl1)
    sl = jnp.zeros_like(fl1)
    akmean = jnp.full(fl1.shape[-1], 0.05, f64)
    ref = jax.jit(lambda f: dia_mod.snonlin(
        f, fld, sl, wav, dep, akmean, tb, cfg.dia))(fl1)

    def safe(f):
        with kernelmode.pallas_safe():
            return dia_mod.snonlin(f, fld, sl, wav, dep, akmean, tb,
                                   cfg.dia)
    got = jax.jit(safe)(fl1)
    for a, b, nm in ((got[0], ref[0], "fld"), (got[1], ref[1], "sl")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-14, err_msg=nm)


@pytest.mark.parametrize("full", [False, True])
def test_kernel_compact_interpret_matches_direct(full):
    tb, cfg, env, fl1, frc, stress = _problem()
    _check_kernel_vs_direct(tb, cfg, env, fl1, frc, stress, full)


def test_kernel_isnonlin2_interpret_matches_direct():
    """ISNONLIN=2 (PEAK_ANG spread enhancement, snonlin.F90:151-165)
    through the kernel — the last physics option to lower via Mosaic
    (one-hot argmax + masked frequency selects; VERDICT r4 next #8)."""
    tb, cfg, env, fl1, frc, stress = _problem(isnonlin=2)
    _check_kernel_vs_direct(tb, cfg, env, fl1, frc, stress, False)


def test_kernel_llgcbz0_cy49_interpret_matches_direct():
    """cy49r1-class physics (LLGCBZ0 gravity-capillary closure +
    LLNORMAGAM + LLCAPCHNK) through the fused kernel."""
    from ecwam_tpu.core import physparams as pp2
    from ecwam_tpu.core.spectral import build_spectral_tables
    tb2 = build_spectral_tables(nang=NANG, nfre=NFRE)
    params = pp2.set_phys_params(iphys=1, nang=NANG, llgcbz0=True,
                                 llnormagam=True, llcapchnk=True)
    cfg = impl.make_physics_config(tb2, params, idelt=900.0)
    tb, _, env, fl1, frc, stress = _problem()
    _check_kernel_vs_direct(tb2, cfg, env, fl1, frc, stress, False)


def _check_kernel_vs_direct(tb, cfg, env, fl1, frc, stress, full):
    out_ref, st_ref = _direct(cfg, env, fl1, frc, stress, safe=True)
    env2d = ipk.pack_env(env, tb.nfre, DT)
    scal = ipk.pack_scal(frc, stress, env, NPTS, DT)
    res = ipk.implsch_pallas(cfg, fl1, env2d, scal, full=full,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(res[0]), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-12)
    st = ipk.unpack_scal_out(res[1], full=full)
    for k in ipk.SCAL_OUT_MIN:
        np.testing.assert_allclose(np.asarray(st[k]),
                                   np.asarray(st_ref[k]),
                                   rtol=1e-6, atol=1e-12, err_msg=k)
    if full:
        np.testing.assert_allclose(np.asarray(st["mij"]),
                                   np.asarray(st_ref["mij"]))
        np.testing.assert_allclose(np.asarray(st["phiocd"]),
                                   np.asarray(st_ref["phiocd"]),
                                   rtol=1e-5, atol=1e-9)
        np.testing.assert_allclose(np.asarray(res[2]),
                                   np.asarray(st_ref["xllws"]),
                                   atol=1e-12)


def _srl_order(npts, nsrl, seed=3):
    """A fake SRL row map: every row sources some point (with dups)."""
    rng = np.random.default_rng(seed)
    src = np.arange(nsrl) % npts
    rng.shuffle(src)
    return src


@pytest.mark.parametrize("nfre_red", [NFRE, 20])
def test_kernel_srl_interpret_matches_compact(nfre_red):
    tb, cfg, env, fl1, frc, stress = _problem()
    out_ref, st_ref = _direct(cfg, env, fl1, frc, stress, safe=True)

    nsrl = NPTS + 128            # wrap/pad duplicates
    src = _srl_order(NPTS, nsrl)
    L = NANG * nfre_red
    LP = -(-L // 128) * 128
    fl_np = np.asarray(fl1)
    rows = fl_np.transpose(2, 0, 1).reshape(NPTS, NANG * NFRE)
    # k-major (nang, nfre) flattening; advected block = first nfre_red
    rows3 = fl_np.transpose(2, 0, 1)          # (npts, nang, nfre)
    body = rows3[:, :, :nfre_red].reshape(NPTS, L)
    f_srl = np.zeros((nsrl, LP), np.float32)
    f_srl[:, :L] = body[src]
    tail = None
    if nfre_red < NFRE:
        lt = NANG * (NFRE - nfre_red)
        ltp = -(-lt // 128) * 128
        tail = np.zeros((nsrl, ltp), np.float32)
        tail[:, :lt] = rows3[:, :, nfre_red:].reshape(NPTS, lt)[src]
        tail = jnp.asarray(tail)
    env_s = {k: jnp.asarray(np.asarray(v)[..., src], DT)
             for k, v in env.items()}
    frc_s = {k: jnp.asarray(np.asarray(v)[src], DT)
             for k, v in frc.items()}
    stress_s = {k: jnp.asarray(np.asarray(v)[src], DT)
                for k, v in stress.items()}
    env2d = ipk.pack_env(env_s, tb.nfre, DT)
    scal = ipk.pack_scal(frc_s, stress_s, env_s, nsrl, DT)

    res = ipk.implsch_pallas_srl(
        cfg, jnp.asarray(f_srl), env2d, scal, tail,
        nang=NANG, nfre_red=nfre_red, interpret=True)
    out_body = np.asarray(res[0])[:, :L]
    ref_body = np.asarray(out_ref).transpose(2, 0, 1)[
        :, :, :nfre_red].reshape(NPTS, L)[src]
    np.testing.assert_allclose(out_body, ref_body, rtol=1e-6, atol=1e-12)
    st = ipk.unpack_scal_out(res[1], full=False)
    np.testing.assert_allclose(np.asarray(st["tauw"]),
                               np.asarray(st_ref["tauw"])[src],
                               rtol=1e-6, atol=1e-12)
    if tail is not None:
        lt = NANG * (NFRE - nfre_red)
        got_tail = np.asarray(res[2])[:, :lt]
        ref_tail = np.asarray(out_ref).transpose(2, 0, 1)[
            :, :, nfre_red:].reshape(NPTS, lt)[src]
        np.testing.assert_allclose(got_tail, ref_tail,
                                   rtol=1e-6, atol=1e-12)


def test_minimal_config_prognostics_match_full():
    tb, cfg, env, fl1, frc, stress = _problem()
    out_full, st_full = _direct(cfg, env, fl1, frc, stress)
    cfg_min = ipk.minimal_config(cfg)
    out_min, st_min = _direct(cfg_min, env, fl1, frc, stress)
    np.testing.assert_array_equal(np.asarray(out_min),
                                  np.asarray(out_full))
    for k in ipk.STRESS_KEYS:
        np.testing.assert_array_equal(np.asarray(st_min[k]),
                                      np.asarray(st_full[k]))
