"""Step bundle for the fused (single-pass weights+stencil) propagation.

Drives ops/propagation_fused.py: the model state stays in the compact
(nang, nfre, n_pad) layout; each advection step gathers it into the
segmented row layout (SRL), runs the fused CTU pass(es) — one all-band
pass with per-frequency Δt plus the extra fast-wave substeps
(propag_wam.F90:247-313) — and scatters back.

Refraction inputs (θ̇/σ̇ gradient coefficients, propdot.F90:60-150) and
the CFL current-retry mask (ctuw.F90:114-123) are recomputed only on
:meth:`refresh` (the reference's LUPDTWGHT), not per step.  All device
arrays travel in a ``bundle`` pytree passed as a jit argument — never as
closure constants — and every table is packed host-side in numpy with a
single push (on a relay-attached accelerator each eager device op costs
a remote compile).

On TPU/f32 the Pallas kernel backend is selected; it works on
lane-padded (nsrl, LP) state (LP = 128-multiple of nang·nfre).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ecwam_tpu.ops import propagation as prop
from ecwam_tpu.ops import propagation_fused as pfz
from ecwam_tpu.ops.physics import implsch_pallas as ipk


def default_backend(dtype) -> str:
    """'pallas' on real TPU devices for f32, else 'xla'."""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return "xla"
    if plat in ("tpu", "axon") and dtype == jnp.float32:
        return "pallas"
    return "xla"


# windsea/swell separation keys precomputed by the chunked full step
SEP_KEYS = ("eswell", "fswell", "thswell", "p1swell", "p2swell",
            "sprdswell", "esea", "fsea", "thwisea", "p1sea", "p2sea",
            "sprdsea")


def full_chunked_rows(cfg, tb, f_srl, tail, scal_all, env2d, *,
                      nang: int, nfre_red: int, tile: int = 128,
                      interpret: bool = False, chunk: int = 65536):
    """Full-diagnostics physics over SRL rows, CHUNKED — the engine
    behind :meth:`FusedPropagation.phys_srl_full_chunked`, also used
    per shard inside the sharded step (the O1280/8 output-date HBM
    fit): integrates row chunks in place and consumes each chunk's
    xllws immediately via the windsea separation.

    Returns (f_srl, tail, state) — state has the SCAL_OUT_FULL rows
    (mij as int32) plus ``sep`` (dict of per-point rows).
    """
    import jax.lax as lax
    from ecwam_tpu.io import products as products_mod

    nfre = tb.nfre
    L = nang * nfre_red
    lt = nang * (nfre - nfre_red)
    nsrl, LP = f_srl.shape
    dt = f_srl.dtype
    nso = len(ipk.SCAL_OUT_FULL)
    i_uf = ipk.SCAL_OUT_FULL.index("ufric")

    C = max(min(chunk, nsrl) // tile, 1) * tile
    nch = nsrl // C
    rem = nsrl - nch * C
    nsi = scal_all.shape[0]
    nenv = env2d.shape[0]

    def run_chunk(f_c, tail_c, scal_c, env_c):
        res = ipk.implsch_pallas_srl(
            cfg, f_c, env_c, scal_c, tail_c,
            nang=nang, nfre_red=nfre_red, full=True, tile=tile,
            interpret=interpret)
        f_new, scal_out = res[0], res[1]
        tail_new = res[2] if tail_c is not None else None
        xllws = res[-1]                        # (nang, nfre, Cc)
        cc = f_new.shape[0]
        fl = jnp.transpose(f_new, (1, 0))[:L].reshape(
            nang, nfre_red, cc)
        if tail_c is not None:
            tl3 = jnp.transpose(tail_new, (1, 0))[:lt].reshape(
                nang, nfre - nfre_red, cc)
            fl = jnp.concatenate([fl, tl3], axis=1)
        cinv_c = env_c[nfre:2 * nfre]
        sep = products_mod.sepwisw(
            fl, xllws, cinv_c, scal_out[i_uf],
            scal_c[0], scal_c[1], tb)
        sep_rows = jnp.stack(
            [sep[k] for k in SEP_KEYS]).astype(dt)
        return f_new, tail_new, scal_out, sep_rows

    state_rows = jnp.zeros((nso, nsrl), dt)
    sep_rows = jnp.zeros((len(SEP_KEYS), nsrl), dt)

    def body(i, carry):
        f_srl, tail, state_rows, sep_rows = carry
        s = i * C
        f_c = lax.dynamic_slice(f_srl, (s, 0), (C, LP))
        tail_c = (lax.dynamic_slice(tail, (s, 0), (C, tail.shape[1]))
                  if tail is not None else None)
        scal_c = lax.dynamic_slice(scal_all, (0, s), (nsi, C))
        env_c = lax.dynamic_slice(env2d, (0, s), (nenv, C))
        f_new, tail_new, scal_out, sep_c = run_chunk(
            f_c, tail_c, scal_c, env_c)
        f_srl = lax.dynamic_update_slice(f_srl, f_new, (s, 0))
        if tail is not None:
            tail = lax.dynamic_update_slice(tail, tail_new, (s, 0))
        state_rows = lax.dynamic_update_slice(
            state_rows, scal_out.astype(dt), (0, s))
        sep_rows = lax.dynamic_update_slice(sep_rows, sep_c, (0, s))
        return f_srl, tail, state_rows, sep_rows

    carry = (f_srl, tail, state_rows, sep_rows)
    if nch:
        carry = jax.lax.fori_loop(0, nch, body, carry)
    f_srl, tail, state_rows, sep_rows = carry
    if rem:
        s = nch * C
        tail_c = tail[s:, :] if tail is not None else None
        f_new, tail_new, scal_out, sep_c = run_chunk(
            f_srl[s:, :], tail_c, scal_all[:, s:], env2d[:, s:])
        f_srl = f_srl.at[s:, :].set(f_new)
        if tail is not None:
            tail = tail.at[s:, :].set(tail_new)
        state_rows = state_rows.at[:, s:].set(scal_out.astype(dt))
        sep_rows = sep_rows.at[:, s:].set(sep_c)

    state = ipk.unpack_scal_out(state_rows, full=True)
    state["sep"] = {k: sep_rows[i] for i, k in enumerate(SEP_KEYS)}
    return f_srl, tail, state


class FusedPropagation:
    """Static config + refreshable device ``bundle`` for the fused step."""

    def __init__(self, setup, backend: str | None = None,
                 interpret: bool = False):
        ft = setup.fused
        if ft is None:
            raise ValueError("setup was not built with weights_mode='fused'")
        self.setup = setup
        self.ft = ft
        tb = setup.tb
        self.nang = tb.nang
        self.nfre_red = tb.nfre_red
        self.L = self.nang * self.nfre_red
        self.LP = -(-self.L // 128) * 128
        dt = self.dtype = setup.dtype
        self.backend = backend or default_backend(dt)
        self.interpret = interpret

        dev = pfz.device_tables(ft, dt,
                                weights=(self.backend != 'pallas'))
        fs = np.asarray(ft.from_srl)
        pad = np.full(setup.n_pad - ft.npts, fs[0] if fs.size else 0,
                      fs.dtype)
        from_srl_pad = jnp.asarray(np.concatenate([fs, pad]), jnp.int32)

        fe = setup.fused_env
        if fe is None:
            raise ValueError("setup lacks fused_env statics")
        self.fe = fe
        cg_srl = jnp.asarray(fe["cg_srl"], dt)
        cg_land = jnp.asarray(fe["cg_land"], dt)
        if setup.irefra:
            dev["pf"] = jnp.asarray(fe["pf"], dt)

        dtf = np.full(self.nfre_red, setup.idelpro)
        if setup.ifrelfmax > 0:
            dtf[: setup.ifrelfmax] = setup.delpro_lf
        self.lc_np = pfz.lane_consts(tb, dtf, self.nfre_red)
        lc = _cast_lc(self.lc_np, dt)
        self.nsub = (max(1, round(setup.idelpro / setup.delpro_lf))
                     if setup.ifrelfmax > 0 else 1)
        # with σ̇ frequency shifting the sub-band carries ONE extra
        # read-only frequency so the m+1 coupling at the band edge sees
        # the once-advected high-band value (propag_wam.F90:262-265
        # ND3EF1 = IFRELFMAX+1); its own output is discarded
        self.mlf_w = (setup.ifrelfmax + 1
                      if setup.irefra in (2, 3) and setup.ifrelfmax
                      else setup.ifrelfmax)
        lc_lo = None
        self.lc_lo_np = None
        if self.nsub > 1:
            dtl = np.full(self.mlf_w, setup.delpro_lf)
            self.lc_lo_np = pfz.lane_consts(tb, dtl, self.mlf_w)
            lc_lo = _cast_lc(self.lc_lo_np, dt)

        self.bundle = dict(dev=dev, cg_srl=cg_srl, cg_land=cg_land,
                           lc=lc, lc_lo=lc_lo, from_srl_pad=from_srl_pad)
        self.refresh()

    # -- LUPDTWGHT / GETCURR ------------------------------------------
    def refresh(self, ucur=None, vcur=None):
        """Recompute current/refraction inputs + the CFL retry mask.
        ``ucur``/``vcur`` are compact (n_pad,) arrays (GETCURR)."""
        setup = self.setup
        dev = dict(self.bundle["dev"])
        src = np.asarray(self.ft.srl_src)
        u_ext = v_ext = None
        uv_np = grads_np = None
        if setup.irefra in (2, 3):
            if ucur is not None:
                u_ext = np.concatenate(
                    [np.asarray(ucur, np.float64)[:setup.n_pad], [0.0]])
                v_ext = np.concatenate(
                    [np.asarray(vcur, np.float64)[:setup.n_pad], [0.0]])
            else:
                u_ext = np.asarray(setup.env["ucur_ext"], np.float64)
                v_ext = np.asarray(setup.env["vcur_ext"], np.float64)
            uv_np = np.stack([u_ext[src], v_ext[src]], axis=-1)
            dev["uv"] = jnp.asarray(uv_np, self.dtype)

        if setup.irefra:
            zeros = np.zeros(setup.n_pad + 1)
            g = {k: np.asarray(v, np.float64) for k, v in prop.gradi(
                setup.stencil,
                np.asarray(self.fe["depth_ext"], np.float64),
                u_ext if u_ext is not None else zeros,
                v_ext if v_ext is not None else zeros,
                setup.irefra).items()}
            dco = np.asarray(setup.stencil.cosphm1_pt, np.float64)
            omdd = np.zeros(setup.n_pad)
            if setup.irefra == 3:
                omdd = (v_ext[:setup.n_pad] * g["ddphi"]
                        + u_ext[:setup.n_pad] * g["ddlam"] * dco)
            grads = np.zeros((setup.n_pad + 1, 8))
            grads[:-1, 0] = g["ddphi"]
            grads[:-1, 1] = g["ddlam"] * dco
            grads[:-1, 2] = g["duphi"]
            grads[:-1, 3] = g["dvphi"]
            grads[:-1, 4] = g["dulam"] * dco
            grads[:-1, 5] = g["dvlam"] * dco
            grads[:-1, 6] = omdd
            grads_np = grads[src]
            dev["grads"] = jnp.asarray(grads_np, self.dtype)

        self.bundle = dict(self.bundle, dev=dev)
        if setup.irefra in (2, 3):
            # CFL current-retry (ctuw.F90:114-123): disable the current
            # terms wherever the first-pass CFL check fails
            _, cfl = _advect_xla_srl(
                self, jnp.zeros((self.ft.nsrl, self.L), self.dtype),
                self._xla_bundle(), with_cfl=True)
            mask = 1.0 - np.asarray(cfl, np.float64)
            grads_np = grads_np.copy()
            grads_np[:, 2:7] *= mask[:, None]
            dev = dict(self.bundle["dev"])
            dev["grads"] = jnp.asarray(grads_np, self.dtype)
            self.bundle = dict(self.bundle, dev=dev)

        if self.backend == "pallas":
            from ecwam_tpu.ops import propagation_pallas as pk
            ft, fe = self.ft, self.fe
            src_np = dict(taps_dn=ft.taps_dn, taps_up=ft.taps_up,
                          sea_own=ft.sea_own, cgland=ft.cgland,
                          geom=ft.geom, valid=ft.valid, obs=ft.obs)
            if setup.irefra:
                src_np["pf"] = fe["pf"]
            if uv_np is not None:
                src_np["uv"] = uv_np
            if grads_np is not None:
                src_np["grads"] = grads_np
            tabs = pk.pack_tables(
                src_np, self.lc_np, fe["cg_srl"], fe["cg_land"],
                ft.dn_base, ft.up_base, S=ft.S, EW=ft.EW,
                nang=self.nang, nfre=self.nfre_red, nsrl=ft.nsrl,
                dtype=self.dtype)
            self._fratio = tabs.pop("fratio")
            bundle = dict(self.bundle, pk=tabs)
            if self.nsub > 1:
                mw = self.mlf_w
                src_lo = dict(src_np,
                              obs=np.asarray(ft.obs)[:, :, :mw])
                if "pf" in src_np:
                    src_lo["pf"] = np.asarray(fe["pf"])[:, :, :mw]
                tabs_lo = pk.pack_tables(
                    src_lo, self.lc_lo_np,
                    np.asarray(fe["cg_srl"])[:, :mw],
                    np.asarray(fe["cg_land"])[:mw],
                    ft.dn_base, ft.up_base, S=ft.S, EW=ft.EW,
                    nang=self.nang, nfre=mw, nsrl=ft.nsrl,
                    dtype=self.dtype)
                tabs_lo.pop("fratio")
                bundle["pk_lo"] = tabs_lo
            self.bundle = bundle



    def _xla_bundle(self):
        """A bundle with the full XLA weight tables — the Pallas-backend
        bundle omits them (HBM) — for CFL diagnostics / retry passes."""
        if self.backend != "pallas":
            return self.bundle
        dev = dict(pfz.device_tables(self.ft, self.dtype, weights=True))
        dev.update({k: v for k, v in self.bundle["dev"].items()
                    if k not in dev})
        if self.setup.irefra:
            dev["pf"] = jnp.asarray(self.fe["pf"], self.dtype)
        return dict(self.bundle, dev=dev)

    def cfl_diagnostics(self) -> dict:
        """CHECKCFL equivalent (checkcfl.F90:74-210): largest Courant
        numbers of the east/west, north/south and total-outflow terms
        plus the violating-point count.  With current refraction the
        offending current terms were already zeroed by the CFL retry
        (LLCFLCUROFF role), so remaining violations are genuine
        reduce-IDELPRO errors."""
        _, cfl, (rx, ry, rs) = _advect_xla_srl(
            self, jnp.zeros((self.ft.nsrl, self.L), self.dtype),
            self._xla_bundle(), with_cfl="stats")
        return dict(
            cfl_east_west=float(np.asarray(rx)),
            cfl_north_south=float(np.asarray(ry)),
            max_outflow=float(np.asarray(rs)),
            n_violations=int(np.asarray(jnp.sum(cfl))))

    # -- SRL-resident physics: fused Pallas kernel ----------------------
    @property
    def phys_tile(self) -> int:
        """Point-tile size of the physics kernel (Mosaic lane-blocked
        inputs need a 128-multiple; the kernel row-pads internally when
        the SRL length is not a multiple).  Larger tiles amortize
        per-op overhead across more lanes at the cost of VMEM."""
        import os
        return int(os.environ.get("ECWAVE_PHYS_TILE", "128"))

    def build_phys_srl(self, frc, stress):
        """One-time device build of the SRL-ordered physics inputs.

        Returns (env2d, denv, frc6, stress6):
          env2d (5·nfre, nsrl)  dispersion env rows (static per depth)
          denv  (2, nsrl)       depth/emaxdpt rows (static)
          frc6  (6, nsrl)       forcing rows (rebuild per wind date)
          stress6 (6, nsrl)     stress-state rows (carried step to step)
        Land/pad rows read the benign land slot (finite — NaNs there
        would leak through the advection FIR taps as 0·NaN).
        """
        src = self.bundle["dev"]["srl_src"]
        return _build_phys_srl(self.setup.env, frc, stress, src)

    def frc_srl(self, frc):
        """Forcing rows (6, nsrl) in SRL order (NEWWIND update)."""
        return _frc_srl(frc, self.bundle["dev"]["srl_src"])

    def initial_srl(self, wswave, wdwave, *, fetch: float = 50000.0,
                    frmax: float = 0.2, zgamma: float = 3.0,
                    sa: float = 0.07, sb: float = 0.09):
        """JONSWAP cold start built ON DEVICE directly in the SRL layout
        (MSTART IOPTI=1, preset.F90:634 / mstart.F90:49-80).

        The host path builds the full (nsrl, LP) spectrum in numpy and
        ships ~5 GB through the relay (~10 min at O512); MSTART is
        closed-form per (point, bin), so one jitted kernel writes the
        state straight into device HBM from two (n_pad,) wind rows.

        Returns (f_srl, tail) with ``tail`` None when nfre_red == nfre.
        """
        from ecwam_tpu.model import preset as preset_mod
        tb = self.setup.tb
        nang, nfre, nfre_red = self.nang, tb.nfre, self.nfre_red
        L, LP = self.L, (self.LP if self.backend == "pallas" else self.L)
        LT = nang * (nfre - nfre_red)
        LTP = -(-LT // 128) * 128 if LT else 0
        dt = self.dtype
        fr = np.asarray(tb.fr)
        th = np.asarray(tb.th)
        src = self.bundle["dev"]["srl_src"]

        @functools.partial(jax.jit, static_argnames=("with_tail",))
        def _build(wsw, wdw, src, with_tail):
            ws_ext = jnp.concatenate([jnp.asarray(wsw, dt),
                                      jnp.zeros(1, dt)])
            wd_ext = jnp.concatenate([jnp.asarray(wdw, dt),
                                      jnp.zeros(1, dt)])
            nsrl = src.shape[0]

            def rows(src_c):
                """JONSWAP ⊗ spread rows for a chunk of SRL sources."""
                ws = ws_ext[src_c]
                wd = wd_ext[src_c]
                fpk, alphaj = preset_mod.peak(ws, fetch, frmax, xp=jnp)
                et = preset_mod.jonswap_1d(
                    jnp.asarray(fr, dt), fpk, alphaj, zgamma, sa, sb,
                    xp=jnp)
                st = preset_mod.spread(jnp.asarray(th, dt), wd, xp=jnp)
                cc = src_c.shape[0]

                def pack(et_part, lanes, lanes_pad):
                    body = (st[:, :, None] * et_part[:, None, :]
                            ).reshape(cc, lanes)
                    if lanes_pad > lanes:
                        body = jnp.concatenate(
                            [body,
                             jnp.zeros((cc, lanes_pad - lanes), dt)],
                            axis=1)
                    return body

                f = pack(et[:, :nfre_red], L, LP)
                t = (pack(et[:, nfre_red:], LT, LTP) if with_tail
                     else None)
                return f, t

            # chunked over rows: the whole-field build carries ~10 GB
            # of unfused outer-product temps at O512 (measured compiled
            # memory analysis) — chunking bounds temps to ~0.5 GB
            C = min(65536, nsrl)
            nch = nsrl // C
            rem = nsrl - nch * C
            out = jnp.zeros((nsrl, LP), dt)
            outt = jnp.zeros((nsrl, LTP), dt) if with_tail else None

            def body(i, carry):
                out, outt = carry
                s = i * C
                f, t = rows(jax.lax.dynamic_slice(src, (s,), (C,)))
                out = jax.lax.dynamic_update_slice(out, f, (s, 0))
                if with_tail:
                    outt = jax.lax.dynamic_update_slice(outt, t, (s, 0))
                return out, outt

            out, outt = jax.lax.fori_loop(0, nch, body, (out, outt))
            if rem:
                f, t = rows(src[nch * C:])
                out = out.at[nch * C:, :].set(f)
                if with_tail:
                    outt = outt.at[nch * C:, :].set(t)
            return out, outt

        return _build(wswave, wdwave, src, LT > 0)

    def phys_srl_pallas(self, f_srl, stress6, frc6, denv, env2d,
                        tail=None, *, full: bool = False):
        """One physics step on SRL-resident state via the fused Pallas
        IMPLSCH kernel (ops/physics/implsch_pallas.py) — one spectrum
        read + write instead of the ~30 XLA passes; runs on all SRL rows
        (wrap duplicates compute identical results; pads are finite
        garbage that the advection valid-mask never reads).

        Returns (f_srl, stress6[, tail][, state]) where ``state`` (full
        mode) is the unpacked diagnostics dict in SRL row order.
        """
        cfg = self.setup.phys if full else ipk.minimal_config(
            self.setup.phys)
        scal = jnp.concatenate([frc6, denv, stress6], axis=0)
        res = ipk.implsch_pallas_srl(
            cfg, f_srl, env2d, scal, tail,
            nang=self.nang, nfre_red=self.nfre_red, full=full,
            tile=self.phys_tile,
            interpret=self.interpret or self.backend != "pallas")
        i = 2 + (tail is not None)
        out = [res[0], res[1][:6]]
        if tail is not None:
            out.append(res[2])
        if full:
            state = ipk.unpack_scal_out(res[1], full=True)
            state["xllws"] = res[i]
            out.append(state)
        return tuple(out)

    # windsea/swell separation keys precomputed by the chunked full step
    SEP_KEYS = SEP_KEYS

    def phys_srl_full_chunked(self, f_srl, stress6, frc6, denv, env2d,
                              tail=None, *, chunk: int = 65536):
        """Full-diagnostics physics step chunked over SRL rows — the
        at-scale output-date path (VERDICT r4 missing #3).

        The unchunked full mode materializes xllws at (nang, nfre,
        nsrl) — ~5.9 GB at O512 on top of the fast-path residency,
        which cannot fit chip HBM.  Physics is pure per-point, so this
        variant integrates row chunks in place (dynamic_update_slice on
        the donated SRL buffer) and consumes each chunk's xllws
        IMMEDIATELY: the windsea/swell separation (sepwisw,
        io/products.py — the only xllws consumer) reduces it to 12
        per-point rows inside the loop.  Peak extra memory is one
        chunk's spectra/xllws instead of the whole field.

        Returns (f_srl, stress6[, tail], state) with ``state`` carrying
        the SCAL_OUT_FULL per-point rows plus ``sep`` (dict of per-point
        windsea/swell rows).  The per-bin swell spectrum (swm/flsw,
        consumed only by the host-side swell-train partitioning) is not
        kept — recomputed on demand for small grids.
        """
        scal_all = jnp.concatenate([frc6, denv, stress6], axis=0)
        f_srl, tail, state = full_chunked_rows(
            self.setup.phys, self.setup.tb, f_srl, tail, scal_all,
            env2d, nang=self.nang, nfre_red=self.nfre_red,
            tile=self.phys_tile,
            interpret=self.interpret or self.backend != "pallas",
            chunk=chunk)
        stress6 = jnp.stack([state[k] for k in ipk.STRESS_KEYS]
                            ).astype(f_srl.dtype)
        out = [f_srl, stress6]
        if tail is not None:
            out.append(tail)
        out.append(state)
        return tuple(out)

    def extract_state(self, rows, bundle):
        """Gather canonical points of SRL-ordered per-point rows
        (…, nsrl) → (…, n_pad) (for restart/products extraction)."""
        fsp = bundle["from_srl_pad"]
        return rows[..., fsp]

    # -- SRL-resident physics: chunked XLA fallback ---------------------
    def phys_srl_chunked(self, f_srl, frc, stress, env, bundle, *,
                         chunk: int,
                         state_keys=("ufric", "tauw", "tauwdir", "z0m",
                                     "z0b", "chrnck")):
        """One physics step directly on SRL-resident state.

        The compact round trip (from_srl → chunked implsch → to_srl)
        materializes the full compact spectrum TWICE plus a whole-field
        transpose — ~9 GB of extra peak HBM at 1M-point shapes, which
        is exactly what killed the O512 physics compile.  This variant
        fori-loops over point chunks, gathering each chunk's rows out
        of the SRL buffer, integrating, and scattering the result back
        in place (donate ``f_srl`` for full aliasing).  Only 1-D
        ``state_keys`` are accumulated (the per-bin diagnostics like
        xllws would cost another full field).

        Requires nfre_red == nfre (the SRL carries only the advected
        frequencies).
        """
        import jax.lax as lax
        from ecwam_tpu.ops.physics import implsch as impl

        setup = self.setup
        tb = setup.tb
        if tb.nfre_red != tb.nfre:
            raise ValueError("SRL-resident physics needs nfre_red == "
                             "nfre (diagnostic tail lives off-SRL)")
        n = setup.n_pad
        C = int(chunk)
        if n % C:
            raise ValueError(f"n_pad {n} not divisible by chunk {C}")
        nch = n // C
        L = self.L
        nang, nfre = self.nang, self.nfre_red
        fsp = bundle["from_srl_pad"]

        def split(a):
            a = jnp.asarray(a)
            return jnp.moveaxis(a.reshape(a.shape[:-1] + (nch, C)),
                                -2, 0)

        xs = (fsp.reshape(nch, C), jax.tree.map(split, env),
              jax.tree.map(split, frc), jax.tree.map(split, stress))

        def body(args):
            ix, e, fr, srx = args
            fll = f_srl[ix][:, :L]
            fl = pfz.from_lanes(fll, nfre, nang)
            out, st = impl.implsch(setup.phys, fl, e, fr, **srx)
            oll = pfz.to_lanes(out, nfre, nang).astype(f_srl.dtype)
            return oll, {k: st[k].astype(self.dtype)
                         for k in state_keys}

        # chunk-major stacked output (nch, C, L) + ONE srl_src GATHER to
        # rebuild the SRL buffer.  Rejected alternatives, all measured:
        # a fori_loop carrying f_srl re-copies the whole 5.5 GB buffer
        # per iteration when XLA fails to alias the in-loop scatter
        # (6.4 s/step at O512); a whole-field row-scatter lowers to a
        # generic scatter ~3x slower than the equivalent gather
        # (0.70 s vs 0.23 s at O160); the compact (nang, nfre, n) round
        # trip adds a whole-field transpose that blew the O512 compile.
        outs, acc = lax.map(body, xs)
        vals = outs.reshape(n, L)
        LPb = self.LP if self.backend == "pallas" else L
        if LPb > L:
            vals = jnp.pad(vals, ((0, 0), (0, LPb - L)))
        vals = jnp.concatenate(
            [vals, jnp.zeros((1, vals.shape[1]), vals.dtype)], axis=0)
        f_srl = vals[bundle["dev"]["srl_src"]]
        acc = {k: v.reshape(n) for k, v in acc.items()}
        return f_srl, acc

    # -- pure steps (jit these with bundle as an argument) -------------
    def to_srl(self, fl1, bundle):
        """Compact (nang, nfre, n_pad) spectrum → SRL (nsrl, L[P])."""
        fll = pfz.to_lanes(fl1, self.nfre_red, self.nang)
        fll = jnp.concatenate(
            [fll, jnp.zeros((1, self.L), fll.dtype)], axis=0)
        if self.backend == "pallas" and self.LP > self.L:
            fll = jnp.pad(fll, ((0, 0), (0, self.LP - self.L)))
        return fll[bundle["dev"]["srl_src"]]

    def from_srl(self, f_srl, bundle):
        """SRL state → compact (nang, nfre_red, n_pad) spectrum."""
        out = f_srl[bundle["from_srl_pad"]][:, : self.L]
        return pfz.from_lanes(out, self.nfre_red, self.nang)

    def advect_srl(self, f_srl, bundle):
        """One full advection step on SRL-resident state (chained
        advections without the compact round trip)."""
        f_srl = pfz.refresh_wraps(f_srl, bundle["dev"])
        return self._substeps(f_srl, bundle)

    def advect(self, fl1, bundle):
        """One full advection step on the compact (nang, nfre, n_pad)
        spectrum, incl. fast-wave substeps.  Pure in (fl1, bundle)."""
        setup = self.setup
        nfre_red = self.nfre_red
        f_srl = self.to_srl(fl1, bundle)
        f_srl = self._substeps(f_srl, bundle)
        out = self.from_srl(f_srl, bundle)
        if nfre_red < setup.tb.nfre:
            out = jnp.concatenate([out, fl1[:, nfre_red:]], axis=1)
        return out

    def _substeps(self, f_srl, bundle):
        """Main all-band pass + the extra fast-wave sub-passes."""
        setup = self.setup
        nfre_red = self.nfre_red
        dev = bundle["dev"]
        pallas = self.backend == "pallas"
        if pallas:
            from ecwam_tpu.ops import propagation_pallas as pk
            f_srl = pk.advect_pallas(
                f_srl, bundle["pk"], nang=self.nang, nfre=nfre_red,
                irefra=setup.irefra, S=self.ft.S, EW=self.ft.EW,
                fratio=float(setup.tb.fratio), interpret=self.interpret)
        else:
            f_srl = _advect_xla_srl(self, f_srl, bundle)
        if self.nsub > 1:
            mlf = setup.ifrelfmax
            mw = self.mlf_w                      # mlf, or mlf+1 with σ̇
            nsrl = f_srl.shape[0]
            Llo = self.nang * mw
            LPlo = -(-Llo // 128) * 128 if pallas else Llo
            if not pallas:
                dev_lo = dict(dev, obs=dev["obs"][:, :, :mw])
                if "pf" in dev:
                    dev_lo["pf"] = dev["pf"][:, :, :mw]
            for _ in range(self.nsub - 1):
                # k-major lanes: the fast-wave band is the per-angle
                # frequency prefix, not a contiguous lane prefix
                f3 = f_srl[:, : self.L].reshape(nsrl, self.nang,
                                                nfre_red)
                f_lo = f3[:, :, :mw].reshape(nsrl, Llo)
                if LPlo > Llo:
                    f_lo = jnp.pad(f_lo, ((0, 0), (0, LPlo - Llo)))
                f_lo = pfz.refresh_wraps(f_lo, dev)
                if pallas:
                    f_lo = pk.advect_pallas(
                        f_lo, bundle["pk_lo"], nang=self.nang, nfre=mw,
                        irefra=setup.irefra, S=self.ft.S, EW=self.ft.EW,
                        fratio=float(setup.tb.fratio),
                        interpret=self.interpret)
                else:
                    f_lo = pfz.advect_xla(
                        f_lo, bundle["cg_srl"][:, :mw], dev_lo,
                        bundle["lc_lo"], bundle["cg_land"][:mw],
                        nang=self.nang, nfre=mw, irefra=setup.irefra,
                        S=self.ft.S, EW=self.ft.EW)
                f3 = f3.at[:, :, :mlf].set(
                    f_lo[:, :Llo].reshape(nsrl, self.nang,
                                          mw)[:, :, :mlf])
                out = f3.reshape(nsrl, self.L)
                if self.LP > self.L and pallas:
                    out = jnp.pad(out, ((0, 0), (0, self.LP - self.L)))
                f_srl = out
        return f_srl


def _advect_xla_srl(fp: FusedPropagation, f_srl, bundle, *,
                    with_cfl=False):
    return pfz.advect_xla(
        f_srl, bundle["cg_srl"], bundle["dev"], bundle["lc"],
        bundle["cg_land"], nang=fp.nang, nfre=fp.nfre_red,
        irefra=fp.setup.irefra, S=fp.ft.S, EW=fp.ft.EW,
        with_cfl=with_cfl)


def _cast_lc(lc, dtype):
    return {k: (jnp.asarray(v, dtype) if isinstance(v, np.ndarray) else v)
            for k, v in lc.items()}


@jax.jit
def _frc_srl(frc, src):
    """Forcing dict (n_pad,) fields → (6, nsrl) rows in SRL order; the
    land slot replicates point 0 (benign, finite)."""
    rows = []
    for k in ipk.SCAL_IN[:ipk.N_FRC]:
        v = frc.get(k)
        if v is None:
            v = jnp.zeros_like(frc["wswave"])
        ext = jnp.concatenate([v, v[:1]])
        rows.append(ext[src][None, :])
    return jnp.concatenate(rows, axis=0)


@jax.jit
def _build_phys_srl(env, frc, stress, src):
    env2d = jnp.concatenate(
        [env[k + "_ext"][:, src] for k in ipk.ENV_FIELDS], axis=0)
    denv = jnp.stack([env["depth_ext"][src], env["emaxdpt_ext"][src]])
    frc6 = _frc_srl(frc, src)
    srows = []
    for k in ipk.STRESS_KEYS:
        ext = jnp.concatenate([stress[k], stress[k][:1]])
        srows.append(ext[src][None, :])
    return env2d, denv, frc6, jnp.concatenate(srows, axis=0)
