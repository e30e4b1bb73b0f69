"""Pallas TPU kernel for the fused CTU propagation.

Mirrors ops/propagation_fused.py:segment_advect exactly — same segmented
row layout, FIR taps, and separable weight algebra (ctuw.F90:90-745 +
propags2.F90:49-130) — but with the spectrum windows DMA'd into VMEM per
segment and every weight recomputed in registers, so HBM traffic is just
the three window reads + one write per point (plus small tables) instead
of the ~17 weight floats/bin of the dense path.

TPU constraints shaping the implementation:
  * DMA slices must be 8-aligned in sublanes and 128-aligned in lanes —
    window bases are host-aligned (residuals folded into the taps) and
    every array's lane width is padded to a multiple of 128 by
    :func:`pack_tables` (pad lanes are zero and never flow into real
    lanes: the angle roll uses a two-roll + lane-mask form).
  * Per-point tables are packed into one (nsrl, 128) array (``ptab``).
  * pltpu.repeat has tile semantics == the k-major lane expansion.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row order of the packed lane-constant input
LC_ROWS = ("s", "cth", "east", "north", "dt", "sp", "sm",
           "sd_p", "cd_p", "sd_m", "cd_m",
           "ss_p", "sc_p", "cc_p", "ss_m", "sc_m", "cc_m",
           "nf_sc", "nf_cc", "nf_ss", "dfp", "dfm", "m_first", "m_last")

# ptab column layout
PT_SEA_W, PT_SEA_E, PT_CGL_DN, PT_CGL_UP = 0, 1, 2, 3
PT_GEOM = 4            # 8 columns: zdello, cosphm1, tanph, dp_s, dp_n, xdella
PT_VALID = 12
PT_U, PT_V = 13, 14
PT_GRADS = 16          # 8 columns (GRADS_FIELDS order)
PT_TAPS = 24           # 6·EW tap columns when they fit (EW ≤ 17): the
                       # separate 128-lane-padded tap table wasted
                       # ~0.6 GB at O512 next to ptab's ~100 empty cols


def _pad128(a, axis=-1):
    n = a.shape[axis]
    p = (-n) % 128
    if p == 0:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, p)
    return np.pad(np.asarray(a), pad)


def _rebase_taps(taps: np.ndarray, base_full: np.ndarray, S: int):
    """Fold each block's leading all-zero tap columns into its window
    base.  The host-aligned window bases widen the per-point tap extent
    to EW=16, but the union extent of NONZERO taps per segment is ≤8 on
    octahedral grids (row-length ratios ≤ 4/3) — re-basing lets the
    kernel run half the FIR iterations (the dominant advection cost).

    Returns (lo (nblocks,), extent (nblocks,)); ``base_full`` is NOT
    modified here.
    """
    nb = len(base_full)
    t3 = np.asarray(taps).reshape(nb, -1)
    EW = taps.shape[-1]
    any_e = (t3 != 0.0).reshape(nb, S, -1, EW).any(axis=(1, 2))
    has = any_e.any(axis=1)
    lo = np.where(has, np.argmax(any_e, axis=1), 0).astype(np.int64)
    hi = np.where(has, EW - 1 - np.argmax(any_e[:, ::-1], axis=1), -1)
    ext = np.maximum(hi - lo + 1, 0)
    return lo, ext


def _shift_taps(taps: np.ndarray, lo: np.ndarray, S: int, ew2: int):
    """taps (nsrl, 3, EW) → (nsrl, 3, ew2) with block b's columns
    shifted left by lo[b]."""
    nsrl, nsets, EW = taps.shape
    nb = len(lo)
    out = np.zeros((nb, S, nsets, ew2), taps.dtype)
    t4 = taps.reshape(nb, S, nsets, EW)
    for d in np.unique(lo):
        m = lo == d
        w = min(ew2, EW - d)
        out[m, :, :, :w] = t4[m, :, :, d:d + w]
    return out.reshape(nsrl, nsets, ew2)


def pack_tables(ft_dev_np: dict, lc_np: dict, cg_srl_np, cg_land_np,
                dn_base, up_base, *, S: int, EW: int, nang: int,
                nfre: int, nsrl: int, dtype, as_numpy: bool = False,
                obs_ones: bool | None = None,
                ew_force: int | None = None) -> dict:
    """Host-side (numpy) kernel table pack → single device pushes.

    ``ft_dev_np``: numpy dict with taps_dn/up (nsrl,3,EW), sea_own,
    cgland, geom (nsrl,8), valid (nsrl,), obs (nsrl,8,nfre), optional
    uv (nsrl,2) and grads (nsrl,8).  ``as_numpy`` keeps the packed
    tables host-side (the sharded build stacks per-shard packs before
    one sharded device_put).

    ``obs_ones``: skip the obstruction tables statically (all-open
    water — no HBM reads, no per-strip multiplies); None = auto-detect
    (sharded callers must pass the DOMAIN-global flag so every shard
    packs the same shapes).
    """
    L = nang * nfre
    ptab = np.zeros((nsrl, 128))
    ptab[:, PT_SEA_W:PT_SEA_E + 1] = np.asarray(ft_dev_np["sea_own"])
    ptab[:, PT_CGL_DN:PT_CGL_UP + 1] = np.asarray(ft_dev_np["cgland"])
    ptab[:, PT_GEOM:PT_GEOM + 8] = np.asarray(ft_dev_np["geom"])
    ptab[:, PT_VALID] = np.asarray(ft_dev_np["valid"])
    if "uv" in ft_dev_np:
        ptab[:, PT_U:PT_V + 1] = np.asarray(ft_dev_np["uv"])
    if "grads" in ft_dev_np:
        ptab[:, PT_GRADS:PT_GRADS + 8] = np.asarray(ft_dev_np["grads"])

    nblocks = nsrl // S
    dnf = np.zeros(nblocks, np.int64)
    upf = np.zeros(nblocks, np.int64)
    nb = min(nblocks, len(dn_base) + 1)
    dnf[1:nb] = np.asarray(dn_base)[:nb - 1]
    upf[1:nb] = np.asarray(up_base)[:nb - 1]

    # fold leading zero tap columns into the (now unaligned) window
    # bases; the kernel re-aligns the DMA base down to a multiple of 8
    # and carries the remainder into the FIR slice offsets
    taps_dn = np.asarray(ft_dev_np["taps_dn"])
    taps_up = np.asarray(ft_dev_np["taps_up"])
    lo_dn, ext_dn = _rebase_taps(taps_dn, dnf, S)
    lo_up, ext_up = _rebase_taps(taps_up, upf, S)
    ew2 = int(max(ext_dn.max(), ext_up.max(), 1))
    if ew_force is not None:
        # sharded packs need one width across all shards (stacked packs)
        assert ew_force >= ew2, (ew_force, ew2)
        ew2 = ew_force
    taps_dn = _shift_taps(taps_dn, lo_dn, S, ew2)
    taps_up = _shift_taps(taps_up, lo_up, S, ew2)
    dnf = dnf + lo_dn
    upf = upf + lo_up

    # packed taps [dn(3·ew2) | up(3·ew2)]: folded into ptab's free
    # columns when they fit (one fewer 128-lane table resident), else a
    # separate 128-padded table
    taps_raw = np.concatenate(
        [taps_dn.reshape(nsrl, -1), taps_up.reshape(nsrl, -1)], axis=1)
    if PT_TAPS + taps_raw.shape[1] <= 128:
        ptab[:, PT_TAPS:PT_TAPS + taps_raw.shape[1]] = taps_raw
        taps = np.zeros((8, 128))                    # token, never read
    else:
        taps = _pad128(taps_raw)
    if obs_ones is None:
        obs_ones = bool(np.all(np.asarray(ft_dev_np["obs"]) == 1.0))
    if obs_ones:
        obs = np.zeros((8, 128))                     # token, never read
    else:
        obs = _pad128(np.asarray(ft_dev_np["obs"]).reshape(nsrl, -1))
    if "pf" in ft_dev_np and ft_dev_np["pf"] is not None:
        pf = _pad128(np.asarray(ft_dev_np["pf"]).reshape(nsrl, -1))
    else:
        # never read (irefra gates): a token block, not an (nsrl, 128)
        # zero tensor (0.6 GB at O512)
        pf = np.zeros((8, 128))
    cg = _pad128(np.asarray(cg_srl_np))
    cgland = np.zeros((8, cg.shape[1]))
    cgland[0, :nfre] = np.asarray(cg_land_np)
    lc = np.stack([
        np.pad(np.asarray(lc_np[k]).reshape(L), (0, (-L) % 128))
        for k in LC_ROWS])

    npdt = np.dtype(str(jnp.dtype(dtype)))
    out = dict(
        ptab=ptab.astype(npdt), taps=taps.astype(npdt),
        obs=obs.astype(npdt), pf=pf.astype(npdt), cg=cg.astype(npdt),
        cgland=cgland.astype(npdt), lc=lc.astype(npdt),
        dn_full=dnf.astype(np.int32), up_full=upf.astype(np.int32),
        # static tap width marker (shape-encoded: survives jit pytrees)
        ewtok=np.zeros((ew2, 1), np.int8),
        fratio=float(lc_np["fratio"]))
    if as_numpy:
        return out
    return {k: (v if k == "fratio" else jnp.asarray(v))
            for k, v in out.items()}


def _kernel(dn_ref, up_ref,                        # scalar prefetch
            f_hbm, cg_hbm, taps_ref, ptab_ref,
            obs_ref, pf_ref, lc_ref, cgland_ref,
            out_ref,
            wf_dn, wf_up, wf_ow, wc_dn, wc_up, wc_ow, sems,
            *, S, EW, TS, nang, nfre, irefra, fratio, cmtodeg,
            taps_merged, obs_ones):
    L = nang * nfre
    LP = f_hbm.shape[1]
    EWG = ((EW + 8 + 7) // 8) * 8      # rem (≤7) + EW taps + margin
    nsrl = f_hbm.shape[0]
    pid = pl.program_id(0)
    nprog = pl.num_programs(0)

    def base_rem(ref, bid):
        """Window base aligned down to a multiple of 8 (DMA sublane
        alignment) + the remainder carried into the FIR slice offsets
        (the pack re-bases taps per segment so the nonzero extent fits
        EW columns; bases are no longer host-aligned)."""
        b = jnp.minimum(ref[bid], nsrl - S - EWG)
        al = pl.multiple_of((b // 8) * 8, 8)
        return al, b - al

    def window_copies(bid, slot):
        """The 6 async window copies for block ``bid`` into buffer
        ``slot`` (double buffering: block i+1's DMAs overlap block i's
        compute — the synchronous form left the MXU-free VPU loop
        stalled on HBM latency every block)."""
        dnb, _ = base_rem(dn_ref, bid)
        upb, _ = base_rem(up_ref, bid)
        ownb = pl.multiple_of(
            jnp.minimum(jnp.maximum(bid * S - 8, 0), nsrl - S - 24), 8)
        return [
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(dnb, S + EWG), :], wf_dn.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(upb, S + EWG), :], wf_up.at[slot],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(ownb, S + 24), :], wf_ow.at[slot],
                sems.at[slot, 2]),
            pltpu.make_async_copy(
                cg_hbm.at[pl.ds(dnb, S + EWG), :], wc_dn.at[slot],
                sems.at[slot, 3]),
            pltpu.make_async_copy(
                cg_hbm.at[pl.ds(upb, S + EWG), :], wc_up.at[slot],
                sems.at[slot, 4]),
            pltpu.make_async_copy(
                cg_hbm.at[pl.ds(ownb, S + 24), :], wc_ow.at[slot],
                sems.at[slot, 5]),
        ]

    slot = jnp.remainder(pid, 2)

    @pl.when(pid == 0)
    def _prologue():
        for cp in window_copies(0, 0):
            cp.start()

    @pl.when(pid + 1 < nprog)
    def _prefetch_next():
        for cp in window_copies(pid + 1, jnp.remainder(pid + 1, 2)):
            cp.start()

    for cp in window_copies(pid, slot):
        cp.wait()
    wf_dn = wf_dn.at[slot]
    wf_up = wf_up.at[slot]
    wf_ow = wf_ow.at[slot]
    wc_dn = wc_dn.at[slot]
    wc_up = wc_up.at[slot]
    wc_ow = wc_ow.at[slot]
    _, rem_dn = base_rem(dn_ref, pid)
    _, rem_up = base_rem(up_ref, pid)

    lc = {k: lc_ref[i:i + 1, :] for i, k in enumerate(LC_ROWS)}
    cg_land_lane = cgland_ref[0:1, :]
    have_cur = irefra in (2, 3)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LP), 1)
    first_group = (lane < nfre).astype(wf_dn.dtype)

    def roll_k(f, d):
        """f at direction k+d; zero pad lanes never reach real lanes."""
        if d == -1:
            r = pltpu.roll(f, nfre, axis=1)
            rw = pltpu.roll(f, (nfre - L) % LP, axis=1)
            return first_group * rw + (1.0 - first_group) * r
        last_group = ((lane >= L - nfre) & (lane < L)).astype(f.dtype)
        r = pltpu.roll(f, LP - nfre, axis=1)
        rw = pltpu.roll(f, (L - nfre) % LP, axis=1)
        return last_group * rw + (1.0 - last_group) * r

    def shift_m(f, d):
        if d == +1:
            r = pltpu.roll(f, LP - 1, axis=1)
            return lc["m_last"] * f + (1.0 - lc["m_last"]) * r
        r = pltpu.roll(f, 1, axis=1)
        return lc["m_first"] * f + (1.0 - lc["m_first"]) * r

    def strip(si, _):
        r0 = pl.multiple_of(si * TS, TS)

        # static (8-aligned) strip loads, then ONE dynamic sublane
        # rotate per window folds in the unaligned base remainder —
        # Mosaic vector loads cannot take a dynamic sublane start.
        # Shift is size−rem, NOT −rem: compiled tpu.dynamic_rotate
        # silently mis-rotates negative dynamic amounts (measured on
        # chip; interpret mode accepts them)
        W = TS + EWG
        wdn = pltpu.roll(wf_dn[pl.ds(r0, W), :], W - rem_dn, axis=0)
        wup = pltpu.roll(wf_up[pl.ds(r0, W), :], W - rem_up, axis=0)
        cdn = pltpu.roll(wc_dn[pl.ds(r0, W), :], W - rem_dn, axis=0)
        cup = pltpu.roll(wc_up[pl.ds(r0, W), :], W - rem_up, axis=0)
        wow = wf_ow[pl.ds(r0, TS + 16), :]
        cow = wc_ow[pl.ds(r0, TS + 16), :]

        f_own = wow[8:TS + 8, :]
        pt = ptab_ref[pl.ds(r0, TS), :]
        if taps_merged:
            taps, tap0 = pt, PT_TAPS
        else:
            taps, tap0 = taps_ref[pl.ds(r0, TS), :], 0

        def col(i):
            return pt[:, i:i + 1]

        def fir3(win, fields):
            """FIR over the rotated window for several tap sets at once
            — one window slice per tap index shared by all sets (the
            slice realignment dominates the FMA)."""
            accs = [None] * len(fields)
            for e in range(EW):
                v = win[e:e + TS, :]
                for j, fld in enumerate(fields):
                    tap = taps[:, tap0 + fld * EW + e].reshape(TS, 1)
                    accs[j] = (tap * v if accs[j] is None
                               else accs[j] + tap * v)
            return accs

        v_latS, v_corSE, v_corSW = fir3(wdn, (0, 1, 2))
        v_latN, v_corNE, v_corNW = fir3(wup, (3, 4, 5))
        sea_w = col(PT_SEA_W)
        sea_e = col(PT_SEA_E)
        v_W = sea_w * wow[7:TS + 7, :]
        v_E = sea_e * wow[9:TS + 9, :]

        cg_o = cow[8:TS + 8, :]
        cg_W = sea_w * cow[7:TS + 7, :] + (1.0 - sea_w) * cg_land_lane
        cg_E = sea_e * cow[9:TS + 9, :] + (1.0 - sea_e) * cg_land_lane
        cg_S = fir3(cdn, (0,))[0] + col(PT_CGL_DN) * cg_land_lane
        cg_N = fir3(cup, (3,))[0] + col(PT_CGL_UP) * cg_land_lane

        z = col(PT_GEOM + 0)
        ci = col(PT_GEOM + 1)
        tp = col(PT_GEOM + 2)
        dp_s = col(PT_GEOM + 3)
        dp_n = col(PT_GEOM + 4)
        xdella = col(PT_GEOM + 5)
        valid = col(PT_VALID)

        def expand(x):
            # (TS, nfre) per-freq field → (TS, LP) k-major lanes
            r = pltpu.repeat(x[:, :nfre], nang, axis=1)
            if LP > L:
                r = jnp.concatenate(
                    [r, jnp.zeros((TS, LP - L), r.dtype)], axis=1)
            return r

        xw = expand(0.5 * (cg_o + cg_W) * ci) * lc["s"]
        xe = expand(0.5 * (cg_o + cg_E) * ci) * lc["s"]
        ys = expand(0.5 * (cg_o + dp_s * cg_S)) * lc["cth"]
        yn = expand(0.5 * (cg_o + dp_n * cg_N)) * lc["cth"]

        if have_cur:
            u = col(PT_U)
            v = col(PT_V)

            def updown(cgx, vadd):
                rel = cgx + vadd
                iss = (jnp.sign(rel) == jnp.sign(cgx)).astype(cgx.dtype)
                ad = jnp.abs(lc["dt"] * rel * cmtodeg)
                return ad * iss, ad * (1.0 - iss)
            dxup_w, dxdw_w = updown(xw, u * ci)
            dxup_e, dxdw_e = updown(xe, u * ci)
            dyup_s, dydw_s = updown(ys, v * 0.5 * (1.0 + dp_s))
            dyup_n, dydw_n = updown(yn, v * 0.5 * (1.0 + dp_n))
        else:
            dxup_w = jnp.abs(lc["dt"] * xw * cmtodeg)
            dxup_e = jnp.abs(lc["dt"] * xe * cmtodeg)
            dyup_s = jnp.abs(lc["dt"] * ys * cmtodeg)
            dyup_n = jnp.abs(lc["dt"] * yn * cmtodeg)
            dxdw_w = dxdw_e = dydw_s = dydw_n = jnp.zeros_like(dxup_w)

        east = lc["east"]
        north = lc["north"]

        def sel(a, b, m):
            return m * a + (1.0 - m) * b

        dxup_1 = sel(dxup_w, dxup_e, east)
        dxup_2 = sel(dxup_e, dxup_w, east)
        dxdw_1 = sel(dxdw_w, dxdw_e, east)
        dxdw_2 = sel(dxdw_e, dxdw_w, east)
        dyup_1 = sel(dyup_s, dyup_n, north)
        dyup_2 = sel(dyup_n, dyup_s, north)
        dydw_1 = sel(dydw_s, dydw_n, north)
        dydw_2 = sel(dydw_n, dydw_s, north)

        aream1 = 1.0 / (z * xdella)
        dxx = z - dxup_2 - dxdw_1
        dyy = xdella - dyup_2 - dydw_1

        w_jyo1 = dxx * dyup_1 * aream1
        w_jyo2 = dxx * dydw_2 * aream1
        w_latS = sel(w_jyo1, w_jyo2, north)
        w_latN = sel(w_jyo2, w_jyo1, north)
        w_jxo1 = dyy * dxup_1 * aream1
        w_jxo2 = dyy * dxdw_2 * aream1
        w_lonW = sel(w_jxo1, w_jxo2, east)
        w_lonE = sel(w_jxo2, w_jxo1, east)

        wg1 = dxup_1 * dyup_1 * aream1
        wg2 = dxdw_2 * dyup_1 * aream1
        wg3 = dxup_1 * dydw_2 * aream1
        wg4 = dxdw_2 * dydw_2 * aream1
        w_SW = sel(sel(wg1, wg2, east), sel(wg3, wg4, east), north)
        w_SE = sel(sel(wg2, wg1, east), sel(wg4, wg3, east), north)
        w_NW = sel(sel(wg3, wg4, east), sel(wg1, wg2, east), north)
        w_NE = sel(sel(wg4, wg3, east), sel(wg2, wg1, east), north)

        sumwn = (z * (dydw_1 + dyup_2) + xdella * (dxup_2 + dxdw_1)
                 - (dxdw_1 + dxup_2) * (dydw_1 + dyup_2)) * aream1

        cgo_l = expand(cg_o)
        dthp = tp * lc["sp"] * cgo_l
        dthm = tp * lc["sm"] * cgo_l
        if irefra in (1, 3):
            ddphi = col(PT_GRADS + 0)
            ddlam_dco = col(PT_GRADS + 1)
            drdp = ddphi * lc["sd_p"] - ddlam_dco * lc["cd_p"]
            drdm = ddphi * lc["sd_m"] - ddlam_dco * lc["cd_m"]
            pf = pf_ref[pl.ds(r0, TS), :]
            omos_l = expand(pf[:, 0:nfre])
            dthp = dthp + omos_l * drdp
            dthm = dthm + omos_l * drdm
        if have_cur:
            duphi = col(PT_GRADS + 2)
            dvphi = col(PT_GRADS + 3)
            dulam_dco = col(PT_GRADS + 4)
            dvlam_dco = col(PT_GRADS + 5)
            dthp = dthp + (duphi * lc["ss_p"] + dvphi * lc["sc_p"]
                           - dulam_dco * lc["sc_p"]
                           - dvlam_dco * lc["cc_p"])
            dthm = dthm + (duphi * lc["ss_m"] + dvphi * lc["sc_m"]
                           - dulam_dco * lc["sc_m"]
                           - dvlam_dco * lc["cc_m"])

        wkpmn0 = (dthp + jnp.abs(dthp)) + (jnp.abs(dthm) - dthm)
        w_km1 = dthm + jnp.abs(dthm)
        w_kp1 = -dthp + jnp.abs(dthp)
        sumwn = sumwn + wkpmn0

        wm_terms = None
        if have_cur:
            pf = pf_ref[pl.ds(r0, TS), :]
            cgwav = expand(pf[:, nfre:2 * nfre])
            omoswav = expand(pf[:, 2 * nfre:3 * nfre])
            omdd = col(PT_GRADS + 6)
            sdot_nf = (duphi * lc["nf_sc"] + dvphi * lc["nf_cc"]
                       + dulam_dco * lc["nf_ss"]
                       + dvlam_dco * lc["nf_sc"])
            sdot = sdot_nf * cgwav + omdd * omoswav
            sd_mp1 = shift_m(sdot, +1)
            sd_mm1 = shift_m(sdot, -1)
            dthp_f = (sdot + sd_mp1) * lc["dfp"]
            dthm_f = (sdot + sd_mm1) * lc["dfm"]
            sumwn = sumwn + ((dthp_f + jnp.abs(dthp_f))
                             + (jnp.abs(dthm_f) - dthm_f))
            wm_terms = ((dthm_f + jnp.abs(dthm_f)) * fratio,
                        (-dthp_f + jnp.abs(dthp_f)) / fratio)

        if obs_ones:
            def ob(slot):
                return 1.0            # open water: fold the multiply away
        else:
            obs = obs_ref[pl.ds(r0, TS), :]

            def ob(slot):
                return expand(obs[:, slot * nfre:(slot + 1) * nfre])

        out = (1.0 - sumwn) * f_own
        out = out + (w_latS * ob(0) * v_latS + w_latN * ob(1) * v_latN)
        out = out + (w_lonW * ob(2) * v_W + w_lonE * ob(3) * v_E)
        out = out + (w_NE * ob(4) * v_corNE + w_SE * ob(5) * v_corSE
                     + w_SW * ob(6) * v_corSW + w_NW * ob(7) * v_corNW)
        out = out + w_km1 * roll_k(f_own, -1)
        out = out + w_kp1 * roll_k(f_own, +1)
        if wm_terms is not None:
            out = out + wm_terms[0] * shift_m(f_own, -1)
            out = out + wm_terms[1] * shift_m(f_own, +1)

        out_ref[pl.ds(r0, TS), :] = valid * out
        return 0

    jax.lax.fori_loop(0, S // TS, strip, 0)


@functools.partial(
    jax.jit,
    static_argnames=("nang", "nfre", "irefra", "S", "EW", "fratio",
                     "interpret"))
def advect_pallas(f_srl_p, tabs, *, nang, nfre, irefra, S, EW, fratio,
                  interpret=False):
    """Fused CTU advection via the Pallas kernel.

    ``f_srl_p`` is the LANE-PADDED (nsrl, LP) spectrum (LP = 128-multiple
    of nang·nfre, zero pad lanes); ``tabs`` the :func:`pack_tables` dict.
    Returns the updated (nsrl, LP) spectrum (pads/wraps zeroed).
    """
    from ecwam_tpu.core import constants as c

    import os
    nsrl, LP = f_srl_p.shape
    nblocks = nsrl // S
    # strip size: bigger strips = fewer, larger VPU ops per block
    # (ECWAVE_ADV_TS knob for tuning; 32 measured best at O512 r3)
    TS = min(int(os.environ.get("ECWAVE_ADV_TS", "32")), S)
    # static re-based tap width (shape-encoded so it survives jit
    # pytrees); EW kept as the fallback for pre-rebase table packs
    EW2 = tabs["ewtok"].shape[0] if "ewtok" in tabs else EW
    EWG = ((EW2 + 8 + 7) // 8) * 8
    dt = f_srl_p.dtype
    NFP = tabs["cg"].shape[1]

    def row_spec(cols):
        return pl.BlockSpec((S, cols), lambda i, *_: (i, 0))

    def token_spec():
        return pl.BlockSpec((8, 128), lambda i, *_: (0, 0))

    pf_full = tabs["pf"].shape[0] == nsrl
    taps_merged = tabs["taps"].shape[0] != nsrl
    obs_ones = tabs["obs"].shape[0] != nsrl
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # f_srl
            pl.BlockSpec(memory_space=pl.ANY),        # cg_srl
            (row_spec(tabs["taps"].shape[1]) if not taps_merged
             else token_spec()),
            row_spec(128),                             # ptab
            (row_spec(tabs["obs"].shape[1]) if not obs_ones
             else token_spec()),
            (row_spec(tabs["pf"].shape[1]) if pf_full
             else token_spec()),
            pl.BlockSpec((len(LC_ROWS), LP), lambda i, *_: (0, 0)),
            pl.BlockSpec((8, NFP), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((S, LP), lambda i, *_: (i, 0)),
        scratch_shapes=[                       # double-buffered windows
            pltpu.VMEM((2, S + EWG, LP), dt),
            pltpu.VMEM((2, S + EWG, LP), dt),
            pltpu.VMEM((2, S + 24, LP), dt),
            pltpu.VMEM((2, S + EWG, NFP), dt),
            pltpu.VMEM((2, S + EWG, NFP), dt),
            pltpu.VMEM((2, S + 24, NFP), dt),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    kern = functools.partial(
        _kernel, S=S, EW=EW2, TS=TS, nang=nang, nfre=nfre, irefra=irefra,
        fratio=fratio, cmtodeg=360.0 / c.CIRC, taps_merged=taps_merged,
        obs_ones=obs_ones)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsrl, LP), dt),
        interpret=interpret,
    )(tabs["dn_full"], tabs["up_full"], f_srl_p, tabs["cg"],
      tabs["taps"], tabs["ptab"], tabs["obs"],
      tabs["pf"], tabs["lc"], tabs["cgland"])
