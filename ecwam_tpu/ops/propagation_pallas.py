"""Pallas TPU kernel for the fused CTU propagation.

Mirrors ops/propagation_fused.py:segment_advect exactly — same segmented
row layout, FIR taps, and separable weight algebra (ctuw.F90:90-745 +
propags2.F90:49-130) — but with the spectrum windows DMA'd into VMEM per
segment and every weight recomputed in registers, so HBM traffic is just
the three window reads + one write per point (plus small tables) instead
of the ~17 weight floats/bin of the dense path.

Layout contracts (see propagation_fused.py):
  * f_srl (nsrl, L) f32, L = nfre·nang, k-major lanes (l = k·nfre + m)
  * per-(point,freq) fields expand over lanes with pltpu.repeat (tile
    semantics == k-major), the angle roll is a whole-width lane roll
  * grid = nsrl//S blocks; block 0 and the two tail blocks are the SRL
    front/end pads (valid=0 zeroes their output)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row order of the packed lane-constant input (must match _lc_pack)
LC_ROWS = ("s", "cth", "east", "north", "dt", "sp", "sm",
           "sd_p", "cd_p", "sd_m", "cd_m",
           "ss_p", "sc_p", "cc_p", "ss_m", "sc_m", "cc_m",
           "nf_sc", "nf_cc", "nf_ss", "dfp", "dfm", "m_first", "m_last")


def _lc_pack(lc, L, dtype):
    """Pack the lane constants into one (len(LC_ROWS), L) device array.

    Built host-side in numpy with a single transfer: on a relay-attached
    accelerator every eager device op costs a remote compile."""
    import numpy as np
    rows = np.stack([np.asarray(lc[k]).reshape(L) for k in LC_ROWS])
    return jnp.asarray(rows, dtype)


def _kernel(dn_ref, up_ref,                        # scalar prefetch
            f_hbm, cg_hbm, taps_dn_ref, taps_up_ref, sea_ref, cgl_ref,
            geom_ref, valid_ref, obs_ref, uv_ref, grads_ref, pf_ref,
            lc_ref, cgland_ref,
            out_ref,
            wf_dn, wf_up, wf_ow, wc_dn, wc_up, wc_ow, sems,
            *, S, EW, TS, nang, nfre, irefra, fratio, cmtodeg):
    L = nang * nfre
    EWG = ((EW + 2 + 7) // 8) * 8          # aligned window-load pad
    nsrl = f_hbm.shape[0]
    pid = pl.program_id(0)
    # all bases are host-aligned to 8 (TPU DMA tiling constraint)
    dnb = pl.multiple_of(jnp.minimum(dn_ref[pid], nsrl - S - EWG), 8)
    upb = pl.multiple_of(jnp.minimum(up_ref[pid], nsrl - S - EWG), 8)
    ownb = pl.multiple_of(
        jnp.minimum(jnp.maximum(pid * S - 8, 0), nsrl - S - 24), 8)

    copies = [
        pltpu.make_async_copy(f_hbm.at[pl.ds(dnb, S + EWG), :], wf_dn,
                              sems.at[0]),
        pltpu.make_async_copy(f_hbm.at[pl.ds(upb, S + EWG), :], wf_up,
                              sems.at[1]),
        pltpu.make_async_copy(f_hbm.at[pl.ds(ownb, S + 24), :], wf_ow,
                              sems.at[2]),
        pltpu.make_async_copy(cg_hbm.at[pl.ds(dnb, S + EWG), :], wc_dn,
                              sems.at[3]),
        pltpu.make_async_copy(cg_hbm.at[pl.ds(upb, S + EWG), :], wc_up,
                              sems.at[4]),
        pltpu.make_async_copy(cg_hbm.at[pl.ds(ownb, S + 24), :], wc_ow,
                              sems.at[5]),
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    lc = {k: lc_ref[i:i + 1, :] for i, k in enumerate(LC_ROWS)}
    cg_land_lane = cgland_ref[0:1, :]
    have_cur = irefra in (2, 3)

    def lroll(x, s):
        # pltpu.roll wants non-negative shifts
        return pltpu.roll(x, s % x.shape[1], axis=1)

    def strip(si, _):
        # Mosaic needs dynamic sublane offsets provably 8-aligned: load
        # aligned supersets once, then take STATIC sub-slices for the
        # per-tap row offsets.
        r0 = pl.multiple_of(si * TS, TS)

        wdn = wf_dn[pl.ds(r0, TS + EWG), :]
        wup = wf_up[pl.ds(r0, TS + EWG), :]
        wow = wf_ow[pl.ds(r0, TS + 16), :]
        cdn = wc_dn[pl.ds(r0, TS + EWG), :]
        cup = wc_up[pl.ds(r0, TS + EWG), :]
        cow = wc_ow[pl.ds(r0, TS + 16), :]

        f_own = wow[8:TS + 8, :]
        taps_dn = taps_dn_ref[pl.ds(r0, TS), :]
        taps_up = taps_up_ref[pl.ds(r0, TS), :]
        sea = sea_ref[pl.ds(r0, TS), :]
        cglw = cgl_ref[pl.ds(r0, TS), :]
        geom = geom_ref[pl.ds(r0, TS), :]
        valid = valid_ref[pl.ds(r0, TS), :]
        obs = obs_ref[pl.ds(r0, TS), :]

        def fir(win, field):
            acc = None
            for e in range(EW):
                t = taps_dn if field < 3 else taps_up
                tap = t[:, (field % 3) * EW + e].reshape(TS, 1)
                v = win[e:e + TS, :]
                acc = tap * v if acc is None else acc + tap * v
            return acc

        v_latS = fir(wdn, 0)
        v_corSE = fir(wdn, 1)
        v_corSW = fir(wdn, 2)
        v_latN = fir(wup, 3)
        v_corNE = fir(wup, 4)
        v_corNW = fir(wup, 5)
        sea_w = sea[:, 0:0 + 1]
        sea_e = sea[:, 1:1 + 1]
        v_W = sea_w * wow[7:TS + 7, :]
        v_E = sea_e * wow[9:TS + 9, :]

        cg_o = cow[8:TS + 8, :]
        cg_W = sea_w * cow[7:TS + 7, :] + (1.0 - sea_w) * cg_land_lane
        cg_E = (sea_e * cow[9:TS + 9, :]
                + (1.0 - sea_e) * cg_land_lane)
        cg_S = fir(cdn, 0) + cglw[:, 0:0 + 1] * cg_land_lane
        cg_N = fir(cup, 3) + cglw[:, 1:1 + 1] * cg_land_lane

        z = geom[:, 0:0 + 1]
        ci = geom[:, 1:1 + 1]
        tp = geom[:, 2:2 + 1]
        dp_s = geom[:, 3:3 + 1]
        dp_n = geom[:, 4:4 + 1]
        xdella = geom[:, 5:5 + 1]

        def expand(x):
            return pltpu.repeat(x, nang, axis=1)

        xw = expand(0.5 * (cg_o + cg_W) * ci) * lc["s"]
        xe = expand(0.5 * (cg_o + cg_E) * ci) * lc["s"]
        ys = expand(0.5 * (cg_o + dp_s * cg_S)) * lc["cth"]
        yn = expand(0.5 * (cg_o + dp_n * cg_N)) * lc["cth"]

        if have_cur:
            uv = uv_ref[pl.ds(r0, TS), :]
            u = uv[:, 0:0 + 1]
            v = uv[:, 1:1 + 1]

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
        if irefra:
            grads = grads_ref[pl.ds(r0, TS), :]
        if irefra in (1, 3):
            ddphi = grads[:, 0:0 + 1]
            ddlam_dco = grads[:, 1:1 + 1]
            drdp = ddphi * lc["sd_p"] - ddlam_dco * lc["cd_p"]
            drdm = ddphi * lc["sd_m"] - ddlam_dco * lc["cd_m"]
            pf = pf_ref[pl.ds(r0, TS), :]
            omos_l = expand(pf[:, 0:nfre])
            dthp = dthp + omos_l * drdp
            dthm = dthm + omos_l * drdm
        if have_cur:
            duphi = grads[:, 2:2 + 1]
            dvphi = grads[:, 3:3 + 1]
            dulam_dco = grads[:, 4:4 + 1]
            dvlam_dco = grads[:, 5:5 + 1]
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
            omdd = grads[:, 6:6 + 1]
            sdot_nf = (duphi * lc["nf_sc"] + dvphi * lc["nf_cc"]
                       + dulam_dco * lc["nf_ss"]
                       + dvlam_dco * lc["nf_sc"])
            sdot = sdot_nf * cgwav + omdd * omoswav
            sd_mp1 = (lc["m_last"] * sdot
                      + (1.0 - lc["m_last"]) * lroll(sdot, -1))
            sd_mm1 = (lc["m_first"] * sdot
                      + (1.0 - lc["m_first"]) * lroll(sdot, 1))
            dthp_f = (sdot + sd_mp1) * lc["dfp"]
            dthm_f = (sdot + sd_mm1) * lc["dfm"]
            sumwn = sumwn + ((dthp_f + jnp.abs(dthp_f))
                             + (jnp.abs(dthm_f) - dthm_f))
            wm_terms = ((dthm_f + jnp.abs(dthm_f)) * fratio,
                        (-dthp_f + jnp.abs(dthp_f)) / fratio)

        out = (1.0 - sumwn) * f_own
        out = out + (w_latS * expand(obs[:, 0:nfre]) * v_latS
                     + w_latN * expand(obs[:, nfre:2 * nfre]) * v_latN)
        out = out + (w_lonW * expand(obs[:, 2 * nfre:3 * nfre]) * v_W
                     + w_lonE * expand(obs[:, 3 * nfre:4 * nfre]) * v_E)
        out = out + (w_NE * expand(obs[:, 4 * nfre:5 * nfre]) * v_corNE
                     + w_SE * expand(obs[:, 5 * nfre:6 * nfre]) * v_corSE
                     + w_SW * expand(obs[:, 6 * nfre:7 * nfre]) * v_corSW
                     + w_NW * expand(obs[:, 7 * nfre:8 * nfre]) * v_corNW)
        out = out + w_km1 * lroll(f_own, nfre)
        out = out + w_kp1 * lroll(f_own, -nfre)
        if wm_terms is not None:
            f_mm1 = (lc["m_first"] * f_own
                     + (1.0 - lc["m_first"]) * lroll(f_own, 1))
            f_mp1 = (lc["m_last"] * f_own
                     + (1.0 - lc["m_last"]) * lroll(f_own, -1))
            out = out + wm_terms[0] * f_mm1 + wm_terms[1] * f_mp1

        out_ref[pl.ds(r0, TS), :] = valid[:, 0:0 + 1] * out
        return 0

    jax.lax.fori_loop(0, S // TS, strip, 0)


@functools.partial(
    jax.jit,
    static_argnames=("nang", "nfre", "irefra", "S", "EW", "fratio",
                     "interpret"))
def advect_pallas(f_srl, cg_srl, dev, lc_pack, cgland_pack, dn_full,
                  up_full, *, nang, nfre, irefra, S, EW, fratio,
                  interpret=False):
    """Fused CTU advection via the Pallas kernel.

    ``dn_full``/``up_full`` are (nsrl//S,) window bases covering ALL
    blocks (pads safe); ``lc_pack`` the (len(LC_ROWS), L) lane-constant
    pack; ``cgland_pack`` (8, nfre).  Returns the full (nsrl, L) updated
    spectrum (pad blocks zeroed via the valid mask).
    """
    from ecwam_tpu.core import constants as c

    nsrl, L = f_srl.shape
    nblocks = nsrl // S
    TS = min(32, S)
    EWG = ((EW + 2 + 7) // 8) * 8
    dt = f_srl.dtype

    taps_dn = dev["taps_dn"].reshape(nsrl, 3 * EW).astype(dt)
    taps_up = dev["taps_up"].reshape(nsrl, 3 * EW).astype(dt)
    obs = dev["obs"].transpose(0, 1, 2).reshape(nsrl, 8 * nfre).astype(dt)
    sea = dev["sea_own"].astype(dt)
    cgl = dev["cgland"].astype(dt)
    geom = dev["geom"].astype(dt)
    valid = dev["valid"].reshape(nsrl, 1).astype(dt)
    uv = dev.get("uv")
    if uv is None:
        uv = jnp.zeros((nsrl, 2), dt)
    grads = dev.get("grads")
    if grads is None:
        grads = jnp.zeros((nsrl, 8), dt)
    pf = dev.get("pf")
    if pf is None:
        pf = jnp.zeros((nsrl, 3, nfre), dt)
    pf = pf.reshape(nsrl, 3 * nfre).astype(dt)

    def row_spec(cols):
        return pl.BlockSpec((S, cols), lambda i, *_: (i, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # f_srl
            pl.BlockSpec(memory_space=pl.ANY),        # cg_srl
            row_spec(3 * EW),                          # taps_dn
            row_spec(3 * EW),                          # taps_up
            row_spec(2),                               # sea_own
            row_spec(2),                               # cgland
            row_spec(8),                               # geom
            row_spec(1),                               # valid
            row_spec(8 * nfre),                        # obs
            row_spec(2),                               # uv
            row_spec(8),                               # grads
            row_spec(3 * nfre),                        # pf
            pl.BlockSpec((len(LC_ROWS), L), lambda i, *_: (0, 0)),
            pl.BlockSpec((8, nfre), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((S, L), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((S + EWG, L), dt), pltpu.VMEM((S + EWG, L), dt),
            pltpu.VMEM((S + 24, L), dt),
            pltpu.VMEM((S + EWG, nfre), dt),
            pltpu.VMEM((S + EWG, nfre), dt),
            pltpu.VMEM((S + 24, nfre), dt),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    kern = functools.partial(
        _kernel, S=S, EW=EW, TS=TS, nang=nang, nfre=nfre, irefra=irefra,
        fratio=fratio, cmtodeg=360.0 / c.CIRC)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsrl, L), dt),
        interpret=interpret,
    )(dn_full, up_full, f_srl, cg_srl, taps_dn, taps_up, sea, cgl, geom,
      valid, obs, uv, grads, pf, lc_pack, cgland_pack)
