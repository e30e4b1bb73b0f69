"""Semi-implicit source-term integration — one physics step.

JAX re-derivation of the reference physics step:
  - SINFLX   stress/input iteration (2 calls)  (/root/reference/src/ecwam/sinflx.F90:190-260)
  - IMPLSCH  full chain: depth limit → means → 2×SINFLX → SDISSIP → SNONLIN →
             SDIWBK → SBOTTOM → implicit update with growth limiter →
             means → IMPHFTAIL → SETICE       (implsch.F90:120-360)

Everything is a pure function of (fl1, env, forcing, stress-state) returning
the new spectrum and updated stress-state/diagnostics.  Layout: fl1
(nang, nfre, npts).

Sea-ice handling: LMASKICE=T masking via FLM/SETICE (the reference
default), LCISCAL source scaling, and the SDICE1/2/3 attenuation source
terms (dispatched below when lciwa1/2/3 are set).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.ops.physics import airsea as airsea_mod
from ecwam_tpu.ops.physics import gc as gc_mod
from ecwam_tpu.ops.physics import dia as dia_mod
from ecwam_tpu.ops.physics import fluxes as fluxes_mod
from ecwam_tpu.ops.physics import means as means_mod
from ecwam_tpu.ops.physics import sdissip as sdissip_mod
from ecwam_tpu.ops.physics import shallow as shallow_mod
from ecwam_tpu.ops.physics import sinput as sinput_mod
from ecwam_tpu.ops.physics import stokes as stokes_mod
from ecwam_tpu.ops.physics import stress as stress_mod
from ecwam_tpu.ops.physics import tables as tables_mod
from ecwam_tpu.ops.physics.tail_ice import FLMIN, imphftail, setice

XIMP = 1.0               # implicitness factor (yowstat.F90:94)


def _derive_stokfac(wavnum, depth, tb, dt):
    """STOKFAC from (k, d) (initdpthflds.F90 fills it from the same
    dispersion formulas) — lets the fused kernel path drop the stored
    (nfre, npts) row block from HBM and derive it on the fly."""
    om = jnp.asarray(np.asarray(tb.zpifr)[:, None], dt)
    akd = wavnum * depth[None, :]
    akd_s = jnp.minimum(akd, 10.0)
    sh = 2.0 * c.G * wavnum**2 / (om * jnp.tanh(2.0 * akd_s))
    dp = (2.0 / c.G) * om**3
    return jnp.where(akd <= 10.0, sh, dp)


def _derive_cgroup(wavnum, depth, tb, dt):
    """Group speed from (k, d) (same formulas as core.dispersion);
    only the sea-ice source terms consume it on the kernel path."""
    from ecwam_tpu.ops.physics import kernelmode
    om = jnp.asarray(np.asarray(tb.zpifr)[:, None], dt)
    akd = wavnum * depth[None, :]
    akd_s = jnp.minimum(akd, 10.0)
    sh = 0.5 * jnp.sqrt(c.G * jnp.tanh(akd_s) / wavnum) * (
        1.0 + 2.0 * akd_s / kernelmode.sinh(2.0 * akd_s))
    dp = (c.G / (4.0 * c.PI)) / (om / c.ZPI)
    return jnp.where(akd <= 10.0, sh, dp)


@dataclasses.dataclass(frozen=True)
class PhysicsConfig:
    """Static configuration closed over by the jitted step."""

    tables: Any               # SpectralTables
    params: pp.PhysParams
    dia: dia_mod.DiaTables
    sat_indices: np.ndarray
    sat_weights: np.ndarray
    x0tauhf: float
    wtauhf: np.ndarray
    idelt: float              # physics timestep (s)
    nfre_red: int
    icode_wnd: int = 3        # wind forcing code: 3=U10, 1=u*, 2=stress
    isnonlin: int = 1
    lbiwbk: bool = True
    licerun: bool = True
    lmaskice: bool = True
    lciscal: bool = False
    lcflx: bool = True        # compute ocean fluxes (implsch.F90:187 LCFLX)
    lwvflx_snl: bool = True   # include SNL in the flux source (mpuserin:715)
    lwamrsetci: bool = True   # sea-ice flux adjustments (mpuserin.F90:790)
    lstokes: bool = True      # surface Stokes drift (STOKESTRN)
    lstrn: bool = False       # sea-ice mean-square strain (CIMSSTRN)
    lciwa1: bool = False      # sea-ice attenuation models (SDICE1/2/3)
    lciwa2: bool = False
    lciwa3: bool = False


def make_physics_config(tables, params: pp.PhysParams, idelt: float,
                        *, nfre_red: int | None = None,
                        **kw) -> PhysicsConfig:
    nsdsnth, sat_idx, sat_w = pp.saturation_weights(
        tables.nang, tables.th, tables.delth)
    dia_tb = dia_mod.build_dia_tables(
        tables.nang, tables.nfre, tables.fr, tables.delth, tables.fratio)
    return PhysicsConfig(
        tables=tables, params=params, dia=dia_tb,
        sat_indices=sat_idx, sat_weights=sat_w,
        x0tauhf=tables_mod.x0_tauhf(params),
        wtauhf=tables_mod.wtauhf(params),
        idelt=idelt, nfre_red=nfre_red or tables.nfre_red, **kw)


def sinflx(icall, ncall, cfg: PhysicsConfig, fl1, env, frc, flm,
           fmean, halp, ufric, tauw, tauwdir, z0m, z0b, chrnck,
           *, lupdtus=True):
    """One stress/input iteration (sinflx.F90:190-260).

    Returns dict with updated fl1 (tail floor applied on call 1), stress
    state, input source arrays and the prognostic cut.
    """
    params = cfg.params
    tb = cfg.tables
    dt = fl1.dtype
    raorw = jnp.maximum(frc["aird"], 1.0) * c.ROWATERM1
    th = jnp.asarray(tb.th, dt)[:, None]
    coswdif = jnp.cos(th - frc["wdwave"][None, :])
    sinwdif2 = jnp.sin(th - frc["wdwave"][None, :]) ** 2

    if params.llnormagam and params.llcapchnk:
        rnfac = 1.0 + params.dthrn_a * (
            1.0 + jnp.tanh(frc["wswave"] - params.dthrn_u))
    else:
        rnfac = jnp.ones_like(frc["wswave"])

    if lupdtus:
        if icall == 1:
            # raise tail noise floor (sinflx.F90:112-115); concat form —
            # scalar-index update lowers to scatter, which Mosaic lacks
            fl1 = jnp.concatenate(
                [fl1[:, :-1, :],
                 jnp.maximum(fl1[:, -1:, :], flm[:, None, :])], axis=1)
            if params.llgcbz0:
                halp = gc_mod.halphap(
                    fl1, env["wavnum"], coswdif, tb, params)
            else:
                halp = jnp.zeros_like(fmean)
        wswave, ufric, z0m, z0b, chrnck = airsea_mod.airsea(
            frc["wswave"], frc["wdwave"], tauw, tauwdir, ufric, params,
            icode_wnd=cfg.icode_wnd, iusfg=0 if icall == 1 else 1,
            halp=halp, rnfac=rnfac)
        if cfg.icode_wnd in (1, 2):
            # u*-driven forcing: AIRSEA derives U10 from the log profile
            # (airsea.F90 ICODE 1/2) and the new U10 feeds the rest of
            # the chain (the reference's INOUT WSWAVE)
            frc = dict(frc, wswave=wswave)

    ngst = 1 if icall < ncall else 2
    llsneg = icall >= ncall
    llphiwa = icall >= ncall

    sinput = (sinput_mod.sinput_ard if params.iphys == 1
              else sinput_mod.sinput_jan)
    fld, sl, spos, xllws = sinput(
        fl1, env["wavnum"], env["cinv"], env["xk2cg"],
        frc["wdwave"], frc["wswave"], ufric, z0m,
        coswdif, sinwdif2, raorw, frc["wstar"], rnfac,
        tb, params, ngst=ngst, llsneg=llsneg)

    _, fmeanws = means_mod.femeanws(fl1, xllws, tb)
    mij, rhowgdfth = stress_mod.frcutindex(
        fmean, fmeanws, ufric, frc["cicover"], tb, params)
    tauw, tauwdir, phiwa = stress_mod.stresso(
        fl1, sl, spos, env["cinv"], mij, rhowgdfth,
        frc["wdwave"], ufric, z0m, frc["aird"], rnfac, coswdif, sinwdif2,
        tb, params, x0tauhf=cfg.x0tauhf, wtauhf=cfg.wtauhf, llphiwa=llphiwa)

    return dict(
        fl1=fl1, wswave=frc["wswave"], ufric=ufric, tauw=tauw,
        tauwdir=tauwdir,
        z0m=z0m, z0b=z0b, chrnck=chrnck, halp=halp,
        fld=fld, sl=sl, spos=spos, xllws=xllws,
        mij=mij, rhowgdfth=rhowgdfth, fmeanws=fmeanws, phiwa=phiwa,
        coswdif=coswdif, raorw=raorw, rnfac=rnfac)


def implsch(cfg: PhysicsConfig, fl1, env, frc,
            ufric, tauw, tauwdir, z0m, z0b, chrnck):
    """One full physics step of Δt=idelt (implsch.F90:120-360).

    Returns (fl1_new, state_dict) where state_dict carries the updated
    stress fields and diagnostics.
    """
    params = cfg.params
    tb = cfg.tables
    dt = fl1.dtype
    delt = cfg.idelt
    deltm = 1.0 / delt
    delt5 = XIMP * delt

    if cfg.lbiwbk:
        fl1 = means_mod.sdepthlim(fl1, env["emaxdpt"], tb)

    emean, fmean, f1mean, akmean, xkmean = means_mod.fkmean(
        fl1, env["wavnum"], tb)

    th = jnp.asarray(tb.th, dt)[:, None]
    coswdif = jnp.cos(th - frc["wdwave"][None, :])
    flm = (1.0 - 0.9 * jnp.minimum(frc["cicover"], 0.99))[None, :] * \
        FLMIN * jnp.maximum(0.0, coswdif) ** 2        # (nang, npts)

    halp = jnp.zeros_like(fmean)
    st = None
    for icall in (1, 2):
        st = sinflx(icall, 2, cfg, fl1, env, frc, flm, fmean, halp,
                    ufric, tauw, tauwdir, z0m, z0b, chrnck)
        fl1, ufric, tauw, tauwdir = (
            st["fl1"], st["ufric"], st["tauw"], st["tauwdir"])
        if cfg.icode_wnd in (1, 2):
            frc = dict(frc, wswave=st["wswave"])
        z0m, z0b, chrnck, halp = st["z0m"], st["z0b"], st["chrnck"], st["halp"]
    fld, sl = st["fld"], st["sl"]
    mij, xllws, fmeanws = st["mij"], st["xllws"], st["fmeanws"]

    if params.iphys == 1:
        fld, sl = sdissip_mod.sdissip_ard(
            fl1, fld, sl, env["wavnum"], env.get("cgroup"), env["xk2cg"],
            ufric, st["coswdif"], st["raorw"], tb, params,
            cfg.sat_indices, cfg.sat_weights)
    else:
        fld, sl = sdissip_mod.sdissip_jan(
            fl1, fld, sl, env["wavnum"], emean, f1mean, xkmean, tb, params)

    # save the flux-relevant source contribution (implsch.F90:281-306)
    ssource = sl if (cfg.lcflx and not cfg.lwvflx_snl) else None

    fld, sl = dia_mod.snonlin(
        fl1, fld, sl, env["wavnum"], env["depth"], akmean, tb, cfg.dia,
        isnonlin=cfg.isnonlin)

    if cfg.lcflx and cfg.lwvflx_snl:
        # modulate by the implicit factor (implsch.F90:297-305)
        ssource = sl / jnp.maximum(1.0 - delt5 * fld, 1.0)

    fld, sl = shallow_mod.sdiwbk(
        fl1, fld, sl, env["depth"], env["emaxdpt"], emean, f1mean,
        cfg.nfre_red, lbiwbk=cfg.lbiwbk)

    if cfg.licerun and cfg.lciscal:
        beta = (1.0 - frc["cicover"])[None, None, :]
        sl = beta * sl
        fld = beta * fld

    if cfg.licerun and (cfg.lciwa1 or cfg.lciwa2 or cfg.lciwa3):
        from ecwam_tpu.ops.physics import sdice as sdice_mod
        cithick = frc.get("cithick", jnp.zeros_like(frc["cicover"]))
        cgroup = env.get("cgroup")
        if cgroup is None:
            cgroup = _derive_cgroup(env["wavnum"], env["depth"], tb, dt)
        fld, sl, _slice = sdice_mod.sdice(
            fl1, fld, sl, env["wavnum"], cgroup, frc["cicover"],
            cithick, tb, cfg.idelt,
            lciwa1=cfg.lciwa1, lciwa2=cfg.lciwa2, lciwa3=cfg.lciwa3)

    fld, sl = shallow_mod.sbottom(
        fl1, fld, sl, env["wavnum"], env["depth"], cfg.nfre_red)

    # ---- semi-implicit update with growth limiter (implsch.F90:260-300)
    cofrm4 = jnp.asarray(tb.cofrm4, dt)[None, :, None]
    usfm = (ufric * jnp.maximum(fmeanws, fmean))[None, None, :]
    temp = usfm * (cofrm4 * delt)
    gtemp1 = jnp.maximum(1.0 - delt5 * fld, 1.0)
    gtemp2 = delt * sl / gtemp1
    flhab = jnp.minimum(jnp.abs(gtemp2), temp)
    fl1 = fl1 + jnp.sign(gtemp2) * flhab
    fl1 = jnp.maximum(fl1, flm[:, None, :])
    flmax = jnp.asarray(_flmax(tb, params), dt)[None, :, None]
    if ssource is not None:
        # cap contribution enters the flux source (implsch.F90:375,390)
        ssource = ssource + deltm * jnp.minimum(flmax - fl1, 0.0)
    fl1 = jnp.minimum(fl1, flmax)

    flux_diag = {}
    if cfg.lcflx:
        flux_diag = fluxes_mod.wnfluxes(
            ssource, env["cinv"], st["rhowgdfth"], frc["cicover"],
            st["phiwa"], emean, f1mean, frc["wswave"], frc["wdwave"],
            ufric, frc["aird"], tb, params,
            licerun=cfg.licerun, lwamrsetci=cfg.lwamrsetci)

    emean, fmean, f1mean, akmean, xkmean = means_mod.fkmean(
        fl1, env["wavnum"], tb)
    emeanws, fmeanws = means_mod.femeanws(fl1, xllws, tb)

    fl1 = imphftail(fl1, mij, flm, env["wavnum"], env["xk2cg"])

    wsemean = jnp.where(emeanws < c.WSEMEAN_MIN, c.WSEMEAN_MIN, emeanws)
    wsfmean = jnp.where(emeanws < c.WSEMEAN_MIN, 2.0 * tb.fr[-1], fmeanws)

    if cfg.licerun and cfg.lmaskice:
        fl1 = setice(fl1, frc["cicover"], st["coswdif"])

    state = dict(
        **({"wswave": frc["wswave"]} if cfg.icode_wnd in (1, 2) else {}),
        ufric=ufric, tauw=tauw, tauwdir=tauwdir, z0m=z0m, z0b=z0b,
        chrnck=chrnck, mij=mij, xllws=xllws, phiwa=st["phiwa"],
        emean=emean, fmean=fmean, f1mean=f1mean, akmean=akmean,
        xkmean=xkmean, emeanws=emeanws, fmeanws=fmeanws,
        wsemean=wsemean, wsfmean=wsfmean, **flux_diag)

    if cfg.lstokes:
        cithick = frc.get("cithick", jnp.zeros_like(frc["cicover"]))
        stokfac = env.get("stokfac")
        if stokfac is None:
            stokfac = _derive_stokfac(env["wavnum"], env["depth"], tb, dt)
        state.update(stokes_mod.stokestrn(
            fl1, env["wavnum"], stokfac, env["depth"],
            frc["wswave"], frc["wdwave"], frc["cicover"], cithick, tb,
            licerun=cfg.licerun, lwamrsetci=cfg.lwamrsetci,
            lstrn=cfg.lstrn))
    return fl1, state


def _flmax(tb, params: pp.PhysParams) -> np.ndarray:
    """Spectral cap FLMAX(m) = (ALPHAPMAX/π)/((2π)⁴g⁻²·fr⁵) (initmdl.F90:468)."""
    return (params.alphapmax / c.PI) / (c.ZPI4GM2 * tb.fr5)
