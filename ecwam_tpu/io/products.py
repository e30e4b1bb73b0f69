"""Derived output parameters (the OUTBS/OUTBLOCK catalog).

JAX re-derivations of the integrated-parameter computations of
/root/reference/src/ecwam/outblock.F90:153-612 and the helpers it calls
(femean, sthq, dominant_period, sepwisw, wdirspread, kurtosis, sebtmean,
weflux, cimsstrn, ctcor, meansqs, mwp1/mwp2, outbeta).  Parameter names
follow /root/reference/share/ecwam/parameters.yml (numeric-only names get a
``p`` prefix, e.g. ``p042`` = swell partition 1 wave height).

Direction convention: output directions are degrees in meteorological
convention ``mod(deg·θ + 180, 360)`` (outblock.F90:186).

Point-field functions take fl1 (nang, nfre, npts) and return (npts,).
``compute()`` takes a :class:`ProductContext` so expensive intermediates
(windsea/swell separation, kurtosis chain, swell-train partitioning) are
evaluated once and shared across the requested fields.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.core import spectral as sp
from ecwam_tpu.io import extremes
from ecwam_tpu.ops.physics import gc as gc_mod
from ecwam_tpu.ops.physics import means as means_mod
from ecwam_tpu.ops.physics import stokes as stokes_mod

OLDWSFC = 1.2       # windsea-threshold wind factor (yowfred.F90:82)
FRIC = 28.0         # friction scaling (yowfred.F90:81)

# significant-wave-height period bands '064'..'069' (IPRMINFO cols 4/5;
# descriptions in parameters.yml: 10-12, 12-14, 14-17, 17-21, 21-25, 25-30 s)
TEWH_BANDS = ((10.0, 12.0), (12.0, 14.0), (14.0, 17.0),
              (17.0, 21.0), (21.0, 25.0), (25.0, 30.0))


def swh(fl1, tb):
    em, _ = means_mod.femean(fl1, tb)
    return 4.0 * jnp.sqrt(jnp.maximum(em, 0.0))


def mean_direction(fl1, tb):
    """THQ in radians (sthq.F90:40-75)."""
    dt = fl1.dtype
    dfim = jnp.asarray(tb.dfim, dt)[None, :, None]
    temp = jnp.sum(fl1 * dfim, axis=1)            # (nang, npts)
    si = jnp.sum(jnp.asarray(tb.sinth, dt)[:, None] * temp, axis=0)
    ci = jnp.sum(jnp.asarray(tb.costh, dt)[:, None] * temp, axis=0)
    ci = jnp.where(ci == 0.0, c.EPSMIN, ci)
    thq = jnp.arctan2(si, ci)
    return jnp.where(thq < 0.0, thq + c.ZPI, thq)


def to_met_deg(theta):
    """Radians → meteorological degrees (outblock.F90:186)."""
    return jnp.mod(c.DEG * theta + 180.0, 360.0)


def mwd(fl1, tb):
    return to_met_deg(mean_direction(fl1, tb))


def mwp(fl1, tb, zmiss: float = c.ZMISS):
    _, fm = means_mod.femean(fl1, tb)
    return jnp.where(fm > 0.0, 1.0 / fm, zmiss)


def pp1d(fl1, tb, zmiss: float = c.ZMISS):
    """Dominant period (dominant_period.F90:42-85)."""
    dt = fl1.dtype
    fcrop = 0.1 * jnp.max(fl1, axis=(0, 1), keepdims=True)
    f1d4 = jnp.sum(jnp.where(fl1 > fcrop, fl1, 0.0), axis=0) * tb.delth
    f1d4 = f1d4**4                                # (nfre, npts)
    em = jnp.sum(jnp.asarray(tb.dfim, dt)[:, None] * f1d4, axis=0)
    dp = jnp.sum(jnp.asarray(tb.dfimfr, dt)[:, None] * f1d4, axis=0)
    good = (em > 0.0) & (dp > c.EPSMIN)
    return jnp.where(good, em / jnp.where(good, dp, 1.0), 0.0)


def wind_direction(wdwave):
    return jnp.mod(c.DEG * wdwave + 180.0, 360.0)


def cdww(u10, ustar, z0b, chrnck, params, *, llgcbz0: bool = False):
    """Drag coefficient from the wave-modified Charnock (outbeta.F90:58-80)."""
    if llgcbz0:
        alphamax_u10 = pp.ALPHAMAX
    else:
        alphamax_u10 = jnp.minimum(pp.ALPHAMAX, 0.02 + 0.01 * u10)
    usm = 1.0 / jnp.maximum(ustar, c.EPSUS)
    betam = jnp.maximum(jnp.minimum(chrnck, alphamax_u10), params.alphamin)
    z0atm = pp.RNUM * usm + c.GM1 * betam * ustar**2
    cd = (pp.XKAPPA / jnp.log(1.0 + pp.XNLEV / z0atm)) ** 2
    return jnp.minimum(cd, 0.01)


def _simpson_period(fl1, tb, moment_weight, tail_coef, sqrt_out: bool):
    dt = fl1.dtype
    nfre_odd = tb.nfre - 1 + tb.nfre % 2
    temp = jnp.sum(fl1[:, :nfre_odd], axis=0)     # (nfre_odd, npts)
    em = jnp.sum(jnp.asarray(tb.dfim_sim[:nfre_odd], dt)[:, None] * temp,
                 axis=0)
    mw = jnp.sum(jnp.asarray(moment_weight[:nfre_odd], dt)[:, None] * temp,
                 axis=0)
    t_last = temp[-1]
    delt25 = sp.WETAIL * tb.fr[nfre_odd - 1] * tb.delth
    em = em + delt25 * t_last
    mw = mw + tail_coef * t_last
    good = (em > 0.0) & (mw > c.EPSMIN)
    ratio = em / jnp.where(good, mw, 1.0)
    if sqrt_out:
        ratio = jnp.sqrt(ratio)
    return jnp.where(good, jnp.minimum(ratio, 1.0 / tb.fr[0]), 0.0)


def mwp1(fl1, tb):
    """Mean period from the f-moment, Simpson rule (mwp1.F90:55-95)."""
    nfre_odd = tb.nfre - 1 + tb.nfre % 2
    coef = sp.WP1TAIL * tb.delth * tb.fr[nfre_odd - 1] ** 2
    return _simpson_period(fl1, tb, tb.dfimfr_sim, coef, sqrt_out=False)


def mwp2(fl1, tb):
    """Mean period from the f²-moment, Simpson rule (mwp2.F90:48-90)."""
    nfre_odd = tb.nfre - 1 + tb.nfre % 2
    coef = sp.WP2TAIL * tb.delth * tb.fr[nfre_odd - 1] ** 3
    return _simpson_period(fl1, tb, tb.dfimfr2_sim, coef, sqrt_out=True)


# ---------------------------------------------------------------------------
# directional spread (wdirspread.F90 + peakfri.F90 + scosfl.F90)
# ---------------------------------------------------------------------------

def _scosfl_at(fl1, m_index, tb):
    """Mean-direction cosine Fourier coefficient at per-point frequency
    index ``m_index`` (scosfl.F90:90-120)."""
    dt = fl1.dtype
    npts = fl1.shape[2]
    fm = jnp.take_along_axis(
        fl1, m_index[None, None, :].astype(jnp.int32), axis=1)[:, 0]
    sinth = jnp.asarray(tb.sinth, dt)[:, None]
    costh = jnp.asarray(tb.costh, dt)[:, None]
    si = jnp.sum(sinth * fm, axis=0)
    ci = jnp.sum(costh * fm, axis=0)
    meandir = jnp.where((ci == 0.0) & (si == 0.0), 0.0, jnp.arctan2(si, ci))
    th = jnp.asarray(tb.th, dt)[:, None]
    return tb.delth * jnp.sum(jnp.cos(th - meandir[None, :]) * fm, axis=0)


def wdirspread(fl1, emean, tb, *, llpeakf: bool = True):
    """Directional width σ=√(2(1−R1)) (wdirspread.F90:98-158)."""
    dt = fl1.dtype
    if llpeakf:
        # peak of the 1-D spectrum (peakfri.F90:84-115)
        f1d = jnp.sum(fl1, axis=0) * tb.delth        # (nfre, npts)
        ipeak = jnp.argmax(f1d, axis=0)
        epeak = jnp.max(f1d, axis=0)
        r1 = _scosfl_at(fl1, ipeak, tb)
        spread = jnp.where(epeak > 0.0,
                           jnp.minimum(r1 / jnp.where(epeak > 0.0, epeak,
                                                      1.0), 1.0), 1.0)
    else:
        dfim = jnp.asarray(tb.dfim, dt)
        acc = jnp.zeros(fl1.shape[2], dt)
        for m in range(tb.nfre):
            acc = acc + _scosfl_at(
                fl1, jnp.full((fl1.shape[2],), m), tb) * float(tb.dfim[m])
        temp = _scosfl_at(fl1, jnp.full((fl1.shape[2],), tb.nfre - 1), tb)
        acc = acc / tb.delth + temp * (sp.WETAIL * tb.fr[-1])
        spread = jnp.where(emean > c.EPSMIN,
                           jnp.minimum(acc / jnp.maximum(emean, c.EPSMIN),
                                       1.0), 1.0)
    return jnp.sqrt(2.0 * jnp.maximum(1.0 - spread, 0.0))


# ---------------------------------------------------------------------------
# windsea / swell separation (sepwisw.F90:120-300)
# ---------------------------------------------------------------------------

def _connect_windsea_boundary(swm, fl1):
    """Topological connection of the windsea low-frequency boundary
    (sepwisw.F90:212-222): scanning from the highest frequency, while no
    two adjacent swell bins were met, a swell bin below a windsea bin with
    no greater energy is re-assigned to windsea."""
    nfre = swm.shape[1]
    new = [swm[:, nfre - 1]]
    stopped = jnp.zeros_like(swm[:, 0], dtype=bool)
    cur = swm[:, nfre - 1]
    for m in range(nfre - 1, 0, -1):
        prev = swm[:, m - 1]
        stopped = stopped | ((cur == 1.0) & (prev == 1.0))
        drop = (~stopped) & (cur == 0.0) & (prev == 1.0) & \
            (fl1[:, m] >= fl1[:, m - 1])
        prev = jnp.where(drop, 0.0, prev)
        new.append(prev)
        cur = prev
    return jnp.stack(new[::-1], axis=1)


def sepwisw(fl1, xllws, cinv, ufric, wswave, wdwave, tb):
    """Windsea/swell split and both parameter sets (sepwisw.F90:120-300).

    Returns dict with eswell/fswell/thswell/p1swell/p2swell/sprdswell,
    esea/fsea/thwisea/p1sea/p2sea/sprdsea, the swell mask ``swm`` and the
    swell spectrum ``flsw`` (inputs to the train partitioning).
    """
    dt = fl1.dtype
    coef = OLDWSFC * FRIC
    th = jnp.asarray(tb.th, dt)[:, None]
    coswdif = jnp.cos(th - wdwave[None, :])          # (nang, npts)
    xinvwvage = ufric[None, :] * cinv                # (nfre, npts)
    dircoef = coef * coswdif                         # (nang, npts)

    checkta = xinvwvage[None, :, :] * dircoef[:, None, :]
    swm = jnp.where((xllws != 0.0) | (checkta >= 1.0), 0.0, 1.0)

    # consistency check: swell mean freq must stay below windsea's
    # (sepwisw.F90:161-209)
    f_sw = fl1 * swm
    esw, fsw = means_mod.femean(f_sw, tb)
    ese, fse = means_mod.femean(jnp.maximum(fl1 - f_sw, 0.0), tb)
    r = (fsw > 0.96 * fse).astype(dt)
    dircoef2 = r[None, :] * coef * jnp.sign(0.4 + coswdif)
    checkta2 = xinvwvage[None, :, :] * dircoef2[:, None, :]
    swm = jnp.where(checkta2 >= 1.0, 0.0, swm)
    swm = _connect_windsea_boundary(swm, fl1)

    flsw = jnp.maximum(fl1, c.EPSMIN) * swm
    eswell, fswell = means_mod.femean(flsw, tb)
    thswell = mean_direction(flsw, tb)
    p1swell = mwp1(flsw, tb)
    p2swell = mwp2(flsw, tb)
    sprdswell = wdirspread(flsw, eswell, tb)

    # windsea with direction-noise seeding (sepwisw.F90:269-280)
    m_idx = np.arange(tb.nfre)[None, :, None]
    noise_zone = jnp.asarray(m_idx >= tb.nfre // 2) & \
        (coswdif[:, None, :] > 0.8)
    fsea_sp = jnp.where(
        noise_zone,
        jnp.maximum(fl1 - flsw + c.EPSMIN * coswdif[:, None, :] ** 4, 0.0),
        jnp.maximum(fl1 - flsw, 0.0))
    esea, fsea = means_mod.femean(fsea_sp, tb)
    thwisea = mean_direction(fsea_sp, tb)
    thwisea = jnp.where(esea <= 1.0e-9, wdwave, thwisea)
    p1sea = mwp1(fsea_sp, tb)
    p2sea = mwp2(fsea_sp, tb)
    sprdsea = wdirspread(fsea_sp, esea, tb)

    return dict(eswell=eswell, fswell=fswell, thswell=thswell,
                p1swell=p1swell, p2swell=p2swell, sprdswell=sprdswell,
                esea=esea, fsea=fsea, thwisea=thwisea,
                p1sea=p1sea, p2sea=p2sea, sprdsea=sprdsea,
                swm=swm, flsw=flsw, coswdif=coswdif)


# ---------------------------------------------------------------------------
# period-band wave heights (sebtmean.F90:80-200, se10mean.F90:63-70)
# ---------------------------------------------------------------------------

def sebtmean(fl1, tb, tbot: float, ttop: float):
    """Variance between periods [tbot, ttop] s, trapezoid over the 1-D
    spectrum with interpolated band edges and f⁻⁵ tail (sebtmean.F90)."""
    dt = fl1.dtype
    fr = np.asarray(tb.fr, np.float64)
    nfre = tb.nfre
    fbot_r = 1.0 / max(ttop, 1e-10)          # lower frequency bound
    fcutb_ft = min(fbot_r, fr[-1])
    fcutb = max(fr[0], fcutb_ft)
    fbot = max(fbot_r, fr[-1])
    mcutb = 0
    while fr[mcutb] < fcutb and mcutb < nfre - 1:
        mcutb += 1
    ftop_r = 1.0 / max(tbot, 1e-10)
    fcutt = max(fr[0], min(ftop_r, fr[-1]))
    ftop = max(ftop_r, fr[-1])
    mcutt = nfre - 1
    while fr[mcutt] > fcutt and mcutt > 0:
        mcutt -= 1
    if fcutb == fcutt:
        mcutt = mcutb - 1

    f1d_all = jnp.sum(fl1, axis=0) * tb.delth        # (nfre, npts)
    ebt = jnp.full(fl1.shape[2], c.EPSMIN, dt)

    frloc = fr.copy()
    f1d = {m: f1d_all[m] for m in range(nfre)}
    if mcutb > 0:
        frloc[mcutb - 1] = fcutb
        wl = (fr[mcutb] - fcutb) / (fr[mcutb] - fr[mcutb - 1])
        f1d[mcutb - 1] = wl * f1d_all[mcutb - 1] + (1.0 - wl) * f1d_all[mcutb]
    if mcutt < nfre - 1:
        frloc[mcutt + 1] = fcutt
        wl = (fr[mcutt + 1] - fcutt) / (fr[mcutt + 1] - fr[mcutt])
        f1d[mcutt + 1] = wl * f1d_all[mcutt] + (1.0 - wl) * f1d_all[mcutt + 1]

    for m in range(max(mcutb - 1, 0), min(mcutt, nfre - 2) + 1):
        df = 0.5 * (frloc[m + 1] - frloc[m])
        ebt = ebt + df * (f1d[m + 1] + f1d[m])

    if fcutb_ft < fcutb and fcutb == fr[0]:
        wl = (fr[0] - fcutb_ft) / fr[0]
        df = 0.5 * (fr[0] - fcutb_ft) * (1.0 + (1.0 - wl))
        ebt = ebt + df * f1d[0]

    if fbot < ftop:
        zw = 0.25 * float(tb.fr5[-1]) * (1.0 / fbot**4 - 1.0 / ftop**4)
        ebt = ebt + zw * f1d_all[nfre - 1]
    return ebt


def se10mean(fl1, tb):
    """Variance of waves with period > 10 s (se10mean.F90:63-70)."""
    return sebtmean(fl1, tb, 10.0, 1.0 / float(tb.fr[0]))


# ---------------------------------------------------------------------------
# wave energy flux, crest-trough correlation
# ---------------------------------------------------------------------------

def weflux(fl1, cgroup, tb):
    """Wave energy flux magnitude (W/m) and mean direction
    (weflux.F90:95-180)."""
    dt = fl1.dtype
    fcg = fl1 * cgroup[None, :, :]
    dfim = jnp.asarray(tb.dfim, dt)[None, :, None]
    sinth = jnp.asarray(tb.sinth, dt)[:, None]
    costh = jnp.asarray(tb.costh, dt)[:, None]
    mag = jnp.sum(fcg * dfim, axis=(0, 1))
    wefx = jnp.sum(jnp.sum(fcg * dfim, axis=1) * sinth, axis=0)
    wefy = jnp.sum(jnp.sum(fcg * dfim, axis=1) * costh, axis=0)
    # f⁻⁵ tail: group velocity → g/(4πf) deep-water weight (weflux.F90:137-155)
    delt = sp.FRTAIL * tb.delth * c.G / (2.0 * c.ZPI)
    t_last = fl1[:, -1, :]
    mag = mag + delt * jnp.sum(t_last, axis=0)
    wefx = wefx + delt * jnp.sum(t_last * sinth, axis=0)
    wefy = wefy + delt * jnp.sum(t_last * costh, axis=0)
    mag = c.ROWATER * c.G * mag
    wefy = jnp.where(wefy == 0.0, c.EPSMIN, wefy)
    wdir = jnp.arctan2(wefx, wefy)
    wdir = jnp.where(wdir < 0.0, wdir + c.ZPI, wdir)
    return mag, wdir


def ctcor(fl1, tb, zmiss: float = c.ZMISS):
    """Crest-trough correlation / spectral width index (ctcor.F90:68-120)."""
    dt = fl1.dtype
    temp = jnp.sum(fl1, axis=0)                  # (nfre, npts)
    dfim = jnp.asarray(tb.dfim, dt)[:, None]
    dfimfr = jnp.asarray(tb.dfimfr, dt)[:, None]
    em = jnp.sum(temp * dfim, axis=0)
    zt1 = jnp.sum(temp * dfimfr, axis=0)
    zt1 = jnp.where(zt1 > 0.0,
                    jnp.minimum(em / jnp.where(zt1 > 0.0, zt1, 1.0),
                                1.0 / tb.fr[0]), 0.0)
    zarg = c.PI * jnp.asarray(tb.fr, dt)[:, None] * zt1[None, :]
    zamp = dfim * temp
    zrho = jnp.sum(zamp * jnp.cos(zarg), axis=0)
    zlam = jnp.sum(zamp * jnp.sin(zarg), axis=0)
    return jnp.where(em > 0.0,
                     jnp.sqrt(zrho**2 + zlam**2)
                     / jnp.where(em > 0.0, em, 1.0), zmiss)


# ---------------------------------------------------------------------------
# ProductContext + catalog
# ---------------------------------------------------------------------------

class ProductContext:
    """Everything the catalog functions need for one output instant.

    ``state`` is the physics-step state dict (mij, xllws, stress fields,
    fluxes, Stokes drift) merged with the stress state; ``env`` the depth
    property tables (wavnum/cgroup/cinv/depth/stokfac, shape (nfre, npts)
    or (npts,)); ``frc`` the current forcing.
    """

    def __init__(self, fl1, tb, state, frc, params, env=None, *,
                 llgcbz0: bool = False, ntrain: int = 3):
        self.fl1 = fl1
        self.tb = tb
        self.state = state or {}
        self.frc = frc
        self.params = params
        self.env = env or {}
        self.llgcbz0 = llgcbz0
        self.ntrain = ntrain

    def _zeros(self):
        return jnp.zeros(self.fl1.shape[2], self.fl1.dtype)

    @functools.cached_property
    def sep(self):
        st, frc = self.state, self.frc
        if "sep" in st:
            # precomputed per-point windsea/swell rows from the chunked
            # full-mode physics step (fusedstep.phys_srl_full_chunked —
            # the at-scale path that never materializes global xllws)
            return dict(st["sep"])
        xllws = st.get("xllws")
        if xllws is None:
            xllws = jnp.zeros_like(self.fl1)
        return sepwisw(self.fl1, xllws, self.env["cinv"], st["ufric"],
                       frc["wswave"], frc["wdwave"], self.tb)

    @functools.cached_property
    def kurt(self):
        return extremes.kurtosis(self.fl1, self.env["depth"], self.tb)

    @functools.cached_property
    def wef(self):
        return weflux(self.fl1, self.env["cgroup"], self.tb)

    @functools.cached_property
    def trains(self):
        """Swell-train partitioning (sep3tr.F90) — host NumPy at output
        cadence; see ecwam_tpu.io.partition."""
        from ecwam_tpu.io import partition
        st = self.state
        sep = {k: np.asarray(v) for k, v in self.sep.items()}
        if "swm" not in sep:
            # the chunked full-mode state keeps only per-point rows; the
            # partitioning needs the per-bin swell mask — recompute it
            # from xllws (small grids), or it is a documented de-scope
            # at operational scale (the field would not fit HBM)
            if "xllws" not in st:
                raise NotImplementedError(
                    "swell-train products need the per-bin swell mask; "
                    "not available from the chunked full-mode step")
            full = sepwisw(self.fl1, st["xllws"], self.env["cinv"],
                           st["ufric"], self.frc["wswave"],
                           self.frc["wdwave"], self.tb)
            sep = {k: np.asarray(v) for k, v in full.items()}
        mij = np.asarray(st["mij"]).astype(np.int32)
        return partition.sep3tr(
            np.asarray(self.fl1), mij, sep,
            np.asarray(self.frc["wswave"]), np.asarray(self.frc["wdwave"]),
            self.tb, ntrain=self.ntrain)

    @functools.cached_property
    def coswdif(self):
        th = jnp.asarray(self.tb.th, self.fl1.dtype)[:, None]
        return jnp.cos(th - self.frc["wdwave"][None, :])


def _period(f, zmiss=c.ZMISS):
    return lambda ctx: jnp.where(f(ctx) > 0.0,
                                 1.0 / jnp.maximum(f(ctx), c.EPSMIN), zmiss)


def _hs_of(key):
    return lambda ctx: 4.0 * jnp.sqrt(jnp.maximum(ctx.sep[key], 0.0))


def _train(field, i):
    def fn(ctx):
        v = ctx.trains[field][:, i]
        if field == "thtrain":
            return to_met_deg(jnp.asarray(v, ctx.fl1.dtype))
        if field == "emtrain":
            return 4.0 * jnp.sqrt(np.maximum(v, 0.0))
        return jnp.asarray(v, ctx.fl1.dtype)
    return fn


CATALOG = {
    # --- core integrated parameters (outblock.F90:223-300)
    "swh": lambda ctx: swh(ctx.fl1, ctx.tb),
    "mwd": lambda ctx: mwd(ctx.fl1, ctx.tb),
    "mwp": lambda ctx: mwp(ctx.fl1, ctx.tb),
    "ustar": lambda ctx: ctx.state["ufric"],
    "dwi": lambda ctx: wind_direction(ctx.frc["wdwave"]),
    "pp1d": lambda ctx: pp1d(ctx.fl1, ctx.tb),
    "cdww": lambda ctx: cdww(ctx.frc["wswave"], ctx.state["ufric"],
                             ctx.state["z0b"], ctx.state["chrnck"],
                             ctx.params, llgcbz0=ctx.llgcbz0),
    "tauw_over_ust2": lambda ctx: ctx.state["tauw"]
    / jnp.maximum(ctx.state["ufric"] ** 2, c.EPSUS),
    # default cutoff is the last gravity-capillary wavenumber
    # (userin.F90:1213-1216)
    "msqs": lambda ctx: gc_mod.meansqs(
        float(gc_mod.gc_tables().xk[-1]), ctx.fl1, ctx.env["wavnum"],
        ctx.state["ufric"], ctx.coswdif, ctx.tb, ctx.params),
    # mss over the model prognostic range only (outblock.F90:605-609)
    "msqs_mod": lambda ctx: gc_mod.meansqs(
        float((c.ZPI * ctx.tb.fr[-1]) ** 2 / c.G), ctx.fl1,
        ctx.env["wavnum"], ctx.state["ufric"], ctx.coswdif, ctx.tb,
        ctx.params),
    "wind": lambda ctx: ctx.frc["wswave"],
    # --- windsea / swell (outblock.F90:302-345, 23-28)
    "shww": _hs_of("esea"),
    "shts": _hs_of("eswell"),
    "mdww": lambda ctx: to_met_deg(ctx.sep["thwisea"]),
    "mdts": lambda ctx: to_met_deg(ctx.sep["thswell"]),
    "mpww": lambda ctx: jnp.where(ctx.sep["fsea"] > 0.0,
                                  1.0 / jnp.maximum(ctx.sep["fsea"],
                                                    c.EPSMIN), c.ZMISS),
    "mpts": lambda ctx: jnp.where(ctx.sep["fswell"] > 0.0,
                                  1.0 / jnp.maximum(ctx.sep["fswell"],
                                                    c.EPSMIN), c.ZMISS),
    "p1ww": lambda ctx: ctx.sep["p1sea"],
    "p1ps": lambda ctx: ctx.sep["p1swell"],
    "p2ww": lambda ctx: ctx.sep["p2sea"],
    "p2ps": lambda ctx: ctx.sep["p2swell"],
    "dwww": lambda ctx: ctx.sep["sprdsea"],
    "dwps": lambda ctx: ctx.sep["sprdswell"],
    # --- moments / widths
    "mp1": lambda ctx: mwp1(ctx.fl1, ctx.tb),
    "mp2": lambda ctx: mwp2(ctx.fl1, ctx.tb),
    "wdw": lambda ctx: wdirspread(
        ctx.fl1, means_mod.femean(ctx.fl1, ctx.tb)[0], ctx.tb,
        llpeakf=False),
    # --- freak-wave / extremes (kurtosis.F90)
    "wsk": lambda ctx: ctx.kurt["c4"],
    "bfi": lambda ctx: ctx.kurt["bfi2"],
    "wsp": lambda ctx: ctx.kurt["qp"],
    "hmax": lambda ctx: ctx.kurt["hmax"],
    "tmax": lambda ctx: ctx.kurt["tmax"],
    "p057": lambda ctx: ctx.kurt["c3"],
    "p070": lambda ctx: ctx.kurt["eta_m"],
    "p071": lambda ctx: ctx.kurt["r"],
    "p072": lambda ctx: ctx.kurt["xnslc"],
    # --- bathymetry / environment
    "wmb": lambda ctx: ctx.env["depth"],
    "p053": lambda ctx: ctx.frc["aird"],
    "p054": lambda ctx: ctx.frc["wstar"],
    "ci": lambda ctx: ctx.frc["cicover"],
    "p056": lambda ctx: ctx.frc.get("cithick", ctx._zeros()),
    "ocu": lambda ctx: ctx.frc.get("ucur", ctx._zeros()),
    "vcu": lambda ctx: ctx.frc.get("vcur", ctx._zeros()),
    # --- Stokes drift & air-sea fluxes (state from implsch)
    "ust": lambda ctx: ctx.state["ustokes"],
    "vst": lambda ctx: ctx.state["vstokes"],
    "p039": lambda ctx: ctx.state["phieps"],
    "p040": lambda ctx: ctx.state["phiaw"],
    "p041": lambda ctx: ctx.state["tauoc"],
    "p073": lambda ctx: ctx.state["tauxd"],
    "p074": lambda ctx: ctx.state["tauyd"],
    "p075": lambda ctx: ctx.state["tauocxd"],
    "p076": lambda ctx: ctx.state["tauocyd"],
    "p077": lambda ctx: jnp.maximum(-ctx.state["phiocd"], 0.0),
    # --- swell trains '042'-'050'
    "p042": _train("emtrain", 0), "p043": _train("thtrain", 0),
    "p044": _train("pmtrain", 0),
    "p045": _train("emtrain", 1), "p046": _train("thtrain", 1),
    "p047": _train("pmtrain", 1),
    "p048": _train("emtrain", 2), "p049": _train("thtrain", 2),
    "p050": _train("pmtrain", 2),
    # --- ice strain
    "p051": lambda ctx: stokes_mod.cimsstrn(
        ctx.fl1, ctx.env["wavnum"], ctx.env["depth"],
        ctx.frc.get("cithick", ctx._zeros()), ctx.tb),
    # --- period-band heights '052', '064'-'069'
    "p052": lambda ctx: 4.0 * jnp.sqrt(
        jnp.maximum(se10mean(ctx.fl1, ctx.tb), 0.0)),
    # --- energy flux
    "p062": lambda ctx: ctx.wef[0],
    "p063": lambda ctx: to_met_deg(ctx.wef[1]),
    # --- crest-trough correlation
    "wss": lambda ctx: ctcor(ctx.fl1, ctx.tb),
}

for _i, (_tb, _tt) in enumerate(TEWH_BANDS):
    CATALOG[f"p{64 + _i:03d}"] = (
        lambda ctx, tbv=_tb, ttv=_tt: 4.0 * jnp.sqrt(
            jnp.maximum(sebtmean(ctx.fl1, ctx.tb, tbv, ttv), 0.0)))

# legacy aliases used by earlier configs/tests
CATALOG["mwp1"] = CATALOG["mp1"]
CATALOG["mwp2"] = CATALOG["mp2"]
CATALOG["mss"] = CATALOG["msqs"]


# swell-train fields go through the host partitioning path, not jit
TRAIN_FIELDS = frozenset(
    f"p{i:03d}" for i in range(42, 51))

_JIT_CACHE: dict = {}


def _jitted_catalog(tb, params, names, llgcbz0, with_intermediates):
    """One jitted program evaluating all requested catalog fields — the
    whole catalog compiles as a single XLA computation (this CPU build
    compiles per-op eager f64 pathologically slowly, and on TPU it fuses
    the shared spectral reductions)."""
    import jax

    key = (id(tb), id(params), names, llgcbz0, with_intermediates)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        @jax.jit
        def fn(fl1, state, frc, env):
            ctx = ProductContext(fl1, tb, state, frc, params, env,
                                 llgcbz0=llgcbz0)
            out = {n: CATALOG[n](ctx) for n in names}
            if with_intermediates:
                inter = dict(sep=ctx.sep)
                if any(n in ("wsk", "bfi", "wsp", "hmax", "tmax", "p057",
                             "p070", "p071", "p072") for n in names):
                    inter["kurt"] = ctx.kurt
                return out, inter
            return out
        _JIT_CACHE[key] = fn
    return fn


def compute(names, fl1, tb, state, frc, params, env=None, *,
            llgcbz0: bool = False, ntrain: int = 3,
            return_intermediates: bool = False):
    """Evaluate a list of catalog fields → dict name → (npts,).

    Shared intermediates (sepwisw, kurtosis, weflux) are evaluated once
    inside a single jitted program; swell-train fields ('042'-'050') run
    the host partitioning on its outputs.
    """
    jnames = tuple(sorted(n for n in names if n not in TRAIN_FIELDS))
    tnames = [n for n in names if n in TRAIN_FIELDS]
    out = {}
    inter = {}
    need_inter = bool(tnames) or return_intermediates
    if jnames or need_inter:
        fn = _jitted_catalog(tb, params, jnames, llgcbz0, need_inter)
        res = fn(fl1, state, frc, env)
        if need_inter:
            res, inter = res
        out.update(res)
    if tnames:
        from ecwam_tpu.io import partition
        if "swm" not in inter["sep"]:
            raise NotImplementedError(
                "swell-train products need the per-bin swell mask; not "
                "available from the chunked full-mode step (use the XLA "
                "driver for train output at small scale)")
        sep = {k: np.asarray(v) for k, v in inter["sep"].items()}
        trains = partition.sep3tr(
            np.asarray(fl1), np.asarray(state["mij"]).astype(np.int32),
            sep, np.asarray(frc["wswave"]), np.asarray(frc["wdwave"]),
            tb, ntrain=ntrain)
        helper = {"2": ("emtrain", 0), "3": ("thtrain", 0),
                  "4": ("pmtrain", 0), "5": ("emtrain", 1),
                  "6": ("thtrain", 1), "7": ("pmtrain", 1),
                  "8": ("emtrain", 2), "9": ("thtrain", 2),
                  "0": ("pmtrain", 2)}
        for n in tnames:
            field, i = helper[n[-1]]
            v = trains[field][:, i]
            if field == "emtrain":
                v = 4.0 * np.sqrt(np.maximum(v, 0.0))
            elif field == "thtrain":
                v = np.mod(np.degrees(v) + 180.0, 360.0)
            out[n] = v
        inter["trains"] = trains
    if return_intermediates:
        return out, inter
    return out


def compute_chunked(names, fl1_chunk_fn, n_pad, tb, state, frc, params,
                    env=None, *, llgcbz0: bool = False,
                    chunk: int = 65536, so_correct=None):
    """Catalog evaluation CHUNKED over the point axis — the at-scale
    output path (outblock.F90's NPROMA blocking role): the compact
    spectrum is pulled per chunk via ``fl1_chunk_fn(start, count)``
    (driver.FastWaveModel.fl1_chunk) and never materialized whole
    (~5.9 GB at O512); products are pure per-point reductions, so
    per-chunk results concatenate exactly.

    ``so_correct(fl, env_chunk)`` optionally applies the second-order
    output correction per chunk.  Swell-train fields are not available
    on this path (per-bin mask — see compute()).
    """
    bad = [n for n in names if n in TRAIN_FIELDS]
    if bad:
        raise NotImplementedError(
            f"swell-train products {bad} are not available on the "
            "chunked output path")
    C = min(chunk, n_pad)
    # halo-extended variants have length n_pad+1 — drop them (the
    # catalog reads only the padded-point arrays)
    env = {k: v for k, v in (env or {}).items()
           if not k.endswith("_ext")}

    def slice_cols(tree, s):
        return jax.tree.map(lambda v: jax.lax.dynamic_slice_in_dim(
            jnp.asarray(v), s, C, axis=-1), tree)

    pieces = {n: [] for n in names}
    for s0 in range(0, n_pad, C):
        s = min(s0, n_pad - C)               # clamp the last chunk
        fl_c = fl1_chunk_fn(s, C)
        env_c = slice_cols(env, s)
        if so_correct is not None:
            fl_c = so_correct(fl_c, env_c)
        fields = compute(names, fl_c, tb, slice_cols(state, s),
                         slice_cols(frc, s), params, env=env_c,
                         llgcbz0=llgcbz0)
        drop = s0 - s                        # overlap from clamping
        for n in names:
            pieces[n].append(np.asarray(fields[n])[drop:])
    return {n: np.concatenate(v) for n, v in pieces.items()}
