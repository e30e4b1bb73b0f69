"""Data-assimilation surface: the WAMASSI callback registry + an OI
reference implementation.

The reference distributes only procedure-pointer stubs
(yowassi.F90:20-60: "data assimilation can be added via an external
library ... A setup routine needs to point the HANDLERs to the correct
implementation"; the real ECMWF OI is not distributed,
wavemdl.F90:602-605).  This module provides the same pluggable surface
— :func:`register_wamassi` / :func:`wamassi` abort-if-unset semantics —
plus a working default analysis in the classic WAM spirit:

  * :func:`oi_swh_analysis` — optimum interpolation of significant
    wave height: model first-guess SWH at sea points, point
    observations with Gaussian structure functions and observation-
    error weighting (Lionello, Günther & Janssen 1992 §3).
  * :func:`update_spectra_from_swh` — the spectra update for an
    SWH-only analysis: F ← F · (Hs_an/Hs_fg)² per point (energy scales
    with Hs²; wind-sea/swell repartitioning needs the wind analysis,
    which is out of distribution in the reference too).
"""

from __future__ import annotations

import numpy as np

_HANDLER = None


def register_wamassi(fn) -> None:
    """Point the WAMASSI handler at an implementation
    (yowassi.F90:24 WAMASSI_HANDLER)."""
    global _HANDLER
    _HANDLER = fn


def wamassi(*args, **kwargs):
    """Dispatch to the registered handler; abort when none is set —
    the reference's WAM_ABORT('data assimilation not available')."""
    if _HANDLER is None:
        raise RuntimeError(
            "WAMASSI: no data-assimilation handler registered "
            "(yowassi.F90 stubs abort identically); call "
            "register_wamassi(...) or use oi_swh_analysis")
    return _HANDLER(*args, **kwargs)


def great_circle_dist(lat1, lon1, lat2, lon2):
    """Great-circle distance (radians of arc) between degree coords."""
    rad = np.pi / 180.0
    p1, p2 = lat1 * rad, lat2 * rad
    dl = (lon1 - lon2) * rad
    c = (np.sin(p1) * np.sin(p2)
         + np.cos(p1) * np.cos(p2) * np.cos(dl))
    return np.arccos(np.clip(c, -1.0, 1.0))


def oi_swh_analysis(hs_fg, lat, lon, obs_lat, obs_lon, obs_hs, *,
                    corr_km: float = 300.0, obs_err: float = 0.15,
                    bg_err: float = 0.25, max_obs: int = 20):
    """Optimum interpolation of SWH point observations.

    ``hs_fg``/(lat, lon): first-guess SWH at the (npts,) sea points;
    ``obs_*``: (nobs,) observations.  Gaussian structure function
    exp(-(r/L)²) with correlation length ``corr_km``; per-point
    analysis uses the ``max_obs`` nearest observations (the reference
    OI uses a fixed selection box).  Returns the analysed (npts,) SWH.
    """
    hs_fg = np.asarray(hs_fg, np.float64)
    nobs = len(obs_hs)
    if nobs == 0:
        return hs_fg.copy()
    r_earth_km = 6371.0
    lat = np.asarray(lat, np.float64)
    lon = np.asarray(lon, np.float64)
    obs_lat = np.asarray(obs_lat, np.float64)
    obs_lon = np.asarray(obs_lon, np.float64)
    obs_hs = np.asarray(obs_hs, np.float64)

    # innovation = obs − first guess interpolated to obs point
    # (nearest sea point; the reference uses the collocated model value)
    d_oo = great_circle_dist(obs_lat[:, None], obs_lon[:, None],
                             obs_lat[None, :], obs_lon[None, :]) \
        * r_earth_km
    d_op = great_circle_dist(obs_lat[:, None], obs_lon[:, None],
                             lat[None, :], lon[None, :]) * r_earth_km
    nearest = np.argmin(d_op, axis=1)
    innov = obs_hs - hs_fg[nearest]

    # solve (B_oo + R) w = innov once over all obs (small nobs)
    s2 = (bg_err / max(obs_err, 1e-9)) ** 2
    b_oo = np.exp(-(d_oo / corr_km) ** 2)
    a = b_oo + np.eye(nobs) / max(s2, 1e-9)
    w = np.linalg.solve(a, innov)

    # per point: gain = structure functions to the nearest max_obs obs
    d_po = d_op.T                                  # (npts, nobs)
    if nobs > max_obs:
        cut = np.partition(d_po, max_obs - 1, axis=1)[:, max_obs - 1]
        mask = d_po <= cut[:, None]
    else:
        mask = np.ones_like(d_po, bool)
    gain = np.where(mask, np.exp(-(d_po / corr_km) ** 2), 0.0)
    hs_an = hs_fg + gain @ w
    return np.maximum(hs_an, 0.0)


def update_spectra_from_swh(fl1, hs_fg, hs_an, floor: float = 1e-3):
    """Rescale spectra for an SWH-only analysis: energy ∝ Hs²."""
    ratio = (np.asarray(hs_an) / np.maximum(np.asarray(hs_fg), floor))
    scale = np.asarray(ratio, np.float64) ** 2
    if isinstance(fl1, np.ndarray):
        return fl1 * scale[None, None, :]
    import jax.numpy as jnp
    return fl1 * jnp.asarray(scale, fl1.dtype)[None, None, :]


def default_wamassi(model, obs: dict):
    """A complete WAMASSI: analyse SWH and update the model spectra.

    ``model``: the driver WaveModel (uses .fl1, .setup); ``obs``: dict
    with lat/lon/swh arrays.  Registered as the default handler so
    `wamassi(...)` works out of the box while staying replaceable.
    """
    from ecwam_tpu.io import products as products_mod
    ms = model.setup
    hs_fg = np.asarray(products_mod.swh(model.fl1, ms.tb))[: ms.n_real]
    lat = np.asarray(ms.grid.lats)[ms.blk.kxlt]
    lon = ms.grid.amowep + ms.blk.ixlg * \
        np.asarray(ms.grid.zdello)[ms.blk.kxlt]
    hs_an = oi_swh_analysis(hs_fg, lat, lon, obs["lat"], obs["lon"],
                            obs["swh"])
    pad = np.concatenate([hs_an, hs_fg[-1:].repeat(ms.n_pad
                                                   - ms.n_real)])
    fg_pad = np.concatenate([hs_fg, hs_fg[-1:].repeat(ms.n_pad
                                                      - ms.n_real)])
    model.fl1 = update_spectra_from_swh(model.fl1, fg_pad, pad)
    return hs_an


register_wamassi(default_wamassi)
