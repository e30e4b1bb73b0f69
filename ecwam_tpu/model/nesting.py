"""Boundary nesting: coarse→fine one-way spectral boundary conditions.

Reference subsystem (unused operationally at ECMWF but part of the
capability surface):

  * MBOUNC (mbounc.F90) — preproc: coarse-grid sea points lying on the
    fine domain's perimeter, ordered along it.
  * OUTBC/HEADBC (outbc.F90, headbc.F90) — coarse run (IBOUNC=1): write
    each boundary point's mean parameters + full spectrum per output
    date to the boundary file.
  * bouint (src/programs/bouint.F90) — interpolate the coarse boundary
    records in TIME to the fine run's cadence.
  * MBOUNF (mbounf.F90) — preproc: fine-grid sea points on the fine
    domain's own perimeter, each bracketed by two coarse boundary
    points with a linear weight.
  * BOUINPT (bouinpt.F90) — fine run (IBOUNF=1): read a record each
    step, space-interpolate with INTSPEC, overwrite FL1 at the
    boundary points.

The spectral interpolation (INTSPEC, K. Hasselmann 1990; intspec.F90,
rotspec.F90, strspec.F90) interpolates mean energy/frequency/direction
linearly, then rotates + frequency-stretches + energy-scales both
spectra to the interpolated means before blending — all re-derived here
as vectorized numpy over the boundary-point batch (boundary I/O is a
host-side path; point counts are O(perimeter)).
"""

from __future__ import annotations

import dataclasses

import numpy as np

ZPI = 2.0 * np.pi


# ---------------------------------------------------------------------------
# spectral interpolation primitives (vectorized over leading batch dim)
# ---------------------------------------------------------------------------

def rotspec(f, rthet):
    """Rotate spectra by ``rthet`` (rotspec.F90:70-88).

    ``f``: (nb, nang, nfre); ``rthet``: (nb,) radians.  Linear
    interpolation between the two neighbouring direction bins.
    """
    f = np.asarray(f, np.float64)
    nb, nang, nfre = f.shape
    fth = np.mod(np.asarray(rthet, np.float64) + ZPI, ZPI) * nang / ZPI
    inc = fth.astype(np.int64)                      # 0 <= inc < nang
    adif = (fth - inc)[:, None, None]
    k = np.arange(nang)[None, :]
    kc = (k - inc[:, None]) % nang                  # (nb, nang)
    kc1 = (kc - 1) % nang
    take = np.take_along_axis
    return (1.0 - adif) * take(f, kc[:, :, None], axis=1) + \
        adif * take(f, kc1[:, :, None], axis=1)


def strspec(f, gamma, fr, fratio=None):
    """Stretch spectra in frequency by ``gamma`` (strspec.F90:70-180).

    The logarithmic frequency grid fr[m] = fr[0]·ratio^m means a
    stretch is a (fractional) shift of the frequency index: shift by
    ``int(log(γ)/log(ratio))`` whole bins, plus linear interpolation
    between neighbouring bins for the fractional part; energy moving
    past either end is dropped (zero inflow).  ``fratio`` defaults to
    the reference's literal 1.1 (strspec.F90 notes it "should actually
    be FRATIO" — they coincide for the operational grid).
    """
    f = np.asarray(f, np.float64)
    nb, nang, nfre = f.shape
    fr = np.asarray(fr, np.float64)[:nfre]
    ratio = 1.1 if fratio is None else float(fratio)
    alo = np.log10(ratio)
    gams = np.asarray(gamma, np.float64)
    out = np.zeros_like(f)

    inc = (np.log10(np.maximum(gams, 1e-30)) / alo).astype(np.int64)
    exact = np.abs(ratio ** inc.astype(np.float64) - gams) <= 0.001
    m = np.arange(nfre)[None, :]

    # general case: target bin m draws from the source frequency
    # fr[m]·γ placed on the log grid (strspec.F90:140-165)
    ar2 = fr[None, :] * gams[:, None]               # (nb, nfre)
    ifr = (np.log10(np.maximum(ar2 / fr[0], 1e-30)) / alo).astype(np.int64)
    # reference's MC source index: m+inc (γ>1) or m+inc-1 (γ<1)
    mc = np.where(gams[:, None] > 1.0, m + inc[:, None],
                  m + inc[:, None] - 1)
    ifr_c = np.clip(ifr, 0, nfre - 2)
    adif = (fr[ifr_c + 1] - ar2) / (fr[ifr_c + 1] - fr[ifr_c])
    adif = np.clip(adif, 0.0, 1.0)
    mc_ok = (mc >= 0) & (mc + 1 <= nfre - 1)
    mc_c = np.clip(mc, 0, nfre - 2)
    take = np.take_along_axis
    gen = (adif[:, None, :] * take(f, mc_c[:, None, :], axis=2)
           + (1.0 - adif[:, None, :]) * take(f, mc_c[:, None, :] + 1,
                                             axis=2))
    gen = np.where(mc_ok[:, None, :], gen, 0.0)
    # valid target range per reference loop bounds
    lo = np.where(gams[:, None] > 1.0, 0, 1 - inc[:, None])
    hi = np.where(gams[:, None] > 1.0, nfre - inc[:, None] - 1, nfre)
    gen = np.where(((m >= lo) & (m < hi))[:, None, :], gen, 0.0)

    # exact power-of-ratio: pure shift (strspec.F90:100-135)
    msrc = m + inc[:, None]
    src_ok = (msrc >= 0) & (msrc <= nfre - 1)
    msrc_c = np.clip(msrc, 0, nfre - 1)
    shf = np.where(src_ok[:, None, :],
                   take(f, msrc_c[:, None, :], axis=2), 0.0)

    out = np.where(exact[:, None, None], shf, gen)
    return np.where(np.abs(gams - 1.0)[:, None, None] < 1e-12, f, out)


def mean_params(f, tb):
    """Batch EM/FM (femean.F90) and mean direction θq (sthq.F90) for
    (nb, nang, nfre) spectra."""
    f = np.asarray(f, np.float64)
    from ecwam_tpu.core import constants as c
    from ecwam_tpu.core import spectral as sp
    dfim = np.asarray(tb.dfim)[None, :]
    dfimofr = np.asarray(tb.dfimofr)[None, :]
    temp = np.maximum(f, c.EPSMIN).sum(axis=1)      # (nb, nfre)
    em = (dfim * temp).sum(axis=1)
    fm = (dfimofr * temp).sum(axis=1)
    delt25 = sp.WETAIL * tb.fr[tb.nfre - 1] * tb.delth
    delt2 = sp.FRTAIL * tb.delth
    em = em + delt25 * temp[:, -1]
    fm = fm + delt2 * temp[:, -1]
    fm = np.maximum(em / fm, tb.fr[0])
    sidir = (f.sum(axis=2) * np.sin(tb.th)[None, :]).sum(axis=1)
    cidir = (f.sum(axis=2) * np.cos(tb.th)[None, :]).sum(axis=1)
    thq = np.mod(np.arctan2(sidir, np.where(cidir == 0.0, c.EPSMIN,
                                            cidir)) + ZPI, ZPI)
    return em, fm, thq


def intspec(f1, f2, w2, tb, means1=None, means2=None, fratio=None):
    """INTSPEC (intspec.F90:110-230): interpolate spectra pairs.

    ``w2`` = DEL1L/DEL12 ∈ [0,1] is the weight of spectrum 2; returns
    (fl, em, fm, thq).  Vectorized over the (nb,) batch.
    """
    f1 = np.asarray(f1, np.float64)
    f2 = np.asarray(f2, np.float64)
    gw2 = np.asarray(w2, np.float64)
    gw1 = 1.0 - gw2
    em1, fm1, th1 = means1 if means1 is not None else mean_params(f1, tb)
    em2, fm2, th2 = means2 if means2 is not None else mean_params(f2, tb)

    em = gw1 * em1 + gw2 * em2
    fm = gw1 * fm1 + gw2 * fm2
    cm = gw1 * np.cos(th1) + gw2 * np.cos(th2)
    sm = gw1 * np.sin(th1) + gw2 * np.sin(th2)
    thq = np.mod(np.arctan2(sm, cm) + ZPI, ZPI)

    safe1 = np.maximum(em1, 1e-300)
    safe2 = np.maximum(em2, 1e-300)
    f3 = strspec(rotspec(f1, thq - th1), fm1 / fm, tb.fr, fratio) \
        * (em / safe1)[:, None, None]
    f4 = strspec(rotspec(f2, thq - th2), fm2 / fm, tb.fr, fratio) \
        * (em / safe2)[:, None, None]
    fl = gw1[:, None, None] * f3 + gw2[:, None, None] * f4

    # zero-energy special cases (intspec.F90:120-160)
    z1 = (em1 == 0.0)[:, None, None]
    z2 = (em2 == 0.0)[:, None, None]
    fl = np.where(z1, gw2[:, None, None] * f2, fl)
    fl = np.where(z2 & ~z1, gw1[:, None, None] * f1, fl)
    em = np.where(em1 == 0.0, gw2 * em2, np.where(em2 == 0.0, gw1 * em1,
                                                  em))
    fm = np.where(em1 == 0.0, fm2, np.where(em2 == 0.0, fm1, fm))
    thq = np.where(em1 == 0.0, th2, np.where(em2 == 0.0, th1, thq))
    return fl, em, fm, thq


# ---------------------------------------------------------------------------
# boundary-point tables (MBOUNC / MBOUNF roles)
# ---------------------------------------------------------------------------

def _point_coords(grid, blk):
    lat = np.asarray(grid.lats)[np.asarray(blk.kxlt)]
    lon = np.asarray(grid.amowep) + np.asarray(blk.ixlg) * \
        np.asarray(grid.zdello)[np.asarray(blk.kxlt)]
    return lat, lon


def _perimeter_coord(lat, lon, south, north, west, east):
    """Arclength-like coordinate along the rectangle perimeter (deg),
    anchored at the SW corner, running W→E on the south edge, S→N on
    the east edge, E→W north, N→S west (mbounc.F90 ordering)."""
    w, e, s, n = west, east, south, north
    dx, dy = e - w, n - s
    d_s = np.abs(lat - s)
    d_e = np.abs(lon - e)
    d_n = np.abs(lat - n)
    d_w = np.abs(lon - w)
    edge = np.argmin(np.stack([d_s, d_e, d_n, d_w]), axis=0)
    t = np.where(edge == 0, lon - w,
        np.where(edge == 1, dx + (lat - s),
        np.where(edge == 2, dx + dy + (e - lon),
                 2 * dx + dy + (n - lat))))
    return t, edge


@dataclasses.dataclass(frozen=True)
class CoarseBoundary:
    """MBOUNC tables: coarse sea points on the fine domain's rim."""

    idx: np.ndarray          # (nb,) coarse sea-point indices, ordered
    lat: np.ndarray
    lon: np.ndarray
    s: np.ndarray            # perimeter coordinate (deg)
    rect: tuple              # (south, north, west, east)


def coarse_boundary(grid, blk, south, north, west, east,
                    tol=None) -> CoarseBoundary:
    """Coarse-grid sea points within ``tol`` of the fine-domain rim
    (default: one coarse cell), ordered along the perimeter."""
    lat, lon = _point_coords(grid, blk)
    # per-point tolerances: latitudes are xdella-spaced, longitudes
    # zdello(row)-spaced (reduced grids reach zdello=180 deg at the
    # poles, so a single global tolerance would select everything)
    tlat = float(grid.xdella) * 0.51 if tol is None else tol
    tlon = (np.maximum(np.asarray(grid.zdello)[np.asarray(blk.kxlt)],
                       grid.xdella) * 0.51 if tol is None else tol)
    on_ew = (np.abs(lat - south) <= tlat) | (np.abs(lat - north) <= tlat)
    on_ns = (np.abs(lon - west) <= tlon) | (np.abs(lon - east) <= tlon)
    inside = (lat >= south - tlat) & (lat <= north + tlat) & \
             (lon >= west - tlon) & (lon <= east + tlon)
    sel = np.where(inside & (on_ew | on_ns))[0]
    if sel.size == 0:
        raise ValueError("no coarse boundary points on the fine rim "
                         f"[{south},{north}]x[{west},{east}]")
    t, _ = _perimeter_coord(lat[sel], lon[sel], south, north, west, east)
    order = np.argsort(t)
    sel, t = sel[order], t[order]
    return CoarseBoundary(idx=sel.astype(np.int32), lat=lat[sel],
                          lon=lon[sel], s=t,
                          rect=(south, north, west, east))


@dataclasses.dataclass(frozen=True)
class FineBoundary:
    """MBOUNF tables: fine rim points + their coarse bracket/weights."""

    idx: np.ndarray          # (nf,) fine sea-point indices
    ibfl: np.ndarray         # (nf,) left coarse boundary slot
    ibfr: np.ndarray         # (nf,) right coarse boundary slot
    bfw: np.ndarray          # (nf,) weight of the RIGHT neighbour


def fine_boundary(grid, blk, cb: CoarseBoundary) -> FineBoundary:
    """Fine-grid sea points on the fine domain's own rim, each between
    two coarse boundary points along the perimeter (mbounf.F90)."""
    lat, lon = _point_coords(grid, blk)
    tlat = float(grid.xdella) * 0.51
    tlon = np.maximum(np.asarray(grid.zdello)[np.asarray(blk.kxlt)],
                      grid.xdella) * 0.51
    south, north, west, east = cb.rect
    rim = (np.abs(lat - south) <= tlat) | \
          (np.abs(lat - north) <= tlat) | \
          (np.abs(lon - west) <= tlon) | (np.abs(lon - east) <= tlon)
    inside = (lat >= south - tlat) & (lat <= north + tlat) & \
             (lon >= west - tlon) & (lon <= east + tlon)
    sel = np.where(rim & inside)[0]
    t, _ = _perimeter_coord(lat[sel], lon[sel], south, north, west, east)
    # bracket along the (periodic) perimeter
    right = np.searchsorted(cb.s, t)
    nbc = cb.s.size
    perim = 2 * ((north - south) + (east - west))
    left = (right - 1) % nbc
    rightw = right % nbc
    sl = cb.s[left] + np.where(right == 0, -perim, 0.0)
    sr = cb.s[rightw] + np.where(right >= nbc, perim, 0.0)
    span = np.maximum(sr - sl, 1e-12)
    w = np.clip((t - sl) / span, 0.0, 1.0)
    return FineBoundary(idx=sel.astype(np.int32),
                        ibfl=left.astype(np.int32),
                        ibfr=rightw.astype(np.int32),
                        bfw=w)


# ---------------------------------------------------------------------------
# boundary file (OUTBC / HEADBC / bouint / BOUINPT roles)
# ---------------------------------------------------------------------------

class BoundaryWriter:
    """OUTBC role: collect per-date coarse boundary records, write one
    file (npz container; header = HEADBC fields)."""

    def __init__(self, cb: CoarseBoundary, tb):
        self.cb = cb
        self.tb = tb
        self.dates: list = []
        self.recs: list = []

    def add(self, date14: str, fl1) -> None:
        """``fl1``: full coarse field (nang, nfre, npts) (numpy/jax)."""
        f = np.asarray(fl1, np.float64)[..., self.cb.idx]
        f = np.moveaxis(f, -1, 0)                   # (nb, nang, nfre)
        em, fm, thq = mean_params(f, self.tb)
        self.recs.append((f.astype(np.float32), em, fm, thq))
        self.dates.append(int(date14))

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            dates=np.asarray(self.dates, np.int64),
            lat=self.cb.lat, lon=self.cb.lon, s=self.cb.s,
            rect=np.asarray(self.cb.rect),
            fr=np.asarray(self.tb.fr)[: self.tb.nfre],
            th=np.asarray(self.tb.th),
            spec=np.stack([r[0] for r in self.recs]),
            em=np.stack([r[1] for r in self.recs]),
            fm=np.stack([r[2] for r in self.recs]),
            thq=np.stack([r[3] for r in self.recs]))


class BoundaryFile:
    """Reader + time interpolation (bouint role)."""

    def __init__(self, path: str, tb):
        z = np.load(path)
        self.dates = z["dates"]
        self.spec = z["spec"]
        self.em, self.fm, self.thq = z["em"], z["fm"], z["thq"]
        self.lat, self.lon, self.s = z["lat"], z["lon"], z["s"]
        self.rect = tuple(z["rect"])
        self.fr_in = z["fr"]
        self.tb = tb
        if self.fr_in.shape[0] != tb.nfre or not np.allclose(
                self.fr_in, np.asarray(tb.fr)[: tb.nfre], rtol=1e-6):
            raise ValueError(
                "boundary file frequency grid mismatch (bouinpt.F90 "
                "header consistency check)")

    def coarse_boundary(self) -> CoarseBoundary:
        s, n, w, e = self.rect
        return CoarseBoundary(
            idx=np.arange(self.lat.size, dtype=np.int32),
            lat=self.lat, lon=self.lon, s=self.s, rect=(s, n, w, e))

    def at(self, date14: str):
        """Time-interpolated record (bouint.F90:19-23: INTSPEC with the
        time offsets as distances)."""
        t = int(date14)
        i = int(np.searchsorted(self.dates, t))
        if i == 0 or (i < len(self.dates) and self.dates[i] == t):
            j = min(i, len(self.dates) - 1)
            return (self.spec[j].astype(np.float64),
                    (self.em[j], self.fm[j], self.thq[j]))
        if i >= len(self.dates):
            j = len(self.dates) - 1
            return (self.spec[j].astype(np.float64),
                    (self.em[j], self.fm[j], self.thq[j]))
        from ecwam_tpu.model.driver import parse_date
        d0 = parse_date(str(self.dates[i - 1]))
        d12 = (parse_date(str(self.dates[i])) - d0).total_seconds()
        d1l = (parse_date(str(date14).ljust(14, "0"))
               - d0).total_seconds()
        w2 = np.full(self.lat.size, d1l / d12)
        fl, em, fm, thq = intspec(
            self.spec[i - 1], self.spec[i], w2, self.tb,
            means1=(self.em[i - 1], self.fm[i - 1], self.thq[i - 1]),
            means2=(self.em[i], self.fm[i], self.thq[i]))
        return fl, (em, fm, thq)


def apply_boundary(fl1, bf: BoundaryFile, fb: FineBoundary, date14: str):
    """BOUINPT role: overwrite the fine rim points of ``fl1``
    ((nang, nfre, npts), jax or numpy) with the space/time-interpolated
    coarse boundary spectra."""
    spec_t, means_t = bf.at(date14)
    f1 = spec_t[fb.ibfl]
    f2 = spec_t[fb.ibfr]
    m1 = tuple(a[fb.ibfl] for a in means_t)
    m2 = tuple(a[fb.ibfr] for a in means_t)
    fl, _, _, _ = intspec(f1, f2, fb.bfw, bf.tb, means1=m1, means2=m2)
    vals = np.moveaxis(fl, 0, -1)                   # (nang, nfre, nf)
    if isinstance(fl1, np.ndarray):
        out = fl1.copy()
        out[..., fb.idx] = vals
        return out
    import jax.numpy as jnp
    return fl1.at[..., fb.idx].set(jnp.asarray(vals, fl1.dtype))
