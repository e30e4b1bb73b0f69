"""Time-integration driver: the RUNWAM/WAMODEL equivalent.

Host-side loop over advection steps with physics/wind/output cadences
(/root/reference/src/ecwam/wamodel.F90:228-649, wamintgr.F90:94-186),
14-character date bookkeeping (incdate.F90) via ``datetime``.

The driver owns no numerics: it schedules the jitted step kernels from
``stepper`` and hands forcing/outputs to pluggable providers.
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ecwam_tpu.model import stepper as stepper_mod
from ecwam_tpu.model.setup import ModelSetup, pad_point_field
from ecwam_tpu.ops.physics import means as means_mod

DATE_FMT = "%Y%m%d%H%M%S"


def parse_date(s: str) -> _dt.datetime:
    """14-char YYYYMMDDHHMMSS (incdate.F90 convention)."""
    return _dt.datetime.strptime(s, DATE_FMT)


def format_date(d: _dt.datetime) -> str:
    return d.strftime(DATE_FMT)


@dataclasses.dataclass
class StepTimers:
    """TIME_PROPAG / TIME_PHYS split (runwam.F90:389-397)."""
    propag: float = 0.0
    phys: float = 0.0
    steps: int = 0


class WaveModel:
    """Standalone wave model instance (single device or sharded).

    ``forcing_provider(date) -> dict`` must return host arrays of shape
    (n_real,) for keys wswave, wdwave, aird, wstar, cicover.
    """

    def __init__(self, setup: ModelSetup, forcing_provider: Callable,
                 start_date: str | _dt.datetime, fl1=None, stress=None):
        self.setup = setup
        self.forcing_provider = forcing_provider
        self.date = (parse_date(start_date) if isinstance(start_date, str)
                     else start_date)
        self.steps = stepper_mod.make_step(setup)
        self.step_full, self.step_adv, self.step_phys = self.steps
        self.frc, self._currents = self._fetch_forcing(self.date)
        if self._currents is not None:
            self.steps.refresh_currents(*self._currents)
        if fl1 is None:
            from ecwam_tpu.model import preset
            f = preset.mstart(
                setup.tb, np.asarray(self.frc["wswave"]),
                np.asarray(self.frc["wdwave"]))
            fl1 = jnp.asarray(f, setup.dtype)
        self.fl1 = fl1
        self.stress = stress or stepper_mod.initial_stress(setup, self.frc)
        self.state = {}
        self.timers = StepTimers()
        self._phys_elapsed = 0.0

    # forcing-swap constants (yowwind.F90:19-20, yowpcons.F90:55-56)
    WSPMIN_RESET_TAUW = 4.0
    USTMIN_RESET_TAUW = 0.08
    _ACD, _BCD = 8.0e-4, 8.0e-5

    def _fetch_forcing(self, date):
        """GETWND role: provider fields → padded device arrays.

        Returns (frc, currents) where currents is an optional (uc, vc)
        pair of padded arrays (GETCURR).  For u*/stress forcing (ICODE
        1/2) the provider supplies 'ufric' instead of a meaningful wind
        speed; the wind floor applies to U10 forcing only
        (wamwnd.F90 CASE(3): U10 = MAX(U10, WSPMIN)).
        """
        raw = self.forcing_provider(format_date(date))
        out = {}
        keys = ["wswave", "wdwave", "aird", "wstar", "cicover"]
        if "cithick" in raw:
            keys.append("cithick")
        if "ufric" in raw:
            keys.append("ufric")
        for k in keys:
            v = np.asarray(raw[k], dtype=np.float64)
            if k == "wswave" and self.setup.phys.icode_wnd == 3:
                v = np.maximum(v, 1.0)
            out[k] = jnp.asarray(
                pad_point_field(self.setup, v), self.setup.dtype)
        cur = None
        if "ucur" in raw:
            cur = tuple(jnp.asarray(
                pad_point_field(self.setup,
                                np.asarray(raw[k], np.float64)),
                self.setup.dtype) for k in ("ucur", "vcur"))
        return out, cur

    def newwind(self, date):
        """Swap staged forcing in (newwind.F90:97-178).

        ICODE 3: cap the wave stress where the new wind is weak —
        TAUW ≤ (ACD+BCD·U10)·U10³/WSPMIN_RESET_TAUW (newwind.F90:125-146).
        ICODE 1/2: take u* from the forcing and rebuild
        TAUW = u*²·(1−(α/CHARNOCK)²), zeroed below USTMIN_RESET_TAUW.
        New currents re-derive the CTU weights (GETCURR → LUPDTWGHT).
        """
        frc, cur = self._fetch_forcing(date)
        if self.setup.phys.icode_wnd == 3:
            u10 = frc["wswave"]
            wght = 1.0 / self.WSPMIN_RESET_TAUW
            tlwmax = wght * (self._ACD + self._BCD * u10) * u10**3
            self.stress = dict(
                self.stress,
                tauw=jnp.where(u10 < self.WSPMIN_RESET_TAUW,
                               jnp.minimum(self.stress["tauw"], tlwmax),
                               self.stress["tauw"]))
        else:
            us = frc["ufric"]
            alpha = self.setup.phys.params.alpha
            tauw = us**2 * (1.0 - (alpha / self.stress["chrnck"]) ** 2)
            tauw = jnp.where(us < self.USTMIN_RESET_TAUW, 0.0, tauw)
            self.stress = dict(self.stress, ufric=us, tauw=tauw)
        self.frc = frc
        if cur is not None:
            self._currents = cur
            self.steps.refresh_currents(*cur)
        return self

    def advance(self, n_steps: int = 1, wind_every: int | None = None):
        """Advance ``n_steps`` advection steps of ``idelpro`` seconds.

        Physics runs whenever the accumulated time reaches ``idelt``
        (wamintgr.F90:117-146).  ``wind_every``: swap forcing every N
        steps (the NEWWIND role incl. the TAUW cap); None = keep current
        forcing.
        """
        s = self.setup
        for i in range(n_steps):
            if wind_every and i > 0 and i % wind_every == 0:
                self.newwind(self.date)
            t0 = time.perf_counter()
            self._phys_elapsed += s.idelpro
            if self._phys_elapsed >= s.idelt - 1e-6:
                self.fl1, st = self.step_full(self.fl1, self.frc, self.stress)
                self.stress = {k: st[k] for k in (
                    "ufric", "tauw", "tauwdir", "z0m", "z0b", "chrnck")}
                self.state = st
                self._phys_elapsed = 0.0
                jax.block_until_ready(self.fl1)
                self.timers.phys += time.perf_counter() - t0
            else:
                self.fl1 = self.step_adv(self.fl1)
                jax.block_until_ready(self.fl1)
                self.timers.propag += time.perf_counter() - t0
            self.timers.steps += 1
            self.date += _dt.timedelta(seconds=s.idelpro)
        return self

    def memory_report(self) -> dict:
        """Device-memory snapshot (EC_MEMINFO role, runwam.F90:420-432)."""
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            stats = {}
        return dict(
            bytes_in_use=stats.get("bytes_in_use"),
            peak_bytes_in_use=stats.get("peak_bytes_in_use"),
            bytes_limit=stats.get("bytes_limit"))

    # ---- diagnostics -----------------------------------------------------
    def swh(self) -> np.ndarray:
        """Significant wave height over real sea points."""
        em = means_mod.semean(self.fl1, self.setup.tb)
        return np.asarray(4.0 * jnp.sqrt(em))[: self.setup.n_real]

    def norms(self) -> dict:
        """avg/min/max of SWH — the statistics.log contract
        (outwnorm.F90:80-140)."""
        swh = self.swh()
        return dict(name="swh", date=format_date(self.date),
                    average=float(swh.mean()), minimum=float(swh.min()),
                    maximum=float(swh.max()), count=int(swh.size))


def constant_wind_forcing(n_real: int, u10: float = 10.0,
                          direction: float = 0.0):
    """Simple uniform forcing provider for tests/benchmarks."""
    def provider(date14: str):
        return dict(
            wswave=np.full(n_real, u10),
            wdwave=np.full(n_real, direction),
            aird=np.full(n_real, 1.225),
            wstar=np.zeros(n_real),
            cicover=np.zeros(n_real))
    return provider
