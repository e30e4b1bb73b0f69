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

    def advance(self, n_steps: int = 1, wind_every: int | None = None,
                full_phys: bool = True):
        """Advance ``n_steps`` advection steps of ``idelpro`` seconds.

        Physics runs whenever the accumulated time reaches ``idelt``
        (wamintgr.F90:117-146).  ``wind_every``: swap forcing every N
        steps (the NEWWIND role incl. the TAUW cap); None = keep current
        forcing.  ``full_phys`` is accepted for interface parity with
        :class:`FastWaveModel` (this path always computes the full
        diagnostics).
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


class FastWaveModel(WaveModel):
    """SRL-resident driver: Pallas CTU advection + fused Pallas IMPLSCH.

    The production stepping mode on TPU (the architecture bench.py
    measures): the spectrum stays in the segmented-row layout between
    steps, physics runs the minimal fused kernel between output dates
    and the full-diagnostics kernel on demand (``advance(...,
    full_phys=True)``) — the reference's WAMODEL output-date split
    (wamodel.F90:228-649).  Exposes the same surface as
    :class:`WaveModel` (``fl1`` compact property incl. setter for
    boundary nesting, ``stress``/``state`` dicts, ``newwind``).
    """

    def __init__(self, setup: ModelSetup, forcing_provider: Callable,
                 start_date: str | _dt.datetime, fl1=None, stress=None,
                 backend: str | None = None, interpret: bool = False):
        from functools import partial
        from ecwam_tpu.model.fusedstep import FusedPropagation
        from ecwam_tpu.ops.physics import implsch_pallas as ipk

        self.setup = setup
        self.forcing_provider = forcing_provider
        self.date = (parse_date(start_date)
                     if isinstance(start_date, str) else start_date)
        self.fp = fp = FusedPropagation(setup, backend=backend,
                                        interpret=interpret)
        self._ipk = ipk
        self.frc, self._currents = self._fetch_forcing(self.date)
        if self._currents is not None:
            fp.refresh(*self._currents)
        if fl1 is None:
            from ecwam_tpu.model import preset
            f = preset.mstart(
                setup.tb, np.asarray(self.frc["wswave"]),
                np.asarray(self.frc["wdwave"]))
            fl1 = jnp.asarray(f, setup.dtype)
        stress = stress or stepper_mod.initial_stress(setup, self.frc)
        (self._env2d, self._denv, self._frc6,
         self._stress6) = fp.build_phys_srl(self.frc, stress)

        tb = setup.tb
        self._LT = tb.nang * (tb.nfre - tb.nfre_red)
        self._set_compact(fl1)
        self.state = {}
        self.timers = StepTimers()
        self._phys_elapsed = 0.0

        self._jit_adv = jax.jit(
            lambda f, b: fp.advect_srl(f, b), donate_argnums=0)

        def _phys(f, t, s6, f6, full):
            t_in = t if self._LT else None
            if full:
                # chunked full mode: per-point diagnostics + windsea
                # separation without ever materializing the global
                # xllws field (the O512/O1280 output-date HBM fit)
                res = fp.phys_srl_full_chunked(f, s6, f6, self._denv,
                                               self._env2d, t_in)
            else:
                res = fp.phys_srl_pallas(f, s6, f6, self._denv,
                                         self._env2d, t_in, full=False)
            f, s6 = res[0], res[1]
            t = res[2] if self._LT else t
            state = res[-1] if full else None
            return f, t, s6, state
        self._jit_phys_min = jax.jit(partial(_phys, full=False),
                                     donate_argnums=(0, 1, 2))
        self._jit_phys_full = jax.jit(partial(_phys, full=True),
                                      donate_argnums=(0, 1, 2))
        self._jit_extract = jax.jit(
            lambda rows, b: fp.extract_state(rows, b))
        self._compact_cache = None
        self._jit_chunk = None

    # -- compact-layout views ------------------------------------------
    def _set_compact(self, fl1):
        fp, setup, tb = self.fp, self.setup, self.setup.tb
        nfre_red = tb.nfre_red
        f = jnp.asarray(fl1, setup.dtype)
        self._f_srl = fp.to_srl(f[:, :nfre_red], fp.bundle)
        self._tail = jnp.zeros((self.fp.ft.nsrl, 1), setup.dtype)
        if self._LT:
            LTP = -(-self._LT // 128) * 128
            rows3 = np.asarray(f).transpose(2, 0, 1)[:, :, nfre_red:]
            tl = np.zeros((setup.n_pad + 1, LTP), np.float32)
            tl[: setup.n_pad, : self._LT] = rows3.reshape(
                setup.n_pad, self._LT)
            self._tail = jnp.asarray(
                tl[np.asarray(setup.fused.srl_src)], setup.dtype)
        self._compact_cache = None

    @property
    def fl1(self):
        if self._compact_cache is None:
            fp, tb = self.fp, self.setup.tb
            out = fp.from_srl(self._f_srl, fp.bundle)
            if self._LT:
                # extract_state gathers over the LAST axis; the tail
                # block is (nsrl, LTP) so hand it the transpose, then
                # unpack the k-major lanes → (nang, nfre-nfre_red, n)
                t = self._jit_extract(self._tail.T, fp.bundle)
                t = t[: self._LT].reshape(
                    tb.nang, tb.nfre - tb.nfre_red, -1)
                out = jnp.concatenate([out, t], axis=1)
            self._compact_cache = out
        return self._compact_cache

    def fl1_chunk(self, start: int, count: int):
        """Compact spectrum (nang, nfre, count) for canonical points
        [start, start+count) WITHOUT materializing the whole compact
        field — the at-scale output path (the full compact spectrum is
        ~5.9 GB at O512 on top of the resident SRL state).

        ``count`` must be the same for every call (one compiled gather;
        pad the final chunk by clamping ``start``)."""
        fp, tb = self.fp, self.setup.tb
        nang, nfre_red = tb.nang, tb.nfre_red
        if self._jit_chunk is None:
            L = fp.L
            lt = self._LT

            def _chunk(f_srl, tail, fsp, start):
                idx = jax.lax.dynamic_slice(fsp, (start,), (count,))
                rows = f_srl[idx][:, :L]
                out = jnp.transpose(rows, (1, 0)).reshape(
                    nang, nfre_red, count)
                if lt:
                    tr = tail[idx][:, :lt]
                    t3 = jnp.transpose(tr, (1, 0)).reshape(
                        nang, tb.nfre - nfre_red, count)
                    out = jnp.concatenate([out, t3], axis=1)
                return out

            self._jit_chunk = (jax.jit(_chunk), count)
        fn, c0 = self._jit_chunk
        if c0 != count:
            raise ValueError(f"chunk size changed: {c0} != {count}")
        return fn(self._f_srl, self._tail,
                  self.fp.bundle["from_srl_pad"], start)

    @fl1.setter
    def fl1(self, value):
        self._set_compact(value)

    @property
    def stress(self):
        fp = self.fp
        rows = self._jit_extract(self._stress6, fp.bundle)
        return {k: rows[i] for i, k in
                enumerate(self._ipk.STRESS_KEYS)}

    @stress.setter
    def stress(self, value):
        src = self.fp.bundle["dev"]["srl_src"]
        rows = []
        for k in self._ipk.STRESS_KEYS:
            v = jnp.asarray(value[k], self.setup.dtype)
            rows.append(jnp.concatenate([v, v[:1]])[src][None])
        self._stress6 = jnp.concatenate(rows, axis=0)

    def newwind(self, date):
        """NEWWIND on SRL rows (newwind.F90:97-178): swap forcing and
        cap TAUW where the new wind is weak."""
        frc, cur = self._fetch_forcing(date)
        self.frc = frc
        frc6 = self.fp.frc_srl(frc)
        u10 = frc6[0]
        tauw = self._stress6[1]
        if self.setup.phys.icode_wnd == 3:
            wght = 1.0 / self.WSPMIN_RESET_TAUW
            tlwmax = wght * (self._ACD + self._BCD * u10) * u10**3
            tauw = jnp.where(u10 < self.WSPMIN_RESET_TAUW,
                             jnp.minimum(tauw, tlwmax), tauw)
            self._stress6 = jnp.concatenate(
                [self._stress6[:1], tauw[None], self._stress6[2:]],
                axis=0)
        self._frc6 = frc6
        if cur is not None:
            self._currents = cur
            self.fp.refresh(*cur)
        return self

    def advance(self, n_steps: int = 1, wind_every: int | None = None,
                full_phys: bool = False):
        s = self.setup
        for i in range(n_steps):
            if wind_every and i > 0 and i % wind_every == 0:
                self.newwind(self.date)
            t0 = time.perf_counter()
            self._f_srl = self._jit_adv(self._f_srl, self.fp.bundle)
            jax.block_until_ready(self._f_srl)
            self.timers.propag += time.perf_counter() - t0
            self._phys_elapsed += s.idelpro
            if self._phys_elapsed >= s.idelt - 1e-6:
                t0 = time.perf_counter()
                fn = (self._jit_phys_full if full_phys
                      else self._jit_phys_min)
                self._f_srl, self._tail, self._stress6, state = fn(
                    self._f_srl, self._tail, self._stress6, self._frc6)
                self._phys_elapsed = 0.0
                if state is not None:
                    fp = self.fp
                    self.state = jax.tree.map(
                        lambda v: self._jit_extract(v, fp.bundle), state)
                jax.block_until_ready(self._f_srl)
                self.timers.phys += time.perf_counter() - t0
            self.timers.steps += 1
            self.date += _dt.timedelta(seconds=s.idelpro)
            self._compact_cache = None
        return self


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
