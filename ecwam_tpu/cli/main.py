"""Command-line programs: the ecwam-preproc / ecwam-preset / ecwam-chief
(run) / validation surface of the reference (src/programs/*.F90 +
share/ecwam/scripts/ecwam_run_{preproc,preset,model}.sh), driven by the
same YAML run-config schema.

Usage:
  python -m ecwam_tpu preproc --config cfg.yml --rundir RUN
  python -m ecwam_tpu preset  --config cfg.yml --rundir RUN
  python -m ecwam_tpu run     --config cfg.yml --rundir RUN [--validate]
  python -m ecwam_tpu validate --config cfg.yml --rundir RUN
  python -m ecwam_tpu info
"""

from __future__ import annotations

import argparse
import datetime as _dt
import json
import os
import re
import sys
import time

import numpy as np

from ecwam_tpu.config.schema import RunConfig, DATE_FMT


def _fmt14(d: _dt.datetime) -> str:
    return d.strftime(DATE_FMT)


class BathymetryUnavailable(RuntimeError):
    """Raised when a config requests real bathymetry that cannot be built.

    The reference preproc aborts when wam_topo is missing (preproc.F90
    TOPOAR read); a silent aqua fallback would make every downstream
    validation meaningless, so this is a hard error.
    """


def _resolve_bathymetry(cfg: RunConfig, rundir: str | None = None):
    """Resolve the config's bathymetry request to (bathy, obstructions).

    Accepted values of ``cfg.bathymetry``:
      'aqua'            — aqua planet (land polar rows only)
      <path>.npz        — either preprocessed grid tables (fields bathy /
                          kobslat / kobslon / kobscor) or raw topo data
                          (fields invres / elev) that is preprocessed here
      'ETOPO1'          — looks for ETOPO1.npz / wam_topo.npz in rundir
    Raises BathymetryUnavailable instead of falling back.
    """
    if cfg.bathymetry == "aqua":
        return None, None
    candidates = [cfg.bathymetry]
    if rundir:
        candidates.append(os.path.join(rundir, cfg.bathymetry))
        candidates.append(os.path.join(rundir, "wam_topo.npz"))
    if cfg.bathymetry.upper().startswith("ETOPO"):
        for d in filter(None, (rundir, ".")):
            candidates += [os.path.join(d, "ETOPO1.npz"),
                           os.path.join(d, "wam_topo.npz")]
    path = next((p for p in candidates
                 if p.endswith(".npz") and os.path.exists(p)), None)
    if path is None:
        raise BathymetryUnavailable(
            f"bathymetry {cfg.bathymetry!r} requested but no input data "
            f"found (searched {candidates}); provide a topo .npz "
            "(fields invres/elev) or preprocessed tables "
            "(bathy/kobslat/kobslon/kobscor), or set 'bathymetry: aqua'")
    with np.load(path) as z:
        if "bathy" in z:
            obs = None
            if "kobslat" in z:
                obs = dict(kobslat=z["kobslat"], kobslon=z["kobslon"],
                           kobscor=z["kobscor"])
            return np.asarray(z["bathy"]), obs
    # raw topo: run the full preprocessor
    from ecwam_tpu.core import bathy as bathy_mod
    from ecwam_tpu.core.spectral import build_spectral_tables
    grid = _grid_from_cfg(cfg)
    tb = build_spectral_tables(nang=cfg.directions, nfre=cfg.frequencies)
    topo = bathy_mod.load_topo(path)
    b, obs = bathy_mod.make_bathymetry(
        topo, grid, tb.fr, cfg.build_kwargs().get("nfre_red")
        or cfg.frequencies)
    return b, obs


def _grid_from_cfg(cfg: RunConfig):
    from ecwam_tpu.core.grid import octahedral_grid, regular_grid
    if cfg.grid.startswith("O"):
        return octahedral_grid(int(cfg.grid[1:]))
    return regular_grid(float(cfg.grid))


def _build_model(cfg: RunConfig, dtype=None, rundir: str | None = None):
    import jax.numpy as jnp
    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.core import bathy as bathy_mod
    kw = cfg.build_kwargs()
    b, obs = _resolve_bathymetry(cfg, rundir)
    if b is not None:
        kw["bathy"] = b
    if obs is not None:
        grid = _grid_from_cfg(cfg)
        from ecwam_tpu.core.grid import build_sea_point_block
        blk = build_sea_point_block(grid, b)
        kw["obstructions"] = bathy_mod.obstructions_to_block(obs, blk)
    return setup_mod.build_model(dtype=dtype or jnp.float32, **kw)


def _forcing_provider(cfg: RunConfig, ms, rundir: str):
    from ecwam_tpu.io import forcing as forcing_mod
    lat = np.asarray(ms.grid.lats)[ms.blk.kxlt]
    lon = ms.grid.amowep + ms.blk.ixlg * ms.grid.zdello[ms.blk.kxlt]
    path = cfg.forcings_file
    if path and not os.path.isabs(path) and rundir:
        cand = os.path.join(rundir, path)
        if os.path.exists(cand):
            path = cand
    if path and os.path.exists(path):
        ff = forcing_mod.ForcingFile.load(path)
    else:
        if path:
            print(f"[ecwave] forcing file {path!r} not found "
                  "— using synthetic analytic winds", file=sys.stderr)
        dates = cfg.forcing_dates() or [cfg.begin]
        times14 = [int(_fmt14(d)) for d in dates]
        ff = forcing_mod.synthetic_forcing_file(times14)
    return ff.provider(lat, lon)



def load_config(path: str) -> RunConfig:
    """Load a run config from YAML or a Fortran namelist (MPUSERIN
    surface): a file containing an &NALINE group is parsed by
    config.namelist; anything else by the YAML schema."""
    try:
        with open(path) as f:
            text = f.read()
    except OSError:
        text = path
    if re.search(r"&NALINE\b", text, re.IGNORECASE):
        from ecwam_tpu.config import namelist as _nml
        return _nml.namelist_to_config(text).run
    return RunConfig.from_yaml(path)


def cmd_preproc(args):
    """Grid/bathymetry preprocessing → wam_grid_tables.npz equivalent.

    Builds the sea-point block AND, for real bathymetry, the per-direction
    sub-grid obstruction tables (preproc.F90 TOPOAR/MGRID/MUBUF chain).
    Hard-fails when the requested bathymetry input is missing.
    """
    cfg = load_config(args.config)
    b, obs = _resolve_bathymetry(cfg, args.rundir)
    ms = _build_model(cfg, rundir=args.rundir)
    os.makedirs(args.rundir, exist_ok=True)
    fn = os.path.join(args.rundir, "wam_grid_tables.npz")
    extra = {}
    if b is not None:
        extra["bathy"] = b
    if obs is not None:
        extra.update(obs)
    np.savez_compressed(
        fn, grid=cfg.grid, nang=cfg.directions, nfre=cfg.frequencies,
        nsea=ms.blk.nsea, ixlg=ms.blk.ixlg, kxlt=ms.blk.kxlt,
        depth=ms.blk.depth, nlonrgg=ms.grid.nlonrgg,
        xdella=ms.grid.xdella, zdello=ms.grid.zdello,
        amowep=ms.grid.amowep, amosop=ms.grid.amosop, **extra)
    print(f"wrote {fn} ({ms.blk.nsea} sea points)")
    return 0


def cmd_preset(args):
    """Cold start: JONSWAP spectra from the first wind field → restart."""
    from ecwam_tpu.io import restart as restart_mod
    from ecwam_tpu.model import preset as preset_mod
    from ecwam_tpu.model import stepper as stepper_mod
    from ecwam_tpu.model.setup import pad_point_field
    import jax.numpy as jnp

    cfg = load_config(args.config)
    ms = _build_model(cfg, rundir=args.rundir)
    provider = _forcing_provider(cfg, ms, args.rundir)
    date14 = _fmt14(cfg.begin)
    raw = provider(date14)
    frc = {k: jnp.asarray(pad_point_field(ms, np.asarray(v, np.float64)),
                          ms.dtype) for k, v in raw.items()}
    if getattr(args, "swell", False):
        # MSWELL path (preset.F90:657): swell-only cold start
        lat = np.asarray(ms.grid.lats)[ms.blk.kxlt]
        lon = ms.grid.amowep + ms.blk.ixlg * ms.grid.zdello[ms.blk.kxlt]
        fl1 = preset_mod.mswell(
            ms.tb, np.concatenate([lat, lat[:1].repeat(ms.n_pad - len(lat))]),
            np.concatenate([lon, lon[:1].repeat(ms.n_pad - len(lon))]))
    else:
        fl1 = preset_mod.mstart(
            ms.tb, np.asarray(frc["wswave"]), np.asarray(frc["wdwave"]))
    stress = stepper_mod.initial_stress(ms, frc)
    os.makedirs(args.rundir, exist_ok=True)
    fn = restart_mod.save_restart(args.rundir, date14, fl1, stress, frc)
    print(f"wrote {fn}")
    return 0


def run_model(cfg: RunConfig, rundir: str, *, dtype=None, quiet=False):
    """The WAMODEL/WAMINTGR date loop with output & restart scheduling."""
    import jax.numpy as jnp
    from ecwam_tpu.io import norms as norms_mod
    from ecwam_tpu.io import products as products_mod
    from ecwam_tpu.io import restart as restart_mod
    from ecwam_tpu.model import driver as driver_mod

    os.makedirs(rundir, exist_ok=True)
    ms = _build_model(cfg, dtype=dtype, rundir=rundir)
    provider = _forcing_provider(cfg, ms, rundir)

    # resume from a restart at `begin` if present (GETSPEC role)
    fl1 = stress = None
    rst = os.path.join(rundir, restart_mod.restart_name(_fmt14(cfg.begin)))
    if os.path.exists(rst):
        data = restart_mod.load_restart(rst, nang=ms.tb.nang, nfre=ms.tb.nfre)
        from ecwam_tpu.model.setup import pad_point_field

        def adapt(v):
            """Restart files may hold n_real or any padded width
            (layout-independent restore, getspec.F90 redistribution role)."""
            v = np.asarray(v, np.float64)
            if v.shape[-1] == ms.n_pad:
                return v
            return pad_point_field(ms, v[..., : ms.n_real])

        fl1 = jnp.asarray(adapt(data["fl1"]), ms.dtype)
        if data["stress"]:
            stress = {k: jnp.asarray(adapt(v), ms.dtype)
                      for k, v in data["stress"].items()}
        if not quiet:
            print(f"[ecwave] resumed from {rst}")

    # SRL-resident fast driver on the fused path with a Pallas-capable
    # backend (the bench architecture; wamodel.F90 output-date split):
    # minimal fused physics between output dates, full diagnostics on
    # output dates.  CPU runs keep the cached/XLA WaveModel.
    from ecwam_tpu.model.fusedstep import default_backend
    use_fast = (ms.weights_mode == "fused"
                and default_backend(ms.dtype) == "pallas")
    if use_fast:
        model = driver_mod.FastWaveModel(ms, provider, cfg.begin,
                                         fl1=fl1, stress=stress)
        if not quiet:
            print("[ecwave] SRL-resident fast driver "
                  "(Pallas advection + fused physics kernel)")
    else:
        model = driver_mod.WaveModel(ms, provider, cfg.begin, fl1=fl1,
                                     stress=stress)

    # CHECKCFL role (checkcfl.F90:74-210, called from the propagation
    # setup): validate the Courant numbers once per weight refresh and
    # abort with the reference's remedy when violated
    cfl_src = model.fp if use_fast else model.steps
    if getattr(cfl_src, "cfl_diagnostics", None):
        diag = cfl_src.cfl_diagnostics()
        if not quiet:
            print(f"[ecwave] CFL: x={diag['cfl_east_west']:.3f} "
                  f"y={diag['cfl_north_south']:.3f} "
                  f"outflow={diag['max_outflow']:.3f} "
                  f"violations={diag['n_violations']}")
        if diag["n_violations"]:
            raise RuntimeError(
                "CFL-CRITERION NOT FULFILLED FOR PROPAGATION "
                f"({diag['n_violations']} points, max outflow "
                f"{diag['max_outflow']:.3f}) - REDUCE IDELPRO "
                "ACCORDINGLY (checkcfl.F90)")

    # boundary nesting (IBOUNC/IBOUNF roles): coarse side collects
    # boundary spectra at output dates (OUTBC), fine side overwrites its
    # rim from the coarse file each step (BOUINPT)
    nest = (cfg.raw.get("nesting") or {}) if isinstance(cfg.raw, dict) \
        else {}
    bc_writer = bc_file = fine_tab = None
    if nest.get("coarse"):
        from ecwam_tpu.model import nesting as nesting_mod
        rect = [float(x) for x in nest["coarse"]["rect"]]
        cb = nesting_mod.coarse_boundary(ms.grid, ms.blk, *rect)
        bc_writer = nesting_mod.BoundaryWriter(cb, ms.tb)
        if not quiet:
            print(f"[ecwave] coarse nesting: {cb.idx.size} boundary "
                  "points (MBOUNC)")
    if nest.get("fine"):
        from ecwam_tpu.model import nesting as nesting_mod
        path = nest["fine"]["file"]
        if not os.path.isabs(path):
            path = os.path.join(rundir, path)
        bc_file = nesting_mod.BoundaryFile(path, ms.tb)
        fine_tab = nesting_mod.fine_boundary(
            ms.grid, ms.blk, bc_file.coarse_boundary())
        if not quiet:
            print(f"[ecwave] fine nesting: {fine_tab.idx.size} rim "
                  f"points from {path} (MBOUNF)")

    out_dates = set(cfg.output_dates())
    frc_dates = set(cfg.forcing_dates())
    rst_dates = set(cfg.restart_times)
    names = cfg.output_fields.names if cfg.output_fields else ("swh",)

    # FFLAG/GFLAG/NFLAG output control (mpcrtbl.F90/userin.F90 roles)
    from ecwam_tpu.io import outcontrol
    oc = outcontrol.OutputControl.from_names(
        [n for n in names if n in outcontrol.BY_NAME
         or n in outcontrol._ALIASES],
        fmt=(cfg.output_fields.format if cfg.output_fields else "grib"),
        grib_restart=(cfg.restart_format == "grib"))
    if cfg.output_fields and cfg.output_fields.windows:
        oc.check_output_interval(cfg.output_fields.windows[0].timestep,
                                 cfg.adv_timestep, cfg.phys_timestep)
    known = [n for n in oc.output_names() if n in products_mod.CATALOG]
    norm_set = set(oc.norm_names())
    grib_set = set(oc.grib_names()) | set(oc.file_names())
    licerun = cfg.forcings_file is not None

    log = norms_mod.StatisticsLog()
    saved = []

    grib_out = (cfg.output_fields is not None
                and cfg.output_fields.format == "grib")
    # LFDB path (wam_multio_mod.F90 role): GRIB messages to the keyed
    # FDB-lite sink instead of per-date MPP files
    fdb_sink = None
    if (cfg.output_fields is not None
            and cfg.output_fields.format == "fdb"):
        from ecwam_tpu.io import multio as multio_mod
        fdb_sink = multio_mod.MultioSink(os.path.join(rundir, "fdb"))

    # second-order correction of the output spectrum (outblock.F90:173;
    # LSECONDORDER defaults true, mpuserin.F90:594).  Output-side only —
    # the prognostic state is never modified.
    so_correct = None
    if cfg.lsecondorder and known:
        import jax
        from ecwam_tpu.ops import secondorder as so_mod
        so_tables = so_mod.build_second_order_tables(ms.tb)
        so_correct = jax.jit(
            lambda fl, wn, dp: so_mod.cal_second_order_spec(
                fl, wn, dp, ms.tb, so_tables, sig=1.0))

    # output-path point blocking: above this size the compact spectrum
    # is pulled per chunk (outblock.F90's NPROMA role) — the whole
    # field would not fit next to the resident SRL state at O512+
    chunk_threshold = int(os.environ.get("ECWAVE_OUTPUT_CHUNK_ABOVE",
                                         str(1 << 18)))

    def do_output(date):
        d14 = _fmt14(date)
        if (use_fast and ms.n_pad > chunk_threshold
                and not any(n in products_mod.TRAIN_FIELDS
                            for n in known)):
            so_fn = None
            if so_correct is not None:
                def so_fn(fl, env_c):
                    return so_correct(fl, env_c["wavnum"],
                                      env_c["depth"])
            fields = products_mod.compute_chunked(
                known, model.fl1_chunk, ms.n_pad, ms.tb,
                {**model.state, **model.stress}, model.frc,
                ms.phys.params, env=ms.env,
                llgcbz0=ms.phys.params.llgcbz0, so_correct=so_fn)
        else:
            fl_out = model.fl1
            if so_correct is not None:
                fl_out = so_correct(model.fl1, ms.env["wavnum"],
                                    ms.env["depth"])
            fields = products_mod.compute(
                known, fl_out, ms.tb, {**model.state, **model.stress},
                model.frc, ms.phys.params, env=ms.env,
                llgcbz0=ms.phys.params.llgcbz0)
        host = {n: np.asarray(fields[n])[: ms.n_real] for n in known}
        # OUTSETWMASK: ice/shallow masking of flagged output params
        host = outcontrol.apply_output_masks(
            host, cicover=np.asarray(model.frc["cicover"])[: ms.n_real],
            licerun=licerun)
        for n in known:
            if n in norm_set:
                log.add(n, d14, host[n],
                        missing_mask=(host[n] == outcontrol.c.ZMISS))
        if grib_out:
            from ecwam_tpu.io import gribout
            gribout.write_fields(
                os.path.join(rundir, f"MPP{d14}.grib"),
                {n: v for n, v in host.items() if n in grib_set},
                ms.blk, ms.grid, d14)
        if fdb_sink is not None:
            from ecwam_tpu.io import multio as multio_mod
            multio_mod.write_fields_to_sink(
                fdb_sink, {n: v for n, v in host.items()
                           if n in grib_set},
                ms.blk, ms.grid, d14)

    # step 0 output (OUTSTEP0, initmdl.F90:1101)
    if cfg.begin in out_dates or not out_dates:
        do_output(cfg.begin)

    # signal-triggered graceful stop (wamodel.F90:317-329 LDSTOP/LDWRRE,
    # runwam.F90:357): on SIGTERM/SIGINT finish the current advection
    # step, write a restart + waminfo, and exit cleanly
    import signal
    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
    old_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            old_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:            # non-main thread
            pass

    stopped_early = False
    t_wall = time.perf_counter()
    step = _dt.timedelta(seconds=cfg.adv_timestep)
    date = cfg.begin
    while date < cfg.end:
        nxt = date + step
        model.advance(1, full_phys=(nxt in out_dates))
        if bc_file is not None:
            model.fl1 = nesting_mod.apply_boundary(
                model.fl1, bc_file, fine_tab, _fmt14(nxt))
        if nxt in frc_dates:
            model.newwind(nxt)        # NEWWIND swap incl. the TAUW cap
        if nxt in out_dates:
            do_output(nxt)
            if bc_writer is not None:
                bc_writer.add(_fmt14(nxt), model.fl1)
        if nxt in rst_dates:
            saved.append(restart_mod.save_restart(
                rundir, _fmt14(nxt), model.fl1, model.stress,
                model.frc))
        date = nxt
        if stop_requested["flag"]:
            saved.append(restart_mod.save_restart(
                rundir, _fmt14(date), model.fl1, model.stress,
                model.frc))
            from ecwam_tpu.io import waminfo as waminfo_mod
            waminfo_mod.write_waminfo(
                os.path.join(rundir, "waminfo"),
                begin14=_fmt14(cfg.begin), end14=_fmt14(cfg.end),
                restart_date14=_fmt14(date),
                last_spectra_date14=_fmt14(date))
            stopped_early = True
            if not quiet:
                print(f"[ecwave] signal received: wrote restart at "
                      f"{_fmt14(date)} and stopping")
            break

    for sig, h in old_handlers.items():
        signal.signal(sig, h)

    if bc_writer is not None and bc_writer.dates:
        bc_path = os.path.join(rundir, "wam_boundary.npz")
        bc_writer.save(bc_path)
        if not quiet:
            print(f"[ecwave] wrote boundary file {bc_path} "
                  f"({len(bc_writer.dates)} dates)")

    wall = time.perf_counter() - t_wall
    log_path = os.path.join(rundir, "statistics.log")
    log.write(log_path)
    if not quiet:
        tm = model.timers
        print(f"[ecwave] {tm.steps} steps in {wall:.2f}s wall "
              f"(propag {tm.propag:.2f}s, phys {tm.phys:.2f}s); "
              f"wrote {log_path}" +
              (f"; restarts: {', '.join(saved)}" if saved else ""))
    return model, log


def cmd_run(args):
    cfg = load_config(args.config)
    _, log = run_model(cfg, args.rundir)
    if args.validate:
        return _validate(cfg, log.entries)
    return 0


def _validate(cfg: RunConfig, entries) -> int:
    from ecwam_tpu.io import norms as norms_mod
    block = cfg.validation.get("single_precision") or \
        cfg.validation.get("double_precision") or []
    rep = norms_mod.validate_report(entries, block)
    if rep["failures"]:
        for f in rep["failures"]:
            print("VALIDATION FAIL:", json.dumps(f, default=str))
        return 1
    print(f"validation OK ({rep['passed']} checks, "
          f"{rep['bit_identical']}/{rep['passed']} bit identical with "
          "recorded results)")
    return 0


def cmd_validate(args):
    from ecwam_tpu.io import norms as norms_mod
    cfg = load_config(args.config)
    entries = []
    with open(os.path.join(args.rundir, "statistics.log")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            p = line.split()
            entries.append(dict(
                time=p[0], index=int(p[1]), name=p[2],
                average=float(p[3]), minimum=float(p[5]),
                maximum=float(p[7]), non_missing_points=int(p[9])))
    return _validate(cfg, entries)


def cmd_bouint(args):
    """bouint program role (bouint.F90:19-23): time-interpolate a
    coarse boundary file to a finer cadence."""
    from ecwam_tpu.core import spectral
    from ecwam_tpu.model import nesting as nesting_mod
    from ecwam_tpu.model.driver import parse_date, format_date
    z = np.load(args.input)
    nfre = int(z["fr"].shape[0])
    nang = int(z["th"].shape[0])
    tb = spectral.build_spectral_tables(nang, nfre)
    bf = nesting_mod.BoundaryFile(args.input, tb)
    cb = bf.coarse_boundary()
    wr = nesting_mod.BoundaryWriter(cb, tb)
    t = parse_date(str(bf.dates[0]))
    end = parse_date(str(bf.dates[-1]))
    step = _dt.timedelta(seconds=float(args.timestep))
    while t <= end:
        d14 = format_date(t)
        spec_t, _ = bf.at(d14)
        wr.add(d14, np.moveaxis(spec_t, 0, -1))
        t += step
    wr.save(args.output)
    print(f"[ecwave] bouint: {len(wr.dates)} records -> {args.output}")
    return 0


def cmd_info(args):
    import jax
    print("ecwave (ecwam_tpu) — TPU-native spectral wave model")
    print("capabilities: CTU propagation (IPROPAGS=2), IPHYS∈{0,1} physics,")
    print("  DIA nonlinear transfer, depth/current refraction (IREFRA≤3),")
    print("  fast-wave substepping, 1-D lat-band sharding (shard_map),")
    print("  statistics.log norms, npz restart/forcing")
    print(f"jax {jax.__version__}, backend: "
          f"{jax.default_backend()}, devices: {len(jax.devices())}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="ecwave")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn, needs_cfg in (
            ("preproc", cmd_preproc, True), ("preset", cmd_preset, True),
            ("run", cmd_run, True), ("validate", cmd_validate, True),
            ("bouint", cmd_bouint, False),
            ("info", cmd_info, False)):
        sp = sub.add_parser(name)
        sp.set_defaults(fn=fn)
        if needs_cfg:
            sp.add_argument("--config", required=True)
            sp.add_argument("--rundir", default="run")
        if name == "run":
            sp.add_argument("--validate", action="store_true")
        if name == "bouint":
            sp.add_argument("--input", required=True)
            sp.add_argument("--output", required=True)
            sp.add_argument("--timestep", required=True,
                            help="output cadence in seconds")
        if name == "preset":
            sp.add_argument("--swell", action="store_true",
                            help="MSWELL swell-only cold start "
                                 "(preset.F90:657)")
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
