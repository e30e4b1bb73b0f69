"""Config schema parsing + CLI end-to-end (preproc → preset → run)."""

import datetime as dt
import os
import subprocess
import sys

import numpy as np
import pytest

from ecwam_tpu.config.schema import RunConfig, parse_timestep

REF_STYLE_CFG = """
grid:        6.0
directions:  12
frequencies: 15
bathymetry:  aqua

advection:
    timestep: 900
physics:
    timestep: 900

analysis.begin: 2022-12-31 12:00:00
analysis.end:   2023-01-01 00:00:00
forecast.begin: 2023-01-01 00:00:00
forecast.end:   2023-01-01 06:00:00

begin: ${analysis.begin}
end:   ${analysis.begin}

nproma: 32

forcings:
    file:  data/forcings/none.grib
    at:
      - begin:     ${analysis.begin}
        end:       ${forecast.end}
        timestep:  06:00

output:
    fields:
        name: [swh, mwd, mwp, pp1d, dwi, cdww, wind]
        format: grib
        at:
          - timestep: 01:00
    restart:
        format: binary
        at:
          - time: ${end}

iphys: 0
irefra: 2
llgcbz0: T
"""


def test_schema_parses_reference_style_yaml():
    cfg = RunConfig.from_yaml(REF_STYLE_CFG)
    assert cfg.grid == "6.0"
    assert cfg.directions == 12 and cfg.frequencies == 15
    assert cfg.adv_timestep == 900.0 and cfg.phys_timestep == 900.0
    assert cfg.begin == dt.datetime(2022, 12, 31, 12)
    assert cfg.end == cfg.begin        # ${} interpolation
    assert cfg.forcing_windows[0].timestep == 6 * 3600
    assert cfg.output_fields.names[0] == "swh"
    assert cfg.output_fields.windows[0].timestep == 3600
    assert cfg.restart_times == (cfg.begin,)
    assert cfg.iphys == 0 and cfg.irefra == 2 and cfg.llgcbz0
    kw = cfg.build_kwargs()
    assert kw["grid_name"] == "6.0" and kw["iphys"] == 0


def test_schema_parses_actual_reference_config():
    """The real upstream O48 config must parse unchanged."""
    path = "/root/reference/tests/etopo1_oper_an_fc_O48.yml"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cfg = RunConfig.from_yaml(path)
    assert cfg.grid == "O48"
    assert cfg.directions == 12 and cfg.frequencies == 25
    assert cfg.bathymetry == "ETOPO1"
    assert cfg.begin == dt.datetime(2022, 12, 31, 12)
    assert cfg.end == dt.datetime(2023, 1, 1, 6)
    assert len(cfg.forcing_windows) == 2
    assert cfg.validation["double_precision"][0]["name"] == "swh"
    # fast-wave O1280 block
    cfg2 = RunConfig.from_yaml(
        "/root/reference/tests/etopo1_oper_an_fc_O1280.yml")
    assert cfg2.fast_waves_timestep == 225.0
    assert cfg2.fast_waves_max_frequency == 5


def test_parse_timestep_forms():
    assert parse_timestep(450) == 450.0
    assert parse_timestep("01:00") == 3600.0
    assert parse_timestep("00:07:30") == 450.0


RUN_CFG = """
grid:        12.0
directions:  12
frequencies: 15
bathymetry:  aqua
advection:
    timestep: 900
physics:
    timestep: 900
begin: 2023-01-01 00:00:00
end:   2023-01-01 02:00:00
forcings:
    at:
      - begin: 2023-01-01 00:00:00
        end:   2023-01-01 02:00:00
        timestep: 01:00
output:
    fields:
        name: [swh, mwd, mwp, wind]
        at:
          - timestep: 01:00
    restart:
        at:
          - time: 2023-01-01 02:00:00
"""


def _cli(tmp_path, *args):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "ecwam_tpu", *args],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_cli_end_to_end(tmp_path):
    cfgfile = tmp_path / "cfg.yml"
    cfgfile.write_text(RUN_CFG)
    rundir = str(tmp_path / "run")

    r = _cli(tmp_path, "preproc", "--config", str(cfgfile),
             "--rundir", rundir)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(os.path.join(rundir, "wam_grid_tables.npz"))

    r = _cli(tmp_path, "preset", "--config", str(cfgfile),
             "--rundir", rundir)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(
        os.path.join(rundir, "restart_20230101000000.npz"))

    r = _cli(tmp_path, "run", "--config", str(cfgfile), "--rundir", rundir)
    assert r.returncode == 0, r.stderr
    log = os.path.join(rundir, "statistics.log")
    assert os.path.exists(log)
    lines = [l for l in open(log) if not l.startswith("#")]
    # 3 output dates (0h,1h,2h) × 4 fields
    assert len(lines) == 12, lines
    assert os.path.exists(
        os.path.join(rundir, "restart_20230101020000.npz"))
    # norms parse back and are physical
    swh_lines = [l.split() for l in lines if l.split()[2] == "swh"]
    for p in swh_lines:
        avg = float(p[3])
        assert 0.0 < avg < 20.0


def test_mswell_preset():
    """MSWELL swell systems (mswell.F90:66-170): energy localized around
    the four seed locations, zero far away."""
    import numpy as np
    from ecwam_tpu.core.spectral import build_spectral_tables
    from ecwam_tpu.model import preset

    tb = build_spectral_tables(nang=12, nfre=25)
    plat = np.array([47.0, -50.0, 0.0, 47.0])
    plon = np.array([165.0, 20.0, 250.0, 345.0])   # 2 seeds, 2 far away
    fl1 = preset.mswell(tb, plat, plon)
    em = fl1.sum(axis=(0, 1))
    assert em[0] > 0.0 and em[1] > 0.0
    assert em[2] == 0.0 and em[3] == 0.0
    # Hs at a seed centre: the reference writes Q0·S0(ω) straight into
    # the f-density FL1 without the 2π Jacobian (mswell.F90:137-146), so
    # H0=2 m seeds integrate to Hs = 2/√(2π) ≈ 0.80 m — reproduced here.
    dfim = np.asarray(tb.dfim)
    e0 = (fl1[:, :, 0].sum(axis=0) * dfim).sum()
    hs = 4.0 * np.sqrt(e0)
    np.testing.assert_allclose(hs, 2.0 / np.sqrt(2.0 * np.pi), rtol=0.02)
