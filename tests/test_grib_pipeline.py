"""GRIB forcing ingest + GRIB product output, end-to-end via the CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

from ecwam_tpu.io import forcing as forcing_mod
from ecwam_tpu.io import grib


def make_grib_forcing(path, times14):
    """Write a synthetic u10/v10/ci GRIB1 forcing file."""
    lats = np.linspace(87.5, -87.5, 36)
    lons = np.arange(0.0, 360.0, 5.0)
    la, lo = np.meshgrid(lats, lons, indexing="ij")
    msgs = []
    for it, t in enumerate(times14):
        u10 = 8.0 * np.sin(np.deg2rad(3 * la)) + 0.5 * it
        v10 = 3.0 * np.cos(np.deg2rad(2 * lo))
        ci = np.where(np.abs(la) > 80.0, 0.9, 0.0)
        base = dict(
            table2_version=128, grid_type=0, ni=len(lons), nj=len(lats),
            lat1=87500, lon1=0, lat2=-87500, lon2=355000,
            di=5000, dj=5000, data_date=int(str(t)[:8]),
            data_time=int(str(t)[8:12]), bits_per_value=16)
        msgs += [(u10, {**base, "param": 165}),
                 (v10, {**base, "param": 166}),
                 (ci, {**base, "param": 31})]
    grib.write_messages(path, msgs)
    return lats, lons


def test_forcing_from_grib(tmp_path):
    fn = str(tmp_path / "wind.grib")
    times = [20230101000000, 20230101060000]
    make_grib_forcing(fn, times)
    ff = forcing_mod.ForcingFile.load(fn)
    assert list(ff.times14) == times
    assert set(ff.fields) == {"u10", "v10", "cicover"}
    plat = np.array([0.0, 45.0, -85.0])
    plon = np.array([10.0, 180.0, 300.0])
    provider = ff.provider(plat, plon)
    out = provider("20230101030000")   # between records → earlier one
    assert out["wswave"].shape == (3,)
    assert (out["wswave"] >= 1.0).all()
    assert out["cicover"][2] > 0.5      # high-lat point iced
    assert out["cicover"][0] == 0.0
    # second record has u10 + 0.5
    out2 = provider("20230101060000")
    assert out2["wswave"][1] != out["wswave"][1]


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
end:   2023-01-01 01:00:00
forcings:
    file: wind.grib
    at:
      - begin: 2023-01-01 00:00:00
        end:   2023-01-01 01:00:00
        timestep: 01:00
output:
    fields:
        name: [swh, mwd, wind]
        format: grib
        at:
          - timestep: 01:00
"""


def test_cli_grib_in_grib_out(tmp_path):
    rundir = tmp_path / "run"
    rundir.mkdir()
    make_grib_forcing(str(rundir / "wind.grib"),
                      [20230101000000, 20230101010000])
    cfgfile = tmp_path / "cfg.yml"
    cfgfile.write_text(RUN_CFG)
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "ecwam_tpu", "run", "--config", str(cfgfile),
         "--rundir", str(rundir)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    # GRIB products written at 0h and 1h
    for d14 in ("20230101000000", "20230101010000"):
        fn = rundir / f"MPP{d14}.grib"
        assert fn.exists(), (d14, list(rundir.iterdir()))
        msgs = grib.read_messages(str(fn))
        assert [m.meta["param"] for m in msgs] == [229, 230, 245]
        swh = msgs[0]
        assert swh.meta["table2_version"] == 140
        assert swh.meta["ni"] == -1 and swh.meta["n_pl"] == swh.meta["nj"]
        vals = swh.values[swh.values != grib.MISSING]
        assert vals.size > 0 and (vals > 0).all() and (vals < 20).all()
        # land/missing bitmap present on the reduced wave grid
        assert swh.meta["has_bitmap"] == 1
