"""Driver-artifact smoke tests (VERDICT r2 item 9).

The driver captures `bench.py` and `__graft_entry__.dryrun_multichip`
outside the test suite; these smokes run both on CPU so a broken
artifact can never ride to a snapshot unnoticed again (the round-2
failure mode)."""

import json
import os
import subprocess
import sys


def test_bench_tiny_grid_emits_json():
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="",
               ECWAVE_BENCH_GRID="12.0", ECWAVE_BENCH_STEPS="1",
               PYTHONPATH=os.pathsep.join(
                   [os.getcwd()] + os.environ.get("PYTHONPATH", "")
                   .split(os.pathsep)))
    out = subprocess.run(
        [sys.executable, os.path.join(os.getcwd(), "bench.py")],
        env=env, capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "point_bins_per_s_per_chip"
    assert rec["value"] > 0
    assert "vs_baseline" in rec


def test_dryrun_multichip_two_devices():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)
