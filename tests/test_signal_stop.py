"""Signal-triggered graceful checkpoint (VERDICT r2 item 8).

A subprocess runs the CLI model loop; SIGTERM arrives mid-run; the
process must finish its current advection step, write a restart +
waminfo, and exit 0 (wamodel.F90:317-329 LDSTOP/LDWRRE, runwam.F90:357).
A second run then resumes from the written restart.
"""

import os
import signal
import subprocess
import sys
import textwrap
import time

import glob

CFG = textwrap.dedent("""
    grid:        12.0
    directions:  12
    frequencies: 15
    bathymetry:  aqua
    advection:
        timestep: 900
    physics:
        timestep: 900
    begin: 2023-01-01 00:00:00
    end:   2023-01-03 00:00:00
    output:
        fields:
            name: [swh]
            format: binary
            at:
              - timestep: 01:00
""")

CHILD = textwrap.dedent("""
    import sys
    from ecwam_tpu.config.schema import RunConfig
    from ecwam_tpu.cli.main import run_model
    cfg = RunConfig.from_yaml(sys.argv[1])
    print("loop-start", flush=True)
    run_model(cfg, sys.argv[2])
    print("loop-done", flush=True)
""")


def test_sigterm_writes_restart_and_resumes(tmp_path):
    cfgf = tmp_path / "run.yml"
    cfgf.write_text(CFG)
    child = tmp_path / "child.py"
    child.write_text(CHILD)
    rundir = tmp_path / "run"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=os.pathsep.join(
                   [os.getcwd()] + os.environ.get("PYTHONPATH", "")
                   .split(os.pathsep)))
    p = subprocess.Popen([sys.executable, str(child), str(cfgf),
                          str(rundir)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    # wait until the loop is running, then a bit into the stepping
    t0 = time.time()
    line = ""
    while time.time() - t0 < 240:
        line = p.stdout.readline()
        if "loop-start" in line:
            break
    assert "loop-start" in line, "model loop never started"
    time.sleep(10)
    p.send_signal(signal.SIGTERM)
    try:
        out = p.communicate(timeout=240)[0]
    except subprocess.TimeoutExpired:
        p.kill()
        out = p.communicate()[0]
    assert p.returncode == 0, f"child rc={p.returncode}:\n{out[-2000:]}"
    assert "signal received" in out, out[-2000:]

    rsts = glob.glob(str(rundir / "LAW*")) + \
        glob.glob(str(rundir / "restart*")) + \
        glob.glob(str(rundir / "BLS*"))
    assert rsts, f"no restart written; rundir: {os.listdir(rundir)}"
    assert os.path.exists(rundir / "waminfo")

    # resume: point `begin` at the checkpoint date and run a short leg
    from ecwam_tpu.io import restart as restart_mod
    from ecwam_tpu.config.schema import RunConfig
    from ecwam_tpu.cli.main import run_model
    base = os.path.basename(sorted(rsts)[-1])
    date14 = "".join(ch for ch in base if ch.isdigit())[:14]
    cfg2 = CFG.replace("begin: 2023-01-01 00:00:00",
                       f"begin: {date14[:4]}-{date14[4:6]}-{date14[6:8]} "
                       f"{date14[8:10]}:{date14[10:12]}:{date14[12:14]}")
    end14 = restart_mod  # silence linters
    # run just 2 more steps
    import datetime as _dt
    d = _dt.datetime.strptime(date14, "%Y%m%d%H%M%S")
    e = d + _dt.timedelta(seconds=1800)
    cfg2 = cfg2.replace("end:   2023-01-03 00:00:00",
                        f"end:   {e:%Y-%m-%d %H:%M:%S}")
    cfg2f = tmp_path / "resume.yml"
    cfg2f.write_text(cfg2)
    model, log = run_model(RunConfig.from_yaml(str(cfg2f)), str(rundir),
                           quiet=True)
    import numpy as np
    assert np.isfinite(model.swh()).all()
