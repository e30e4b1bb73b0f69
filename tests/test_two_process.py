"""REAL multi-process execution smoke (VERDICT r2 item 5).

Spawns two separate Python processes joined via
``jax.distributed.initialize`` (the MPL_INIT role, chief.F90:111-114),
each owning 2 virtual CPU devices of a 4-device global mesh.  The
sharded step then runs its ppermute halo exchanges across a genuine
process boundary, and each process writes only its addressable restart
shards (savspec.F90:96-115 parallel files).  The parent reassembles the
restart and checks it against a single-process run of the same model.
"""

import os
import subprocess
import sys
import socket
import textwrap

import numpy as np
import jax.numpy as jnp
import pytest

CHILD = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.model import preset, stepper as stepper_mod
    from ecwam_tpu.parallel import sharded, multihost

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    ms = setup_mod.build_model(grid_name="12.0", nang=12, nfre=25,
                               idelpro=900.0, idelt=900.0, pad_to=32,
                               dtype=jnp.float32)
    mesh = multihost.make_point_mesh()
    sm = sharded.build_sharded_model(ms, mesh)

    rng = np.random.default_rng(0)
    n = ms.n_pad
    frc_h = dict(wswave=8.0 + 4.0 * rng.random(n),
                 wdwave=rng.random(n) * 2.0 * np.pi,
                 aird=np.full(n, 1.225), wstar=np.zeros(n),
                 cicover=np.zeros(n))
    fl1 = np.asarray(preset.mstart(ms.tb, frc_h["wswave"],
                                   frc_h["wdwave"]), np.float32)
    frc = {k: sm.device_put(v.astype(np.float32)) for k, v in frc_h.items()}
    stress_h = stepper_mod.initial_stress(ms, {k: jnp.asarray(v)
                                               for k, v in frc_h.items()})
    stress = {k: sm.device_put(np.asarray(v)) for k, v in stress_h.items()}
    f = sm.device_put(fl1)
    f, state = sm.step_full(f, frc, stress)
    jax.block_until_ready(f)
    multihost.save_sharded_restart(outdir, "20230101000000", sm, f,
                                   {k: state[k] for k in stress})
    print(f"child {pid} wrote shards OK", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_halo_and_restart(tmp_path):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    env = dict(os.environ,
               JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_ENABLE_X64="0",
               PYTHONPATH=os.pathsep.join(
                   [os.getcwd()] + os.environ.get("PYTHONPATH", "")
                   .split(os.pathsep)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out[-3000:]}"
        assert f"child {pid} wrote shards OK" in out

    # reassemble the parallel restart written across the two processes
    from ecwam_tpu.parallel import multihost
    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.model import preset, stepper as stepper_mod

    ms = setup_mod.build_model(grid_name="12.0", nang=12, nfre=25,
                               idelpro=900.0, idelt=900.0, pad_to=32,
                               dtype=jnp.float32)
    fl1_g, stress_g = multihost.load_sharded_restart(
        str(tmp_path), "20230101000000", ms.n_pad)
    assert fl1_g.shape[-1] == ms.n_pad
    assert np.isfinite(fl1_g).all()

    # single-process reference of the same step
    rng = np.random.default_rng(0)
    n = ms.n_pad
    frc_h = dict(wswave=8.0 + 4.0 * rng.random(n),
                 wdwave=rng.random(n) * 2.0 * np.pi,
                 aird=np.full(n, 1.225), wstar=np.zeros(n),
                 cicover=np.zeros(n))
    frc = {k: jnp.asarray(v, jnp.float32) for k, v in frc_h.items()}
    fl1 = jnp.asarray(preset.mstart(ms.tb, frc_h["wswave"],
                                    frc_h["wdwave"]), jnp.float32)
    stress = stepper_mod.initial_stress(ms, frc)
    sb = stepper_mod.make_step(ms)
    f_ref, _ = sb.step_full(fl1, frc, stress)
    np.testing.assert_allclose(
        fl1_g[..., : ms.n_real],
        np.asarray(f_ref)[..., : ms.n_real], rtol=2e-5, atol=1e-10)
