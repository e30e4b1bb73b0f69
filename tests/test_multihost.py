"""Multi-host scaffolding: mesh ordering and layout-independent parallel
restart (VERDICT r1 #8).

True multi-process runs need one Python process per host and cannot be
exercised inside a single pytest process; what CI pins instead is the
process-count-independent invariant: a parallel restart written by an
8-shard run reassembles bit-exactly into the global state and can
re-shard onto a 4-shard mesh (the reference's GETSPEC any-NPROC
redistribution, getspec.F90:673-728).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ecwam_tpu.model import setup as setup_mod
from ecwam_tpu.model import stepper as stepper_mod, preset
from ecwam_tpu.parallel import sharded, multihost


def _model():
    return setup_mod.build_model(
        grid_name="6.0", nang=12, nfre=25, idelpro=900.0, idelt=900.0,
        pad_to=64, dtype=jnp.float32)


def test_point_mesh_host_major():
    mesh = multihost.make_point_mesh()
    assert mesh.axis_names == ("pts",)
    procs = [d.process_index for d in mesh.devices.ravel()]
    assert procs == sorted(procs)          # host-major → DCN edges minimal


def test_parallel_restart_roundtrip_across_shard_counts(tmp_path):
    ms = _model()
    rng = np.random.default_rng(3)
    ws = 8.0 + 4.0 * rng.random(ms.n_pad)
    wd = rng.random(ms.n_pad) * 2 * np.pi
    fl1 = np.asarray(preset.mstart(ms.tb, ws, wd), np.float32)
    frc = dict(wswave=jnp.asarray(ws, ms.dtype),
               wdwave=jnp.asarray(wd, ms.dtype),
               aird=jnp.full(ms.n_pad, 1.225, ms.dtype),
               wstar=jnp.zeros(ms.n_pad, ms.dtype),
               cicover=jnp.zeros(ms.n_pad, ms.dtype))
    stress = stepper_mod.initial_stress(ms, frc)

    mesh8 = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("pts",))
    sm8 = sharded.build_sharded_model(ms, mesh8)
    f8 = sm8.device_put(fl1)
    s8 = {k: sm8.device_put(np.asarray(v)) for k, v in stress.items()}

    files = multihost.save_sharded_restart(str(tmp_path), "20230101000000",
                                           sm8, f8, s8)
    assert len(files) == 8

    fl1_g, stress_g = multihost.load_sharded_restart(
        str(tmp_path), "20230101000000", ms.n_pad)
    np.testing.assert_array_equal(fl1_g, fl1)
    for k, v in stress.items():
        np.testing.assert_array_equal(stress_g[k], np.asarray(v))

    # restart on a DIFFERENT shard count: 4-device mesh
    mesh4 = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("pts",))
    sm4 = sharded.build_sharded_model(ms, mesh4)
    f4 = sm4.device_put(fl1_g)
    frc4 = {k: sm4.device_put(np.asarray(v)) for k, v in frc.items()}
    s4 = {k: sm4.device_put(v) for k, v in stress_g.items()}
    out4, _ = sm4.step_full(f4, frc4, s4)

    # and it must equal the 8-shard step from the same state
    frc8 = {k: sm8.device_put(np.asarray(v)) for k, v in frc.items()}
    out8, _ = sm8.step_full(f8, frc8, s8)
    a4 = sm4.from_layout(np.asarray(out4))
    a8 = sm8.from_layout(np.asarray(out8))
    np.testing.assert_allclose(a4, a8, rtol=2e-4, atol=1e-10)


def test_sharded_norms_shard_count_invariant(tmp_path):
    """MPMINMAXAVG equivalence: norms identical for 4 vs 8 shards."""
    ms = _model()
    rng = np.random.default_rng(5)
    ws = 8.0 + 4.0 * rng.random(ms.n_pad)
    wd = rng.random(ms.n_pad) * 2 * np.pi
    fl1 = np.asarray(preset.mstart(ms.tb, ws, wd), np.float32)
    em = fl1.sum(axis=(0, 1))                    # any per-point field
    out = {}
    for nsh in (4, 8):
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:nsh]), ("pts",))
        sm = sharded.build_sharded_model(ms, mesh)
        out[nsh] = sm.norms(sm.device_put(em))
    assert out[4] == out[8]


def test_writer_rank_distributed_output(tmp_path):
    """OUTGRID role: fields split over writer processes, every field
    written exactly once, readable back (outgrid.F90:64-212)."""
    import numpy as np
    from ecwam_tpu.parallel import multihost
    from ecwam_tpu.io.outcontrol import OutputControl
    from ecwam_tpu.io import grib as grib_mod
    from ecwam_tpu.core.grid import (regular_grid, build_sea_point_block,
                                     aqua_bathymetry)

    grid = regular_grid(12.0)
    blk = build_sea_point_block(grid, aqua_bathymetry(grid))
    names = ["swh", "mwd", "mwp", "pp1d", "shww"]
    oc = OutputControl.from_names(names, fmt="grib", nproc=3, lfdb=True)
    rng = np.random.default_rng(3)
    fields = {nm: rng.uniform(0.5, 4.0, blk.nsea) for nm in names}

    written = {}
    for pid in range(3):
        for fn in multihost.write_distributed_fields(
                str(tmp_path), "20230101120000", fields, oc, blk, grid,
                process_index=pid, num_processes=3):
            written[pid] = fn

    # every writer got some fields, and the union covers all of them
    msgs = 0
    for fn in written.values():
        with open(fn, "rb") as f:
            data = f.read()
        msgs += data.count(b"GRIB")
    assert msgs == len(names)
    # round-robin assignment matches IPFGTBL (mpcrtbl.F90:481-484)
    ranks = [oc.writer_rank(nm) for nm in names]
    assert ranks == [0, 1, 2, 0, 1]
