"""Multi-host scaffolding: process init, mesh construction, sharded restart.

The reference scales over nodes with MPI (mpdecomp.F90 rank tables,
mpexchng.F90 inter-node sends); the TPU-native equivalents are:

  - ``init_distributed`` → ``jax.distributed.initialize`` (the MPL_INIT
    role, chief.F90:111-114): one Python process per host, all chips of
    all hosts visible as ``jax.devices()`` afterwards.
  - ``make_point_mesh`` → a 1-D "pts" mesh over every chip, ordered so
    neighbouring shards sit on ICI-adjacent chips of the same host where
    possible and only the host-boundary halo exchanges ride DCN (the
    ppermute ring in parallel/sharded.py then maps onto ICI links for
    intra-host edges automatically).
  - per-host parallel restart files (savspec.F90:96-115 LRSTPARALW
    ``.%p_%n`` files): every process writes only its addressable shards;
    the reader reassembles the GLOBAL state from any file set, so a run
    can restart on a different process/chip count (getspec.F90:673-728
    redistribution role).

This module must work in a single-process run too (the degenerate
NPROC=1 case) — that is what CI exercises; real multi-host runs only add
``init_distributed`` at program start.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import jax
from jax.sharding import Mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-process JAX (no-op when single-process).

    Mirrors chief.F90's MPL_INIT: call once before any device use.  With
    no arguments, trusts the cluster environment (TPU pods auto-detect).
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def make_point_mesh(devices=None) -> Mesh:
    """1-D 'pts' mesh over all chips, host-major.

    Host-major ordering keeps each host's shards contiguous in the ring,
    so of the 2·(n_shards−1) halo edges only 2·(n_hosts−1) cross DCN.
    """
    if devices is None:
        devices = jax.devices()
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), ("pts",))


def _shard_file(dirpath: str, date14: str, name: str, s: int,
                n: int) -> str:
    """savspec.F90:101 '.%p_%n' parallel-file naming."""
    return os.path.join(dirpath, f"BLS{date14}.{name}.{s + 1}_{n}")


def save_sharded_restart(dirpath: str, date14: str, sm, fl1,
                         stress: dict) -> list[str]:
    """Per-host parallel restart write (LRSTPARALW, savspec.F90:96-115).

    Every process writes one .npz per locally-addressable shard, holding
    the shard's slice in the ROW-ALIGNED layout plus the global indices
    (``perm``) it covers, making the read side layout-independent.
    """
    os.makedirs(dirpath, exist_ok=True)
    ss = sm.sharded_stencil
    n_shards = ss.n_shards
    written = []
    for shard in fl1.addressable_shards:
        s = shard.index[-1].start // ss.shard_size
        lo = s * ss.shard_size
        perm = ss.perm[lo: lo + ss.shard_size]
        payload = dict(fl1=np.asarray(shard.data), perm=perm)
        for k, v in stress.items():
            sh = [x for x in v.addressable_shards
                  if x.index[-1].start == lo]
            payload[f"stress_{k}"] = np.asarray(sh[0].data)
        fn = _shard_file(dirpath, date14, "w", s, n_shards) + ".npz"
        np.savez_compressed(fn, **payload)
        written.append(fn)
    return written


def load_sharded_restart(dirpath: str, date14: str, n_global: int):
    """Reassemble the GLOBAL (block-ordered) state from any parallel
    restart file set, regardless of the writer's shard count
    (getspec.F90:673-728 redistribution).

    Returns (fl1_global, stress_global_dict) as numpy arrays over the
    global point axis; the caller re-shards with its own ShardedModel
    (device_put) or uses them single-chip.
    """
    files = sorted(glob.glob(os.path.join(dirpath,
                                          f"BLS{date14}.w.*_*.npz")))
    if not files:
        raise FileNotFoundError(
            f"no parallel restart files BLS{date14}.w.* in {dirpath}")
    fl1_g = None
    stress_g: dict = {}
    for fn in files:
        with np.load(fn) as z:
            perm = z["perm"]
            own = perm >= 0
            gidx = perm[own]
            shard_fl1 = z["fl1"]
            if fl1_g is None:
                fl1_g = np.zeros(shard_fl1.shape[:-1] + (n_global,),
                                 shard_fl1.dtype)
            fl1_g[..., gidx] = shard_fl1[..., own]
            for k in z.files:
                if not k.startswith("stress_"):
                    continue
                name = k[len("stress_"):]
                if name not in stress_g:
                    stress_g[name] = np.zeros(n_global, z[k].dtype)
                stress_g[name][gidx] = z[k][own]
    return fl1_g, stress_g


def write_distributed_fields(rundir: str, date14: str, fields: dict,
                             outctl, blk, grid, *,
                             process_index: int | None = None,
                             num_processes: int | None = None) -> list[str]:
    """OUTGRID writer-rank output (outgrid.F90:64-212 role).

    Each output field is assigned a writer process by the IPFGTBL
    round-robin (io/outcontrol.py); this process GRIB-encodes and writes
    only the fields it owns, into its own ``MPP<date>.w<rank>.grib`` so
    no two writers touch the same file.  ``fields`` must be host-global
    (n_real,) arrays (gather them with
    ``jax.experimental.multihost_utils.process_allgather`` or
    ``ShardedModel.from_layout`` first — the MPGATHERFL role).

    Writer ranks beyond the process count wrap around, so the same
    config works at any NPROC (mpcrtbl.F90:481-484 wraps at NPROC too).
    """
    from ecwam_tpu.io import gribout

    pid = jax.process_index() if process_index is None else process_index
    npr = jax.process_count() if num_processes is None else num_processes
    os.makedirs(rundir, exist_ok=True)

    mine = {}
    for name, vals in fields.items():
        r = outctl.writer_rank(name)
        if r < 0:                       # norms-only field — nobody writes
            continue
        if r % npr == pid:
            mine[name] = vals
    if not mine:
        return []
    fn = os.path.join(rundir, f"MPP{date14}.w{pid}.grib")
    gribout.write_fields(fn, mine, blk, grid, date14)
    return [fn]
