"""Sharded (multi-chip) model step: shard_map over a 1-D device mesh.

TPU-native replacement for the reference's MPI halo exchange
(/root/reference/src/ecwam/mpexchng.F90:116-255): the point axis is sharded
contiguously (latitude bands); each step exchanges fixed-width boundary
slabs with both neighbours via ``jax.lax.ppermute`` over ICI, then runs the
local CTU stencil and the point-local physics.

Physics is embarrassingly parallel over points, so it runs inside the same
shard_map with no collectives; reductions for norms use ``psum`` outside.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ecwam_tpu.model.setup import ModelSetup
from ecwam_tpu.ops import propagation as prop
from ecwam_tpu.ops.physics import implsch as impl
from ecwam_tpu.parallel import decomp


def _stencil_arrays(ss: decomp.ShardedStencil) -> dict:
    """The traced per-point tables (sharded along the point axis)."""
    return dict(
        klat=ss.klat, klon=ss.klon, kcor=ss.kcor,
        wlat=ss.wlat, wcor=ss.wcor, dp=ss.dp,
        zdello_pt=ss.zdello_pt, cosphm1_pt=ss.cosphm1_pt,
        tanph_pt=ss.tanph_pt,
        obslat=np.moveaxis(ss.obslat, 1, 0),   # (npts, nfre, 2) → shard axis 0
        obslon=np.moveaxis(ss.obslon, 1, 0),
        obscor=np.moveaxis(ss.obscor, 1, 0))


def _local_stencil(args: dict, xdella: float) -> SimpleNamespace:
    return SimpleNamespace(
        klat=args["klat"], klon=args["klon"], kcor=args["kcor"],
        wlat=args["wlat"], wcor=args["wcor"], dp=args["dp"],
        zdello_pt=args["zdello_pt"], xdella=xdella,
        cosphm1_pt=args["cosphm1_pt"], tanph_pt=args["tanph_pt"],
        obslat=jnp.moveaxis(args["obslat"], 0, 1),
        obslon=jnp.moveaxis(args["obslon"], 0, 1),
        obscor=jnp.moveaxis(args["obscor"], 0, 1))


def halo_exchange(f_local, halo: int, axis: str, land_col=None):
    """Build the local ext layout [H left | own | H right | land] by
    exchanging boundary slabs with both ring neighbours (ppermute).

    The ends of the chain receive zeros, which the stencil never reads
    (polar rows border land).  ``land_col`` fills the trailing land slot
    (zero for spectra; the deep-water WVPRPT_LAND value for wave
    properties, initdpthflds.F90:104-110)."""
    n = jax.lax.axis_size(axis)
    fwd = [(i, i + 1) for i in range(n - 1)]          # send right
    bwd = [(i + 1, i) for i in range(n - 1)]          # send left
    left = jax.lax.ppermute(f_local[..., -halo:], axis, fwd)
    right = jax.lax.ppermute(f_local[..., :halo], axis, bwd)
    if land_col is None:
        land = jnp.zeros(f_local.shape[:-1] + (1,), f_local.dtype)
    else:
        land = jnp.broadcast_to(
            jnp.asarray(land_col, f_local.dtype)[..., None],
            f_local.shape[:-1] + (1,))
    return jnp.concatenate([left, f_local, right, land], axis=-1)


@dataclasses.dataclass
class ShardedModel:
    """Jitted sharded step bundle."""

    setup: ModelSetup
    mesh: Mesh
    sharded_stencil: decomp.ShardedStencil
    step_full: object        # (fl1, frc, stress) -> (fl1, state)
    shard_spec: object

    def device_put(self, arr, point_axis: int = -1):
        spec = [None] * arr.ndim
        spec[point_axis] = "pts"
        return jax.device_put(
            arr, NamedSharding(self.mesh, P(*spec)))


def build_sharded_model(setup: ModelSetup, mesh: Mesh) -> ShardedModel:
    """Assemble the sharded step for a 1-D mesh with axis name 'pts'."""
    n_shards = mesh.devices.size
    assert setup.n_pad % n_shards == 0, (setup.n_pad, n_shards)
    ss = decomp.build_sharded_stencil(setup.stencil, n_shards)
    halo = ss.halo
    tb = setup.tb
    nfre_red = tb.nfre_red

    stencil_args = _stencil_arrays(ss)
    env = {k: np.asarray(v) for k, v in setup.env.items()
           if not k.endswith("_ext")}

    pt = P("pts")
    specs_pt_last = P(None, None, "pts")

    def spec_of(a):
        nd = np.asarray(a).ndim
        return P(*([None] * (nd - 1) + ["pts"])) if nd > 1 else pt

    stencil_specs = {k: P("pts", *([None] * (np.asarray(v).ndim - 1)))
                     for k, v in stencil_args.items()}
    env_specs = {k: spec_of(v) for k, v in env.items()}

    own = slice(halo, halo + ss.shard_size)

    cg_land = np.asarray(setup.env["cgroup_ext"])[:nfre_red, -1]

    def local_step(fl1, frc, stress, sargs, envl):
        st = _local_stencil(sargs, ss.xdella)
        # halo-extended group speed for the weights (PROENVHALO role);
        # the land slot carries deep-water cg (WVPRPT_LAND)
        cg_ext = halo_exchange(envl["cgroup"][:nfre_red], halo, "pts",
                               land_col=cg_land)
        if setup.ifrelfmax > 0:
            w_lf = prop.ctuw_weights(
                setup.delpro_lf, st, tb, cg_ext,
                mstart=0, mend=setup.ifrelfmax, own=own)
            w_hf = prop.ctuw_weights(
                setup.idelpro, st, tb, cg_ext,
                mstart=setup.ifrelfmax, mend=nfre_red, own=own)
            nsub = max(1, round(setup.idelpro / setup.delpro_lf))
            lf = fl1[:, : setup.ifrelfmax]
            for _ in range(nsub):
                lf = prop.propags2(
                    halo_exchange(lf, halo, "pts"), w_lf, st, tb, own=own)
            hf = prop.propags2(
                halo_exchange(fl1[:, setup.ifrelfmax:nfre_red], halo, "pts"),
                w_hf, st, tb, own=own)
            adv = jnp.concatenate([lf, hf], axis=1)
        else:
            w = prop.ctuw_weights(setup.idelpro, st, tb, cg_ext, own=own)
            adv = prop.propags2(
                halo_exchange(fl1[:, :nfre_red], halo, "pts"), w, st, tb,
                own=own)
        if nfre_red < tb.nfre:
            fl1 = jnp.concatenate([adv, fl1[:, nfre_red:]], axis=1)
        else:
            fl1 = adv
        # point-local physics — no collectives
        fl1, state = impl.implsch(setup.phys, fl1, envl, frc, **stress)
        return fl1, state

    frc_specs = {k: pt for k in
                 ("wswave", "wdwave", "aird", "wstar", "cicover")}
    stress_specs = {k: pt for k in
                    ("ufric", "tauw", "tauwdir", "z0m", "z0b", "chrnck")}
    state_specs = {k: pt for k in (
        "ufric", "tauw", "tauwdir", "z0m", "z0b", "chrnck", "mij",
        "phiwa", "emean", "fmean", "f1mean", "akmean", "xkmean",
        "emeanws", "fmeanws", "wsemean", "wsfmean",
        # WNFLUXES / STOKESTRN diagnostics — all point fields
        "tauxd", "tauyd", "tauocxd", "tauocyd", "tauoc",
        "phiocd", "phieps", "phiaw", "em_oc", "f1_oc",
        "ustokes", "vstokes")}
    if setup.phys.lstrn:
        state_specs["strnms"] = pt
    state_specs["xllws"] = specs_pt_last

    mapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(specs_pt_last, frc_specs, stress_specs,
                  stencil_specs, env_specs),
        out_specs=(specs_pt_last, state_specs),
        check_vma=False)

    # pre-place the static tables (jit args, not closure constants — large
    # constants would be embedded in the serialized HLO)
    def put(tree, specs):
        return {k: jax.device_put(np.asarray(v),
                                  NamedSharding(mesh, specs[k]))
                for k, v in tree.items()}

    stencil_dev = put(stencil_args, stencil_specs)
    env_dev = put(env, env_specs)

    _jit_step = jax.jit(mapped)

    def step_full(fl1, frc, stress):
        return _jit_step(fl1, frc, stress, stencil_dev, env_dev)

    return ShardedModel(
        setup=setup, mesh=mesh, sharded_stencil=ss,
        step_full=step_full, shard_spec=specs_pt_last)
