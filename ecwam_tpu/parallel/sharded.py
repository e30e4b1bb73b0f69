"""Sharded (multi-chip) model step: shard_map over a 1-D device mesh.

TPU-native replacement for the reference's MPI layer:
  - halo exchange (mpexchng.F90:116-255) → fixed-width boundary slabs via
    ``jax.lax.ppermute`` over ICI, on a row-aligned 1-D point decomposition
    (see parallel/decomp.py)
  - PROENVHALO (proenvhalo.F90:1-113) → halo exchange of the wave-property
    and current fields feeding the refraction terms and the CTU weights
  - CTUWUPDT weight caching (propag_wam.F90:221-236, LUPDTWGHT): weights
    are computed once in their own jitted shard_map and cached on device;
    :meth:`ShardedModel.refresh_weights` re-derives them when depth or
    currents change (GETCURR → LUPDTWGHT)
  - PROPDOT + the CFL current-retry (ctuw.F90:114-123) run inside the
    weights computation with full feature parity to the single-chip path

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
from ecwam_tpu.parallel import decomp, decomp2d

ENV_POINT_FIELDS = ("wavnum", "cinv", "cgroup", "xk2cg", "omosnh2kd",
                    "stokfac", "depth", "emaxdpt", "ucur", "vcur")


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
    """Jitted sharded step bundle with cached CTU weights."""

    setup: ModelSetup
    mesh: Mesh
    sharded_stencil: decomp.ShardedStencil
    shard_spec: object
    _step: object = dataclasses.field(repr=False, default=None)
    _compute_weights: object = dataclasses.field(repr=False, default=None)
    _stencil_dev: dict = dataclasses.field(repr=False, default=None)
    _env_dev: dict = dataclasses.field(repr=False, default=None)
    _weights: object = dataclasses.field(repr=False, default=None)

    # -- layout mapping -----------------------------------------------
    def to_layout(self, arr, point_axis: int = -1):
        return self.sharded_stencil.to_layout(np.asarray(arr), point_axis)

    def from_layout(self, arr, point_axis: int = -1):
        return self.sharded_stencil.from_layout(
            np.asarray(arr), point_axis, n_global=self.setup.n_pad)

    def device_put(self, arr, point_axis: int = -1, *, layout=False):
        """Place a GLOBAL per-point array on the mesh (reordering it into
        the row-aligned layout first unless ``layout`` is True)."""
        a = np.asarray(arr) if layout else self.to_layout(arr, point_axis)
        spec = [None] * a.ndim
        spec[point_axis if point_axis >= 0 else a.ndim + point_axis] = "pts"
        return jax.device_put(a, NamedSharding(self.mesh, P(*spec)))

    # -- weights ------------------------------------------------------
    def refresh_weights(self, ucur=None, vcur=None):
        """Recompute the CTU weights (LUPDTWGHT); pass new currents as
        GLOBAL (n_pad,) arrays to mimic GETCURR → weight refresh."""
        env = dict(self._env_dev)
        if ucur is not None:
            env["ucur"] = self.device_put(np.asarray(ucur))
            env["vcur"] = self.device_put(np.asarray(vcur))
            self._env_dev = env
        self._weights = self._compute_weights(self._stencil_dev, env)
        return self._weights

    @property
    def weights(self):
        if self._weights is None:
            self.refresh_weights()
        return self._weights

    def step_full(self, fl1, frc, stress):
        return self._step(fl1, frc, stress, self.weights,
                          self._stencil_dev, self._env_dev)

    def norms(self, field_layout, n_real: int | None = None):
        """Reproducible avg/min/max over real sea points (MPMINMAXAVG,
        mpminmaxavg.F90:44): gather to host in GLOBAL block order and
        reduce there, so the result is bit-identical for any shard
        count (the reference's LLNORMWAMOUT_GLOBAL gather-to-one-rank
        mode)."""
        n = n_real if n_real is not None else self.setup.n_real
        v = self.from_layout(np.asarray(field_layout))[..., :n]
        return dict(average=float(v.mean()), minimum=float(v.min()),
                    maximum=float(v.max()), count=int(v.size))



def build_sharded_model(setup: ModelSetup, mesh: Mesh,
                        layout2d: tuple | None = None) -> ShardedModel:
    """Assemble the sharded step over a flattened 1-D mesh axis 'pts'.

    ``layout2d=(nlat, nlon)`` switches from the 1-D row-band decomposition
    (slab ppermute halos) to the reference's 2-D patch decomposition
    (mpdecomp.F90 LL1D=.FALSE.) with a gather-based exchange: one
    ppermute per active torus direction ships exactly the points the
    neighbour's stencil reads (O(perimeter) instead of O(row) volume).
    """
    n_shards = mesh.devices.size
    if layout2d is not None:
        nlat, nlon = layout2d
        if nlat * nlon != n_shards:
            raise ValueError(f"layout2d {layout2d} != {n_shards} devices")
        ss = decomp2d.build_sharded2d_stencil(
            setup.stencil, nlat, nlon,
            row_start=np.asarray(setup.blk.row_start))
        own = slice(0, ss.shard_size)
        exch_tables = {k: v for k, v in ss.send_idx.items()}

        def make_ex(sargs):
            def ex(f, land_col=None):
                parts = [f]
                for a in range(len(ss.deltas)):
                    buf = jnp.take(f, sargs[f"send{a}"][0], axis=-1)
                    parts.append(jax.lax.ppermute(
                        buf, "pts", ss.perm_pairs[a]))
                if land_col is None:
                    land = jnp.zeros(f.shape[:-1] + (1,), f.dtype)
                else:
                    land = jnp.broadcast_to(
                        jnp.asarray(land_col, f.dtype)[..., None],
                        f.shape[:-1] + (1,))
                parts.append(land)
                return jnp.concatenate(parts, axis=-1)
            return ex
    else:
        ss = decomp.build_sharded_stencil(
            setup.stencil, n_shards,
            row_start=np.asarray(setup.blk.row_start))
        halo = ss.halo
        own = slice(halo, halo + ss.shard_size)
        exch_tables = {}

        def make_ex(sargs):
            return lambda f, land_col=None: halo_exchange(
                f, halo, "pts", land_col=land_col)

    tb = setup.tb
    nfre_red = tb.nfre_red

    stencil_args = {**_stencil_arrays(ss), **exch_tables}
    # env in layout order (pads replicate point 0 like the trailing pads)
    env = {k: ss.to_layout(np.asarray(setup.env[k]))
           for k in ENV_POINT_FIELDS if k in setup.env}

    pt = P("pts")
    specs_pt_last = P(None, None, "pts")

    def spec_of(a):
        nd = np.asarray(a).ndim
        return P(*([None] * (nd - 1) + ["pts"])) if nd > 1 else pt

    stencil_specs = {k: P("pts", *([None] * (np.asarray(v).ndim - 1)))
                     for k, v in stencil_args.items()}
    env_specs = {k: spec_of(v) for k, v in env.items()}

    # land-slot columns for the PROENVHALO exchanges
    land_cols = {k: np.asarray(setup.env[f"{k}_ext"])[..., -1]
                 for k in ("wavnum", "cgroup", "omosnh2kd", "depth")}
    land_cols["ucur"] = land_cols["vcur"] = 0.0
    cg_land = land_cols["cgroup"][:nfre_red]

    # ---------------- weights (CTUWUPDT + PROPDOT, cached) ------------
    def local_weights(sargs, envl):
        st = _local_stencil(sargs, ss.xdella)
        ex = make_ex(sargs)
        cg_ext = ex(envl["cgroup"][:nfre_red], land_col=cg_land)
        refr = {}
        if setup.irefra:
            wavnum_ext = ex(envl["wavnum"][:nfre_red],
                            land_col=land_cols["wavnum"][:nfre_red])
            omos_ext = ex(envl["omosnh2kd"][:nfre_red],
                          land_col=land_cols["omosnh2kd"][:nfre_red])
            depth_ext = ex(envl["depth"], land_col=land_cols["depth"])
            u_ext = ex(envl["ucur"])
            v_ext = ex(envl["vcur"])
            thdd, thdc, sdot = prop.propdot(
                st, tb, wavnum_ext, cg_ext, omos_ext,
                depth_ext, u_ext, v_ext, setup.irefra, own=own)
            refr = dict(thdd=thdd, thdc=thdc, sdot=sdot,
                        omosnh2kd_ext=omos_ext, u_ext=u_ext, v_ext=v_ext)

        def bands(refr_):
            if setup.ifrelfmax > 0:
                w_lf = prop.ctuw_weights(
                    setup.delpro_lf, st, tb, cg_ext,
                    mstart=0, mend=setup.ifrelfmax,
                    irefra=setup.irefra, own=own, **refr_)
                w_hf = prop.ctuw_weights(
                    setup.idelpro, st, tb, cg_ext,
                    mstart=setup.ifrelfmax, mend=nfre_red,
                    irefra=setup.irefra, own=own, **refr_)
                return (w_lf, w_hf)
            return (prop.ctuw_weights(setup.idelpro, st, tb, cg_ext,
                                      irefra=setup.irefra, own=own,
                                      **refr_),)

        w = bands(refr)
        if setup.irefra in (2, 3):
            fail = w[0]["cflfail"]
            for wb in w[1:]:
                fail = fail | wb["cflfail"]
            curmask = 1.0 - fail.astype(cg_ext.dtype)
            refr2 = dict(refr, thdc=refr["thdc"] * curmask[None, :],
                         sdot=refr["sdot"] * curmask[None, None, :])
            w = bands(refr2)
        # strip the static ints (mstart/mend) — re-attached outside
        return tuple({k: v for k, v in wb.items()
                      if k not in ("mstart", "mend")} for wb in w)

    # out specs for the weight pytree (point axis = 2, cflfail = axis 0)
    band_spec = dict(
        sumwn=P(None, None, "pts"),
        wlonn=P(None, None, "pts", None),
        wlatn=P(None, None, "pts", None, None),
        wcorn=P(None, None, "pts", None, None),
        wkpmn=P(None, None, "pts", None),
        wmpmn=(P(None, None, "pts", None)
               if setup.irefra in (2, 3) else None),
        cflfail=P("pts"))
    nbands = 2 if setup.ifrelfmax > 0 else 1
    w_specs = tuple(dict(band_spec) for _ in range(nbands))

    mapped_weights = jax.shard_map(
        local_weights, mesh=mesh,
        in_specs=(stencil_specs, env_specs),
        out_specs=w_specs, check_vma=False)
    jit_weights = jax.jit(mapped_weights)

    mbounds = ((0, setup.ifrelfmax), (setup.ifrelfmax, nfre_red)) \
        if setup.ifrelfmax > 0 else ((0, nfre_red),)

    # ---------------- step --------------------------------------------
    def local_step(fl1, frc, stress, weights, sargs, envl):
        st = _local_stencil(sargs, ss.xdella)
        ex = make_ex(sargs)
        wlist = tuple(dict(wb, mstart=mb[0], mend=mb[1])
                      for wb, mb in zip(weights, mbounds))
        if setup.ifrelfmax > 0:
            w_lf, w_hf = wlist
            nsub = max(1, round(setup.idelpro / setup.delpro_lf))
            lf = fl1[:, : setup.ifrelfmax]
            for _ in range(nsub):
                lf = prop.propags2(ex(lf), w_lf, st, tb, own=own)
            hf = prop.propags2(
                ex(fl1[:, setup.ifrelfmax:nfre_red]), w_hf, st, tb,
                own=own)
            adv = jnp.concatenate([lf, hf], axis=1)
        else:
            adv = prop.propags2(
                ex(fl1[:, :nfre_red]), wlist[0], st, tb, own=own)
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
    if setup.phys.icode_wnd in (1, 2):
        state_specs["wswave"] = pt
    state_specs["xllws"] = specs_pt_last

    mapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(specs_pt_last, frc_specs, stress_specs, w_specs,
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

    return ShardedModel(
        setup=setup, mesh=mesh, sharded_stencil=ss,
        shard_spec=specs_pt_last,
        _step=_jit_step, _compute_weights=jit_weights,
        _stencil_dev=stencil_dev, _env_dev=env_dev)
