"""Model assembly: grid + spectra + physics + propagation in one object.

Plays the role of the reference's init chain WVWAMINIT → MPDECOMP → WVALLOC →
INITMDL (/root/reference/src/ecwam/runwam.F90:235-257, initmdl.F90) but as a
single host-side builder producing static tables and device arrays.

TPU specifics:
  - the sea-point axis is padded to a multiple of ``pad_to`` (lane width);
    padded points replicate point 0 (the reference's fictitious-point trick,
    mchunk.F90:44-45) and are excluded from norms/outputs by ``n_real``.
  - index ``n_pad`` is the land slot of the halo-extended arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax.numpy as jnp

from ecwam_tpu.core import dispersion
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.core.grid import (WaveGrid, SeaPointBlock, aqua_bathymetry,
                                 build_sea_point_block, octahedral_grid,
                                 regular_grid)
from ecwam_tpu.core.spectral import SpectralTables, build_spectral_tables
from ecwam_tpu.ops import propagation as prop
from ecwam_tpu.ops.physics import implsch as impl


@dataclasses.dataclass(frozen=True)
class ModelSetup:
    grid: WaveGrid
    blk: SeaPointBlock
    tb: SpectralTables
    phys: impl.PhysicsConfig
    stencil: prop.StencilTables
    n_real: int
    n_pad: int
    idelpro: float            # advection timestep (s)
    idelt: float              # physics timestep (s)
    delpro_lf: float          # fast-wave substep (s); = idelpro if unused
    ifrelfmax: int            # number of fast-wave frequencies (0 = none)
    irefra: int
    env: dict                 # device env arrays (padded, + _ext variants)
    dtype: Any
    # memory-scalability knobs (see stepper.py):
    #   weights_mode 'cached' keeps the dense CTU weights resident
    #   (~17 floats/bin, propag_wam.F90 LUPDTWGHT); 'otf' recomputes them
    #   per frequency block inside the step (propags1.F90-style on-the-fly
    #   fluxes) so peak weight memory drops by nfre_red/otf_block.
    weights_mode: str = "cached"
    otf_block: int = 1
    #   phys_chunk splits the point axis into NPROMA-style chunks for the
    #   physics (lax.map), bounding the source-term intermediates
    #   (mchunk.F90:44-45); 0 = whole axis in one chunk.
    phys_chunk: int = 0
    #   'fused' weights_mode: single-pass weights+stencil kernel tables
    #   (ops/propagation_fused.py) + host-side SRL env statics, None
    #   otherwise.
    fused: Any = None
    fused_env: Any = None


def _pad_indices(n_real: int, n_pad: int) -> np.ndarray:
    idx = np.arange(n_pad)
    idx[n_real:] = 0
    return idx


def _pad_stencil(st: prop.StencilTables, n_real: int,
                 n_pad: int) -> prop.StencilTables:
    """Extend stencil to the padded point count; padded points are isolated
    (all neighbours = land) and the land slot moves to n_pad."""
    def remap_idx(a, extra_shape):
        out = np.full((n_pad,) + extra_shape, n_pad, dtype=a.dtype)
        out[:n_real] = np.where(a == st.nland, n_pad, a)
        return out

    def pad_pt(a, fill_from=0):
        out = np.empty((n_pad,) + a.shape[1:], dtype=a.dtype)
        out[:n_real] = a
        out[n_real:] = a[fill_from]
        return out

    def pad_freq_pt(a):
        # (nfre, npts, …) → pad the point axis
        out = np.empty((a.shape[0], n_pad) + a.shape[2:], dtype=a.dtype)
        out[:, :n_real] = a
        out[:, n_real:] = a[:, :1]
        return out

    return prop.StencilTables(
        npts=n_pad, nland=n_pad,
        klat=remap_idx(st.klat, (2, 2)), klon=remap_idx(st.klon, (2,)),
        kcor=remap_idx(st.kcor, (4, 2)),
        wlat=pad_pt(st.wlat), wlatm1=pad_pt(st.wlatm1),
        wcor=pad_pt(st.wcor), wcorm1=pad_pt(st.wcorm1),
        dp=pad_pt(st.dp),
        zdello_pt=pad_pt(st.zdello_pt), xdella=st.xdella,
        cosphm1_pt=pad_pt(st.cosphm1_pt), tanph_pt=pad_pt(st.tanph_pt),
        obslat=pad_freq_pt(st.obslat), obslon=pad_freq_pt(st.obslon),
        obscor=pad_freq_pt(st.obscor))


def build_model(
    *,
    grid_name: str | None = None,
    grid: WaveGrid | None = None,
    bathy: np.ndarray | None = None,
    nang: int = 12,
    nfre: int = 25,
    nfre_red: int | None = None,
    idelpro: float = 900.0,
    idelt: float = 900.0,
    delpro_lf: float | None = None,
    ifrelfmax: int = 0,
    iphys: int = 1,
    irefra: int = 0,
    isnonlin: int = 1,
    icode_wnd: int = 3,
    llgcbz0: bool = False,
    llnormagam: bool = False,
    llcapchnk: bool = False,
    lciwa3: bool = False,
    lciscal: bool = False,
    pad_to: int = 128,
    dtype=jnp.float32,
    obstructions=None,
    currents: tuple | None = None,
    weights_mode: str = "cached",
    otf_block: int = 1,
    phys_chunk: int = 0,
    cache_dir: str | None = None,
    env_on_device: bool = True,
) -> ModelSetup:
    """Build a complete single-domain model.

    ``currents``: optional (u, v) surface-current fields over the sea
    points (n_real,), used when ``irefra`` ∈ {2, 3} (GETCURR equivalent).

    ``cache_dir``: on-disk cache of the expensive host tables (stencil,
    fused SRL tables, dispersion env) keyed by the build inputs — the
    PREPROC write-once artifact (outcom.F90/readpre.F90); ~90 s at O512
    and ~10 min at O1280 become one npz load.
    """
    if grid is None:
        if grid_name is None:
            raise ValueError("need grid or grid_name")
        if grid_name.startswith("O"):
            grid = octahedral_grid(int(grid_name[1:]))
        else:
            grid = regular_grid(float(grid_name))
    if bathy is None:
        bathy = aqua_bathymetry(grid)
    nfre_red = nfre_red or nfre

    tb = build_spectral_tables(nang=nang, nfre=nfre, nfre_red=nfre_red)
    params = pp.set_phys_params(iphys, nang=nang, llgcbz0=llgcbz0,
                                llnormagam=llnormagam,
                                llcapchnk=llcapchnk)
    phys = impl.make_physics_config(tb, params, idelt, nfre_red=nfre_red,
                                    isnonlin=isnonlin, icode_wnd=icode_wnd,
                                    lciwa3=lciwa3, lciscal=lciscal)

    # segment size scales with the typical row length; small grids get
    # small segments.  Capped at 128: the Pallas kernel's double-
    # buffered VMEM windows at S=256 exceed the 16 MB scoped vmem stack
    # limit (measured at O512: 18.5 MB).
    seg = 1 << max(4, min(7, int(np.log2(max(16, grid.ngx // 4)))))

    cached = None
    cache_key = None
    if cache_dir is not None:
        from ecwam_tpu.model import tablecache
        from ecwam_tpu.ops import propagation_fused as pfz
        cache_key = tablecache.build_key(
            grid, bathy, nang=nang, nfre=nfre, nfre_red=nfre_red,
            pad_to=pad_to, seg=seg if weights_mode == "fused" else 0,
            obstructions=obstructions)
        cached = tablecache.load(
            cache_dir, cache_key, blk_cls=SeaPointBlock,
            st_cls=prop.StencilTables, ft_cls=pfz.FusedTables)

    if cached is not None:
        blk, st_real, fused_tables, props_ext = cached
        n_real = blk.nsea
        n_pad = ((n_real + pad_to - 1) // pad_to) * pad_to
        depth = np.empty(n_pad)
        depth[:n_real] = blk.depth
        depth[n_real:] = blk.depth[0]
        depth_ext = np.concatenate([depth, [dispersion.BATHYMAX]])
    else:
        blk = build_sea_point_block(grid, bathy)
        n_real = blk.nsea
        n_pad = ((n_real + pad_to - 1) // pad_to) * pad_to

        st_real = prop.build_stencil(grid, blk, nfre_red,
                                     obstructions=obstructions)
        fused_tables = None
        if weights_mode == "fused":
            from ecwam_tpu.ops import propagation_fused as pfz
            fused_tables = pfz.build_fused_tables(
                st_real, blk.kxlt, nfre_red, S=seg, land_index=n_pad)

        depth = np.empty(n_pad)
        depth[:n_real] = blk.depth
        depth[n_real:] = blk.depth[0]
        depth_ext = np.concatenate([depth, [dispersion.BATHYMAX]])
        props_ext = dispersion.depth_properties(depth_ext, tb.fr)
        if cache_dir is not None:
            from ecwam_tpu.model import tablecache
            tablecache.save(cache_dir, cache_key, blk=blk, stencil=st_real,
                            fused=fused_tables, props=props_ext)
    st = _pad_stencil(st_real, n_real, n_pad)

    fused_env = None
    if fused_tables is not None:
        # host-side SRL statics for the fused step (avoids pulling the
        # device env back through the accelerator relay at init)
        src = np.asarray(fused_tables.srl_src)
        cg = props_ext["cgroup"]                 # (n_pad+1, nfre)
        fused_env = {
            "cg_srl": cg[src][:, :nfre_red],
            "cg_land": cg[-1, :nfre_red],
            "depth_ext": depth_ext,
        }
        if irefra:
            omos = props_ext["omosnh2kd"]
            wav = props_ext["wavnum"]
            pf = np.stack([omos, cg * wav, omos * wav], axis=1)
            fused_env["pf"] = pf[src][:, :, :nfre_red]

    # env_on_device=False keeps these as host numpy: the fused/SRL fast
    # path only reads them once (build_phys_srl's jitted gather pushes
    # them transiently) — at O512 the resident copies are ~1.9 GB of
    # the HBM budget the 2-spectrum advection peak needs
    npdt = np.dtype(str(jnp.dtype(dtype)))
    conv = ((lambda a: jnp.asarray(a, dtype)) if env_on_device
            else (lambda a: np.asarray(a, npdt)))
    env = {k: conv(v.T[:, :n_pad]) for k, v in props_ext.items()}
    env.update({f"{k}_ext": conv(v.T) for k, v in props_ext.items()})
    env["depth"] = conv(depth)
    env["depth_ext"] = conv(depth_ext)
    env["emaxdpt"] = conv(dispersion.depth_limited_energy(depth))
    env["emaxdpt_ext"] = conv(dispersion.depth_limited_energy(depth_ext))

    # surface currents (zero = no current; land slot zero)
    if irefra in (2, 3) and ifrelfmax and weights_mode == "otf":
        raise NotImplementedError(
            "current refraction + fast-wave substepping is supported in "
            "the 'fused' and 'cached' weights modes only")
    if ifrelfmax >= nfre_red:
        raise ValueError("ifrelfmax must be < nfre_red "
                         "(propag_wam.F90:257)")
    uc = np.zeros(n_pad + 1)
    vc = np.zeros(n_pad + 1)
    if currents is not None:
        uc[:n_real], vc[:n_real] = currents[0], currents[1]
    env["ucur_ext"] = conv(uc)
    env["vcur_ext"] = conv(vc)
    env["ucur"] = env["ucur_ext"][:n_pad]
    env["vcur"] = env["vcur_ext"][:n_pad]

    return ModelSetup(
        grid=grid, blk=blk, tb=tb, phys=phys, stencil=st,
        n_real=n_real, n_pad=n_pad,
        idelpro=idelpro, idelt=idelt,
        delpro_lf=delpro_lf or idelpro, ifrelfmax=ifrelfmax,
        irefra=irefra, env=env, dtype=dtype,
        weights_mode=weights_mode, otf_block=otf_block,
        phys_chunk=phys_chunk, fused=fused_tables, fused_env=fused_env)


def pad_point_field(setup: ModelSetup, values: np.ndarray) -> np.ndarray:
    """Pad a (…, n_real) host field to n_pad by replicating point 0."""
    out = np.empty(values.shape[:-1] + (setup.n_pad,), dtype=values.dtype)
    out[..., : setup.n_real] = values
    out[..., setup.n_real:] = values[..., :1]
    return out
