"""Domain decomposition over the sea-point axis.

The TPU-native equivalent of the reference's MPDECOMP 1-D latitude-band
split (/root/reference/src/ecwam/mpdecomp.F90:341-390, LL1D mode): the
lat-major sea-point block is cut into equal contiguous shards, one per
device.  Halo bookkeeping (the reference's NIJSTART/IJFROMPE tables,
mpdecomp.F90:747-1120) reduces, for a 1-D contiguous split, to a single
halo width H: every stencil neighbour of shard s lives within the last H
points of shard s-1 or the first H points of shard s+1.

Local extended layout per shard:  [H left-halo | shard | H right-halo | land]
so global index g maps to local  H + g - start(s), and the land slot is
2H + shard_size.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ecwam_tpu.ops.propagation import StencilTables


@dataclasses.dataclass(frozen=True)
class ShardedStencil:
    """Per-shard stencil tables stacked back into global (n_pad, ...) arrays
    holding *local* indices, ready to be sharded on the point axis."""

    n_shards: int
    shard_size: int
    halo: int                 # H
    nland_local: int          # 2H + shard_size
    # stacked local-index tables (n_pad, ...)
    klat: np.ndarray
    klon: np.ndarray
    kcor: np.ndarray
    # point-wise geometry/weights are unchanged (already per owned point)
    wlat: np.ndarray
    wcor: np.ndarray
    dp: np.ndarray
    zdello_pt: np.ndarray
    xdella: float
    cosphm1_pt: np.ndarray
    tanph_pt: np.ndarray
    obslat: np.ndarray
    obslon: np.ndarray
    obscor: np.ndarray


def compute_halo_width(st: StencilTables, n_shards: int) -> int:
    """Maximum cross-shard reach of the stencil (multiple of 8)."""
    n = st.npts
    assert n % n_shards == 0, (n, n_shards)
    size = n // n_shards
    starts = np.arange(n) // size * size
    reach = 0
    for arr in (st.klat.reshape(n, -1), st.klon.reshape(n, -1),
                st.kcor.reshape(n, -1)):
        live = arr != st.nland
        rel = np.where(live, arr - starts[:, None], 0)
        reach = max(reach, int(np.max(rel - (size - 1), initial=0)),
                    int(np.max(-rel, initial=0)))
    return max(8, -(-reach // 8) * 8)


def build_sharded_stencil(st: StencilTables, n_shards: int,
                          halo: int | None = None) -> ShardedStencil:
    """Remap global neighbour indices to the per-shard local ext layout."""
    n = st.npts
    size = n // n_shards
    h = halo if halo is not None else compute_halo_width(st, n_shards)
    assert h <= size, f"halo {h} exceeds shard size {size}"
    nland_local = 2 * h + size
    starts = (np.arange(n) // size) * size

    def remap(arr):
        flat = arr.reshape(n, -1)
        local = h + flat - starts[:, None]
        local = np.where(flat == st.nland, nland_local, local)
        assert (local >= 0).all() and (local <= nland_local).all()
        return local.reshape(arr.shape).astype(np.int32)

    return ShardedStencil(
        n_shards=n_shards, shard_size=size, halo=h, nland_local=nland_local,
        klat=remap(st.klat), klon=remap(st.klon), kcor=remap(st.kcor),
        wlat=st.wlat, wcor=st.wcor, dp=st.dp, zdello_pt=st.zdello_pt, xdella=st.xdella,
        cosphm1_pt=st.cosphm1_pt, tanph_pt=st.tanph_pt,
        obslat=st.obslat, obslon=st.obslon, obscor=st.obscor)
