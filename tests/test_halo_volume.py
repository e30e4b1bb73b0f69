"""1-D vs 2-D decomposition: quantified halo-volume deferral (VERDICT r3
next-round #8).

The fused engine shards as 1-D latitude row bands (slab ppermute halos).
The reference switches to a 2-D patch decomposition at scale
(mpdecomp.F90:341-390) to bound halo volume by the patch perimeter.
This test computes, from the real octahedral O1280 row structure, the
per-step halo traffic of the 1-D row-band decomposition at 8/16/64
shards and shows it stays a small fraction of the per-shard state
traffic through pod-slice scale — the documented justification for
deferring a 2-D fused decomposition.
"""

import numpy as np

from ecwam_tpu.core import grid as grid_mod

NANG, NFRE_RED = 36, 29
L = NANG * NFRE_RED
LP = -(-L // 128) * 128


def _row_band_halos(row_cnt, n_shards):
    """Per-shard (halo_pts, own_pts) for contiguous equal-point bands."""
    npts = int(row_cnt.sum())
    csum = np.concatenate([[0], np.cumsum(row_cnt)])
    targets = npts * (np.arange(1, n_shards) / n_shards)
    cuts = np.searchsorted(csum, targets)
    bounds = np.concatenate([[0], cuts, [len(row_cnt)]])
    out = []
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        own = int(csum[hi] - csum[lo])
        halo = 0
        if lo > 0:
            halo += int(row_cnt[lo - 1])      # row below
        if hi < len(row_cnt):
            halo += int(row_cnt[hi])          # row above
        out.append((halo, own))
    return out


def test_o1280_1d_halo_volume_stays_negligible():
    g = grid_mod.octahedral_grid(1280)
    row_cnt = np.asarray(g.nlonrgg, np.int64)   # all-sea worst case

    # per advection step the halo is exchanged once per (sub)pass; the
    # operational config runs 1 all-band pass + 1 fast-wave subpass of
    # 5/29 frequencies (propag_wam.F90:256-313)
    passes_equiv = 1.0 + 5.0 / NFRE_RED

    for n_shards, bound in ((8, 0.02), (16, 0.04), (64, 0.15)):
        worst_frac = 0.0
        for halo, own in _row_band_halos(row_cnt, n_shards):
            halo_bytes = halo * LP * 4 * 2 * passes_equiv  # send+recv
            # state traffic of the same step: 3 window reads + 1 write
            state_bytes = own * LP * 4 * 4.3 * passes_equiv
            worst_frac = max(worst_frac, halo_bytes / state_bytes)
        assert worst_frac < bound, (n_shards, worst_frac)

    # and the absolute ICI load at 8 shards: << 1 ms at ~100 GB/s
    halos8 = _row_band_halos(row_cnt, 8)
    worst_halo_bytes = max(h for h, _ in halos8) * LP * 4 * 2
    assert worst_halo_bytes < 100e6          # ~60 MB -> ~0.6 ms on ICI
