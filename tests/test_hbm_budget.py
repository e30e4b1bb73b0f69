"""Per-shard HBM budget at the O1280 north-star shape (VERDICT r2 #5).

Computes — from the real octahedral O1280 row structure, worst-case
all-sea — the per-shard SRL length of a 1-D 8-way row-band
decomposition and the fused-path device bytes (2 SRL spectrum copies +
the packed Pallas tables incl. the refraction pf block), and asserts
the total fits a single v5e chip's HBM with headroom.
"""

import numpy as np

from ecwam_tpu.core import grid as grid_mod

HBM_BYTES = 15.75e9            # v5e usable HBM (compiler-reported)
WD = 12                        # fused-layout wrap depth


def _seg_size(ngx: int) -> int:
    """Production segment size — same formula as setup.build_model."""
    return 1 << max(4, min(7, int(np.log2(max(16, ngx // 4)))))


S = _seg_size(4 * 1280 + 16)   # O1280 rows are >512 points → the 128 cap
NANG, NFRE = 36, 29


def _srl_len(row_cnt, S=S, WD=WD):
    row_len = np.where(row_cnt > 0,
                       ((row_cnt + 2 * WD + S - 1) // S) * S, 0)
    return int(row_len.sum()) + 3 * S


def test_o1280_eight_shard_fused_fits_hbm():
    g = grid_mod.octahedral_grid(1280)
    row_cnt = np.asarray(g.nlonrgg, np.int64)     # all-sea worst case
    npts = int(row_cnt.sum())
    assert npts > 6_000_000                        # O1280 scale

    # contiguous row bands with ~equal point counts + 1 halo row/side
    csum = np.concatenate([[0], np.cumsum(row_cnt)])
    n_shards = 8
    targets = npts * (np.arange(1, n_shards) / n_shards)
    cuts = np.searchsorted(csum, targets)
    bounds = np.concatenate([[0], cuts, [len(row_cnt)]])
    worst = 0
    for s in range(n_shards):
        lo = max(int(bounds[s]) - 1, 0)
        hi = min(int(bounds[s + 1]) + 1, len(row_cnt))
        worst = max(worst, _srl_len(row_cnt[lo:hi]))

    L = NANG * NFRE
    LP = -(-L // 128) * 128
    spectrum = 2 * worst * LP * 4                  # donated in + out
    # packed kernel tables: taps(128) + ptab(128) + obs(256) + cg(128)
    # + pf(128, irefra on) per SRL row, f32
    tables = worst * (128 + 128 + 256 + 128 + 128) * 4
    index = worst * 3 * 4                          # srl_src/valid/wraps
    # SRL-resident physics: per-chunk temps only (~30 arrays x chunk x L)
    chunk = 8192
    phys_tmp = 30 * chunk * L * 4
    state = 10 * worst * 4
    total = spectrum + tables + index + phys_tmp + state

    # documented budget: the whole fused step must fit with >=10% slack
    assert total < 0.9 * HBM_BYTES, (
        f"per-shard fused footprint {total/1e9:.2f} GB exceeds "
        f"90% of HBM ({HBM_BYTES/1e9:.2f} GB); worst shard nsrl={worst}")

    # and the single-chip O512 shape (1.07M points) must also fit — the
    # shape the benchmark actually runs.  Advection and physics are
    # separate programs: advection peaks at in+out SRL copies + tables;
    # the SRL-resident physics at ONE (donated, in-place) SRL copy +
    # tables + chunk temps
    g512 = grid_mod.octahedral_grid(512)
    nsrl512 = _srl_len(np.asarray(g512.nlonrgg, np.int64))
    tables512 = nsrl512 * (128 + 128 + 256 + 128) * 4    # no pf
    adv_peak = 2 * nsrl512 * LP * 4 + tables512
    phys_peak = nsrl512 * LP * 4 + tables512 + phys_tmp
    assert max(adv_peak, phys_peak) < 0.95 * HBM_BYTES
