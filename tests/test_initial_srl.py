"""Device-side JONSWAP cold start (FusedPropagation.initial_srl) vs the
host MSTART construction — the bench/driver O512 setup path
(preset.F90:634, mstart.F90:49-80)."""

import numpy as np
import jax.numpy as jnp

from ecwam_tpu.model import preset
from ecwam_tpu.model import setup as setup_mod
from ecwam_tpu.model.fusedstep import FusedPropagation


def test_initial_srl_matches_host_mstart():
    nang, nfre, nfre_red = 12, 15, 12
    ms = setup_mod.build_model(
        grid_name="12.0", nang=nang, nfre=nfre, nfre_red=nfre_red,
        idelpro=900.0, idelt=900.0, pad_to=256, dtype=jnp.float32,
        weights_mode="fused")
    ft = ms.fused
    fp = FusedPropagation(ms)
    n = ms.n_pad
    rng = np.random.default_rng(0)
    wswave = (8.0 + 4.0 * rng.random(n)).astype(np.float32)
    wswave[: n // 8] = 0.0                   # calm points: zero spectrum
    wdwave = (rng.random(n) * 2 * np.pi).astype(np.float32)

    L = nang * nfre_red
    LPb = fp.LP if fp.backend == "pallas" else fp.L
    LT = nang * (nfre - nfre_red)
    LTP = -(-LT // 128) * 128
    fpk, alphaj = preset.peak(wswave, 50000.0, 0.2)
    et = np.asarray(preset.jonswap_1d(ms.tb.fr, fpk, alphaj,
                                      3.0, 0.07, 0.09), np.float32)
    st = np.asarray(preset.spread(ms.tb.th, wdwave), np.float32)
    src = np.asarray(ft.srl_src)
    fll = np.zeros((n + 1, LPb), np.float32)
    np.einsum("nk,nm->nkm", st, et[:, :nfre_red],
              out=fll[:n, :L].reshape(n, nang, nfre_red))
    ref = fll[src]
    tl = np.zeros((n + 1, LTP), np.float32)
    np.einsum("nk,nm->nkm", st, et[:, nfre_red:],
              out=tl[:n, :LT].reshape(n, nang, nfre - nfre_red))
    ref_t = tl[src]

    f_srl, tail = fp.initial_srl(wswave, wdwave)
    scale = float(ref.max())
    # device path computes in f32 (host reference in f64): ~1e-5 relative
    # to the spectrum scale (tail bins are ~1e-8·scale, compared in
    # absolute terms against the same overall scale)
    assert float(np.max(np.abs(np.asarray(f_srl) - ref))) < 1e-4 * scale
    assert float(np.max(np.abs(np.asarray(tail) - ref_t))) < 1e-4 * scale + 1e-7
    # calm points must be exactly zero (MSTART windy mask)
    calm_rows = np.nonzero(src < n // 8)[0]
    assert np.all(np.asarray(f_srl)[calm_rows] == 0.0)
