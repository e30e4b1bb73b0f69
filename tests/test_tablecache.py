"""On-disk table cache (model/tablecache.py) — the PREPROC write-once
artifact (outcom.F90/readpre.F90): cached builds must be bit-identical
to fresh builds and keys must separate distinct configurations."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from ecwam_tpu.model import setup as setup_mod


def _assert_same(a, b, name):
    if isinstance(a, np.ndarray):
        assert a.dtype == b.dtype and np.array_equal(a, b), name
    else:
        assert a == b, name


def test_cache_roundtrip_bit_identical(tmp_path):
    kw = dict(grid_name="12.0", nang=12, nfre=15, nfre_red=12,
              idelpro=900.0, idelt=900.0, pad_to=128,
              dtype=jnp.float32, weights_mode="fused")
    fresh = setup_mod.build_model(**kw)
    miss = setup_mod.build_model(cache_dir=str(tmp_path), **kw)
    hit = setup_mod.build_model(cache_dir=str(tmp_path), **kw)
    assert len(list(tmp_path.glob("wamtables_*.npz"))) == 1
    for ms in (miss, hit):
        for f in dataclasses.fields(fresh.fused):
            _assert_same(getattr(fresh.fused, f.name),
                         getattr(ms.fused, f.name), f"fused.{f.name}")
        for f in dataclasses.fields(fresh.stencil):
            _assert_same(getattr(fresh.stencil, f.name),
                         getattr(ms.stencil, f.name), f"st.{f.name}")
        for k in fresh.env:
            assert np.array_equal(np.asarray(fresh.env[k]),
                                  np.asarray(ms.env[k])), k
        _assert_same(fresh.blk.kxlt, ms.blk.kxlt, "blk.kxlt")


def test_cache_key_separates_configs(tmp_path):
    kw = dict(grid_name="12.0", idelpro=900.0, idelt=900.0, pad_to=128,
              dtype=jnp.float32, weights_mode="fused",
              cache_dir=str(tmp_path))
    setup_mod.build_model(nang=12, nfre=15, nfre_red=12, **kw)
    setup_mod.build_model(nang=12, nfre=15, nfre_red=15, **kw)
    setup_mod.build_model(nang=6, nfre=15, nfre_red=12, **kw)
    assert len(list(tmp_path.glob("wamtables_*.npz"))) == 3
