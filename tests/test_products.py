"""Derived-products catalog: OUTBLOCK parity checks on a real model state.

Covers the full parameter surface of /root/reference/src/ecwam/outblock.F90
(windsea/swell separation, directional spread, freak-wave statistics,
period-band heights, energy flux, swell-train partitioning).  The whole
catalog is evaluated through one jitted program (products.compute).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.io import extremes, products
from ecwam_tpu.model import setup as setup_mod
from ecwam_tpu.model.driver import WaveModel, constant_wind_forcing

ALL_FIELDS = sorted(products.CATALOG)


@pytest.fixture(scope="module")
def model():
    ms = setup_mod.build_model(
        grid_name="6.0", nang=12, nfre=25,
        idelpro=900.0, idelt=900.0, pad_to=8, dtype=jnp.float32)
    frc = constant_wind_forcing(ms.n_real, u10=14.0, direction=np.pi / 2)
    m = WaveModel(ms, frc, "20230101000000")
    m.advance(8)               # 2 h: build a windsea + state dict
    return m


@pytest.fixture(scope="module")
def results(model):
    ms = model.setup
    names = [n for n in ALL_FIELDS
             if n not in ("mss", "mwp1", "mwp2")]   # skip aliases
    out, inter = products.compute(
        names, model.fl1, ms.tb, {**model.state, **model.stress},
        model.frc, ms.phys.params, env=ms.env, return_intermediates=True)
    n = ms.n_real
    host = {k: np.asarray(v)[:n] for k, v in out.items()}
    sep = {k: np.asarray(v) for k, v in inter["sep"].items()}
    return host, sep, inter["trains"], names


def test_full_catalog_evaluates(results, model):
    host, _, _, names = results
    n = model.setup.n_real
    for name in names:
        v = host[name]
        assert v.shape == (n,), name
        assert np.isfinite(v).all(), name


def test_windsea_swell_split_conserves_energy(results):
    host, sep, _, _ = results
    n = host["swh"].shape[0]
    etot = host["swh"] ** 2 / 16.0
    esea = sep["esea"][:n]
    eswell = sep["eswell"][:n]
    # split is a partition of the spectrum up to tail handling / noise
    np.testing.assert_allclose(esea + eswell, etot, rtol=0.05)
    # constant wind blowing for only 2 h from a JONSWAP start: windsea
    # dominates at most points
    assert (esea > eswell).mean() > 0.5
    # catalog Hs values consistent with the separated energies
    np.testing.assert_allclose(host["shww"], 4 * np.sqrt(esea[:n]),
                               rtol=1e-5)


def test_windsea_direction_tracks_wind(results):
    host, _, _, _ = results
    diff = np.abs((host["mdww"] - host["dwi"] + 180.0) % 360.0 - 180.0)
    assert np.median(diff) < 30.0, np.median(diff)


def test_directional_spread_range(results):
    host, _, _, _ = results
    for name in ("wdw", "dwww", "dwps"):
        v = host[name]
        assert (v >= 0.0).all() and (v <= np.sqrt(2.0) + 1e-5).all(), name


def test_kurtosis_chain_ranges(results):
    host, _, _, _ = results
    assert (np.abs(host["wsk"]) <= 0.25 + 1e-6).all()
    qp = host["wsp"]
    assert ((qp == 0.0) | ((qp >= 0.5) & (qp <= 15.0))).all()
    # expected max wave height between 1× and 4× Hs (h_max.F90 clips E)
    assert (host["hmax"] >= host["swh"] * (1.0 - 1e-5)).all()
    assert (host["hmax"] <= 4.0 * host["swh"] + 1e-6).all()
    assert (host["tmax"] > 0).all() and (host["tmax"] < 30.0).all()


def test_period_band_heights(results):
    host, _, _, _ = results
    total_var = host["swh"] ** 2 / 16.0
    # each band holds at most the total variance
    for name in ("p052", "p064", "p065", "p066", "p067", "p068", "p069"):
        band_var = host[name] ** 2 / 16.0
        assert (band_var <= total_var * 1.05 + 1e-10).all(), name


def test_weflux_positive_and_directionful(results):
    host, _, _, _ = results
    assert (host["p062"] > 0).all()
    assert ((host["p063"] >= 0.0) & (host["p063"] < 360.0)).all()


def test_ctcor_range(results):
    host, _, _, _ = results
    v = host["wss"]
    assert ((v >= 0.0) & (v <= 1.0 + 1e-6)).all()


def test_swell_trains(results):
    host, sep, trains, _ = results
    n = host["swh"].shape[0]
    em = trains["emtrain"][:n]
    assert em.shape == (n, 3)
    assert (em >= 0.0).all()
    # trains sorted by decreasing energy
    assert (em[:, 0] >= em[:, 1] - 1e-12).all()
    assert (em[:, 1] >= em[:, 2] - 1e-12).all()
    th = trains["thtrain"][:n]
    assert ((th >= 0.0) & (th <= 2.0 * np.pi + 1e-6)).all()
    pm = trains["pmtrain"][:n]
    assert ((pm == 0.0) | ((pm > 1.0) & (pm < 30.0))).all()
    # catalog entries are the converted train columns
    np.testing.assert_allclose(host["p042"],
                               4 * np.sqrt(np.maximum(em[:, 0], 0.0)),
                               rtol=1e-6)


def test_swell_trains_bimodal_swell():
    """Two well-separated swell systems under weak wind must come out as
    two trains with roughly the right energies (sep3tr.F90 purpose)."""
    from ecwam_tpu.io import partition

    tb = build_spectral_tables(nang=12, nfre=25)
    npts = 4
    fl1 = np.zeros((12, 25, npts))
    # swell A: dir bin 2, freq bin 5, Hs ≈ 4√(em)
    for dk in (-1, 0, 1):
        for dm in (-1, 0, 1):
            w = 1.0 if (dk == 0 and dm == 0) else 0.3
            fl1[2 + dk, 5 + dm, :] += 8.0 * w
            fl1[8 + dk, 10 + dm, :] += 4.0 * w
    fl1j = jnp.asarray(fl1)
    xllws = jnp.zeros_like(fl1j)
    cinv = jnp.asarray(
        np.broadcast_to((2 * np.pi * tb.fr / 9.81)[:, None], (25, npts)))
    sep = products.sepwisw(fl1j, xllws, cinv, jnp.full(npts, 1e-3),
                           jnp.full(npts, 2.0), jnp.zeros(npts), tb)
    sep_h = {k: np.asarray(v) for k, v in sep.items()}
    mij = np.full(npts, 24, np.int32)
    tr = partition.sep3tr(np.asarray(fl1j), mij, sep_h,
                          np.full(npts, 2.0), np.zeros(npts), tb)
    em = tr["emtrain"]
    assert (em[:, 0] > 0).all() and (em[:, 1] > 0).all()
    # Expected energy ratio: both systems occupy identical 3×3 stencils, so
    # em = Σ F·DFIM reduces to amplitude × Σ dfim over the stencil rows.
    # System A has 2× the amplitude of B but sits 5 frequency bins lower and
    # DFIM ∝ fr ∝ 1.1^m, hence em_A/em_B = 2/1.1⁵ ≈ 1.2418 — NOT 2.
    ratio = em[:, 0] / em[:, 1]
    expected = 2.0 / 1.1**5
    np.testing.assert_allclose(ratio, expected, rtol=0.05)
    # train directions match the two seeded systems
    th = np.degrees(tr["thtrain"])
    th_a = np.degrees(tb.th[2])
    th_b = np.degrees(tb.th[8])
    assert (np.abs((th[:, 0] - th_a + 180) % 360 - 180) < 30).all()
    assert (np.abs((th[:, 1] - th_b + 180) % 360 - 180) < 30).all()


def test_aki_jax_matches_host_newton():
    from ecwam_tpu.core import dispersion
    om = np.linspace(0.3, 3.0, 16)
    depth = np.linspace(5.0, 500.0, 16)
    ref = dispersion.aki(om, depth)
    got = np.asarray(extremes.aki_jax(jnp.asarray(om), jnp.asarray(depth)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_transf_limits():
    # deep water: R transfer → 0.5, BFI transfer → 1
    r = float(extremes.transf_r(jnp.asarray(0.1), jnp.asarray(5000.0)))
    assert r == pytest.approx(0.5)
    b = float(extremes.transf_bfi(jnp.asarray(0.1), jnp.asarray(5000.0),
                                  jnp.asarray(0.3), jnp.asarray(0.3)))
    assert b == pytest.approx(1.0)


def test_sepwisw_pure_swell_case():
    """With zero wind input mask and tiny u*, everything is swell."""
    import jax

    tb = build_spectral_tables(nang=12, nfre=25)
    rng = np.random.default_rng(0)
    fl1 = jnp.asarray(rng.random((12, 25, 6)), jnp.float64) * 0.01
    xllws = jnp.zeros_like(fl1)
    cinv = jnp.asarray(
        np.broadcast_to((2 * np.pi * tb.fr / 9.81)[:, None], (25, 6)))
    fn = jax.jit(lambda *a: products.sepwisw(*a, tb))
    out = fn(fl1, xllws, cinv, jnp.full(6, 1e-3), jnp.full(6, 5.0),
             jnp.zeros(6))
    esw = np.asarray(out["eswell"])
    ese = np.asarray(out["esea"])
    assert (esw > 100.0 * ese).all()
