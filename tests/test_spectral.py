import math

import numpy as np

from ecwam_tpu.core import constants as c
from ecwam_tpu.core import dispersion
from ecwam_tpu.core.spectral import build_spectral_tables


def test_frequency_ladder_matches_reference_formula():
    # mfr.F90:42-49 with operational ifre1=3, fr1=0.04177248
    t = build_spectral_tables(nang=12, nfre=25)
    assert t.fr[2] == 0.04177248
    np.testing.assert_allclose(t.fr[1:] / t.fr[:-1], 1.1, rtol=1e-14)
    # fr(1) = fr1 / 1.1**2
    np.testing.assert_allclose(t.fr[0], 0.04177248 / 1.21, rtol=1e-15)


def test_directions_centered_bins():
    t = build_spectral_tables(nang=12, nfre=25)
    from ecwam_tpu.core import constants as c
    assert math.isclose(t.delth, c.ZPI / 12)  # reference ZPI literal
    np.testing.assert_allclose(t.th[0], 0.5 * t.delth)
    np.testing.assert_allclose(np.diff(t.th), t.delth)


def test_dfim_trapezoid_weights():
    t = build_spectral_tables(nang=12, nfre=25)
    co1 = 0.5 * 0.1 * t.delth
    np.testing.assert_allclose(t.dfim[0], co1 * t.fr[0])
    np.testing.assert_allclose(t.dfim[5], co1 * (t.fr[5] + t.fr[4]))
    np.testing.assert_allclose(t.dfim[-1], co1 * t.fr[-2])
    # interior trapezoid ≈ full band integral of df over the ladder
    np.testing.assert_allclose(
        t.dfim[1:-1].sum() / t.delth,
        0.5 * (t.fr[1:-1] + t.fr[:-2]).sum() * 0.1, rtol=1e-13)


def test_simpson_weights_integrate_close_to_trapezoid():
    t = build_spectral_tables(nang=36, nfre=29)
    # both rules should integrate a smooth function to similar values
    f = np.exp(-((t.fr - 0.1) / 0.05) ** 2)
    trap = (t.dfim * f).sum()
    simp = (t.dfim_sim * f).sum()
    assert abs(trap - simp) / trap < 0.05


def test_rhowg_dfim_endpoints_halved():
    t = build_spectral_tables(nang=36, nfre=29)
    w = c.ROWATER * c.G * t.delth * t.xlogfratio * t.fr
    np.testing.assert_allclose(t.rhowg_dfim[0], 0.5 * w[0])
    np.testing.assert_allclose(t.rhowg_dfim[1:-1], w[1:-1])
    np.testing.assert_allclose(t.rhowg_dfim[-1], 0.5 * w[-1])


def test_dispersion_deep_water_limit():
    fr = np.array([0.1, 0.2, 0.3])
    om = c.ZPI * fr
    k = dispersion.aki(om, np.full(3, 5000.0))
    np.testing.assert_allclose(k, om**2 / c.G, rtol=1e-4)


def test_dispersion_shallow_water_limit():
    om = np.array([0.05])
    d = np.array([5.0])
    k = dispersion.aki(om, d)
    np.testing.assert_allclose(k, om / np.sqrt(c.G * d), rtol=1e-3)


def test_dispersion_exact_root():
    om = c.ZPI * np.geomspace(0.03, 0.5, 20)
    for depth in [3.0, 30.0, 300.0]:
        k = dispersion.aki(om, np.full_like(om, depth))
        resid = om**2 - c.G * k * np.tanh(np.minimum(k * depth, c.DKMAX))
        deep = k * depth > c.DKMAX
        np.testing.assert_allclose(resid[~deep], 0.0, atol=2e-3 * np.max(om**2))


def test_depth_properties_deep_vs_shallow():
    t = build_spectral_tables(nang=12, nfre=25)
    p = dispersion.depth_properties(np.array([10.0, dispersion.BATHYMAX]), t.fr)
    # deep water group velocity = g/(4 pi f); lowest freq at 999 m still
    # feels the bottom slightly (kd ≈ 3), so skip it
    np.testing.assert_allclose(
        p["cgroup"][1, 1:], c.G / (4 * c.PI * t.fr[1:]), rtol=1e-3)
    # shallow water limit cg -> sqrt(g d) for lowest freq at 10 m
    cg_low = p["cgroup"][0, 0]
    assert cg_low < math.sqrt(c.G * 10.0) * 1.01
    assert p["omosnh2kd"][0, 0] > 0
    # cinv = k/omega
    np.testing.assert_allclose(
        p["cinv"], p["wavnum"] / (c.ZPI * t.fr)[None, :], rtol=1e-12)


def test_depth_limited_energy():
    e = dispersion.depth_limited_energy(np.array([2.0, 4.0, 100.0]))
    # depth<4 reduces gamma linearly
    np.testing.assert_allclose(e[0], 0.0625 * (0.8 * 2.0 / 4.0 * 2.0) ** 2)
    np.testing.assert_allclose(e[1], 0.0625 * (0.8 * 4.0) ** 2)
    np.testing.assert_allclose(e[2], 0.0625 * (0.8 * 100.0) ** 2)
