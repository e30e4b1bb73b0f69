"""Refraction: PROPDOT rates (GRADI gradients) and IREFRA=2 propagation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecwam_tpu.core import constants as c
from ecwam_tpu.model import setup as setup_mod
from ecwam_tpu.model import stepper as stepper_mod
from ecwam_tpu.model.stepper import _st_ns
from ecwam_tpu.ops import propagation as prop

NANG, NFRE = 12, 15
DT = jnp.float32


def build(irefra=0, currents=None, xdella=6.0):
    return setup_mod.build_model(
        grid_name=str(xdella), nang=NANG, nfre=NFRE,
        idelpro=600.0, idelt=600.0, pad_to=64, irefra=irefra,
        currents=currents, dtype=DT)


def pt_latlon(ms):
    lat = np.asarray(ms.grid.lats)[ms.blk.kxlt]
    lon = (ms.grid.amowep
           + ms.blk.ixlg * ms.grid.zdello[ms.blk.kxlt])
    return lat, lon


def zonal_current(ms_template, u0=0.5):
    """Solid-body-ish zonal current, strongest at the equator."""
    lat, _ = pt_latlon(ms_template)
    u = u0 * np.cos(np.deg2rad(lat)) ** 2
    return u, np.zeros_like(u)


@pytest.fixture(scope="module")
def ms0():
    return build()


def test_propdot_zero_for_uniform_conditions(ms0):
    """Aqua planet (uniform depth), no currents → all rates vanish."""
    ms = ms0
    st = _st_ns(stepper_mod.stencil_device_arrays(ms), ms.stencil.xdella)
    nfr = ms.tb.nfre_red
    thdd, thdc, sdot = prop.propdot(
        st, ms.tb, ms.env["wavnum_ext"][:nfr], ms.env["cgroup_ext"][:nfr],
        ms.env["omosnh2kd_ext"][:nfr], ms.env["depth_ext"],
        ms.env["ucur_ext"], ms.env["vcur_ext"], 3)
    assert np.allclose(np.asarray(thdd), 0.0)
    assert np.allclose(np.asarray(thdc), 0.0)
    assert np.allclose(np.asarray(sdot), 0.0)


def test_propdot_shear_current_rates():
    """A sheared zonal current gives finite, clipped θ̇_c and σ̇."""
    ms = build()
    u, v = zonal_current(ms, u0=1.0)
    ms = build(irefra=2, currents=(u, v))
    st = _st_ns(stepper_mod.stencil_device_arrays(ms), ms.stencil.xdella)
    nfr = ms.tb.nfre_red
    thdd, thdc, sdot = prop.propdot(
        st, ms.tb, ms.env["wavnum_ext"][:nfr], ms.env["cgroup_ext"][:nfr],
        ms.env["omosnh2kd_ext"][:nfr], ms.env["depth_ext"],
        ms.env["ucur_ext"], ms.env["vcur_ext"], 2)
    assert thdd is None
    thdc = np.asarray(thdc)
    sdot = np.asarray(sdot)
    assert np.isfinite(thdc).all() and np.isfinite(sdot).all()
    assert (np.abs(thdc) > 0).any()
    assert (np.abs(sdot) > 0).any()
    # gradient clipping bounds the rates: |du/dphi| <= 1e-5 → θ̇ ≤ ~4e-5
    assert np.abs(thdc).max() < 1.0e-4


def test_irefra2_step_runs_and_conserves(ms0):
    """Full weight+stencil pipeline with currents: energy bounded, finite."""
    u, v = zonal_current(ms0, u0=0.8)
    ms = build(irefra=2, currents=(u, v))
    step_full, step_adv, _ = stepper_mod.make_step(ms)

    rng = np.random.default_rng(0)
    fl1 = jnp.asarray(
        0.1 * rng.random((NANG, NFRE, ms.n_pad)), DT)
    tot0 = float(jnp.sum(fl1[..., : ms.n_real]))
    f = fl1
    for _ in range(5):
        f = step_adv(f)
    f = np.asarray(f)
    assert np.isfinite(f).all()
    assert (f >= -1e-7).all()
    tot = float(f[..., : ms.n_real].sum())
    # advection conserves energy on the closed aqua sphere to a few 1e-3
    # (frequency-shift flux leaves through the spectral boundaries)
    assert abs(tot - tot0) / tot0 < 0.05


def test_current_advection_shifts_energy_downstream():
    """IREFRA=2 also adds the current to the CTU advection velocity:
    a uniform eastward current moves a blob east faster than no current."""
    ms_nc = build()
    n = ms_nc.n_real
    u = np.full(n, 1.0)
    v = np.zeros(n)
    ms_cur = build(irefra=2, currents=(u, v))

    # blob at one point, all directions/freqs
    lat, lon = pt_latlon(ms_nc)
    p0 = int(np.argmin(np.abs(lon - 180.0) + np.abs(lat)))

    def centroid_lon(ms):
        _, step_adv, _ = stepper_mod.make_step(ms)
        fl1 = np.zeros((NANG, NFRE, ms.n_pad), np.float32)
        fl1[:, :, p0] = 1.0
        f = jnp.asarray(fl1)
        for _ in range(30):
            f = step_adv(f)
        w = np.asarray(f)[..., :n].sum(axis=(0, 1))
        # energy-weighted mean lon near the blob (no wraparound issues
        # at 180°E for this short integration)
        return float((w * lon).sum() / w.sum())

    c_nc = centroid_lon(ms_nc)
    c_cur = centroid_lon(ms_cur)
    # 30 steps × 600 s × 1 m/s ≈ 0.16° eastward shift of the centroid
    assert c_cur > c_nc + 0.05
