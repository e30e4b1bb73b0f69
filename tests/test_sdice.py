"""Sea-ice attenuation source terms (SDICE1/2/3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecwam_tpu.core import dispersion
from ecwam_tpu.core import physparams as pp
from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.ops.physics import implsch as impl
from ecwam_tpu.ops.physics import sdice as sdice_mod

from test_physics import jonswap

NANG, NFRE, NPTS = 12, 25, 6
DT = jnp.float32


@pytest.fixture(scope="module")
def env_setup():
    tb = build_spectral_tables(nang=NANG, nfre=NFRE)
    depth = np.full(NPTS, 100.0)
    props = dispersion.depth_properties(depth, tb.fr)
    wavnum = jnp.asarray(props["wavnum"].T, DT)
    cgroup = jnp.asarray(props["cgroup"].T, DT)
    f2d = jonswap(tb)
    fl1 = jnp.asarray(np.broadcast_to(f2d[:, :, None], (NANG, NFRE, NPTS)),
                      DT)
    return tb, wavnum, cgroup, fl1


def test_cideac_table_loads():
    tbl = sdice_mod.load_cideac()
    cid = tbl["cideac"]
    assert cid.shape == (16, 36)
    # anchor values from the reference data (cigetdeac.F90:86,551)
    assert cid[5, 0] == -5.5
    assert cid[15, 35] == -5.194
    # extrapolated rows are monotone between the anchors
    assert np.all(cid <= 0.0)


@pytest.mark.parametrize("model", ["lciwa1", "lciwa2", "lciwa3"])
def test_sdice_attenuates_only_ice_points(env_setup, model):
    tb, wavnum, cgroup, fl1 = env_setup
    cic = np.zeros(NPTS)
    cic[:3] = 0.8
    cith = np.zeros(NPTS)
    cith[:3] = 1.5
    fld = jnp.zeros_like(fl1)
    sl = jnp.zeros_like(fl1)
    fld2, sl2, slice_ = sdice_mod.sdice(
        fl1, fld, sl, wavnum, cgroup, jnp.asarray(cic, DT),
        jnp.asarray(cith, DT), tb, 900.0, **{model: True})
    fld2, sl2, slice_ = map(np.asarray, (fld2, sl2, slice_))
    assert np.isfinite(fld2).all() and np.isfinite(sl2).all()
    # pure damping: negative SL/FLD at ice points
    assert (sl2[..., :3] <= 0.0).all()
    assert (fld2[..., :3] <= 0.0).all()
    assert (sl2[..., :3] < 0.0).any()
    # no effect at open-water points
    assert np.allclose(sl2[..., 3:], 0.0)
    assert np.allclose(fld2[..., 3:], 0.0)
    # slice is the modulated pure-ice term: negative at ice points too
    assert (slice_[..., :3] <= 0.0).all()


def test_sdice3_high_freq_damped_faster(env_setup):
    tb, wavnum, cgroup, fl1 = env_setup
    cic = jnp.full(NPTS, 0.9, DT)
    cith = jnp.full(NPTS, 2.0, DT)
    fld = jnp.zeros_like(fl1)
    sl = jnp.zeros_like(fl1)
    _, sl2, _ = sdice_mod.sdice(fl1, fld, sl, wavnum, cgroup, cic, cith,
                                tb, 900.0, lciwa3=True)
    rate = -np.asarray(sl2)[0, :, 0] / np.asarray(fl1)[0, :, 0]
    # attenuation rate grows with frequency (~f^4.5)
    assert (np.diff(rate) > 0).all()


def test_implsch_with_lciwa3_runs(env_setup):
    tb, wavnum, cgroup, fl1 = env_setup
    params = pp.set_phys_params(iphys=1, nang=NANG)
    cfg = impl.make_physics_config(tb, params, idelt=900.0, lciwa3=True,
                                   lmaskice=False)
    depth = np.full(NPTS, 100.0)
    props = dispersion.depth_properties(depth, tb.fr)
    env = {k: jnp.asarray(v.T, DT) for k, v in props.items()}
    env["depth"] = jnp.asarray(depth, DT)
    env["emaxdpt"] = jnp.asarray(dispersion.depth_limited_energy(depth), DT)
    cic = np.zeros(NPTS)
    cic[:3] = 0.9
    cith = np.zeros(NPTS)
    cith[:3] = 2.0
    frc = dict(
        wswave=jnp.full(NPTS, 8.0, DT), wdwave=jnp.zeros(NPTS, DT),
        aird=jnp.full(NPTS, 1.225, DT), wstar=jnp.zeros(NPTS, DT),
        cicover=jnp.asarray(cic, DT), cithick=jnp.asarray(cith, DT))
    u10 = np.full(NPTS, 8.0)
    ustar = u10 * np.sqrt(np.minimum(8e-4 + 8e-5 * u10, 0.0025))
    stress = dict(
        ufric=jnp.asarray(ustar, DT), tauw=jnp.zeros(NPTS, DT),
        tauwdir=jnp.zeros(NPTS, DT),
        z0m=jnp.asarray(0.018 / 9.806 * ustar**2, DT),
        z0b=jnp.zeros(NPTS, DT), chrnck=jnp.full(NPTS, 0.018, DT))
    out, state = jax.jit(
        lambda *a, **k: impl.implsch(cfg, *a, **k))(fl1, env, frc, **stress)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    em_ice = out[..., 0].sum()
    em_open = out[..., 3].sum()
    # iced point loses energy relative to open water
    assert em_ice < em_open
