"""End-to-end smoke: aqua-planet forecast from a JONSWAP cold start."""

import numpy as np
import jax.numpy as jnp
import pytest

from ecwam_tpu.model import setup as setup_mod
from ecwam_tpu.model.driver import WaveModel, constant_wind_forcing


@pytest.fixture(scope="module")
def model():
    ms = setup_mod.build_model(
        grid_name="6.0", nang=12, nfre=25,
        idelpro=900.0, idelt=900.0, pad_to=8, dtype=jnp.float32)
    frc = constant_wind_forcing(ms.n_real, u10=12.0, direction=np.pi / 2)
    return WaveModel(ms, frc, "20230101000000")


def test_cold_start_swh_reasonable(model):
    swh = model.swh()
    assert np.isfinite(swh).all()
    # JONSWAP fetch law at 12 m/s, 50 km fetch → ~1 m seas
    assert 0.2 < swh.mean() < 3.0, swh.mean()


def test_six_hour_run_grows_sea(model):
    swh0 = model.swh().mean()
    model.advance(24)          # 6 h at 900 s
    n = model.norms()
    assert np.isfinite(n["average"])
    assert n["average"] > swh0, (n, swh0)
    assert n["minimum"] >= 0.0
    assert n["maximum"] < 20.0
    assert model.date.hour == 6


def test_energy_stays_bounded_longer(model):
    for _ in range(4):
        model.advance(4)
        n = model.norms()
        assert n["maximum"] < 25.0
        assert np.isfinite(n["average"])
