"""Two-way coupling surface (wavemdl.F90 / updnemofields.F90 roles)."""

import numpy as np
import pytest

from ecwam_tpu.model import setup as setup_mod
from ecwam_tpu import coupling


@pytest.fixture(scope="module")
def ms():
    # nfre=25 so the young-sea JONSWAP peak (~0.2 Hz at 14 m/s) lies
    # inside the frequency grid
    return setup_mod.build_model(grid_name="18.0", nang=12, nfre=25,
                                 idelpro=900.0, idelt=900.0, pad_to=64,
                                 irefra=2)


def test_coupled_roundtrip(ms):
    n = ms.n_real
    cm = coupling.CoupledWaveModel(ms, "20230101000000")

    # atmosphere pushes a wind period; the wave model integrates it
    cm.push_atmosphere("20230101000000",
                       wswave=np.full(n, 14.0), wdwave=np.full(n, 0.5))
    cm.advance_coupling_period(4)

    w2a = cm.wave_to_atmosphere()
    assert np.all((w2a.charnock > 0.003) & (w2a.charnock < 0.3))
    # Stokes drift downwind (wdwave=0.5 rad → positive u and v comps)
    assert np.all(w2a.ustokes > 0.0) and np.all(w2a.vstokes > 0.0)
    st = np.hypot(w2a.ustokes, w2a.vstokes)
    assert np.all((st > 0.005) & (st < 1.0))
    assert np.all(w2a.phiocd < 0.0)          # energy flux into the ocean
    assert np.all(w2a.wsemean > 0.0)
    assert np.all((w2a.wsfmean > ms.tb.fr[0]) & (w2a.wsfmean <= ms.tb.fr[-1]))
    # dimensional momentum flux roughly aligned with the wind
    ang = np.arctan2(w2a.tauocx, w2a.tauocy)
    assert np.allclose(ang, 0.5, atol=0.3)

    w2o = cm.wave_to_ocean()
    assert np.all((w2o.nswh > 0.3) & (w2o.nswh < 15.0))
    assert np.all(w2o.nmwp > 1.0)
    assert np.all((w2o.ntauoc > 0.5) & (w2o.ntauoc <= 1.0))
    assert np.all(w2o.nphieps <= 0.0)


def test_ocean_push_ice_defaults_and_current_refresh(ms):
    n = ms.n_real
    cm = coupling.CoupledWaveModel(ms, "20230101000000")
    cm.push_atmosphere("20230101000000",
                       wswave=np.full(n, 12.0), wdwave=np.zeros(n))
    cm.advance_coupling_period(2)

    ice = np.zeros(n)
    ice[: n // 2] = 0.95
    uc = np.full(n, 0.4)
    vc = np.zeros(n)
    cm.push_ocean(coupling.Ocean2Wave(cicover=ice, cithick=np.full(n, 1.0),
                                      ucur=uc, vcur=vc))
    # currents reached the propagation weights (GETCURR → LUPDTWGHT)
    assert cm.model._currents is not None
    cm.advance_coupling_period(2)

    w2a = cm.wave_to_atmosphere()
    # ice-covered points must carry the reference DEFVALs
    np.testing.assert_allclose(w2a.charnock[: n // 2], coupling.PRCHAR)
    np.testing.assert_allclose(w2a.ustokes[: n // 2], 0.0)
    np.testing.assert_allclose(w2a.wsfmean[: n // 2], ms.tb.fr[-1])
    # open-water points keep real values
    assert np.all(w2a.ustokes[n // 2:] != 0.0)
