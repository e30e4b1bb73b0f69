"""Forcing-pipeline fidelity (VERDICT r1 #7).

Covers: the NEWWIND swap with the low-wind TAUW cap (newwind.F90:105-146),
u*/stress ICODE input variants (wamwnd.F90 CASE 1/2 + airsea.F90 U10
recovery), time-varying currents triggering a weight refresh
(getcurr.F90 → LUPDTWGHT), and reduced-grid GRIB forcing ingest
(grib2wgrid.F90 reduced branch).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ecwam_tpu.model import setup as setup_mod
from ecwam_tpu.model import driver as driver_mod
from ecwam_tpu.io import forcing as forcing_mod


def _model(**kw):
    return setup_mod.build_model(
        grid_name="12.0", nang=12, nfre=25, idelpro=900.0, idelt=900.0,
        pad_to=64, **kw)


def test_newwind_tauw_cap():
    """Swapping to a weak wind must cap TAUW at the reference formula
    TLWMAX = (ACD + BCD·U10)·U10³ / WSPMIN_RESET_TAUW (newwind.F90:125-146)."""
    ms = _model()
    n = ms.n_real

    winds = {0: 14.0, 1: 2.0}          # strong → weak swap
    calls = {"i": 0}

    def provider(date14):
        u = winds[min(calls["i"], 1)]
        calls["i"] += 1
        return dict(wswave=np.full(n, u), wdwave=np.zeros(n),
                    aird=np.full(n, 1.225), wstar=np.zeros(n),
                    cicover=np.zeros(n))

    m = driver_mod.WaveModel(ms, provider, "20230101000000")
    m.advance(4)                        # builds up real wave stress
    tauw_before = np.asarray(m.stress["tauw"])[: n]
    assert tauw_before.max() > 1e-3

    m.newwind(m.date)                   # swap to 2 m/s wind
    u10 = 2.0
    tlwmax = (8.0e-4 + 8.0e-5 * u10) * u10**3 / 4.0
    tauw_after = np.asarray(m.stress["tauw"])[: n]
    assert (tauw_after <= tlwmax + 1e-7).all()
    np.testing.assert_allclose(
        tauw_after, np.minimum(tauw_before, tlwmax), rtol=1e-6)


def test_icode1_ustar_forcing_runs_and_recovers_u10():
    """ICODE=1 (u* forcing): the model derives U10 from the log profile
    (airsea.F90 ICODE 1/2) and stays physical."""
    ms = _model(icode_wnd=1)
    n = ms.n_real
    us = 0.5

    def provider(date14):
        return dict(wswave=np.zeros(n), wdwave=np.zeros(n),
                    aird=np.full(n, 1.225), wstar=np.zeros(n),
                    cicover=np.zeros(n), ufric=np.full(n, us))

    m = driver_mod.WaveModel(ms, provider, "20230101000000",
                             stress=None)
    # ufric must enter the stress state via NEWWIND semantics
    m.newwind(m.date)
    np.testing.assert_allclose(np.asarray(m.stress["ufric"])[:n], us)
    m.advance(2)
    # U10 from the log profile: u*/κ·(log(10/z0)) ∈ ~(10, 18) m/s for
    # u*=0.5 over sea roughness
    u10 = np.asarray(m.state["wswave"])[: n]
    assert (u10 > 6.0).all() and (u10 < 25.0).all()
    swh = m.swh()
    assert np.isfinite(swh).all() and swh.max() < 20.0


def test_currents_update_refreshes_weights():
    """A current change at a wind date must re-derive the CTU weights and
    change the propagation (LUPDTWGHT); without the refresh the advected
    field would be identical."""
    ms = _model(irefra=2, nfre_red=25)
    n = ms.n_real

    cur = {"u": np.zeros(n)}

    def provider(date14):
        return dict(wswave=np.full(n, 10.0), wdwave=np.zeros(n),
                    aird=np.full(n, 1.225), wstar=np.zeros(n),
                    cicover=np.zeros(n),
                    ucur=cur["u"], vcur=np.zeros(n))

    m = driver_mod.WaveModel(ms, provider, "20230101000000")
    f0 = m.step_adv(m.fl1)

    cur["u"] = np.full(n, 0.8)          # strong zonal current
    m.newwind(m.date)
    f1 = m.step_adv(m.fl1)
    d = np.abs(np.asarray(f0) - np.asarray(f1)).max()
    assert d > 1e-7, "current update did not change propagation"


def test_reduced_grid_grib_ingest(tmp_path):
    """A reduced-grid GRIB forcing file decodes and interpolates
    (grib2wgrid.F90 reduced branch)."""
    from ecwam_tpu.io import grib as grib_mod

    ny = 19
    lats = np.linspace(90.0, -90.0, ny)
    pl = np.maximum((36 * np.cos(np.deg2rad(lats))).astype(int), 4)
    # u10 = 10·cos(lat), v10 = 0 on the reduced grid
    vals_u, vals_v = [], []
    for j in range(ny):
        vals_u.append(np.full(pl[j], 10.0 * np.cos(np.deg2rad(lats[j]))))
        vals_v.append(np.zeros(pl[j]))
    meta = dict(param=165, level_type=1, level=0, date=20230101, time=0,
                unit_of_time=1, p1=0, p2=0, time_range=0,
                grid_type=4, ni=-1, nj=ny,
                lat1=90000, lon1=0, lat2=-90000,
                lon2=int((360.0 - 360.0 / pl.max()) * 1000),
                di=-1, dj=int(1000 * 180 / (ny - 1)))
    path = str(tmp_path / "reduced.grib")
    msgs = []
    u = np.concatenate(vals_u)
    v = np.concatenate(vals_v)
    raw_u = grib_mod.encode_message(u, dict(meta), pl=pl)
    raw_v = grib_mod.encode_message(v, dict(meta, param=166), pl=pl)
    with open(path, "wb") as fh:
        fh.write(raw_u)
        fh.write(raw_v)

    ff = forcing_mod.ForcingFile.load(path)
    plat = np.array([0.0, 30.0, -45.0])
    plon = np.array([10.0, 100.0, 250.0])
    prov = ff.provider(plat, plon)
    out = prov("20230101000000")
    want = 10.0 * np.cos(np.deg2rad(plat))
    np.testing.assert_allclose(out["wswave"], want, rtol=0.05)
