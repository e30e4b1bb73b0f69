"""Committed golden trajectory (VERDICT r4 weak #4 / next #7b).

Runs ONE fixed synthetic configuration on the production fast path and
compares the statistics.log contract (decimal + IEEE-754 hex norms,
outwnorm.F90:114-140) against a committed artifact, so numerics cannot
drift silently between rounds.

Regenerate intentionally with:
    ECWAVE_REGEN_GOLDEN=1 python -m pytest tests/test_golden_trajectory.py
"""

import json
import os

import numpy as np
import jax.numpy as jnp

from ecwam_tpu.io import norms as norms_mod
from ecwam_tpu.model import driver, setup as setup_mod

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "statistics_golden.json")
NSTEPS = 5


def _model():
    from ecwam_tpu.core import bathy as bathy_mod, grid as grid_mod
    from ecwam_tpu.core.spectral import build_spectral_tables
    from test_trajectory_oracle import _forcing
    nang, nfre, nfre_red = 12, 18, 15     # ladder reaches the windsea
    topo = bathy_mod.synthetic_topo(invres=2, features=[
        dict(kind="land", lon=(40.0, 44.0), lat=(0.0, 12.0), elev=300.0),
        dict(kind="shoal", lon=(80.0, 92.0), lat=(-12.0, 0.0),
             elev=-15.0)])
    wg = grid_mod.regular_grid(12.0, name="t12")
    tb = build_spectral_tables(nang=nang, nfre=nfre, nfre_red=nfre_red)
    b, obs = bathy_mod.make_bathymetry(topo, wg, tb.fr,
                                       nfre_red=nfre_red)
    blk = grid_mod.build_sea_point_block(wg, b)
    obstr = bathy_mod.obstructions_to_block(obs, blk)
    n_real = blk.nsea
    forcing_at = _forcing(n_real)
    ms = setup_mod.build_model(
        grid=wg, bathy=b, nang=nang, nfre=nfre, nfre_red=nfre_red,
        pad_to=8, dtype=jnp.float32, obstructions=obstr, iphys=1,
        weights_mode="fused", idelpro=900.0, idelt=1800.0,
        delpro_lf=450.0, ifrelfmax=3, irefra=1)

    def provider(date14):
        step = int((driver.parse_date(date14)
                    - driver.parse_date("20230101000000")
                    ).total_seconds() // ms.idelpro)
        return forcing_at(step)

    return ms, driver.FastWaveModel(ms, provider, "20230101000000",
                                    backend="pallas", interpret=True)


def _trajectory_entries():
    ms, m = _model()
    n = ms.n_real
    log = norms_mod.StatisticsLog()
    for i in range(NSTEPS):
        m.advance(1, full_phys=True)
        fl1 = np.asarray(m.fl1, np.float64)[..., :n]
        tb = ms.tb
        dfim = np.asarray(tb.dfim)
        em = (fl1.sum(axis=0) * dfim[:, None]).sum(axis=0)
        swh = 4.0 * np.sqrt(np.maximum(em, 0.0))
        date = m.date.strftime("%Y%m%d%H%M%S")
        log.add("swh", date, swh)
        st = m.state
        if st:                      # physics runs every 2nd step
            for k in ("ufric", "phiaw", "emean", "wsemean"):
                log.add(k, date, np.asarray(st[k], np.float64)[:n])
            for k in ("esea", "eswell"):
                log.add(k, date,
                        np.asarray(st["sep"][k], np.float64)[:n])
    return log.entries


def test_golden_statistics():
    entries = _trajectory_entries()
    got = [{"name": e["name"], "date": e["time"],
            "average": e["average"], "minimum": e["minimum"],
            "maximum": e["maximum"],
            "hex": norms_mod.ieee_hex(e["average"])}
           for e in entries]
    if os.environ.get("ECWAVE_REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1)
        return
    assert os.path.exists(GOLDEN), (
        "golden artifact missing — run with ECWAVE_REGEN_GOLDEN=1")
    with open(GOLDEN) as f:
        want = json.load(f)
    assert len(got) == len(want)
    hex_mismatch = []
    for g, w in zip(got, want):
        assert g["name"] == w["name"] and g["date"] == w["date"]
        for k in ("average", "minimum", "maximum"):
            np.testing.assert_allclose(
                g[k], w[k], rtol=2e-5, atol=1e-12,
                err_msg=f"{g['name']}@{g['date']}:{k}")
        if g["hex"] != w["hex"]:
            hex_mismatch.append(f"{g['name']}@{g['date']}")
    # hex equality is the strict bit-reproducibility signal; decimal
    # drift within tolerance but hex churn means an intentional
    # numerics change — regenerate the artifact in the same commit
    assert not hex_mismatch, (
        f"bit-level change in {hex_mismatch}; if intentional, "
        "regenerate with ECWAVE_REGEN_GOLDEN=1")
