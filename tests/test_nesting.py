"""Boundary nesting: INTSPEC family vs f64 oracle + coarse→fine flow
(mbounc/outbc/bouint/mbounf/bouinpt roles)."""

import numpy as np
import pytest

from ecwam_tpu.core import spectral
from ecwam_tpu.model import nesting
from tests.oracle import nesting as oref


@pytest.fixture(scope="module")
def tb():
    return spectral.build_spectral_tables(12, 25)


def _spec(tb, seed=0, nb=5):
    rng = np.random.default_rng(seed)
    f = np.zeros((nb, tb.nang, tb.nfre))
    for b in range(nb):
        kp = rng.integers(0, tb.nang)
        mp = rng.integers(4, tb.nfre - 6)
        amp = 0.5 + rng.random()
        k = np.arange(tb.nang)
        m = np.arange(tb.nfre)
        dk = np.minimum(np.abs(k - kp), tb.nang - np.abs(k - kp))
        f[b] = amp * np.exp(-0.5 * (dk[:, None] / 2.0) ** 2
                            - 0.5 * ((m[None, :] - mp) / 3.0) ** 2)
    return f


def test_rotspec_matches_oracle(tb):
    f = _spec(tb, 1)
    for rthet in (0.3, 2.1, -0.7, 5.9):
        got = nesting.rotspec(f, np.full(f.shape[0], rthet))
        for b in range(f.shape[0]):
            want = oref.rotspec_ref(f[b], rthet)
            np.testing.assert_allclose(got[b], want, rtol=1e-12)


def test_strspec_matches_oracle(tb):
    f = _spec(tb, 2)
    for gamma in (1.0, 1.1, 1.1**2, 1.05, 0.95, 1.0 / 1.1, 1.21001):
        got = nesting.strspec(f, np.full(f.shape[0], gamma), tb.fr)
        for b in range(f.shape[0]):
            want = oref.strspec_ref(f[b], gamma, np.asarray(tb.fr))
            np.testing.assert_allclose(
                got[b], want, rtol=1e-10, atol=1e-13,
                err_msg=f"gamma={gamma}")


def test_intspec_matches_oracle(tb):
    f1 = _spec(tb, 3)
    f2 = _spec(tb, 4)
    em1, fm1, th1 = nesting.mean_params(f1, tb)
    em2, fm2, th2 = nesting.mean_params(f2, tb)
    w2 = np.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
    got, em, fm, thq = nesting.intspec(f1, f2, w2, tb)
    for b in range(f1.shape[0]):
        want, eme, fme, thqe = oref.intspec_ref(
            np.asarray(tb.fr), 1.0, w2[b],
            f1[b], fm1[b], em1[b], th1[b],
            f2[b], fm2[b], em2[b], th2[b])
        np.testing.assert_allclose(got[b], want, rtol=1e-10, atol=1e-13)
        np.testing.assert_allclose([em[b], fm[b], thq[b]],
                                   [eme, fme, thqe], rtol=1e-10)


def test_intspec_identical_spectra_identity(tb):
    f = _spec(tb, 5)
    out, em, fm, thq = nesting.intspec(f, f, np.full(f.shape[0], 0.37),
                                       tb)
    np.testing.assert_allclose(out, f, rtol=1e-9, atol=1e-12)


def test_intspec_zero_energy_cases(tb):
    """The EM==0 branches (intspec.F90:120-160) trigger on the STORED
    means (boundary-file header values), as in the reference."""
    f = _spec(tb, 6)
    nb = f.shape[0]
    z = np.zeros_like(f)
    w2 = np.full(nb, 0.25)
    mz = (np.zeros(nb), np.full(nb, 0.1), np.zeros(nb))
    mf = nesting.mean_params(f, tb)
    out, em, _, _ = nesting.intspec(z, f, w2, tb, means1=mz, means2=mf)
    np.testing.assert_allclose(out, 0.25 * f, rtol=1e-12)
    np.testing.assert_allclose(em, 0.25 * mf[0], rtol=1e-12)
    out, em, _, _ = nesting.intspec(f, z, w2, tb, means1=mf, means2=mz)
    np.testing.assert_allclose(out, 0.75 * f, rtol=1e-12)


def _grids():
    from ecwam_tpu.core import grid as grid_mod
    coarse = grid_mod.regular_grid(xdella=3.0)
    # the nesting tables are rectangle-based: any grid works as the
    # "fine" side, with the nest rim given explicitly
    fine = grid_mod.regular_grid(xdella=1.0, amosop=-15.0, amonop=15.0)
    return coarse, fine


def test_boundary_tables_and_roundtrip(tb, tmp_path):
    from ecwam_tpu.core.grid import build_sea_point_block
    coarse, fine = _grids()
    cblk = build_sea_point_block(
        coarse, np.full((coarse.ngy, coarse.ngx), 4000.0))
    fblk = build_sea_point_block(
        fine, np.full((fine.ngy, fine.ngx), 4000.0))
    cb = nesting.coarse_boundary(coarse, cblk, -15.0, 15.0, 30.0, 60.0)
    assert cb.idx.size > 10
    assert (np.diff(cb.s) >= 0).all()
    fb = nesting.fine_boundary(fine, fblk, cb)
    assert fb.idx.size > cb.idx.size     # finer rim has more points
    assert ((fb.bfw >= 0.0) & (fb.bfw <= 1.0)).all()

    # OUTBC at two dates with a uniform field -> interpolation at the
    # mid date returns the mid value at every fine boundary point
    npts_c = int(np.asarray(cblk.kxlt).size)
    f_a = np.broadcast_to(_spec(tb, 7, 1)[0][..., None],
                          (tb.nang, tb.nfre, npts_c))
    wr = nesting.BoundaryWriter(cb, tb)
    wr.add("20220101000000", f_a)
    wr.add("20220101060000", 3.0 * f_a)
    path = str(tmp_path / "wam_boundary.npz")
    wr.save(path)

    bf = nesting.BoundaryFile(path, tb)
    # exact date: no interpolation
    rec0, _ = bf.at("20220101000000")
    np.testing.assert_allclose(rec0[0], f_a[..., 0], rtol=1e-6)
    # mid date: INTSPEC of f and 3f must be 2f (same shape -> pure
    # energy scaling; w2=0.5)
    rec, _ = bf.at("20220101030000")
    np.testing.assert_allclose(rec[0], 2.0 * f_a[..., 0], rtol=1e-5)

    fl1 = np.zeros((tb.nang, tb.nfre,
                    np.asarray(fblk.kxlt).size))
    out = nesting.apply_boundary(fl1, bf, fb, "20220101030000")
    got = out[..., fb.idx]
    want = 2.0 * f_a[..., 0]
    np.testing.assert_allclose(
        got, np.broadcast_to(want[..., None], got.shape), rtol=1e-5)
    # non-boundary points untouched
    mask = np.ones(out.shape[-1], bool)
    mask[fb.idx] = False
    assert np.all(out[..., mask] == 0.0)


def test_nesting_e2e_coarse_to_fine(tmp_path):
    """Coarse run writes the boundary file (OUTBC), fine run consumes it
    (BOUINPT) — rim spectra move toward the coarse values."""
    from ecwam_tpu.cli.main import run_model
    from ecwam_tpu.config.schema import RunConfig

    rect = [-24.0, 24.0, 60.0, 120.0]
    base = dict(
        grid="12.0", directions=12, frequencies=25, bathymetry="aqua",
        begin="20220101000000", end="20220101010000",
        advection={"timestep": 1800}, physics={"timestep": 1800},
        output={"fields": {"name": ["swh"], "format": "binary",
                           "at": [{"timestep": 1800}]}})
    ccfg = RunConfig.from_dict(
        {**base, "nesting": {"coarse": {"rect": rect}}})
    crun = str(tmp_path / "coarse")
    run_model(ccfg, crun, quiet=True)
    bc = crun + "/wam_boundary.npz"
    assert np.load(bc)["dates"].size >= 2

    fcfg = RunConfig.from_dict(
        {**base, "grid": "6.0",
         "nesting": {"fine": {"file": bc}}})
    frun = str(tmp_path / "fine")
    model, _ = run_model(fcfg, frun, quiet=True)
    # the fine rim points carry interpolated coarse spectra (nonzero)
    from ecwam_tpu.model import nesting as nesting_mod
    from ecwam_tpu.core import spectral
    tb = spectral.build_spectral_tables(12, 25)
    bf = nesting_mod.BoundaryFile(bc, tb)
    ft = nesting_mod.fine_boundary(model.setup.grid, model.setup.blk,
                                   bf.coarse_boundary())
    rim = np.asarray(model.fl1)[..., ft.idx]
    assert np.isfinite(rim).all() and rim.max() > 0.0
