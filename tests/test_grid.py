import numpy as np

from ecwam_tpu.core import grid as g


def test_octahedral_point_count_O48():
    # 2·Σ_{j=0..N-1}(20+4j) (BASELINE.md: O48 → 10,944)
    wg = g.octahedral_grid(48)
    assert int(wg.nlonrgg.sum()) == 10944
    assert wg.ngy == 96
    assert wg.ngx == 20 + 4 * 47
    # outermost rows have 20 points, equator rows the most
    assert wg.nlonrgg[0] == 20 and wg.nlonrgg[-1] == 20
    assert wg.nlonrgg[47] == wg.ngx and wg.nlonrgg[48] == wg.ngx


def test_octahedral_point_count_O320():
    wg = g.octahedral_grid(320)
    assert int(wg.nlonrgg.sum()) == 421120


def test_octahedral_point_count_O1280():
    wg = g.octahedral_grid(1280)
    assert int(wg.nlonrgg.sum()) == 6599680


def test_metric_terms():
    wg = g.octahedral_grid(48)
    # delphi = xdella * circumference / 360
    assert abs(wg.delphi - wg.xdella * 40007993.95 / 360.0) < 1e-6
    # cosph capped at 87.5 deg
    from ecwam_tpu.core import constants as c
    assert wg.cosph[0] >= np.cos(87.5 * c.RAD) - 1e-12  # reference RAD literal
    np.testing.assert_allclose(
        wg.cosph[48], np.cos(wg.lats[48] * c.RAD), rtol=1e-12)


def test_sea_point_block_aqua():
    wg = g.regular_grid(6.0, name="aqua6")
    bathy = g.aqua_bathymetry(wg)
    blk = g.build_sea_point_block(wg, bathy)
    # all reduced-row points are sea except the two polar rows
    assert blk.nsea == int(wg.nlonrgg[1:-1].sum())
    # block is lat-major, south→north
    assert (np.diff(blk.kxlt) >= 0).all()
    assert blk.kxlt[0] == 1 and blk.kxlt[-1] == wg.ngy - 2
    # round-trip grid2blk
    sea = blk.grid2blk[blk.kxlt, blk.ixlg]
    np.testing.assert_array_equal(sea, np.arange(blk.nsea))
    np.testing.assert_allclose(blk.depth, 999.0)


def test_sea_point_block_with_land():
    wg = g.regular_grid(30.0, reduced=False)
    bathy = np.full((wg.ngy, wg.ngx), 100.0)
    bathy[3, 5] = -999.0  # one land point
    blk = g.build_sea_point_block(wg, bathy)
    assert blk.nsea == wg.ngy * wg.ngx - 1
    assert blk.grid2blk[3, 5] == -1
