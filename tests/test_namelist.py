"""MPUSERIN namelist surface (mpuserin.F90:178-262, userin.F90 rules)."""

import datetime as dt

import pytest

from ecwam_tpu.config import namelist as nml


REFERENCE_STYLE = """
&NALINE
  NANG                  = 24,
  NFRE                  = 36,
  NFRE_RED              = 29,
  CLHEADER              = " WAVE MODEL ",
  CBPLTDT               = "20220101000000",
  CEPLTDT               = "20220101120000",
  CDATEF                = "20220101000000",
  CDATECURA             = "20220101000000",
  DELPRO_LF             = 225,
  IFRELFMAX             = 4,
  IDELPRO               = 450,
  IDELT                 = 900,
  IDELINT               = 3600,
  IDELCUR               = 0
  IREST                 = 1,
  LFDBIOOUT             = F,
  LFDB                  = F,
  IPHYS                 = 1,
  ISHALLO               = 0,
  ISNONLIN              = 0,
  LBIWBK                = T,
  LLCAPCHNK             = T,
  LLGCBZ0               = .TRUE.,
  LLNORMAGAM            = F,
  IPROPAGS              = 2,
  LSUBGRID              = F,
  IREFRA                = 3,
  LICERUN               = T,
  LMASKICE              = T,
  NGRIB_VERSION         = 2,
  YCLASS                = "rd",
  YEXPVER               = "wave",
  CPATH                 = "/tmp/run",
  LGRIBOUT              = T,
  NPROMA_WAM            = 24,
  LFRSTFLD              = T,
  IDELRES               = 0,  ! ignored if NAOS sections exist
  LSECONDORDER          = F,
  LLNORMWAMOUT          = T,
  CNORMWAMOUT_FILE      = "statistics.log",
  GFLAG(1)=T,
  GFLAG(2)=T,
  NFLAG(1)=T,
/
&NAWI IDWI=3600, IDWO=3600, CLWOUT="20220101120000" /
&NAOS CLSOUT="20220101060000" /
&NAOS CLSOUT="20220101120000" /
&NAOT CLOUT="20220101030000" /
&NAOUTP ZOUTLAT=54.5, ZOUTLONG=-20.0 /
"""


def test_parser_basics():
    g = nml.parse_namelist(REFERENCE_STYLE)
    na = g["naline"][0]
    assert na["nang"] == 24
    assert na["delpro_lf"] == 225
    assert na["llgcbz0"] is True
    assert na["lfdb"] is False
    assert na["clheader"] == " WAVE MODEL "
    assert na["gflag"][0] is True and na["gflag"][1] is True
    assert len(g["naos"]) == 2
    assert g["naoutp"][0]["zoutlat"] == 54.5


def test_parser_repeats_arrays_and_exponents():
    g = nml.parse_namelist(
        "&X A = 3*1.5, B = 1.D0, C = 'it''s', D = 1, 2, 3 /")
    x = g["x"][0]
    assert x["a"] == [1.5, 1.5, 1.5]
    assert x["b"] == 1.0
    assert x["c"] == "it's"
    assert x["d"] == [1, 2, 3]


def test_mapping_to_runconfig():
    cfg = nml.namelist_to_config(REFERENCE_STYLE)
    run = cfg.run
    assert run.directions == 24
    assert run.frequencies == 36
    assert run.adv_timestep == 450.0
    assert run.phys_timestep == 900.0
    assert run.fast_waves_timestep == 225.0
    assert run.fast_waves_max_frequency == 4
    assert run.begin == dt.datetime(2022, 1, 1, 0)
    assert run.end == dt.datetime(2022, 1, 1, 12)
    assert run.irefra == 3 and run.iphys == 1
    assert run.llgcbz0 and run.llcapchnk and not run.llnormagam
    assert not run.lsecondorder
    assert cfg.extras["isnonlin"] == 0
    assert cfg.extras["lmaskice"] is True

    assert cfg.output_dates == [dt.datetime(2022, 1, 1, 3)]
    assert cfg.restart_dates == [dt.datetime(2022, 1, 1, 6),
                                 dt.datetime(2022, 1, 1, 12)]
    assert cfg.wind_dates == [(dt.datetime(2022, 1, 1, 12), 3600.0,
                               3600.0)]
    assert cfg.point_outputs == [(54.5, -20.0)]
    assert cfg.flags["gflag"][:2] == [True, True]
    assert cfg.flags["nflag"][0] is True
    assert cfg.flags["fflag"] is None
    # explicit NAOS dates supersede IDELRES (mpuserin.F90 NAOS loop)
    assert run.restart_times == (dt.datetime(2022, 1, 1, 6),
                                 dt.datetime(2022, 1, 1, 12))


def test_hour_units_and_cadence_defaulting():
    text = """
&NALINE
 CBPLTDT="20220101000000", CEPLTDT="20220102000000",
 CLMTSU = 'S','S','H','H', CLOTSU='H','H',
 IDELPRO=900, IDELT=900, IDELWI=6, IDELWO=6,
 IDELINT=6, IDELRES=24, CDATER="20220102000000",
/
"""
    cfg = nml.namelist_to_config(text)
    assert cfg.run.forcing_windows[0].timestep == 6 * 3600.0
    # IDELINT in hours generates the output cadence
    dates = cfg.run.output_dates()
    assert dates[1] - dates[0] == dt.timedelta(hours=6)
    assert cfg.run.restart_times == (dt.datetime(2022, 1, 2),)


def test_amp_end_group_terminator():
    # '&END' / '$end' close the group; the group content must survive
    # (the tokenizer used to eat it as a new group named 'end')
    for term in ("&END", "&end", "$END", "$end"):
        g = nml.parse_namelist(f"&NALINE NANG=24, NFRE=25 {term}")
        assert "end" not in g
        assert g["naline"][0] == {"nang": 24, "nfre": 25}


def test_idelwi_default_not_double_scaled():
    # CLMTSU='H' with IDELT=1 h and IDELWI unset: the forcing window
    # timestep must default to the converted 3600 s, not 3600*3600
    # (mpuserin.F90:1020-1023 scales raw user values only)
    cfg = nml.namelist_to_config("""
&NALINE
 CBPLTDT="20220101000000", CEPLTDT="20220102000000",
 CLMTSU = 4*'H', IDELPRO=1, IDELT=1,
/
""")
    assert cfg.run.forcing_windows[0].timestep == 3600.0


def test_naot_dates_reach_run_output_config():
    # explicit &NAOT dates + GFLAG field selection must land in the
    # RunConfig the CLI consumes (cfg.run), not only in the side lists
    cfg = nml.namelist_to_config(REFERENCE_STYLE)
    assert cfg.run.output_dates() == [dt.datetime(2022, 1, 1, 3)]
    assert cfg.run.output_fields is not None
    names = cfg.run.output_fields.names
    assert len(names) >= 2          # GFLAG(1)=T GFLAG(2)=T
    assert cfg.run.nfre_red is None or cfg.run.nfre_red <= 36


def test_nfre_red_reaches_build_kwargs():
    base = ('&NALINE CBPLTDT="20220101000000", '
            'CEPLTDT="20220101060000", NFRE=36, NFRE_RED=29 /')
    cfg = nml.namelist_to_config(base)
    assert cfg.run.frequencies == 36
    assert cfg.run.nfre_red == 29
    assert cfg.run.build_kwargs()["nfre_red"] == 29


def test_yaml_physics_frequencies_split():
    from ecwam_tpu.config.schema import RunConfig
    run = RunConfig.from_dict({
        "grid": "O48", "directions": 36, "frequencies": 29,
        "physics_frequencies": 36,
        "begin": "2022-01-01 00:00:00", "end": "2022-01-01 06:00:00"})
    assert run.frequencies == 36 and run.nfre_red == 29
    kw = run.build_kwargs()
    assert kw["nfre"] == 36 and kw["nfre_red"] == 29


def test_unknown_variable_raises():
    with pytest.raises(ValueError, match="unknown NALINE"):
        nml.namelist_to_config(
            '&NALINE CBPLTDT="20220101000000", CEPLTDT="20220101060000",'
            " NOSUCHVAR=1 /")


def test_unwam_rejected_accepted_warn():
    base = ('&NALINE CBPLTDT="20220101000000", '
            'CEPLTDT="20220101060000", ')
    with pytest.raises(ValueError, match="LLUNSTR"):
        nml.namelist_to_config(base + "LLUNSTR=T /")
    cfg = nml.namelist_to_config(base + "LLUNSTR=F, LWNEMOCOU=T /")
    assert any("LWNEMOCOU" in w for w in cfg.warnings)
    assert cfg.extras["lwnemocou"] is True


def test_build_kwargs_roundtrip():
    cfg = nml.namelist_to_config(REFERENCE_STYLE)
    kw = cfg.run.build_kwargs()
    assert kw["idelpro"] == 450.0 and kw["ifrelfmax"] == 4
    assert kw["irefra"] == 3


def test_cli_load_config_sniffs_namelist(tmp_path):
    from ecwam_tpu.cli.main import load_config
    f = tmp_path / "wam_namelist"
    f.write_text(REFERENCE_STYLE)
    run = load_config(str(f))
    assert run.adv_timestep == 450.0 and run.directions == 24


def test_cfl_diagnostics_fused(tmp_path):
    """CHECKCFL role: healthy config reports zero violations; a huge
    timestep is caught with the reference's remedy message."""
    import jax.numpy as jnp
    from ecwam_tpu.model import setup as setup_mod
    from ecwam_tpu.model import stepper as stepper_mod

    ms = setup_mod.build_model(grid_name="12.0", nang=12, nfre=25,
                               idelpro=900.0, idelt=900.0,
                               weights_mode="fused", dtype=jnp.float64)
    sb = stepper_mod.make_step(ms)
    diag = sb.cfl_diagnostics()
    assert diag["n_violations"] == 0
    assert 0.0 < diag["max_outflow"] <= 1.0

    ms2 = setup_mod.build_model(grid_name="12.0", nang=12, nfre=25,
                                idelpro=90000.0, idelt=90000.0,
                                weights_mode="fused", dtype=jnp.float64)
    sb2 = stepper_mod.make_step(ms2)
    assert sb2.cfl_diagnostics()["n_violations"] > 0
