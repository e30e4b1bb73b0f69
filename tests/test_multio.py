"""WAM_MULTIO/FDB sink (wam_multio_mod.F90:66-99 role)."""

import numpy as np

from ecwam_tpu.io import multio


def test_sink_write_flush_retrieve(tmp_path):
    sink = multio.MultioSink(str(tmp_path / "fdb"))
    sink.write(b"MSG-A", param="swh", date="20220101000000")
    sink.write(b"MSG-B", param="mwp", date="20220101000000")
    sink.flush()
    sink.write(b"MSG-C", param="swh", date="20220101060000")
    sink.close()

    db = multio.FdbLite(str(tmp_path / "fdb"))
    assert len(db.list_keys()) == 3
    got = db.retrieve(param="swh")
    assert got == [b"MSG-A", b"MSG-C"]
    got = db.retrieve(param="swh", date="20220101060000")
    assert got == [b"MSG-C"]
    assert db.retrieve(param="nosuch") == []


def test_grib_fields_through_sink(tmp_path):
    from ecwam_tpu.core import grid as grid_mod
    from ecwam_tpu.core.grid import build_sea_point_block
    from ecwam_tpu.io import grib

    g = grid_mod.regular_grid(xdella=12.0)
    blk = build_sea_point_block(
        g, np.full((g.ngy, g.ngx), 4000.0))
    vals = np.linspace(0.5, 4.5, blk.nsea)
    sink = multio.MultioSink(str(tmp_path / "fdb"))
    multio.write_fields_to_sink(sink, {"swh": vals}, blk, g,
                                "20220101000000")
    db = multio.FdbLite(str(tmp_path / "fdb"))
    msgs = db.retrieve(param="swh")
    assert len(msgs) == 1
    import tempfile, os
    p = os.path.join(str(tmp_path), "one.grib")
    with open(p, "wb") as f:
        f.write(msgs[0])
    dec = grib.read_messages(p)[0]
    assert np.isfinite(np.asarray(dec.values)).any()


def test_run_model_fdb_output(tmp_path):
    """format: fdb routes output through the multio sink."""
    from ecwam_tpu.cli.main import run_model
    from ecwam_tpu.config.schema import RunConfig

    cfg = RunConfig.from_dict(dict(
        grid="12.0", directions=12, frequencies=25, bathymetry="aqua",
        begin="20220101000000", end="20220101003000",
        advection={"timestep": 1800}, physics={"timestep": 1800},
        output={"fields": {"name": ["swh", "mwp"], "format": "fdb",
                           "at": [{"timestep": 1800}]}}))
    run_model(cfg, str(tmp_path), quiet=True)
    db = multio.FdbLite(str(tmp_path / "fdb"))
    keys = db.list_keys()
    assert any(k["param"] == "swh" for k in keys)
    assert len(db.retrieve(param="swh")) >= 1
