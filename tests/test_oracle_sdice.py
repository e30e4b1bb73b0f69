"""Golden tests: sea-ice attenuation SDICE1/2/3 vs oracles (f64)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ecwam_tpu.core.spectral import build_spectral_tables
from ecwam_tpu.core import dispersion
from ecwam_tpu.ops.physics import sdice as sdice_mod

from oracle import reftables as ort
from oracle import sdiceo as osd

NANG, NFRE, NPTS = 12, 25, 10
RTOL = 1e-12


@pytest.fixture(scope="module")
def data():
    tb = build_spectral_tables(nang=NANG, nfre=NFRE)
    otb = ort.build(NANG, NFRE)
    rng = np.random.default_rng(21)
    fl1 = np.exp(rng.normal(-4.0, 2.0, (NANG, NFRE, NPTS)))
    depth = rng.uniform(30.0, 3000.0, NPTS)
    props = dispersion.depth_properties(depth, tb.fr)
    cicv = rng.uniform(0.0, 1.0, NPTS)
    cith = np.where(rng.uniform(size=NPTS) > 0.3,
                    rng.uniform(0.05, 3.0, NPTS), 0.0)
    fld = rng.normal(size=fl1.shape)
    sl = rng.normal(size=fl1.shape)
    return dict(tb=tb, otb=otb, fl1=fl1, props=props, cicv=cicv,
                cith=cith, fld=fld, sl=sl, rng=rng)


def check3(got, want, names):
    for g, w, n in zip(got, want, names):
        g = np.asarray(g).transpose(2, 0, 1)
        scale = max(np.abs(w).max(), 1e-300)
        np.testing.assert_allclose(g, w, rtol=RTOL, atol=RTOL * scale,
                                   err_msg=n)


def _jax_args(d):
    return (jnp.asarray(d["fl1"]), jnp.asarray(d["fld"]),
            jnp.asarray(d["sl"]), jnp.asarray(d["props"]["wavnum"].T),
            jnp.asarray(d["props"]["cgroup"].T))


def _orc_args(d):
    return (d["fl1"].transpose(2, 0, 1), d["fld"].transpose(2, 0, 1),
            d["sl"].transpose(2, 0, 1), d["props"]["wavnum"],
            d["props"]["cgroup"])


def test_sdice1_oracle(data):
    cid = sdice_mod.load_cideac()
    got = sdice_mod.sdice1(*_jax_args(data), jnp.asarray(data["cicv"]),
                           jnp.asarray(data["cith"]), data["tb"], 900.0)
    want = osd.sdice1(*_orc_args(data), data["cicv"], data["cith"],
                      data["otb"], 900.0, cid)
    check3(got, want, ("fld", "sl", "slice"))


def test_sdice2_oracle(data):
    got = sdice_mod.sdice2(*_jax_args(data), jnp.asarray(data["cicv"]),
                           data["tb"], 900.0)
    want = osd.sdice2(*_orc_args(data), data["cicv"], data["otb"], 900.0)
    check3(got, want, ("fld", "sl", "slice"))


def test_sdice3_oracle(data):
    alpfac = data["rng"].uniform(0.1, 1.0, NPTS)
    got = sdice_mod.sdice3(*_jax_args(data), jnp.asarray(data["cicv"]),
                           jnp.asarray(data["cith"]), data["tb"], 900.0,
                           alpfac=jnp.asarray(alpfac))
    want = osd.sdice3(*_orc_args(data), data["cicv"], data["cith"],
                      alpfac, data["otb"], 900.0)
    check3(got, want, ("fld", "sl", "slice"))
