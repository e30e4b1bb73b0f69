"""GRIB-1 file I/O over the native C++ codec (ecwam_tpu/native/grib1.cc).

Plays the role eccodes plays for the reference (readwind.F90 forcing
ingest, wgribencode.F90 product output).  Message metadata mirrors the
GRIB1 PDS/GDS fields the wave model uses.
"""

from __future__ import annotations

import ctypes
import dataclasses

import numpy as np

from ecwam_tpu import native

MISSING = -9.0e9

_META_KEYS = (
    "total_len", "table2_version", "centre", "generating_process",
    "grid_id", "param", "level_type", "level", "data_date", "data_time",
    "unit_of_time", "p1", "p2", "time_range", "grid_type", "ni", "nj",
    "lat1", "lon1", "lat2", "lon2", "di", "dj", "scan_mode", "n_values",
    "has_bitmap", "n_pl", "decimal_scale", "binary_scale",
    "bits_per_value", "sub_centre", "reserved")


def _lib():
    lib = native.load("grib1")
    lib.g1_next.restype = ctypes.c_int
    lib.g1_next.argtypes = [ctypes.c_char_p, ctypes.c_long,
                            ctypes.POINTER(ctypes.c_long),
                            ctypes.POINTER(ctypes.c_long)]
    lib.g1_info.restype = ctypes.c_int
    lib.g1_values.restype = ctypes.c_int
    lib.g1_encode.restype = ctypes.c_long
    return lib


@dataclasses.dataclass
class GribMessage:
    meta: dict
    values: np.ndarray           # flat, MISSING where bitmapped out
    pl: np.ndarray | None = None  # reduced-grid row lengths

    @property
    def lats(self) -> np.ndarray:
        m = self.meta
        nj = m["nj"]
        if nj <= 1:
            return np.array([m["lat1"] / 1000.0])
        return np.linspace(m["lat1"] / 1000.0, m["lat2"] / 1000.0, nj)

    @property
    def lons(self) -> np.ndarray:
        m = self.meta
        ni = m["ni"]
        if ni is None or ni < 0:
            raise ValueError("reduced grid has no single lon axis")
        return np.linspace(m["lon1"] / 1000.0, m["lon2"] / 1000.0, ni)

    def grid_values(self) -> np.ndarray:
        """(nj, ni) array for regular grids."""
        m = self.meta
        return self.values.reshape(m["nj"], m["ni"])

    @property
    def date14(self) -> str:
        return f"{self.meta['data_date']:08d}{self.meta['data_time']:04d}00"


def read_messages(path: str) -> list:
    lib = _lib()
    with open(path, "rb") as f:
        buf = f.read()
    out = []
    off = ctypes.c_long(0)
    mlen = ctypes.c_long(0)
    n = len(buf)
    while lib.g1_next(buf, n, ctypes.byref(off), ctypes.byref(mlen)) == 0:
        msg = buf[off.value: off.value + mlen.value]
        meta = (ctypes.c_int64 * 32)()
        pl = (ctypes.c_int64 * 8192)()
        rc = lib.g1_info(msg, mlen.value, meta, pl, 8192)
        if rc != 0:
            raise ValueError(f"grib decode failed rc={rc} at {off.value}")
        md = {k: int(meta[i]) for i, k in enumerate(_META_KEYS)}
        nv = md["n_values"]
        vals = np.empty(nv, np.float64)
        rc = lib.g1_values(msg, mlen.value,
                           vals.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_double)),
                           nv, ctypes.c_double(MISSING))
        if rc != 0:
            raise ValueError(f"grib unpack failed rc={rc}")
        npl = md["n_pl"]
        plarr = np.array([int(pl[i]) for i in range(npl)],
                         np.int64) if npl else None
        out.append(GribMessage(meta=md, values=vals, pl=plarr))
        off.value += mlen.value
    return out


def encode_message(values: np.ndarray, meta: dict, *,
                   pl: np.ndarray | None = None,
                   missing: float = MISSING,
                   use_bitmap: bool | None = None) -> bytes:
    lib = _lib()
    values = np.ascontiguousarray(values, np.float64).ravel()
    m = (ctypes.c_int64 * 32)()
    defaults = dict(
        table2_version=140, centre=98, generating_process=110, grid_id=255,
        level_type=102, level=0, unit_of_time=1, p1=0, p2=0, time_range=0,
        grid_type=0, scan_mode=0, decimal_scale=0, bits_per_value=16,
        sub_centre=0, di=-1, dj=0, ni=-1, nj=0,
        lat1=0, lon1=0, lat2=0, lon2=0,
        data_date=20000101, data_time=0)
    md = {**defaults, **meta}
    md["n_pl"] = len(pl) if pl is not None else 0
    for i, k in enumerate(_META_KEYS):
        m[i] = int(md.get(k, 0))
    plc = ((ctypes.c_int64 * len(pl))(*[int(x) for x in pl])
           if pl is not None else (ctypes.c_int64 * 1)(0))
    if use_bitmap is None:
        use_bitmap = bool(np.any(values == missing))
    cap = values.size * 4 + 16384
    out = ctypes.create_string_buffer(cap)
    n = lib.g1_encode(values.ctypes.data_as(
        ctypes.POINTER(ctypes.c_double)),
        values.size, m, plc, out, cap,
        ctypes.c_double(missing), ctypes.c_int(1 if use_bitmap else 0))
    if n < 0:
        raise ValueError(f"grib encode failed rc={n}")
    return out.raw[:n]


def write_messages(path: str, messages: list):
    """messages: list of (values, meta[, pl]) tuples or dicts."""
    with open(path, "wb") as f:
        for msg in messages:
            if isinstance(msg, GribMessage):
                f.write(encode_message(msg.values, msg.meta, pl=msg.pl))
            else:
                values, meta = msg[0], msg[1]
                pl = msg[2] if len(msg) > 2 else None
                f.write(encode_message(values, meta, pl=pl))
