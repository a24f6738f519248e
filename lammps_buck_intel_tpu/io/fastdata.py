"""ctypes binding for the native data-file parser (native/fastdata.cpp).

Auto-builds the shared library with g++ on first use (build artifacts stay
in native/); io.data_reader transparently uses it for the large sections
and falls back to pure Python when unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastdata.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "fastdata.cpp")
    stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
             and os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
    if not os.path.exists(_LIB_PATH) or stale:
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", _LIB_PATH, src],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.lbi_parse_data.restype = ctypes.c_int
    lib.lbi_parse_data.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_long,
    ]
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.write_lammpstrj_frame.restype = ctypes.c_int
    lib.write_lammpstrj_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_long, ctypes.c_long,
        f64p, f64p, f64p, f64p, i32p,
    ]
    lib.write_data_body.restype = ctypes.c_int
    lib.write_data_body.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_long,
        f64p, f64p, f64p, i32p, i32p, i32p,
    ]
    _lib = lib
    return _lib


_STYLE_ID = {"atomic": 0, "charge": 1, "full": 2}


def parse_sections(path: str, style: str, d) -> bool:
    """Fill the DataFile `d`'s section arrays natively.  Returns False when
    the native library is unavailable (caller uses the Python parser)."""
    lib = _load()
    if lib is None or style not in _STYLE_ID:
        return False
    rc = lib.lbi_parse_data(
        path.encode(), _STYLE_ID[style],
        d.x, d.v, d.q, d.type, d.molecule, d.image.reshape(-1),
        d.mass, d.bonds.reshape(-1), d.angles.reshape(-1),
        d.dihedrals.reshape(-1), d.impropers.reshape(-1),
        d.n_atoms, len(d.bonds), len(d.angles), len(d.mass),
        len(d.dihedrals), len(d.impropers),
    )
    return rc == 0


def write_lammpstrj_frame(path, append, step, lo, hi, x, v, typ) -> bool:
    """Native lammpstrj frame writer; False -> caller falls back."""
    lib = _load()
    if lib is None:
        return False
    rc = lib.write_lammpstrj_frame(
        path.encode(), 1 if append else 0, int(step), len(x),
        np.ascontiguousarray(lo, np.float64),
        np.ascontiguousarray(hi, np.float64),
        np.ascontiguousarray(x, np.float64).reshape(-1),
        np.ascontiguousarray(v, np.float64).reshape(-1),
        np.ascontiguousarray(typ, np.int32),
    )
    return rc == 0


def write_data_body(path, style, x, v, q, typ, mol, image) -> bool:
    """Native Atoms+Velocities body appender; False -> python fallback."""
    lib = _load()
    if lib is None:
        return False
    rc = lib.write_data_body(
        path.encode(), {"atomic": 0, "charge": 1, "full": 2}[style],
        len(x),
        np.ascontiguousarray(x, np.float64).reshape(-1),
        np.ascontiguousarray(v, np.float64).reshape(-1),
        np.ascontiguousarray(q, np.float64),
        np.ascontiguousarray(typ, np.int32),
        np.ascontiguousarray(mol, np.int32),
        np.ascontiguousarray(image, np.int32).reshape(-1),
    )
    return rc == 0
