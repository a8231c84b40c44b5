"""Native (C) runtime components, loaded via ctypes.

Built on demand with the system compiler; every native path has a pure
Python fallback so the framework runs without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libcabac.so")
_lib = None


def _build() -> bool:
    src = os.path.join(_DIR, "cabac_engine.c")
    try:
        subprocess.run(
            ["gcc", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_DIR, "cabac_engine.c")
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.cabac_encode_run.restype = ctypes.c_long
        lib.cabac_encode_run.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_long,
        ]
        _lib = lib
        return lib
    except OSError:
        return None


def cabac_encode_run(kinds: bytes, ctx_idx, bins: bytes, states: bytearray,
                     mps: bytearray):
    """Run the serial CABAC automaton over a recorded bin stream.

    Returns the payload bytes (byte-aligned; includes the flush emitted by
    the final terminate(1)).  Returns None if the native lib is missing."""
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np

    n = len(bins)
    idx_arr = np.ascontiguousarray(ctx_idx, dtype=np.int32)
    out = ctypes.create_string_buffer(2 * n // 8 + 4096)
    st_buf = ctypes.create_string_buffer(bytes(states), len(states))
    mps_buf = ctypes.create_string_buffer(bytes(mps), len(mps))
    nbits = lib.cabac_encode_run(
        kinds,
        idx_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bins,
        n,
        ctypes.cast(st_buf, ctypes.c_char_p),
        ctypes.cast(mps_buf, ctypes.c_char_p),
        ctypes.cast(out, ctypes.c_char_p),
        len(out.raw) * 8,
    )
    assert nbits % 8 == 0, "CABAC payload must end byte-aligned"
    states[:] = st_buf.raw[: len(states)]
    mps[:] = mps_buf.raw[: len(mps)]
    return out.raw[: nbits // 8]
