"""Native (C) runtime components, loaded via ctypes.

Built on demand with the system compiler; every native path has a pure
Python fallback so the framework runs without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(__file__)
_libs: dict = {}


def _load(stem: str):
    """Build (if stale) and load lib<stem>.so from <stem>.c; None on failure."""
    if stem in _libs:
        return _libs[stem]
    src = os.path.join(_DIR, stem + ".c")
    so = os.path.join(_DIR, f"lib{stem}.so")
    lib = None
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["gcc", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
    except Exception:
        lib = None
    _libs[stem] = lib
    return lib


def get_lib():
    """The loaded CABAC native library, or None if unavailable."""
    lib = _load("cabac_engine")
    if lib is not None and not getattr(lib, "_sigs_set", False):
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
        lib._sigs_set = True
    return lib


_I32P = ctypes.POINTER(ctypes.c_int32)


_cavlc_tables = None


def _get_cavlc_tables():
    """Flattened int32 copies of the CAVLC code tables (cached)."""
    global _cavlc_tables
    if _cavlc_tables is None:
        import numpy as np

        from ..entropy.cavlc import tables as T

        def arr(x):
            return np.ascontiguousarray(x, np.int32)

        tzc_len = np.zeros((15, 16), np.int32)
        tzc_code = np.zeros((15, 16), np.int32)
        for i, row in enumerate(T.TOTAL_ZEROS_CDC_LEN[0]):
            tzc_len[i, : len(row)] = row
        for i, row in enumerate(T.TOTAL_ZEROS_CDC_CODE[0]):
            tzc_code[i, : len(row)] = row
        cbp_intra = arr([T.NCBP[1][cbp][0] for cbp in range(48)])
        cbp_inter = arr([T.NCBP[1][cbp][1] for cbp in range(48)])
        _cavlc_tables = (
            arr(T.COEFF_TOKEN_LEN), arr(T.COEFF_TOKEN_CODE),
            arr(T.COEFF_TOKEN_CDC_LEN[0]), arr(T.COEFF_TOKEN_CDC_CODE[0]),
            arr(T.TOTAL_ZEROS_LEN), arr(T.TOTAL_ZEROS_CODE),
            tzc_len, tzc_code,
            arr(T.RUN_BEFORE_LEN), arr(T.RUN_BEFORE_CODE),
            cbp_intra, cbp_inter,
        )
    return _cavlc_tables


def cavlc_write_slice(st, is_p: bool, n_ref: int, init_qp: int,
                      constrained_intra: bool, chroma420: bool,
                      mb_addrs, nnz):
    """Native CAVLC slice-data writer.

    Returns (payload_bytes, nbits) or None if unavailable/unsupported.
    `nnz` (int32 [3,4H,4W]) is updated in place (JM nz_coeff semantics)."""
    lib = _load("cavlc_writer")
    if lib is None:
        return None
    import numpy as np

    if not getattr(lib, "_cavlc_sigs", False):
        lib.cavlc_write_slice.restype = ctypes.c_long
        lib._cavlc_sigs = True

    def a(x, dtype=np.int32):
        return np.ascontiguousarray(x, dtype)

    def p(x):
        return x.ctypes.data_as(_I32P)

    tabs = _get_cavlc_tables()
    mb_addrs = a(mb_addrs)
    n_mbs = st.n_mbs
    cap_bytes = 1024 * n_mbs + 4096
    out = ctypes.create_string_buffer(cap_bytes)
    # keep temporaries alive through the call
    arrs = [
        a(st.mb_type), a(st.skip_flag), a(st.cbp), a(st.qp),
        a(st.c_ipred_mode), a(st.b8mode), a(st.i16mode), a(st.is_intra),
        a(st.slice_id), a(st.ipredmode), a(st.ref_idx[0]), a(st.mvd[0]),
        a(st.luma_levels), a(st.luma_dc), a(st.chroma_dc),
        a(st.chroma_levels),
    ]
    assert nnz.dtype == np.int32 and nnz.flags.c_contiguous
    nbits = lib.cavlc_write_slice(
        st.W, st.H,
        *(p(x) for x in arrs),
        int(is_p), int(n_ref), int(init_qp), int(constrained_intra),
        int(chroma420), p(mb_addrs), len(mb_addrs),
        *(p(x) for x in tabs),
        p(nnz), ctypes.cast(out, ctypes.c_char_p), ctypes.c_long(8 * cap_bytes),
    )
    if nbits < 0:
        return None
    return out.raw[: (nbits + 7) // 8], nbits


def deblock_run(Y, U, V, BSV, BSH, qp, qpc, lf_disable, lf_alpha, lf_beta,
                transform8x8, slice_id, cfi: int, max_y: int, max_c: int,
                n_mbW: int, n_mbH: int) -> bool:
    """Native full-picture deblock (frame, non-MBAFF, 4:2:0/mono).

    Filters Y/U/V in place; all arrays must be contiguous int32.  Returns
    False if the native library is unavailable (caller uses the oracle)."""
    lib = _load("deblock")
    if lib is None:
        return False
    if not getattr(lib, "_sigs_set", False):
        lib.deblock_run.restype = None
        lib.deblock_run.argtypes = [_I32P] * 3 + [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ] + [_I32P] * 9 + [ctypes.c_int, ctypes.c_int32, ctypes.c_int32]
        lib._sigs_set = True
    import numpy as np

    def p(a):
        assert a.dtype == np.int32 and a.flags.c_contiguous
        return a.ctypes.data_as(_I32P)

    H_pix, W_pix = Y.shape
    null = ctypes.cast(None, _I32P)
    lib.deblock_run(
        p(Y), p(U) if U is not None else null, p(V) if V is not None else null,
        W_pix, H_pix, n_mbW, n_mbH,
        p(BSV), p(BSH), p(qp), p(qpc), p(lf_disable), p(lf_alpha),
        p(lf_beta), p(transform8x8), p(slice_id), cfi, max_y, max_c,
    )
    return True


_cabac_tabs = None


def _get_cabac_tabs():
    """Flattened int32 residual-coding tables for the native writer."""
    global _cabac_tabs
    if _cabac_tabs is None:
        import numpy as np

        from ..decoder import mbtables as M
        from ..entropy.cabac import tables as T

        p2c_map = np.zeros((22, 64), np.int32)
        p2c_last = np.zeros((22, 64), np.int32)
        for t in range(22):
            p2c_map[t, : len(T.POS2CTX_MAP[t])] = T.POS2CTX_MAP[t]
            p2c_last[t, : len(T.POS2CTX_LAST[t])] = T.POS2CTX_LAST[t]
        t2c = np.stack(
            [T.TYPE2CTX_BCBP, T.TYPE2CTX_MAP, T.TYPE2CTX_LAST, T.TYPE2CTX_ONE,
             T.TYPE2CTX_ABS, T.MAXPOS, T.C1ISDC, T.MAX_C2]
        ).astype(np.int32)
        zz4 = np.ascontiguousarray(
            M.ZZ_SCAN_4x4[:, 1] * 4 + M.ZZ_SCAN_4x4[:, 0], np.int32
        )
        zz8 = np.ascontiguousarray(
            M.ZZ_SCAN_8x8[:, 1] * 8 + M.ZZ_SCAN_8x8[:, 0], np.int32
        )
        _cabac_tabs = (
            np.ascontiguousarray(p2c_map), np.ascontiguousarray(p2c_last),
            np.ascontiguousarray(t2c), zz4, zz8,
        )
    return _cabac_tabs


def cabac_write_slice(st, slice_type: int, init_qp: int, n_ref0: int,
                      n_ref1: int, t8_mode: bool, constrained_intra: bool,
                      chroma_format_idc: int, mb_addrs,
                      states: bytearray, mps: bytearray):
    """Native CABAC slice-data writer (binarize + arithmetic in one pass).

    slice_type: 0=P, 1=B, 2=I.  Returns payload bytes, or None when the
    native lib is unavailable or the state needs the Python oracle."""
    lib = _load("cabac_writer")
    if lib is None or chroma_format_idc not in (0, 1):
        return None
    import numpy as np

    if not getattr(lib, "_writer_sigs", False):
        lib.cabac_write_slice.restype = ctypes.c_long
        lib._writer_sigs = True

    def a(x, dtype=np.int32):
        return np.ascontiguousarray(x, dtype)

    def p(x):
        return x.ctypes.data_as(ctypes.c_void_p)

    tabs = _get_cabac_tabs()
    mb_addrs = a(mb_addrs)
    arrs = [
        a(st.mb_type), a(st.skip_flag, np.uint8), a(st.cbp), a(st.qp),
        a(st.c_ipred_mode), a(st.b8mode), a(st.b8pdir), a(st.i16mode),
        a(st.is_intra, np.uint8), a(st.transform8x8, np.uint8),
        a(st.slice_id), a(st.ipredmode, np.int8), a(st.ref_idx, np.int8),
        a(st.mvd), a(st.luma_levels), a(st.luma8_levels), a(st.luma_dc),
        a(st.chroma_dc), a(st.chroma_levels),
    ]
    cbp_bits = np.zeros(st.n_mbs, np.int64)
    cap_bits = 8 * (1024 * len(mb_addrs) + 65536)
    out = ctypes.create_string_buffer(cap_bits // 8)
    st_buf = ctypes.create_string_buffer(bytes(states), len(states))
    mps_buf = ctypes.create_string_buffer(bytes(mps), len(mps))
    nbits = lib.cabac_write_slice(
        st.W, st.H,
        *(p(x) for x in arrs),
        int(slice_type), int(init_qp), int(n_ref0), int(n_ref1),
        int(t8_mode), int(constrained_intra), int(chroma_format_idc),
        p(mb_addrs), len(mb_addrs),
        *(p(x) for x in tabs),
        ctypes.cast(st_buf, ctypes.c_char_p),
        ctypes.cast(mps_buf, ctypes.c_char_p),
        p(cbp_bits),
        ctypes.cast(out, ctypes.c_char_p), ctypes.c_long(cap_bits),
    )
    if nbits < 0:
        return None
    assert nbits % 8 == 0, "CABAC payload must end byte-aligned"
    return out.raw[: nbits // 8]


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
