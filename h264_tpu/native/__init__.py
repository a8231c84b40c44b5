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


def cabac_parse_slice(st, rbsp: bytes, sh, sps, pps, slice_id: int,
                      fmo_next=None):
    """Native CABAC slice-data parser (arithmetic + de-binarization in
    one pass); the decode dual of cabac_write_slice.

    Fills the PictureParseState arrays in place for every MB of the
    slice.  Returns the list of parsed MB addresses, or None when the
    native lib is unavailable or the stream needs the Python oracle
    (fields/MBAFF, high bit depth, 4:2:2+)."""
    lib = _load("cabac_reader")
    if lib is None:
        return None
    import numpy as np

    from ..entropy.cabac.engine import ContextSet
    from ..syntax.slice_header import SliceType

    if sps.chroma_format_idc not in (0, 1) or sps.bit_depth_luma != 8:
        return None
    if sh.field_pic_flag or sps.mb_adaptive_frame_field_flag:
        return None
    if not getattr(lib, "_reader_sigs", False):
        lib.cabac_parse_slice.restype = ctypes.c_long
        lib._reader_sigs = True

    stype = sh.slice_type
    type_code = {SliceType.P: 0, SliceType.B: 1, SliceType.I: 2}.get(stype)
    if type_code is None:
        return None
    qp = sh.slice_qp(pps)
    ctx = ContextSet(stype in (SliceType.I, SliceType.SI),
                     sh.cabac_init_idc, qp)

    def p(x):
        return x.ctypes.data_as(ctypes.c_void_p)

    def a(x, dtype):
        arr = np.ascontiguousarray(x, dtype)
        assert arr.flags.c_contiguous
        return arr

    tabs = _get_cabac_tabs()
    nb = st.n_mbs
    # writable views/copies of the state arrays; non-contiguous or
    # list-typed fields go through staging buffers
    cbp_bits = np.asarray(st.cbp_bits, np.int64)
    cbp_blk = np.asarray(st.cbp_blk, np.int64)
    next_addr = None
    next_p = ctypes.cast(None, ctypes.c_void_p)
    if fmo_next is not None:
        next_addr = a(fmo_next, np.int32)
        next_p = p(next_addr)
    ipcm_cap = nb
    ipcm_data = np.zeros((ipcm_cap, 384), np.uint8)
    ipcm_addrs = np.zeros(ipcm_cap, np.int32)
    n_ipcm = ctypes.c_int32(0)
    arrs = {
        "mb_type": a(st.mb_type, np.int32),
        "raw_mb_type": a(st.raw_mb_type, np.int32),
        "skip_flag": a(st.skip_flag, np.uint8),
        "cbp": a(st.cbp, np.int32),
        "qp": a(st.qp, np.int32),
        "c_ipred_mode": a(st.c_ipred_mode, np.int32),
        "b8mode": a(st.b8mode, np.int32),
        "b8pdir": a(st.b8pdir, np.int32),
        "i16mode": a(st.i16mode, np.int32),
        "is_intra": a(st.is_intra, np.uint8),
        "transform8x8": a(st.transform8x8, np.uint8),
        "slice_id": a(st.slice_id, np.int32),
        "ipredmode": a(st.ipredmode, np.int8),
        "ref_idx": a(st.ref_idx, np.int8),
        "mvd": a(st.mvd, np.int32),
        "luma_levels": a(st.luma_levels, np.int32),
        "luma8_levels": a(st.luma8_levels, np.int32),
        "luma_dc": a(st.luma_dc, np.int32),
        "chroma_dc": a(st.chroma_dc, np.int32),
        "chroma_levels": a(st.chroma_levels, np.int32),
        "nnz": a(st.nnz, np.uint8),
    }
    start_bit = (sh.header_bit_len + 7) & ~7
    buf = ctypes.create_string_buffer(rbsp, len(rbsp))
    states = ctypes.create_string_buffer(bytes(ctx.states), len(ctx.states))
    mps = ctypes.create_string_buffer(bytes(ctx.mps), len(ctx.mps))
    n = lib.cabac_parse_slice(
        st.W, st.H,
        p(arrs["mb_type"]), p(arrs["raw_mb_type"]), p(arrs["skip_flag"]),
        p(arrs["cbp"]), p(cbp_bits), p(cbp_blk),
        p(arrs["qp"]), p(arrs["c_ipred_mode"]), p(arrs["b8mode"]),
        p(arrs["b8pdir"]), p(arrs["i16mode"]), p(arrs["is_intra"]),
        p(arrs["transform8x8"]), p(arrs["slice_id"]), p(arrs["ipredmode"]),
        p(arrs["ref_idx"]), p(arrs["mvd"]), p(arrs["luma_levels"]),
        p(arrs["luma8_levels"]), p(arrs["luma_dc"]), p(arrs["chroma_dc"]),
        p(arrs["chroma_levels"]), p(arrs["nnz"]),
        int(type_code), int(qp),
        int(sh.num_ref_idx_l0_active_minus1 + 1),
        int(sh.num_ref_idx_l1_active_minus1 + 1),
        int(bool(pps.transform_8x8_mode_flag)),
        int(bool(pps.constrained_intra_pred_flag)),
        int(sps.chroma_format_idc),
        int(bool(sps.direct_8x8_inference_flag)),
        int(sh.first_mb_in_slice), int(slice_id), next_p,
        ctypes.cast(buf, ctypes.c_char_p), ctypes.c_long(8 * len(rbsp)),
        ctypes.c_long(start_bit),
        p(tabs[0]), p(tabs[1]), p(tabs[2]), p(tabs[3]), p(tabs[4]),
        ctypes.cast(states, ctypes.c_char_p),
        ctypes.cast(mps, ctypes.c_char_p),
        p(ipcm_data), p(ipcm_addrs), ipcm_cap, ctypes.byref(n_ipcm),
    )
    if n < 0:
        raise ValueError("native CABAC parse failed (corrupt slice data)")
    # write back staged outputs (a() returns the state array itself when
    # dtype/layout already match, so this usually copies nothing)
    for name, arr in arrs.items():
        dst = getattr(st, name)
        if dst is not arr:
            np.copyto(dst, arr.reshape(dst.shape).astype(dst.dtype))
    st.cbp_bits = [int(v) for v in cbp_bits]
    st.cbp_blk = [int(v) for v in cbp_blk]
    import numpy as _np

    for k in range(int(n_ipcm.value)):
        addr = int(ipcm_addrs[k])
        blob = ipcm_data[k]
        luma = blob[:256].reshape(16, 16).astype(_np.int32)
        if sps.chroma_format_idc == 1:
            cb = blob[256:320].reshape(8, 8).astype(_np.int32)
            cr = blob[320:384].reshape(8, 8).astype(_np.int32)
            st.ipcm_samples[addr] = (luma, cb, cr)
        else:
            st.ipcm_samples[addr] = (luma,)
    # per-MB slice-level fields (the Python parser fills these per MB)
    mask = np.asarray(st.slice_id) == slice_id
    st.lf_disable[mask] = sh.disable_deblocking_filter_idc
    st.lf_alpha[mask] = 2 * sh.slice_alpha_c0_offset_div2
    st.lf_beta[mask] = 2 * sh.slice_beta_offset_div2
    from ..ops.exact import chroma_qp as _cqp

    cb_off, cr_off = pps.chroma_qp_offset
    qps = np.asarray(st.qp)[mask]
    st.qpc[mask, 0] = [_cqp(int(q), cb_off) for q in qps]
    st.qpc[mask, 1] = [_cqp(int(q), cr_off) for q in qps]
    return int(n)


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
