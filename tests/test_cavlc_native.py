"""Native C CAVLC slice writer vs the Python oracle."""

import numpy as np
import pytest

from h264_tpu import native
from h264_tpu.bitstream.writer import BitWriter
from h264_tpu.decoder import mbtables as M
from h264_tpu.decoder.state import PictureParseState
from h264_tpu.encoder.syntax_cavlc import CavlcSliceWriter
from h264_tpu.syntax.parsets import PPS, SPS
from h264_tpu.syntax.slice_header import SliceHeader, SliceType


def _mk(W=4, H=3, slice_type=SliceType.P, n_ref=2):
    sps = SPS(profile_idc=66, level_idc=30, num_ref_frames=n_ref,
              pic_width_in_mbs_minus1=W - 1,
              pic_height_in_map_units_minus1=H - 1)
    pps = PPS()
    sh = SliceHeader(slice_type_code=slice_type.value, frame_num=0,
                     is_idr=False, nal_ref_idc=3,
                     num_ref_idx_l0_active_minus1=n_ref - 1)
    return sps, pps, sh


def _random_state(rng, W, H, is_p):
    st = PictureParseState(W, H)
    nb = st.n_mbs
    st.slice_id[:] = 0
    if is_p:
        choices = [M.PSKIP, M.P16x16, M.P16x8, M.P8x16, M.P8x8, M.I4MB,
                   M.I16MB]
    else:
        choices = [M.I4MB, M.I16MB]
    st.mb_type[:] = rng.choice(choices, nb)
    st.skip_flag[:] = st.mb_type == M.PSKIP
    st.is_intra[:] = np.isin(st.mb_type, (M.I4MB, M.I16MB))
    st.qp[:] = np.clip(28 + rng.integers(-3, 4, nb).cumsum(), 5, 50)
    st.cbp[:] = rng.integers(0, 48, nb)
    # I16MB: luma cbp must be 0 or 15, chroma 0..2
    i16 = st.mb_type == M.I16MB
    st.cbp[i16] = np.where(rng.random(i16.sum()) < 0.5, 15, 0) + 16 * (
        rng.integers(0, 3, i16.sum())
    )
    st.i16mode[:] = rng.integers(0, 4, nb)
    st.c_ipred_mode[:] = rng.integers(0, 4, nb)
    st.b8mode[:] = rng.integers(M.B8_8x8, M.B8_4x4 + 1, (nb, 4))
    st.ipredmode[:] = rng.integers(0, 9, st.ipredmode.shape)
    st.ref_idx[0] = rng.integers(0, 2, st.ref_idx[0].shape)
    st.mvd[0] = rng.integers(-64, 65, st.mvd[0].shape)
    st.luma_levels[:] = np.where(
        rng.random(st.luma_levels.shape) < 0.2,
        rng.integers(-30, 31, st.luma_levels.shape), 0)
    st.luma_dc[:] = np.where(
        rng.random(st.luma_dc.shape) < 0.3,
        rng.integers(-40, 41, st.luma_dc.shape), 0)
    st.chroma_dc[:] = np.where(
        rng.random(st.chroma_dc.shape) < 0.4,
        rng.integers(-20, 21, st.chroma_dc.shape), 0)
    st.chroma_levels[:] = np.where(
        rng.random(st.chroma_levels.shape) < 0.15,
        rng.integers(-15, 16, st.chroma_levels.shape), 0)
    return st


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("stype", [SliceType.P, SliceType.I])
def test_native_matches_python(seed, stype, monkeypatch):
    if native._load("cavlc_writer") is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(seed)
    W, H = 4, 3
    sps, pps, sh = _mk(W, H, stype, n_ref=2 if seed % 2 else 1)
    st = _random_state(rng, W, H, stype == SliceType.P)
    addrs = list(range(st.n_mbs))

    wr_n = CavlcSliceWriter(st, sps, pps, sh)
    w_n = BitWriter()
    wr_n.write_slice_data(w_n, addrs)
    w_n.rbsp_trailing_bits()

    monkeypatch.setattr(native, "cavlc_write_slice", lambda *a, **k: None)
    wr_p = CavlcSliceWriter(st, sps, pps, sh)
    w_p = BitWriter()
    wr_p.write_slice_data(w_p, addrs)
    w_p.rbsp_trailing_bits()

    assert w_n.get_bytes() == w_p.get_bytes()
    np.testing.assert_array_equal(wr_n.nnz, wr_p.nnz)
    assert wr_n.qp == wr_p.qp
