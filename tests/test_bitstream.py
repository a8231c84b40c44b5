"""Bitstream/NAL/parameter-set layer tests.

Golden values cross-checked against the reference decoder's TRACE output
on bin/test.264 (JM trace_dec.txt; see SURVEY.md §4.3).
"""

import pytest

from h264_tpu.bitstream import (
    BitReader,
    BitWriter,
    ebsp_to_rbsp,
    iter_annexb_nalus,
    rbsp_to_ebsp,
)
from h264_tpu.syntax import parse_pps, parse_sps
from h264_tpu.syntax.parsets import write_pps, write_sps
from h264_tpu.syntax.slice_header import SliceType, parse_slice_header


def test_bitreader_basic():
    r = BitReader(bytes([0b10110100, 0b01100000]))
    assert r.u(1) == 1
    assert r.u(3) == 0b011
    assert r.u(4) == 0b0100
    assert r.u(3) == 0b011
    assert r.byte_aligned() is False


def test_exp_golomb_roundtrip():
    w = BitWriter()
    values = list(range(0, 40)) + [100, 255, 1000, 65535]
    for v in values:
        w.ue(v)
    svalues = list(range(-20, 21)) + [-1000, 1000]
    for v in svalues:
        w.se(v)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for v in values:
        assert r.ue() == v
    for v in svalues:
        assert r.se() == v


def test_ebsp_escape_roundtrip():
    payloads = [
        b"\x00\x00\x00\x00\x01\x02\x03",
        b"\x00\x00\x03\x00\x00\x02",
        b"\xff\x00\x00\x00",
        bytes(range(256)) + b"\x00\x00\x01",
    ]
    for p in payloads:
        e = rbsp_to_ebsp(p)
        assert b"\x00\x00\x00" not in e and b"\x00\x00\x01" not in e and b"\x00\x00\x02" not in e
        assert ebsp_to_rbsp(e) == p


def test_golden_stream_nal_layout(golden_stream):
    nalus = list(iter_annexb_nalus(golden_stream))
    # SPS, PPS, IDR slice, then P and B slices (3 coded pictures)
    types = [n.nal_unit_type for n in nalus]
    assert types[0] == 7 and types[1] == 8 and types[2] == 5
    assert len([t for t in types if t in (1, 5)]) == 3


def test_golden_sps(golden_stream):
    """Field values as printed by the reference TRACE decode of test.264."""
    nalus = list(iter_annexb_nalus(golden_stream))
    sps = parse_sps(nalus[0].rbsp)
    assert sps.profile_idc == 100  # High
    assert sps.level_idc == 40
    assert sps.chroma_format_idc == 1
    assert sps.pic_order_cnt_type == 0
    assert sps.log2_max_pic_order_cnt_lsb_minus4 == 0
    assert sps.num_ref_frames == 5
    assert sps.pic_width_in_mbs == 11 and sps.frame_height_in_mbs == 9
    assert sps.width == 176 and sps.height == 144
    assert sps.frame_mbs_only_flag and sps.direct_8x8_inference_flag
    assert not sps.seq_scaling_matrix_present_flag


def test_golden_pps(golden_stream):
    nalus = list(iter_annexb_nalus(golden_stream))
    pps = parse_pps(nalus[1].rbsp)
    assert pps.entropy_coding_mode_flag  # CABAC
    assert pps.num_ref_idx_l0_default_active_minus1 == 4
    assert pps.num_ref_idx_l1_default_active_minus1 == 4
    assert not pps.weighted_pred_flag
    assert pps.transform_8x8_mode_flag  # High profile FRExt
    assert pps.second_chroma_qp_index_offset is not None


def test_golden_slice_headers(golden_stream):
    nalus = list(iter_annexb_nalus(golden_stream))
    sps = parse_sps(nalus[0].rbsp)
    pps = parse_pps(nalus[1].rbsp)
    sps_map, pps_map = {0: sps}, {0: pps}
    slices = [n for n in nalus if n.is_slice]
    sh0, _, _ = parse_slice_header(slices[0].rbsp, sps_map, pps_map, slices[0].nal_ref_idc, slices[0].is_idr)
    assert sh0.slice_type == SliceType.I
    assert sh0.slice_qp(pps) == 28
    sh1, _, _ = parse_slice_header(slices[1].rbsp, sps_map, pps_map, slices[1].nal_ref_idc, slices[1].is_idr)
    assert sh1.slice_type == SliceType.P
    assert sh1.frame_num == 1
    sh2, _, _ = parse_slice_header(slices[2].rbsp, sps_map, pps_map, slices[2].nal_ref_idc, slices[2].is_idr)
    assert sh2.slice_type == SliceType.B
    assert sh2.slice_qp(pps) == 30


def test_sps_pps_write_roundtrip(golden_stream):
    nalus = list(iter_annexb_nalus(golden_stream))
    sps = parse_sps(nalus[0].rbsp)
    pps = parse_pps(nalus[1].rbsp)
    sps2 = parse_sps(write_sps(sps))
    assert sps2 == sps
    pps2 = parse_pps(write_pps(pps))
    assert pps2 == pps
