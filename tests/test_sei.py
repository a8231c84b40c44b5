"""SEI subsystem: typed parse/write round trips, lencod interop, tone
mapping LUT behavior, VUI/HRD SPS round trip.

Reference: ldecod/src/sei.c InterpretSEIMessage:75 (+ per-payload
interpreters, tone mapping :1871), lencod/src/sei.c writers.
"""

import numpy as np
import pytest

from h264_tpu.bitstream.nal import NalUnit, iter_annexb_nalus, write_annexb
from h264_tpu.syntax.parsets import HRD, VUI, parse_sps, write_sps
from h264_tpu.syntax.sei import (
    BufferingPeriod,
    PicTiming,
    RawSEI,
    RecoveryPoint,
    ToneMapping,
    UserDataUnregistered,
    parse_sei,
    write_sei,
)

from jmref import have_ldecod, jm_decode

TONEMAP_264 = "tests/streams/tonemap.264"


def _sps_with_hrd():
    data = open("/root/reference/bin/test.264", "rb").read()
    for nal in iter_annexb_nalus(data):
        if nal.nal_unit_type == 7:
            sps = parse_sps(nal.rbsp)
            break
    v = VUI(timing_info_present_flag=True, num_units_in_tick=1000,
            time_scale=60000, fixed_frame_rate_flag=True,
            pic_struct_present_flag=True)
    h = HRD(cpb_cnt_minus1=0, bit_rate_value_minus1=[624],
            cpb_size_value_minus1=[1249], cbr_flag=[0])
    v.nal_hrd = h
    sps.vui_parameters_present_flag = True
    sps.vui = v
    return sps


def test_vui_hrd_sps_roundtrip():
    sps = _sps_with_hrd()
    back = parse_sps(write_sps(sps))
    assert back.vui.num_units_in_tick == 1000
    assert back.vui.time_scale == 60000
    assert back.vui.nal_hrd.bit_rate_value_minus1 == [624]
    assert back.vui.pic_struct_present_flag


def test_sei_roundtrip_all_typed():
    sps = _sps_with_hrd()
    sps_map = {0: sps}
    msgs = [
        BufferingPeriod(seq_parameter_set_id=0, nal_cpb=[(90000, 30000)]),
        PicTiming(cpb_removal_delay=4, dpb_output_delay=2, pic_struct=0),
        UserDataUnregistered(uuid=bytes(range(16)), data=b"hello SEI"),
        RecoveryPoint(recovery_frame_cnt=3, exact_match_flag=False,
                      broken_link_flag=True),
        ToneMapping(model_id=0, coded_data_bit_depth=10, sei_bit_depth=8,
                    min_value=0, max_value=1023),
        RawSEI(payload_type=4, data=b"\x01\x02\x03"),  # user_data_itu_t
    ]
    rbsp = write_sei(msgs, sps_map, sps)
    back = parse_sei(rbsp, sps_map, sps)
    assert len(back) == len(msgs)
    bp, pt, ud, rp, tm, raw = back
    assert bp.nal_cpb == [(90000, 30000)]
    assert (pt.cpb_removal_delay, pt.dpb_output_delay, pt.pic_struct) == (4, 2, 0)
    assert ud.uuid == bytes(range(16)) and ud.data == b"hello SEI"
    assert (rp.recovery_frame_cnt, rp.exact_match_flag, rp.broken_link_flag) \
        == (3, False, True)
    assert (tm.model_id, tm.min_value, tm.max_value) == (0, 0, 1023)
    assert raw.payload_type == 4 and raw.data == b"\x01\x02\x03"


def test_tone_mapping_models():
    # model 0: linear with clipping (ldecod/src/sei.c LUT loop)
    tm = ToneMapping(model_id=0, coded_data_bit_depth=10, sei_bit_depth=8,
                     min_value=0, max_value=1023)
    lut = tm.lut()
    assert lut[0] == 0 and lut[1023] == 255
    assert lut[200] == 200 * 255 // 1023
    # model 1: sigmoid, rounds like the reference double path
    tm1 = ToneMapping(model_id=1, coded_data_bit_depth=8, sei_bit_depth=8,
                      sigmoid_midpoint=128, sigmoid_width=64)
    l1 = tm1.lut()
    assert l1[128] == 128  # midpoint -> (255)/2 + 0.5
    assert l1[0] < 5 and l1[255] > 250
    # model 3: piecewise linear through pivots
    tm3 = ToneMapping(model_id=3, coded_data_bit_depth=10, sei_bit_depth=8,
                      coded_pivot_value=[64, 128, 256, 512, 768],
                      sei_pivot_value=[48, 73, 111, 168, 215])
    l3 = tm3.lut()
    assert l3[64] == 48 and l3[512] == 168 and l3[1023] == 255
    # apply() maps planes through the LUT
    plane = np.array([[0, 200], [1023, 512]])
    out = tm.apply(plane)
    assert out[0, 0] == 0 and out[1, 0] == 255


def test_decode_lencod_tonemap_stream():
    """The lencod ToneMapping stream (encoder.cfg +
    ToneMappingSEIPresentFlag=1) decodes byte-exactly AND surfaces the
    parsed tone mapping on the pictures.  JM applies the LUT to output
    only in RGB mode (ldecod/src/output.c:395) — same policy here."""
    from h264_tpu.decoder.decoder import decode_annexb

    data = open(TONEMAP_264, "rb").read()
    pics = decode_annexb(data)
    want = open("tests/streams/tonemap.rec.yuv", "rb").read()
    assert b"".join(p.to_yuv_bytes() for p in pics) == want
    tm = pics[0].tone_mapping
    assert tm is not None and tm.model_id == 0
    assert tm.coded_data_bit_depth == 10 and tm.sei_bit_depth == 8
    assert tm.min_value == 0 and tm.max_value == 1023
    # SEI list attached to the first picture (decode order: I first)
    first = min(pics, key=lambda p: p.poc)
    assert any(isinstance(m, ToneMapping) for m in first.sei)


def test_our_sei_stream_decodes_in_jm():
    """Our encoder's SEI-bearing stream must decode cleanly through the
    reference decoder with unchanged pixels."""
    from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder

    if not have_ldecod():
        pytest.skip("reference ldecod not built")
    raw = open("/root/reference/bin/foreman_part_qcif.yuv", "rb").read()
    W, H = 176, 144
    fs = W * H * 3 // 2
    frames = []
    for i in range(2):
        off = i * fs
        frames.append((
            np.frombuffer(raw[off:off + W * H], np.uint8).reshape(H, W),
            np.frombuffer(raw[off + W * H:off + W * H * 5 // 4], np.uint8
                          ).reshape(H // 2, W // 2),
            np.frombuffer(raw[off + W * H * 5 // 4:off + fs], np.uint8
                          ).reshape(H // 2, W // 2),
        ))
    enc = H264Encoder(EncoderConfig(
        width=W, height=H, qp=30, search_range=8, subpel=False,
        sei_text="h264_tpu SEI test", sei_recovery_point=True,
        sei_tone_mapping=ToneMapping(
            model_id=0, coded_data_bit_depth=10, sei_bit_depth=8,
            min_value=0, max_value=1023),
    ))
    stream = enc.encode_sequence(frames)
    assert any(
        n.nal_unit_type == 6 for n in iter_annexb_nalus(stream)
    ), "SEI NAL missing"
    got = jm_decode(stream)
    recs = {}
    for poc, pl in getattr(enc, "all_recons", []):
        recs.setdefault(poc, pl)
    for e in enc.recon_pics:
        recs.setdefault(e[0], e[1])
    ours = b"".join(
        np.asarray(pl).astype(np.uint8).tobytes()
        for poc in sorted(recs)
        for pl in (recs[poc].Y, recs[poc].U, recs[poc].V)
    )
    assert got == ours
