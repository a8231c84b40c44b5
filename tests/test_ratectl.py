"""Rate control (JVT-G012 quadratic model, lencod/src/rc_quadratic.c
algorithm): actual bitrate must converge to the target."""

import numpy as np
import pytest

from h264_tpu.control.ratectl import RateControl, qp_to_qstep, qstep_to_qp
from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder

from test_encoder import _foreman_frames


def test_qp_qstep_roundtrip():
    for qp in range(52):
        assert qstep_to_qp(qp_to_qstep(qp)) == qp


def test_rate_convergence():
    base = _foreman_frames(3)
    frames = [base[i % 3] for i in range(20)]
    target = 300_000.0
    enc = H264Encoder(
        EncoderConfig(width=176, height=144, search_range=8,
                      subpel=False, rc_bitrate=target)
    )
    bits = 0
    for out in enc.encode_stream(frames):
        bits += sum(8 * (len(n.rbsp) + 5) for n in out)
    rate = bits / len(frames) * 30.0
    assert abs(rate - target) / target < 0.15, rate


def test_rc_b_frames_pick():
    rc = RateControl(300_000, 30, 176, 144, n_b=1)
    qi = rc.pick_qp("I")
    rc.post_frame("I", 40000, 4.0)
    qp = rc.pick_qp("P")
    rc.post_frame("P", 15000, 4.0)
    qb = rc.pick_qp("B")
    assert qb == qp + 2


def test_rc_fast_path_roundtrip():
    """RC composes with the device RD pipeline (no host-path fallback):
    QP varies per frame via traced args, stream round-trips bit-exactly,
    and the rate lands near target."""
    from h264_tpu.decoder.decoder import decode_annexb

    frames = _foreman_frames(3) * 3
    target = 350_000.0
    enc = H264Encoder(EncoderConfig(
        width=176, height=144, fast=True, entropy="cabac",
        num_ref_frames=1, search_range=8, rc_bitrate=target))
    stream = enc.encode_sequence(frames)
    recs = {}
    for poc, pl in enc.all_recons:
        recs.setdefault(poc, pl)
    ours = b"".join(
        np.asarray(p).astype(np.uint8).tobytes()
        for poc in sorted(recs)
        for p in (recs[poc].Y, recs[poc].U, recs[poc].V))
    assert b"".join(
        p.to_yuv_bytes() for p in decode_annexb(stream)) == ours
    rate = 8 * len(stream) / len(frames) * 30.0
    assert abs(rate - target) / target < 0.35, rate  # 9 frames only


def test_rc_basic_unit_rows_roundtrip():
    """Per-tile-row basic-unit QP (rc_quadratic.c:2399 analog): slices
    carry their own QP, stream stays decodable bit-exactly."""
    from h264_tpu.decoder.decoder import decode_annexb

    frames = _foreman_frames(3) * 2
    enc = H264Encoder(EncoderConfig(
        width=176, height=144, fast=True, entropy="cavlc",
        num_ref_frames=1, search_range=8, row_slices=3,
        rc_bitrate=350_000.0))
    stream = enc.encode_sequence(frames)
    recs = {}
    for poc, pl in enc.all_recons:
        recs.setdefault(poc, pl)
    ours = b"".join(
        np.asarray(p).astype(np.uint8).tobytes()
        for poc in sorted(recs)
        for p in (recs[poc].Y, recs[poc].U, recs[poc].V))
    assert b"".join(
        p.to_yuv_bytes() for p in decode_annexb(stream)) == ours


def test_leaky_bucket():
    """Bucket parameters (lencod/src/leaky_bucket.c:202 calc_buffer
    analog): computed (R, B, F) never underflow, higher rates need
    smaller buffers."""
    from h264_tpu.control.leaky_bucket import calc_buffer, verify_bucket

    bits = [40000, 9000, 12000, 7000, 20000, 8000, 6000, 15000]
    rates = [200_000, 350_000, 600_000]
    params = calc_buffer(bits, rates, 30.0)
    for p in params:
        assert verify_bucket(bits, p, 30.0), p
    assert params[0].buffer_size >= params[1].buffer_size >= \
        params[2].buffer_size
    # tightening F below the requirement must underflow
    from dataclasses import replace

    bad = replace(params[0], initial_fullness=params[0].initial_fullness
                  - 5000)
    assert not verify_bucket(bits, bad, 30.0)
