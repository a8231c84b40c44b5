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
