"""Golden-stream decode gates: bit-exactness vs the reference decoder's
output (bin/test_rec.yuv), per SURVEY.md §4.2 — this is the conformance
test of the framework."""

import numpy as np
import pytest

from h264_tpu.decoder.decoder import H264Decoder


@pytest.fixture(scope="module")
def decoded(golden_stream):
    from h264_tpu.decoder.decoder import decode_annexb

    return decode_annexb(golden_stream)


def test_idr_frame_bit_exact(decoded, golden_recon):
    pic0 = decoded[0]
    assert pic0.to_yuv_bytes() == golden_recon[:38016]


def test_full_sequence_bit_exact(decoded, golden_recon):
    """The M1 acceptance gate (SURVEY.md §7.2): our decode of test.264 must
    byte-match the reference decoder's output, all three frames (I/P/B)."""
    out = b"".join(p.to_yuv_bytes() for p in decoded)
    assert out == golden_recon
    assert [p.poc for p in decoded] == [0, 2, 4]
    assert [p.slice_type.name for p in decoded] == ["I", "B", "P"]
