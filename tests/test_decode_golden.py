"""Golden-stream decode gates: bit-exactness vs the reference decoder's
output (bin/test_rec.yuv), per SURVEY.md §4.2 — this is the conformance
test of the framework."""

import numpy as np
import pytest

from h264_tpu.decoder.decoder import H264Decoder


@pytest.fixture(scope="module")
def decoded(golden_stream):
    dec = H264Decoder()
    return list(dec.decode_stream(golden_stream))


def test_idr_frame_bit_exact(decoded, golden_recon):
    pic0 = decoded[0]
    assert pic0.to_yuv_bytes() == golden_recon[:38016]
