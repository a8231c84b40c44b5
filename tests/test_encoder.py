"""Encoder round-trip gates (M2, SURVEY.md §7.2).

Self-consistency: our decoder's decode of our stream must equal the
encoder's own reconstruction bit-for-bit (the same property ldecod
verifies externally — see .claude/skills/verify for the A/B recipe).
"""

import numpy as np
import pytest

from h264_tpu.decoder.decoder import decode_annexb
from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder


def _foreman_frames(n, path="/root/reference/bin/foreman_part_qcif.yuv"):
    raw = open(path, "rb").read()
    W, H = 176, 144
    out = []
    for i in range(n):
        off = i * (W * H * 3 // 2)
        Y = np.frombuffer(raw[off : off + W * H], np.uint8).reshape(H, W)
        U = np.frombuffer(
            raw[off + W * H : off + W * H + W * H // 4], np.uint8
        ).reshape(H // 2, W // 2)
        V = np.frombuffer(
            raw[off + W * H + W * H // 4 : off + W * H * 3 // 2], np.uint8
        ).reshape(H // 2, W // 2)
        out.append((Y, U, V))
    return out


@pytest.fixture(scope="module")
def encoded():
    frames = _foreman_frames(2)
    enc = H264Encoder(
        EncoderConfig(width=176, height=144, qp=30, search_range=8, subpel=False)
    )
    recons = []
    orig = enc.encode_frame

    def wrap(yuv, idr):
        out = orig(yuv, idr)
        p = enc.recon_pics[-1][1]
        recons.append(
            (np.asarray(p.Y).copy(), np.asarray(p.U).copy(), np.asarray(p.V).copy())
        )
        return out

    enc.encode_frame = wrap
    stream = enc.encode_sequence(frames)
    return frames, stream, recons


def test_stream_decodes(encoded):
    frames, stream, recons = encoded
    pics = decode_annexb(stream)
    assert len(pics) == 2
    assert pics[0].slice_type.name == "I" and pics[1].slice_type.name == "P"


def test_self_consistency(encoded):
    """Encoder recon == decoder output, frame by frame, bit-exact."""
    frames, stream, recons = encoded
    pics = decode_annexb(stream)
    for pic, (Y, U, V) in zip(pics, recons):
        assert (np.asarray(pic.planes.Y) == Y).all()
        assert (np.asarray(pic.planes.U) == U).all()
        assert (np.asarray(pic.planes.V) == V).all()


def test_quality_sane(encoded):
    """QP30 reconstruction should be well above 30 dB on foreman."""
    frames, stream, recons = encoded
    for (Y, _, _), f in zip(recons, frames):
        mse = ((Y.astype(float) - f[0].astype(float)) ** 2).mean()
        psnr = 10 * np.log10(255.0 ** 2 / mse)
        assert psnr > 32.0, psnr


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_b_frames_roundtrip(entropy):
    """B-picture encode (I B P, spatial direct, bi-pred): our decoder's
    output must equal the encoder reconstruction bit-for-bit. The same
    streams are verified bit-exact through the reference ldecod binary
    (see .claude/skills/verify)."""
    frames = _foreman_frames(3)
    enc = H264Encoder(
        EncoderConfig(
            width=176, height=144, qp=28, search_range=8,
            b_frames=1, entropy=entropy,
        )
    )
    stream = enc.encode_sequence(frames)
    pics = decode_annexb(stream)
    assert [p.slice_type.name for p in pics] == ["I", "B", "P"]
    assert [p.poc for p in pics] == [0, 2, 4]
    encmap = {poc: pl for poc, pl in enc.all_recons}
    for p in pics:
        e = encmap[p.poc]
        for a, b in ((p.planes.Y, e.Y), (p.planes.U, e.U), (p.planes.V, e.V)):
            assert np.array_equal(np.asarray(a), np.asarray(b))
