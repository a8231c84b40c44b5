"""Device RD mode-decision pipeline (encoder/rd.py).

Gates: (a) streams from the RD fast path decode bit-exactly through OUR
decoder against the encoder's own reconstruction (the JM self-check,
SURVEY.md §4.2 analog); (b) through the reference ldecod when built;
(c) the RD path uses the new coding tools (partitions / skip / intra-in-P)
and beats the legacy P16x16 path in rate at equal QP.
"""

import numpy as np
import pytest

from h264_tpu.bitstream import write_annexb
from h264_tpu.decoder import mbtables as M
from h264_tpu.decoder.decoder import decode_annexb
from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder

from jmref import have_ldecod, jm_decode, pack_yuv420

W, H = 176, 144


def _foreman(n):
    raw = open("/root/reference/bin/foreman_part_qcif.yuv", "rb").read()
    fsz = W * H * 3 // 2
    out = []
    for i in range(n):
        f = raw[(i % 3) * fsz : ((i % 3) + 1) * fsz]
        Y = np.frombuffer(f[: W * H], np.uint8).reshape(H, W)
        U = np.frombuffer(f[W * H : W * H * 5 // 4], np.uint8).reshape(
            H // 2, W // 2
        )
        V = np.frombuffer(f[W * H * 5 // 4 :], np.uint8).reshape(
            H // 2, W // 2
        )
        out.append((Y, U, V))
    return out


def _encode_collect(cfg, frames):
    enc = H264Encoder(cfg)
    nalus = enc.headers()
    recs = []
    states = []
    for k, yuv in enumerate(frames):
        nalus.extend(enc.encode_frame(yuv, is_idr=(k == 0)))
        pl = enc.recon_pics[-1][1]
        recs.append(
            (np.asarray(pl.Y).astype(np.uint8),
             np.asarray(pl.U).astype(np.uint8),
             np.asarray(pl.V).astype(np.uint8))
        )
        states.append(enc.recon_pics[-1][2])
    return write_annexb(nalus), recs, states


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
@pytest.mark.parametrize("nref", [1, 2])
def test_rd_self_roundtrip(entropy, nref):
    frames = _foreman(4)
    stream, recs, _ = _encode_collect(
        EncoderConfig(width=W, height=H, qp=28, fast=True, rd=True,
                      num_ref_frames=nref, search_range=16,
                      entropy=entropy),
        frames,
    )
    pics = decode_annexb(stream)
    assert len(pics) == len(frames)
    for i, p in enumerate(pics):
        for name, a, b in (("Y", p.planes.Y, recs[i][0]),
                           ("U", p.planes.U, recs[i][1]),
                           ("V", p.planes.V, recs[i][2])):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (
                f"frame {i} plane {name}: decode != encoder recon"
            )


def test_rd_uses_partitions_and_improves_rate():
    frames = _foreman(4)
    stream_rd, _, states = _encode_collect(
        EncoderConfig(width=W, height=H, qp=28, fast=True, rd=True,
                      num_ref_frames=1, search_range=16),
        frames,
    )
    stream_legacy, _, _ = _encode_collect(
        EncoderConfig(width=W, height=H, qp=28, fast=True, rd=False,
                      num_ref_frames=1, search_range=16),
        frames,
    )
    types = np.concatenate([st.mb_type for st in states[1:]])
    skips = np.concatenate([st.skip_flag for st in states[1:]])
    used = set(types.tolist())
    # the decision layer must actually exercise the partition/skip space
    assert skips.any(), "no P_Skip MBs chosen"
    assert used & {M.P16x8, M.P8x16, M.P8x8}, f"only modes {used}"
    assert len(stream_rd) < len(stream_legacy), (
        len(stream_rd), len(stream_legacy)
    )


@pytest.mark.skipif(not have_ldecod(),
                    reason="reference ldecod not built (/tmp/jm/bin)")
def test_rd_jm_roundtrip_multiref():
    frames = _foreman(5)
    stream, recs, _ = _encode_collect(
        EncoderConfig(width=W, height=H, qp=28, fast=True, rd=True,
                      num_ref_frames=3, search_range=16, entropy="cabac"),
        frames,
    )
    got = jm_decode(stream)
    want = pack_yuv420([(r[0], r[1], r[2]) for r in recs])
    assert got == want, "ldecod output != encoder recon (rd multi-ref)"
