"""JM reference round trip: our streams through the reference ldecod.

This is the BASELINE.json acceptance gate run as part of the suite
(VERDICT round 1, item 9): for each config the reference decoder must
(a) decode our stream without errors and (b) produce output bytes that
equal our encoder's own reconstruction. Skips when /tmp/jm/bin/ldecod.exe
has not been built on this machine.
"""

import numpy as np
import pytest

from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder

from jmref import have_ldecod, jm_decode, pack_yuv420

pytestmark = pytest.mark.skipif(
    not have_ldecod(), reason="reference ldecod not built (/tmp/jm/bin)"
)

W, H = 176, 144


def _foreman(n):
    raw = open("/root/reference/bin/foreman_part_qcif.yuv", "rb").read()
    fsz = W * H * 3 // 2
    out = []
    for i in range(n):
        f = raw[i * fsz : (i + 1) * fsz]
        Y = np.frombuffer(f[: W * H], np.uint8).reshape(H, W)
        U = np.frombuffer(f[W * H : W * H * 5 // 4], np.uint8).reshape(H // 2, W // 2)
        V = np.frombuffer(f[W * H * 5 // 4 :], np.uint8).reshape(H // 2, W // 2)
        out.append((Y, U, V))
    return out


CONFIGS = {
    "cavlc": dict(),
    "cabac": dict(entropy="cabac"),
    "multislice": dict(slice_mode=1, slice_argument=11),
    "fmo_interleave": dict(
        num_slice_groups=2, slice_group_map_type=0, slice_group_run_length=(5, 6)
    ),
    "fmo_rect": dict(
        num_slice_groups=2,
        slice_group_map_type=2,
        slice_group_rects=((12, 58),),
    ),
    "fmo_explicit": dict(
        num_slice_groups=3,
        slice_group_map_type=6,
        slice_group_ids=tuple(np.arange(99) % 3),
    ),
    "bframes_cabac": dict(entropy="cabac", b_frames=2),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_roundtrip(name):
    frames = _foreman(3)
    enc = H264Encoder(
        EncoderConfig(width=W, height=H, qp=30, search_range=8, **CONFIGS[name])
    )
    stream = enc.encode_sequence(frames)
    got = jm_decode(stream)
    recons = [
        (np.asarray(p.Y), np.asarray(p.U), np.asarray(p.V))
        for _, p in sorted(enc.all_recons, key=lambda t: t[0])
    ]
    want = pack_yuv420(recons)
    assert len(got) == len(want), (len(got), len(want))
    assert got == want, f"{name}: ldecod output != encoder recon"
