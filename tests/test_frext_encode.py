"""FRExt encoder gates: 8x8 transform + scaling matrices end-to-end.

High-profile encodes (Transform8x8Mode / ScalingMatrixPresentFlag
equivalents) must round-trip bit-exactly through our own decoder and —
when the reference binary is built — through ldecod.exe.
Reference: lencod/src/transform8x8.c:258 (transform decision),
q_matrix.c:451 (scaling matrices into quant).
"""

import numpy as np
import pytest

from h264_tpu.bitstream.nal import iter_annexb_nalus
from h264_tpu.decoder.decoder import decode_annexb
from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder
from h264_tpu.syntax.parsets import parse_sps

from jmref import have_ldecod, jm_decode

W, H = 176, 144


def _frames(n=3):
    raw = open("/root/reference/bin/foreman_part_qcif.yuv", "rb").read()
    fs = W * H * 3 // 2
    out = []
    for i in range(n):
        off = i * fs
        out.append((
            np.frombuffer(raw[off:off + W * H], np.uint8).reshape(H, W),
            np.frombuffer(raw[off + W * H:off + W * H * 5 // 4], np.uint8
                          ).reshape(H // 2, W // 2),
            np.frombuffer(raw[off + W * H * 5 // 4:off + fs], np.uint8
                          ).reshape(H // 2, W // 2),
        ))
    return out


def _jm_scaling_lists():
    """The q_matrix.cfg-effective lists, read back from the lencod
    qmat_sps fixture's SPS."""
    data = open("tests/streams/qmat_sps.264", "rb").read()
    for nal in iter_annexb_nalus(data):
        if nal.nal_unit_type == 7:
            s = parse_sps(nal.rbsp)
            break
    return (np.array(s.scaling_lists_4x4, np.int32).reshape(6, 4, 4),
            np.array(s.scaling_lists_8x8, np.int32).reshape(2, 8, 8))


def _recon_bytes(enc):
    recs = {}
    for poc, pl in enc.all_recons:
        recs.setdefault(poc, pl)
    for e in enc.recon_pics:
        recs.setdefault(e[0], e[1])
    return b"".join(
        np.asarray(x).astype(np.uint8).tobytes()
        for poc in sorted(recs)
        for x in (recs[poc].Y, recs[poc].U, recs[poc].V)
    )


CASES = [
    ("t8_cabac", dict(transform8x8=True, entropy="cabac")),
    ("t8_cavlc", dict(transform8x8=True, entropy="cavlc")),
    ("t8_qmat_cabac", dict(transform8x8=True, entropy="cabac", _sl=True)),
    ("t8_qmat_cavlc", dict(transform8x8=True, entropy="cavlc", _sl=True)),
    ("t8_cabac_b", dict(transform8x8=True, entropy="cabac", b_frames=1)),
    ("qmat_only_cabac", dict(entropy="cabac", _sl=True)),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[c[0] for c in CASES])
def test_frext_roundtrip(name, kw):
    kw = dict(kw)
    if kw.pop("_sl", False):
        kw["scaling_lists"] = _jm_scaling_lists()
    enc = H264Encoder(EncoderConfig(
        width=W, height=H, qp=28, search_range=8, **kw))
    stream = enc.encode_sequence(_frames())
    sps = next(parse_sps(n.rbsp) for n in iter_annexb_nalus(stream)
               if n.nal_unit_type == 7)
    assert sps.profile_idc == 100
    pics = decode_annexb(stream)
    ours = _recon_bytes(enc)
    assert b"".join(p.to_yuv_bytes() for p in pics) == ours
    if kw.get("transform8x8") and not kw.get("b_frames"):
        n8 = sum(int(p.state.transform8x8.sum()) for p in pics)
        assert n8 > 0, "transform decision never chose 8x8"
    if have_ldecod():
        assert jm_decode(stream) == ours
