"""Error-resilience round trips: slice loss, RTP packet loss, frame gaps.

Exercises decoder/erc.py (the JM behavior class: erc_do_i.c spatial
concealment, erc_do_p.c inter concealment + conceal_lost_frames) through
real lossy decodes of our own encoder's streams — no crash, full picture
coverage, and a PSNR floor against the loss-free decode.
"""

import numpy as np
import pytest

from h264_tpu.bitstream.nal import NalUnit, write_annexb
from h264_tpu.bitstream.rtp import read_rtp, write_rtp
from h264_tpu.decoder.decoder import H264Decoder, decode_annexb
from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder
from h264_tpu.tools.rtp_loss import apply_loss

W, H = 176, 144


def _frames(n, path="/root/reference/bin/foreman_part_qcif.yuv"):
    raw = open(path, "rb").read()
    fs = W * H * 3 // 2
    out = []
    for i in range(n):
        k = min(i, len(raw) // fs - 1)
        off = k * fs
        Y = np.frombuffer(raw[off : off + W * H], np.uint8).reshape(H, W)
        U = np.frombuffer(raw[off + W * H : off + W * H * 5 // 4], np.uint8
                          ).reshape(H // 2, W // 2)
        V = np.frombuffer(raw[off + W * H * 5 // 4 : off + fs], np.uint8
                          ).reshape(H // 2, W // 2)
        out.append((Y, U, V))
    return out


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


@pytest.fixture(scope="module")
def nalus():
    """4-frame IPPP multi-slice stream (4 row-slices per picture)."""
    enc = H264Encoder(EncoderConfig(
        width=W, height=H, qp=30, search_range=8, subpel=False,
        slice_mode=1, slice_argument=33,  # 3 slices of 33 MBs / picture
    ))
    out = list(enc.headers())
    for nl in enc.encode_stream(_frames(4)):
        out.extend(nl)
    return out


def _decode_pics(nalus, conceal):
    dec = H264Decoder(conceal_mode=conceal)
    return sorted(dec.decode_nalus(iter(nalus)), key=lambda p: p.poc)


def test_slice_loss_concealed(nalus):
    """Drop one non-IDR slice NAL; conceal mode 1 must still produce
    full pictures with a sane PSNR against the clean decode."""
    clean = _decode_pics(nalus, 0)
    slice_idx = [i for i, nl in enumerate(nalus) if nl.nal_unit_type == 1]
    lossy_nalus = [nl for i, nl in enumerate(nalus) if i != slice_idx[1]]
    pics = _decode_pics(lossy_nalus, conceal=1)
    assert len(pics) == len(clean)
    for got, ref in zip(pics, clean):
        g = np.asarray(got.planes.Y)
        assert g.shape == (H, W)
        assert 0 <= g.min() and g.max() <= 255
        assert _psnr(g, ref.planes.Y) > 20.0  # concealed, not garbage


def test_intra_slice_loss_concealed(nalus):
    """Drop an IDR slice (spatial concealment, erc_do_i.c path)."""
    clean = _decode_pics(nalus, 0)
    idr_idx = [i for i, nl in enumerate(nalus) if nl.nal_unit_type == 5]
    assert len(idr_idx) >= 2
    lossy = [nl for i, nl in enumerate(nalus) if i != idr_idx[-1]]
    pics = _decode_pics(lossy, conceal=1)
    assert len(pics) == len(clean)
    assert _psnr(pics[0].planes.Y, clean[0].planes.Y) > 15.0


def test_rtp_loss_roundtrip(nalus):
    """JM rtp_loss-style packet drop on an RTP file; decode with both
    conceal modes (decoder.cfg ConcealMode 1/2) without crashing."""
    rtp = write_rtp(nalus)
    lossy, n, dropped = apply_loss(rtp, 15.0, seed=5)
    assert dropped > 0
    clean = _decode_pics(nalus, 0)
    for mode in (1, 2):
        dec = H264Decoder(conceal_mode=mode)
        pics = sorted(dec.decode_nalus(read_rtp(lossy)), key=lambda p: p.poc)
        assert len(pics) >= 1
        for p in pics:
            y = np.asarray(p.planes.Y)
            assert y.shape == (H, W) and 0 <= y.min() and y.max() <= 255
        # first (IDR) picture survived the keep_first guarantee
        assert _psnr(pics[0].planes.Y, clean[0].planes.Y) > 25.0


def test_frame_gap_concealed():
    """Drop ALL NALs of one reference P frame: frame_num gap triggers
    conceal_lost_frames-style insertion (copy / motion copy)."""
    enc = H264Encoder(EncoderConfig(
        width=W, height=H, qp=30, search_range=8, subpel=False))
    groups = [enc.headers()]
    for nl in enc.encode_stream(_frames(4)):
        groups.append(nl)
    clean = _decode_pics([n for g in groups for n in g], 0)
    # groups: headers, IDR, P, P, P — drop the first P entirely
    lossy = [n for g in (groups[0], groups[1], *groups[3:]) for n in g]
    for mode in (1, 2):
        pics = _decode_pics(lossy, mode)
        assert len(pics) == len(clean), "gap frame must be concealed-in"
        for got, ref in zip(pics, clean):
            assert _psnr(got.planes.Y, ref.planes.Y) > 18.0


def test_strict_mode_raises_on_gap():
    enc = H264Encoder(EncoderConfig(
        width=W, height=H, qp=30, search_range=8, subpel=False))
    groups = [enc.headers()]
    for nl in enc.encode_stream(_frames(3)):
        groups.append(nl)
    lossy = [n for g in (groups[0], groups[1], groups[3]) for n in g]
    with pytest.raises(Exception):
        _decode_pics(lossy, 0)


def test_redundant_slices():
    """Redundant coded slices (lencod.c:2718 Init_redundant_frame;
    ldecod/src/image.c:157 Error_tracking): ignored while the primary is
    intact, decoded in its place when the primary slice is lost."""
    from h264_tpu.bitstream.nal import iter_annexb_nalus
    from h264_tpu.syntax.slice_header import parse_slice_header
    from h264_tpu.syntax.parsets import parse_sps, parse_pps

    enc = H264Encoder(EncoderConfig(
        width=W, height=H, qp=30, search_range=8, subpel=False,
        entropy="cabac", redundant_pics=True))
    stream = enc.encode_sequence(_frames(3))
    recs = {}
    for poc, pl in enc.all_recons:
        recs.setdefault(poc, pl)
    ours = b"".join(
        np.asarray(p).astype(np.uint8).tobytes()
        for poc in sorted(recs)
        for p in (recs[poc].Y, recs[poc].U, recs[poc].V))
    nalus = list(iter_annexb_nalus(write_annexb([])) if False else [])
    nalus = list(iter_annexb_nalus(stream))
    # with every NAL present: redundant slices are skipped, bit-exact
    pics = _decode_pics(nalus, conceal=0)
    assert b"".join(p.to_yuv_bytes() for p in pics) == ours
    # classify primaries vs redundants
    sps_map, pps_map = {}, {}
    prim_idx = []
    for i, n in enumerate(nalus):
        if n.nal_unit_type == 7:
            s = parse_sps(n.rbsp)
            sps_map[s.seq_parameter_set_id] = s
        elif n.nal_unit_type == 8:
            p = parse_pps(n.rbsp)
            pps_map[p.pic_parameter_set_id] = p
        elif n.nal_unit_type == 1:
            sh, _, _ = parse_slice_header(
                n.rbsp, sps_map, pps_map, n.nal_ref_idc, False)
            if sh.redundant_pic_cnt == 0:
                prim_idx.append(i)
    assert len(prim_idx) == 2  # two P primaries
    # drop the first P PRIMARY: the redundant copy must take over,
    # reproducing the identical reconstruction
    kept = [n for i, n in enumerate(nalus) if i != prim_idx[0]]
    pics2 = _decode_pics(kept, conceal=2)
    assert b"".join(p.to_yuv_bytes() for p in pics2) == ours


def test_loss_aware_rdo():
    """Loss-aware RDO (md_highloss.c / lencod decoder.c restructured as
    a simulated-decoder batch dim, encoder/lossaware.py): with simulated
    losses the encoder buys more intra, and the stream survives real
    slice loss with higher fidelity than the loss-blind encode."""
    frames = _frames(8)

    def encode(k):
        enc = H264Encoder(EncoderConfig(
            width=W, height=H, qp=30, fast=True, entropy="cabac",
            num_ref_frames=1, search_range=8, loss_aware_k=k,
            loss_rate=0.5))
        nalus = list(enc.headers())
        for out in enc.encode_stream(frames):
            nalus.extend(out)
        recs = {}
        for poc, pl in enc.all_recons:
            recs.setdefault(poc, pl)
        ours = b"".join(
            np.asarray(p).astype(np.uint8).tobytes()
            for poc in sorted(recs)
            for p in (recs[poc].Y, recs[poc].U, recs[poc].V))
        return nalus, ours

    nal_la, rec_la = encode(8)
    nal_off, rec_off = encode(0)
    # round trip stays bit-exact with loss-aware decisions
    pics = _decode_pics(nal_la, conceal=0)
    assert b"".join(p.to_yuv_bytes() for p in pics) == rec_la
    # more intra under expected loss
    n_intra_la = sum(int(p.state.is_intra.sum()) for p in pics)
    pics_off = _decode_pics(nal_off, conceal=0)
    n_intra_off = sum(int(p.state.is_intra.sum()) for p in pics_off)
    assert n_intra_la > n_intra_off, (n_intra_la, n_intra_off)

    def lossy_psnr(nalus):
        # drop the 4th picture's slice, decode with concealment, measure
        # against the source tail
        slices = [i for i, n in enumerate(nalus)
                  if n.nal_unit_type in (1, 5)]
        kept = [n for i, n in enumerate(nalus) if i != slices[4]]
        pics = _decode_pics(kept, conceal=2)
        vals = []
        for p in sorted(pics, key=lambda q: q.poc)[5:]:
            src = frames[min(p.poc // 2, len(frames) - 1)][0]
            vals.append(_psnr(p.planes.Y, src))
        return float(np.mean(vals))

    # loss-aware stream degrades less after a real loss
    assert lossy_psnr(nal_la) > lossy_psnr(nal_off) - 0.3
