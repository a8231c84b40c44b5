"""Encoder-side weighted prediction (P explicit, DC-ratio estimation).

Capability reference: lencod/src/weighted_prediction.c:30
estimate_weighting_factor_P_slice (luma DC ratio, logWD 5, offsets 0).
Acceptance: WP streams round-trip bit-exactly through our decoder and
JM ldecod, and spend fewer bits than non-WP on fade content.
"""

import numpy as np
import pytest

from h264_tpu.bitstream.nal import iter_annexb_nalus
from h264_tpu.decoder.decoder import decode_annexb
from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder

from jmref import have_ldecod, jm_decode

W, H = 176, 144


def _fade_frames(n):
    """Deterministic textured content with a linear fade to black."""
    rng = np.random.RandomState(7)
    base = rng.randint(0, 255, (H, W)).astype(np.float64)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
            + np.roll(base, 2, 0) + np.roll(base, 2, 1)) / 5.0
    ub = rng.randint(64, 192, (H // 2, W // 2)).astype(np.float64)
    vb = rng.randint(64, 192, (H // 2, W // 2)).astype(np.float64)
    out = []
    for i in range(n):
        g = 1.0 - 0.12 * i  # strong fade: DC drops 12% per frame
        out.append((
            (base * g).clip(0, 255).astype(np.uint8),
            (128 + (ub - 128) * g).clip(0, 255).astype(np.uint8),
            (128 + (vb - 128) * g).clip(0, 255).astype(np.uint8),
        ))
    return out


def _encode(frames, wp):
    enc = H264Encoder(EncoderConfig(
        width=W, height=H, qp=28, fast=True, entropy="cabac",
        num_ref_frames=2, search_range=8, weighted_pred=wp,
    ))
    stream = enc.encode_sequence(frames)
    recs = {}
    for poc, pl in enc.all_recons:
        recs.setdefault(poc, pl)
    recon = b"".join(
        np.asarray(pl).astype(np.uint8).tobytes()
        for poc in sorted(recs)
        for pl in (recs[poc].Y, recs[poc].U, recs[poc].V)
    )
    return stream, recon


@pytest.fixture(scope="module")
def wp_case():
    frames = _fade_frames(5)
    return frames, _encode(frames, True), _encode(frames, False)


def test_wp_stream_signals_weights(wp_case):
    _, (stream, _), _ = wp_case
    from h264_tpu.syntax.parsets import parse_pps, parse_sps
    from h264_tpu.syntax.slice_header import parse_slice_header

    sps_map, pps_map = {}, {}
    saw_wp = False
    for nal in iter_annexb_nalus(stream):
        if nal.nal_unit_type == 7:
            s = parse_sps(nal.rbsp)
            sps_map[s.seq_parameter_set_id] = s
        elif nal.nal_unit_type == 8:
            p = parse_pps(nal.rbsp)
            assert p.weighted_pred_flag
            pps_map[p.pic_parameter_set_id] = p
        elif nal.nal_unit_type == 1:
            sh, _, _ = parse_slice_header(
                nal.rbsp, sps_map, pps_map, nal.nal_ref_idc, False)
            pw = sh.pred_weights[0][0]
            assert pw.luma_weight < 32, pw.luma_weight  # fade => weight < 1
            saw_wp = True
    assert saw_wp


def test_wp_roundtrip_own_decoder(wp_case):
    _, (stream, recon), _ = wp_case
    pics = decode_annexb(stream)
    assert b"".join(p.to_yuv_bytes() for p in pics) == recon


def test_wp_roundtrip_ldecod(wp_case):
    if not have_ldecod():
        pytest.skip("reference ldecod not built")
    _, (stream, recon), _ = wp_case
    assert jm_decode(stream) == recon


def test_wp_saves_bits_on_fade(wp_case):
    frames, (s_wp, r_wp), (s_no, r_no) = wp_case

    def psnr(recon):
        vals = []
        off = 0
        for (Y, U, V) in frames:
            n = Y.size
            got = np.frombuffer(recon[off:off + n], np.uint8).reshape(Y.shape)
            mse = np.mean((got.astype(np.float64) - Y) ** 2)
            vals.append(99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse))
            off += n * 3 // 2
        return float(np.mean(vals))

    # equal-or-better quality at clearly fewer bits
    assert len(s_wp) < 0.9 * len(s_no), (len(s_wp), len(s_no))
    assert psnr(r_wp) > psnr(r_no) - 0.15
