"""Data partitioning (DPA/DPB/DPC) round trips + partition loss.

Capability reference: lencod/src/header.c:541 (data-partition slice
headers), ldecod/src/nal_part.c (partition assembly; loss of single
partitions tolerated), CHANGES.TXT:2-4 (JM 13.0 per-partition loss
handling).
"""

import numpy as np
import pytest

from h264_tpu.bitstream.nal import iter_annexb_nalus, write_annexb
from h264_tpu.decoder.decoder import H264Decoder, decode_annexb
from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder

from jmref import have_ldecod, jm_decode

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
def dp_stream():
    """3-frame IPP CAVLC stream with PartitionMode=1 (+ its recons)."""
    enc = H264Encoder(EncoderConfig(
        width=W, height=H, qp=30, search_range=8, subpel=False,
        partition_mode=1,
    ))
    stream = enc.encode_sequence(_frames(3))
    recs = {}
    for poc, pl in enc.all_recons:
        recs.setdefault(poc, pl)
    recon = b"".join(
        np.asarray(pl).astype(np.uint8).tobytes()
        for poc in sorted(recs)
        for pl in (recs[poc].Y, recs[poc].U, recs[poc].V)
    )
    return stream, recon


def test_dp_stream_has_partitions(dp_stream):
    stream, _ = dp_stream
    types = [n.nal_unit_type for n in iter_annexb_nalus(stream)]
    assert 2 in types and (3 in types or 4 in types), types
    assert 1 not in types  # non-IDR slices are all partitioned


def test_dp_roundtrip_own_decoder(dp_stream):
    stream, recon = dp_stream
    pics = decode_annexb(stream)
    assert b"".join(p.to_yuv_bytes() for p in pics) == recon


def test_dp_roundtrip_ldecod(dp_stream):
    if not have_ldecod():
        pytest.skip("reference ldecod not built")
    stream, recon = dp_stream
    assert jm_decode(stream) == recon


def test_dp_config_mapping():
    from h264_tpu.config import encoder_config_from_params

    rc = encoder_config_from_params({
        "SourceWidth": "176", "SourceHeight": "144", "PartitionMode": "1",
    })
    assert rc.enc.partition_mode == 1


def test_dp_partition_c_loss_concealed(dp_stream):
    """Dropping every DPC (inter residual) must still decode all pictures:
    partition A carries mb_type/MVs, so motion is intact and the residual
    is treated as absent (ldecod/src/nal_part.c loss behavior)."""
    stream, recon = dp_stream
    kept = [n for n in iter_annexb_nalus(stream) if n.nal_unit_type != 4]
    pics = sorted(H264Decoder(conceal_mode=2).decode_nalus(iter(kept)),
                  key=lambda p: p.poc)
    assert len(pics) == 3
    full = sorted(decode_annexb(stream), key=lambda p: p.poc)
    for got, ref in zip(pics[1:], full[1:]):
        # MVs intact, residual missing: still strongly correlated
        assert _psnr(got.planes.Y, ref.planes.Y) > 22.0


def test_dp_partition_a_loss_ignores_bc():
    """If a slice's DPA is lost, its DPB/DPC must not corrupt the decode
    of other slices (slice_id matching in partition assembly)."""
    enc = H264Encoder(EncoderConfig(
        width=W, height=H, qp=30, search_range=8, subpel=False,
        partition_mode=1, slice_mode=1, slice_argument=50,
    ))
    nalus = list(enc.headers())
    for out in enc.encode_stream(_frames(3)):
        nalus.extend(out)
    # drop the SECOND DPA of the first P picture, keep its B/C partitions
    dpa_seen = 0
    kept = []
    for n in nalus:
        if n.nal_unit_type == 2:
            dpa_seen += 1
            if dpa_seen == 2:
                continue
        kept.append(n)
    pics = sorted(H264Decoder(conceal_mode=2).decode_nalus(iter(kept)),
                  key=lambda p: p.poc)
    assert len(pics) == 3
    full = sorted(decode_annexb(write_annexb(nalus)), key=lambda p: p.poc)
    # the intact slices must still decode with high fidelity
    assert _psnr(pics[1].planes.Y[:48], full[1].planes.Y[:48]) > 30.0
