"""TPU-batched decode reconstruction (decoder/device.py) must be
bit-identical to the host raster path on every conformance stream.

The device path batches the whole picture's inter MC + residual recon as
one jitted program (re-shaping ldecod/src/macroblock.c:4203
decode_one_macroblock / mc_prediction.c:1063 perform_mc into per-4x4
tensor ops); intra MBs stay on the host raster path.  Exactness here is
the gate that lets ldecod.py enable it by default.
"""

import pathlib

import pytest

from h264_tpu.decoder.decoder import decode_annexb

STREAMS = sorted(
    pathlib.Path(__file__).parent.glob("streams/*.264"), key=lambda p: p.name
)


def _yuv(pics) -> bytes:
    return b"".join(p.to_yuv_bytes() for p in pics)


def test_golden_device_bit_exact(golden_stream, golden_recon):
    pics = decode_annexb(golden_stream, use_device=True)
    assert _yuv(pics) == golden_recon


@pytest.mark.parametrize("path", STREAMS, ids=lambda p: p.stem)
def test_stream_device_matches_host(path):
    data = path.read_bytes()
    rec = path.with_suffix(".rec.yuv")
    want = rec.read_bytes() if rec.exists() else _yuv(decode_annexb(data))
    got = _yuv(decode_annexb(data, use_device=True))
    assert got == want, f"{path.stem}: device decode differs"
