"""Decoder conformance vs reference-encoder streams.

tests/streams/*.264 are lencod-generated streams (see tests/streams/gen.sh)
each exercising one decode feature the golden stream does not: weighted
prediction (explicit P/B, implicit B, fades with non-identity weights),
temporal direct, POC type 1, multi-reference P, B reference pictures.
Our decode must byte-match the reference decoder's output.
"""

import glob
import pathlib

import numpy as np
import pytest

from h264_tpu.decoder.decoder import decode_annexb

from jmref import have_ldecod, jm_decode

STREAMS = sorted(
    pathlib.Path(__file__).parent.glob("streams/*.264"), key=lambda p: p.name
)


def _our_decode(data: bytes) -> bytes:
    pics = decode_annexb(data)
    return b"".join(
        np.asarray(p).astype(np.uint8).tobytes()
        for pic in sorted(pics, key=lambda p: p.poc)
        for p in (pic.planes.Y, pic.planes.U, pic.planes.V)
    )


@pytest.mark.parametrize("path", STREAMS, ids=lambda p: p.stem)
def test_stream_conformance(path):
    data = path.read_bytes()
    got = _our_decode(data)
    rec = path.with_suffix(".rec.yuv")
    if rec.exists():
        want = rec.read_bytes()
    elif have_ldecod():
        want = jm_decode(data)
    else:
        pytest.skip("no recon file and no reference ldecod")
    assert got == want, f"{path.stem}: decode differs from reference"
