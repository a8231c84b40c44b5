"""Interlace (PicAFF) decode: field pictures, field ref lists, field
deblocking, chroma parity adjustment, field weaving.

Gate: a lencod PicInterlace=1 stream (I + P fields, CABAC) decodes
bit-exactly against the reference encoder's reconstruction.
Reference: ldecod/src/image.c field path, mbuffer.c field list init
(gen_pic_list_from_frame_list:921), macroblock.c:4296 chroma vector
adjustment, loopFilter.c field bS rules.
"""

import pathlib

import numpy as np
import pytest

from h264_tpu.decoder.decoder import H264Decoder, decode_annexb
from h264_tpu.bitstream.nal import iter_annexb_nalus

STREAM = pathlib.Path("tests/streams/field.264")
RECON = pathlib.Path("tests/streams/field.rec.yuv")


@pytest.mark.skipif(not STREAM.exists(), reason="field fixture missing")
def test_field_stream_bitexact():
    data = STREAM.read_bytes()
    pics = decode_annexb(data)
    assert len(pics) == 8  # woven frames
    assert all(p.field_parity < 0 for p in pics)
    if RECON.exists():
        assert b"".join(p.to_yuv_bytes() for p in pics) == \
            RECON.read_bytes()


@pytest.mark.skipif(not STREAM.exists(), reason="field fixture missing")
def test_field_pictures_are_fields():
    dec = H264Decoder()
    pics = list(dec.decode_nalus(iter_annexb_nalus(STREAM.read_bytes())))
    assert len(pics) == 16  # 8 frames x 2 fields
    assert {p.field_parity for p in pics} == {0, 1}
    # field pictures are half-height
    assert all(np.asarray(p.planes.Y).shape == (144, 352) for p in pics)
