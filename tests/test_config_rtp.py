"""JM-compatible config parsing, RTP packet-file I/O, CLI round trips."""

import os
import subprocess
import sys

import numpy as np
import pytest

from h264_tpu.bitstream.rtp import read_rtp, write_rtp, iter_rtp_packets
from h264_tpu.bitstream.nal import NalUnit
from h264_tpu.config import (
    configure_encoder,
    encoder_config_from_params,
    parse_cfg_file,
    parse_decoder_cfg,
)
from h264_tpu.tools.rtp_loss import apply_loss

REF_BIN = "/root/reference/bin"


def test_parse_jm_encoder_cfg():
    params = parse_cfg_file(f"{REF_BIN}/encoder_baseline.cfg")
    assert params["SourceWidth"] == "176"
    assert params["InputFile"] == "foreman_part_qcif.yuv"
    run = encoder_config_from_params(params)
    assert run.enc.width == 176 and run.enc.height == 144
    assert run.enc.entropy == "cavlc"
    assert run.frames_to_encode == 3


def test_parse_jm_main_cfg_cabac_b():
    run = encoder_config_from_params(
        parse_cfg_file(f"{REF_BIN}/encoder_main.cfg")
    )
    assert run.enc.entropy == "cabac"
    assert run.enc.b_frames > 0


def test_configure_overrides():
    run = configure_encoder(
        ["-d", f"{REF_BIN}/encoder_baseline.cfg", "-p", "QPPSlice=40",
         "-p", "SourceWidth=352"]
    )
    assert run.enc.qp == 40 and run.enc.width == 352


def test_parse_decoder_cfg():
    d = parse_decoder_cfg(f"{REF_BIN}/decoder.cfg")
    assert d.input_file == "test.264"
    assert d.nal_mode == 0
    assert d.concealment_mode == 2


def test_rtp_roundtrip():
    nalus = [
        NalUnit(7, 3, b"\x00\x00\x00\x01\x02"),  # exercises escaping
        NalUnit(1, 3, bytes(range(64))),
    ]
    data = write_rtp(nalus, [0, 3000])
    back = read_rtp(data)
    assert len(back) == 2
    for a, b in zip(nalus, back):
        assert a.nal_unit_type == b.nal_unit_type
        assert a.rbsp == b.rbsp


def test_rtp_loss_deterministic():
    nalus = [NalUnit(1, 3, bytes([i] * 50)) for i in range(40)]
    data = write_rtp(nalus)
    out1, n1, d1 = apply_loss(data, 25.0, seed=3)
    out2, n2, d2 = apply_loss(data, 25.0, seed=3)
    assert out1 == out2 and n1 == 40 and 0 < d1 < 40
    kept = list(iter_rtp_packets(out1))
    assert len(kept) == 40 - d1


def test_level_limits_and_profile_check():
    """Level derivation (Table A-1 / lencod.c:2647 SetLevelIndices) and
    profile consistency (configfile.c:1289 ProfileCheck analogs)."""
    import pytest

    from h264_tpu.config import level_for, profile_check
    from h264_tpu.encoder.encoder import EncoderConfig

    assert level_for(176, 144, 15.0, 1) == 10
    assert level_for(352, 288, 30.0, 5) == 13  # CIF@30 fits 1.3
    assert level_for(1920, 1088, 30.0, 4) == 40
    with pytest.raises(ValueError):
        level_for(16384, 16384, 60.0, 16)
    with pytest.raises(ValueError):
        profile_check(EncoderConfig(
            width=176, height=144, entropy="cabac", partition_mode=1))
    with pytest.raises(ValueError):
        profile_check(EncoderConfig(
            width=176, height=144, transform8x8=True, num_slice_groups=2))
