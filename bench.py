#!/usr/bin/env python
"""Benchmark: CIF Main-profile encode throughput + BD-rate vs lencod.

Driver contract: prints ONE JSON line {"metric", "value", "unit",
"vs_baseline"}.

Content: `h264_tpu.tools.benchseq.make_sequence(100)` — a deterministic,
NON-repeating 100-frame CIF sequence (camera pan/zoom over a mosaic
world, independently moving foreground, film grain, terminal fade).
The lencod baseline (JM 12.4, encoder_main.cfg: CABAC, 1 B, RDO,
FastFullSearch, 5 refs, SR 32) was measured on the *identical* YUV at
QP {24,28,32,36} by tools/gen_bench_ref.py -> tools/bench_ref.json:
0.434 fps / 38.08 dB / 281.0 kbps at QP 28.

Reported:
  value        steady-state encode fps at QP 28 (after jit warmup)
  vs_baseline  fps / lencod fps at QP 28
  bd_rate_pct  Bjontegaard delta-rate over QP {24,28,32,36} vs the
               lencod curve (negative = we need fewer bits at equal
               PSNR-Y)
"""

import json
import pathlib
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder
from h264_tpu.tools.benchseq import bd_rate, make_sequence, psnr

REF = json.loads(
    (pathlib.Path(__file__).parent / "tools/bench_ref.json").read_text()
)
QPS = [p["qp"] for p in REF["points"]]
MAIN_QP = 28


def encode_once(frames, qp, timed=False, keep_stream=None):
    """Encode the full sequence at one QP; return (fps, psnr_y, kbps)."""
    enc = H264Encoder(
        EncoderConfig(
            width=352, height=288, qp=qp, fast=True, b_frames=1,
            entropy="cabac", num_ref_frames=5, search_range=28,
            weighted_pred=True,
        )
    )
    # ref-list length grows 1->num_ref_frames over the first GOPs; each
    # length is its own jit specialization -> time only past warmup
    warmup = 14
    nalus = list(enc.headers())
    bits = 8 * sum(len(nl.rbsp) + 5 for nl in nalus)
    n = t0 = 0
    timed_n = 0
    for k, out in enumerate(enc.encode_stream(frames)):
        bits += sum(8 * (len(nl.rbsp) + 5) for nl in out)
        nalus.extend(out)
        n += 1
        if timed and k + 1 == warmup:
            t0 = time.time()
        elif timed and k + 1 > warmup:
            timed_n += 1
    fps = timed_n / (time.time() - t0) if timed else 0.0
    if keep_stream is not None:
        from h264_tpu.bitstream import write_annexb

        keep_stream.append(write_annexb(nalus))
    recs = {}
    for poc, pl in enc.all_recons:
        recs.setdefault(poc, pl)
    # every coded picture's recon is recorded; POC = 2 * display index
    # (single IDR at frame 0), so map each recon to its true source frame
    assert len(recs) == n, f"recon bookkeeping lost pictures: {len(recs)}/{n}"
    ys = [psnr(np.asarray(pl.Y), frames[poc // 2][0])
          for poc, pl in sorted(recs.items())]
    return fps, float(np.mean(ys)), bits * 30.0 / n / 1000.0


def decode_fps(stream: bytes, n_pics: int) -> float:
    """Decode throughput on our own QP-28 stream: native CABAC parse +
    native full-picture reconstruction (the host runtime path; the
    device path remains for TPU-batched reconstruction)."""
    from h264_tpu.decoder.decoder import decode_annexb

    decode_annexb(stream)  # warmup (builds native libs on first use)
    t0 = time.time()
    pics = decode_annexb(stream)
    dt = time.time() - t0
    assert len(pics) == n_pics
    return n_pics / dt


def main():
    frames = make_sequence(100)
    ours = {}
    fps28 = 0.0
    stream28: list = []
    for qp in QPS:
        fps, py, kbps = encode_once(
            frames, qp, timed=(qp == MAIN_QP),
            keep_stream=stream28 if qp == MAIN_QP else None)
        ours[qp] = (py, kbps)
        if qp == MAIN_QP:
            fps28 = fps
    dec_fps = decode_fps(stream28[0], len(frames))
    ref = {p["qp"]: (p["psnr_y"], p["kbps"], p["fps"]) for p in REF["points"]}
    bd = bd_rate(
        [ref[q][1] for q in QPS], [ref[q][0] for q in QPS],
        [ours[q][1] for q in QPS], [ours[q][0] for q in QPS],
    )
    print(
        json.dumps(
            {
                "metric": "encode_fps_cif_main",
                "value": round(fps28, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps28 / ref[MAIN_QP][2], 3),
                "bd_rate_vs_lencod_pct": round(bd, 2),
                "decode_fps_cif": round(dec_fps, 2),
                "psnr_y_db": round(ours[MAIN_QP][0], 2),
                "kbps_at_30fps": round(ours[MAIN_QP][1], 1),
                "lencod_qp28": f"{ref[MAIN_QP][2]}fps/{ref[MAIN_QP][0]}dB/"
                f"{ref[MAIN_QP][1]}kbps",
                "config": "benchseq 100f CIF, CABAC+B qp{24,28,32,36}, "
                "BD over 4 QPs",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
