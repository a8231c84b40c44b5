#!/usr/bin/env python
"""Benchmark: encoder frames/s on the real device (driver contract:
prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}).

Measures steady-state IPPP encode throughput at QCIF on foreman (the
reference's own test content), fast device path, QP 28.  Baseline
denominator: lencod (JM 12.4, -d encoder.cfg: High profile, RDO,
FastFullSearch, 5 refs) measured on this machine = 4.32 frames/s
(see BASELINE.md; re-measure with /tmp/jm/bin/lencod.exe).
"""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder

LENCOD_BASELINE_FPS = 4.32  # measured on this machine (BASELINE.md)


def load_frames(n):
    raw = open("/root/reference/bin/foreman_part_qcif.yuv", "rb").read()
    W, H = 176, 144
    frames = []
    for i in range(3):
        off = i * (W * H * 3 // 2)
        Y = np.frombuffer(raw[off : off + W * H], np.uint8).reshape(H, W)
        U = np.frombuffer(
            raw[off + W * H : off + W * H + W * H // 4], np.uint8
        ).reshape(H // 2, W // 2)
        V = np.frombuffer(
            raw[off + W * H + W * H // 4 : off + W * H * 3 // 2], np.uint8
        ).reshape(H // 2, W // 2)
        frames.append((Y, U, V))
    return [frames[i % 3] for i in range(n)]


def main():
    n_frames = 40
    frames = load_frames(n_frames)
    enc = H264Encoder(EncoderConfig(width=176, height=144, qp=28, fast=True))
    nalus = enc.headers()
    n_meas = 0
    bits = 0
    t0 = None
    warmup = 2  # I frame + first P (includes jit compile on cold cache)
    for k, out in enumerate(enc.encode_stream(frames)):
        if k + 1 == warmup:
            t0 = time.time()
            continue
        if k + 1 < warmup:
            continue
        bits += sum(8 * (len(n.rbsp) + 5) for n in out)
        n_meas += 1
    dt = time.time() - t0
    fps = n_meas / dt
    # quality check on the measured segment
    last = enc.recon_pics[-1][1]
    ref_frame = frames[(2 + n_meas - 1) % 3][0].astype(float)
    mse = ((np.asarray(last.Y, float) - ref_frame) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    result = {
        "metric": "encode_fps_qcif_p",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / LENCOD_BASELINE_FPS, 3),
        "psnr_y_db": round(float(psnr), 2),
        "kbps_at_30fps": round(bits / n_meas * 30 / 1000, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
