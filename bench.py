#!/usr/bin/env python
"""Benchmark: CIF Main-profile encode throughput on the real device
(driver contract: prints ONE JSON line {"metric", "value", "unit",
"vs_baseline"}).

Measures steady-state encode fps at CIF (352x288) with the Main-profile
toolset (CABAC + B pictures, temporal direct) on foreman content upsampled
2x — the BASELINE.md target config.  Baseline denominator: lencod (JM
12.4) with encoder_main.cfg at CIF/30 frames measured on this machine =
0.44 fps (RDO on, FastFullSearch, 5 refs, search range 32; QP 28/28/30;
PSNR-Y 38.98 dB @ 119.4 kb/s on the same content).
"""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder

LENCOD_CIF_MAIN_FPS = 0.44  # measured on this machine (BASELINE.md)


def load_frames_cif(n):
    raw = open("/root/reference/bin/foreman_part_qcif.yuv", "rb").read()
    W, H = 176, 144
    frames = []
    for i in range(3):
        off = i * (W * H * 3 // 2)
        Y = np.frombuffer(raw[off : off + W * H], np.uint8).reshape(H, W)
        U = np.frombuffer(
            raw[off + W * H : off + W * H * 5 // 4], np.uint8
        ).reshape(H // 2, W // 2)
        V = np.frombuffer(
            raw[off + W * H * 5 // 4 : off + W * H * 3 // 2], np.uint8
        ).reshape(H // 2, W // 2)
        up = lambda p: np.repeat(np.repeat(p, 2, 0), 2, 1)
        frames.append((up(Y), up(U), up(V)))
    return [frames[i % 3] for i in range(n)]


def psnr(a, b):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    mse = (d * d).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


def main():
    n_frames = 80
    # the reference-list length grows 1->num_ref_frames over the first
    # GOPs and each length is its own jit specialization: warm past all
    # of them before timing
    warmup = 14
    frames = load_frames_cif(n_frames)
    enc = H264Encoder(
        EncoderConfig(
            width=352, height=288, qp=28, fast=True, b_frames=1,
            entropy="cabac", num_ref_frames=3, search_range=16,
        )
    )
    enc.headers()
    bits = 0
    n = 0
    t0 = None
    recs = {}
    for k, out in enumerate(enc.encode_stream(frames)):
        for poc, pl in enc.all_recons:
            recs.setdefault(poc, pl)
        for e in enc.recon_pics:
            recs.setdefault(e[0], e[1])
        if k + 1 == warmup:
            t0 = time.time()
            continue
        if k + 1 < warmup:
            continue
        bits += sum(8 * (len(nl.rbsp) + 5) for nl in out)
        n += 1
    dt = time.time() - t0
    fps = n / dt
    ys = [
        psnr(recs[poc].Y, frames[i][0])
        for i, poc in enumerate(sorted(recs))
        if poc in recs
    ]
    print(
        json.dumps(
            {
                "metric": "encode_fps_cif_main",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / LENCOD_CIF_MAIN_FPS, 3),
                "psnr_y_db": round(float(np.mean(ys)), 2),
                "kbps_at_30fps": round(bits * 30.0 / n / 1000.0, 1),
                "config": "CIF CABAC+B qp28, lencod_main=0.44fps/38.98dB/119.4kbps",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
