"""Profile the fast P-frame encode path: device vs host-tail breakdown."""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder

raw = open("/root/reference/bin/foreman_part_qcif.yuv", "rb").read()
W, H = 176, 144
frames = []
for i in range(3):
    off = i * (W * H * 3 // 2)
    Y = np.frombuffer(raw[off:off + W * H], np.uint8).reshape(H, W)
    U = np.frombuffer(raw[off + W * H:off + W * H + W * H // 4], np.uint8).reshape(H // 2, W // 2)
    V = np.frombuffer(raw[off + W * H + W * H // 4:off + W * H * 3 // 2], np.uint8).reshape(H // 2, W // 2)
    frames.append((Y, U, V))

enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, fast=True))
enc.headers()
enc.encode_frame(frames[0], True)
enc.encode_frame(frames[1], False)

import cProfile, pstats
pr = cProfile.Profile()
pr.enable()
t0 = time.time()
for k in range(20):
    enc.encode_frame(frames[(k + 2) % 3], False)
dt = time.time() - t0
pr.disable()
print(f"20 P frames: {dt:.3f}s = {20/dt:.2f} fps")
stats = pstats.Stats(pr)
stats.sort_stats("cumulative").print_stats(25)
