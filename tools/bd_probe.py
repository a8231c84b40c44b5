#!/usr/bin/env python
"""Fast BD-rate probe for encoder-quality experiments.

Encodes the deterministic bench sequence at the 4 bench QPs with config
overrides from the command line and prints the BD-rate vs the stored
lencod curve (tools/bench_ref.json).  Use -n to shorten the sequence for
quick iteration (BD then compared against a lencod curve regenerated for
that length would be ideal; for RELATIVE comparisons between our own
configs the stored 100-frame curve is still a consistent yardstick only
at -n 100).

    python tools/bd_probe.py num_ref_frames=5 search_range=32
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder
from h264_tpu.tools.benchseq import bd_rate, make_sequence, psnr

REF = json.loads(
    (pathlib.Path(__file__).parent / "bench_ref.json").read_text())


def encode_once(frames, qp, over):
    cfg = dict(width=352, height=288, qp=qp, fast=True, b_frames=1,
               entropy="cabac", num_ref_frames=3, search_range=24,
               weighted_pred=True)
    cfg.update(over)
    enc = H264Encoder(EncoderConfig(**cfg))
    nalus = list(enc.headers())
    bits = 8 * sum(len(nl.rbsp) + 5 for nl in nalus)
    n = 0
    t0 = time.time()
    for out in enc.encode_stream(frames):
        bits += sum(8 * (len(nl.rbsp) + 5) for nl in out)
        n += 1
    dt = time.time() - t0
    recs = {}
    for poc, pl in enc.all_recons:
        recs.setdefault(poc, pl)
    assert len(recs) == n
    ys = [psnr(np.asarray(pl.Y), frames[poc // 2][0])
          for poc, pl in sorted(recs.items())]
    return float(np.mean(ys)), bits * 30.0 / n / 1000.0, n / dt


def main():
    over = {}
    nf = 100
    qps = [24, 28, 32, 36]
    for a in sys.argv[1:]:
        k, v = a.split("=", 1)
        if k == "n":
            nf = int(v)
            continue
        if k == "qps":
            qps = [int(x) for x in v.split(",")]
            continue
        try:
            v = int(v)
        except ValueError:
            if v in ("True", "False"):
                v = v == "True"
        over[k] = v
    frames = make_sequence(nf)
    ours = {}
    for qp in qps:
        py, kbps, fps = encode_once(frames, qp, over)
        ours[qp] = (py, kbps)
        print(f"  qp={qp}: {py:.3f} dB  {kbps:.1f} kbps  {fps:.2f} fps",
              flush=True)
    ref = {p["qp"]: (p["psnr_y"], p["kbps"]) for p in REF["points"]}
    use = [q for q in qps if q in ref]
    if len(use) >= 3:
        bd = bd_rate([ref[q][1] for q in use], [ref[q][0] for q in use],
                     [ours[q][1] for q in use], [ours[q][0] for q in use])
        print(f"BD-rate vs lencod over qp{use}: {bd:+.2f}%")
    print(json.dumps({str(q): ours[q] for q in qps}))


if __name__ == "__main__":
    main()
