#!/usr/bin/env python
"""Measure the lencod (JM) baseline on the deterministic bench sequence.

Runs /tmp/jm/bin/lencod.exe with encoder_main.cfg semantics (CABAC, 1 B
frame, RDO, FastFullSearch, 5 refs, SR 32) on the exact same YUV file
bench.py feeds our encoder, at QP {24,28,32,36}, and stores the
(kbps, PSNR, fps) points in tools/bench_ref.json.  One-time per machine:
bench.py only *reads* the stored curve (lencod's numbers are fixed for
fixed content+config, so re-running it inside the bench would waste the
bench budget).
"""

import json
import pathlib
import re
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from h264_tpu.tools.benchseq import make_sequence, write_yuv

LENCOD = "/tmp/jm/bin/lencod.exe"
# JM 12.4 inserts B pictures into skipped source slots: FrameSkip=1 +
# NumberBFrames=1 codes every source frame as I (B P)*.  50 anchors
# consume sources 0..98 -> 99 coded pictures.
N_ANCHORS = 50
N_CODED = 2 * N_ANCHORS - 1
QPS = [24, 28, 32, 36]


def run_qp(yuv, qp, workdir):
    wd = pathlib.Path(workdir)
    wd.mkdir(parents=True, exist_ok=True)
    args = [
        LENCOD,
        "-d", "/tmp/jm/bin/encoder_main.cfg",
        "-p", f"InputFile={yuv}",
        "-p", "SourceWidth=352",
        "-p", "SourceHeight=288",
        "-p", f"FramesToBeEncoded={N_ANCHORS}",
        "-p", "FrameSkip=1",
        "-p", f"QPISlice={qp}",
        "-p", f"QPPSlice={qp}",
        "-p", f"QPBSlice={qp + 2}",
        "-p", "OutputFile=out.264",
        "-p", "ReconFile=rec.yuv",
        "-p", "LeakyBucketParamFile=lk.cfg",
    ]
    t0 = time.time()
    proc = subprocess.run(
        args, cwd=wd, capture_output=True, text=True, timeout=3600
    )
    dt = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"lencod qp={qp} rc={proc.returncode}\n{proc.stdout}\n{proc.stderr}")
    txt = proc.stdout
    psnr_y = float(re.search(r"SNR Y\(dB\)\s*[:|]\s*([\d.]+)", txt).group(1))
    kbps = float(re.search(r"Bit rate \(kbit/s\)\s*[:|@]*[^:]*:\s*([\d.]+)", txt).group(1))
    bits = (wd / "out.264").stat().st_size * 8
    return {
        "qp": qp,
        "psnr_y": psnr_y,
        "kbps": kbps,
        "kbps_from_file": round(bits * 30.0 / N_CODED / 1000.0, 2),
        "fps": round(N_CODED / dt, 4),
        "seconds": round(dt, 1),
    }


def main():
    yuv = "/tmp/bench_cif.yuv"
    if not pathlib.Path(yuv).exists():
        write_yuv(make_sequence(100), yuv)
    pts = []
    for qp in QPS:
        pt = run_qp(yuv, qp, f"/tmp/jmbench/qp{qp}")
        print(pt, flush=True)
        pts.append(pt)
    out = {
        "content": "benchseq.make_sequence(100) CIF, seed 7",
        "config": "encoder_main.cfg, FrameSkip=1 (B in skipped slots), QPB=QP+2",
        "n_coded": N_CODED,
        "points": pts,
    }
    ref = pathlib.Path(__file__).parent / "bench_ref.json"
    ref.write_text(json.dumps(out, indent=1))
    print(f"wrote {ref}")


if __name__ == "__main__":
    main()
