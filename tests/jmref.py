"""JM reference-binary helpers for round-trip tests.

The BASELINE.json acceptance gate: streams produced by our encoder must
decode bit-exactly through the reference decoder (`ldecod.exe`, built
from /root/reference per .claude/skills/verify), and its output must
equal our encoder's own reconstruction. Tests using these helpers skip
when the binary is absent so the suite stays runnable anywhere.
"""

from __future__ import annotations

import pathlib
import subprocess
import tempfile

import numpy as np

LDECOD = pathlib.Path("/tmp/jm/bin/ldecod.exe")

_DECODER_CFG = """\
{stream}                 ........H.264/AVC coded bitstream
{out}                    ........Output file, YUV/RGB
{ref}                    ........Ref sequence (for SNR)
1                        ........Write 4:2:0 chroma components for monochrome streams
0                        ........NAL mode (0=Annex B, 1: RTP packets)
0                        ........SNR computation offset
2                        ........Poc Scale (1 or 2)
500000                   ........Rate_Decoder
104000                   ........B_decoder
73000                    ........F_decoder
leakybucketparam.cfg     ........LeakyBucket Params
0                        ........Err Concealment(0:Off,1:Frame Copy,2:Motion Copy)
2                        ........Reference POC gap (2: IPP (Default), 4: IbP / IpP)
2                        ........POC gap (2: IPP /IbP/IpP (Default), 4: IPP with frame skip = 1 etc.)
1                        ........Silent decode
"""


def have_ldecod() -> bool:
    return LDECOD.exists()


def jm_decode(stream: bytes, timeout: float = 120.0) -> bytes:
    """Decode an Annex-B stream with the reference ldecod; returns the
    raw 4:2:0 output bytes (display order). Raises on decoder failure."""
    with tempfile.TemporaryDirectory() as td:
        tdp = pathlib.Path(td)
        (tdp / "in.264").write_bytes(stream)
        (tdp / "dec.cfg").write_text(
            _DECODER_CFG.format(stream="in.264", out="out.yuv", ref="in.264")
        )
        proc = subprocess.run(
            [str(LDECOD), "dec.cfg"],
            cwd=td,
            capture_output=True,
            text=True,
            timeout=timeout,
        )
        out = tdp / "out.yuv"
        if proc.returncode != 0 or not out.exists():
            raise RuntimeError(
                f"ldecod failed rc={proc.returncode}\n"
                f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
            )
        return out.read_bytes()


def pack_yuv420(planes_list) -> bytes:
    """Concatenate (Y, U, V) int arrays into raw 4:2:0 bytes."""
    chunks = []
    for Y, U, V in planes_list:
        for p in (Y, U, V):
            chunks.append(np.asarray(p).astype(np.uint8).tobytes())
    return b"".join(chunks)
