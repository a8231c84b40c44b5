#!/usr/bin/env python
"""Diff our CABAC slice parse against the reference decoder's TRACE output.

Usage: python tools/compare_trace.py [stream.264] [trace_dec.txt] [max_slices]

Parses each slice of the stream with CabacSliceParser and compares the
emitted SE sequence value-by-value with the JM trace (the reference
debugging methodology, SURVEY.md §4.3).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from h264_tpu.bitstream import iter_annexb_nalus
from h264_tpu.syntax import parse_pps, parse_sps, parse_slice_header
from h264_tpu.decoder.cabac_mb import CabacSliceParser
from h264_tpu.decoder.state import PictureParseState

RE_SE = re.compile(r"^@\d+\s+(\S.*?)\s+\(\s*(-?\d+)\)\s*$")
RE_COEFF = re.compile(r"^@\d+\s+(\S.*?)\s+(-?\d+)\s+(\d+)\s*$")
RE_MB = re.compile(r"^\*+ POC: (-?\d+) .* MB: (\d+) Slice: (\d+) Type (\d+)")


def parse_trace(path: str):
    """Returns list of per-picture SE lists: (name, values...) tuples."""
    pics = []
    cur = None
    cur_first_mb = None
    for line in open(path, errors="replace"):
        line = line.rstrip("\n")
        m = RE_MB.match(line)
        if m:
            mb = int(m.group(2))
            if cur is None or (mb == 0 or (cur_first_mb is not None and mb < cur_first_mb)):
                cur = []
                pics.append(cur)
            cur_first_mb = mb
            cur.append(("__MB__", mb))
            continue
        if cur is None:
            continue
        if line.startswith("@") and " SH: " in line:
            continue
        m = RE_SE.match(line)
        if m:
            name = m.group(1).strip()
            if name.startswith(("SPS:", "PPS:", "SH:", "SEI")):
                continue
            cur.append((name, int(m.group(2))))
            continue
        m = RE_COEFF.match(line)
        if m:
            cur.append((m.group(1).strip(), int(m.group(2)), int(m.group(3))))
    return pics


def main():
    stream_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/bin/test.264"
    trace_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jmtrace/bin/trace_dec.txt"
    max_slices = int(sys.argv[3]) if len(sys.argv) > 3 else 99
    data = open(stream_path, "rb").read()
    nalus = list(iter_annexb_nalus(data))
    sps_map, pps_map = {}, {}
    sps = pps = None
    ref_pics = parse_trace(trace_path)
    pic_idx = 0
    for n in nalus:
        if n.nal_unit_type == 7:
            s = parse_sps(n.rbsp)
            sps_map[s.seq_parameter_set_id] = s
        elif n.nal_unit_type == 8:
            p = parse_pps(n.rbsp)
            pps_map[p.pic_parameter_set_id] = p
        elif n.is_slice:
            if pic_idx >= max_slices:
                break
            sh, sps, pps = parse_slice_header(
                n.rbsp, sps_map, pps_map, n.nal_ref_idc, n.is_idr
            )
            state = PictureParseState(sps.pic_width_in_mbs, sps.frame_height_in_mbs)
            parser = CabacSliceParser(n.rbsp, sh, sps, pps, state, 0)
            err = None
            try:
                decoded = parser.parse()
            except Exception as e:
                import traceback

                err = traceback.format_exc()
                decoded = []
            mine = parser.trace
            ref = [t for t in ref_pics[pic_idx] if t[0] != "__MB__"] if pic_idx < len(ref_pics) else []
            # compare value sequences
            n_ok = 0
            mismatch = None
            for i in range(max(len(mine), len(ref))):
                a = mine[i] if i < len(mine) else None
                b = ref[i] if i < len(ref) else None
                va = a[1:] if a else None
                vb = b[1:] if b else None
                if va != vb:
                    mismatch = (i, a, b)
                    break
                n_ok += 1
            # JM omits the final end_of_slice_flag from the trace
            if (
                mismatch
                and mismatch[2] is None
                and mismatch[1] is not None
                and mismatch[1][0] == "end_of_slice_flag"
                and mismatch[0] == len(mine) - 1
            ):
                mismatch = None
            status = "OK" if mismatch is None and not err else "FAIL"
            print(
                f"slice {pic_idx}: type={sh.slice_type.name} MBs={len(decoded)} "
                f"SEs mine={len(mine)} ref={len(ref)} matched={n_ok} -> {status}"
            )
            if mismatch:
                i, a, b = mismatch
                lo = max(0, i - 6)
                print("  context (mine vs ref):")
                for k in range(lo, min(i + 4, max(len(mine), len(ref)))):
                    am = mine[k] if k < len(mine) else None
                    bm = ref[k] if k < len(ref) else None
                    mark = "  <-- MISMATCH" if k == i else ""
                    print(f"   [{k}] {am}  |  {bm}{mark}")
            if err:
                print(err)
            pic_idx += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
