#!/usr/bin/env python
"""Diff our CAVLC writer's SE emission against the reference decoder's
TRACE output on our own stream (encoder debugging harness)."""
import re, sys
sys.path.insert(0, ".")
import numpy as np

def parse_jm(path):
    out = []
    re_ct = re.compile(r"# c & tr\.1s.*#c=(\d+) #t1=(\d+)")
    re_val = re.compile(r"^@\d+\s+(\S.*?)\s+[01]*\s*\(\s*(-?\d+)\)\s*$")
    for line in open(path, errors="replace"):
        line = line.rstrip()
        if not line.startswith("@"):
            continue
        m = re_ct.search(line)
        if m:
            out.append(("ct", int(m.group(1)), int(m.group(2))))
            continue
        if "trailing ones sign" in line:
            v = int(line.rsplit("(", 1)[1].rstrip(") ").strip())
            out.append(("t1sign", v)); continue
        if re.search(r"\blev\b", line):
            v = int(line.rsplit("(", 1)[1].rstrip(") ").strip())
            out.append(("lev", v)); continue
        if "totalrun" in line:
            v = int(line.rsplit("(", 1)[1].rstrip(") ").strip())
            out.append(("totzeros", v)); continue
        if re.search(r"\brun\b", line) and "totalrun" not in line:
            v = int(line.rsplit("(", 1)[1].rstrip(") ").strip())
            out.append(("run", v)); continue
        m = re_val.match(line)
        if m:
            name, v = m.group(1).strip(), int(m.group(2))
            if name == "mb_type":
                out.append(("mb_type", v))
            elif name == "intra4x4_pred_mode":
                out.append(("ipred", v))
            elif name == "intra_chroma_pred_mode":
                out.append(("cipred", v))
            elif name == "coded_block_pattern":
                out.append(("cbp_code", v))
            elif name in ("mb_qp_delta", "Delta quant"):
                out.append(("dquant", v))
            elif name == "mb_skip_run":
                out.append(("skiprun", v))
            elif name.startswith("mvd"):
                out.append(("mvd", v))
            elif name == "ref_idx_l0":
                out.append(("ref", v))
            elif name == "sub_mb_type":
                out.append(("sub", v))
    return out

mine_path, jm_path = sys.argv[1], sys.argv[2]
import pickle
mine = pickle.load(open(mine_path, "rb"))
jm = parse_jm(jm_path)
print(f"mine={len(mine)} jm={len(jm)}")
for i in range(max(len(mine), len(jm))):
    a = mine[i] if i < len(mine) else None
    b = jm[i] if i < len(jm) else None
    # cbp: JM traces the decoded cbp VALUE in ( ) - map ours
    if a and b and a[0] == "cbp" and b[0] == "cbp_code":
        ok = a[1] == b[1]
    else:
        ok = a == b
    if not ok:
        lo = max(0, i - 6)
        for k in range(lo, min(i + 5, max(len(mine), len(jm)))):
            am = mine[k] if k < len(mine) else None
            bm = jm[k] if k < len(jm) else None
            print(f" [{k}] {am} | {bm}" + ("   <-- MISMATCH" if k == i else ""))
        break
else:
    print("ALL MATCH")
