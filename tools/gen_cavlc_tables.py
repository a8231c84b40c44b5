#!/usr/bin/env python
"""Generate h264_tpu/entropy/cavlc/tables.py from the normative CAVLC
code tables (ITU-T Rec. H.264 Tables 9-5..9-10), extracted from the
reference tree's transcription (lencod/src/vlc.c).

Each table is emitted as (length, code) numpy arrays in our own layout.
"""
import re, sys
sys.path.insert(0, "tools")
from gen_cabac_tables import strip_comments, parse_braced

SRC = "/root/reference/lencod/src/vlc.c"
text = strip_comments(open(SRC).read())

def grab_pair(func_name):
    """Extract the lentab/codtab initializers inside one writer function."""
    i = text.index(func_name)
    seg = text[i : i + 20000]
    out = []
    for name in ("lentab", "codtab"):
        m = re.search(rf"{name}\s*(\[\w+\])+\s*=", seg)
        start = seg.index("{", m.end() - 1)
        depth = 0
        for k in range(start, len(seg)):
            if seg[k] == "{":
                depth += 1
            elif seg[k] == "}":
                depth -= 1
                if depth == 0:
                    out.append(parse_braced(seg[start : k + 1]))
                    break
    return out

coeff_len, coeff_code = grab_pair("int writeSyntaxElement_NumCoeffTrailingOnes(")
cdc_len, cdc_code = grab_pair("int writeSyntaxElement_NumCoeffTrailingOnesChromaDC(")
tz_len, tz_code = grab_pair("int writeSyntaxElement_TotalZeros(")
tzc_len, tzc_code = grab_pair("int writeSyntaxElement_TotalZerosChromaDC(")
run_len, run_code = grab_pair("int writeSyntaxElement_Run(")

def pad(t):
    """Pad ragged C initializers with zeros (C zero-fills omitted entries)."""
    if isinstance(t, list) and t and isinstance(t[0], list):
        t = [pad(r) for r in t]
        n = max(len(r) for r in t)
        def padrow(r):
            if isinstance(r[0], list):
                return r + [[0]*len(r[0])]*(n-len(r))
            return r + [0]*(n-len(r))
        return [padrow(r) for r in t]
    return t

coeff_len, coeff_code = pad(coeff_len), pad(coeff_code)
cdc_len, cdc_code = pad(cdc_len), pad(cdc_code)
tz_len, tz_code = pad(tz_len), pad(tz_code)
tzc_len, tzc_code = pad(tzc_len), pad(tzc_code)
run_len, run_code = pad(run_len), pad(run_code)

out = [
    '"""CAVLC normative code tables (GENERATED - do not edit).',
    "",
    "ITU-T Rec. H.264 Tables 9-5 (coeff_token), 9-7/9-8 (total_zeros),",
    "9-9 (total_zeros chroma DC), 9-10 (run_before).",
    "Layout: *_LEN/*_CODE arrays; coeff_token indexed [vlcnum][t1s][total].",
    "Regenerate with tools/gen_cavlc_tables.py.",
    '"""',
    "",
    f"COEFF_TOKEN_LEN = {coeff_len!r}",
    f"COEFF_TOKEN_CODE = {coeff_code!r}",
    f"COEFF_TOKEN_CDC_LEN = {cdc_len!r}",
    f"COEFF_TOKEN_CDC_CODE = {cdc_code!r}",
    f"TOTAL_ZEROS_LEN = {tz_len!r}",
    f"TOTAL_ZEROS_CODE = {tz_code!r}",
    f"TOTAL_ZEROS_CDC_LEN = {tzc_len!r}",
    f"TOTAL_ZEROS_CDC_CODE = {tzc_code!r}",
    f"RUN_BEFORE_LEN = {run_len!r}",
    f"RUN_BEFORE_CODE = {run_code!r}",
    "",
]
open("h264_tpu/entropy/cavlc/tables.py", "w").write("\n".join(out))
print("wrote cavlc tables", file=sys.stderr)

# append NCBP (CBP <-> codeNum mapping, spec Table 9-4)
text2 = strip_comments(open("/root/reference/lencod/src/vlc.c").read())
m = re.search(r"NCBP\s*\[2\]\[48\]\[2\]\s*=", text2)
start = text2.index("{", m.end() - 1)
depth = 0
for k in range(start, len(text2)):
    if text2[k] == "{":
        depth += 1
    elif text2[k] == "}":
        depth -= 1
        if depth == 0:
            ncbp = parse_braced(text2[start : k + 1])
            break
with open("h264_tpu/entropy/cavlc/tables.py", "a") as f:
    f.write(f"\n# NCBP[chroma_mono_444=0 / 420_422=1][codeNum][intra=0 / inter=1]\n")
    f.write(f"NCBP = {ncbp!r}\n")
print("appended NCBP", file=sys.stderr)
