#!/usr/bin/env python
"""Generate h264_tpu/entropy/cabac/tables.py from the normative CABAC
constants (ITU-T Rec. H.264 §9.3.1.1 context-init tables 9-12..9-33,
§9.3.3.2 rangeTabLPS / state transition tables).

The numeric values are defined by the standard; we extract them from the
reference tree's copy of the standard tables (ldecod/inc/ctx_tables.h,
ldecod/src/biaridecod.c) and re-emit them in our own layout: a dict of
numpy arrays keyed by syntax-element group, shaped (n_models, ii, jj, 2).

Usage:  python tools/gen_cabac_tables.py
"""

from __future__ import annotations

import re
import sys

REF = "/root/reference"


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    text = text.replace("CTX_UNUSED", "{0,64}")  # placeholder macro
    return text


def parse_braced(tokens: str):
    """Parse a C initializer {...} into nested Python lists of ints."""
    pos = 0

    def parse():
        nonlocal pos
        while tokens[pos] in " \n\t,":
            pos += 1
        if tokens[pos] == "{":
            pos += 1
            items = []
            while True:
                while tokens[pos] in " \n\t,":
                    pos += 1
                if tokens[pos] == "}":
                    pos += 1
                    return items
                items.append(parse())
        m = re.match(r"-?\d+", tokens[pos:])
        if not m:
            raise ValueError(f"parse error at {tokens[pos:pos+40]!r}")
        pos += m.end()
        return int(m.group())

    return parse()


def extract_arrays(path: str, pattern: str):
    """Yield (name, dims, nested_list) for arrays matching regex `pattern`."""
    text = strip_comments(open(path).read())
    for m in re.finditer(pattern, text):
        name = m.group("name")
        dims = [int(d) for d in re.findall(r"\[(\d+)\]", m.group(0))]
        # find the initializer block
        start = text.index("{", m.end() - 1)
        depth = 0
        for i in range(start, len(text)):
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
                if depth == 0:
                    yield name, dims, parse_braced(text[start : i + 1])
                    break


def main():
    out = [
        '"""CABAC normative constant tables (GENERATED — do not edit).',
        "",
        "Context initialization (m, n) pairs per syntax-element group and",
        "model (ITU-T Rec. H.264 Tables 9-12..9-33; _I = I/SI-slice table,",
        "_P = P/B tables indexed by cabac_init_idc), plus the arithmetic",
        "engine tables of §9.3.3.2 (rangeTabLPS, transIdxMPS/LPS).",
        "Regenerate with tools/gen_cabac_tables.py.",
        '"""',
        "",
        "import numpy as np",
        "",
    ]

    ctx_path = f"{REF}/ldecod/inc/ctx_tables.h"
    pat = r"static\s+const\s+int\s+(?P<name>INIT_\w+)\s*(\[\d+\])+\s*="
    init_i, init_p = {}, {}
    for name, dims, data in extract_arrays(ctx_path, pat):
        key = name.replace("INIT_", "").rsplit("_", 1)
        group, suffix = key[0], key[1]
        target = init_i if suffix == "I" else init_p
        target[group] = data
        print(f"  {name}: dims {dims}", file=sys.stderr)

    def emit_dict(varname, d):
        out.append(f"{varname} = {{")
        for k, v in sorted(d.items()):
            out.append(f"    {k!r}: np.array({v!r}, dtype=np.int32),")
        out.append("}")
        out.append("")

    emit_dict("INIT_I", init_i)
    emit_dict("INIT_P", init_p)

    eng_path = f"{REF}/ldecod/src/biaridecod.c"
    pat2 = r"const\s+byte\s+(?P<name>rLPS_table_64x4|AC_next_state_MPS_64|AC_next_state_LPS_64)\s*(\[\d+\])+\s*="
    for name, dims, data in extract_arrays(eng_path, pat2):
        pyname = {
            "rLPS_table_64x4": "RANGE_TAB_LPS",
            "AC_next_state_MPS_64": "TRANS_IDX_MPS",
            "AC_next_state_LPS_64": "TRANS_IDX_LPS",
        }[name]
        out.append(f"{pyname} = np.array({data!r}, dtype=np.int32)")
        out.append("")
        print(f"  {name}: dims {dims}", file=sys.stderr)

    # residual-coding helper tables (spec §9.3.3.1.3 ctxIdxInc derivation,
    # Table 9-43 position->ctx maps for 8x8 blocks, JM block-type indexing)
    cab_path = f"{REF}/ldecod/src/cabac.c"
    pat3 = (
        r"static\s+const\s+int\s+(?P<name>maxpos|c1isdc|type2ctx_bcbp|type2ctx_map"
        r"|type2ctx_last|type2ctx_one|type2ctx_abs|max_c2|pos2ctx_map4x4|pos2ctx_map8x8"
        r"|pos2ctx_map8x4|pos2ctx_map2x4c|pos2ctx_map4x4c|pos2ctx_last8x8|pos2ctx_last8x4"
        r"|pos2ctx_last4x4|pos2ctx_last2x4c|pos2ctx_last4x4c)\s*(\[\d*\])+\s*="
    )
    simple = {}
    for name, dims, data in extract_arrays(cab_path, pat3):
        if name not in simple:  # first definition wins (file has dup statics)
            simple[name] = data
    for name in sorted(simple):
        out.append(f"{name.upper()} = np.array({simple[name]!r}, dtype=np.int32)")
        out.append("")
    # pos2ctx dispatch per block type (mirrors the C pointer arrays, frame scan)
    m44, m88, m84 = "POS2CTX_MAP4X4", "POS2CTX_MAP8X8", "POS2CTX_MAP8X4"
    m24c, m44c = "POS2CTX_MAP2X4C", "POS2CTX_MAP4X4C"
    l44, l88, l84 = "POS2CTX_LAST4X4", "POS2CTX_LAST8X8", "POS2CTX_LAST8X4"
    l24c, l44c = "POS2CTX_LAST2X4C", "POS2CTX_LAST4X4C"
    out.append(
        "POS2CTX_MAP = ["
        + ", ".join([m44, m44, m88, m84, m84, m44, m44, m44, m24c, m44c,
                     m44, m44, m88, m84, m84, m44, m44, m44, m88, m84, m84, m44])
        + "]"
    )
    out.append(
        "POS2CTX_LAST = ["
        + ", ".join([l44, l44, l88, l84, l84, l44, l44, l44, l24c, l44c,
                     l44, l44, l88, l84, l84, l44, l44, l44, l88, l84, l84, l44])
        + "]"
    )
    out.append("")

    dest = "h264_tpu/entropy/cabac/tables.py"
    with open(dest, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {dest}", file=sys.stderr)


if __name__ == "__main__":
    main()
