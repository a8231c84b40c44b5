"""Macroblock-layer semantic tables shared by decoder and encoder.

Mode numbering follows the JM internal scheme (SURVEY.md §2: ldecod
interpret_mb_mode_*, SetB8Mode) because the CABAC/CAVLC binarizations are
defined against it.  Scan orders are the spec zig-zag tables.
"""

from __future__ import annotations

import numpy as np

# internal macroblock modes (JM defines.h values)
PSKIP = 0
P16x16 = 1
P16x8 = 2
P8x16 = 3
P8x8 = 8
I4MB = 9
I16MB = 10
IBLOCK = 11
SI4MB = 12
I8MB = 13
IPCM = 14
BSKIP_DIRECT = 0

# block-8x8 sub-modes (b8mode values)
B8_DIRECT = 0
B8_8x8 = 4
B8_8x4 = 5
B8_4x8 = 6
B8_4x4 = 7

# prediction directions (b8pdir)
PD_L0 = 0
PD_L1 = 1
PD_BI = 2
PD_INTRA = -1

# I16MB cbp table indexed by (mb_type_offset >> 2): chroma cbp*16 + luma cbp
I16_CBP_TAB = (0, 16, 32, 15, 31, 47)

# sub_mb_type value -> (b8mode, b8pdir)
SUB_MB_P = [(B8_8x8, 0), (B8_8x4, 0), (B8_4x8, 0), (B8_4x4, 0), (IBLOCK, -1)]
SUB_MB_B = [
    (B8_DIRECT, 2), (B8_8x8, 0), (B8_8x8, 1), (B8_8x8, 2),
    (B8_8x4, 0), (B8_4x8, 0), (B8_8x4, 1), (B8_4x8, 1),
    (B8_8x4, 2), (B8_4x8, 2), (B8_4x4, 0), (B8_4x4, 1),
    (B8_4x4, 2), (IBLOCK, -1),
]

# B-slice mb_type -> (mbmode, pdir per 8x8); decoded per interpret_mb_mode_B
B_PDIR_16x16 = (0, 0, 1, 2)  # mbtype 0..3 (0 unused: direct)
B_PDIR_16x8 = {
    4: (0, 0), 6: (1, 1), 8: (0, 1), 10: (1, 0), 12: (0, 2), 14: (1, 2),
    16: (2, 0), 18: (2, 1), 20: (2, 2),
}
B_PDIR_8x16 = {
    5: (0, 0), 7: (1, 1), 9: (0, 1), 11: (1, 0), 13: (0, 2), 15: (1, 2),
    17: (2, 0), 19: (2, 1), 21: (2, 2),
}

# 4x4 zig-zag scan: scan index -> (x, y) within the block (spec Table 8-13)
ZZ_SCAN_4x4 = np.array(
    [
        (0, 0), (1, 0), (0, 1), (0, 2), (1, 1), (2, 0), (3, 0), (2, 1),
        (1, 2), (0, 3), (1, 3), (2, 2), (3, 1), (3, 2), (2, 3), (3, 3),
    ],
    dtype=np.int32,
)

# The normative 8x8 zig-zag scan index -> (x, y)  (spec §8.5.6)
ZZ_SCAN_8x8 = np.array(
    [
        (0, 0), (1, 0), (0, 1), (0, 2), (1, 1), (2, 0), (3, 0), (2, 1),
        (1, 2), (0, 3), (0, 4), (1, 3), (2, 2), (3, 1), (4, 0), (5, 0),
        (4, 1), (3, 2), (2, 3), (1, 4), (0, 5), (0, 6), (1, 5), (2, 4),
        (3, 3), (4, 2), (5, 1), (6, 0), (7, 0), (6, 1), (5, 2), (4, 3),
        (3, 4), (2, 5), (1, 6), (0, 7), (1, 7), (2, 6), (3, 5), (4, 4),
        (5, 3), (6, 2), (7, 1), (7, 2), (6, 3), (5, 4), (4, 5), (3, 6),
        (2, 7), (3, 7), (4, 6), (5, 5), (6, 4), (7, 3), (7, 4), (6, 5),
        (5, 6), (4, 7), (5, 7), (6, 6), (7, 5), (7, 6), (6, 7), (7, 7),
    ],
    dtype=np.int32,
)

# Field (interlace) coefficient scans: scan index -> (x, y)
# (spec Table 8-13 field scan / §8.5.6 8x8 field scan)
FIELD_SCAN_4x4 = np.array(
    [
        (0, 0), (0, 1), (1, 0), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3),
        (2, 0), (2, 1), (2, 2), (2, 3), (3, 0), (3, 1), (3, 2), (3, 3),
    ],
    dtype=np.int32,
)
FIELD_SCAN_8x8 = np.array(
    [
        (0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (0, 3), (0, 4), (1, 2),
        (2, 0), (1, 3), (0, 5), (0, 6), (0, 7), (1, 4), (2, 1), (3, 0),
        (2, 2), (1, 5), (1, 6), (1, 7), (2, 3), (3, 1), (4, 0), (3, 2),
        (2, 4), (2, 5), (2, 6), (2, 7), (3, 3), (4, 1), (5, 0), (4, 2),
        (3, 4), (3, 5), (3, 6), (3, 7), (4, 3), (5, 1), (6, 0), (5, 2),
        (4, 4), (4, 5), (4, 6), (4, 7), (5, 3), (6, 1), (6, 2), (5, 4),
        (5, 5), (5, 6), (5, 7), (6, 3), (7, 0), (7, 1), (6, 4), (6, 5),
        (6, 6), (6, 7), (7, 2), (7, 3), (7, 4), (7, 5), (7, 6), (7, 7),
    ],
    dtype=np.int32,
)

# 4x4-block raster position within MB for block index 0..15 (2-level Z order):
# blk -> (x4, y4) in 4x4-block units
BLK4_TO_XY = np.array(
    [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
     (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3)],
    dtype=np.int32,
)
# inverse: (y4, x4) -> block index
XY_TO_BLK4 = np.zeros((4, 4), np.int32)
for _b, (_x, _y) in enumerate(BLK4_TO_XY):
    XY_TO_BLK4[_y, _x] = _b

# 8x8 block index -> (x8, y8)
BLK8_TO_XY = np.array([(0, 0), (1, 0), (0, 1), (1, 1)], dtype=np.int32)

# JM CABAC residual block types (ldecod/inc/defines.h:67-88)
LUMA_16DC = 0
LUMA_16AC = 1
LUMA_8x8 = 2
LUMA_8x4 = 3
LUMA_4x8 = 4
LUMA_4x4 = 5
CHROMA_DC = 6
CHROMA_AC = 7
CHROMA_DC_2x4 = 8
CHROMA_DC_4x4 = 9
CB_16DC = 10
CB_16AC = 11
CB_8x8 = 12
CB_8x4 = 13
CB_4x8 = 14
CB_4x4 = 15
CR_16DC = 16
CR_16AC = 17
CR_8x8 = 18
CR_8x4 = 19
CR_4x8 = 20
CR_4x4 = 21
