"""Per-picture parse state and neighbor topology (frame coding).

The TPU-native analog of the reference's mb_access.c + Macroblock struct
fields that parsing depends on: everything lives in flat numpy arrays
indexed by MB address / 4x4-block coordinates so the reconstruction stage
can consume them as whole-frame tensors.

Neighbor model (non-MBAFF frames, spec §6.4.8): mbA = addr-1 unless at
left edge; mbB = addr-W unless at top; availability additionally requires
the neighbor to belong to the same slice (for parse contexts) — the JM
`mb_is_available` rule (ldecod/src/mb_access.c).
"""

from __future__ import annotations

import numpy as np

from .mbtables import XY_TO_BLK4


class PictureParseState:
    """Arrays of per-MB / per-4x4-block syntax info filled during parse."""

    def __init__(self, width_mbs: int, height_mbs: int):
        W, H = width_mbs, height_mbs
        self.W, self.H = W, H
        self.n_mbs = W * H
        nb = self.n_mbs
        self.mb_type = np.full(nb, -1, np.int32)  # JM internal mode (I4MB...)
        self.raw_mb_type = np.full(nb, -1, np.int32)  # coded value
        self.slice_id = np.full(nb, -1, np.int32)
        self.qp = np.zeros(nb, np.int32)
        self.qpc = np.zeros((nb, 2), np.int32)  # chroma qp (cb, cr)
        self.cbp = np.zeros(nb, np.int32)
        self.cbp_bits = [0] * nb  # python ints, 64-bit bitmaps (CABAC ctx)
        self.cbp_blk = [0] * nb  # per-4x4 "has coeffs" raster bitmap (deblock)
        self.lf_disable = np.zeros(nb, np.int32)
        self.lf_alpha = np.zeros(nb, np.int32)
        self.lf_beta = np.zeros(nb, np.int32)
        # ref_pic_id per list per 4x4 block (filled by MV derivation)
        self.ref_pic_id = np.full((2, 4 * H, 4 * W), -(10**9), np.int64)
        self.is_intra = np.zeros(nb, np.uint8)
        self.transform8x8 = np.zeros(nb, np.uint8)
        self.skip_flag = np.zeros(nb, np.uint8)
        self.c_ipred_mode = np.zeros(nb, np.int32)
        self.i16mode = np.full(nb, -1, np.int32)
        self.b8mode = np.zeros((nb, 4), np.int32)
        self.b8pdir = np.zeros((nb, 4), np.int32)
        self.intra_decoded = np.zeros(nb, np.uint8)  # for constrained_intra

        # per-4x4-block arrays in picture block coordinates [4H, 4W]
        self.ipredmode = np.full((4 * H, 4 * W), -1, np.int8)
        self.mvd = np.zeros((2, 4 * H, 4 * W, 2), np.int32)
        self.ref_idx = np.full((2, 4 * H, 4 * W), -1, np.int8)
        self.mv = np.zeros((2, 4 * H, 4 * W, 2), np.int32)

        # residual levels, raster within each block
        self.luma_levels = np.zeros((nb, 16, 4, 4), np.int32)  # 4x4 blocks
        self.luma8_levels = np.zeros((nb, 4, 8, 8), np.int32)  # 8x8 blocks
        self.luma_dc = np.zeros((nb, 4, 4), np.int32)  # I16MB DC hadamard lv
        self.chroma_dc = np.zeros((nb, 2, 2, 2), np.int32)  # 4:2:0 per plane
        self.chroma_levels = np.zeros((nb, 2, 4, 4, 4), np.int32)  # per plane, 2x2 blks
        # CAVLC total_coeff per 4x4 block: plane 0 luma (+16 cb, +32 cr...)
        self.nnz = np.zeros((3, 4 * H, 4 * W), np.uint8)
        self.ipcm_samples = {}  # mb_addr -> (luma[16,16], cb, cr) for IPCM

    # -- MB-level neighbors ------------------------------------------------
    def mb_avail(self, addr: int, cur_addr: int) -> bool:
        """JM mb_is_available: exists and in same slice as cur."""
        if addr < 0 or addr >= self.n_mbs:
            return False
        return self.slice_id[addr] == self.slice_id[cur_addr]

    def mb_a(self, addr: int) -> int:
        """Left MB address or -1."""
        if addr % self.W == 0:
            return -1
        return addr - 1

    def mb_b(self, addr: int) -> int:
        """Upper MB address or -1."""
        a = addr - self.W
        return a if a >= 0 else -1

    def mb_left(self, addr: int) -> int:
        a = self.mb_a(addr)
        return a if a >= 0 and self.mb_avail(a, addr) else -1

    def mb_up(self, addr: int) -> int:
        b = self.mb_b(addr)
        return b if b >= 0 and self.mb_avail(b, addr) else -1

    # -- 4x4-block neighbors (getLuma4x4Neighbour equivalent) --------------
    def luma4x4_neighbor(self, addr: int, xp: int, yp: int):
        """Neighbor of the luma pixel (xp, yp) relative to MB `addr`.

        Returns (avail, nb_addr, bx, by, pos_x4, pos_y4): block coords
        within the neighbor MB (4x4 units) and absolute picture block
        coords.  Mirrors getNeighbour + getLuma4x4Neighbour for frames.
        """
        mb_x, mb_y = addr % self.W, addr // self.W
        if xp < 0 and yp < 0:
            n_addr = addr - self.W - 1 if (mb_x > 0 and mb_y > 0) else -1
        elif xp < 0:
            n_addr = addr - 1 if (mb_x > 0 and yp < 16) else -1
        elif yp < 0:
            if xp < 16:
                n_addr = addr - self.W if mb_y > 0 else -1
            else:  # mbAddrC (up-right)
                n_addr = (
                    addr - self.W + 1 if (mb_y > 0 and mb_x < self.W - 1) else -1
                )
        elif xp < 16 and yp < 16:
            n_addr = addr
        else:
            return (False, -1, 0, 0, 0, 0)
        if n_addr < 0 or not self.mb_avail(n_addr, addr):
            return (False, -1, 0, 0, 0, 0)
        x = xp & 15
        y = yp & 15
        bx, by = x >> 2, y >> 2
        n_mb_x, n_mb_y = n_addr % self.W, n_addr // self.W
        return (True, n_addr, bx, by, 4 * n_mb_x + bx, 4 * n_mb_y + by)

    def chroma4x4_neighbor(self, addr: int, xp: int, yp: int, mb_cw: int, mb_ch: int):
        """getChroma4x4Neighbour equivalent; coords relative to the chroma
        MB of size (mb_cw, mb_ch) pixels (8x8 for 4:2:0)."""
        mb_x, mb_y = addr % self.W, addr // self.W
        if xp < 0 and yp < 0:
            n_addr = addr - self.W - 1 if (mb_x > 0 and mb_y > 0) else -1
        elif xp < 0:
            n_addr = addr - 1 if mb_x > 0 else -1
        elif yp < 0:
            n_addr = addr - self.W if mb_y > 0 else -1
        elif xp < mb_cw and yp < mb_ch:
            n_addr = addr
        else:
            return (False, -1, 0, 0)
        if n_addr < 0 or not self.mb_avail(n_addr, addr):
            return (False, -1, 0, 0)
        x = xp % mb_cw
        y = yp % mb_ch
        return (True, n_addr, x >> 2, y >> 2)

    # -- block coordinate helpers -----------------------------------------
    def mb_block_origin(self, addr: int):
        """(x4, y4) of the MB's top-left 4x4 block in picture block coords."""
        return 4 * (addr % self.W), 4 * (addr // self.W)

    def blk_index(self, bx: int, by: int) -> int:
        """4x4 block coords within MB -> coded block index 0..15."""
        return int(XY_TO_BLK4[by, bx])
