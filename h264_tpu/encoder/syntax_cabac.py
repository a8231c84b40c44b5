"""CABAC slice-data writer: PictureParseState -> slice bits.

Exact dual of decoder/cabac_mb.py: same context groups, same
ctxIdxInc derivations, same binarizations and emission order — so the
parser (which is symbol-exact vs the reference decoder) round-trips the
stream.  Supports I and P slices (B lands with B-frame encoding).
"""

from __future__ import annotations

import numpy as np

from ..bitstream.writer import BitWriter
from ..decoder import mbtables as M
from ..decoder.state import PictureParseState
from ..entropy.cabac import tables as T
from ..entropy.cabac.engine import ContextSet
from ..entropy.cabac.enc_engine import CabacEncoder, RecordingCabac
from ..native import cabac_encode_run
from ..native import cabac_write_slice as native_cabac_write_slice
from ..syntax.parsets import PPS, SPS
from ..syntax.slice_header import SliceHeader, SliceType

_POS2CTX_MAP = [a.tolist() for a in T.POS2CTX_MAP]
_POS2CTX_LAST = [a.tolist() for a in T.POS2CTX_LAST]
_TYPE2CTX_BCBP = T.TYPE2CTX_BCBP.tolist()
_TYPE2CTX_MAP = T.TYPE2CTX_MAP.tolist()
_TYPE2CTX_LAST = T.TYPE2CTX_LAST.tolist()
_TYPE2CTX_ONE = T.TYPE2CTX_ONE.tolist()
_TYPE2CTX_ABS = T.TYPE2CTX_ABS.tolist()
_MAXPOS = T.MAXPOS.tolist()
_C1ISDC = T.C1ISDC.tolist()
_MAX_C2 = T.MAX_C2.tolist()
_ZZ4 = M.ZZ_SCAN_4x4.tolist()
_BLK4 = M.BLK4_TO_XY.tolist()

# B-slice mb_type/sub_mb_type inverses (mbtables maps raw -> semantics)
_B_16x8_CODE = {pd: raw for raw, pd in M.B_PDIR_16x8.items()}
_B_8x16_CODE = {pd: raw for raw, pd in M.B_PDIR_8x16.items()}
_SUB_MB_B_CODE = {mp: v for v, mp in enumerate(M.SUB_MB_B)}

DC_PRED = 2


class CabacSliceWriter:
    def __init__(self, st: PictureParseState, sps: SPS, pps: PPS, sh: SliceHeader):
        self.st = st
        self.sps = sps
        self.pps = pps
        self.sh = sh
        self.qp = sh.slice_qp(pps)
        self.last_dquant = 0
        self.slice_type = sh.slice_type
        self.ctx = ContextSet(
            self.slice_type in (SliceType.I, SliceType.SI),
            sh.cabac_init_idc,
            self.qp,
        )
        # decoder-visible cbp_bits bitmaps, maintained in coding order
        self.cbp_bits = [0] * st.n_mbs

    # ------------------------------------------------------------------
    def write_slice_data(self, w: BitWriter, mb_addrs: list[int],
                         use_native: bool = True):
        w.cabac_zero_pad()  # cabac_alignment_one_bit
        if use_native:
            # fused native path: binarization + context adaptation +
            # arithmetic automaton in one C pass over the state tensors
            stype = {SliceType.P: 0, SliceType.SP: 0, SliceType.B: 1,
                     SliceType.I: 2, SliceType.SI: 2}[self.slice_type]
            payload = native_cabac_write_slice(
                self.st, stype, self.qp,
                self.sh.num_ref_idx_l0_active_minus1 + 1,
                self.sh.num_ref_idx_l1_active_minus1 + 1,
                self.pps.transform_8x8_mode_flag,
                self.pps.constrained_intra_pred_flag,
                self.sps.chroma_format_idc, mb_addrs,
                self.ctx.states, self.ctx.mps,
            )
            if payload is not None:
                w.append_bytes(payload)
                return
        rec = RecordingCabac()
        self.enc = rec
        st = self.st
        is_pb = self.slice_type in (SliceType.P, SliceType.SP, SliceType.B)
        for i, addr in enumerate(mb_addrs):
            if is_pb:
                self._write_mb_skip(addr, bool(st.skip_flag[addr]))
            if not st.skip_flag[addr]:
                self._write_mb(addr)
            else:
                self.last_dquant = 0
            last = i == len(mb_addrs) - 1
            self.enc.terminate(1 if last else 0)
        payload = None
        if use_native:
            payload = cabac_encode_run(
                bytes(rec.kinds), rec.idxs, bytes(rec.bins),
                self.ctx.states, self.ctx.mps,
            )
        if payload is not None:
            w.append_bytes(payload)
        else:
            rec.replay(w, self.ctx.states, self.ctx.mps)

    # ------------------------------------------------------------------
    def _write_mb_skip(self, addr: int, skipped: bool):
        st = self.st
        up, left = st.mb_up(addr), st.mb_left(addr)
        a = 1 if (left >= 0 and not st.skip_flag[left]) else 0
        b = 1 if (up >= 0 and not st.skip_flag[up]) else 0
        if self.slice_type == SliceType.B:
            s, m, base = self.ctx.group("MB_TYPE", 2)
            self.enc.decision((s, m), base + 7 + a + b, 1 if skipped else 0)
        else:
            s, m, base = self.ctx.group("MB_TYPE", 1)
            self.enc.decision((s, m), base + a + b, 1 if skipped else 0)

    def _write_mb(self, addr: int):
        st = self.st
        enc = self.enc
        mbt = int(st.mb_type[addr])
        cbp = int(st.cbp[addr])
        is_p = self.slice_type in (SliceType.P, SliceType.SP)

        # mb_type
        if self.slice_type == SliceType.I:
            self._write_mb_type_I(addr, mbt, cbp)
        elif self.slice_type == SliceType.B:
            self._write_mb_type_B(addr, mbt, cbp)
        else:
            self._write_mb_type_P(addr, mbt, cbp)

        if mbt == M.P8x8:
            for b8 in range(4):
                self._write_sub_mb_type(
                    int(st.b8mode[addr][b8]), int(st.b8pdir[addr][b8])
                )

        if mbt in (M.I4MB, M.I8MB) and self.pps.transform_8x8_mode_flag:
            self._write_transform_size(addr, mbt == M.I8MB)

        if mbt in (M.I4MB, M.I8MB):
            self._write_intra_pred_modes(addr)
        if st.is_intra[addr] and self.sps.chroma_format_idc in (1, 2):
            self._write_cipred(addr)

        if not st.is_intra[addr] and mbt != 0:
            self._write_motion(addr, mbt)

        if mbt != M.I16MB:
            self._write_cbp(addr, cbp)
            if cbp == 0:
                self.last_dquant = 0
        # transform_size_8x8_flag for inter MBs (after CBP; dual of the
        # parser's need_transform_size condition, macroblock.c:2901)
        if (
            mbt not in (M.I4MB, M.I8MB, M.I16MB)
            and (cbp & 15)
            and self.pps.transform_8x8_mode_flag
            and self._no_part_less_than_8x8(addr)
        ):
            self._write_transform_size(addr, bool(st.transform8x8[addr]))
        if cbp != 0 or mbt == M.I16MB:
            dq = int(st.qp[addr]) - self.qp
            self.qp = int(st.qp[addr])
            self._write_dquant(dq)

        self._write_residuals(addr)

    # ------------------------------------------------------------------
    def _write_mb_type_I(self, addr: int, mbt: int, cbp: int, base_row=0):
        st = self.st
        enc = self.enc
        up, left = st.mb_up(addr), st.mb_left(addr)
        s, m, base = self.ctx.group("MB_TYPE", 0)
        g = (s, m)
        a = 1 if (left >= 0 and st.mb_type[left] not in (M.I4MB, M.I8MB)) else 0
        b = 1 if (up >= 0 and st.mb_type[up] not in (M.I4MB, M.I8MB)) else 0
        if mbt in (M.I4MB, M.I8MB):
            enc.decision(g, base + a + b, 0)
            return
        enc.decision(g, base + a + b, 1)
        enc.terminate(0)  # not IPCM
        # act = 1 + 12*ac + cbp-part + 2*m1 + m0
        i16 = int(st.i16mode[addr])
        ac = 1 if (cbp & 15) else 0
        cc = (cbp >> 4) & 3
        enc.decision(g, base + 4, ac)
        if cc == 0:
            enc.decision(g, base + 5, 0)
        else:
            enc.decision(g, base + 5, 1)
            enc.decision(g, base + 6, 1 if cc == 2 else 0)
        enc.decision(g, base + 7, (i16 >> 1) & 1)
        enc.decision(g, base + 8, i16 & 1)

    def _write_i16_suffix(self, cbp: int, i16mode: int):
        """Intra-16x16 suffix for P/B mb_type (dual of _read_i16_suffix:
        terminate(0) = not IPCM, then ac/cc/mode bins on row-1 ctx 8-10)."""
        enc = self.enc
        enc.terminate(0)  # not IPCM
        s, m, base = self.ctx.group("MB_TYPE", 1)
        g = (s, m)
        ac = 1 if (cbp & 15) else 0
        cc = (cbp >> 4) & 3
        enc.decision(g, base + 8, ac)
        if cc == 0:
            enc.decision(g, base + 9, 0)
        else:
            enc.decision(g, base + 9, 1)
            enc.decision(g, base + 9, 1 if cc == 2 else 0)
        enc.decision(g, base + 10, (i16mode >> 1) & 1)
        enc.decision(g, base + 10, i16mode & 1)

    def _write_mb_type_P(self, addr: int, mbt: int, cbp: int):
        st = self.st
        enc = self.enc
        s, m, base = self.ctx.group("MB_TYPE", 1)
        g = (s, m)
        if st.is_intra[addr]:
            # prefix: bins for act_sym in {6,7}: b(4)=1 then b(7)
            enc.decision(g, base + 4, 1)
            if mbt in (M.I4MB, M.I8MB):
                enc.decision(g, base + 7, 0)  # act 6
                return
            enc.decision(g, base + 7, 1)  # act 7 -> I16 suffix
            self._write_i16_suffix(cbp, int(st.i16mode[addr]))
            return
        enc.decision(g, base + 4, 0)
        if mbt == M.P16x16:  # act 1
            enc.decision(g, base + 5, 0)
            enc.decision(g, base + 6, 0)
        elif mbt == M.P16x8:  # act 2
            enc.decision(g, base + 5, 1)
            enc.decision(g, base + 7, 1)
        elif mbt == M.P8x16:  # act 3
            enc.decision(g, base + 5, 1)
            enc.decision(g, base + 7, 0)
        elif mbt == M.P8x8:  # act 4
            enc.decision(g, base + 5, 0)
            enc.decision(g, base + 6, 1)
        else:
            raise NotImplementedError(f"P mb_type {mbt}")

    def _write_mb_type_B(self, addr: int, mbt: int, cbp: int):
        """Dual of _read_mb_type_B: binarize the raw B mb_type value."""
        st = self.st
        enc = self.enc
        up, left = st.mb_up(addr), st.mb_left(addr)
        s, m, base = self.ctx.group("MB_TYPE", 2)
        g = (s, m)
        a = 1 if (left >= 0 and st.mb_type[left] != 0) else 0
        b = 1 if (up >= 0 and st.mb_type[up] != 0) else 0
        # raw coded value from the state fields
        if mbt == M.I4MB or mbt == M.I8MB:
            raw = 23
        elif mbt == M.I16MB:
            raw = 24  # prefix; suffix carries cbp/mode
        elif mbt == 0:
            raw = 0
        elif mbt == M.P16x16:
            raw = {0: 1, 1: 2, 2: 3}[int(st.b8pdir[addr][0])]
        elif mbt == M.P16x8:
            raw = _B_16x8_CODE[(int(st.b8pdir[addr][0]), int(st.b8pdir[addr][2]))]
        elif mbt == M.P8x16:
            raw = _B_8x16_CODE[(int(st.b8pdir[addr][0]), int(st.b8pdir[addr][1]))]
        elif mbt == M.P8x8:
            raw = 22
        else:
            raise NotImplementedError(f"B mb_type {mbt}")
        if raw == 0:
            enc.decision(g, base + a + b, 0)
            return
        enc.decision(g, base + a + b, 1)
        if raw in (1, 2):
            enc.decision(g, base + 4, 0)
            enc.decision(g, base + 6, 1 if raw == 2 else 0)
            return
        enc.decision(g, base + 4, 1)
        if 3 <= raw <= 10:
            enc.decision(g, base + 5, 0)
            v = raw - 3
            enc.decision(g, base + 6, (v >> 2) & 1)
            enc.decision(g, base + 6, (v >> 1) & 1)
            enc.decision(g, base + 6, v & 1)
            return
        enc.decision(g, base + 5, 1)
        # act0 = 12 + 8*b1 + 4*b2 + 2*b3 with remaps 24->11, 26->22, 22->23(+bit)
        if raw == 11:
            act0, tail = 24, None
        elif raw == 22:
            act0, tail = 26, None
        elif raw in (23, 24):
            act0, tail = 22, raw - 23
        else:  # 12..21
            act0, tail = raw & ~1, raw & 1
        v = (act0 - 12) >> 1
        enc.decision(g, base + 6, (v >> 2) & 1)
        enc.decision(g, base + 6, (v >> 1) & 1)
        enc.decision(g, base + 6, v & 1)
        if tail is not None:
            enc.decision(g, base + 6, tail)
        if mbt == M.I16MB:
            self._write_i16_suffix(cbp, int(st.i16mode[addr]))

    def _write_sub_mb_type(self, b8mode: int, b8pdir: int = 0):
        enc = self.enc
        if self.slice_type == SliceType.B:
            self._write_sub_mb_type_B(b8mode, b8pdir)
            return
        s, m, base = self.ctx.group("B8_TYPE", 0)
        g = (s, m)
        if b8mode == M.B8_8x8:  # value 0
            enc.decision(g, base + 1, 1)
            return
        enc.decision(g, base + 1, 0)
        if b8mode == M.B8_8x4:  # value 1
            enc.decision(g, base + 3, 0)
        elif b8mode == M.B8_4x8:  # value 2
            enc.decision(g, base + 3, 1)
            enc.decision(g, base + 4, 1)
        else:  # 4x4, value 3
            enc.decision(g, base + 3, 1)
            enc.decision(g, base + 4, 0)

    def _write_sub_mb_type_B(self, b8mode: int, b8pdir: int):
        """Dual of _read_sub_mb_type's B branch (value = SUB_MB_B index)."""
        enc = self.enc
        val = _SUB_MB_B_CODE[(b8mode, b8pdir)]
        s, m, base = self.ctx.group("B8_TYPE", 1)
        g = (s, m)
        if val == 0:  # direct
            enc.decision(g, base + 0, 0)
            return
        enc.decision(g, base + 0, 1)
        act = val - 1
        if act <= 1:
            enc.decision(g, base + 1, 0)
            enc.decision(g, base + 3, act)
            return
        enc.decision(g, base + 1, 1)
        if act <= 5:
            enc.decision(g, base + 2, 0)
            v = act - 2
            enc.decision(g, base + 3, (v >> 1) & 1)
            enc.decision(g, base + 3, v & 1)
            return
        enc.decision(g, base + 2, 1)
        if act <= 9:
            enc.decision(g, base + 3, 0)
            v = act - 6
            enc.decision(g, base + 3, (v >> 1) & 1)
            enc.decision(g, base + 3, v & 1)
            return
        enc.decision(g, base + 3, 1)
        enc.decision(g, base + 3, act - 10)

    def _no_part_less_than_8x8(self, addr: int) -> bool:
        st = self.st
        mbt = int(st.mb_type[addr])
        if mbt in (M.P16x16, M.P16x8, M.P8x16):
            return True
        if mbt == 0 and self.slice_type == SliceType.B:
            return bool(self.sps.direct_8x8_inference_flag)
        if mbt == M.P8x8:
            inference = bool(self.sps.direct_8x8_inference_flag)
            for b in range(4):
                b8m = int(st.b8mode[addr][b])
                if not ((b8m == M.B8_DIRECT and inference) or b8m == M.B8_8x8):
                    return False
            return True
        return False

    def _write_transform_size(self, addr: int, flag: bool):
        st = self.st
        up, left = st.mb_up(addr), st.mb_left(addr)
        a = int(st.transform8x8[left]) if left >= 0 else 0
        b = int(st.transform8x8[up]) if up >= 0 else 0
        s, m, base = self.ctx.group("TRANSFORM_SIZE", 0)
        self.enc.decision((s, m), base + a + b, 1 if flag else 0)

    def _write_intra_pred_modes(self, addr: int):
        st = self.st
        enc = self.enc
        s, m, base = self.ctx.group("IPR", 0)
        g = (s, m)
        x4, y4 = st.mb_block_origin(addr)
        is8x8 = bool(st.transform8x8[addr])
        step = 2 if is8x8 else 1
        for b8 in range(4):
            if st.b8mode[addr][b8] != M.IBLOCK:
                continue
            for j in range(0, 2, step):
                for i in range(0, 2, step):
                    bx = ((b8 & 1) << 1) + i
                    by = (b8 & 2) + j
                    mode = int(st.ipredmode[y4 + by, x4 + bx])
                    mpm = self._mpm(addr, bx, by)
                    if mode == mpm:
                        enc.decision(g, base, 1)
                    else:
                        rem = mode if mode < mpm else mode - 1
                        enc.decision(g, base, 0)
                        enc.decision(g, base + 1, rem & 1)
                        enc.decision(g, base + 1, (rem >> 1) & 1)
                        enc.decision(g, base + 1, (rem >> 2) & 1)

    def _mpm(self, addr, bx, by):
        st = self.st
        la, lmb, _, _, lx, ly = st.luma4x4_neighbor(addr, (bx << 2) - 1, by << 2)
        ua, umb, _, _, ux, uy = st.luma4x4_neighbor(addr, bx << 2, (by << 2) - 1)
        if self.pps.constrained_intra_pred_flag:
            la = la and bool(st.is_intra[lmb])
            ua = ua and bool(st.is_intra[umb])
        left_m = int(st.ipredmode[ly, lx]) if la else -1
        up_m = int(st.ipredmode[uy, ux]) if ua else -1
        return DC_PRED if (left_m < 0 or up_m < 0) else min(left_m, up_m)

    def _write_cipred(self, addr: int):
        st = self.st
        enc = self.enc
        mode = int(st.c_ipred_mode[addr])
        up, left = st.mb_up(addr), st.mb_left(addr)
        a = (
            1
            if (left >= 0 and st.c_ipred_mode[left] != 0 and st.mb_type[left] != M.IPCM)
            else 0
        )
        b = (
            1
            if (up >= 0 and st.c_ipred_mode[up] != 0 and st.mb_type[up] != M.IPCM)
            else 0
        )
        s, m, base = self.ctx.group("CIPR", 0)
        g = (s, m)
        if mode == 0:
            enc.decision(g, base + a + b, 0)
            return
        enc.decision(g, base + a + b, 1)
        if mode == 1:
            enc.decision(g, base + 3, 0)
        elif mode == 2:
            enc.decision(g, base + 3, 1)
            enc.decision(g, base + 3, 0)
        else:
            enc.decision(g, base + 3, 1)
            enc.decision(g, base + 3, 1)

    def _write_cbp(self, addr: int, cbp: int):
        st = self.st
        enc = self.enc
        s, m, base = self.ctx.group("CBP", 0)
        g0 = (s, m)
        up, left = st.mb_up(addr), st.mb_left(addr)
        acc = 0
        for mb_y in (0, 2):
            for mb_x in (0, 2):
                if mb_y == 0:
                    if up < 0 or st.mb_type[up] == M.IPCM:
                        b = 0
                    else:
                        b = 0 if (st.cbp[up] & (1 << (2 + mb_x // 2))) else 1
                else:
                    b = 0 if (acc & (1 << (mb_x // 2))) else 1
                if mb_x == 0:
                    la, lmb, _, lby, _, _ = st.luma4x4_neighbor(addr, -1, mb_y << 2)
                    if la:
                        if st.mb_type[lmb] == M.IPCM:
                            a = 0
                        else:
                            a = 0 if (st.cbp[lmb] & (1 << (2 * (lby // 2) + 1))) else 1
                    else:
                        a = 0
                else:
                    a = 0 if (acc & (1 << mb_y)) else 1
                bit = 1 if (cbp & (1 << (mb_y + mb_x // 2))) else 0
                enc.decision(g0, base + a + 2 * b, bit)
                if bit:
                    acc += 1 << (mb_y + mb_x // 2)
        if self.sps.chroma_format_idc in (1, 2):
            s1, m1, base1 = self.ctx.group("CBP", 1)
            b = 1 if (up >= 0 and (st.mb_type[up] == M.IPCM or st.cbp[up] > 15)) else 0
            a = (
                1
                if (left >= 0 and (st.mb_type[left] == M.IPCM or st.cbp[left] > 15))
                else 0
            )
            cc = cbp >> 4
            enc.decision((s1, m1), base1 + a + 2 * b, 1 if cc else 0)
            if cc:
                s2, m2, base2 = self.ctx.group("CBP", 2)
                b = (
                    1
                    if (
                        up >= 0
                        and (
                            st.mb_type[up] == M.IPCM
                            or (st.cbp[up] > 15 and (st.cbp[up] >> 4) == 2)
                        )
                    )
                    else 0
                )
                a = (
                    1
                    if (
                        left >= 0
                        and (
                            st.mb_type[left] == M.IPCM
                            or (st.cbp[left] > 15 and (st.cbp[left] >> 4) == 2)
                        )
                    )
                    else 0
                )
                enc.decision((s2, m2), base2 + a + 2 * b, 1 if cc == 2 else 0)

    def _write_dquant(self, dq: int):
        enc = self.enc
        s, m, base = self.ctx.group("DELTA_QP", 0)
        g = (s, m)
        act_ctx = 1 if self.last_dquant != 0 else 0
        # inverse of the decoder mapping: act_sym -> dquant
        act_sym = 2 * abs(dq) - (1 if dq > 0 else 0)
        if act_sym == 0:
            enc.decision(g, base + act_ctx, 0)
        else:
            enc.decision(g, base + act_ctx, 1)
            if act_sym == 1:
                enc.decision(g, base + 2, 0)
            else:
                enc.decision(g, base + 2, 1)
                for _ in range(act_sym - 2):
                    enc.decision(g, base + 3, 1)
                enc.decision(g, base + 3, 0)
        self.last_dquant = dq

    # ------------------------------------------------------------------
    def _write_motion(self, addr: int, mbt: int):
        st = self.st
        x4, y4 = st.mb_block_origin(addr)
        bframe = self.slice_type == SliceType.B
        n_active = (
            self.sh.num_ref_idx_l0_active_minus1 + 1,
            self.sh.num_ref_idx_l1_active_minus1 + 1,
        )
        if mbt == M.P16x16:
            parts = [(0, 0, 4, 4, 0)]
        elif mbt == M.P16x8:
            parts = [(0, 0, 4, 2, 0), (0, 2, 4, 2, 2)]
        elif mbt == M.P8x16:
            parts = [(0, 0, 2, 4, 0), (2, 0, 2, 4, 1)]
        else:
            parts = [((b8 & 1) * 2, (b8 >> 1) * 2, 2, 2, b8) for b8 in range(4)]

        def active(lst, b8):
            b8m = int(st.b8mode[addr][b8])
            pdir = int(st.b8pdir[addr][b8])
            if b8m == M.IBLOCK or (mbt == M.P8x8 and b8m == M.B8_DIRECT):
                return False
            if bframe and pdir != lst and pdir != M.PD_BI:
                return False
            return True

        # ref_idx: list0 then list1, per partition (decoder read order)
        for lst in (0, 1):
            if lst == 1 and not bframe:
                break
            if n_active[lst] <= 1:
                continue
            for (bx, by, _, _, b8) in parts:
                if not active(lst, b8):
                    continue
                self._write_ref_idx(
                    addr, lst, bx, by, int(st.ref_idx[lst, y4 + by, x4 + bx])
                )
        # mvd: list0 then list1, per sub-partition
        for lst in (0, 1):
            if lst == 1 and not bframe:
                break
            for (bx, by, w4, h4, b8) in parts:
                if not active(lst, b8):
                    continue
                if mbt == M.P8x8:
                    b8m = int(st.b8mode[addr][b8])
                    sw, sh_ = {M.B8_8x8: (2, 2), M.B8_8x4: (2, 1),
                               M.B8_4x8: (1, 2), M.B8_4x4: (1, 1)}[b8m]
                    subs = [
                        (bx + dx, by + dy)
                        for dy in range(0, 2, sh_)
                        for dx in range(0, 2, sw)
                    ]
                else:
                    subs = [(bx, by)]
                for (sx, sy) in subs:
                    for comp in range(2):
                        self._write_mvd(
                            addr, lst, sx, sy, comp,
                            int(st.mvd[lst, y4 + sy, x4 + sx, comp]),
                        )

    def _write_ref_idx(self, addr, lst, bx, by, ref):
        st = self.st
        enc = self.enc
        la, lmb, lbx, lby, lx, ly = st.luma4x4_neighbor(addr, (bx << 2) - 1, by << 2)
        ua, umb, ubx, uby, ux, uy = st.luma4x4_neighbor(addr, bx << 2, (by << 2) - 1)

        def flag(avail, mb, nbx, nby, px, py):
            if not avail:
                return 0
            b8 = (nbx // 2) % 2 + 2 * ((nby // 2) % 2)
            if st.mb_type[mb] == M.IPCM:
                return 0
            if (
                self.slice_type == SliceType.B
                and st.mb_type[mb] == 0
                and not st.is_intra[mb]
            ):
                return 0  # direct MB
            if st.b8mode[mb][b8] == 0 and st.b8pdir[mb][b8] == 2:
                return 0
            return 1 if st.ref_idx[lst, py, px] > 0 else 0

        a = flag(la, lmb, lbx, lby, lx, ly)
        b = flag(ua, umb, ubx, uby, ux, uy)
        s, m, base = self.ctx.group("REF_NO", 0)
        g = (s, m)
        if ref == 0:
            enc.decision(g, base + a + 2 * b, 0)
            return
        enc.decision(g, base + a + 2 * b, 1)
        if ref == 1:
            enc.decision(g, base + 4, 0)
            return
        enc.decision(g, base + 4, 1)
        for _ in range(ref - 2):
            enc.decision(g, base + 5, 1)
        enc.decision(g, base + 5, 0)

    def _write_mvd(self, addr, lst, bx, by, comp, mvd):
        st = self.st
        enc = self.enc
        la, lmb, lbx, lby, _, _ = st.luma4x4_neighbor(addr, (bx << 2) - 1, by << 2)
        ua, umb, ubx, uby, _, _ = st.luma4x4_neighbor(addr, bx << 2, (by << 2) - 1)
        a_val = 0
        if la:
            ox, oy = st.mb_block_origin(lmb)
            a_val = abs(int(st.mvd[lst, oy + lby, ox + lbx, comp]))
        b_val = 0
        if ua:
            ox, oy = st.mb_block_origin(umb)
            b_val = abs(int(st.mvd[lst, oy + uby, ox + ubx, comp]))
        err = a_val + b_val
        if err < 3:
            act_ctx = 5 * comp
        elif err > 32:
            act_ctx = 5 * comp + 3
        else:
            act_ctx = 5 * comp + 2
        s0, m0, base0 = self.ctx.group("MV_RES", 0)
        if mvd == 0:
            enc.decision((s0, m0), base0 + act_ctx, 0)
            return
        enc.decision((s0, m0), base0 + act_ctx, 1)
        s1, m1, base1 = self.ctx.group("MV_RES", 1)
        self._write_unary_exp_golomb_mv((s1, m1), base1 + 5 * comp, abs(mvd) - 1, 3)
        enc.bypass(1 if mvd < 0 else 0)

    def _write_unary_exp_golomb_mv(self, g, base, symbol, max_bin):
        """Dual of the decoder's _unary_exp_golomb_mv (exp_start=8):
        value v<=7: first-bin 1, (v-1) one-bins, terminating 0;
        v>=8: first-bin 1, seven one-bins, then bypass EG3 of v-8."""
        enc = self.enc
        if symbol == 0:
            enc.decision(g, base, 0)
            return
        enc.decision(g, base, 1)
        v = symbol
        if v <= 7:
            for i in range(v - 1):
                self._dec_mv_bin(g, base, 1, i + 2, max_bin)
            self._dec_mv_bin(g, base, 0, v + 1, max_bin)
        else:
            for i in range(7):
                self._dec_mv_bin(g, base, 1, i + 2, max_bin)
            self._write_eg_bypass(v - 8, 3)

    def _dec_mv_bin(self, g, base, bit, bin_idx, max_bin):
        """Continuation bin with the decoder's rolling ctx offset."""
        # decoder: ictx starts at ctx+1; after reading, if (++bin)==2:
        # ictx++; if bin==max_bin: ictx++.  bin starts at 1; the i-th
        # continuation bin (bin=i+1 when read... replicate exactly:
        offset = 1
        b = 1
        for _ in range(bin_idx - 2):
            b += 1
            if b == 2:
                offset += 1
            if b == max_bin:
                offset += 1
        self.enc.decision(g, base + offset, bit)

    def _write_eg_bypass(self, value, k):
        enc = self.enc
        while value >= (1 << k):
            enc.bypass(1)
            value -= 1 << k
            k += 1
        enc.bypass(0)
        while k:
            k -= 1
            enc.bypass((value >> k) & 1)

    # ------------------------------------------------------------------
    # residual coding
    # ------------------------------------------------------------------
    def _write_residuals(self, addr: int):
        st = self.st
        cbp = int(st.cbp[addr])
        mbt = int(st.mb_type[addr])
        if mbt == M.I16MB:
            dc = st.luma_dc[addr]
            scan = [int(dc[y, x]) for (x, y) in _ZZ4]
            self._write_block(addr, M.LUMA_16DC, 0, 0, 0, scan)
        if cbp & 15:
            t8 = bool(st.transform8x8[addr])
            for b8 in range(4):
                if not (cbp & (1 << b8)):
                    continue
                if t8:
                    lv = st.luma8_levels[addr, b8]
                    scan = [int(lv[y, x]) for (x, y) in M.ZZ_SCAN_8x8]
                    self._write_block(addr, M.LUMA_8x8, 0, (b8 & 1) * 2, (b8 >> 1) * 2, scan)
                else:
                    btype = M.LUMA_16AC if mbt == M.I16MB else M.LUMA_4x4
                    for b4 in range(4):
                        blk = b8 * 4 + b4
                        bx, by = _BLK4[blk]
                        lv = st.luma_levels[addr, blk]
                        if btype == M.LUMA_16AC:
                            scan = [int(lv[y, x]) for (x, y) in _ZZ4[1:]]
                        else:
                            scan = [int(lv[y, x]) for (x, y) in _ZZ4]
                        self._write_block(addr, btype, 0, bx, by, scan)
        if self.sps.chroma_format_idc == 1:
            if cbp > 15:
                for uv in range(2):
                    d = st.chroma_dc[addr, uv]
                    scan = [int(d[0, 0]), int(d[0, 1]), int(d[1, 0]), int(d[1, 1])]
                    self._write_block(addr, M.CHROMA_DC, uv, 0, 0, scan)
            if cbp > 31:
                for uv in range(2):
                    for blk in range(4):
                        bx, by = blk & 1, blk >> 1
                        lv = st.chroma_levels[addr, uv, blk]
                        scan = [int(lv[y, x]) for (x, y) in _ZZ4[1:]]
                        self._write_block(addr, M.CHROMA_AC, uv, bx, by, scan)

    def _cbf_bit_for(self, btype, is_v, bx, by):
        if btype in (M.LUMA_16DC, M.CB_16DC, M.CR_16DC):
            return 0
        if btype in (M.CHROMA_DC, M.CHROMA_DC_2x4, M.CHROMA_DC_4x4):
            return 17 + is_v
        if btype == M.CHROMA_AC:
            return (19 if not is_v else 35) + 4 * by + bx
        return 1 + 4 * by + bx

    def _write_cbf(self, addr, btype, is_v, bx, by, cbf):
        st = self.st
        is_luma = btype in (
            M.LUMA_16DC, M.LUMA_16AC, M.LUMA_8x8, M.LUMA_8x4, M.LUMA_4x8, M.LUMA_4x4,
        )
        is_dc = btype in (M.LUMA_16DC, M.CHROMA_DC, M.CHROMA_DC_2x4, M.CHROMA_DC_4x4)
        default_bit = 1 if st.is_intra[addr] else 0
        i = 0 if is_dc else bx
        j = 0 if is_dc else by
        if is_luma:
            la, lmb, lbx, lby, _, _ = st.luma4x4_neighbor(addr, (i << 2) - 1, j << 2)
            ua, umb, ubx, uby, _, _ = st.luma4x4_neighbor(addr, i << 2, (j << 2) - 1)
        else:
            cw, ch = self.sps.mb_chroma_size
            la, lmb, lbx, lby = st.chroma4x4_neighbor(addr, (i << 2) - 1, j << 2, cw, ch)
            ua, umb, ubx, uby = st.chroma4x4_neighbor(addr, i << 2, (j << 2) - 1, cw, ch)
        if btype == M.LUMA_16DC:
            bit_a = bit_b = 0
        elif btype in (M.CHROMA_DC, M.CHROMA_DC_2x4, M.CHROMA_DC_4x4):
            bit_a = bit_b = 17 + is_v
        elif btype == M.CHROMA_AC:
            bit_a = (19 if not is_v else 35) + (4 * lby + lbx if la else 0)
            bit_b = (19 if not is_v else 35) + (4 * uby + ubx if ua else 0)
        else:
            bit_a = 1 + (4 * lby + lbx if la else 0)
            bit_b = 1 + (4 * uby + ubx if ua else 0)
        if btype != M.LUMA_8x8:
            upper = default_bit
            left = default_bit
            if ua:
                upper = (
                    1 if st.mb_type[umb] == M.IPCM else (self.cbp_bits[umb] >> bit_b) & 1
                )
            if la:
                left = (
                    1 if st.mb_type[lmb] == M.IPCM else (self.cbp_bits[lmb] >> bit_a) & 1
                )
            ctx2 = 2 * upper + left
            s, m, base = self.ctx.group("BCBP", _TYPE2CTX_BCBP[btype])
            self.enc.decision((s, m), base + ctx2, cbf)
        if cbf:
            bit = self._cbf_bit_for(btype, is_v, bx, by)
            mask = 1 << bit
            if btype == M.LUMA_8x8:
                mask |= (1 << (bit + 1)) | (1 << (bit + 4)) | (1 << (bit + 5))
            self.cbp_bits[addr] |= mask

    def _write_block(self, addr, btype, is_v, bx, by, scan):
        """cbf + significance map + levels for one block (dual of
        cabac_mb._read_block)."""
        enc = self.enc
        maxpos = _MAXPOS[btype]
        coeff = [int(c) for c in scan]
        assert len(coeff) == maxpos
        nz = any(coeff)
        self._write_cbf(addr, btype, is_v, bx, by, 1 if nz else 0)
        if not nz:
            return
        p2c_map = _POS2CTX_MAP[btype]
        p2c_last = _POS2CTX_LAST[btype]
        sm, mm, base_m = self.ctx.group("MAP", _TYPE2CTX_MAP[btype])
        sl, ml, base_l = self.ctx.group("LAST", _TYPE2CTX_LAST[btype])
        gm, gl = (sm, mm), (sl, ml)
        shift = 0 if _C1ISDC[btype] else -1
        i0 = 0 if _C1ISDC[btype] else 1
        i1 = maxpos - 1 if _C1ISDC[btype] else maxpos
        last_idx = max(k for k, c in enumerate(coeff) if c)
        i = i0
        while i < i1:
            sig = 1 if coeff[i + shift] else 0
            enc.decision(gm, base_m + p2c_map[i], sig)
            if sig:
                is_last = 1 if (i + shift) == last_idx else 0
                enc.decision(gl, base_l + p2c_last[i], is_last)
                if is_last:
                    break
            i += 1
        # levels (reverse scan)
        so, mo, base_o = self.ctx.group("ONE", _TYPE2CTX_ONE[btype])
        sa, ma, base_a = self.ctx.group("ABS", _TYPE2CTX_ABS[btype])
        go, ga = (so, mo), (sa, ma)
        c1, c2 = 1, 0
        mc2 = _MAX_C2[btype]
        for idx in range(maxpos - 1, -1, -1):
            v = coeff[idx]
            if v == 0:
                continue
            mag = abs(v)
            ctx = min(c1, 4)
            enc.decision(go, base_o + ctx, 0 if mag == 1 else 1)
            if mag >= 2:
                ctx = min(c2, mc2)
                self._write_level_suffix(ga, base_a + ctx, mag - 2)
                c1 = 0
                c2 += 1
            elif c1:
                c1 += 1
            enc.bypass(1 if v < 0 else 0)

    def _write_level_suffix(self, g, idx, symbol):
        """unary_exp_golomb_level encode (exp_start=13)."""
        enc = self.enc
        if symbol == 0:
            enc.decision(g, idx, 0)
            return
        enc.decision(g, idx, 1)
        v = symbol
        if v <= 12:
            for _ in range(v - 1):
                enc.decision(g, idx, 1)
            enc.decision(g, idx, 0)
        else:
            for _ in range(12):
                enc.decision(g, idx, 1)
            self._write_eg_bypass(v - 13, 0)
