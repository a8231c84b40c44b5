"""Slice header syntax (spec §7.3.3) — parse and write.

Capability parity with JM slice-header handling
(ldecod/src/header.c:81/118 FirstPartOfSliceHeader/RestOfSliceHeader,
lencod/src/header.c:58 SliceHeader), re-designed as a dataclass with
symmetric parse/write.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum

from ..bitstream.reader import BitReader
from ..bitstream.writer import BitWriter
from .parsets import PPS, SPS


class SliceType(IntEnum):
    P = 0
    B = 1
    I = 2
    SP = 3
    SI = 4

    @classmethod
    def from_code(cls, code: int) -> "SliceType":
        return cls(code % 5)


@dataclass
class RefPicListMod:
    """One ref_pic_list_modification op (spec §7.3.3.1)."""

    modification_of_pic_nums_idc: int
    value: int  # abs_diff_pic_num_minus1 or long_term_pic_num


@dataclass
class MMCO:
    """One memory_management_control_operation (spec §7.3.3.3)."""

    op: int
    value1: int = 0
    value2: int = 0


@dataclass
class PredWeight:
    luma_weight: int
    luma_offset: int
    chroma_weight: list[int]  # [cb, cr]
    chroma_offset: list[int]


@dataclass
class SliceHeader:
    first_mb_in_slice: int = 0
    slice_type_code: int = 2
    pic_parameter_set_id: int = 0
    colour_plane_id: int = 0
    frame_num: int = 0
    field_pic_flag: bool = False
    bottom_field_flag: bool = False
    idr_pic_id: int = 0
    pic_order_cnt_lsb: int = 0
    delta_pic_order_cnt_bottom: int = 0
    delta_pic_order_cnt: list[int] = field(default_factory=lambda: [0, 0])
    redundant_pic_cnt: int = 0
    direct_spatial_mv_pred_flag: bool = False
    num_ref_idx_active_override_flag: bool = False
    num_ref_idx_l0_active_minus1: int = 0
    num_ref_idx_l1_active_minus1: int = 0
    ref_pic_list_mods: list[list[RefPicListMod]] = field(
        default_factory=lambda: [[], []]
    )
    luma_log2_weight_denom: int = 0
    chroma_log2_weight_denom: int = 0
    pred_weights: list[list[PredWeight | None]] = field(
        default_factory=lambda: [[], []]
    )
    no_output_of_prior_pics_flag: bool = False
    long_term_reference_flag: bool = False
    adaptive_ref_pic_marking_mode_flag: bool = False
    mmco_ops: list[MMCO] = field(default_factory=list)
    cabac_init_idc: int = 0
    slice_qp_delta: int = 0
    sp_for_switch_flag: bool = False
    slice_qs_delta: int = 0
    disable_deblocking_filter_idc: int = 0
    slice_alpha_c0_offset_div2: int = 0
    slice_beta_offset_div2: int = 0
    slice_group_change_cycle: int = 0
    # context, filled by the caller:
    nal_ref_idc: int = 0
    is_idr: bool = False
    header_bit_len: int = 0  # bit position after the header (for slice data)
    is_dp: bool = False  # slice arrived as DPA (data partitioning)

    @property
    def slice_type(self) -> SliceType:
        return SliceType.from_code(self.slice_type_code)

    def slice_qp(self, pps: PPS) -> int:
        return 26 + pps.pic_init_qp_minus26 + self.slice_qp_delta


def _parse_ref_pic_list_mod(r: BitReader) -> list[RefPicListMod]:
    mods = []
    if r.flag():  # ref_pic_list_modification_flag
        while True:
            idc = r.ue()
            if idc == 3:
                break
            mods.append(RefPicListMod(idc, r.ue()))
            if len(mods) > 64:
                raise ValueError("runaway ref_pic_list_modification")
    return mods


def _parse_pred_weight_table(r: BitReader, sh: SliceHeader, sps: SPS):
    sh.luma_log2_weight_denom = r.ue()
    has_chroma = sps.chroma_format_idc != 0
    if has_chroma:
        sh.chroma_log2_weight_denom = r.ue()
    n_lists = 2 if sh.slice_type == SliceType.B else 1
    counts = [sh.num_ref_idx_l0_active_minus1 + 1, sh.num_ref_idx_l1_active_minus1 + 1]
    for lst in range(n_lists):
        weights: list[PredWeight] = []
        for _ in range(counts[lst]):
            lw, lo = 1 << sh.luma_log2_weight_denom, 0
            cw = [1 << sh.chroma_log2_weight_denom] * 2
            co = [0, 0]
            if r.flag():  # luma_weight_l{X}_flag
                lw = r.se()
                lo = r.se()
            if has_chroma and r.flag():  # chroma_weight_l{X}_flag
                cw, co = [], []
                for _c in range(2):
                    cw.append(r.se())
                    co.append(r.se())
            weights.append(PredWeight(lw, lo, cw, co))
        sh.pred_weights[lst] = weights


def _parse_dec_ref_pic_marking(r: BitReader, sh: SliceHeader):
    if sh.is_idr:
        sh.no_output_of_prior_pics_flag = r.flag()
        sh.long_term_reference_flag = r.flag()
    else:
        sh.adaptive_ref_pic_marking_mode_flag = r.flag()
        if sh.adaptive_ref_pic_marking_mode_flag:
            while True:
                op = r.ue()
                if op == 0:
                    break
                m = MMCO(op)
                if op in (1, 3):
                    m.value1 = r.ue()  # difference_of_pic_nums_minus1
                if op == 2:
                    m.value1 = r.ue()  # long_term_pic_num
                if op in (3, 6):
                    m.value2 = r.ue()  # long_term_frame_idx
                if op == 4:
                    m.value1 = r.ue()  # max_long_term_frame_idx_plus1
                sh.mmco_ops.append(m)


def parse_slice_header(
    rbsp: bytes, sps_map: dict[int, SPS], pps_map: dict[int, PPS],
    nal_ref_idc: int, is_idr: bool,
) -> tuple[SliceHeader, SPS, PPS]:
    r = BitReader(rbsp)
    sh = SliceHeader(nal_ref_idc=nal_ref_idc, is_idr=is_idr)
    sh.first_mb_in_slice = r.ue()
    sh.slice_type_code = r.ue()
    sh.pic_parameter_set_id = r.ue()
    pps = pps_map[sh.pic_parameter_set_id]
    sps = sps_map[pps.seq_parameter_set_id]
    if sps.separate_colour_plane_flag:
        sh.colour_plane_id = r.u(2)
    sh.frame_num = r.u(sps.log2_max_frame_num_minus4 + 4)
    if not sps.frame_mbs_only_flag:
        sh.field_pic_flag = r.flag()
        if sh.field_pic_flag:
            sh.bottom_field_flag = r.flag()
    if is_idr:
        sh.idr_pic_id = r.ue()
    if sps.pic_order_cnt_type == 0:
        sh.pic_order_cnt_lsb = r.u(sps.log2_max_pic_order_cnt_lsb_minus4 + 4)
        if pps.bottom_field_pic_order_in_frame_present_flag and not sh.field_pic_flag:
            sh.delta_pic_order_cnt_bottom = r.se()
    elif sps.pic_order_cnt_type == 1 and not sps.delta_pic_order_always_zero_flag:
        sh.delta_pic_order_cnt[0] = r.se()
        if pps.bottom_field_pic_order_in_frame_present_flag and not sh.field_pic_flag:
            sh.delta_pic_order_cnt[1] = r.se()
    if pps.redundant_pic_cnt_present_flag:
        sh.redundant_pic_cnt = r.ue()
    st = sh.slice_type
    if st == SliceType.B:
        sh.direct_spatial_mv_pred_flag = r.flag()
    sh.num_ref_idx_l0_active_minus1 = pps.num_ref_idx_l0_default_active_minus1
    sh.num_ref_idx_l1_active_minus1 = pps.num_ref_idx_l1_default_active_minus1
    if sh.field_pic_flag:
        # field decoding doubles the default active counts (spec §7.4.3)
        sh.num_ref_idx_l0_active_minus1 = \
            2 * (sh.num_ref_idx_l0_active_minus1 + 1) - 1
        sh.num_ref_idx_l1_active_minus1 = \
            2 * (sh.num_ref_idx_l1_active_minus1 + 1) - 1
    if st in (SliceType.P, SliceType.SP, SliceType.B):
        sh.num_ref_idx_active_override_flag = r.flag()
        if sh.num_ref_idx_active_override_flag:
            sh.num_ref_idx_l0_active_minus1 = r.ue()
            if st == SliceType.B:
                sh.num_ref_idx_l1_active_minus1 = r.ue()
    # ref_pic_list_modification
    if st not in (SliceType.I, SliceType.SI):
        sh.ref_pic_list_mods[0] = _parse_ref_pic_list_mod(r)
    if st == SliceType.B:
        sh.ref_pic_list_mods[1] = _parse_ref_pic_list_mod(r)
    if (pps.weighted_pred_flag and st in (SliceType.P, SliceType.SP)) or (
        pps.weighted_bipred_idc == 1 and st == SliceType.B
    ):
        _parse_pred_weight_table(r, sh, sps)
    if nal_ref_idc != 0:
        _parse_dec_ref_pic_marking(r, sh)
    if pps.entropy_coding_mode_flag and st not in (SliceType.I, SliceType.SI):
        sh.cabac_init_idc = r.ue()
    sh.slice_qp_delta = r.se()
    if st in (SliceType.SP, SliceType.SI):
        if st == SliceType.SP:
            sh.sp_for_switch_flag = r.flag()
        sh.slice_qs_delta = r.se()
    if pps.deblocking_filter_control_present_flag:
        sh.disable_deblocking_filter_idc = r.ue()
        if sh.disable_deblocking_filter_idc != 1:
            sh.slice_alpha_c0_offset_div2 = r.se()
            sh.slice_beta_offset_div2 = r.se()
    if pps.num_slice_groups_minus1 > 0 and pps.slice_group_map_type in (3, 4, 5):
        import math

        pic_size_in_map_units = (sps.pic_width_in_mbs_minus1 + 1) * (
            sps.pic_height_in_map_units_minus1 + 1
        )
        rate = pps.slice_group_change_rate_minus1 + 1
        bits = math.ceil(math.log2(pic_size_in_map_units // rate + 1 + 1))
        sh.slice_group_change_cycle = r.u(bits)
    sh.header_bit_len = r.pos
    return sh, sps, pps


def write_slice_header(
    sh: SliceHeader, sps: SPS, pps: PPS, w: BitWriter | None = None
) -> BitWriter:
    """Serialize a slice header; returns the (unterminated) BitWriter so the
    entropy backend can continue with slice data."""
    if w is None:
        w = BitWriter()
    w.ue(sh.first_mb_in_slice)
    w.ue(sh.slice_type_code)
    w.ue(sh.pic_parameter_set_id)
    if sps.separate_colour_plane_flag:
        w.u(sh.colour_plane_id, 2)
    w.u(sh.frame_num, sps.log2_max_frame_num_minus4 + 4)
    if not sps.frame_mbs_only_flag:
        w.flag(sh.field_pic_flag)
        if sh.field_pic_flag:
            w.flag(sh.bottom_field_flag)
    if sh.is_idr:
        w.ue(sh.idr_pic_id)
    if sps.pic_order_cnt_type == 0:
        w.u(sh.pic_order_cnt_lsb, sps.log2_max_pic_order_cnt_lsb_minus4 + 4)
        if pps.bottom_field_pic_order_in_frame_present_flag and not sh.field_pic_flag:
            w.se(sh.delta_pic_order_cnt_bottom)
    elif sps.pic_order_cnt_type == 1 and not sps.delta_pic_order_always_zero_flag:
        w.se(sh.delta_pic_order_cnt[0])
        if pps.bottom_field_pic_order_in_frame_present_flag and not sh.field_pic_flag:
            w.se(sh.delta_pic_order_cnt[1])
    if pps.redundant_pic_cnt_present_flag:
        w.ue(sh.redundant_pic_cnt)
    st = sh.slice_type
    if st == SliceType.B:
        w.flag(sh.direct_spatial_mv_pred_flag)
    if st in (SliceType.P, SliceType.SP, SliceType.B):
        w.flag(sh.num_ref_idx_active_override_flag)
        if sh.num_ref_idx_active_override_flag:
            w.ue(sh.num_ref_idx_l0_active_minus1)
            if st == SliceType.B:
                w.ue(sh.num_ref_idx_l1_active_minus1)
    if st not in (SliceType.I, SliceType.SI):
        mods = sh.ref_pic_list_mods[0]
        w.flag(bool(mods))
        if mods:
            for m in mods:
                w.ue(m.modification_of_pic_nums_idc)
                w.ue(m.value)
            w.ue(3)
    if st == SliceType.B:
        mods = sh.ref_pic_list_mods[1]
        w.flag(bool(mods))
        if mods:
            for m in mods:
                w.ue(m.modification_of_pic_nums_idc)
                w.ue(m.value)
            w.ue(3)
    if (pps.weighted_pred_flag and st in (SliceType.P, SliceType.SP)) or (
        pps.weighted_bipred_idc == 1 and st == SliceType.B
    ):
        _write_pred_weight_table(w, sh, sps)
    if sh.nal_ref_idc != 0:
        if sh.is_idr:
            w.flag(sh.no_output_of_prior_pics_flag)
            w.flag(sh.long_term_reference_flag)
        else:
            w.flag(sh.adaptive_ref_pic_marking_mode_flag)
            if sh.adaptive_ref_pic_marking_mode_flag:
                for m in sh.mmco_ops:
                    w.ue(m.op)
                    if m.op in (1, 3):
                        w.ue(m.value1)
                    if m.op == 2:
                        w.ue(m.value1)
                    if m.op in (3, 6):
                        w.ue(m.value2)
                    if m.op == 4:
                        w.ue(m.value1)
                w.ue(0)
    if pps.entropy_coding_mode_flag and st not in (SliceType.I, SliceType.SI):
        w.ue(sh.cabac_init_idc)
    w.se(sh.slice_qp_delta)
    if st in (SliceType.SP, SliceType.SI):
        if st == SliceType.SP:
            w.flag(sh.sp_for_switch_flag)
        w.se(sh.slice_qs_delta)
    if pps.deblocking_filter_control_present_flag:
        w.ue(sh.disable_deblocking_filter_idc)
        if sh.disable_deblocking_filter_idc != 1:
            w.se(sh.slice_alpha_c0_offset_div2)
            w.se(sh.slice_beta_offset_div2)
    return w


def _write_pred_weight_table(w: BitWriter, sh: SliceHeader, sps: SPS):
    w.ue(sh.luma_log2_weight_denom)
    has_chroma = sps.chroma_format_idc != 0
    if has_chroma:
        w.ue(sh.chroma_log2_weight_denom)
    n_lists = 2 if sh.slice_type == SliceType.B else 1
    default_lw = 1 << sh.luma_log2_weight_denom
    default_cw = 1 << sh.chroma_log2_weight_denom
    for lst in range(n_lists):
        for pw in sh.pred_weights[lst]:
            luma_explicit = pw.luma_weight != default_lw or pw.luma_offset != 0
            w.flag(luma_explicit)
            if luma_explicit:
                w.se(pw.luma_weight)
                w.se(pw.luma_offset)
            if has_chroma:
                chroma_explicit = any(
                    cw != default_cw or co != 0
                    for cw, co in zip(pw.chroma_weight, pw.chroma_offset)
                )
                w.flag(chroma_explicit)
                if chroma_explicit:
                    for cw, co in zip(pw.chroma_weight, pw.chroma_offset):
                        w.se(cw)
                        w.se(co)
