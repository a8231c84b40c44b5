"""Sequence / picture parameter sets: parse and write.

Spec §7.3.2.1 (SPS), §7.3.2.2 (PPS), §7.3.2.1.1 (scaling lists).
Capability parity with JM parset handling (ldecod/src/parset.c
InterpretSPS/InterpretPPS; lencod/src/parset.c:211/401), re-designed as
dataclasses with symmetric parse/write functions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..bitstream.reader import BitReader
from ..bitstream.writer import BitWriter

# Default (flat) scaling lists and the "use default" fallback tables,
# spec Tables 7-2/7-3.
DEFAULT_4x4_INTRA = [6, 13, 13, 20, 20, 20, 28, 28, 28, 28, 32, 32, 32, 37, 37, 42]
DEFAULT_4x4_INTER = [10, 14, 14, 20, 20, 20, 24, 24, 24, 24, 27, 27, 27, 30, 30, 34]
DEFAULT_8x8_INTRA = [
    6, 10, 10, 13, 11, 13, 16, 16, 16, 16, 18, 18, 18, 18, 18, 23,
    23, 23, 23, 23, 23, 25, 25, 25, 25, 25, 25, 25, 27, 27, 27, 27,
    27, 27, 27, 27, 29, 29, 29, 29, 29, 29, 29, 31, 31, 31, 31, 31,
    31, 33, 33, 33, 33, 33, 36, 36, 36, 36, 38, 38, 38, 40, 40, 42,
]
DEFAULT_8x8_INTER = [
    9, 13, 13, 15, 13, 15, 17, 17, 17, 17, 19, 19, 19, 19, 19, 21,
    21, 21, 21, 21, 21, 22, 22, 22, 22, 22, 22, 22, 24, 24, 24, 24,
    24, 24, 24, 24, 25, 25, 25, 25, 25, 25, 25, 27, 27, 27, 27, 27,
    27, 28, 28, 28, 28, 28, 30, 30, 30, 30, 32, 32, 32, 33, 33, 35,
]
FLAT_16 = [16] * 16
FLAT_64 = [16] * 64

# zig-zag scans used by scaling_list() syntax (spec §8.5.6/8.5.7)
ZIGZAG_4x4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
ZIGZAG_8x8 = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


@dataclass
class HRD:
    cpb_cnt_minus1: int = 0
    bit_rate_scale: int = 0
    cpb_size_scale: int = 0
    bit_rate_value_minus1: list[int] = field(default_factory=list)
    cpb_size_value_minus1: list[int] = field(default_factory=list)
    cbr_flag: list[int] = field(default_factory=list)
    initial_cpb_removal_delay_length_minus1: int = 23
    cpb_removal_delay_length_minus1: int = 23
    dpb_output_delay_length_minus1: int = 23
    time_offset_length: int = 24


@dataclass
class VUI:
    aspect_ratio_info_present_flag: bool = False
    aspect_ratio_idc: int = 0
    sar_width: int = 0
    sar_height: int = 0
    overscan_info_present_flag: bool = False
    overscan_appropriate_flag: bool = False
    video_signal_type_present_flag: bool = False
    video_format: int = 5
    video_full_range_flag: bool = False
    colour_description_present_flag: bool = False
    colour_primaries: int = 2
    transfer_characteristics: int = 2
    matrix_coefficients: int = 2
    chroma_loc_info_present_flag: bool = False
    chroma_sample_loc_type_top_field: int = 0
    chroma_sample_loc_type_bottom_field: int = 0
    timing_info_present_flag: bool = False
    num_units_in_tick: int = 0
    time_scale: int = 0
    fixed_frame_rate_flag: bool = False
    nal_hrd: HRD | None = None
    vcl_hrd: HRD | None = None
    low_delay_hrd_flag: bool = False
    pic_struct_present_flag: bool = False
    bitstream_restriction_flag: bool = False
    motion_vectors_over_pic_boundaries_flag: bool = True
    max_bytes_per_pic_denom: int = 2
    max_bits_per_mb_denom: int = 1
    log2_max_mv_length_horizontal: int = 16
    log2_max_mv_length_vertical: int = 16
    num_reorder_frames: int = 16
    max_dec_frame_buffering: int = 16


@dataclass
class SPS:
    profile_idc: int = 66
    constraint_flags: int = 0  # constrained_set0..3 + reserved, 8 bits total
    level_idc: int = 30
    seq_parameter_set_id: int = 0
    chroma_format_idc: int = 1  # 0 mono, 1 4:2:0, 2 4:2:2, 3 4:4:4
    separate_colour_plane_flag: bool = False
    bit_depth_luma_minus8: int = 0
    bit_depth_chroma_minus8: int = 0
    qpprime_y_zero_transform_bypass_flag: bool = False
    seq_scaling_matrix_present_flag: bool = False
    # 8 lists: 4x4 {intraY,intraCb,intraCr,interY,interCb,interCr} + 8x8 {intraY,interY}
    scaling_list_present: list[bool] = field(default_factory=lambda: [False] * 8)
    scaling_lists_4x4: list[list[int]] = field(
        default_factory=lambda: [list(FLAT_16) for _ in range(6)]
    )
    scaling_lists_8x8: list[list[int]] = field(
        default_factory=lambda: [list(FLAT_64) for _ in range(2)]
    )
    log2_max_frame_num_minus4: int = 0
    pic_order_cnt_type: int = 0
    log2_max_pic_order_cnt_lsb_minus4: int = 0
    delta_pic_order_always_zero_flag: bool = False
    offset_for_non_ref_pic: int = 0
    offset_for_top_to_bottom_field: int = 0
    offset_for_ref_frame: list[int] = field(default_factory=list)
    num_ref_frames: int = 1
    gaps_in_frame_num_value_allowed_flag: bool = False
    pic_width_in_mbs_minus1: int = 0
    pic_height_in_map_units_minus1: int = 0
    frame_mbs_only_flag: bool = True
    mb_adaptive_frame_field_flag: bool = False
    direct_8x8_inference_flag: bool = True
    frame_cropping_flag: bool = False
    frame_crop_left_offset: int = 0
    frame_crop_right_offset: int = 0
    frame_crop_top_offset: int = 0
    frame_crop_bottom_offset: int = 0
    vui_parameters_present_flag: bool = False
    vui: VUI | None = None

    # -- derived ----------------------------------------------------------
    @property
    def pic_width_in_mbs(self) -> int:
        return self.pic_width_in_mbs_minus1 + 1

    @property
    def frame_height_in_mbs(self) -> int:
        return (2 - int(self.frame_mbs_only_flag)) * (
            self.pic_height_in_map_units_minus1 + 1
        )

    @property
    def width(self) -> int:
        return 16 * self.pic_width_in_mbs

    @property
    def height(self) -> int:
        return 16 * self.frame_height_in_mbs

    @property
    def bit_depth_luma(self) -> int:
        return 8 + self.bit_depth_luma_minus8

    @property
    def bit_depth_chroma(self) -> int:
        return 8 + self.bit_depth_chroma_minus8

    @property
    def max_frame_num(self) -> int:
        return 1 << (self.log2_max_frame_num_minus4 + 4)

    @property
    def max_pic_order_cnt_lsb(self) -> int:
        return 1 << (self.log2_max_pic_order_cnt_lsb_minus4 + 4)

    @property
    def chroma_shift(self) -> tuple[int, int]:
        """(x_shift, y_shift) luma->chroma subsampling."""
        return {0: (0, 0), 1: (1, 1), 2: (1, 0), 3: (0, 0)}[self.chroma_format_idc]

    @property
    def mb_chroma_size(self) -> tuple[int, int]:
        """(width, height) of one macroblock's chroma block per component."""
        sx, sy = self.chroma_shift
        if self.chroma_format_idc == 0:
            return (0, 0)
        return (16 >> sx, 16 >> sy)


@dataclass
class PPS:
    pic_parameter_set_id: int = 0
    seq_parameter_set_id: int = 0
    entropy_coding_mode_flag: bool = False  # 0 CAVLC, 1 CABAC
    bottom_field_pic_order_in_frame_present_flag: bool = False
    num_slice_groups_minus1: int = 0
    slice_group_map_type: int = 0
    run_length_minus1: list[int] = field(default_factory=list)
    top_left: list[int] = field(default_factory=list)
    bottom_right: list[int] = field(default_factory=list)
    slice_group_change_direction_flag: bool = False
    slice_group_change_rate_minus1: int = 0
    pic_size_in_map_units_minus1: int = 0
    slice_group_id: list[int] = field(default_factory=list)
    num_ref_idx_l0_default_active_minus1: int = 0
    num_ref_idx_l1_default_active_minus1: int = 0
    weighted_pred_flag: bool = False
    weighted_bipred_idc: int = 0
    pic_init_qp_minus26: int = 0
    pic_init_qs_minus26: int = 0
    chroma_qp_index_offset: int = 0
    deblocking_filter_control_present_flag: bool = False
    constrained_intra_pred_flag: bool = False
    redundant_pic_cnt_present_flag: bool = False
    # FRExt extension
    transform_8x8_mode_flag: bool = False
    pic_scaling_matrix_present_flag: bool = False
    pic_scaling_list_present: list[bool] = field(default_factory=lambda: [False] * 8)
    scaling_lists_4x4: list[list[int]] | None = None
    scaling_lists_8x8: list[list[int]] | None = None
    second_chroma_qp_index_offset: int | None = None

    @property
    def chroma_qp_offset(self) -> tuple[int, int]:
        cb = self.chroma_qp_index_offset
        cr = (
            self.second_chroma_qp_index_offset
            if self.second_chroma_qp_index_offset is not None
            else cb
        )
        return cb, cr


# ---------------------------------------------------------------------------
# scaling_list() syntax (spec §7.3.2.1.1)
# ---------------------------------------------------------------------------

def _parse_scaling_list(r: BitReader, size: int, default: list[int], fallback: list[int]):
    scan = ZIGZAG_4x4 if size == 16 else ZIGZAG_8x8
    out = [0] * size
    last_scale, next_scale = 8, 8
    use_default = False
    for j in range(size):
        if next_scale != 0:
            delta = r.se()
            next_scale = (last_scale + delta + 256) % 256
            use_default = j == 0 and next_scale == 0
        out[scan[j]] = last_scale if next_scale == 0 else next_scale
        last_scale = out[scan[j]]
    if use_default:
        return list(default), True
    return out, False


def _write_scaling_list(w: BitWriter, values: list[int], size: int):
    scan = ZIGZAG_4x4 if size == 16 else ZIGZAG_8x8
    last_scale = 8
    for j in range(size):
        cur = values[scan[j]]
        delta = (cur - last_scale) % 256
        if delta > 127:
            delta -= 256
        w.se(delta)
        last_scale = cur


def _unzig(vals: list[int]) -> list[int]:
    """Spec default lists are given in scan (transmission) order; resolve
    to raster so they compose with the un-zigzagged parsed lists."""
    scan = ZIGZAG_4x4 if len(vals) == 16 else ZIGZAG_8x8
    out = [0] * len(vals)
    for j, v in enumerate(vals):
        out[scan[j]] = v
    return out


# raster-order default matrices (used for fall-back and use_default)
_SL_DEFAULTS_4x4 = ([_unzig(DEFAULT_4x4_INTRA)] * 3
                    + [_unzig(DEFAULT_4x4_INTER)] * 3)
_SL_DEFAULTS_8x8 = [_unzig(DEFAULT_8x8_INTRA), _unzig(DEFAULT_8x8_INTER)]


def _parse_scaling_matrices(r: BitReader, n_lists: int, sl4: list, sl8: list, present: list):
    """Shared SPS/PPS scaling-matrix parse with fall-back rule A (Table 7-2)."""
    for i in range(n_lists):
        present[i] = r.flag()
        if i < 6:
            if present[i]:
                vals, used_default = _parse_scaling_list(
                    r, 16, _SL_DEFAULTS_4x4[i], sl4[i - 1] if i else FLAT_16
                )
                sl4[i] = vals
            else:
                # fallback: list 0/3 -> default; else previous list
                if i in (0, 3):
                    sl4[i] = list(_SL_DEFAULTS_4x4[i])
                else:
                    sl4[i] = list(sl4[i - 1])
        else:
            k = i - 6
            if present[i]:
                vals, _ = _parse_scaling_list(r, 64, _SL_DEFAULTS_8x8[k], FLAT_64)
                sl8[k] = vals
            else:
                sl8[k] = list(_SL_DEFAULTS_8x8[k])


def effective_scaling(sps: "SPS", pps: "PPS"):
    """Effective WeightScale matrices for a picture, or None when flat.

    Combines SPS and PPS scaling lists per Table 7-2: SPS lists were
    resolved with fall-back rule A at parse time; PPS lists not present
    fall back to the SPS-effective list for i in {0,3,6,7} (rule B) when
    the SPS matrix is present, else rule A, and to the previous
    PPS-effective list otherwise.  (ldecod/src/parset.c
    activate_sps/activate_pps -> assign_quant_params, q_matrix semantics
    of ldecod/src/quant.c.)

    Returns (ws4, ws8): ws4 (6,4,4) int32 raster matrices for lists
    Intra-Y/Cb/Cr, Inter-Y/Cb/Cr; ws8 (2,8,8) for Intra-Y8/Inter-Y8.
    """
    import numpy as np

    seq = sps.seq_scaling_matrix_present_flag
    pic = pps.pic_scaling_matrix_present_flag
    if not seq and not pic:
        return None
    if seq:
        sl4 = [list(v) for v in sps.scaling_lists_4x4]
        sl8 = [list(v) for v in sps.scaling_lists_8x8]
    else:
        sl4 = [list(FLAT_16) for _ in range(6)]
        sl8 = [list(FLAT_64) for _ in range(2)]
    if pic:
        for i in range(8):
            if pps.pic_scaling_list_present[i]:
                if i < 6:
                    sl4[i] = list(pps.scaling_lists_4x4[i])
                else:
                    sl8[i - 6] = list(pps.scaling_lists_8x8[i - 6])
            elif i in (0, 3):
                if not seq:  # rule A: default matrix
                    sl4[i] = list(_SL_DEFAULTS_4x4[i])
                # rule B: keep SPS-effective (already in sl4)
            elif i < 6:
                sl4[i] = list(sl4[i - 1])
            elif not seq:  # i in (6, 7), rule A
                sl8[i - 6] = list(_SL_DEFAULTS_8x8[i - 6])
            # i in (6,7) rule B: keep SPS-effective
    ws4 = np.array(sl4, np.int32).reshape(6, 4, 4)
    ws8 = np.array(sl8, np.int32).reshape(2, 8, 8)
    return ws4, ws8


# ---------------------------------------------------------------------------
# SPS
# ---------------------------------------------------------------------------

def _parse_hrd(r: BitReader) -> HRD:
    h = HRD()
    h.cpb_cnt_minus1 = r.ue()
    h.bit_rate_scale = r.u(4)
    h.cpb_size_scale = r.u(4)
    for _ in range(h.cpb_cnt_minus1 + 1):
        h.bit_rate_value_minus1.append(r.ue())
        h.cpb_size_value_minus1.append(r.ue())
        h.cbr_flag.append(r.u(1))
    h.initial_cpb_removal_delay_length_minus1 = r.u(5)
    h.cpb_removal_delay_length_minus1 = r.u(5)
    h.dpb_output_delay_length_minus1 = r.u(5)
    h.time_offset_length = r.u(5)
    return h


def _parse_vui(r: BitReader) -> VUI:
    v = VUI()
    v.aspect_ratio_info_present_flag = r.flag()
    if v.aspect_ratio_info_present_flag:
        v.aspect_ratio_idc = r.u(8)
        if v.aspect_ratio_idc == 255:  # Extended_SAR
            v.sar_width = r.u(16)
            v.sar_height = r.u(16)
    v.overscan_info_present_flag = r.flag()
    if v.overscan_info_present_flag:
        v.overscan_appropriate_flag = r.flag()
    v.video_signal_type_present_flag = r.flag()
    if v.video_signal_type_present_flag:
        v.video_format = r.u(3)
        v.video_full_range_flag = r.flag()
        v.colour_description_present_flag = r.flag()
        if v.colour_description_present_flag:
            v.colour_primaries = r.u(8)
            v.transfer_characteristics = r.u(8)
            v.matrix_coefficients = r.u(8)
    v.chroma_loc_info_present_flag = r.flag()
    if v.chroma_loc_info_present_flag:
        v.chroma_sample_loc_type_top_field = r.ue()
        v.chroma_sample_loc_type_bottom_field = r.ue()
    v.timing_info_present_flag = r.flag()
    if v.timing_info_present_flag:
        v.num_units_in_tick = r.u(32)
        v.time_scale = r.u(32)
        v.fixed_frame_rate_flag = r.flag()
    nal_hrd_present = r.flag()
    if nal_hrd_present:
        v.nal_hrd = _parse_hrd(r)
    vcl_hrd_present = r.flag()
    if vcl_hrd_present:
        v.vcl_hrd = _parse_hrd(r)
    if nal_hrd_present or vcl_hrd_present:
        v.low_delay_hrd_flag = r.flag()
    v.pic_struct_present_flag = r.flag()
    v.bitstream_restriction_flag = r.flag()
    if v.bitstream_restriction_flag:
        v.motion_vectors_over_pic_boundaries_flag = r.flag()
        v.max_bytes_per_pic_denom = r.ue()
        v.max_bits_per_mb_denom = r.ue()
        v.log2_max_mv_length_horizontal = r.ue()
        v.log2_max_mv_length_vertical = r.ue()
        v.num_reorder_frames = r.ue()
        v.max_dec_frame_buffering = r.ue()
    return v


def parse_sps(rbsp: bytes) -> SPS:
    r = BitReader(rbsp)
    s = SPS()
    s.profile_idc = r.u(8)
    s.constraint_flags = r.u(8)
    s.level_idc = r.u(8)
    s.seq_parameter_set_id = r.ue()
    if s.profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        s.chroma_format_idc = r.ue()
        if s.chroma_format_idc == 3:
            s.separate_colour_plane_flag = r.flag()
        s.bit_depth_luma_minus8 = r.ue()
        s.bit_depth_chroma_minus8 = r.ue()
        s.qpprime_y_zero_transform_bypass_flag = r.flag()
        s.seq_scaling_matrix_present_flag = r.flag()
        if s.seq_scaling_matrix_present_flag:
            n = 8 if s.chroma_format_idc != 3 else 12
            _parse_scaling_matrices(
                r, n, s.scaling_lists_4x4, s.scaling_lists_8x8, s.scaling_list_present
            )
    s.log2_max_frame_num_minus4 = r.ue()
    s.pic_order_cnt_type = r.ue()
    if s.pic_order_cnt_type == 0:
        s.log2_max_pic_order_cnt_lsb_minus4 = r.ue()
    elif s.pic_order_cnt_type == 1:
        s.delta_pic_order_always_zero_flag = r.flag()
        s.offset_for_non_ref_pic = r.se()
        s.offset_for_top_to_bottom_field = r.se()
        n = r.ue()
        s.offset_for_ref_frame = [r.se() for _ in range(n)]
    s.num_ref_frames = r.ue()
    s.gaps_in_frame_num_value_allowed_flag = r.flag()
    s.pic_width_in_mbs_minus1 = r.ue()
    s.pic_height_in_map_units_minus1 = r.ue()
    s.frame_mbs_only_flag = r.flag()
    if not s.frame_mbs_only_flag:
        s.mb_adaptive_frame_field_flag = r.flag()
    s.direct_8x8_inference_flag = r.flag()
    s.frame_cropping_flag = r.flag()
    if s.frame_cropping_flag:
        s.frame_crop_left_offset = r.ue()
        s.frame_crop_right_offset = r.ue()
        s.frame_crop_top_offset = r.ue()
        s.frame_crop_bottom_offset = r.ue()
    s.vui_parameters_present_flag = r.flag()
    if s.vui_parameters_present_flag:
        s.vui = _parse_vui(r)
    return s


def write_sps(s: SPS) -> bytes:
    w = BitWriter()
    w.u(s.profile_idc, 8)
    w.u(s.constraint_flags, 8)
    w.u(s.level_idc, 8)
    w.ue(s.seq_parameter_set_id)
    if s.profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        w.ue(s.chroma_format_idc)
        if s.chroma_format_idc == 3:
            w.flag(s.separate_colour_plane_flag)
        w.ue(s.bit_depth_luma_minus8)
        w.ue(s.bit_depth_chroma_minus8)
        w.flag(s.qpprime_y_zero_transform_bypass_flag)
        w.flag(s.seq_scaling_matrix_present_flag)
        if s.seq_scaling_matrix_present_flag:
            n = 8 if s.chroma_format_idc != 3 else 12
            for i in range(n):
                w.flag(s.scaling_list_present[i])
                if s.scaling_list_present[i]:
                    if i < 6:
                        _write_scaling_list(w, s.scaling_lists_4x4[i], 16)
                    else:
                        _write_scaling_list(w, s.scaling_lists_8x8[i - 6], 64)
    w.ue(s.log2_max_frame_num_minus4)
    w.ue(s.pic_order_cnt_type)
    if s.pic_order_cnt_type == 0:
        w.ue(s.log2_max_pic_order_cnt_lsb_minus4)
    elif s.pic_order_cnt_type == 1:
        w.flag(s.delta_pic_order_always_zero_flag)
        w.se(s.offset_for_non_ref_pic)
        w.se(s.offset_for_top_to_bottom_field)
        w.ue(len(s.offset_for_ref_frame))
        for off in s.offset_for_ref_frame:
            w.se(off)
    w.ue(s.num_ref_frames)
    w.flag(s.gaps_in_frame_num_value_allowed_flag)
    w.ue(s.pic_width_in_mbs_minus1)
    w.ue(s.pic_height_in_map_units_minus1)
    w.flag(s.frame_mbs_only_flag)
    if not s.frame_mbs_only_flag:
        w.flag(s.mb_adaptive_frame_field_flag)
    w.flag(s.direct_8x8_inference_flag)
    w.flag(s.frame_cropping_flag)
    if s.frame_cropping_flag:
        w.ue(s.frame_crop_left_offset)
        w.ue(s.frame_crop_right_offset)
        w.ue(s.frame_crop_top_offset)
        w.ue(s.frame_crop_bottom_offset)
    w.flag(s.vui_parameters_present_flag)
    if s.vui_parameters_present_flag:
        _write_vui(w, s.vui)
    w.rbsp_trailing_bits()
    return w.get_bytes()


def _write_hrd(w: BitWriter, h: HRD) -> None:
    w.ue(h.cpb_cnt_minus1)
    w.u(h.bit_rate_scale, 4)
    w.u(h.cpb_size_scale, 4)
    for k in range(h.cpb_cnt_minus1 + 1):
        w.ue(h.bit_rate_value_minus1[k])
        w.ue(h.cpb_size_value_minus1[k])
        w.u(h.cbr_flag[k], 1)
    w.u(h.initial_cpb_removal_delay_length_minus1, 5)
    w.u(h.cpb_removal_delay_length_minus1, 5)
    w.u(h.dpb_output_delay_length_minus1, 5)
    w.u(h.time_offset_length, 5)


def _write_vui(w: BitWriter, v: VUI) -> None:
    """vui_parameters() writer (spec §E.1.1, mirror of _parse_vui;
    lencod/src/vlc.c GenerateVUISequenceParameters)."""
    w.flag(v.aspect_ratio_info_present_flag)
    if v.aspect_ratio_info_present_flag:
        w.u(v.aspect_ratio_idc, 8)
        if v.aspect_ratio_idc == 255:
            w.u(v.sar_width, 16)
            w.u(v.sar_height, 16)
    w.flag(v.overscan_info_present_flag)
    if v.overscan_info_present_flag:
        w.flag(v.overscan_appropriate_flag)
    w.flag(v.video_signal_type_present_flag)
    if v.video_signal_type_present_flag:
        w.u(v.video_format, 3)
        w.flag(v.video_full_range_flag)
        w.flag(v.colour_description_present_flag)
        if v.colour_description_present_flag:
            w.u(v.colour_primaries, 8)
            w.u(v.transfer_characteristics, 8)
            w.u(v.matrix_coefficients, 8)
    w.flag(v.chroma_loc_info_present_flag)
    if v.chroma_loc_info_present_flag:
        w.ue(v.chroma_sample_loc_type_top_field)
        w.ue(v.chroma_sample_loc_type_bottom_field)
    w.flag(v.timing_info_present_flag)
    if v.timing_info_present_flag:
        w.u(v.num_units_in_tick, 32)
        w.u(v.time_scale, 32)
        w.flag(v.fixed_frame_rate_flag)
    w.flag(v.nal_hrd is not None)
    if v.nal_hrd is not None:
        _write_hrd(w, v.nal_hrd)
    w.flag(v.vcl_hrd is not None)
    if v.vcl_hrd is not None:
        _write_hrd(w, v.vcl_hrd)
    if v.nal_hrd is not None or v.vcl_hrd is not None:
        w.flag(v.low_delay_hrd_flag)
    w.flag(v.pic_struct_present_flag)
    w.flag(v.bitstream_restriction_flag)
    if v.bitstream_restriction_flag:
        w.flag(v.motion_vectors_over_pic_boundaries_flag)
        w.ue(v.max_bytes_per_pic_denom)
        w.ue(v.max_bits_per_mb_denom)
        w.ue(v.log2_max_mv_length_horizontal)
        w.ue(v.log2_max_mv_length_vertical)
        w.ue(v.num_reorder_frames)
        w.ue(v.max_dec_frame_buffering)


# ---------------------------------------------------------------------------
# PPS
# ---------------------------------------------------------------------------

def parse_pps(rbsp: bytes, chroma_format_idc: int = 1) -> PPS:
    r = BitReader(rbsp)
    p = PPS()
    p.pic_parameter_set_id = r.ue()
    p.seq_parameter_set_id = r.ue()
    p.entropy_coding_mode_flag = r.flag()
    p.bottom_field_pic_order_in_frame_present_flag = r.flag()
    p.num_slice_groups_minus1 = r.ue()
    if p.num_slice_groups_minus1 > 0:
        p.slice_group_map_type = r.ue()
        t = p.slice_group_map_type
        n = p.num_slice_groups_minus1
        if t == 0:
            p.run_length_minus1 = [r.ue() for _ in range(n + 1)]
        elif t == 2:
            for _ in range(n):
                p.top_left.append(r.ue())
                p.bottom_right.append(r.ue())
        elif t in (3, 4, 5):
            p.slice_group_change_direction_flag = r.flag()
            p.slice_group_change_rate_minus1 = r.ue()
        elif t == 6:
            p.pic_size_in_map_units_minus1 = r.ue()
            import math

            bits = max(1, math.ceil(math.log2(n + 1)))
            p.slice_group_id = [
                r.u(bits) for _ in range(p.pic_size_in_map_units_minus1 + 1)
            ]
    p.num_ref_idx_l0_default_active_minus1 = r.ue()
    p.num_ref_idx_l1_default_active_minus1 = r.ue()
    p.weighted_pred_flag = r.flag()
    p.weighted_bipred_idc = r.u(2)
    p.pic_init_qp_minus26 = r.se()
    p.pic_init_qs_minus26 = r.se()
    p.chroma_qp_index_offset = r.se()
    p.deblocking_filter_control_present_flag = r.flag()
    p.constrained_intra_pred_flag = r.flag()
    p.redundant_pic_cnt_present_flag = r.flag()
    if r.more_rbsp_data():  # FRExt extension
        p.transform_8x8_mode_flag = r.flag()
        p.pic_scaling_matrix_present_flag = r.flag()
        if p.pic_scaling_matrix_present_flag:
            p.scaling_lists_4x4 = [list(FLAT_16) for _ in range(6)]
            p.scaling_lists_8x8 = [list(FLAT_64) for _ in range(2)]
            n = 6 + (2 if p.transform_8x8_mode_flag else 0) * (
                1 if chroma_format_idc != 3 else 3
            )
            _parse_scaling_matrices(
                r, n, p.scaling_lists_4x4, p.scaling_lists_8x8, p.pic_scaling_list_present
            )
        p.second_chroma_qp_index_offset = r.se()
    return p


def write_pps(p: PPS) -> bytes:
    w = BitWriter()
    w.ue(p.pic_parameter_set_id)
    w.ue(p.seq_parameter_set_id)
    w.flag(p.entropy_coding_mode_flag)
    w.flag(p.bottom_field_pic_order_in_frame_present_flag)
    w.ue(p.num_slice_groups_minus1)
    if p.num_slice_groups_minus1 > 0:
        w.ue(p.slice_group_map_type)
        t = p.slice_group_map_type
        if t == 0:
            for v in p.run_length_minus1:
                w.ue(v)
        elif t == 2:
            for tl, br in zip(p.top_left, p.bottom_right):
                w.ue(tl)
                w.ue(br)
        elif t in (3, 4, 5):
            w.flag(p.slice_group_change_direction_flag)
            w.ue(p.slice_group_change_rate_minus1)
        elif t == 6:
            import math

            w.ue(p.pic_size_in_map_units_minus1)
            bits = max(1, math.ceil(math.log2(p.num_slice_groups_minus1 + 1)))
            for v in p.slice_group_id:
                w.u(v, bits)
    w.ue(p.num_ref_idx_l0_default_active_minus1)
    w.ue(p.num_ref_idx_l1_default_active_minus1)
    w.flag(p.weighted_pred_flag)
    w.u(p.weighted_bipred_idc, 2)
    w.se(p.pic_init_qp_minus26)
    w.se(p.pic_init_qs_minus26)
    w.se(p.chroma_qp_index_offset)
    w.flag(p.deblocking_filter_control_present_flag)
    w.flag(p.constrained_intra_pred_flag)
    w.flag(p.redundant_pic_cnt_present_flag)
    if p.transform_8x8_mode_flag or p.second_chroma_qp_index_offset is not None:
        w.flag(p.transform_8x8_mode_flag)
        w.flag(p.pic_scaling_matrix_present_flag)
        if p.pic_scaling_matrix_present_flag:
            n = 6 + (2 if p.transform_8x8_mode_flag else 0)
            for i in range(n):
                w.flag(p.pic_scaling_list_present[i])
                if not p.pic_scaling_list_present[i]:
                    continue
                if i < 6:
                    _write_scaling_list(w, p.scaling_lists_4x4[i], 16)
                else:
                    _write_scaling_list(w, p.scaling_lists_8x8[i - 6], 64)
        w.se(
            p.second_chroma_qp_index_offset
            if p.second_chroma_qp_index_offset is not None
            else p.chroma_qp_index_offset
        )
    w.rbsp_trailing_bits()
    return w.get_bytes()
