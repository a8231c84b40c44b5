"""Top-level H.264 decoder: NAL stream -> decoded frames.

Host-side orchestration (the JM ldecod.c/image.c role): NAL iteration,
parameter-set activation, picture boundary detection, slice parse
dispatch, reconstruction, deblocking, DPB/output ordering.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream import NalUnitType, iter_annexb_nalus
from ..syntax.parsets import PPS, SPS, parse_pps, parse_sps
from ..syntax.slice_header import SliceHeader, SliceType, parse_slice_header
from ..ops.deblock import deblock_picture
from .cabac_mb import CabacSliceParser
from .recon import IntraReconstructor, Planes
from .state import PictureParseState


@dataclass
class DecodedPicture:
    poc: int
    frame_num: int
    planes: Planes
    state: PictureParseState
    is_ref: bool
    is_idr: bool
    slice_type: SliceType
    pic_num: int = 0
    long_term: bool = False

    def to_yuv_bytes(self) -> bytes:
        return self.planes.to_yuv_bytes()


class H264Decoder:
    """Decodes an Annex-B stream; yields pictures in decode order."""

    def __init__(self):
        self.sps_map: dict[int, SPS] = {}
        self.pps_map: dict[int, PPS] = {}
        self.prev_poc_msb = 0
        self.prev_poc_lsb = 0
        self.prev_frame_num = 0
        self.prev_frame_num_offset = 0
        self.dpb: list[DecodedPicture] = []

    # -- POC (spec §8.2.1, type 0 and 2) ----------------------------------
    def _compute_poc(self, sh: SliceHeader, sps: SPS) -> int:
        if sps.pic_order_cnt_type == 0:
            max_lsb = sps.max_pic_order_cnt_lsb
            if sh.is_idr:
                self.prev_poc_msb = 0
                self.prev_poc_lsb = 0
            lsb = sh.pic_order_cnt_lsb
            if lsb < self.prev_poc_lsb and (self.prev_poc_lsb - lsb) >= max_lsb // 2:
                msb = self.prev_poc_msb + max_lsb
            elif lsb > self.prev_poc_lsb and (lsb - self.prev_poc_lsb) > max_lsb // 2:
                msb = self.prev_poc_msb - max_lsb
            else:
                msb = self.prev_poc_msb
            poc = msb + lsb
            if sh.nal_ref_idc:
                self.prev_poc_msb = msb
                self.prev_poc_lsb = lsb
            return poc
        if sps.pic_order_cnt_type == 2:
            if sh.is_idr:
                self.prev_frame_num_offset = 0
                off = 0
            else:
                if sh.frame_num < self.prev_frame_num:
                    off = self.prev_frame_num_offset + sps.max_frame_num
                else:
                    off = self.prev_frame_num_offset
                self.prev_frame_num_offset = off
            tmp = off + sh.frame_num
            return 2 * tmp if sh.nal_ref_idc else 2 * tmp - 1
        raise NotImplementedError("poc type 1")

    # -- main decode loop --------------------------------------------------
    def decode_stream(self, data: bytes):
        """Generator of DecodedPicture in decode order."""
        pending = None  # (state, planes, slices-info)
        for nalu in iter_annexb_nalus(data):
            t = nalu.nal_unit_type
            if t == NalUnitType.SPS:
                s = parse_sps(nalu.rbsp)
                self.sps_map[s.seq_parameter_set_id] = s
            elif t == NalUnitType.PPS:
                p = parse_pps(nalu.rbsp)
                self.pps_map[p.pic_parameter_set_id] = p
            elif t in (NalUnitType.SLICE, NalUnitType.IDR):
                sh, sps, pps = parse_slice_header(
                    nalu.rbsp, self.sps_map, self.pps_map, nalu.nal_ref_idc,
                    nalu.is_idr,
                )
                poc = self._compute_poc(sh, sps)
                self.prev_frame_num = sh.frame_num
                is_new = pending is None or self._is_new_picture(pending, sh, poc)
                if is_new and pending is not None:
                    yield self._finish_picture(pending)
                    pending = None
                if pending is None:
                    state = PictureParseState(
                        sps.pic_width_in_mbs, sps.frame_height_in_mbs
                    )
                    pending = {
                        "state": state,
                        "sps": sps,
                        "pps": pps,
                        "poc": poc,
                        "sh0": sh,
                        "slices": [],
                        "n_slices": 0,
                    }
                self._parse_slice(pending, nalu.rbsp, sh, sps, pps)
        if pending is not None:
            yield self._finish_picture(pending)

    def _is_new_picture(self, pending, sh: SliceHeader, poc: int) -> bool:
        sh0: SliceHeader = pending["sh0"]
        return (
            sh.frame_num != sh0.frame_num
            or poc != pending["poc"]
            or sh.pic_parameter_set_id != sh0.pic_parameter_set_id
            or (sh.is_idr != sh0.is_idr)
            or (sh.is_idr and sh.idr_pic_id != sh0.idr_pic_id)
            or sh.first_mb_in_slice == 0
        )

    def _parse_slice(self, pending, rbsp: bytes, sh: SliceHeader, sps, pps):
        state = pending["state"]
        sid = pending["n_slices"]
        pending["n_slices"] += 1
        if not pps.entropy_coding_mode_flag:
            raise NotImplementedError("CAVLC slice decode")
        parser = CabacSliceParser(rbsp, sh, sps, pps, state, sid)
        parser.trace = None
        parser.parse()
        pending["slices"].append(sh)

    def _finish_picture(self, pending) -> DecodedPicture:
        state: PictureParseState = pending["state"]
        sps: SPS = pending["sps"]
        pps: PPS = pending["pps"]
        sh0: SliceHeader = pending["sh0"]
        planes = Planes(sps)
        stype = sh0.slice_type
        if stype == SliceType.I:
            recon = IntraReconstructor(state, sps, pps, planes)
            for addr in range(state.n_mbs):
                recon.recon_mb(addr)
        else:
            raise NotImplementedError("inter picture reconstruction")
        deblock_picture(state, sps, planes)
        pic = DecodedPicture(
            poc=pending["poc"],
            frame_num=sh0.frame_num,
            planes=planes,
            state=state,
            is_ref=sh0.nal_ref_idc != 0,
            is_idr=sh0.is_idr,
            slice_type=stype,
        )
        return pic


def decode_annexb(data: bytes) -> list[DecodedPicture]:
    return list(H264Decoder().decode_stream(data))
