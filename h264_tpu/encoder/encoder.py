"""H.264 encoder: Baseline-profile I/P CAVLC encoder (M2 slice).

Architecture (SURVEY.md §7): motion estimation runs as whole-frame
batched SAD grids on device (me.py); the MB loop is host-sequential for
the entropy/prediction dependency chain, using the same exact-integer
kernels as the decoder (ops/) so the encoder reconstruction is identical
to any conformant decoder's output; deblocking and bitstream writing are
shared with the decoder modules.

Capability reference: md_low-style cost decisions (lencod/src/md_low.c),
full-search ME (me_fullfast.c), fixed QP.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream import NalUnit, write_annexb
from ..bitstream.writer import BitWriter
from ..decoder import mbtables as M
from ..decoder.mv import (
    pmv as predict_mv,
    _pskip_mv,
    _neighbor_info,
    _spatial_direct,
    compute_moving_mask,
)
from ..decoder.recon import Planes, _add_residual
from ..decoder.state import PictureParseState
from ..ops import interp as MC
from ..ops import intra as IP
from ..ops import quant as Q
from ..ops import transforms as TR
from ..ops.deblock import deblock_picture
from ..ops.exact import chroma_qp
from ..syntax.parsets import PPS, SPS, write_pps, write_sps
from ..syntax.slice_header import SliceHeader, SliceType, write_slice_header
from . import me as ME
from .syntax_cavlc import CavlcSliceWriter
from .syntax_cabac import CabacSliceWriter
from . import fast as FAST
from . import fills as FL
from . import rd as RD

_ZZ4 = M.ZZ_SCAN_4x4


@dataclass
class EncoderConfig:
    width: int
    height: int
    qp: int = 28
    search_range: int = 16
    idr_period: int = 0  # 0: only first frame is IDR
    enable_i4: bool = True
    enable_deblock: bool = True
    subpel: bool = True
    num_ref_frames: int = 1
    fast: bool = False  # device-batched P-frame pipeline
    rd: bool = True  # RD mode decision in the fast path (partitions,
    # multi-ref, skip-RD, intra-in-P); False = legacy P16x16-only path
    row_slices: int = 1  # tile-row slice groups in the rd fast path: each
    # group is an independent slice (deblock idc=2) — the unit of
    # tile-row sharding across chips (rd.rd_p_rows_pipeline)
    entropy: str = "cavlc"  # "cavlc" (Baseline) or "cabac" (Main)
    pipeline_depth: int = 8  # frames in flight in encode_stream
    b_frames: int = 0  # B pictures between anchors (0 = IPPP)
    qp_b_offset: int = 2  # QP delta for (non-reference) B pictures
    b_hierarchy: bool = False  # 2-layer B pyramid (b_frames == 3): the
    # middle B is a stored reference (explicit_gop.c:32 create_hierarchy)
    rc_bitrate: float = 0.0  # target bits/s; 0 disables rate control
    rc_fps: float = 30.0  # frame rate assumed by rate control
    # multi-slice / FMO (lencod SliceMode/SliceArgument + slice groups)
    slice_mode: int = 0  # 0: one slice per group; 1: fixed MBs per slice
    slice_argument: int = 0  # MBs per slice for slice_mode 1
    num_slice_groups: int = 1
    slice_group_map_type: int = 0
    slice_group_run_length: tuple = ()  # type 0 run lengths (MBs)
    slice_group_rects: tuple = ()  # type 2 (top_left, bottom_right) pairs
    slice_group_ids: tuple = ()  # type 6 explicit map
    slice_group_change_direction: bool = False  # types 3-5
    slice_group_change_rate: int = 1  # types 3-5 (map units)
    slice_group_change_cycle: int = 1  # types 3-5
    # SEI (lencod GenerateSEIMessage/SEIMessageText,
    # ToneMappingSEIPresentFlag/ToneMappingFile, + recovery point)
    sei_text: str = ""  # user_data_unregistered payload text
    sei_tone_mapping: object = None  # syntax.sei.ToneMapping or None
    sei_recovery_point: bool = False  # recovery point SEI at each IDR
    # FRExt / High profile (lencod Transform8x8Mode,
    # ScalingMatrixPresentFlag + q_matrix.cfg)
    transform8x8: bool = False  # allow 8x8 transform (host path)
    weighted_pred: bool = False  # P-slice explicit WP (DC-ratio luma
    # estimation, lencod/src/weighted_prediction.c:30); fast RD path
    redundant_pics: bool = False  # emit a redundant coded slice after
    # each primary P slice (host path; lencod.c:2718 redundant frames)
    loss_aware_k: int = 0  # loss-aware RDO: simulated lossy decoders
    # (lencod rdopt=3 NumberOfDecoders; 0 disables)
    loss_rate: float = 0.1  # per-frame slice loss probability (LossRateA)
    intra_refresh: int = 0  # forced-intra MBs per P frame (lencod
    # RandomIntraMBRefresh, intrarefresh.c:97): pseudo-random without
    # repetition until the whole frame has been refreshed
    partition_mode: int = 0  # 1: CAVLC data partitioning (DPA/DPB/DPC
    # NALs; spec §7.3.2.8-.10, lencod/src/header.c:541) on non-IDR pics
    scaling_lists: object = None  # (ws4 (6,4,4), ws8 (2,8,8)) raster or None


class H264Encoder:
    def __init__(self, cfg: EncoderConfig):
        assert cfg.width % 16 == 0 and cfg.height % 16 == 0
        from ..config import level_for, profile_check

        profile_check(cfg)
        self.cfg = cfg
        use_b = cfg.b_frames > 0
        self.sps = SPS(
            profile_idc=77 if (cfg.entropy == "cabac" or use_b) else 66,
            level_idc=max(30, level_for(
                cfg.width, cfg.height, cfg.rc_fps,
                cfg.num_ref_frames + (1 if use_b else 0))),
            # with B pictures the DPB must retain the list0 anchors PLUS
            # the future anchor (and the stored mid-B of a hierarchy), so
            # temporal-direct colocated references stay mappable into the
            # B slice's list0
            num_ref_frames=cfg.num_ref_frames + (2 if cfg.b_hierarchy
                                                 else 1) if use_b
            else cfg.num_ref_frames,
            pic_width_in_mbs_minus1=cfg.width // 16 - 1,
            pic_height_in_map_units_minus1=cfg.height // 16 - 1,
            # B reordering needs explicit POC (decode order != display order)
            pic_order_cnt_type=0 if use_b else 2,
            log2_max_pic_order_cnt_lsb_minus4=4,
            log2_max_frame_num_minus4=4,
        )
        self.pps = PPS(entropy_coding_mode_flag=(cfg.entropy == "cabac"))
        if cfg.b_hierarchy:
            assert cfg.b_frames == 3, "2-layer pyramid needs b_frames == 3"
            assert cfg.fast and cfg.rd, "hierarchy runs on the RD pipeline"
        if cfg.fast and cfg.search_range > 28:
            import warnings

            warnings.warn(
                f"device pipelines clamp SearchRange {cfg.search_range} "
                "-> 28 (dense-grid memory shape); the coarse-to-fine "
                "pre-search still reaches +-48 full-pel beyond it",
                stacklevel=2)
        self._src_dc: dict = {}  # poc -> source-luma mean (WP estimation)
        self._src_sd: dict = {}  # poc -> source-luma std (WP gain)
        self._src_ds: dict = {}  # poc -> 8x-decimated source luma (WP test)
        self._lsim = None
        if cfg.loss_aware_k > 0:
            from .lossaware import LossSimulator

            assert cfg.fast and cfg.rd, "loss-aware RDO runs on the RD path"
            self._lsim = LossSimulator(
                cfg.loss_aware_k, cfg.loss_rate, cfg.height, cfg.width)
        if cfg.weighted_pred:
            # P prediction weighting runs only in the device RD pipeline
            assert cfg.fast and cfg.rd and cfg.rc_bitrate == 0, (
                "weighted_pred requires the fast RD path")
            assert cfg.slice_mode == 0 and cfg.num_slice_groups == 1 \
                and cfg.row_slices == 1
            self.pps.weighted_pred_flag = True
        if cfg.transform8x8 or cfg.scaling_lists is not None:
            # High profile (FREXT_HP): 8x8 transform / scaling matrices
            # are signalled there (lencod/src/parset.c GenerateSPS)
            self.sps.profile_idc = 100
            self.pps.transform_8x8_mode_flag = bool(cfg.transform8x8)
            self.pps.second_chroma_qp_index_offset = 0
            # transform8x8 runs on the device RD pipeline; custom
            # scaling matrices still ride the host path
            assert not (cfg.fast and cfg.scaling_lists is not None), (
                "scaling matrices run on the host path (fast=False)")
        if cfg.scaling_lists is not None:
            import numpy as _np

            ws4, ws8 = cfg.scaling_lists
            self.sps.seq_scaling_matrix_present_flag = True
            self.sps.scaling_list_present = [True] * 8
            self.sps.scaling_lists_4x4 = [
                [int(v) for v in _np.asarray(ws4[i]).reshape(16)]
                for i in range(6)
            ]
            self.sps.scaling_lists_8x8 = [
                [int(v) for v in _np.asarray(ws8[i]).reshape(64)]
                for i in range(2)
            ]
            self._ws4 = _np.asarray(ws4, _np.int32).reshape(6, 4, 4)
            self._ws8 = _np.asarray(ws8, _np.int32).reshape(2, 8, 8)
        else:
            self._ws4 = None
            self._ws8 = None
        if cfg.redundant_pics:
            self.pps.redundant_pic_cnt_present_flag = True
        if cfg.row_slices > 1:
            # tile-row slices are deblocked independently (idc=2): the
            # slice header must carry the filter-control fields
            self.pps.deblocking_filter_control_present_flag = True
        if cfg.num_slice_groups > 1:
            p = self.pps
            p.num_slice_groups_minus1 = cfg.num_slice_groups - 1
            p.slice_group_map_type = cfg.slice_group_map_type
            t = cfg.slice_group_map_type
            n_mbs = (cfg.width // 16) * (cfg.height // 16)
            if t == 0:
                runs = cfg.slice_group_run_length or (1,) * cfg.num_slice_groups
                p.run_length_minus1 = [r - 1 for r in runs]
            elif t == 2:
                p.top_left = [tl for tl, _ in cfg.slice_group_rects]
                p.bottom_right = [br for _, br in cfg.slice_group_rects]
            elif t in (3, 4, 5):
                p.slice_group_change_direction_flag = (
                    cfg.slice_group_change_direction
                )
                p.slice_group_change_rate_minus1 = (
                    cfg.slice_group_change_rate - 1
                )
            elif t == 6:
                ids = list(cfg.slice_group_ids) or [0] * n_mbs
                p.slice_group_id = (ids + [0] * n_mbs)[:n_mbs]
                p.pic_size_in_map_units_minus1 = n_mbs - 1
        self._multi_slice = cfg.slice_mode != 0 or cfg.num_slice_groups > 1
        self.frame_num = 0
        self.idr_count = 0
        self.recon_pics: list = []  # (poc, planes, state, padded)
        self.all_recons: list = []  # (poc, planes) of every host-path picture
        self._dev_ref = None  # device-resident ref state (fast path)
        self._rd_refs: list = []  # [(poc, bank, cpad, col)] newest-first
        self._anchor_ref_pocs: dict = {}  # anchor poc -> its list0 pocs
        self._prev_poc = 0
        # JM lambda (lencod/src/slice.c:1261 SetLagrangianMultipliers,
        # rdopt on, no explicit params): base 0.68 when B pictures are in
        # use else 0.85, x0.95 for the non-SATD ME metric; B slices get
        # an extra clip3(2, 4, qp_temp/6) factor (applied in _start_b_rd)
        base = (0.68 if cfg.b_frames > 0 else 0.85) * 0.95
        lam = base * 2.0 ** ((cfg.qp - 12) / 3.0)
        self.lambda_me = int(np.sqrt(lam) * 65536 + 0.5)
        self.lambda_mode = lam
        # fast path searches in SSD units -> full lambda_mode weighting
        self.lambda_mode_fx = int(lam * 65536 + 0.5)
        self.rc = None
        if cfg.rc_bitrate > 0:
            from ..control.ratectl import RateControl

            self.rc = RateControl(
                cfg.rc_bitrate, cfg.rc_fps, cfg.width, cfg.height,
                gop_size=cfg.idr_period, n_b=cfg.b_frames,
            )

    # ------------------------------------------------------------------
    def headers(self) -> list[NalUnit]:
        out = [
            NalUnit(7, 3, write_sps(self.sps)),
            NalUnit(8, 3, write_pps(self.pps)),
        ]
        sei = self._sequence_sei()
        if sei:
            out.append(sei)
        return out

    def _sequence_sei(self) -> NalUnit | None:
        """One SEI NAL after the parameter sets (the lencod stream
        layout for tone mapping / text SEI: lencod/src/image.c:1398,
        sei.c write paths)."""
        from ..syntax.sei import (
            RecoveryPoint, ToneMapping, UserDataUnregistered, write_sei,
        )

        msgs = []
        if self.cfg.sei_tone_mapping is not None:
            msgs.append(self.cfg.sei_tone_mapping)
        if self.cfg.sei_text:
            msgs.append(UserDataUnregistered(
                uuid=bytes(16), data=self.cfg.sei_text.encode()))
        if self.cfg.sei_recovery_point:
            msgs.append(RecoveryPoint(recovery_frame_cnt=0))
        if not msgs:
            return None
        return NalUnit(6, 0, write_sei(msgs, {0: self.sps}))

    def encode_sequence(self, frames) -> bytes:
        """frames: list of (Y, U, V) uint8 arrays. Returns Annex-B bytes."""
        nalus = self.headers()
        for out in self.encode_stream(frames):
            nalus.extend(out)
        return write_annexb(nalus)

    def encode_stream(self, frames, depth: int | None = None):
        """Pipelined encode: yields a list of NalUnits per frame.

        Device steps run up to `depth` frames ahead of the host tail
        (entropy coding, NAL packing): the device chains P frames through
        device-resident reference state, so dispatch never waits on the
        host, and the host upload latency of frame N is amortized across
        the frames already in flight."""
        if self.cfg.b_frames > 0:
            yield from self._encode_stream_b(frames)
            return
        if depth is None:
            depth = self.cfg.pipeline_depth
        pend: list = []

        def drain(group):
            # one stacked d2h transfer for the whole group: the tunnel's
            # per-fetch latency is paid once per `depth` frames
            if not group:
                return
            if len(group) == 1:
                yield self._finish_p_fast(group[0])
                return
            rows = np.asarray(FAST.stack_outputs(
                [p[1] if isinstance(p[0], str) else p[0] for p in group]
            ))
            for row, p in zip(rows, group):
                yield self._finish_p_fast(p, fetched=row)

        if self.rc is not None and self.cfg.rd:
            # rate control runs on the device pipeline but needs per-frame
            # bit feedback before picking the next QP: depth 1 (the device
            # reference chain is unaffected; only the host tail serializes)
            depth = 1
        for idx, yuv in enumerate(frames):
            is_idr = idx == 0 or (
                self.cfg.idr_period and idx % self.cfg.idr_period == 0
            )
            if (is_idr or not self.cfg.fast
                    or (self.rc is not None and not self.cfg.rd)
                    or self._multi_slice):
                yield from drain(pend)
                pend = []
                yield self.encode_frame(yuv, is_idr)
            else:
                pend.append(self._start_p_fast(yuv))
                if len(pend) >= depth:
                    yield from drain(pend)
                    pend = []
        yield from drain(pend)

    def _encode_stream_b(self, frames):
        """Decode-order picture emission for a GOP with B pictures
        (capability parity: lencod NumberBFrames, lencod/src/lencod.c
        SetImgType + image.c B-frame loop).  Pattern I (B^n P)*: each
        anchor P is encoded before the B pictures it back-references;
        POC carries the display order (2 * display index)."""
        if (self.cfg.fast and self.cfg.rd and not self._multi_slice):
            yield from self._encode_stream_b_rd(frames)
            return
        nb = self.cfg.b_frames
        idr_p = self.cfg.idr_period
        pend: list = []  # buffered display frames awaiting their anchor
        base = 0  # display index of the last IDR
        for idx, yuv in enumerate(frames):
            is_idr = idx == 0 or (idr_p and idx % idr_p == 0)
            if is_idr:
                for b_yuv, b_idx in pend:  # close the GOP with P pictures
                    yield self._encode_picture(
                        b_yuv, SliceType.P, False, 2 * (b_idx - base)
                    )
                pend = []
                base = idx
                yield self._encode_picture(yuv, SliceType.I, True, 0)
            elif len(pend) < nb:
                pend.append((yuv, idx))
            else:
                yield self._encode_picture(
                    yuv, SliceType.P, False, 2 * (idx - base)
                )
                for b_yuv, b_idx in pend:
                    yield self._encode_picture(
                        b_yuv, SliceType.B, False, 2 * (b_idx - base)
                    )
                pend = []
        for b_yuv, b_idx in pend:
            yield self._encode_picture(
                b_yuv, SliceType.P, False, 2 * (b_idx - base)
            )

    # ------------------------------------------------------------------
    def encode_frame(self, yuv, is_idr: bool) -> list[NalUnit]:
        cfg = self.cfg
        if (not is_idr and cfg.fast and cfg.b_frames == 0
                and (self.rc is None or cfg.rd) and not self._multi_slice):
            return self._finish_p_fast(self._start_p_fast(yuv))
        stype = SliceType.I if is_idr else SliceType.P
        poc = 0 if is_idr else self._prev_poc + 2
        return self._encode_picture(yuv, stype, is_idr, poc)

    def _encode_picture(self, yuv, stype: SliceType, is_idr: bool,
                        poc: int) -> list[NalUnit]:
        cfg = self.cfg
        Y = np.asarray(yuv[0], np.int32)
        U = np.asarray(yuv[1], np.int32)
        V = np.asarray(yuv[2], np.int32)
        self._src_dc[poc] = float(Y.mean())
        self._src_sd[poc] = float(Y.std())
        self._src_ds[poc] = np.asarray(Y, np.float64)[::8, ::8]
        sps, pps = self.sps, self.pps
        W, H = sps.pic_width_in_mbs, sps.frame_height_in_mbs
        st = PictureParseState(W, H)
        planes = Planes(sps)
        if is_idr:
            self.recon_pics.clear()
            self._rd_refs.clear()
            self.frame_num = 0
            if self._lsim is not None:
                self._lsim.reset()
        is_ref = stype != SliceType.B  # B pictures are disposable here
        if self.rc is not None:
            qp = self.rc.pick_qp(stype.name)
        else:
            qp = cfg.qp + (cfg.qp_b_offset if stype == SliceType.B else 0)

        slices = self._partition_slices()
        for sid, addrs in enumerate(slices):
            st.slice_id[np.asarray(addrs, np.int64)] = sid
        st.qp[:] = qp
        cb_off, cr_off = pps.chroma_qp_offset
        st.qpc[:, 0] = chroma_qp(qp, cb_off)
        st.qpc[:, 1] = chroma_qp(qp, cr_off)

        # device ME pass (whole frame at once, per reference list)
        ref0 = ref1 = None
        grids = [None, None]
        b_info = None
        if stype == SliceType.P:
            ref0 = self.recon_pics[-1]
            grids[0] = ME.compute_sad_grids(
                Y, np.asarray(ref0[1].Y), cfg.search_range
            )
        elif stype == SliceType.B:
            ref0 = max((p for p in self.recon_pics if p[0] < poc),
                       key=lambda p: p[0])
            ref1 = min((p for p in self.recon_pics if p[0] > poc),
                       key=lambda p: p[0])
            grids[0] = ME.compute_sad_grids(
                Y, np.asarray(ref0[1].Y), cfg.search_range
            )
            grids[1] = ME.compute_sad_grids(
                Y, np.asarray(ref1[1].Y), cfg.search_range
            )
            b_info = {
                "type": SliceType.B,
                "ref_ids": [[ref0[0]], [ref1[0]]],
                "col": {"moving": compute_moving_mask(ref1[2])},
                "direct_8x8_inference": sps.direct_8x8_inference_flag,
                "spatial_direct": True,
            }
        if (stype == SliceType.I and len(slices) == 1
                and cfg.enable_i4 and not pps.constrained_intra_pred_flag
                and self._ws4 is None
                and sps.chroma_format_idc == 1 and sps.bit_depth_luma == 8):
            self._device_intra_picture(st, planes, Y, U, V, qp)
        else:
            enc = _FrameEncoder(self, st, planes, Y, U, V, stype, qp, ref0,
                                grids[0], ref1=ref1, sad_grids1=grids[1],
                                b_info=b_info)
            for addr in range(st.n_mbs):
                enc.encode_mb(addr)

        if cfg.enable_deblock:
            deblock_picture(st, sps, planes)

        # bitstream: one NAL per slice
        nals = []
        total_bytes = 0
        for addrs in slices:
            sh = SliceHeader(
                first_mb_in_slice=addrs[0],
                slice_type_code=stype.value,
                frame_num=self.frame_num % sps.max_frame_num,
                is_idr=is_idr,
                nal_ref_idc=3 if is_ref else 0,
                idr_pic_id=self.idr_count % 2 if is_idr else 0,
                pic_order_cnt_lsb=(
                    poc % (1 << (sps.log2_max_pic_order_cnt_lsb_minus4 + 4))
                    if sps.pic_order_cnt_type == 0
                    else 0
                ),
                direct_spatial_mv_pred_flag=stype == SliceType.B,
                slice_qp_delta=qp - (26 + pps.pic_init_qp_minus26),
                slice_group_change_cycle=cfg.slice_group_change_cycle,
            )
            w = write_slice_header(sh, sps, pps)
            use_dp = (cfg.partition_mode == 1
                      and not pps.entropy_coding_mode_flag and not is_idr)
            if use_dp:
                # slice_data_partition_a_layer: header + slice_id, with
                # residual categories split into B (intra) / C (inter)
                sid = len(nals)
                w.ue(sid)  # slice_id
                wB, wC = BitWriter(), BitWriter()
                writer = CavlcSliceWriter(st, sps, pps, sh)
                writer.write_slice_data(w, addrs, wB=wB, wC=wC)
                w.rbsp_trailing_bits()
                rbsp = w.get_bytes()
                total_bytes += len(rbsp)
                nals.append(NalUnit(2, 3 if is_ref else 0, rbsp))
                for nt, ww in ((3, wB), (4, wC)):
                    bits, nbits = ww.raw_bits()
                    if nbits == 0:
                        continue  # empty partitions are not sent
                    hw = BitWriter()
                    hw.ue(sid)
                    if pps.redundant_pic_cnt_present_flag:
                        hw.ue(0)
                    hw.append_bits(bits, nbits)
                    hw.rbsp_trailing_bits()
                    prbsp = hw.get_bytes()
                    total_bytes += len(prbsp)
                    nals.append(NalUnit(nt, 3 if is_ref else 0, prbsp))
                continue
            if pps.entropy_coding_mode_flag:
                writer = CabacSliceWriter(st, sps, pps, sh)
                writer.write_slice_data(w, addrs)
                # CABAC slices end byte-aligned after the flush; no stop bit
            else:
                writer = CavlcSliceWriter(st, sps, pps, sh)
                writer.write_slice_data(w, addrs)
                w.rbsp_trailing_bits()
            rbsp = w.get_bytes()
            total_bytes += len(rbsp)
            nals.append(NalUnit(5 if is_idr else 1, 3 if is_ref else 0, rbsp))
            if cfg.redundant_pics and not is_idr and stype == SliceType.P:
                # redundant coded slice: identical coding of the same
                # macroblocks (redundant_pic_cnt = 1), decodable in
                # place of a lost primary (lencod.c:2718)
                import dataclasses

                shr = dataclasses.replace(sh, redundant_pic_cnt=1)
                wr = write_slice_header(shr, sps, pps)
                if pps.entropy_coding_mode_flag:
                    CabacSliceWriter(st, sps, pps, shr).write_slice_data(
                        wr, addrs)
                else:
                    CavlcSliceWriter(st, sps, pps, shr).write_slice_data(
                        wr, addrs)
                    wr.rbsp_trailing_bits()
                rr = wr.get_bytes()
                total_bytes += len(rr)
                nals.append(NalUnit(1, 3 if is_ref else 0, rr))
        if self.rc is not None:
            mad = float(np.abs(Y - np.asarray(planes.Y)).mean())
            self.rc.post_frame(stype.name, 8 * total_bytes, mad)

        self.all_recons.append((poc, planes))
        if is_ref:
            if self.cfg.fast and (cfg.b_frames == 0 or cfg.rd):
                if cfg.rd:
                    import jax.numpy as jnp

                    bank, cpad = RD.ref_entry_from_planes(
                        jnp.asarray(planes.Y), jnp.asarray(planes.U),
                        jnp.asarray(planes.V),
                    )
                    # host-path pictures entering the device DPB are intra
                    # (I/IDR): colocated motion is all-intra
                    H4, W4 = 4 * self.sps.frame_height_in_mbs, \
                        4 * self.sps.pic_width_in_mbs
                    col = (jnp.ones((H4, W4), bool),
                           jnp.zeros((H4, W4), jnp.int32),
                           jnp.zeros((H4, W4), jnp.int32),
                           jnp.zeros((H4, W4), jnp.int32))
                    self._rd_refs = ([(poc, bank, cpad, col)]
                                     + self._rd_refs)[
                        : self.sps.num_ref_frames
                    ]
                    self._anchor_ref_pocs[poc] = []
                    padded = None
                    if self.rc is not None or self._multi_slice:
                        # host P/B coding still runs in these modes
                        padded = (
                            MC.pad_plane(planes.Y),
                            MC.pad_plane(planes.U),
                            MC.pad_plane(planes.V),
                        )
                else:
                    padded = FAST.ref_resources(planes)
                    self._dev_ref = padded
            else:
                padded = (
                    MC.pad_plane(planes.Y),
                    MC.pad_plane(planes.U),
                    MC.pad_plane(planes.V),
                )
            self.recon_pics = [(poc, planes, st, padded)][:] if is_idr else (
                (self.recon_pics + [(poc, planes, st, padded)])
                [-self.sps.num_ref_frames:]
            )
            self._prev_poc = poc
            self.frame_num += 1
        if is_idr:
            self.idr_count += 1
        return nals

    def _partition_slices(self) -> list[list[int]]:
        """MB address lists per slice, in slice-group scan order.

        Mirrors the reference's slice segmentation over FMO groups
        (lencod/src/fmo.c FmoGetNextMBNr scan + slice.c:214 slice loop,
        SliceMode 0/1): each slice group is walked in raster order of its
        member MBs; slice_mode 1 additionally splits every group into
        fixed-size runs of `slice_argument` MBs."""
        from ..syntax.fmo import mb_to_slice_group

        cfg, pps = self.cfg, self.pps
        sg_map = mb_to_slice_group(self.sps, pps, cfg.slice_group_change_cycle)
        slices: list[list[int]] = []
        for g in range(pps.num_slice_groups_minus1 + 1):
            addrs = [int(a) for a in np.nonzero(sg_map == g)[0]]
            if not addrs:
                continue
            if cfg.slice_mode == 1 and cfg.slice_argument > 0:
                for i in range(0, len(addrs), cfg.slice_argument):
                    slices.append(addrs[i : i + cfg.slice_argument])
            else:
                slices.append(addrs)
        return slices

    # ------------------------------------------------------------------
    def _start_p_rd(self, yuv, poc: int | None = None):
        """Dispatch the device RD pipeline for a P frame (partitions,
        multi-ref, skip-RD, intra-in-P; encoder/rd.py)."""
        import jax.numpy as jnp

        cfg, sps, pps = self.cfg, self.sps, self.pps
        H, W = sps.height, sps.width
        if self.rc is not None:
            qp = self.rc.pick_qp("P")
            lam_f = ((0.68 if cfg.b_frames > 0 else 0.85) * 0.95
                     * 2.0 ** ((qp - 12) / 3.0))
            lam_fx = int(lam_f * 65536 + 0.5)
        else:
            qp = cfg.qp
            lam_fx = self.lambda_mode_fx
        cb_off, _ = pps.chroma_qp_offset
        qp_c = chroma_qp(qp, cb_off)
        cur = tuple(
            jnp.asarray(np.ascontiguousarray(p, np.uint8)) for p in yuv
        )
        refs = self._rd_refs[: max(1, cfg.num_ref_frames)]
        # pad the bank stack to a FIXED depth (masked via nref) so the
        # DPB warming up from 1 to num_ref_frames reuses one executable
        nr_max = max(1, cfg.num_ref_frames)
        pad = [refs[-1]] * (nr_max - len(refs))
        banks = jnp.stack([e[1] for e in refs + pad])
        cpads = jnp.stack([e[2] for e in refs + pad])
        nref = jnp.int32(len(refs))
        ref_pocs = [e[0] for e in refs]
        force_intra = None
        if cfg.intra_refresh > 0:
            n_mb = (W // 16) * (H // 16)
            if not hasattr(self, "_refresh_perm"):
                self._refresh_perm = np.random.RandomState(
                    13).permutation(n_mb)
                self._refresh_pos = 0
            mask = np.zeros(n_mb, bool)
            for _ in range(min(cfg.intra_refresh, n_mb)):
                if self._refresh_pos >= n_mb:
                    self._refresh_perm = np.random.RandomState(
                        13 + len(self._src_dc)).permutation(n_mb)
                    self._refresh_pos = 0
                mask[self._refresh_perm[self._refresh_pos]] = True
                self._refresh_pos += 1
            force_intra = jnp.asarray(mask)
        wp_weights = None
        if cfg.weighted_pred:
            # luma (weight, offset) per reference, logWD = 5.  Three
            # candidates per ref — DC-ratio gain (the JM default,
            # weighted_prediction.c:30), identity+DC offset (JM
            # select_offset), and std-ratio gain + offset — scored by
            # actual prediction SAD on 8x-decimated source planes (the
            # measurement replaces JM's multi-pass WP RD test,
            # weighted_prediction.c:373 test_wp_P_slice)
            ysrc = np.asarray(yuv[0], np.float64)
            cur_ds = ysrc[::8, ::8]
            dc_cur = float(ysrc.mean())
            sd_cur = float(ysrc.std())
            wp_weights = []
            for rp in ref_pocs:
                dc_ref = self._src_dc.get(rp, 0.0)
                sd_ref = self._src_sd.get(rp, 0.0)
                ref_ds = self._src_ds.get(rp)
                cands = [(32, 0)]
                if dc_ref > 0:
                    cands.append(
                        (max(-128, min(127, int(32 * dc_cur / dc_ref + 0.5))),
                         0))
                cands.append((32, max(-128, min(127,
                                                int(dc_cur - dc_ref + 0.5)))))
                if sd_ref > 1e-3:
                    w = max(-128, min(127, int(32 * sd_cur / sd_ref + 0.5)))
                    o = max(-128, min(127,
                                      int(dc_cur - w * dc_ref / 32.0 + 0.5)))
                    cands.append((w, o))
                if ref_ds is not None and ref_ds.shape == cur_ds.shape:
                    sads = [np.abs(cur_ds - (np.floor(
                        (ref_ds * w + 16) / 32) + o)).mean()
                        for (w, o) in cands]
                    wp_weights.append(cands[int(np.argmin(sads))])
                else:
                    wp_weights.append(cands[1] if len(cands) > 1 else (32, 0))
            wpad = wp_weights + [wp_weights[-1]] * (nr_max - len(wp_weights))
            wp_w = jnp.asarray(np.asarray([p[0] for p in wpad], np.int32))
            wp_o = jnp.asarray(np.asarray([p[1] for p in wpad], np.int32))
        if cfg.row_slices > 1:
            if self.rc is not None:
                # per-row basic-unit QPs (rc_handle_mb restructured:
                # targets allocated up front from per-row activity)
                qp = self._rc_row_qps(qp, np.asarray(yuv[0], np.int16))
                qp_c = np.asarray(
                    [chroma_qp(int(q), cb_off) for q in qp], np.int32)
                base = (0.68 if cfg.b_frames > 0 else 0.85) * 0.95
                lam_fx = np.asarray(
                    [int(base * 2.0 ** ((int(q) - 12) / 3.0) * 65536 + 0.5)
                     for q in qp], np.int32)
            host_out, recon, new_entry = RD.rd_p_rows_pipeline(
                *cur, banks, cpads, H=H, W=W, R=min(cfg.search_range, 28),
                qp=qp, qp_c=qp_c, lam=lam_fx,
                lam_me=lam_fx, G=cfg.row_slices, nref=nref,
            )
        else:
            host_out, recon, new_entry = RD.rd_p_pipeline(
                *cur, banks, cpads, H=H, W=W, R=min(cfg.search_range, 28),
                qp=qp, qp_c=qp_c, lam=lam_fx,
                lam_me=2 * lam_fx, nref=nref,
                wp_w=wp_w if wp_weights else None,
                wp_o=wp_o if wp_weights else None,
                use_wp=bool(wp_weights),
                force_intra=force_intra,
                use_refresh=force_intra is not None,
                drift_pen=(self._lsim.pen if self._lsim is not None
                           and self._lsim.pen is not None else None),
                use_drift=(self._lsim is not None
                           and self._lsim.pen is not None),
                use_cme=True,
                use_t8=bool(cfg.transform8x8),
            )
        if self._lsim is not None:
            intra4_c, _ref4_c, mvx4_c, mvy4_c = new_entry[2]
            self._lsim.after_frame(
                recon[0], jnp.stack([mvx4_c, mvy4_c], -1), intra4_c)
        frame_num = self.frame_num
        self.frame_num += 1
        if poc is None:
            poc = self._prev_poc + 2
        self._prev_poc = poc
        self._anchor_ref_pocs[poc] = ref_pocs
        self._rd_refs = ([(poc,) + tuple(new_entry)] + self._rd_refs)[
            : sps.num_ref_frames
        ]
        self._src_dc[poc] = float(np.asarray(yuv[0], np.float64).mean())
        self._src_sd[poc] = float(np.asarray(yuv[0], np.float64).std())
        self._src_ds[poc] = np.asarray(yuv[0], np.float64)[::8, ::8]
        cur_y_np = np.asarray(yuv[0], np.int16)
        mad = (float(np.abs(cur_y_np - self._prev_src).mean())
               if getattr(self, "_prev_src", None) is not None else 1.0)
        self._prev_src = cur_y_np
        return ("rd", host_out, recon, frame_num, poc, ref_pocs, qp,
                wp_weights, mad)

    def _rc_row_qps(self, frame_qp: int, cur_y) -> np.ndarray:
        """Per-tile-row basic-unit QPs: the frame target is split over
        rows in proportion to predicted activity (previous-source MAD,
        the colocated-BU MAD prediction of rc_quadratic.c:1106), each
        row's Qstep solved from the shared quadratic model, clipped
        +-2 around the frame QP (the JM BU smoothness clip)."""
        from ..control.ratectl import qp_to_qstep, qstep_to_qp

        G = self.cfg.row_slices
        Hg = cur_y.shape[0] // G
        prev = getattr(self, "_prev_src", None)
        if prev is None:
            return np.full(G, frame_qp, np.int32)
        mads = np.maximum(
            np.abs(cur_y.astype(np.int32) - prev).reshape(
                G, Hg, -1).mean((1, 2)),
            1e-3,
        )
        T = max(self.rc._last_target, 1.0)
        t_rows = T * mads / mads.sum()
        qps = np.empty(G, np.int32)
        for g in range(G):
            x1, x2 = self.rc.x1, self.rc.x2
            m, t = float(mads[g]), float(t_rows[g]) * G / 1.0
            # scale row target to frame-equivalent units for the model
            t = max(t, 1.0)
            if x2 == 0.0:
                qstep = x1 * m / t
            else:
                a, b, c = t, -x1 * m, -x2 * m
                disc = b * b - 4 * a * c
                qstep = ((-b + np.sqrt(disc)) / (2 * a)
                         if disc >= 0 else x1 * m / t)
                if qstep <= 0:
                    qstep = x1 * m / t
            qps[g] = qstep_to_qp(float(max(qstep, qp_to_qstep(0))))
        return np.clip(qps, frame_qp - 2, frame_qp + 2).astype(np.int32)

    def _finish_p_rd(self, pending, fetched=None) -> list[NalUnit]:
        (_, host_out, recon, frame_num, poc, ref_pocs, qp,
         wp_weights, src_mad) = pending
        cfg, sps, pps = self.cfg, self.sps, self.pps
        W, H = sps.pic_width_in_mbs, sps.frame_height_in_mbs
        n_mb = W * H
        st = PictureParseState(W, H)
        planes = Planes(sps)
        st.slice_id[:] = 0
        qp_rows = np.broadcast_to(
            np.asarray(qp, np.int32).reshape(-1),
            (cfg.row_slices if np.ndim(qp) else 1,))
        qp0 = int(qp_rows[0])
        cb_off, cr_off = pps.chroma_qp_offset
        if np.ndim(qp):
            G0 = qp_rows.shape[0]
            n_g0 = n_mb // G0
            for g in range(G0):
                st.qp[g * n_g0 : (g + 1) * n_g0] = qp_rows[g]
                st.qpc[g * n_g0 : (g + 1) * n_g0, 0] = chroma_qp(
                    int(qp_rows[g]), cb_off)
                st.qpc[g * n_g0 : (g + 1) * n_g0, 1] = chroma_qp(
                    int(qp_rows[g]), cr_off)
        else:
            st.qp[:] = qp0
            st.qpc[:, 0] = chroma_qp(qp0, cb_off)
            st.qpc[:, 1] = chroma_qp(qp0, cr_off)
        if fetched is None:
            fetched = np.asarray(host_out)
        if fetched.ndim == 2:  # row-sliced: (G, per-group buffer)
            G = fetched.shape[0]
            n_g = n_mb // G
            sz_g = [n_g, 4 * n_g, 4 * n_g, n_g, 16 * n_g, 16 * n_g,
                    n_g, n_g, 256 * n_g, 256 * n_g, 16 * n_g, 128 * n_g,
                    8 * n_g, 16 * n_g]
            per_g = [np.split(row, np.cumsum(sz_g)[:-1]) for row in fetched]
            parts = [np.concatenate([pg[k] for pg in per_g])
                     for k in range(len(sz_g))]
            # ipm rows are per-group (4*Hg, 4*W) planes: restack
            Hg4 = 4 * (st.H // G)
            ipm_plane = np.concatenate(
                [pg[13].reshape(Hg4, 4 * st.W) for pg in per_g], axis=0)
        else:
            sizes = [n_mb, 4 * n_mb, 4 * n_mb, n_mb, 16 * n_mb, 16 * n_mb,
                     n_mb, n_mb, 256 * n_mb, 256 * n_mb, 16 * n_mb,
                     128 * n_mb, 8 * n_mb, 16 * n_mb]
            parts = np.split(fetched, np.cumsum(sizes)[:-1])
            ipm_plane = parts[13].reshape(4 * st.H, 4 * st.W)
        win = parts[0]
        ref8 = parts[1].reshape(n_mb, 4)
        b8sub = parts[2].reshape(n_mb, 4)
        t8 = parts[3]
        mv4x = parts[4].reshape(n_mb, 4, 4)
        mv4y = parts[5].reshape(n_mb, 4, 4)
        i16mode = parts[6]
        cip = parts[7]
        lev = parts[8].reshape(n_mb, 4, 4, 4, 4)
        lev8 = parts[9].reshape(n_mb, 2, 2, 8, 8)
        dc = parts[10].reshape(n_mb, 4, 4)
        levc = parts[11].reshape(n_mb, 2, 2, 2, 4, 4)
        dcc = parts[12].reshape(n_mb, 2, 2, 2)
        planes.Y, planes.U, planes.V = recon
        G = cfg.row_slices if cfg.row_slices > 1 else 1
        n_g = n_mb // G
        for g in range(G):
            st.slice_id[g * n_g : (g + 1) * n_g] = g
        if G > 1:
            st.lf_disable[:] = 2  # no filtering across slice edges
        self._fill_p_state_rd(st, win, ref8, b8sub, mv4x, mv4y, i16mode,
                              cip, lev, dc, levc, dcc, ref_pocs, ipm_plane,
                              t8=t8, lev8=lev8)
        nr = len(ref_pocs)
        nals = []
        for g in range(G):
            sh = SliceHeader(
                first_mb_in_slice=g * n_g,
                slice_type_code=SliceType.P.value,
                frame_num=frame_num % sps.max_frame_num,
                is_idr=False,
                nal_ref_idc=3,
                pic_order_cnt_lsb=(
                    poc % (1 << (sps.log2_max_pic_order_cnt_lsb_minus4 + 4))
                    if sps.pic_order_cnt_type == 0 else 0
                ),
                num_ref_idx_active_override_flag=nr - 1
                != pps.num_ref_idx_l0_default_active_minus1,
                num_ref_idx_l0_active_minus1=nr - 1,
                disable_deblocking_filter_idc=2 if G > 1 else 0,
                slice_qp_delta=int(qp_rows[min(g, len(qp_rows) - 1)])
                - (26 + pps.pic_init_qp_minus26),
            )
            if wp_weights is not None:
                from ..syntax.slice_header import PredWeight

                sh.luma_log2_weight_denom = 5
                sh.chroma_log2_weight_denom = 5
                sh.pred_weights[0] = [
                    PredWeight(wv, ov, [32, 32], [0, 0])
                    for (wv, ov) in wp_weights
                ]
            w = write_slice_header(sh, sps, pps)
            addrs = list(range(g * n_g, (g + 1) * n_g))
            if pps.entropy_coding_mode_flag:
                writer = CabacSliceWriter(st, sps, pps, sh)
                writer.write_slice_data(w, addrs)
            else:
                writer = CavlcSliceWriter(st, sps, pps, sh)
                writer.write_slice_data(w, addrs)
                w.rbsp_trailing_bits()
            nals.append(NalUnit(1, 3, w.get_bytes()))
        if self.rc is not None:
            bits = 8 * sum(len(nl.rbsp) + 5 for nl in nals)
            self.rc.post_frame("P", bits, src_mad)
        self.all_recons.append((poc, planes))
        self.recon_pics = (self.recon_pics + [(poc, planes, st, None)])[
            -self.sps.num_ref_frames:
        ]
        return nals

    def _device_intra_picture(self, st, planes, Y, U, V, qp):
        """Device RD coding of a whole I picture (encoder/rd.py
        rd_i_pipeline): full-RD I16/I4 mode decisions run on the TPU;
        the host keeps only the state fill + entropy tail."""
        import jax.numpy as jnp

        cfg = self.cfg
        base = (0.68 if cfg.b_frames > 0 else 0.85) * 0.95
        lam_fx = int(base * 2.0 ** ((qp - 12) / 3.0) * 65536 + 0.5)
        (ry, ru, rv, lev, lum_dc, i16mode, cip, levc, dcc, i4flag,
         ipm) = RD.rd_i_pipeline(
            jnp.asarray(np.ascontiguousarray(Y, np.uint8)),
            jnp.asarray(np.ascontiguousarray(U, np.uint8)),
            jnp.asarray(np.ascontiguousarray(V, np.uint8)),
            qp=jnp.int32(qp), qp_c=jnp.int32(int(st.qpc[0, 0])),
            lam=jnp.int32(lam_fx), H=self.sps.height, W=self.sps.width)
        n_mb = st.n_mbs
        lev = np.asarray(lev)
        lum_dc = np.asarray(lum_dc)
        levc = np.asarray(levc)
        dcc = np.asarray(dcc)
        i4 = np.asarray(i4flag).astype(bool)
        i16 = ~i4
        st.is_intra[:] = 1
        st.ipredmode[:] = np.asarray(ipm)
        st.i16mode[:] = np.where(i16, np.asarray(i16mode), -1)
        st.c_ipred_mode[:] = np.asarray(cip)
        st.mb_type[:] = np.where(i4, M.I4MB, M.I16MB)
        st.b8mode[:] = np.where(i4, M.IBLOCK, 0)[:, None]
        st.b8pdir[:] = -1
        zperm = np.empty(16, np.int64)
        for br in range(4):
            for bc in range(4):
                zperm[int(M.XY_TO_BLK4[br, bc])] = br * 4 + bc
        st.luma_levels[:] = lev.reshape(n_mb, 16, 4, 4)[:, zperm]
        st.luma_dc[:] = np.where(i16[:, None, None], lum_dc, 0)
        st.chroma_levels[:] = levc.reshape(n_mb, 2, 4, 4, 4)
        st.chroma_dc[:] = dcc
        nz4 = lev.any(axis=(3, 4))  # (n_mb, br, bc)
        q8 = nz4.reshape(n_mb, 2, 2, 2, 2).any(axis=(2, 4))
        cbp_i4 = (q8[:, 0, 0] * 1 + q8[:, 0, 1] * 2 + q8[:, 1, 0] * 4
                  + q8[:, 1, 1] * 8)
        cbp_l = np.where(i16, np.where(nz4.any((1, 2)), 15, 0), cbp_i4)
        has_ac = levc.any(axis=(2, 3, 4, 5)).any(axis=1)
        has_dc = dcc.any(axis=(2, 3)).any(axis=1)
        cbp_c = np.where(has_ac, 2, np.where(has_dc, 1, 0))
        st.cbp[:] = cbp_l + 16 * cbp_c
        weights = (1 << np.arange(16, dtype=np.int64)).reshape(4, 4)
        cbp_blk = (nz4 * weights).sum(axis=(1, 2))
        dc_any = lum_dc.any(axis=(1, 2)) & i16
        st.cbp_blk = (cbp_blk | dc_any).tolist()
        planes.Y[:] = np.asarray(ry)
        planes.U[:] = np.asarray(ru)
        planes.V[:] = np.asarray(rv)

    def _fill_p_state_rd(self, st, win, ref8, b8sub, mv4x, mv4y, i16mode,
                         cip, lev, dc, levc, dcc, ref_pocs,
                         ipm_plane=None, t8=None, lev8=None):
        """Decode-state fill for the RD pipeline interchange buffer.

        mv4x/mv4y: (n_mb, 4 units, 4 subpos) per-4x4 motion; b8sub:
        (n_mb, 4) device sub-mode code per unit (0 8x8 / 1 8x4 / 2 4x8
        / 3 4x4), meaningful for P8x8 winners."""
        n_mb = st.n_mbs
        n_my, n_mx = st.H, st.W
        i4 = win == RD.C_I4
        i16 = win == RD.C_I16
        intra = i16 | i4
        if ipm_plane is None:
            st.ipredmode[:] = 2
        else:
            st.ipredmode[:] = ipm_plane.reshape(4 * n_my, 4 * n_mx)
        st.is_intra[:] = intra
        st.i16mode[:] = np.where(i16, i16mode, -1)
        st.c_ipred_mode[:] = np.where(intra, cip, 0)
        # mb types / partition modes
        type_map = {RD.C_P16x16: M.P16x16, RD.C_P16x8: M.P16x8,
                    RD.C_P8x16: M.P8x16, RD.C_P8x8: M.P8x8,
                    RD.C_SKIP: M.P16x16, RD.C_P16PMV: M.P16x16,
                    RD.C_I16: M.I16MB, RD.C_I4: M.I4MB}
        b8_map = {RD.C_P16x16: 1, RD.C_P16x8: 2, RD.C_P8x16: 3,
                  RD.C_P8x8: M.B8_8x8, RD.C_SKIP: 1, RD.C_P16PMV: 1,
                  RD.C_I16: 0, RD.C_I4: M.IBLOCK}
        st.mb_type[:] = np.vectorize(type_map.get)(win)
        st.b8mode[:] = np.vectorize(b8_map.get)(win)[:, None]
        # P8x8 winners carry the device sub-mode per unit
        _SUBMAP = np.asarray(
            [M.B8_8x8, M.B8_8x4, M.B8_4x8, M.B8_4x4], np.int32)
        p88 = win == RD.C_P8x8
        st.b8mode[p88] = _SUBMAP[b8sub[p88]]
        st.b8pdir[:] = np.where(intra, -1, 0)[:, None]

        # per-4x4 picture-plane fields from the (unit, subpos) layout
        def to_pic4(a):  # (n_mb, 4, 4) -> (4*n_my, 4*n_mx)
            return (a.reshape(n_my, n_mx, 2, 2, 2, 2)
                    .transpose(0, 2, 4, 1, 3, 5)
                    .reshape(4 * n_my, 4 * n_mx))

        def to_pic4_u(a8):  # (n_mb, 4) per-unit -> (4*n_my, 4*n_mx)
            p = (a8.reshape(n_my, n_mx, 2, 2).transpose(0, 2, 1, 3)
                 .reshape(2 * n_my, 2 * n_mx))
            return np.repeat(np.repeat(p, 2, 0), 2, 1)

        mv4x, mv4y, ref4 = to_pic4(mv4x), to_pic4(mv4y), to_pic4_u(ref8)
        intra4 = np.repeat(np.repeat(intra.reshape(n_my, n_mx), 4, 0), 4, 1)
        st.mv[0, ..., 0] = np.where(intra4, 0, mv4x)
        st.mv[0, ..., 1] = np.where(intra4, 0, mv4y)
        st.ref_idx[0] = np.where(intra4, -1, ref4)
        poc_of = np.asarray(ref_pocs, np.int64)
        st.ref_pic_id[0] = np.where(
            intra4, -(10 ** 9), poc_of[np.clip(ref4, 0, len(ref_pocs) - 1)]
        )
        # residual levels (device (br, bc) -> coded Z-order blocks)
        zperm = np.empty(16, np.int64)
        for br in range(4):
            for bc in range(4):
                zperm[int(M.XY_TO_BLK4[br, bc])] = br * 4 + bc
        st.luma_levels[:] = lev.reshape(n_mb, 16, 4, 4)[:, zperm]
        st.luma_dc[:] = np.where(i16[:, None, None], dc, 0)
        st.chroma_levels[:] = levc.reshape(n_mb, 2, 4, 4, 4)
        st.chroma_dc[:] = dcc
        # transform_size_8x8 winners: flag + 8x8 levels
        if t8 is not None and t8.any():
            t8b = t8.astype(bool)
            st.transform8x8[t8b] = 1
            st.luma8_levels[t8b] = lev8.reshape(n_mb, 4, 8, 8)[t8b]
        # cbp: I16 -> all-or-nothing luma; I4/inter -> per-8x8 bits
        nz4 = lev.any(axis=(3, 4))  # (n_mb, br, bc)
        if t8 is not None and t8.any():
            # a nonzero 8x8 block marks its four 4x4 cells
            nz8 = lev8.any(axis=(3, 4)).reshape(n_mb, 2, 2)
            nz4 = nz4 | (np.repeat(np.repeat(nz8, 2, 1), 2, 2)
                         & t8.astype(bool)[:, None, None])
        q8 = nz4.reshape(n_mb, 2, 2, 2, 2).any(axis=(2, 4))
        cbp_inter = (q8[:, 0, 0] * 1 + q8[:, 0, 1] * 2 + q8[:, 1, 0] * 4
                     + q8[:, 1, 1] * 8)
        cbp_l = np.where(i16, np.where(nz4.any((1, 2)), 15, 0), cbp_inter)
        has_ac = levc.any(axis=(2, 3, 4, 5)).any(axis=1)
        has_dc = dcc.any(axis=(2, 3)).any(axis=1)
        cbp_c = np.where(has_ac, 2, np.where(has_dc, 1, 0))
        st.cbp[:] = cbp_l + 16 * cbp_c
        # transform_size_8x8_flag is only transmitted when luma cbp != 0
        # (need_transform_size); an untransmitted flag must read 0 for
        # the decoder's CABAC neighbor contexts (macroblock.c:2901)
        st.transform8x8[(st.cbp & 15) == 0] = 0
        weights = (1 << np.arange(16, dtype=np.int64)).reshape(4, 4)
        cbp_blk = (nz4 * weights).sum(axis=(1, 2))
        dc_any = dc.any(axis=(1, 2)) & i16
        st.cbp_blk = (cbp_blk | dc_any).tolist()
        # exact PMV/MVD + skip detection (whole-frame vectorized; legal
        # because every neighbor MV above is final device output)
        FL.fill_p_mvd_skip(st, win, RD)

    # ------------------------------------------------------------------
    # B pictures on the device RD pipeline (temporal direct)
    # ------------------------------------------------------------------
    def _encode_stream_b_rd(self, frames):
        """Decode-order emission I (B^n P)* with device anchors and
        device B pictures (temporal direct).

        Pipelined: device steps for anchors and Bs are dispatched up to
        `pipeline_depth` pictures ahead (reference state chains on
        device), then the whole group's flat outputs come back in ONE
        stacked d2h transfer — the tunnel's per-fetch latency is paid
        once per group, not once per picture."""
        nb = self.cfg.b_frames
        idr_p = self.cfg.idr_period
        depth = max(2, self.cfg.pipeline_depth)
        if self.rc is not None:
            depth = 2  # drain per anchor group: fresh rate feedback
        pend_src: list = []  # buffered display frames awaiting their anchor
        pend_dev: list = []  # dispatched pictures, decode order
        base = 0

        def drain():
            if not pend_dev:
                return
            if len(pend_dev) == 1:
                tag, p = pend_dev[0]
                yield (self._finish_p_rd(p) if tag == "p"
                       else self._finish_b_rd(p))
            else:
                flats = [p[1] for _, p in pend_dev]
                rows = RD.fetch_group(flats)
                for (tag, p), row, f in zip(pend_dev, rows, flats):
                    row = row[: f.shape[0]]
                    if tag == "p":
                        yield self._finish_p_rd(p, fetched=row)
                    else:
                        yield self._finish_b_rd(p, fetched=row)
            pend_dev.clear()

        hier = self.cfg.b_hierarchy
        for idx, yuv in enumerate(frames):
            is_idr = idx == 0 or (idr_p and idx % idr_p == 0)
            if is_idr:
                for b_yuv, b_idx in pend_src:  # close the GOP with P
                    pend_dev.append(
                        ("p", self._start_p_rd(b_yuv, poc=2 * (b_idx - base))))
                pend_src = []
                base = idx
                yield from drain()
                yield self._encode_picture(yuv, SliceType.I, True, 0)
            elif len(pend_src) < nb:
                pend_src.append((yuv, idx))
            elif hier:
                # 2-layer pyramid segment A0 b1 B2 b3 A1: decode order
                # anchor, stored mid-B, then the outer non-ref Bs
                # (lencod/src/explicit_gop.c:32 create_hierarchy)
                (y1, i1), (y2, i2), (y3, i3) = pend_src
                pend_dev.append(
                    ("p", self._start_p_rd(yuv, poc=2 * (idx - base))))
                pend_dev.append(
                    ("b", self._start_b_rd(y2, 2 * (i2 - base),
                                           is_ref=True)))
                pend_dev.append(("b", self._start_b_rd(y1, 2 * (i1 - base))))
                pend_dev.append(("b", self._start_b_rd(y3, 2 * (i3 - base))))
                pend_src = []
                if len(pend_dev) >= depth:
                    yield from drain()
            else:
                pend_dev.append(
                    ("p", self._start_p_rd(yuv, poc=2 * (idx - base))))
                for b_yuv, b_idx in pend_src:
                    pend_dev.append(
                        ("b", self._start_b_rd(b_yuv, 2 * (b_idx - base))))
                pend_src = []
                if len(pend_dev) >= depth:
                    yield from drain()
        for b_yuv, b_idx in pend_src:
            pend_dev.append(
                ("p", self._start_p_rd(b_yuv, poc=2 * (b_idx - base))))
        yield from drain()

    def _start_b_rd(self, yuv, poc: int, is_ref: bool = False):
        import jax.numpy as jnp

        from ..decoder.mv import dist_scale_factor

        cfg, sps, pps = self.cfg, self.sps, self.pps
        H, W = sps.height, sps.width
        if self.rc is not None:
            qp = self.rc.pick_qp("B")
        elif is_ref:
            # stored mid-B of the pyramid: smaller offset than leaf Bs
            qp = cfg.qp + max(1, cfg.qp_b_offset - 1)
        else:
            qp = cfg.qp + cfg.qp_b_offset
        cb_off, _ = pps.chroma_qp_offset
        qp_c = chroma_qp(qp, cb_off)
        cur = tuple(
            jnp.asarray(np.ascontiguousarray(p, np.uint8)) for p in yuv
        )
        past = sorted((e for e in self._rd_refs if e[0] < poc),
                      key=lambda e: -e[0])
        fut = sorted((e for e in self._rd_refs if e[0] > poc),
                     key=lambda e: e[0])
        assert past and fut, "B picture needs anchors on both sides"
        fut_e = fut[0]
        if cfg.b_hierarchy and is_ref:
            # stored mid-B: the longest prefix of the default (POC-desc)
            # past list whose pictures are still inside the sliding
            # window when the leaf Bs decode — the window then holds
            # this B + the newest num_ref_frames+1 of today's refs — so
            # this picture's motion stays mappable for the leaves'
            # temporal direct derivation
            alive = {e[0] for e in
                     self._rd_refs[: max(1, cfg.num_ref_frames) + 1]}
            lst0 = []
            for e in past:
                if e[0] not in alive:
                    break
                lst0.append(e)
            lst0 = lst0 or past[:1]
            nr_max = self.sps.num_ref_frames
        elif cfg.b_hierarchy:
            # the DEFAULT B list0 the decoder will build: every DPB
            # short-term ref, past (POC desc) then future (POC asc);
            # only the tail may be cut, so the signalled prefix matches
            # the decoder's list exactly and every colocated reference
            # stays mappable for temporal direct
            lst0 = past + fut
            nr_max = self.sps.num_ref_frames
        else:
            lst0 = past[: max(1, cfg.num_ref_frames)]
            nr_max = max(1, cfg.num_ref_frames)
        lst0 = lst0[:nr_max]
        pad_n = nr_max - len(lst0)
        banks0 = jnp.stack([e[1] for e in lst0 + [lst0[-1]] * pad_n])
        cpads0 = jnp.stack([e[2] for e in lst0 + [lst0[-1]] * pad_n])
        banks1 = jnp.stack([fut_e[1]])
        cpads1 = jnp.stack([fut_e[2]])
        col_intra4, col_ref4, col_mvx4, col_mvy4 = fut_e[3]
        pocs0 = [e[0] for e in lst0]
        poc1 = fut_e[0]
        # the colocated picture's ref indices map into ITS list0 (the
        # anchor pocs at its encode time) — translate into OUR list0.
        # Stored mid-Bs never code direct modes (rd_b_pipeline make_ref
        # masks them), so they skip the mapping entirely.
        if not is_ref:
            anchor_pocs = self._anchor_ref_pocs.get(poc1, pocs0)
            trans = []
            for p0 in anchor_pocs:
                assert p0 in pocs0, (
                    f"temporal direct: colocated ref poc {p0} not in B "
                    f"list0 {pocs0}")
                trans.append(pocs0.index(p0))
            if trans:
                col_ref4 = jnp.asarray(np.asarray(trans, np.int32))[
                    jnp.clip(col_ref4, 0, len(trans) - 1)]
        dsf = [dist_scale_factor(poc, p0, poc1) if p0 != poc1 else 0
               for p0 in pocs0]
        eq = [p0 == poc1 for p0 in pocs0]
        # pad the per-ref tables alongside the padded bank stack
        pocs0_p = pocs0 + [pocs0[-1]] * pad_n
        dsf_p = dsf + [dsf[-1]] * pad_n
        eq_p = eq + [eq[-1]] * pad_n
        # JM B-slice lambda: 0.68 base x clip3(2, 4, qp_temp/6) x 0.95
        # (slice.c:1261); stored Bs halve the factor (BRefPictures rule)
        qp_t = qp - 12
        lam_f = (0.68 * 0.95 * 2.0 ** (qp_t / 3.0)
                 * min(4.0, max(2.0, qp_t / 6.0)))
        if is_ref:
            lam_f *= 0.5
        lam = int(lam_f * 65536 + 0.5)
        out = RD.rd_b_pipeline(
            *cur, banks0, cpads0, banks1, cpads1,
            col_intra4, col_ref4, col_mvx4, col_mvy4,
            jnp.asarray(np.asarray(pocs0_p, np.int32)),
            jnp.asarray(np.asarray(dsf_p, np.int32)),
            jnp.asarray(np.asarray(eq_p, bool)),
            jnp.int32(poc1),
            H=H, W=W, R=min(cfg.search_range, 28), qp=qp, qp_c=qp_c,
            lam=lam, lam_me=lam, nref0=jnp.int32(len(lst0)),
            make_ref=is_ref,
        )
        if is_ref:
            host_out, recon, entry = out
            frame_num = self.frame_num
            self.frame_num += 1
            self._rd_refs = ([(poc,) + tuple(entry)] + self._rd_refs)[
                : sps.num_ref_frames
            ]
            # colocated snapshot index space: its list0 pocs + [poc1]
            # (index n0 is the sentinel for L1-only blocks)
            self._anchor_ref_pocs[poc] = pocs0 + [poc1]
        else:
            # non-ref B = frame_num of the preceding reference + 1
            frame_num = self.frame_num
        return ("b", host_out if is_ref else out[0],
                recon if is_ref else out[1], poc, pocs0, poc1, qp,
                frame_num, is_ref)

    def _finish_b_rd(self, pending, fetched=None) -> list[NalUnit]:
        (_, host_out, recon, poc, pocs0, poc1, qp, frame_num,
         is_ref) = pending
        cfg, sps, pps = self.cfg, self.sps, self.pps
        W, H = sps.pic_width_in_mbs, sps.frame_height_in_mbs
        n_mb = W * H
        st = PictureParseState(W, H)
        planes = Planes(sps)
        st.slice_id[:] = 0
        st.qp[:] = qp
        cb_off, cr_off = pps.chroma_qp_offset
        st.qpc[:, 0] = chroma_qp(qp, cb_off)
        st.qpc[:, 1] = chroma_qp(qp, cr_off)
        if fetched is None:
            fetched = np.asarray(host_out)
        sizes = [n_mb, 4 * n_mb, 4 * n_mb, 4 * n_mb, 4 * n_mb, 4 * n_mb,
                 4 * n_mb, n_mb, n_mb, 256 * n_mb, 16 * n_mb, 128 * n_mb,
                 8 * n_mb, 16 * n_mb]
        parts = np.split(fetched, np.cumsum(sizes)[:-1])
        win = parts[0]
        pdir8 = parts[1].reshape(n_mb, 4)
        idx0 = parts[2].reshape(n_mb, 4)
        m0x = parts[3].reshape(n_mb, 4)
        m0y = parts[4].reshape(n_mb, 4)
        m1x = parts[5].reshape(n_mb, 4)
        m1y = parts[6].reshape(n_mb, 4)
        i16mode = parts[7]
        cip = parts[8]
        lev = parts[9].reshape(n_mb, 4, 4, 4, 4)
        dc = parts[10].reshape(n_mb, 4, 4)
        levc = parts[11].reshape(n_mb, 2, 2, 2, 4, 4)
        dcc = parts[12].reshape(n_mb, 2, 2, 2)
        ipm_plane = parts[13].reshape(4 * H, 4 * W)
        planes.Y, planes.U, planes.V = recon
        self._fill_b_state_rd(st, win, pdir8, idx0, m0x, m0y, m1x, m1y,
                              i16mode, cip, lev, dc, levc, dcc, poc,
                              pocs0, poc1, ipm_plane)
        nr0 = len(pocs0)
        sh = SliceHeader(
            slice_type_code=SliceType.B.value,
            frame_num=frame_num % sps.max_frame_num,
            is_idr=False,
            nal_ref_idc=3 if is_ref else 0,
            pic_order_cnt_lsb=(
                poc % (1 << (sps.log2_max_pic_order_cnt_lsb_minus4 + 4))
            ),
            direct_spatial_mv_pred_flag=False,
            num_ref_idx_active_override_flag=True,
            num_ref_idx_l0_active_minus1=nr0 - 1,
            num_ref_idx_l1_active_minus1=0,
            slice_qp_delta=qp - (26 + pps.pic_init_qp_minus26),
        )
        w = write_slice_header(sh, sps, pps)
        if pps.entropy_coding_mode_flag:
            writer = CabacSliceWriter(st, sps, pps, sh)
            writer.write_slice_data(w, list(range(st.n_mbs)))
        else:
            writer = CavlcSliceWriter(st, sps, pps, sh)
            writer.write_slice_data(w, list(range(st.n_mbs)))
            w.rbsp_trailing_bits()
        if is_ref:
            # stored B: later Bs use it as colocated (temporal direct
            # host fill reads its final state from recon_pics)
            self.recon_pics = (self.recon_pics + [(poc, planes, st, None)])[
                -self.sps.num_ref_frames:
            ]
        nal = NalUnit(1, 3 if is_ref else 0, w.get_bytes())
        if self.rc is not None:
            self.rc.post_frame("B", 8 * (len(nal.rbsp) + 5), 1.0)
        self.all_recons.append((poc, planes))
        return [nal]

    def _fill_b_state_rd(self, st, win, pdir8, idx0, m0x, m0y, m1x, m1y,
                         i16mode, cip, lev, dc, levc, dcc, poc, pocs0,
                         poc1, ipm_plane=None):
        n_mb = st.n_mbs
        n_my, n_mx = st.H, st.W
        NONE = -(10 ** 9)
        i4 = win == RD.B_I4
        i16 = win == RD.B_I16
        intra = i16 | i4
        direct = (win == RD.B_DIRECT) | (win == RD.B_DIRECT_ZERO)
        h168 = win == RD.B_L0_16x8
        h816 = win == RD.B_L0_8x16
        p8 = win == RD.B_P8X8
        if ipm_plane is None:
            st.ipredmode[:] = 2
        else:
            st.ipredmode[:] = ipm_plane.reshape(4 * n_my, 4 * n_mx)
        st.is_intra[:] = intra
        st.i16mode[:] = np.where(i16, i16mode, -1)
        st.c_ipred_mode[:] = np.where(intra, cip, 0)
        st.mb_type[:] = np.where(
            direct, M.BSKIP_DIRECT,
            np.where(i4, M.I4MB, np.where(i16, M.I16MB,
                     np.where(h168, M.P16x8,
                              np.where(h816, M.P8x16,
                                       np.where(p8, M.P8x8, M.P16x16))))))
        st.b8mode[:] = np.where(
            direct, M.B8_DIRECT,
            np.where(i4, M.IBLOCK, np.where(
                i16, 0, np.where(h168, 2, np.where(h816, 3, 1)))))[:, None]
        pd = np.where(win == RD.B_L0, M.PD_L0,
                      np.where(win == RD.B_L1, M.PD_L1, M.PD_BI))
        st.b8pdir[:] = np.where(intra, M.PD_INTRA, pd)[:, None]
        halves = h168 | h816
        st.b8pdir[halves] = pdir8[halves]
        # P8x8: per-unit sub-mode (pdir8 3 = direct 8x8)
        if p8.any():
            udir = pdir8[p8] == 3
            st.b8mode[p8] = np.where(udir, M.B8_DIRECT, M.B8_8x8)
            st.b8pdir[p8] = np.where(udir, M.PD_BI, pdir8[p8])
        # residuals (shared layout with the P fill)
        zperm = np.empty(16, np.int64)
        for br in range(4):
            for bc in range(4):
                zperm[int(M.XY_TO_BLK4[br, bc])] = br * 4 + bc
        st.luma_levels[:] = lev.reshape(n_mb, 16, 4, 4)[:, zperm]
        st.luma_dc[:] = np.where(i16[:, None, None], dc, 0)
        st.chroma_levels[:] = levc.reshape(n_mb, 2, 4, 4, 4)
        st.chroma_dc[:] = dcc
        nz4 = lev.any(axis=(3, 4))
        q8 = nz4.reshape(n_mb, 2, 2, 2, 2).any(axis=(2, 4))
        cbp_inter = (q8[:, 0, 0] * 1 + q8[:, 0, 1] * 2 + q8[:, 1, 0] * 4
                     + q8[:, 1, 1] * 8)
        cbp_l = np.where(i16, np.where(nz4.any((1, 2)), 15, 0), cbp_inter)
        has_ac = levc.any(axis=(2, 3, 4, 5)).any(axis=1)
        has_dc = dcc.any(axis=(2, 3)).any(axis=1)
        cbp_c = np.where(has_ac, 2, np.where(has_dc, 1, 0))
        st.cbp[:] = cbp_l + 16 * cbp_c
        weights = (1 << np.arange(16, dtype=np.int64)).reshape(4, 4)
        st.cbp_blk = ((nz4 * weights).sum(axis=(1, 2))
                      | (dc.any(axis=(1, 2)) & i16)).tolist()

        # motion state: explicit 16x16 first (direct derived after)
        def to_pic4(a8):
            p = (a8.reshape(n_my, n_mx, 2, 2).transpose(0, 2, 1, 3)
                 .reshape(2 * n_my, 2 * n_mx))
            return np.repeat(np.repeat(p, 2, 0), 2, 1)

        use0 = np.isin(win, (RD.B_L0, RD.B_BI))
        use1 = np.isin(win, (RD.B_L1, RD.B_BI))
        # per-unit list usage (halves + P8x8 carry per-unit pdir;
        # per-unit direct uses both lists)
        hp = halves | p8
        u0_u = np.where(hp[:, None], (pdir8 == 0) | (pdir8 >= 2),
                        use0[:, None])
        u1_u = np.where(hp[:, None], pdir8 >= 1, use1[:, None])

        def to_pic4_u(a8):
            p = (a8.reshape(n_my, n_mx, 2, 2).transpose(0, 2, 1, 3)
                 .reshape(2 * n_my, 2 * n_mx))
            return np.repeat(np.repeat(p, 2, 0), 2, 1)

        u0_4 = to_pic4_u(u0_u)
        u1_4 = to_pic4_u(u1_u)
        poc_of0 = np.asarray(pocs0, np.int64)
        r4 = to_pic4(idx0)
        st.mv[0, ..., 0] = np.where(u0_4, to_pic4(m0x), 0)
        st.mv[0, ..., 1] = np.where(u0_4, to_pic4(m0y), 0)
        st.ref_idx[0] = np.where(u0_4, r4, -1)
        st.ref_pic_id[0] = np.where(
            u0_4, poc_of0[np.clip(r4, 0, len(pocs0) - 1)], NONE)
        st.mv[1, ..., 0] = np.where(u1_4, to_pic4(m1x), 0)
        st.mv[1, ..., 1] = np.where(u1_4, to_pic4(m1y), 0)
        st.ref_idx[1] = np.where(u1_4, 0, -1)
        st.ref_pic_id[1] = np.where(u1_4, poc1, NONE)

        # temporal direct derivation for direct MBs (whole-frame; decoder
        # semantics) + exact PMV/MVD for explicit MBs
        fut = next(e for e in self.recon_pics if e[0] == poc1)
        ast = fut[2]
        col = {
            "ref_idx0": ast.ref_idx[0], "ref_idx1": ast.ref_idx[1],
            "ref_id0": ast.ref_pic_id[0], "ref_id1": ast.ref_pic_id[1],
            "mv0": ast.mv[0], "mv1": ast.mv[1],
        }
        FL.fill_temporal_direct(
            st, direct, col, poc, list(pocs0), poc1,
            inference=bool(self.sps.direct_8x8_inference_flag))
        # per-unit direct 8x8 inside P8x8 MBs (decoder-exact derivation
        # overwrites the device values for the masked units only)
        p8dir = p8[:, None] & (pdir8 == 3)
        if p8dir.any():
            FL.fill_temporal_direct(
                st, p8dir.any(1), col, poc, list(pocs0), poc1,
                inference=bool(self.sps.direct_8x8_inference_flag),
                unit_mask=p8dir)
        st.skip_flag[direct & (st.cbp == 0)] = 1
        FL.fill_b_explicit_mvd(st, use0, use1)
        FL.fill_b_half_mvd(st, h168, h816, pdir8)
        FL.fill_b_p8_mvd(st, p8, pdir8)

    def _start_p_fast(self, yuv):
        """Dispatch the device step for a fast-path P frame.

        The next reference state chains on device (p_frame_pipeline fuses
        recon + deblock + qpel-plane prep), so this never blocks; the host
        outputs are fetched later by _finish_p_fast."""
        if self.cfg.rd:
            return self._start_p_rd(yuv)
        import jax.numpy as jnp

        cfg, sps, pps = self.cfg, self.sps, self.pps
        H, W = sps.height, sps.width
        qp = cfg.qp
        cb_off, _ = pps.chroma_qp_offset
        qp_c = chroma_qp(qp, cb_off)
        cur = tuple(
            jnp.asarray(np.ascontiguousarray(p, np.uint8)) for p in yuv
        )
        host_out, recon, new_ref = FAST.p_frame_pipeline(
            *cur, *self._dev_ref, H=H, W=W, R=min(cfg.search_range, 28),
            qp=qp, qp_c=qp_c, lambda_me=self.lambda_mode_fx,
        )
        frame_num = self.frame_num
        self.frame_num += 1
        ref_poc = self._prev_poc
        poc = 2 * frame_num
        self._prev_poc = poc
        self._dev_ref = new_ref
        return (host_out, recon, new_ref, frame_num, poc, ref_poc, qp)

    def _finish_p_fast(self, pending, fetched=None) -> list[NalUnit]:
        """Run the host tail (state fill, entropy coding, NAL packing) for a
        previously dispatched P frame.  `fetched` is the frame's flat output
        row when the caller already did a batched fetch; otherwise the flat
        buffer is fetched here."""
        import jax as _jax

        if isinstance(pending[0], str):
            return self._finish_p_rd(pending, fetched=fetched)
        host_out, recon, dev_ref, frame_num, poc, ref_poc, qp = pending
        cfg, sps, pps = self.cfg, self.sps, self.pps
        W, H = sps.pic_width_in_mbs, sps.frame_height_in_mbs
        st = PictureParseState(W, H)
        planes = Planes(sps)
        st.slice_id[:] = 0
        st.qp[:] = qp
        cb_off, cr_off = pps.chroma_qp_offset
        st.qpc[:, 0] = chroma_qp(qp, cb_off)
        st.qpc[:, 1] = chroma_qp(qp, cr_off)
        if fetched is None:
            fetched = np.asarray(host_out)
        n_mb = W * H
        Wp, Hp = sps.width, sps.height
        sizes = [n_mb, n_mb, Wp * Hp, Wp * Hp // 4, 4 * n_mb,
                 Wp * Hp // 4, 4 * n_mb]
        parts = np.split(fetched, np.cumsum(sizes)[:-1])
        (mvx, mvy, lev, lev_u, dc_u, lev_v, dc_v) = parts
        mvx = mvx.reshape(H, W)
        mvy = mvy.reshape(H, W)
        lev = lev.reshape(4 * H, 4 * W, 4, 4)
        lev_u = lev_u.reshape(Hp // 8, Wp // 8, 4, 4)
        lev_v = lev_v.reshape(Hp // 8, Wp // 8, 4, 4)
        dc_u = dc_u.reshape(H, W, 2, 2)
        dc_v = dc_v.reshape(H, W, 2, 2)
        # recon stays on device; materialized only if the caller reads it
        planes.Y, planes.U, planes.V = recon
        self._fill_p_state(st, mvx, mvy, lev, lev_u.astype(np.int32),
                           dc_u.astype(np.int32), lev_v.astype(np.int32),
                           dc_v.astype(np.int32), ref_poc)
        sh = SliceHeader(
            slice_type_code=SliceType.P.value,
            frame_num=frame_num % sps.max_frame_num,
            is_idr=False,
            nal_ref_idc=3,
            slice_qp_delta=qp - (26 + pps.pic_init_qp_minus26),
        )
        w = write_slice_header(sh, sps, pps)
        if pps.entropy_coding_mode_flag:
            writer = CabacSliceWriter(st, sps, pps, sh)
            writer.write_slice_data(w, list(range(st.n_mbs)))
        else:
            writer = CavlcSliceWriter(st, sps, pps, sh)
            writer.write_slice_data(w, list(range(st.n_mbs)))
            w.rbsp_trailing_bits()
        nal = NalUnit(1, 3, w.get_bytes())
        self.all_recons.append((poc, planes))
        self.recon_pics = (self.recon_pics + [(poc, planes, st, dev_ref)])[
            -self.cfg.num_ref_frames:
        ]
        return [nal]

    def _fill_p_state(self, st, mvx, mvy, lev, lev_u, dc_u, lev_v, dc_v,
                      ref_id):
        from ..decoder.mv import pmv as _pmv, _pskip_mv as _pskip

        n_mx, n_my = st.W, st.H
        n_mb = st.n_mbs
        # ---- vectorized state fill ----
        st.ipredmode[:] = 2
        st.mb_type[:] = M.P16x16
        st.b8mode[:] = 1
        st.b8pdir[:] = 0
        st.ref_idx[0] = 0
        mvs = np.stack([mvx, mvy], axis=-1).reshape(n_my, n_mx, 2)
        st.mv[0] = np.repeat(np.repeat(mvs, 4, axis=0), 4, axis=1).reshape(
            4 * st.H, 4 * st.W, 2
        )
        st.ref_pic_id[0] = ref_id
        # luma levels: (H/4, W/4, 4, 4) -> (nMB, 16 Z-order, 4, 4)
        lv = lev.reshape(n_my, 4, n_mx, 4, 4, 4).transpose(0, 2, 1, 3, 4, 5)
        lv = lv.reshape(n_mb, 4, 4, 4, 4)
        zperm = np.empty(16, np.int64)
        for br in range(4):
            for bc in range(4):
                zperm[int(M.XY_TO_BLK4[br, bc])] = br * 4 + bc
        st.luma_levels[:] = lv.reshape(n_mb, 16, 4, 4)[:, zperm]
        nz4 = lv.any(axis=(3, 4))  # (nMB, 4br, 4bc)
        # cbp luma bits per 8x8
        q8 = nz4.reshape(n_mb, 2, 2, 2, 2).any(axis=(2, 4))  # (nMB, br8, bc8)
        cbp_l = (
            q8[:, 0, 0] * 1 + q8[:, 0, 1] * 2 + q8[:, 1, 0] * 4 + q8[:, 1, 1] * 8
        )
        # cbp_blk raster bitmap
        weights = (1 << np.arange(16, dtype=np.int64)).reshape(4, 4)
        cbp_blk = (nz4 * weights).sum(axis=(1, 2))
        st.cbp_blk = cbp_blk.tolist()
        # chroma
        cbp_c = np.zeros(n_mb, np.int32)
        for uv, (lvc, dcc) in enumerate(((lev_u, dc_u), (lev_v, dc_v))):
            st.chroma_dc[:, uv] = dcc.reshape(n_mb, 2, 2)
            lc = lvc.reshape(n_my, 2, n_mx, 2, 4, 4).transpose(0, 2, 1, 3, 4, 5)
            lc = lc.reshape(n_mb, 4, 4, 4)
            st.chroma_levels[:, uv] = lc
            has_dc = dcc.reshape(n_mb, 4).any(axis=1)
            has_ac = lc.any(axis=(1, 2, 3))
            cbp_c = np.maximum(cbp_c, np.where(has_ac, 2, np.where(has_dc, 1, 0)))
        st.cbp[:] = cbp_l + 16 * cbp_c
        # PMV/MVD + skip detection (sequential: PMV depends on final
        # neighbor MVs which are all known; skip flags don't affect MVs)
        for addr in range(st.n_mbs):
            x4, y4 = st.mb_block_origin(addr)
            mv = (int(st.mv[0, y4, x4, 0]), int(st.mv[0, y4, x4, 1]))
            if int(st.cbp[addr]) == 0:
                smv = _pskip(st, addr)
                if tuple(smv) == mv:
                    st.skip_flag[addr] = 1
                    st.mb_type[addr] = M.PSKIP
                    st.b8mode[addr] = 0
                    continue
            p = _pmv(st, addr, 0, 0, 0, 0, 4, 4)
            st.mvd[0, y4 : y4 + 4, x4 : x4 + 4] = (mv[0] - p[0], mv[1] - p[1])


class _FrameEncoder:
    """Per-frame MB encoding loop (decision + quant + recon)."""

    def __init__(self, parent, st, planes, Y, U, V, stype, qp, ref, sad_grids,
                 ref1=None, sad_grids1=None, b_info=None):
        self.p = parent
        self.st = st
        self.pl = planes
        self.Y, self.U, self.V = Y, U, V
        self.stype = stype
        self.qp = qp
        self.qpc = (int(st.qpc[0, 0]), int(st.qpc[0, 1]))
        self.refs = [ref, ref1]  # (poc, planes, state, padded) or None
        self.grids = [sad_grids, sad_grids1]
        self.b_info = b_info
        self.sps = parent.sps
        self.pps = parent.pps
        self.R = parent.cfg.search_range
        self.W = st.W
        # per-picture lambdas (SetLagrangianMultipliers, lencod/src/slice.c
        # :1261: 0.68 base with B pictures else 0.85, x0.95 non-SATD ME;
        # B slices x clip3(2, 4, qp_temp/6))
        base = (0.68 if parent.cfg.b_frames > 0 else 0.85) * 0.95
        lam = base * 2.0 ** ((qp - 12) / 3.0)
        if stype == SliceType.B:
            lam *= min(4.0, max(2.0, (qp - 12) / 6.0))
        self.lambda_mode = lam
        self.lambda_me = int(np.sqrt(lam) * 65536 + 0.5)

    # ------------------------------------------------------------------
    def encode_mb(self, addr: int):
        st = self.st
        # decoder convention: ipredmode defaults to DC for every MB; I4
        # overwrites per block (neighbors' MPM depends on this)
        x4, y4 = st.mb_block_origin(addr)
        st.ipredmode[y4 : y4 + 4, x4 : x4 + 4] = 2
        if self.stype == SliceType.B:
            self._encode_b_mb(addr)
        elif self.stype == SliceType.P:
            inter = self._try_inter(addr)
            intra = self._intra_cost(addr)
            if inter[0] <= intra[0]:
                self._commit_inter(addr, inter)
                return
            self._commit_intra(addr, intra)
        else:
            intra = self._intra_cost(addr)
            self._commit_intra(addr, intra)

    # ------------------------------------------------------------------
    # intra
    # ------------------------------------------------------------------
    def _mb_px(self, addr):
        return (addr % self.W) * 16, (addr // self.W) * 16

    def _intra_avail(self, addr):
        st = self.st
        up = st.mb_up(addr)
        left = st.mb_left(addr)
        ula, ulmb, *_ = st.luma4x4_neighbor(addr, -1, -1)
        return up >= 0, left >= 0, ula

    def _intra_cost(self, addr: int):
        """Choose I16 mode (and later compare vs I4). Returns
        (cost, 'I16', mode) or (cost, 'I4', None)."""
        mx, my = self._mb_px(addr)
        orig = self.Y[my : my + 16, mx : mx + 16]
        au, al, aul = self._intra_avail(addr)
        Yp = self.pl.Y
        up = Yp[my - 1, mx : mx + 16] if au else np.zeros(16, np.int32)
        left = Yp[my : my + 16, mx - 1] if al else np.zeros(16, np.int32)
        upleft = int(Yp[my - 1, mx - 1]) if aul else 0
        best = (1 << 60, None)
        for mode in range(4):
            if mode == IP.VERT_PRED_16 and not au:
                continue
            if mode == IP.HOR_PRED_16 and not al:
                continue
            if mode == IP.PLANE_16 and not (au and al and aul):
                continue
            pred = IP.pred16x16(mode, up, left, upleft, au, al, aul)
            cost = int(np.abs(orig - pred).sum())
            if cost < best[0]:
                best = (cost, mode)
        i16_cost, i16_mode = best
        if self.p.cfg.enable_i4:
            # I4 estimated cost: per-block best SAD against current recon
            # neighbors (approximation: decision uses predicted-from-recon
            # so committed recon matches; see _commit_i4)
            i4_cost = self._i4_estimate(addr)
            bias = int(6 * self.lambda_mode)
            if i4_cost + bias < i16_cost:
                return (i4_cost + bias, "I4", None)
        return (i16_cost, "I16", i16_mode)

    def _i4_estimate(self, addr: int) -> int:
        """Sum of per-block best-mode SADs using original (not recon)
        neighbors — a fast estimate for the I16-vs-I4 choice only."""
        mx, my = self._mb_px(addr)
        au, al, _ = self._intra_avail(addr)
        total = 0
        Yp = self.pl.Y
        for blk in range(16):
            bx, by = (int(v) for v in M.BLK4_TO_XY[blk])
            px, py = mx + bx * 4, my + by * 4
            orig = self.Y[py : py + 4, px : px + 4]
            bu = au or by > 0
            bl = al or bx > 0
            up = self.Y[py - 1, px : px + 4] if bu else None
            left = self.Y[py : py + 4, px - 1] if bl else None
            cands = [IP.DC_PRED]
            if bu:
                cands.append(IP.VERT_PRED)
            if bl:
                cands.append(IP.HOR_PRED)
            bestc = 1 << 60
            for mode in cands:
                pred = IP.pred4x4(
                    mode,
                    up.tolist() if up is not None else None,
                    None,
                    left.tolist() if left is not None else None,
                    0,
                    bu,
                    bl,
                    False,
                    False,
                )
                c = int(np.abs(orig - pred).sum())
                bestc = min(bestc, c)
            total += bestc + 60  # ~4*lambda mode bits
        return total

    def _commit_intra(self, addr: int, intra):
        _, kind, mode = intra
        if kind == "I16":
            self._commit_i16(addr, mode)
        else:
            self._commit_i4(addr)
        self._encode_chroma_intra(addr)
        self.st.is_intra[addr] = 1

    # -- I16 ----------------------------------------------------------
    def _commit_i16(self, addr: int, mode: int):
        st, pl = self.st, self.pl
        mx, my = self._mb_px(addr)
        orig = self.Y[my : my + 16, mx : mx + 16]
        au, al, aul = self._intra_avail(addr)
        Yp = pl.Y
        up = Yp[my - 1, mx : mx + 16] if au else np.zeros(16, np.int32)
        left = Yp[my : my + 16, mx - 1] if al else np.zeros(16, np.int32)
        upleft = int(Yp[my - 1, mx - 1]) if aul else 0
        pred = IP.pred16x16(mode, up, left, upleft, au, al, aul)
        res = orig - pred
        qp = self.qp
        # 4x4 transforms of all 16 blocks
        blocks = res.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)
        # reorder rows: we want Z-order per BLK4; build raster-order (r, c)
        blk_rc = res.reshape(4, 4, 4, 4).swapaxes(1, 2)  # [br][bc][4][4]
        coefs = TR.forward4x4(blk_rc.astype(np.int64))
        dc = coefs[:, :, 0, 0].copy()  # [br][bc]
        # DC path: hadamard + quant
        dch = TR.hadamard4x4(dc) >> 1  # JM: (hadamard)>>1 before quant
        wi = None if self.p._ws4 is None else self.p._ws4[0]
        dc_lev = Q.quant_luma_dc(dch, qp, intra=True, weight_scale=wi)
        st.luma_dc[addr] = dc_lev
        if dc_lev.any():
            st.cbp_blk[addr] |= 1
        # AC path
        offset = Q.default_offset4(qp, True)
        lev = Q.quant4x4(coefs, qp, offset, wi)
        lev[:, :, 0, 0] = 0
        cbp_ac = 0
        for br in range(4):
            for bc in range(4):
                blk = int(M.XY_TO_BLK4[br, bc])
                if lev[br, bc].any():
                    cbp_ac = 15
                    st.cbp_blk[addr] |= 1 << (4 * br + bc)
                st.luma_levels[addr, blk] = lev[br, bc]
        st.mb_type[addr] = M.I16MB
        st.i16mode[addr] = mode
        st.cbp[addr] = cbp_ac
        # reconstruct exactly like the decoder
        dc_deq = Q.dequant_luma_dc(
            TR.hadamard4x4(dc_lev.astype(np.int64)), qp, wi)
        rec = np.empty((16, 16), np.int32)
        for br in range(4):
            for bc in range(4):
                blk = int(M.XY_TO_BLK4[br, bc])
                coef = Q.dequant4x4(
                    st.luma_levels[addr, blk], qp, wi).astype(np.int64)
                coef[0, 0] = dc_deq[br, bc]
                r4 = TR.inverse4x4(coef)
                rec[br * 4 : br * 4 + 4, bc * 4 : bc * 4 + 4] = _add_residual(
                    pred[br * 4 : br * 4 + 4, bc * 4 : bc * 4 + 4], r4
                )
        pl.Y[my : my + 16, mx : mx + 16] = rec

    # -- I4 -----------------------------------------------------------
    def _commit_i4(self, addr: int):
        st, pl = self.st, self.pl
        mx, my = self._mb_px(addr)
        qp = self.qp
        x4o, y4o = st.mb_block_origin(addr)
        st.mb_type[addr] = M.I4MB
        st.is_intra[addr] = 1  # needed for in-MB neighbor decisions
        st.b8mode[addr] = M.IBLOCK
        st.b8pdir[addr] = -1
        offset = Q.default_offset4(qp, True)
        wi = None if self.p._ws4 is None else self.p._ws4[0]
        cbp = 0
        for blk in range(16):
            bx, by = (int(v) for v in M.BLK4_TO_XY[blk])
            ioff, joff = bx * 4, by * 4
            px, py = mx + ioff, my + joff
            orig = self.Y[py : py + 4, px : px + 4]
            pred, mode = self._best_i4_block(addr, ioff, joff, px, py, orig)
            st.ipredmode[y4o + by, x4o + bx] = mode
            res = (orig - pred).astype(np.int64)
            coef = TR.forward4x4(res)
            lev = Q.quant4x4(coef, qp, offset, wi)
            if lev.any():
                st.luma_levels[addr, blk] = lev
                cbp |= 1 << (2 * (by // 2) + (bx // 2))
                st.cbp_blk[addr] |= 1 << (4 * by + bx)
                deq = Q.dequant4x4(lev, qp, wi).astype(np.int64)
                rec = _add_residual(pred, TR.inverse4x4(deq))
            else:
                rec = pred
            pl.Y[py : py + 4, px : px + 4] = rec
        st.cbp[addr] = cbp

    def _best_i4_block(self, addr, ioff, joff, px, py, orig):
        st, pl = self.st, self.pl
        la, lmb, *_ = st.luma4x4_neighbor(addr, ioff - 1, joff)
        ua, umb, *_ = st.luma4x4_neighbor(addr, ioff, joff - 1)
        ura, urmb, *_ = st.luma4x4_neighbor(addr, ioff + 4, joff - 1)
        ula, ulmb, *_ = st.luma4x4_neighbor(addr, ioff - 1, joff - 1)
        if ioff == 4 and (joff == 4 or joff == 12):
            ura = False
        if self.pps.constrained_intra_pred_flag:
            la = la and bool(st.is_intra[lmb])
            ua = ua and bool(st.is_intra[umb])
            ura = ura and bool(st.is_intra[urmb])
            ula = ula and bool(st.is_intra[ulmb])
        Yp = pl.Y
        up = Yp[py - 1, px : px + 4].tolist() if ua else None
        upright = Yp[py - 1, px + 4 : px + 8].tolist() if ura else None
        left = Yp[py : py + 4, px - 1].tolist() if la else None
        upleft = int(Yp[py - 1, px - 1]) if ula else 0
        # candidate modes by availability (spec constraints)
        cands = [IP.DC_PRED]
        if ua:
            cands += [IP.VERT_PRED, IP.DIAG_DOWN_LEFT_PRED, IP.VERT_LEFT_PRED]
        if la:
            cands += [IP.HOR_PRED, IP.HOR_UP_PRED]
        if ua and la and ula:
            cands += [IP.DIAG_DOWN_RIGHT_PRED, IP.VERT_RIGHT_PRED, IP.HOR_DOWN_PRED]
        mpm = self._mpm(addr, ioff >> 2, joff >> 2)
        best = (1 << 60, None, None)
        for mode in cands:
            pred = IP.pred4x4(mode, up, upright, left, upleft, ua, la, ula, ura)
            cost = int(np.abs(orig - pred).sum())
            if mode != mpm:
                cost += int(self.lambda_mode * 4)
            if cost < best[0]:
                best = (cost, pred, mode)
        return best[1], best[2]

    def _mpm(self, addr, bx, by):
        st = self.st
        la, lmb, _, _, lx, ly = st.luma4x4_neighbor(addr, (bx << 2) - 1, by << 2)
        ua, umb, _, _, ux, uy = st.luma4x4_neighbor(addr, bx << 2, (by << 2) - 1)
        if self.pps.constrained_intra_pred_flag:
            la = la and bool(st.is_intra[lmb])
            ua = ua and bool(st.is_intra[umb])
        left_m = int(st.ipredmode[ly, lx]) if la else -1
        up_m = int(st.ipredmode[uy, ux]) if ua else -1
        return 2 if (left_m < 0 or up_m < 0) else min(left_m, up_m)

    # -- chroma (intra) -------------------------------------------------
    def _encode_chroma_intra(self, addr: int):
        st, pl = self.st, self.pl
        cw, ch = self.sps.mb_chroma_size
        cx, cy = (addr % self.W) * cw, (addr // self.W) * ch
        au, al, aul = self._intra_avail(addr)
        best = (1 << 60, 0)
        for mode in range(4):
            if mode == IP.HOR_PRED_8 and not al:
                continue
            if mode == IP.VERT_PRED_8 and not au:
                continue
            if mode == IP.PLANE_8 and not (au and al and aul):
                continue
            cost = 0
            for orig_plane, rec_plane in ((self.U, pl.U), (self.V, pl.V)):
                up = rec_plane[cy - 1, cx : cx + cw] if au else np.zeros(cw, np.int32)
                left = rec_plane[cy : cy + ch, cx - 1] if al else np.zeros(ch, np.int32)
                upleft = int(rec_plane[cy - 1, cx - 1]) if (au and al and aul) else 0
                pred = IP.pred_chroma(mode, up, left, upleft, au, al, cw, ch)
                cost += int(
                    np.abs(orig_plane[cy : cy + ch, cx : cx + cw] - pred).sum()
                )
            if cost < best[0]:
                best = (cost, mode)
        mode = best[1]
        st.c_ipred_mode[addr] = mode
        self._chroma_residual(addr, mode=mode, mc_pred=None)

    def _chroma_residual(self, addr: int, mode=None, mc_pred=None):
        """Quantize chroma residual (intra pred mode or MC pred given) and
        reconstruct; updates cbp chroma bits."""
        st, pl = self.st, self.pl
        cw, ch = self.sps.mb_chroma_size
        cx, cy = (addr % self.W) * cw, (addr // self.W) * ch
        au, al, aul = self._intra_avail(addr)
        cbp_c = 0  # 0 none, 1 dc only, 2 ac
        intra = bool(st.is_intra[addr]) or mode is not None
        recs = []
        all_dc_levels = []
        all_ac_levels = []
        for uv, (orig_plane, rec_plane) in enumerate(((self.U, pl.U), (self.V, pl.V))):
            qp_c = int(st.qpc[addr, uv])
            if mc_pred is not None:
                pred = mc_pred[uv]
            else:
                up = rec_plane[cy - 1, cx : cx + cw] if au else np.zeros(cw, np.int32)
                left = rec_plane[cy : cy + ch, cx - 1] if al else np.zeros(ch, np.int32)
                upleft = int(rec_plane[cy - 1, cx - 1]) if (au and al and aul) else 0
                pred = IP.pred_chroma(mode, up, left, upleft, au, al, cw, ch)
            orig = orig_plane[cy : cy + ch, cx : cx + cw]
            res = (orig - pred).astype(np.int64)
            blk_rc = res.reshape(2, 4, 2, 4).swapaxes(1, 2)  # [br][bc][4][4]
            coefs = TR.forward4x4(blk_rc)
            dc = coefs[:, :, 0, 0].copy()
            dch = TR.hadamard2x2(dc)
            wc = (None if self.p._ws4 is None
                  else self.p._ws4[(1 if intra else 4) + uv])
            dc_lev = Q.quant_chroma_dc(dch, qp_c, intra, weight_scale=wc)
            st.chroma_dc[addr, uv] = dc_lev
            offset = Q.default_offset4(qp_c, intra)
            lev = Q.quant4x4(coefs, qp_c, offset, wc)
            lev[:, :, 0, 0] = 0
            for br in range(2):
                for bc in range(2):
                    st.chroma_levels[addr, uv, br * 2 + bc] = lev[br, bc]
            if lev.any():
                cbp_c = 2
            elif dc_lev.any():
                cbp_c = max(cbp_c, 1)
            all_dc_levels.append(dc_lev)
            all_ac_levels.append(lev)
            recs.append((pred, qp_c))
        # reconstruct
        for uv, (orig_plane, rec_plane) in enumerate(((self.U, pl.U), (self.V, pl.V))):
            pred, qp_c = recs[uv]
            dch2 = TR.hadamard2x2(st.chroma_dc[addr, uv].astype(np.int64))
            wc = (None if self.p._ws4 is None
                  else self.p._ws4[(1 if intra else 4) + uv])
            dc_deq = Q.dequant_chroma_dc(dch2, qp_c, wc)
            rec = np.empty((ch, cw), np.int32)
            for br in range(2):
                for bc in range(2):
                    coef = Q.dequant4x4(
                        st.chroma_levels[addr, uv, br * 2 + bc], qp_c, wc
                    ).astype(np.int64)
                    coef[0, 0] = dc_deq[br, bc]
                    if coef.any():
                        r4 = TR.inverse4x4(coef)
                        rec[br * 4 : br * 4 + 4, bc * 4 : bc * 4 + 4] = _add_residual(
                            pred[br * 4 : br * 4 + 4, bc * 4 : bc * 4 + 4], r4
                        )
                    else:
                        rec[br * 4 : br * 4 + 4, bc * 4 : bc * 4 + 4] = pred[
                            br * 4 : br * 4 + 4, bc * 4 : bc * 4 + 4
                        ]
            rec_plane[cy : cy + ch, cx : cx + cw] = rec
        st.cbp[addr] = int(st.cbp[addr]) + 16 * cbp_c

    # ------------------------------------------------------------------
    # inter
    # ------------------------------------------------------------------
    def _try_inter(self, addr: int, lst: int = 0):
        """16x16 ME on reference list `lst`: grid lookup + MV cost + subpel
        refine.  Returns (cost, mv, pred_y, pmv, mv_rate_cost)."""
        st = self.st
        mbx, mby = addr % self.W, addr // self.W
        R = self.R
        grid = self.grids[lst][:, :, mby, mbx]  # (2R+1, 2R+1)
        px, py = predict_mv(st, addr, lst, 0, 0, 0, 4, 4)
        lam = self.lambda_me
        # integer search with MV cost
        dyx = np.indices(grid.shape)
        mvx_q = (dyx[1] - R) * 4
        mvy_q = (dyx[0] - R) * 4
        costs = grid.astype(np.int64)
        # vectorized mv bit cost
        bits = _mv_bits_vec(mvx_q - px) + _mv_bits_vec(mvy_q - py)
        costs = costs + ((lam * bits) >> 16)
        best_flat = int(np.argmin(costs))
        bdy, bdx = divmod(best_flat, 2 * R + 1)
        best_mv = ((bdx - R) * 4, (bdy - R) * 4)
        best_cost = int(costs[bdy, bdx])
        mx, my = self._mb_px(addr)
        orig = self.Y[my : my + 16, mx : mx + 16]
        Ypad = self.refs[lst][3][0]
        if self.p.cfg.subpel:
            for step in (2, 1):  # half then quarter
                center = best_mv
                for ddy in (-step, 0, step):
                    for ddx in (-step, 0, step):
                        if ddx == 0 and ddy == 0:
                            continue
                        mv = (center[0] + ddx, center[1] + ddy)
                        pred = self._mc_luma(Ypad, mx, my, mv, 16, 16)
                        c = int(np.abs(orig - pred).sum())
                        c += (lam * (ME.mv_bits(mv[0] - px) + ME.mv_bits(mv[1] - py))) >> 16
                        if c < best_cost:
                            best_cost = c
                            best_mv = mv
        pred = self._mc_luma(Ypad, mx, my, best_mv, 16, 16)
        mv_cost = (
            lam * (ME.mv_bits(best_mv[0] - px) + ME.mv_bits(best_mv[1] - py))
        ) >> 16
        return (best_cost, best_mv, pred, (px, py), mv_cost)

    def _mc_luma(self, Ypad, px, py, mv, w, h):
        width, height = self.sps.width, self.sps.height
        xi = px + (mv[0] >> 2)
        yi = py + (mv[1] >> 2)
        dx, dy = mv[0] & 3, mv[1] & 3
        xi = max(-(MC.PAD - 8), min(width + MC.PAD - w - 8, xi))
        yi = max(-(MC.PAD - 8), min(height + MC.PAD - h - 8, yi))
        return MC.luma_block(Ypad, MC.PAD, xi, yi, dx, dy, w, h)

    def _commit_inter(self, addr: int, inter):
        st, pl = self.st, self.pl
        _, mv, pred, (pmx, pmy), _mvc = inter
        mx, my = self._mb_px(addr)
        x4, y4 = st.mb_block_origin(addr)
        qp = self.qp
        self._luma_residual_recon(addr, pred, allow8x8=True)
        st.mb_type[addr] = M.P16x16
        st.b8mode[addr] = 1
        st.b8pdir[addr] = 0
        st.ref_idx[0, y4 : y4 + 4, x4 : x4 + 4] = 0
        st.mv[0, y4 : y4 + 4, x4 : x4 + 4] = mv
        st.ref_pic_id[0, y4 : y4 + 4, x4 : x4 + 4] = self.refs[0][0]
        st.mvd[0, y4 : y4 + 4, x4 : x4 + 4] = (mv[0] - pmx, mv[1] - pmy)

        # chroma MC prediction
        cw, ch = self.sps.mb_chroma_size
        cwidth, cheight = self.sps.width >> 1, self.sps.height >> 1
        preds_c = []
        for plane_pad in (self.refs[0][3][1], self.refs[0][3][2]):
            cx_full = (mx >> 1) + (mv[0] >> 3)
            cy_full = (my >> 1) + (mv[1] >> 3)
            fx, fy = mv[0] & 7, mv[1] & 7
            cx_full = max(-(MC.PAD - 4), min(cwidth + MC.PAD - cw - 4, cx_full))
            cy_full = max(-(MC.PAD - 4), min(cheight + MC.PAD - ch - 4, cy_full))
            preds_c.append(
                MC.chroma_block(plane_pad, MC.PAD, cx_full, cy_full, fx, fy, cw, ch)
            )
        self._chroma_residual(addr, mc_pred=preds_c)

        cbp = int(st.cbp[addr])
        # P_Skip detection: 16x16, ref0, mv == pskip predictor, no residual
        if cbp == 0:
            skip_mv = _pskip_mv(st, addr)
            if tuple(skip_mv) == tuple(mv):
                st.skip_flag[addr] = 1
                st.mb_type[addr] = M.PSKIP
                st.b8mode[addr] = 0
                st.mvd[0, y4 : y4 + 4, x4 : x4 + 4] = 0

    # ------------------------------------------------------------------
    # B slices (md_low-style decision over direct/L0/L1/BI/intra;
    # capability reference: lencod/src/md_low.c + mv-search.c bi-pred)
    # ------------------------------------------------------------------
    def _encode_b_mb(self, addr: int):
        st = self.st
        mx, my = self._mb_px(addr)
        orig = self.Y[my : my + 16, mx : mx + 16]
        lam = self.lambda_me
        # direct trial: derive spatial-direct motion into the state and
        # predict exactly like the decoder (per-4x4 MC, bi-average)
        _spatial_direct(st, addr, self.b_info)
        pred_dir = self._pred_from_state(addr)
        cost_dir = int(np.abs(orig - pred_dir[0]).sum())
        c0 = self._try_inter(addr, 0)
        c1 = self._try_inter(addr, 1)
        pred_bi = (c0[2] + c1[2] + 1) >> 1
        cost_bi = (
            int(np.abs(orig - pred_bi).sum())
            + c0[4]
            + c1[4]
            + ((lam * 3) >> 16)
        )
        intra = self._intra_cost(addr)
        cands = [
            (cost_dir, "DIR"),
            (c0[0] + ((lam * 2) >> 16), "L0"),
            (c1[0] + ((lam * 2) >> 16), "L1"),
            (cost_bi, "BI"),
            (intra[0] + ((lam * 24) >> 16), "INTRA"),
        ]
        best = min(cands, key=lambda t: t[0])[1]
        if best == "DIR":
            self._commit_direct(addr, pred_dir)
        elif best == "INTRA":
            self._reset_motion(addr)
            self._commit_intra(addr, intra)
        else:
            pdir = {"L0": M.PD_L0, "L1": M.PD_L1, "BI": M.PD_BI}[best]
            self._commit_b(addr, pdir, (c0[1], c1[1]), (c0[3], c1[3]))

    def _reset_motion(self, addr: int):
        st = self.st
        x4, y4 = st.mb_block_origin(addr)
        st.ref_idx[:, y4 : y4 + 4, x4 : x4 + 4] = -1
        st.mv[:, y4 : y4 + 4, x4 : x4 + 4] = 0
        st.ref_pic_id[:, y4 : y4 + 4, x4 : x4 + 4] = -(10**9)
        st.mvd[:, y4 : y4 + 4, x4 : x4 + 4] = 0

    def _pred_from_state(self, addr: int):
        """MC prediction from the committed motion state, mirroring the
        decoder's per-4x4 loop (decoder/recon.py _recon_inter) so the
        encoder reconstruction is bit-exact with any conformant decode."""
        st = self.st
        mx, my = self._mb_px(addr)
        x4, y4 = st.mb_block_origin(addr)
        width, height = self.sps.width, self.sps.height
        cw, chh = self.sps.mb_chroma_size
        cwidth, cheight = width >> 1, height >> 1
        pred_y = np.empty((16, 16), np.int32)
        pred_u = np.empty((chh, cw), np.int32)
        pred_v = np.empty((chh, cw), np.int32)
        for by in range(4):
            for bx in range(4):
                px, py = mx + bx * 4, my + by * 4
                ys, us, vs = [], [], []
                for lst in (0, 1):
                    ref = int(st.ref_idx[lst, y4 + by, x4 + bx])
                    if ref < 0 or self.refs[lst] is None:
                        continue
                    mvx = int(st.mv[lst, y4 + by, x4 + bx, 0])
                    mvy = int(st.mv[lst, y4 + by, x4 + bx, 1])
                    Ypad, Upad, Vpad = self.refs[lst][3][:3]
                    xi = px + (mvx >> 2)
                    yi = py + (mvy >> 2)
                    dx, dy = mvx & 3, mvy & 3
                    xi = max(-(MC.PAD - 8), min(width + MC.PAD - 12, xi))
                    yi = max(-(MC.PAD - 8), min(height + MC.PAD - 12, yi))
                    ys.append(MC.luma_block(Ypad, MC.PAD, xi, yi, dx, dy, 4, 4))
                    cx_full = (px >> 1) + (mvx >> 3)
                    cy_full = (py >> 1) + (mvy >> 3)
                    fx, fy = mvx & 7, mvy & 7
                    cx_full = max(-(MC.PAD - 4), min(cwidth + MC.PAD - 8, cx_full))
                    cy_full = max(-(MC.PAD - 4), min(cheight + MC.PAD - 8, cy_full))
                    us.append(
                        MC.chroma_block(Upad, MC.PAD, cx_full, cy_full, fx, fy, 2, 2)
                    )
                    vs.append(
                        MC.chroma_block(Vpad, MC.PAD, cx_full, cy_full, fx, fy, 2, 2)
                    )
                if len(ys) == 2:
                    yblk = (ys[0] + ys[1] + 1) >> 1
                    ublk = (us[0] + us[1] + 1) >> 1
                    vblk = (vs[0] + vs[1] + 1) >> 1
                else:
                    yblk, ublk, vblk = ys[0], us[0], vs[0]
                pred_y[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = yblk
                pred_u[by * 2 : by * 2 + 2, bx * 2 : bx * 2 + 2] = ublk
                pred_v[by * 2 : by * 2 + 2, bx * 2 : bx * 2 + 2] = vblk
        return pred_y, pred_u, pred_v

    def _luma_residual_recon(self, addr: int, pred, allow8x8=False) -> None:
        """Inter luma residual coding + exact reconstruction against
        `pred`; sets the luma cbp bits.  With allow8x8 and
        cfg.transform8x8, an RD-style 4x4-vs-8x8 transform-size decision
        is made per MB (lencod/src/transform8x8.c:258
        TransformDecision, re-done as a two-candidate SSD+rate compare);
        scaling matrices feed quant and dequant when configured."""
        st, pl = self.st, self.pl
        mx, my = self._mb_px(addr)
        qp = self.qp
        orig = self.Y[my : my + 16, mx : mx + 16]
        res = (orig - pred).astype(np.int64)
        w4 = None if self.p._ws4 is None else self.p._ws4[3]
        blk_rc = res.reshape(4, 4, 4, 4).swapaxes(1, 2)
        coefs = TR.forward4x4(blk_rc)
        lev4 = Q.quant4x4(coefs, qp, Q.default_offset4(qp, False), w4)
        rec4 = self._recon_luma4(pred, lev4, qp, w4)
        if self.stype != SliceType.I:
            # JM inter-luma coefficient thresholding (macroblock.c:1236
            # per-8x8, :1386 whole-MB): isolated small coefficients cost
            # more bits than their distortion gain
            cost4 = np.zeros((4, 4), np.int64)
            for br in range(4):
                for bc in range(4):
                    cost4[br, bc] = _coeff_cost_4x4(lev4[br, bc])
            c8 = cost4.reshape(2, 2, 2, 2).sum((1, 3))
            drop8 = c8 <= 4
            if np.where(drop8, 0, c8).sum() <= 5:
                drop8[:] = True
            if drop8.any():
                for qr in range(2):
                    for qc in range(2):
                        if drop8[qr, qc]:
                            lev4[2 * qr : 2 * qr + 2, 2 * qc : 2 * qc + 2] = 0
                rec4 = self._recon_luma4(pred, lev4, qp, w4)
        use8 = False
        if allow8x8 and self.p.cfg.transform8x8:
            w8 = None if self.p._ws8 is None else self.p._ws8[1]
            blk8 = res.reshape(2, 8, 2, 8).swapaxes(1, 2)
            lev8 = Q.quant8x8(
                TR.forward8x8(blk8), qp, Q.default_offset8(qp, False), w8)
            rec8 = self._recon_luma8(pred, lev8, qp, w8)
            lam = self.p.lambda_mode
            c4 = float(((orig - rec4) ** 2).sum()) + lam * _est_coef_bits(lev4)
            c8 = float(((orig - rec8) ** 2).sum()) + lam * _est_coef_bits(lev8)
            use8 = c8 < c4
        cbp = 0
        if use8:
            st.transform8x8[addr] = 1
            for b8 in range(4):
                qr, qc = b8 >> 1, b8 & 1
                if lev8[qr, qc].any():
                    st.luma8_levels[addr, b8] = lev8[qr, qc]
                    cbp |= 1 << b8
                    st.cbp_blk[addr] |= 51 << (4 * b8 - 2 * (b8 & 1))
            pl.Y[my : my + 16, mx : mx + 16] = rec8
        else:
            st.transform8x8[addr] = 0
            for br in range(4):
                for bc in range(4):
                    blk = int(M.XY_TO_BLK4[br, bc])
                    if lev4[br, bc].any():
                        st.luma_levels[addr, blk] = lev4[br, bc]
                        cbp |= 1 << (2 * (br // 2) + (bc // 2))
                        st.cbp_blk[addr] |= 1 << (4 * br + bc)
            pl.Y[my : my + 16, mx : mx + 16] = rec4
        st.cbp[addr] = cbp

    def _recon_luma4(self, pred, lev4, qp, w4):
        rec = np.empty((16, 16), np.int32)
        for br in range(4):
            for bc in range(4):
                if lev4[br, bc].any():
                    deq = Q.dequant4x4(lev4[br, bc], qp, w4).astype(np.int64)
                    rec[br * 4 : br * 4 + 4, bc * 4 : bc * 4 + 4] = (
                        _add_residual(
                            pred[br * 4 : br * 4 + 4, bc * 4 : bc * 4 + 4],
                            TR.inverse4x4(deq),
                        )
                    )
                else:
                    rec[br * 4 : br * 4 + 4, bc * 4 : bc * 4 + 4] = pred[
                        br * 4 : br * 4 + 4, bc * 4 : bc * 4 + 4
                    ].clip(0, 255)
        return rec

    def _recon_luma8(self, pred, lev8, qp, w8):
        rec = np.empty((16, 16), np.int32)
        for qr in range(2):
            for qc in range(2):
                po = pred[qr * 8 : qr * 8 + 8, qc * 8 : qc * 8 + 8]
                if lev8[qr, qc].any():
                    deq = Q.dequant8x8(lev8[qr, qc], qp, w8).astype(np.int64)
                    rec[qr * 8 : qr * 8 + 8, qc * 8 : qc * 8 + 8] = (
                        _add_residual(po, TR.inverse8x8(deq))
                    )
                else:
                    rec[qr * 8 : qr * 8 + 8, qc * 8 : qc * 8 + 8] = (
                        po.clip(0, 255)
                    )
        return rec

    def _commit_b(self, addr: int, pdir: int, mvs, pmvs):
        st = self.st
        x4, y4 = st.mb_block_origin(addr)
        st.mb_type[addr] = M.P16x16
        st.b8mode[addr] = 1
        st.b8pdir[addr] = pdir
        st.skip_flag[addr] = 0
        for lst in (0, 1):
            if pdir == lst or pdir == M.PD_BI:
                mv, p = mvs[lst], pmvs[lst]
                st.ref_idx[lst, y4 : y4 + 4, x4 : x4 + 4] = 0
                st.mv[lst, y4 : y4 + 4, x4 : x4 + 4] = mv
                st.ref_pic_id[lst, y4 : y4 + 4, x4 : x4 + 4] = self.refs[lst][0]
                st.mvd[lst, y4 : y4 + 4, x4 : x4 + 4] = (mv[0] - p[0], mv[1] - p[1])
            else:
                st.ref_idx[lst, y4 : y4 + 4, x4 : x4 + 4] = -1
                st.mv[lst, y4 : y4 + 4, x4 : x4 + 4] = 0
                st.ref_pic_id[lst, y4 : y4 + 4, x4 : x4 + 4] = -(10**9)
                st.mvd[lst, y4 : y4 + 4, x4 : x4 + 4] = 0
        pred_y, pred_u, pred_v = self._pred_from_state(addr)
        self._luma_residual_recon(addr, pred_y, allow8x8=True)
        self._chroma_residual(addr, mc_pred=(pred_u, pred_v))

    def _commit_direct(self, addr: int, pred):
        st = self.st
        x4, y4 = st.mb_block_origin(addr)
        pred_y, pred_u, pred_v = pred
        st.mb_type[addr] = M.BSKIP_DIRECT
        st.b8mode[addr] = M.B8_DIRECT
        st.b8pdir[addr] = M.PD_BI
        st.mvd[:, y4 : y4 + 4, x4 : x4 + 4] = 0
        self._luma_residual_recon(addr, pred_y)
        self._chroma_residual(addr, mc_pred=(pred_u, pred_v))
        if int(st.cbp[addr]) == 0:
            st.skip_flag[addr] = 1


_COEFF_COST_RUN = np.array(
    [3, 2, 2, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], np.int64)


def _coeff_cost_4x4(lev, first: int = 0) -> int:
    """JM coeff_cost of one 4x4 level block (lencod/src/block.c:899):
    |level| > 1 counts 9, |level| == 1 counts COEFF_COST4x4[run]."""
    cost = 0
    run = -1
    for k in range(first, 16):
        x, y = _ZZ4[k]
        run += 1
        v = int(lev[y, x])
        if v:
            cost += 9 if abs(v) > 1 else int(_COEFF_COST_RUN[run])
            run = -1
    return cost


def _est_coef_bits(lev) -> int:
    """Cheap coefficient-rate estimate for the transform-size decision:
    2*bitlength(|l|)+1 per nonzero (Exp-Golomb-shaped)."""
    a = np.abs(np.asarray(lev, np.int64)).ravel()
    nz = a[a > 0]
    if not nz.size:
        return 0
    return int((2 * np.floor(np.log2(nz)).astype(np.int64) + 3).sum())


def _mv_bits_vec(d):
    """Vectorized se(v) code length: 2*bitlength(k+1) - 1."""
    k = 2 * np.abs(d.astype(np.int64)) - (d > 0)
    bl = np.floor(np.log2(k + 1)).astype(np.int64) + 1
    return 2 * bl - 1
