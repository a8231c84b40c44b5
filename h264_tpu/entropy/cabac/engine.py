"""CABAC arithmetic decoding engine (spec §9.3.3.2) and context state.

Implemented in the standard's renormalization form (codIRange/codIOffset,
bit-at-a-time renorm) rather than the reference's word-buffered variant
(ldecod/src/biaridecod.c:281) — the decoded symbol sequence is identical;
equivalence is covered by the bit-exact golden-stream decode tests.

Contexts are stored as two parallel bytearrays (state, mps) per group,
matching the JM grouping (mb_type, mv_res, map, ...) so syntax-element
readers index naturally.
"""

from __future__ import annotations

from .tables import INIT_I, INIT_P, RANGE_TAB_LPS, TRANS_IDX_LPS, TRANS_IDX_MPS

_RLPS = RANGE_TAB_LPS.tolist()
_TMPS = TRANS_IDX_MPS.tolist()
_TLPS = TRANS_IDX_LPS.tolist()


class CabacDecoder:
    """Arithmetic decoder over an RBSP byte buffer, starting byte-aligned."""

    __slots__ = ("data", "n_bits", "pos", "rng", "offset")

    def __init__(self, data: bytes, start_bit: int):
        assert start_bit % 8 == 0, "CABAC slice data starts byte-aligned"
        self.data = data
        self.n_bits = 8 * len(data)
        self.pos = start_bit
        self.rng = 510
        off = 0
        for _ in range(9):
            off = (off << 1) | self._bit()
        self.offset = off

    def _bit(self) -> int:
        p = self.pos
        self.pos = p + 1
        if p >= self.n_bits:
            # past-the-end bits read as 0 (can legally happen during the
            # final renorms of the last terminate)
            return 0
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def decision(self, group, idx: int) -> int:
        """Decode one regular bin with context `group[idx]`."""
        states, mps = group
        state = states[idx]
        rng = self.rng
        rlps = _RLPS[state][(rng >> 6) & 3]
        rng -= rlps
        if self.offset < rng:
            bit = mps[idx]
            states[idx] = _TMPS[state]
        else:
            self.offset -= rng
            rng = rlps
            bit = mps[idx] ^ 1
            if state == 0:
                mps[idx] ^= 1
            states[idx] = _TLPS[state]
        while rng < 256:
            rng <<= 1
            self.offset = (self.offset << 1) | self._bit()
        self.rng = rng
        return bit

    def bypass(self) -> int:
        self.offset = (self.offset << 1) | self._bit()
        if self.offset >= self.rng:
            self.offset -= self.rng
            return 1
        return 0

    def bypass_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bypass()
        return v

    def terminate(self) -> int:
        """end_of_slice_flag / IPCM escape (spec §9.3.3.2.2.2)."""
        self.rng -= 2
        if self.offset >= self.rng:
            return 1
        while self.rng < 256:
            self.rng <<= 1
            self.offset = (self.offset << 1) | self._bit()
        return 0

    def unary(self, group, idx0: int, idx_rest: int, max_bins: int | None = None) -> int:
        """Unary binarization: ctx idx0 for first bin, idx_rest after."""
        if not self.decision(group, idx0):
            return 0
        k = 1
        while self.decision(group, idx_rest):
            k += 1
            if max_bins is not None and k >= max_bins:
                break
        return k

    def ueg_suffix(self, value: int, k: int, threshold: int) -> int:
        """UEGk suffix (spec §9.3.2.3) once the unary prefix hit `threshold`."""
        if value < threshold:
            return value
        # exp-golomb-like escape, bypass coded
        while self.bypass():
            value += 1 << k
            k += 1
        while k:
            k -= 1
            value += self.bypass() << k
        return value

    def bytes_consumed(self, start_bit: int) -> int:
        return (self.pos - start_bit + 7) // 8


# ---------------------------------------------------------------------------
# context sets
# ---------------------------------------------------------------------------

_GROUP_SHAPES = {
    # group -> (rows, cols); rows flattened into one bytearray row-major
    "MB_TYPE": (3, 11),
    "B8_TYPE": (2, 9),
    "MV_RES": (2, 10),
    "REF_NO": (2, 6),
    "DELTA_QP": (1, 4),
    "MB_AFF": (1, 4),
    "TRANSFORM_SIZE": (1, 3),
    "IPR": (1, 2),
    "CIPR": (1, 4),
    "CBP": (3, 4),
    "BCBP": (22, 4),
    "MAP": (22, 15),
    "LAST": (22, 15),
    "ONE": (22, 5),
    "ABS": (22, 5),
    "FLD_MAP": (8, 15),
    "FLD_LAST": (8, 15),
}


_GROUP_BASES = {}
_TOTAL_CTX = 0
for _name, (_rows, _cols) in _GROUP_SHAPES.items():
    _GROUP_BASES[_name] = _TOTAL_CTX
    _TOTAL_CTX += _rows * _cols


import functools


@functools.lru_cache(maxsize=256)
def _ctx_init(slice_is_intra: bool, model: int, qp: int):
    """Initialized (states, mps) byte images for one (slice class,
    model, qp) — a pure function of its arguments, so slices reuse the
    cached image instead of re-deriving ~1k contexts (spec §9.3.1.1)."""
    init = INIT_I if slice_is_intra else INIT_P
    states = bytearray(_TOTAL_CTX)
    mps = bytearray(_TOTAL_CTX)
    for name, (rows, cols) in _GROUP_SHAPES.items():
        tab = init[name][model]
        base = _GROUP_BASES[name]
        for r in range(rows):
            for c in range(cols):
                m, n = int(tab[r][c][0]), int(tab[r][c][1])
                pstate = ((m * max(0, qp)) >> 4) + n
                pstate = max(1, min(126, pstate))
                if pstate >= 64:
                    states[base + r * cols + c] = pstate - 64
                    mps[base + r * cols + c] = 1
                else:
                    states[base + r * cols + c] = 63 - pstate
                    mps[base + r * cols + c] = 0
    return bytes(states), bytes(mps)


_NCOLS = {name: cols for name, (rows, cols) in _GROUP_SHAPES.items()}


class ContextSet:
    """All CABAC contexts of one slice, initialized per spec §9.3.1.1.

    Storage is one flat (states, mps) bytearray pair covering every group
    (layout: _GROUP_BASES offsets) so native/batched consumers can take
    the whole context state in one buffer; `group(name, row)` returns
    (states, mps, base_index) into the flat arrays.
    """

    __slots__ = ("states", "mps", "ncols")

    def __init__(self, slice_is_intra: bool, model: int, qp: int):
        st, mp = _ctx_init(bool(slice_is_intra),
                           0 if slice_is_intra else int(model), int(qp))
        self.states = bytearray(st)
        self.mps = bytearray(mp)
        self.ncols = _NCOLS

    def group(self, name: str, row: int = 0):
        """(states, mps, base_index) triple for a sub-group row."""
        return self.states, self.mps, _GROUP_BASES[name] + row * self.ncols[name]
