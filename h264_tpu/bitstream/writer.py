"""MSB-first bit writer producing RBSP payloads.

Encoder-side mirror of BitReader: u(n), ue(v)/se(v) Exp-Golomb, te(v),
trailing-bit termination.  (Capability parity with JM's writeUVLC2buffer,
lencod/src/vlc.c:597, re-designed as an accumulator-based writer.)
"""

from __future__ import annotations


class BitWriter:
    __slots__ = ("_buf", "_acc", "_nacc")

    def __init__(self):
        self._buf = bytearray()
        self._acc = 0  # bit accumulator, MSB-first semantics
        self._nacc = 0  # number of valid bits in accumulator

    def u(self, value: int, n: int) -> None:
        if n == 0:
            return
        if value < 0 or value >> n:
            raise ValueError(f"value {value} does not fit in {n} bits")
        self._acc = (self._acc << n) | value
        self._nacc += n
        while self._nacc >= 8:
            self._nacc -= 8
            self._buf.append((self._acc >> self._nacc) & 0xFF)
        self._acc &= (1 << self._nacc) - 1

    def flag(self, value) -> None:
        self.u(1 if value else 0, 1)

    def ue(self, value: int) -> None:
        if value < 0:
            raise ValueError("ue(v) requires non-negative value")
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, value: int) -> None:
        # spec §9.1.1 mapping: v>0 -> 2v-1, v<=0 -> -2v
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def te(self, value: int, max_val: int) -> None:
        if max_val == 1:
            self.u(1 - value, 1)
        else:
            self.ue(value)

    # -- termination ------------------------------------------------------
    @property
    def bit_pos(self) -> int:
        return 8 * len(self._buf) + self._nacc

    def byte_aligned(self) -> bool:
        return self._nacc == 0

    def rbsp_trailing_bits(self) -> None:
        """stop_one_bit + zero padding to a byte boundary (spec §7.3.2.11)."""
        self.u(1, 1)
        if self._nacc:
            self.u(0, 8 - self._nacc)

    def cabac_zero_pad(self) -> None:
        """Alignment used before CABAC slice data: ones to byte boundary
        (cabac_alignment_one_bit, spec §7.3.4)."""
        while self._nacc:
            self.u(1, 1)

    def raw_bits(self) -> tuple[bytes, int]:
        """(MSB-first bytes, bit count) of everything written so far,
        without terminating — for re-appending into another writer."""
        n = 8 * len(self._buf) + self._nacc
        if self._nacc:
            tail = (self._acc << (8 - self._nacc)) & 0xFF
            return bytes(self._buf) + bytes([tail]), n
        return bytes(self._buf), n

    def get_bytes(self) -> bytes:
        if self._nacc:
            raise ValueError("bitstream not byte-aligned; terminate first")
        return bytes(self._buf)

    def append_bytes(self, data: bytes) -> None:
        if self._nacc:
            raise ValueError("append_bytes requires byte alignment")
        self._buf.extend(data)

    def append_bits(self, data: bytes, nbits: int) -> None:
        """Append the first nbits of an MSB-first byte string."""
        if nbits == 0:
            return
        nbytes = (nbits + 7) // 8
        val = int.from_bytes(data[:nbytes], "big") >> (8 * nbytes - nbits)
        if self._nacc == 0:
            whole, rem = divmod(nbits, 8)
            if whole:
                self._buf.extend((val >> rem).to_bytes(whole, "big"))
            self._acc = val & ((1 << rem) - 1)
            self._nacc = rem
            return
        acc = (self._acc << nbits) | val
        nacc = self._nacc + nbits
        whole, rem = divmod(nacc, 8)
        if whole:
            self._buf.extend((acc >> rem).to_bytes(whole, "big"))
        self._acc = acc & ((1 << rem) - 1)
        self._nacc = rem
