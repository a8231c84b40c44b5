"""MSB-first bit reader over an RBSP byte buffer.

Implements the H.264 descriptor set: u(n) fixed-length, ue(v)/se(v)
Exp-Golomb, te(v) truncated, and `more_rbsp_data()` (spec §7.2; the JM
equivalent is ldecod/src/vlc.c:506).  Pure Python on purpose — header
parsing is a few hundred bits per slice; the payload-scale bit handling
lives in the entropy backends.
"""

from __future__ import annotations


class BitReader:
    __slots__ = ("data", "n_bits", "pos")

    def __init__(self, data: bytes | bytearray | memoryview, pos: int = 0):
        self.data = bytes(data)
        self.n_bits = 8 * len(self.data)
        self.pos = pos  # absolute bit position

    # -- core -------------------------------------------------------------
    def u(self, n: int) -> int:
        """Read n bits MSB-first as an unsigned integer."""
        if n == 0:
            return 0
        pos = self.pos
        end = pos + n
        if end > self.n_bits:
            raise EOFError(f"bit read past end ({end} > {self.n_bits})")
        first_byte = pos >> 3
        last_byte = (end + 7) >> 3
        chunk = int.from_bytes(self.data[first_byte:last_byte], "big")
        shift = (last_byte << 3) - end
        self.pos = end
        return (chunk >> shift) & ((1 << n) - 1)

    def flag(self) -> bool:
        return bool(self.u(1))

    def ue(self) -> int:
        """Exp-Golomb unsigned (spec §9.1)."""
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("invalid exp-golomb code (>32 leading zeros)")
        if zeros == 0:
            return 0
        return (1 << zeros) - 1 + self.u(zeros)

    def se(self) -> int:
        """Exp-Golomb signed (spec §9.1.1): k -> (-1)^(k+1) * ceil(k/2)."""
        k = self.ue()
        return (k + 1) >> 1 if (k & 1) else -(k >> 1)

    def te(self, max_val: int) -> int:
        """Truncated Exp-Golomb (spec §9.1): 1-bit inverted when range is [0,1]."""
        if max_val == 1:
            return 1 - self.u(1)
        return self.ue()

    # -- position helpers -------------------------------------------------
    def byte_aligned(self) -> bool:
        return (self.pos & 7) == 0

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bits_left(self) -> int:
        return self.n_bits - self.pos

    def more_rbsp_data(self) -> bool:
        """True while payload bits remain before the rbsp_stop_one_bit.

        The RBSP ends with a '1' bit followed by zero bits to the end of the
        buffer; everything before that stop bit is payload (spec §7.4.1).
        """
        if self.pos >= self.n_bits:
            return False
        # find the last set bit in the buffer
        tail = self.n_bits
        data = self.data
        i = len(data) - 1
        while i >= 0 and data[i] == 0:
            i -= 1
        if i < 0:
            return False
        b = data[i]
        # index (from MSB) of lowest set bit in byte i
        low = 7 - ((b & -b).bit_length() - 1)
        stop_pos = (i << 3) + low
        return self.pos < stop_pos
