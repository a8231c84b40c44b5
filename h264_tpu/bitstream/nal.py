"""NAL unit layer: Annex-B framing, emulation-prevention escaping.

Spec §7.3.1/§7.4.1 + Annex B. Capability parity with the JM NAL layer
(ldecod/src/annexb.c:50 GetAnnexbNALU, ldecod/src/nal.c:92 EBSPtoRBSP;
lencod/src/nal.c:78 RBSPtoEBSP, lencod/src/annexb.c:34 WriteAnnexbNALU),
re-implemented as stateless byte-level transforms.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum
from typing import Iterator


class NalUnitType(IntEnum):
    UNSPECIFIED = 0
    SLICE = 1  # non-IDR slice
    DPA = 2
    DPB = 3
    DPC = 4
    IDR = 5
    SEI = 6
    SPS = 7
    PPS = 8
    AUD = 9
    EOSEQ = 10
    EOSTREAM = 11
    FILLER = 12


@dataclass
class NalUnit:
    nal_unit_type: int
    nal_ref_idc: int
    rbsp: bytes  # emulation-prevention removed
    forbidden_zero_bit: int = 0

    @property
    def is_idr(self) -> bool:
        return self.nal_unit_type == NalUnitType.IDR

    @property
    def is_slice(self) -> bool:
        return self.nal_unit_type in (
            NalUnitType.SLICE,
            NalUnitType.IDR,
            NalUnitType.DPA,
        )

    def header_byte(self) -> int:
        return (
            (self.forbidden_zero_bit << 7)
            | ((self.nal_ref_idc & 3) << 5)
            | (self.nal_unit_type & 0x1F)
        )


def ebsp_to_rbsp(ebsp: bytes) -> bytes:
    """Remove emulation_prevention_three_byte: 00 00 03 xx -> 00 00 xx."""
    if b"\x00\x00\x03" not in ebsp:
        return ebsp
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 0x03:
            zeros = 0
            i += 1
            continue  # drop the escape byte
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def rbsp_to_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte where 00 00 0[0-3] occurs."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 0x03:
            out.append(0x03)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def iter_annexb_nalus(stream: bytes) -> Iterator[NalUnit]:
    """Scan an Annex-B byte stream, yielding NAL units (RBSP form)."""
    n = len(stream)
    i = 0
    starts = []
    # collect start-code positions (payload offset after each)
    while True:
        j = stream.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        starts.append(j + 3)
        i = j + 3
    for k, payload_start in enumerate(starts):
        end = starts[k + 1] - 3 if k + 1 < len(starts) else n
        # trim the extra zero of a 4-byte start code belonging to the next NALU
        while end > payload_start and stream[end - 1] == 0:
            end -= 1
        ebsp = stream[payload_start:end]
        if not ebsp:
            continue
        hdr = ebsp[0]
        yield NalUnit(
            nal_unit_type=hdr & 0x1F,
            nal_ref_idc=(hdr >> 5) & 3,
            forbidden_zero_bit=hdr >> 7,
            rbsp=ebsp_to_rbsp(ebsp[1:]),
        )


def write_annexb(nalus: list[NalUnit]) -> bytes:
    """Serialize NAL units with Annex-B start codes.

    Long (4-byte) start codes before SPS/PPS and the first slice of an
    access unit; the JM writer uses long codes for every NALU, which is
    also legal — we match that for byte-identical muxing in A/B tests.
    """
    out = bytearray()
    for nalu in nalus:
        out += b"\x00\x00\x00\x01"
        out.append(nalu.header_byte())
        out += rbsp_to_ebsp(nalu.rbsp)
    return bytes(out)


def rbsp_trailing_bits(reader) -> None:
    """Consume rbsp_stop_one_bit + alignment zeros (for validation)."""
    stop = reader.u(1)
    if stop != 1:
        raise ValueError("rbsp_stop_one_bit != 1")
    reader.align()
