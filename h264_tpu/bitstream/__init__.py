from .reader import BitReader
from .writer import BitWriter
from .nal import (
    NalUnit,
    NalUnitType,
    ebsp_to_rbsp,
    rbsp_to_ebsp,
    iter_annexb_nalus,
    write_annexb,
    rbsp_trailing_bits,
)
