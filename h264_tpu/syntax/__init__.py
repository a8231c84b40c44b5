from .parsets import SPS, PPS, parse_sps, parse_pps
from .slice_header import SliceHeader, SliceType, parse_slice_header
