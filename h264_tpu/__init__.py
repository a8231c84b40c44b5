"""h264_tpu — a TPU-native H.264/AVC encode/decode engine.

Built from scratch in JAX/XLA/Pallas with the capability surface of the JM
reference software (see SURVEY.md). The compute path (transforms, prediction,
motion estimation, deblocking) runs as batched device kernels; the serial
shell (NAL mux, entropy bit-packing, DPB bookkeeping, rate control) runs on
host, with native C++ for the hot serial loops.

Layering (bottom-up, mirroring SURVEY.md §1):
  bitstream/   NAL units, Annex-B / RTP framing, RBSP escaping, bit I/O
  syntax/      SPS/PPS/slice-header/SEI syntax (parse + write)
  entropy/     CAVLC and CABAC backends (decode + encode)
  ops/         exact-integer pixel kernels (JAX/Pallas): transforms, quant,
               intra prediction, qpel interpolation, deblocking, SAD/SATD
  decoder/     slice/picture decode, DPB, error concealment
  encoder/     motion estimation, mode decision, rate control, GOP control
  parallel/    device-mesh sharding (frames/tile-rows over chips, GOPs over
               hosts)
"""

__version__ = "0.1.0"
