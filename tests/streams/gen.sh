#!/bin/sh
# Regenerates the conformance streams in this directory with the JM
# reference encoder (build per .claude/skills/verify; run from /tmp/jm/bin).
# Inputs foreman12.yuv / fade8.yuv are derived from
# /root/reference/bin/foreman_part_qcif.yuv (ping-pong repeat; linear fade)
# by the python snippets below.
#
# python: frames 0,1,2,1,0,1,2,1,0,1,2,1 -> foreman12.yuv
# python: frames 0,1,2,1,0,1,2,1 scaled by (1 - 0.09*k) -> fade8.yuv
set -e
DIR=$(cd "$(dirname "$0")" && pwd)
cd /tmp/jm/bin
gen() {
  name=$1; shift
  args=""
  for a in "$@"; do args="$args -p $a"; done
  ./lencod.exe -d encoder_main.cfg -p InputFile=$DIR/foreman12.yuv \
    -p FrameSkip=0 -p OutputFile=$DIR/$name.264 \
    -p ReconFile=$DIR/$name.rec.yuv $args > $DIR/$name.log 2>&1 || true
}
genf() {
  name=$1; shift
  args=""
  for a in "$@"; do args="$args -p $a"; done
  ./lencod.exe -d encoder_main.cfg -p InputFile=$DIR/fade8.yuv \
    -p FrameSkip=0 -p OutputFile=$DIR/$name.264 \
    -p ReconFile=$DIR/$name.rec.yuv $args > $DIR/$name.log 2>&1 || true
}
gen wp_p FramesToBeEncoded=6 WeightedPrediction=1 NumberBFrames=0
gen wp_b_expl FramesToBeEncoded=4 WeightedBiprediction=1 NumberBFrames=2 FrameSkip=2
gen wp_b_impl FramesToBeEncoded=4 WeightedBiprediction=2 NumberBFrames=2 FrameSkip=2
gen tdirect FramesToBeEncoded=4 DirectModeType=0 NumberBFrames=2 FrameSkip=2
gen poc1 FramesToBeEncoded=4 PicOrderCntType=1 NumberBFrames=2 FrameSkip=2
gen multiref FramesToBeEncoded=8 NumberReferenceFrames=4 NumberBFrames=0 PList0References=4
gen bref FramesToBeEncoded=4 NumberBFrames=2 FrameSkip=2 BReferencePictures=1
genf wpfade_p FramesToBeEncoded=6 WeightedPrediction=1 NumberBFrames=0
genf wpfade_b FramesToBeEncoded=4 WeightedBiprediction=1 NumberBFrames=2 FrameSkip=2
genf wpfade_bimpl FramesToBeEncoded=4 WeightedBiprediction=2 NumberBFrames=2 FrameSkip=2

# FRExt scaling-matrix streams (High profile, encoder.cfg defaults +
# q_matrix.cfg; SPS- and PPS-signaled variants). ldecod output ==
# encoder recon, saved as .rec.yuv.
./lencod.exe -d encoder.cfg -p ScalingMatrixPresentFlag=1 \
  -p FramesToBeEncoded=5 -p OutputFile=$DIR/qmat_sps.264 \
  -p ReconFile=$DIR/qmat_sps.rec.yuv > $DIR/qmat_sps.log 2>&1 || true
./lencod.exe -d encoder.cfg -p ScalingMatrixPresentFlag=2 \
  -p FramesToBeEncoded=5 -p OutputFile=$DIR/qmat_pps.264 \
  -p ReconFile=$DIR/qmat_pps.rec.yuv > $DIR/qmat_pps.log 2>&1 || true

# CAVLC High-profile features: 8x8 transform + I8x8 (SymbolMode=0 on
# encoder.cfg), and IPCM macroblocks in both entropy modes (random-noise
# input at QP 8 makes PCM the cheapest RD mode; EnableIPCM=1).
# noise_qcif.yuv: 2 frames of numpy default_rng(7) uint8 noise.
./lencod.exe -d encoder.cfg -p SymbolMode=0 -p FramesToBeEncoded=5 \
  -p OutputFile=$DIR/cavlc_t8.264 -p ReconFile=$DIR/cavlc_t8.rec.yuv \
  > $DIR/cavlc_t8.log 2>&1 || true
./lencod.exe -d encoder.cfg -p InputFile=noise_qcif.yuv -p SymbolMode=0 \
  -p EnableIPCM=1 -p QPISlice=8 -p QPPSlice=8 -p QPBSlice=8 \
  -p FramesToBeEncoded=2 -p OutputFile=$DIR/cavlc_ipcm.264 \
  -p ReconFile=$DIR/cavlc_ipcm.rec.yuv > $DIR/cavlc_ipcm.log 2>&1 || true
./lencod.exe -d encoder.cfg -p InputFile=noise_qcif.yuv \
  -p EnableIPCM=1 -p QPISlice=8 -p QPPSlice=8 -p QPBSlice=8 \
  -p FramesToBeEncoded=2 -p OutputFile=$DIR/cabac_ipcm.264 \
  -p ReconFile=$DIR/cabac_ipcm.rec.yuv > $DIR/cabac_ipcm.log 2>&1 || true

# Field-coded (PicAFF) stream: CIF, I + P fields, CABAC (decode gate for
# interlace support; tools/benchseq world as input)
$LENCOD -d encoder_main.cfg -p InputFile=$BENCHSEQ_YUV -p SourceWidth=352 \
  -p SourceHeight=288 -p FramesToBeEncoded=8 -p FrameSkip=0 \
  -p NumberBFrames=0 -p PicInterlace=1 -p ReferenceReorder=0 \
  -p PocMemoryManagement=0 -p QPISlice=28 -p QPPSlice=28 \
  -p OutputFile=$OUT/field.264 -p ReconFile=$OUT/field.rec.yuv \
  -p NumberReferenceFrames=2
