"""Device RD mode-decision pipeline (encoder/rd.py).

Gates: (a) streams from the RD fast path decode bit-exactly through OUR
decoder against the encoder's own reconstruction (the JM self-check,
SURVEY.md §4.2 analog); (b) through the reference ldecod when built;
(c) the RD path uses the new coding tools (partitions / skip / intra-in-P)
and beats the legacy P16x16 path in rate at equal QP.
"""

import numpy as np
import pytest

from h264_tpu.bitstream import write_annexb
from h264_tpu.decoder import mbtables as M
from h264_tpu.decoder.decoder import decode_annexb
from h264_tpu.encoder.encoder import EncoderConfig, H264Encoder

from jmref import have_ldecod, jm_decode, pack_yuv420

W, H = 176, 144


def _foreman(n):
    raw = open("/root/reference/bin/foreman_part_qcif.yuv", "rb").read()
    fsz = W * H * 3 // 2
    out = []
    for i in range(n):
        f = raw[(i % 3) * fsz : ((i % 3) + 1) * fsz]
        Y = np.frombuffer(f[: W * H], np.uint8).reshape(H, W)
        U = np.frombuffer(f[W * H : W * H * 5 // 4], np.uint8).reshape(
            H // 2, W // 2
        )
        V = np.frombuffer(f[W * H * 5 // 4 :], np.uint8).reshape(
            H // 2, W // 2
        )
        out.append((Y, U, V))
    return out


def _encode_collect(cfg, frames):
    enc = H264Encoder(cfg)
    nalus = enc.headers()
    recs = []
    states = []
    for k, yuv in enumerate(frames):
        nalus.extend(enc.encode_frame(yuv, is_idr=(k == 0)))
        pl = enc.recon_pics[-1][1]
        recs.append(
            (np.asarray(pl.Y).astype(np.uint8),
             np.asarray(pl.U).astype(np.uint8),
             np.asarray(pl.V).astype(np.uint8))
        )
        states.append(enc.recon_pics[-1][2])
    return write_annexb(nalus), recs, states


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
@pytest.mark.parametrize("nref", [1, 2])
def test_rd_self_roundtrip(entropy, nref):
    frames = _foreman(4)
    stream, recs, _ = _encode_collect(
        EncoderConfig(width=W, height=H, qp=28, fast=True, rd=True,
                      num_ref_frames=nref, search_range=16,
                      entropy=entropy),
        frames,
    )
    pics = decode_annexb(stream)
    assert len(pics) == len(frames)
    for i, p in enumerate(pics):
        for name, a, b in (("Y", p.planes.Y, recs[i][0]),
                           ("U", p.planes.U, recs[i][1]),
                           ("V", p.planes.V, recs[i][2])):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (
                f"frame {i} plane {name}: decode != encoder recon"
            )


def test_rd_uses_partitions_and_improves_rate():
    frames = _foreman(4)
    stream_rd, _, states = _encode_collect(
        EncoderConfig(width=W, height=H, qp=28, fast=True, rd=True,
                      num_ref_frames=1, search_range=16),
        frames,
    )
    stream_legacy, _, _ = _encode_collect(
        EncoderConfig(width=W, height=H, qp=28, fast=True, rd=False,
                      num_ref_frames=1, search_range=16),
        frames,
    )
    types = np.concatenate([st.mb_type for st in states[1:]])
    skips = np.concatenate([st.skip_flag for st in states[1:]])
    used = set(types.tolist())
    # the decision layer must actually exercise the partition/skip space
    assert skips.any(), "no P_Skip MBs chosen"
    assert used & {M.P16x8, M.P8x16, M.P8x8}, f"only modes {used}"
    assert len(stream_rd) < len(stream_legacy), (
        len(stream_rd), len(stream_legacy)
    )


@pytest.mark.skipif(not have_ldecod(),
                    reason="reference ldecod not built (/tmp/jm/bin)")
def test_rd_jm_roundtrip_multiref():
    frames = _foreman(5)
    stream, recs, _ = _encode_collect(
        EncoderConfig(width=W, height=H, qp=28, fast=True, rd=True,
                      num_ref_frames=3, search_range=16, entropy="cabac"),
        frames,
    )
    got = jm_decode(stream)
    want = pack_yuv420([(r[0], r[1], r[2]) for r in recs])
    assert got == want, "ldecod output != encoder recon (rd multi-ref)"


@pytest.mark.parametrize("nref", [1])
def test_rd_b_self_roundtrip(nref):
    """Device B pipeline (temporal direct): our decode == encoder recon."""
    frames = _foreman(5)
    enc = H264Encoder(
        EncoderConfig(width=W, height=H, qp=28, fast=True, rd=True,
                      b_frames=1, num_ref_frames=nref, search_range=16,
                      entropy="cabac"))
    nalus = enc.headers()
    recs = {}
    for out in enc.encode_stream(frames):
        nalus.extend(out)
        for poc, pl in enc.all_recons:
            recs.setdefault(poc, pl)
        for e in enc.recon_pics:
            recs.setdefault(e[0], e[1])
    stream = write_annexb(nalus)
    pics = decode_annexb(stream)
    assert len(pics) == len(frames)
    assert [p.poc for p in pics] == sorted(recs)
    n_b = 0
    for p in pics:
        r = recs[p.poc]
        if p.slice_type.name == "B":
            n_b += 1
        for name, a, b in (("Y", p.planes.Y, r.Y), ("U", p.planes.U, r.U),
                           ("V", p.planes.V, r.V)):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (
                f"poc {p.poc} plane {name}: decode != encoder recon"
            )
    assert n_b >= 2


def test_rows_sharded_bitexact():
    """Tile-row sharded step == single-device row pipeline, bit-exact."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from h264_tpu.encoder import rd as RD

    devs = jax.devices()
    assert len(devs) >= 4, "conftest provides an 8-device CPU mesh"
    mesh = Mesh(np.array(devs[:4], dtype=object).reshape(2, 2),
                ("frame", "row"))
    Hh, Ww, NR, G, F = 64, 64, 1, 2, 2
    lam = int(0.85 * 2.0 ** ((28 - 12) / 3.0) * 65536)
    rng = np.random.default_rng(7)
    cy = jnp.asarray(rng.integers(0, 256, (F, Hh, Ww)), jnp.uint8)
    cu = jnp.asarray(rng.integers(0, 256, (F, Hh // 2, Ww // 2)), jnp.uint8)
    cv = jnp.asarray(rng.integers(0, 256, (F, Hh // 2, Ww // 2)), jnp.uint8)
    banks, cpads = [], []
    for f in range(F):
        bank, cpad = RD.ref_entry_from_planes(
            jnp.asarray(rng.integers(0, 256, (Hh, Ww)), jnp.int32),
            jnp.asarray(rng.integers(0, 256, (Hh // 2, Ww // 2)), jnp.int32),
            jnp.asarray(rng.integers(0, 256, (Hh // 2, Ww // 2)), jnp.int32))
        banks.append(jnp.stack([bank] * NR))
        cpads.append(jnp.stack([cpad] * NR))
    banks = jnp.stack(banks)
    cpads = jnp.stack(cpads)

    # single-device reference
    ref_outs = []
    for f in range(F):
        ho, rec, _ = RD.rd_p_rows_pipeline(
            cy[f], cu[f], cv[f], banks[f], cpads[f], H=Hh, W=Ww, R=8,
            qp=28, qp_c=26, lam=lam, lam_me=lam, G=G)
        ref_outs.append((np.asarray(ho), np.asarray(rec[0])))

    Hg = Hh // G
    fspec = NamedSharding(mesh, P("frame", "row"))
    rspec = NamedSharding(mesh, P("frame"))
    cyg = jax.device_put(cy.reshape(F, G, Hg, Ww), fspec)
    cug = jax.device_put(cu.reshape(F, G, Hg // 2, Ww // 2), fspec)
    cvg = jax.device_put(cv.reshape(F, G, Hg // 2, Ww // 2), fspec)
    banks_s = jax.device_put(banks, rspec)
    cpads_s = jax.device_put(cpads, rspec)
    step = RD.rd_p_rows_sharded(mesh, H=Hh, W=Ww, R=8, qp=28, qp_c=26,
                                lam=lam, G=G)
    host_outs, recons = step(cyg, cug, cvg, banks_s, cpads_s)
    host_outs = np.asarray(host_outs)
    rec_y = np.asarray(recons[0]).reshape(F, Hh, Ww)
    for f in range(F):
        assert np.array_equal(host_outs[f], ref_outs[f][0]), "host buffers"
        assert np.array_equal(rec_y[f], ref_outs[f][1]), "recon planes"


def test_rd_i4_intra_in_p():
    """Scene-change P frames must engage the I4x4 intra decision in the
    device commit scan (rdopt.c:597 Mode_Decision_for_4x4IntraBlocks
    analog) and stay bit-exact through our decoder and ldecod."""
    rng = np.random.RandomState(3)
    W, H = 176, 144
    f0 = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.uint8)
    base = rng.randint(0, 255, (H, W)).astype(np.float32)
    f1 = ((base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3).astype(
        np.uint8)
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 130, np.uint8)
    frames = [(f0, u, v), (f1, u, v)]
    enc = H264Encoder(EncoderConfig(
        width=W, height=H, qp=30, fast=True, entropy="cabac",
        num_ref_frames=1, search_range=8))
    stream = enc.encode_sequence(frames)
    recs = {}
    for poc, pl in enc.all_recons:
        recs.setdefault(poc, pl)
    ours = b"".join(
        np.asarray(p).astype(np.uint8).tobytes()
        for poc in sorted(recs)
        for p in (recs[poc].Y, recs[poc].U, recs[poc].V))
    pics = decode_annexb(stream)
    assert b"".join(p.to_yuv_bytes() for p in pics) == ours
    pst = max(pics, key=lambda p: p.poc).state
    assert int((pst.mb_type == 9).sum()) > 0, "no I4 MBs chosen"
    if have_ldecod():
        assert jm_decode(stream) == ours


def test_rd_b_hierarchy_roundtrip():
    """2-layer B pyramid (stored mid-B, lencod/src/explicit_gop.c:32
    create_hierarchy analog): decode order A B_ref b b, bit-exact through
    our decoder and ldecod."""
    frames = _foreman(13)  # 13 sources -> 3 full pyramid segments
    enc = H264Encoder(EncoderConfig(
        width=176, height=144, qp=30, fast=True, b_frames=3,
        b_hierarchy=True, entropy="cabac", num_ref_frames=2,
        search_range=8))
    stream = enc.encode_sequence(frames[:13])
    recs = {}
    for poc, pl in enc.all_recons:
        recs.setdefault(poc, pl)
    assert len(recs) == 13
    ours = b"".join(
        np.asarray(p).astype(np.uint8).tobytes()
        for poc in sorted(recs)
        for p in (recs[poc].Y, recs[poc].U, recs[poc].V))
    pics = decode_annexb(stream)
    assert b"".join(p.to_yuv_bytes() for p in pics) == ours
    # the mid-B really is a stored reference
    from h264_tpu.bitstream.nal import iter_annexb_nalus
    ref_b = sum(1 for n in iter_annexb_nalus(stream)
                if n.nal_unit_type == 1 and n.nal_ref_idc > 0)
    assert ref_b >= 3, "stored B pictures missing"
    if have_ldecod():
        assert jm_decode(stream) == ours


def test_rd_intra_refresh():
    """Forced intra refresh (intrarefresh.c:97 RandomIntra analog):
    every P frame codes the scheduled number of intra MBs, without
    repetition across frames until full coverage; stream stays
    bit-exact through our decoder."""
    frames = _foreman(5)
    enc = H264Encoder(EncoderConfig(
        width=176, height=144, qp=30, fast=True, entropy="cabac",
        num_ref_frames=1, search_range=8, intra_refresh=25))
    stream = enc.encode_sequence(frames)
    recs = {}
    for poc, pl in enc.all_recons:
        recs.setdefault(poc, pl)
    ours = b"".join(
        np.asarray(p).astype(np.uint8).tobytes()
        for poc in sorted(recs)
        for p in (recs[poc].Y, recs[poc].U, recs[poc].V))
    pics = decode_annexb(stream)
    assert b"".join(p.to_yuv_bytes() for p in pics) == ours
    refreshed = set()
    for p in sorted(pics, key=lambda q: q.poc)[1:]:
        intra = np.nonzero(np.asarray(p.state.is_intra))[0]
        assert len(intra) >= 25
        refreshed.update(int(a) for a in intra)
    assert len(refreshed) >= min(99, 4 * 25)  # no repetition while uncovered
