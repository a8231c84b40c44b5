"""Device-mesh sharding for multi-chip encode (SURVEY.md §2.3).

Codec parallel axes (the reference's dependency structure defines what is
legal; the reference itself is serial C):
  - `frame`: data parallelism over frames/GOPs (ICI within host, DCN
    across hosts) — closed GOPs are fully independent.
  - `row`: tile-row parallelism within a frame (the codec analog of
    sequence parallelism) — ME/transform/recon shard by MB rows; the
    reference frame is all-gathered (halo = search range + filter taps;
    full gather is the simple correct form, ring-halo is the optimized
    follow-up).

`encode_step_sharded` builds a pjit-able whole-batch P-frame compute:
ME SAD grids + best-MV selection + residual transform/quant for every MB
of every frame, sharded (frame, row) over the mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import transforms as TR
from ..ops import quant as Q


def make_mesh(n_frames_axis: int, n_row_axis: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_frames_axis * n_row_axis
    import numpy as np

    grid = np.array(devices[: n_frames_axis * n_row_axis]).reshape(
        n_frames_axis, n_row_axis
    )
    return Mesh(grid, ("frame", "row"))


def _me_best_mv(cur, ref_pad, search_range):
    """Best integer MV per MB from a dense SAD reduce (device code)."""
    H, W = cur.shape
    R = search_range
    n_my, n_mx = H // 16, W // 16

    def one_dy(dy):
        strip = jax.lax.dynamic_slice(ref_pad, (dy, 0), (H, W + 2 * R))
        wins = jnp.stack([strip[:, dx : dx + W] for dx in range(2 * R + 1)])
        ad = jnp.abs(cur[None] - wins)
        return ad.reshape(2 * R + 1, n_my, 16, n_mx, 16).sum(axis=(2, 4))

    grids = jax.lax.map(one_dy, jnp.arange(2 * R + 1)).reshape(
        (2 * R + 1) ** 2, n_my, n_mx
    )
    best = jnp.argmin(grids, axis=0)
    bdy, bdx = best // (2 * R + 1), best % (2 * R + 1)
    return (bdx - R).astype(jnp.int32), (bdy - R).astype(jnp.int32), grids.min(axis=0)


def encode_step(cur_frames, ref_frames, qp: int, search_range: int = 8):
    """Batched P-frame compute core: (N, H, W) int32 frames.

    Returns dict of per-frame MB MVs, SAD, quantized residual levels, and
    reconstructed luma — everything downstream of this is host bit-packing.
    """
    R = search_range
    N, H, W = cur_frames.shape

    def per_frame(cur, ref):
        ref_pad = jnp.pad(ref, R, mode="edge")
        mvx, mvy, sad = _me_best_mv(cur, ref_pad, R)
        # full-pel MC prediction via gather
        n_my, n_mx = H // 16, W // 16
        ys = jnp.arange(H)
        xs = jnp.arange(W)
        mb_y = ys // 16
        mb_x = xs // 16
        off_y = mvy[mb_y][:, mb_x]
        off_x = mvx[mb_y][:, mb_x]
        src_y = jnp.clip(ys[:, None] + off_y, 0, H - 1)
        src_x = jnp.clip(xs[None, :] + off_x, 0, W - 1)
        pred = ref[src_y, src_x]
        res = cur - pred
        blocks = res.reshape(H // 4, 4, W // 4, 4).transpose(0, 2, 1, 3)
        coefs = TR.forward4x4(blocks.astype(jnp.int32))
        offset = jnp.int32(Q.default_offset4(qp, False))
        levels = Q.quant4x4(coefs, qp, offset)
        deq = Q.dequant4x4(levels, qp)
        rec_res = TR.inverse4x4(deq)
        pred_b = pred.reshape(H // 4, 4, W // 4, 4).transpose(0, 2, 1, 3)
        rec = ((rec_res + (pred_b << 6) + 32) >> 6).clip(0, 255)
        rec = rec.transpose(0, 2, 1, 3).reshape(H, W)
        return mvx, mvy, sad, levels, rec

    return jax.vmap(per_frame)(cur_frames, ref_frames)


def sharded_encode_step(mesh: Mesh, qp: int = 28, search_range: int = 8):
    """jit-compiled encode_step with (frame, row)-sharded inputs."""
    fspec = NamedSharding(mesh, P("frame", "row", None))

    @functools.partial(
        jax.jit,
        in_shardings=(fspec, fspec),
        out_shardings=None,
        static_argnums=(),
    )
    def step(cur, ref):
        return encode_step(cur, ref, qp, search_range)

    return step
