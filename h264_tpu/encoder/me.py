"""TPU motion estimation: dense full-search SAD grids.

The TPU-native re-design of the reference's FastFullSearch
(lencod/src/me_fullfast.c:833 SetupFastFullPelSearch): compute the SAD of
*every* search position for *every* macroblock in one batched device
computation — a (positions, H, W) shifted-absolute-difference reduce that
XLA fuses and tiles; the serial mode decision then reads grid values and
adds MV-rate costs (no per-position device round trips).

The sub-pel refinement evaluates the 8 half + 8 quarter neighbors of the
best integer position against decoder-exact interpolation (ops/interp).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("search_range", "mb_size"))
def sad_grid_16x16(cur: jax.Array, ref_padded: jax.Array, search_range: int = 16,
                   mb_size: int = 16):
    """SAD of every MB vs every integer displacement.

    cur: (H, W) int32 current frame.
    ref_padded: (H + 2R, W + 2R) int32 reference, edge-padded by R.
    Returns (2R+1, 2R+1, H//16, W//16) int32 SADs; index [dy+R, dx+R]."""
    H, W = cur.shape
    R = search_range
    n_my, n_mx = H // mb_size, W // mb_size

    def one_dy(dy):
        strip = jax.lax.dynamic_slice(ref_padded, (dy, 0), (H, W + 2 * R))
        wins = jnp.stack([strip[:, dx : dx + W] for dx in range(2 * R + 1)])
        ad = jnp.abs(cur[None] - wins)
        return ad.reshape(2 * R + 1, n_my, mb_size, n_mx, mb_size).sum(
            axis=(2, 4)
        )

    return jax.lax.map(one_dy, jnp.arange(2 * R + 1))


def compute_sad_grids(cur_y: np.ndarray, ref_y: np.ndarray, search_range: int = 16):
    """Host wrapper: returns numpy (2R+1, 2R+1, nMBy, nMBx)."""
    R = search_range
    ref_p = np.pad(ref_y.astype(np.int32), R, mode="edge")
    out = sad_grid_16x16(
        jnp.asarray(cur_y, jnp.int32), jnp.asarray(ref_p, jnp.int32), R
    )
    return np.asarray(out)


# MV rate cost: JM's lambda-weighted exp-golomb length of the MV difference
# (lencod/src/mv-search.c mvbits table)
def mv_bits(d: int) -> int:
    """Length of se(v) code for d (mvd component in quarter-pel units)."""
    k = 2 * abs(d) - (1 if d > 0 else 0)  # ue code number
    return 2 * (k + 1).bit_length() - 1


def mv_cost(lambda_factor: int, dx: int, dy: int, px: int, py: int) -> int:
    """Weighted MV rate: (lambda * bits) >> 16 (JM MV_COST semantics)."""
    b = mv_bits(dx - px) + mv_bits(dy - py)
    return (lambda_factor >> 16) * b + (((lambda_factor & 0xFFFF) * b) >> 16)
