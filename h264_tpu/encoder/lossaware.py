"""Loss-aware RDO: K simulated lossy decoders as a device batch dim.

The TPU-native reshaping of the reference's error-resilient mode
decision (lencod/src/md_highloss.c:39 encode_one_macroblock_highloss +
lencod/src/decoder.c: NumberOfDecoders simulated decoders,
UpdateDecoders:353, Build_Status_Map:444): instead of maintaining K full
decoder pixel states and re-decoding per MB candidate, we track each
simulated decoder's DRIFT (its reference minus the true reference) and
propagate it per frame with one vmapped device program:

    drift_k' = lost_k ? drift_k + (true_prev - true_cur)   (frame-copy
                                                            concealment)
             : intra MB ? 0
             : drift_k motion-compensated by the frame's integer MVs

The per-MB mean drift energy E_k||drift||^2 is the first-order expected
extra distortion of INTER prediction under loss; the RD pipeline adds it
to every inter candidate's J (intra candidates are immune), which is
precisely the distortion split rdopt.c:2139 averages out of its decoder
bank.  K and the slice loss rate mirror NumberOfDecoders / LossRateA
(bin/encoder.cfg:260).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("H", "W"))
def propagate_drift(drift, frame_delta, mv4, intra4, lost, H: int, W: int):
    """One frame step for all K simulated decoders.

    drift: (K, H, W) int32 — decoder reference minus true reference.
    frame_delta: (H, W) int32 — true_prev - true_cur reconstruction.
    mv4: (H4, W4, 2) int32 quarter-pel list-0 MVs; intra4: (H4, W4) bool.
    lost: (K,) bool — this frame's slice lost in decoder k.

    Returns (new_drift (K, H, W), pen_mb (n_mb,) int32): per-MB mean
    drift energy of the NEW state, the inter-candidate penalty for the
    next frame's mode decision."""
    K = drift.shape[0]
    n_my, n_mx = H // 16, W // 16
    # integer-MV gather indices per pixel (nearest-pel drift propagation)
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    mvx_p = jnp.repeat(jnp.repeat(mv4[..., 0], 4, 0), 4, 1)
    mvy_p = jnp.repeat(jnp.repeat(mv4[..., 1], 4, 0), 4, 1)
    gy = jnp.clip(ys[:, None] + ((mvy_p + 2) >> 2), 0, H - 1)
    gx = jnp.clip(xs[None, :] + ((mvx_p + 2) >> 2), 0, W - 1)
    intra_p = jnp.repeat(jnp.repeat(intra4, 4, 0), 4, 1)

    def step(d):
        moved = d[gy, gx]
        return jnp.where(intra_p, 0, moved)

    received = jax.vmap(step)(drift)
    new = jnp.where(lost[:, None, None], drift + frame_delta[None], received)
    e = (new * new).astype(jnp.float32)
    pen = (e.reshape(K, n_my, 16, n_mx, 16).sum((2, 4)).mean(0)
           .reshape(-1))
    return new, jnp.minimum(pen, 2.0 ** 30).astype(jnp.int32)


class LossSimulator:
    """Host-side driver of the simulated decoder bank (per encoder)."""

    def __init__(self, k: int, loss_rate: float, H: int, W: int,
                 seed: int = 17):
        self.k = k
        self.loss_rate = loss_rate
        self.H, self.W = H, W
        self.rng = np.random.RandomState(seed)
        self.drift = jnp.zeros((k, H, W), jnp.int32)
        self.pen = None  # (n_mb,) device penalty for the next frame
        self._prev_recon = None

    def reset(self):
        self.drift = jnp.zeros((self.k, self.H, self.W), jnp.int32)
        self.pen = None
        self._prev_recon = None

    def after_frame(self, recon_y, mv4, intra4):
        """Advance the decoder bank past a coded P frame.

        recon_y: (H, W) device int32 — the frame's true reconstruction;
        mv4/intra4: final per-4x4 motion/intra of the frame (device)."""
        lost = jnp.asarray(self.rng.rand(self.k) < self.loss_rate)
        if self._prev_recon is None:
            delta = jnp.zeros((self.H, self.W), jnp.int32)
        else:
            delta = self._prev_recon - recon_y
        self.drift, self.pen = propagate_drift(
            self.drift, delta, mv4, intra4, lost, H=self.H, W=self.W)
        self._prev_recon = recon_y
