"""Transform/quant kernel tests.

The oracle here is an independent scalar transcription of the spec
butterflies (§8.5) written in plain Python loops; the batched numpy and
jitted JAX paths must match it element-exactly on random int32 blocks.
"""

import numpy as np
import pytest

from h264_tpu.ops import quant, transforms
from h264_tpu.ops.exact import rshift_rnd_sf

rng = np.random.default_rng(1234)


# ---- scalar oracles -------------------------------------------------------

def fwd4_scalar(b):
    out = np.zeros((4, 4), np.int64)
    tmp = np.zeros((4, 4), np.int64)
    for j in range(4):
        p = b[j]
        t0, t1, t2, t3 = p[0] + p[3], p[1] + p[2], p[1] - p[2], p[0] - p[3]
        tmp[j] = [t0 + t1, 2 * t3 + t2, t0 - t1, t3 - 2 * t2]
    for i in range(4):
        p = tmp[:, i]
        t0, t1, t2, t3 = p[0] + p[3], p[1] + p[2], p[1] - p[2], p[0] - p[3]
        out[:, i] = [t0 + t1, 2 * t3 + t2, t0 - t1, t3 - 2 * t2]
    return out


def inv4_scalar(c):
    tmp = np.zeros((4, 4), np.int64)
    out = np.zeros((4, 4), np.int64)
    for j in range(4):
        w = c[j]
        e0, e1 = w[0] + w[2], w[0] - w[2]
        e2, e3 = (w[1] >> 1) - w[3], w[1] + (w[3] >> 1)
        tmp[j] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    for i in range(4):
        w = tmp[:, i]
        e0, e1 = w[0] + w[2], w[0] - w[2]
        e2, e3 = (w[1] >> 1) - w[3], w[1] + (w[3] >> 1)
        out[:, i] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    return out


def fwd8_1d_scalar(p):
    s = [p[0] + p[7], p[1] + p[6], p[2] + p[5], p[3] + p[4]]
    d = [p[0] - p[7], p[1] - p[6], p[2] - p[5], p[3] - p[4]]
    b0, b1, b2, b3 = s[0] + s[3], s[1] + s[2], s[0] - s[3], s[1] - s[2]
    b4 = d[1] + d[2] + ((d[0] >> 1) + d[0])
    b5 = d[0] - d[3] - ((d[2] >> 1) + d[2])
    b6 = d[0] + d[3] - ((d[1] >> 1) + d[1])
    b7 = d[1] - d[2] + ((d[3] >> 1) + d[3])
    return [
        b0 + b1, b4 + (b7 >> 2), b2 + (b3 >> 1), b5 + (b6 >> 2),
        b0 - b1, b6 - (b5 >> 2), (b2 >> 1) - b3, (b4 >> 2) - b7,
    ]


def inv8_1d_scalar(p):
    a0, a4 = p[0] + p[4], p[0] - p[4]
    a2, a6 = (p[2] >> 1) - p[6], p[2] + (p[6] >> 1)
    b0, b2, b4, b6 = a0 + a6, a4 + a2, a4 - a2, a0 - a6
    a1 = -p[3] + p[5] - p[7] - (p[7] >> 1)
    a3 = p[1] + p[7] - p[3] - (p[3] >> 1)
    a5 = -p[1] + p[7] + p[5] + (p[5] >> 1)
    a7 = p[3] + p[5] + p[1] + (p[1] >> 1)
    b1, b7 = a1 + (a7 >> 2), a7 - (a1 >> 2)
    b3, b5 = a3 + (a5 >> 2), (a3 >> 2) - a5
    return [b0 + b7, b2 + b5, b4 + b3, b6 + b1, b6 - b1, b4 - b3, b2 - b5, b0 - b7]


def fwd8_scalar(b):
    tmp = np.array([fwd8_1d_scalar(list(b[j])) for j in range(8)], np.int64)
    return np.array([fwd8_1d_scalar(list(tmp[:, i])) for i in range(8)], np.int64).T


def inv8_scalar(c):
    tmp = np.array([inv8_1d_scalar(list(c[j])) for j in range(8)], np.int64)
    return np.array([inv8_1d_scalar(list(tmp[:, i])) for i in range(8)], np.int64).T


# ---- vectorized numpy vs scalar ------------------------------------------

def test_forward4x4_matches_scalar():
    blocks = rng.integers(-512, 512, (64, 4, 4)).astype(np.int32)
    out = transforms.forward4x4(blocks)
    for k in range(64):
        np.testing.assert_array_equal(out[k], fwd4_scalar(blocks[k].astype(np.int64)))


def test_inverse4x4_matches_scalar():
    blocks = rng.integers(-20000, 20000, (64, 4, 4)).astype(np.int32)
    out = transforms.inverse4x4(blocks)
    for k in range(64):
        np.testing.assert_array_equal(out[k], inv4_scalar(blocks[k].astype(np.int64)))


def test_forward8x8_matches_scalar():
    blocks = rng.integers(-512, 512, (16, 8, 8)).astype(np.int32)
    out = transforms.forward8x8(blocks)
    for k in range(16):
        np.testing.assert_array_equal(out[k], fwd8_scalar(blocks[k].astype(np.int64)))


def test_inverse8x8_matches_scalar():
    blocks = rng.integers(-20000, 20000, (16, 8, 8)).astype(np.int32)
    out = transforms.inverse8x8(blocks)
    for k in range(16):
        np.testing.assert_array_equal(out[k], inv8_scalar(blocks[k].astype(np.int64)))


# ---- jax path equals numpy path ------------------------------------------

def test_jax_matches_numpy():
    import jax
    import jax.numpy as jnp

    blocks = rng.integers(-512, 512, (32, 4, 4)).astype(np.int32)
    jout = jax.jit(transforms.forward4x4)(jnp.asarray(blocks))
    np.testing.assert_array_equal(np.asarray(jout), transforms.forward4x4(blocks))

    b8 = rng.integers(-512, 512, (8, 8, 8)).astype(np.int32)
    jout8 = jax.jit(transforms.forward8x8)(jnp.asarray(b8))
    np.testing.assert_array_equal(np.asarray(jout8), transforms.forward8x8(b8))
    i8 = jax.jit(transforms.inverse8x8)(jnp.asarray(b8))
    np.testing.assert_array_equal(np.asarray(i8), transforms.inverse8x8(b8))


# ---- quant/dequant pipeline ----------------------------------------------

@pytest.mark.parametrize("qp", [0, 10, 20, 28, 37, 51])
def test_4x4_pipeline_reconstruction_error(qp):
    """enc->dec round trip: reconstruction error bounded by the quant step."""
    res = rng.integers(-255, 256, (32, 4, 4)).astype(np.int32)
    coefs = transforms.forward4x4(res)
    offset = quant.default_offset4(qp, intra=True)
    levels = quant.quant4x4(coefs, qp, offset)
    deq = quant.dequant4x4(levels, qp)
    rec = rshift_rnd_sf(transforms.inverse4x4(deq), 6)
    step = (2 ** (qp // 6)) * [0.625, 0.6875, 0.8125, 0.875, 1.0, 1.125][qp % 6]
    max_err = np.abs(rec - res).max()
    assert max_err <= max(2, int(1.5 * step)), (qp, max_err, step)


@pytest.mark.parametrize("qp", [0, 20, 28, 51])
def test_8x8_pipeline_reconstruction_error(qp):
    res = rng.integers(-255, 256, (16, 8, 8)).astype(np.int32)
    coefs = transforms.forward8x8(res)
    offset = quant.default_offset8(qp, intra=True)
    levels = quant.quant8x8(coefs, qp, offset)
    deq = quant.dequant8x8(levels, qp)
    rec = rshift_rnd_sf(transforms.inverse8x8(deq), 6)
    step = (2 ** (qp // 6)) * [0.625, 0.6875, 0.8125, 0.875, 1.0, 1.125][qp % 6]
    max_err = np.abs(rec - res).max()
    assert max_err <= max(2, int(1.6 * step)), (qp, max_err, step)


def test_dc_only_inverse():
    """DC-only coefficient gives a flat block: inv(64*delta) = 64 everywhere."""
    c = np.zeros((1, 4, 4), np.int32)
    c[0, 0, 0] = 64
    out = transforms.inverse4x4(c)
    np.testing.assert_array_equal(out, np.full((1, 4, 4), 64))


def test_quant_tables_structure():
    """Spot values of the generated normative tables."""
    np.testing.assert_array_equal(
        quant.DEQUANT4[0],
        [[10, 13, 10, 13], [13, 16, 13, 16], [10, 13, 10, 13], [13, 16, 13, 16]],
    )
    assert quant.DEQUANT8[0][0, 0] == 20
    assert quant.DEQUANT8[0][1, 1] == 18
    assert quant.DEQUANT8[0][2, 2] == 32
    assert quant.DEQUANT8[1][0, 2] == 28
    assert quant.QUANT8[5][2, 2] == 11570
    assert quant.QUANT4[0][0, 0] == 13107
