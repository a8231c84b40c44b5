"""Microbenchmark the P-frame device pipeline components on the TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from h264_tpu.encoder import fast as FAST
from h264_tpu.encoder import me as ME

PAD = FAST.PAD
H, W, R = 144, 176, 16
rng = np.random.default_rng(0)
cur = jnp.asarray(rng.integers(0, 256, (H, W)), jnp.int32)
refp = jnp.asarray(rng.integers(0, 256, (H + 2 * PAD, W + 2 * PAD)), jnp.int32)
n_my, n_mx = H // 16, W // 16


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    N = 50
    for _ in range(N):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / N * 1000
    print(f"{name:28s} {dt:8.3f} ms")
    return out


@jax.jit
def sad_v1(cur, refp):  # original: map over 1089 shifts
    def one_shift(d):
        dy, dx = d // (2 * R + 1), d % (2 * R + 1)
        win = jax.lax.dynamic_slice(refp, (PAD - R + dy, PAD - R + dx), (H, W))
        ad = jnp.abs(cur - win)
        return ad.reshape(n_my, 16, n_mx, 16).sum(axis=(1, 3))
    return jax.lax.map(one_shift, jnp.arange((2 * R + 1) ** 2))


@jax.jit
def sad_v2(cur, refp):  # map over dy, stacked dx
    def one_dy(dy):
        strip = jax.lax.dynamic_slice(refp, (PAD - R + dy, PAD - R), (H, W + 2 * R))
        wins = jnp.stack([strip[:, dx:dx + W] for dx in range(2 * R + 1)])
        ad = jnp.abs(cur[None] - wins)
        return ad.reshape(2 * R + 1, n_my, 16, n_mx, 16).sum(axis=(2, 4))
    return jax.lax.map(one_dy, jnp.arange(2 * R + 1))


@jax.jit
def sad_v3(cur, refp):  # fully unrolled dy, stacked dx
    outs = []
    for dy in range(2 * R + 1):
        strip = refp[PAD - R + dy: PAD - R + dy + H, PAD - R: PAD - R + W + 2 * R]
        wins = jnp.stack([strip[:, dx:dx + W] for dx in range(2 * R + 1)])
        ad = jnp.abs(cur[None] - wins)
        outs.append(ad.reshape(2 * R + 1, n_my, 16, n_mx, 16).sum(axis=(2, 4)))
    return jnp.stack(outs)


@jax.jit
def ssd_mxu(cur, refp):  # SSD via bf16 matmul on the MXU
    # patches: (n_mb, 256) current blocks; ref windows (n_mb, 1089, 256)
    curb = cur.reshape(n_my, 16, n_mx, 16).transpose(0, 2, 1, 3).reshape(-1, 256)
    # ref patch extraction: for each MB, (16+2R)x(16+2R) window
    S = 16 + 2 * R
    ys = (jnp.arange(n_my) * 16)[:, None] + jnp.arange(S)[None, :]
    xs = (jnp.arange(n_mx) * 16)[:, None] + jnp.arange(S)[None, :]
    winm = refp[PAD - R:, PAD - R:][ys[:, None, :, None], xs[None, :, None, :]]
    # winm: (n_my, n_mx, S, S) -> windows per shift via gather would blow up;
    # instead build (n_mb, 1089, 256) using broadcasted index arithmetic
    dy = jnp.arange(2 * R + 1)
    px = jnp.arange(16)
    iy = dy[:, None, None, None] + px[None, None, :, None]  # (33,1,16,1)
    ix = dy[None, :, None, None] + px[None, None, None, :]  # (1,33,1,16)
    pat = winm[:, :, iy, ix]  # (n_my, n_mx, 33, 33, 16, 16)
    pat = pat.reshape(-1, (2 * R + 1) ** 2, 256)
    patf = pat.astype(jnp.bfloat16)
    curf = curb.astype(jnp.bfloat16)
    cross = jax.lax.dot_general(
        patf, curf[:, :, None],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[..., 0]
    ref2 = jnp.einsum("bkc,bkc->bk", patf, patf,
                      preferred_element_type=jnp.float32)
    cur2 = jnp.einsum("bc,bc->b", curf, curf,
                      preferred_element_type=jnp.float32)
    ssd = ref2 - 2.0 * cross + cur2[:, None]
    return ssd.astype(jnp.int32).reshape(n_my, n_mx, 2 * R + 1, 2 * R + 1)


g1 = timeit("sad_v1 map1089", sad_v1, cur, refp)
g2 = timeit("sad_v2 map33xstack", sad_v2, cur, refp)
g3 = timeit("sad_v3 unrolled", sad_v3, cur, refp)
s4 = timeit("ssd_mxu", ssd_mxu, cur, refp)
np.testing.assert_array_equal(np.asarray(g1).reshape(33,33,n_my,n_mx), np.asarray(g2))
np.testing.assert_array_equal(np.asarray(g2), np.asarray(g3))
# verify ssd correctness vs direct computation for a few entries
gs = np.asarray(s4)
ref_np = np.asarray(refp)
cur_np = np.asarray(cur)
for (my, mx, dy, dx) in [(0,0,0,0),(3,5,10,20),(8,10,32,32),(4,7,16,16)]:
    w = ref_np[PAD - R + dy + my*16: PAD - R + dy + my*16 + 16,
               PAD - R + dx + mx*16: PAD - R + dx + mx*16 + 16]
    c = cur_np[my*16:(my+1)*16, mx*16:(mx+1)*16]
    expect = ((w - c)**2).sum()
    got = gs[my, mx, dy, dx]
    assert expect == got, (my, mx, dy, dx, expect, got)
print("ssd exact: OK")

# full pipeline timing
from h264_tpu.ops import quant as Q  # noqa
b, h, j = FAST.half_planes(refp)
cu = jnp.asarray(rng.integers(0, 256, (H//2, W//2)), jnp.int32)
cv = jnp.asarray(rng.integers(0, 256, (H//2, W//2)), jnp.int32)
up = jnp.asarray(rng.integers(0, 256, (H//2 + 2*PAD, W//2 + 2*PAD)), jnp.int32)
vp = jnp.asarray(rng.integers(0, 256, (H//2 + 2*PAD, W//2 + 2*PAD)), jnp.int32)
lam = int(np.sqrt(0.85 * 2 ** ((28 - 12) / 3)) * 65536)
timeit("p_frame_device full", lambda: FAST.p_frame_device(
    cur, cu, cv, refp, b, h, j, up, vp,
    H=H, W=W, R=R, qp=28, qp_c=28, lambda_me=lam))
timeit("half_planes", FAST.half_planes, refp)

# ---- sub-stage timing of p_frame_device ----------------------------------
import functools
from h264_tpu.ops import transforms as TR

n_mb = n_my * n_mx
_REFINE = FAST._REFINE

@jax.jit
def stage_refine(cur_y, ref_pad, bpl, hpl, jpl, int_mvx_f, int_mvy_f):
    mb_ys = (jnp.arange(n_mb) // n_mx) * 16
    mb_xs = (jnp.arange(n_mb) % n_mx) * 16
    lambda_me = lam

    def qpel_window_static(iy, ix, dy, dx):
        G = lambda oy, ox: jax.lax.dynamic_slice(ref_pad, (iy + oy, ix + ox), (16, 16))
        B = lambda oy, ox: jax.lax.dynamic_slice(bpl, (iy - 2 + oy, ix - 2 + ox), (16, 16))
        Hh = lambda oy, ox: jax.lax.dynamic_slice(hpl, (iy - 2 + oy, ix - 2 + ox), (16, 16))
        J = lambda oy, ox: jax.lax.dynamic_slice(jpl, (iy - 2 + oy, ix - 2 + ox), (16, 16))
        avg = lambda p, q: (p + q + 1) >> 1
        if (dx, dy) == (0, 0):
            return G(0, 0)
        if dy == 0:
            return {1: lambda: avg(G(0, 0), B(0, 0)), 2: lambda: B(0, 0),
                    3: lambda: avg(B(0, 0), G(0, 1))}[dx]()
        if dx == 0:
            return {1: lambda: avg(G(0, 0), Hh(0, 0)), 2: lambda: Hh(0, 0),
                    3: lambda: avg(Hh(0, 0), G(1, 0))}[dy]()
        if (dx, dy) == (2, 2):
            return J(0, 0)
        if dx == 2:
            return avg(B(0, 0), J(0, 0)) if dy == 1 else avg(J(0, 0), B(1, 0))
        if dy == 2:
            return avg(Hh(0, 0), J(0, 0)) if dx == 1 else avg(J(0, 0), Hh(0, 1))
        bb = B(0, 0) if dy == 1 else B(1, 0)
        hh = Hh(0, 0) if dx == 1 else Hh(0, 1)
        return avg(bb, hh)

    def refine_mb(i):
        y0, x0 = mb_ys[i], mb_xs[i]
        orig = jax.lax.dynamic_slice(cur_y, (y0, x0), (16, 16))
        base_x = int_mvx_f[i]
        base_y = int_mvy_f[i]
        iy0 = y0 + base_y + PAD
        ix0 = x0 + base_x + PAD
        preds = []
        costs = []
        for (ox, oy) in _REFINE:
            dx, dy = ox & 3, oy & 3
            sx, sy = ox >> 2, oy >> 2
            pred = qpel_window_static(iy0 + sy, ix0 + sx, dy, dx)
            sad = jnp.abs(orig - pred).sum()
            preds.append(pred)
            costs.append(sad)
        costs = jnp.stack(costs)
        preds = jnp.stack(preds)
        k = jnp.argmin(costs)
        return preds[k]

    return jax.vmap(refine_mb)(jnp.arange(n_mb))

@jax.jit
def stage_tq(cur_y, pred_y):
    res = cur_y - pred_y
    blocks = res.reshape(H // 4, 4, W // 4, 4).transpose(0, 2, 1, 3)
    coefs = TR.forward4x4(blocks)
    offset = jnp.int32(Q.default_offset4(28, False))
    lev = Q.quant4x4(coefs, 28, offset)
    deq = Q.dequant4x4(lev, 28)
    rres = TR.inverse4x4(deq.astype(jnp.int64)).astype(jnp.int32)
    pred_b = pred_y.reshape(H // 4, 4, W // 4, 4).transpose(0, 2, 1, 3)
    rec_b = ((rres + (pred_b << 6) + 32) >> 6).clip(0, 255)
    return lev, rec_b

mvx0 = jnp.zeros(n_mb, jnp.int32)
mvy0 = jnp.zeros(n_mb, jnp.int32)
timeit("stage_refine", stage_refine, cur, refp, b, h, j, mvx0, mvy0)
timeit("stage_tq luma", stage_tq, cur, cur)

# ---- bisect p_frame_device by truncation ---------------------------------
import h264_tpu.encoder.fast as F2

def make_trunc(stage):
    @functools.partial(jax.jit, static_argnames=())
    def trunc(cur_y, cur_u, cur_v, ref_pad, bpl, hpl, jpl, ref_u_pad, ref_v_pad):
        R_ = R; qp = 28; qp_c = 28; lambda_me = lam
        n_my, n_mx = H // 16, W // 16
        n_mb = n_my * n_mx
        def one_dy(dy):
            strip = jax.lax.dynamic_slice(ref_pad, (PAD - R_ + dy, PAD - R_), (H, W + 2 * R_))
            wins = jnp.stack([strip[:, dx: dx + W] for dx in range(2 * R_ + 1)])
            ad = jnp.abs(cur_y[None] - wins)
            return ad.reshape(2 * R_ + 1, n_my, 16, n_mx, 16).sum(axis=(2, 4))
        grids = jax.lax.map(one_dy, jnp.arange(2 * R_ + 1))
        if stage == "sad":
            return grids
        dgrid = jnp.arange(-R_, R_ + 1) * 4
        bits = F2._mv_bits_arr(dgrid)[None, :] + F2._mv_bits_arr(dgrid)[:, None]
        cost = grids + ((lambda_me * bits) >> 16)[..., None, None]
        flat = cost.reshape(-1, n_my, n_mx)
        best = jnp.argmin(flat, axis=0)
        int_mvy = (best // (2 * R_ + 1) - R_).astype(jnp.int32)
        int_mvx = (best % (2 * R_ + 1) - R_).astype(jnp.int32)
        if stage == "argmin":
            return int_mvx, int_mvy
        return int_mvx, int_mvy, grids[R_, R_]
    return trunc

t_sad = make_trunc("sad")
t_arg = make_trunc("argmin")
t_g = make_trunc("withg")
timeit("trunc sad", t_sad, cur, cu, cv, refp, b, h, j, up, vp)
timeit("trunc sad+argmin", t_arg, cur, cu, cv, refp, b, h, j, up, vp)
timeit("trunc +grids[R,R]", t_g, cur, cu, cv, refp, b, h, j, up, vp)
