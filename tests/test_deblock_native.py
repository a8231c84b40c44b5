"""Native C deblock vs the Python oracle on randomized pictures."""

import numpy as np
import pytest

from h264_tpu import native
from h264_tpu.decoder import mbtables as M
from h264_tpu.decoder.state import PictureParseState
from h264_tpu.ops import deblock as DB
from h264_tpu.syntax.parsets import SPS


def _random_state(rng, W=5, H=4):
    st = PictureParseState(W, H)
    nb = st.n_mbs
    st.slice_id[:] = rng.integers(0, 2, nb)
    st.qp[:] = rng.integers(10, 46, nb)
    st.qpc[:] = rng.integers(10, 40, (nb, 2))
    types = np.array([M.I4MB, M.I16MB, M.P16x16, M.P8x8], np.int32)
    st.mb_type[:] = types[rng.integers(0, 4, nb)]
    st.cbp_blk = [int(v) for v in rng.integers(0, 1 << 16, nb)]
    st.lf_disable[:] = rng.integers(0, 3, nb)
    st.lf_alpha[:] = rng.integers(-6, 7, nb)
    st.lf_beta[:] = rng.integers(-6, 7, nb)
    st.transform8x8[:] = rng.integers(0, 2, nb)
    st.ref_idx[0] = rng.integers(-1, 2, (4 * H, 4 * W))
    st.ref_idx[1] = rng.integers(-1, 2, (4 * H, 4 * W))
    st.ref_pic_id[0] = rng.integers(0, 3, (4 * H, 4 * W))
    st.ref_pic_id[1] = rng.integers(0, 3, (4 * H, 4 * W))
    st.mv[0] = rng.integers(-20, 20, (4 * H, 4 * W, 2))
    st.mv[1] = rng.integers(-20, 20, (4 * H, 4 * W, 2))
    return st


class _Planes:
    pass


def _random_planes(rng, sps):
    p = _Planes()
    p.Y = np.ascontiguousarray(
        rng.integers(0, 256, (sps.height, sps.width)), np.int32
    )
    p.U = np.ascontiguousarray(
        rng.integers(0, 256, (sps.height // 2, sps.width // 2)), np.int32
    )
    p.V = np.ascontiguousarray(
        rng.integers(0, 256, (sps.height // 2, sps.width // 2)), np.int32
    )
    return p


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_oracle(seed, monkeypatch):
    if native._load("deblock") is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(seed)
    W, H = 5, 4
    sps = SPS(
        profile_idc=66, level_idc=30,
        pic_width_in_mbs_minus1=W - 1, pic_height_in_map_units_minus1=H - 1,
    )
    st = _random_state(rng, W, H)
    pn = _random_planes(rng, sps)
    po = _Planes()
    po.Y, po.U, po.V = pn.Y.copy(), pn.U.copy(), pn.V.copy()

    DB.deblock_picture(st, sps, pn)  # native path

    monkeypatch.setattr(native, "deblock_run", lambda *a, **k: False)
    DB.deblock_picture(st, sps, po)  # oracle path

    np.testing.assert_array_equal(pn.Y, po.Y)
    np.testing.assert_array_equal(pn.U, po.U)
    np.testing.assert_array_equal(pn.V, po.V)
