"""Parity of the Pallas motion-compensation kernels (interpreter mode)
against the XLA formulation (ops.inter), which itself carries frame parity
vs the reference decoder (tests/test_inter.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from h264bsd_tpu.ops.inter import inter_predict_frame
from h264bsd_tpu.ops.pallas_mc import mc_predict_planes
from h264bsd_tpu.ops.reconstruct import mb_grid_to_plane


@pytest.mark.parametrize("seed", [0, 1])
def test_mc_parity_interpret(seed):
    rng = np.random.default_rng(seed)
    w_mbs, h_mbs = 6, 4
    n_mb = w_mbs * h_mbs
    H, W = h_mbs * 16, w_mbs * 16
    n_slots = 3
    dpb_y = rng.integers(0, 255, (n_slots, H, W), dtype=np.uint8)
    dpb_cb = rng.integers(0, 255, (n_slots, H // 2, W // 2), dtype=np.uint8)
    dpb_cr = rng.integers(0, 255, (n_slots, H // 2, W // 2), dtype=np.uint8)

    # uniform MVs per MB, with a few exception MBs holding per-block MVs;
    # ranges push windows across and fully outside the frame borders
    mv = np.zeros((n_mb, 16, 2), np.int32)
    base = rng.integers(-80, 80, (n_mb, 1, 2))
    mv[:] = base
    exc = np.array([1, 5, 17], np.int32)
    mv[exc] = rng.integers(-80, 80, (len(exc), 16, 2))
    ref_slot = np.zeros((n_mb, 16), np.int32)
    ref_slot[:] = rng.integers(0, 2, (n_mb, 1)) * 2   # slots {0, 2}
    ref_slot[exc] = rng.integers(0, 2, (len(exc), 16)) * 2

    py, pcb, pcr = inter_predict_frame(
        jnp.asarray(dpb_y), jnp.asarray(dpb_cb), jnp.asarray(dpb_cr),
        jnp.asarray(mv), jnp.asarray(ref_slot), w_mbs, h_mbs)
    want_y = np.asarray(mb_grid_to_plane(
        jnp.clip(py, 0, 255).astype(jnp.uint8), w_mbs, h_mbs))
    want_cb = np.asarray(mb_grid_to_plane(
        jnp.clip(pcb, 0, 255).astype(jnp.uint8), w_mbs, h_mbs))
    want_cr = np.asarray(mb_grid_to_plane(
        jnp.clip(pcr, 0, 255).astype(jnp.uint8), w_mbs, h_mbs))

    # quad-grained exception ids (mb*4 + quadrant); emit all 4 quads
    exc_ids = np.full(16, n_mb * 4, np.int32)
    exc_ids[:4 * len(exc)] = (exc[:, None] * 4 +
                              np.arange(4)[None, :]).reshape(-1)
    used = np.array([0, 2], np.int32)
    got_y, got_cb, got_cr = mc_predict_planes(
        jnp.asarray(dpb_y), jnp.asarray(dpb_cb), jnp.asarray(dpb_cr),
        jnp.asarray(mv), jnp.asarray(ref_slot), jnp.asarray(exc_ids),
        jnp.asarray(used), w_mbs, h_mbs, interpret=True)

    np.testing.assert_array_equal(np.asarray(got_y), want_y)
    np.testing.assert_array_equal(np.asarray(got_cb), want_cb)
    np.testing.assert_array_equal(np.asarray(got_cr), want_cr)


def test_mc_multigroup_parity_interpret():
    """used_slots beyond one VMEM group (>4 slots): the merged multi-pass
    path must match the XLA gather formulation block-for-block."""
    rng = np.random.default_rng(7)
    w_mbs, h_mbs = 5, 3
    n_mb = w_mbs * h_mbs
    H, W = h_mbs * 16, w_mbs * 16
    n_slots = 8
    dpb_y = rng.integers(0, 255, (n_slots, H, W), dtype=np.uint8)
    dpb_cb = rng.integers(0, 255, (n_slots, H // 2, W // 2), dtype=np.uint8)
    dpb_cr = rng.integers(0, 255, (n_slots, H // 2, W // 2), dtype=np.uint8)

    mv = np.zeros((n_mb, 16, 2), np.int32)
    mv[:] = rng.integers(-40, 40, (n_mb, 1, 2))
    exc = np.array([2, 9], np.int32)
    mv[exc] = rng.integers(-40, 40, (len(exc), 16, 2))
    # six distinct slots referenced; exception MBs mix slots from BOTH
    # VMEM groups within one macroblock
    used = np.array([0, 2, 3, 5, 6, 7, 0, 0], np.int32)
    ref_slot = np.zeros((n_mb, 16), np.int32)
    ref_slot[:] = used[rng.integers(0, 6, (n_mb, 1))]
    ref_slot[exc] = used[rng.integers(0, 6, (len(exc), 16))]

    py, pcb, pcr = inter_predict_frame(
        jnp.asarray(dpb_y), jnp.asarray(dpb_cb), jnp.asarray(dpb_cr),
        jnp.asarray(mv), jnp.asarray(ref_slot), w_mbs, h_mbs)
    want_y = np.asarray(mb_grid_to_plane(
        jnp.clip(py, 0, 255).astype(jnp.uint8), w_mbs, h_mbs))
    want_cb = np.asarray(mb_grid_to_plane(
        jnp.clip(pcb, 0, 255).astype(jnp.uint8), w_mbs, h_mbs))
    want_cr = np.asarray(mb_grid_to_plane(
        jnp.clip(pcr, 0, 255).astype(jnp.uint8), w_mbs, h_mbs))

    exc_ids = np.full(16, n_mb * 4, np.int32)
    exc_ids[:4 * len(exc)] = (exc[:, None] * 4 +
                              np.arange(4)[None, :]).reshape(-1)
    got_y, got_cb, got_cr = mc_predict_planes(
        jnp.asarray(dpb_y), jnp.asarray(dpb_cb), jnp.asarray(dpb_cr),
        jnp.asarray(mv), jnp.asarray(ref_slot), jnp.asarray(exc_ids),
        jnp.asarray(used), w_mbs, h_mbs, interpret=True)

    np.testing.assert_array_equal(np.asarray(got_y), want_y)
    np.testing.assert_array_equal(np.asarray(got_cb), want_cb)
    np.testing.assert_array_equal(np.asarray(got_cr), want_cr)


def test_mc_luma_rowtile_interpret():
    """luma_rowtile returns luma in plane-chunk layout (nG, 16, 128):
    one major-dim reshape must reproduce the plane, exception quads
    included (width_mbs % 8 == 0 so groups never wrap MB rows)."""
    from h264bsd_tpu.ops.pallas_mc import mc_predict_grids
    rng = np.random.default_rng(3)
    w_mbs, h_mbs = 8, 4
    n_mb = w_mbs * h_mbs
    H, W = h_mbs * 16, w_mbs * 16
    dpb_y = rng.integers(0, 255, (3, H, W), dtype=np.uint8)
    dpb_cb = rng.integers(0, 255, (3, H // 2, W // 2), dtype=np.uint8)
    dpb_cr = rng.integers(0, 255, (3, H // 2, W // 2), dtype=np.uint8)
    mv = np.zeros((n_mb, 16, 2), np.int32)
    mv[:] = rng.integers(-60, 60, (n_mb, 1, 2))
    exc = np.array([0, 7, 21], np.int32)
    mv[exc] = rng.integers(-60, 60, (len(exc), 16, 2))
    ref_slot = np.zeros((n_mb, 16), np.int32)
    exc_ids = np.full(16, n_mb * 4, np.int32)
    exc_ids[:12] = (exc[:, None] * 4 + np.arange(4)[None, :]).reshape(-1)
    used = np.array([0], np.int32)
    args = (jnp.asarray(dpb_y), jnp.asarray(dpb_cb), jnp.asarray(dpb_cr),
            jnp.asarray(mv), jnp.asarray(ref_slot), jnp.asarray(exc_ids),
            jnp.asarray(used), w_mbs, h_mbs)
    gy, gcb, gcr = mc_predict_grids(*args, interpret=True)
    ry, rcb, rcr = mc_predict_grids(*args, interpret=True,
                                    luma_rowtile=True)
    plane_want = np.asarray(mb_grid_to_plane(gy, w_mbs, h_mbs))
    plane_got = np.asarray(ry).reshape(h_mbs, w_mbs // 8, 16, 128) \
        .transpose(0, 2, 1, 3).reshape(H, W)
    np.testing.assert_array_equal(plane_got, plane_want)
    # chroma comes back as (nG, 8, 64) half-chunk tiles
    for grid, rt in ((gcb, rcb), (gcr, rcr)):
        cw = np.asarray(mb_grid_to_plane(grid, w_mbs, h_mbs))
        cg = np.asarray(rt).reshape(h_mbs, w_mbs // 8, 8, 64) \
            .transpose(0, 2, 1, 3).reshape(H // 2, W // 2)
        np.testing.assert_array_equal(cg, cw)
