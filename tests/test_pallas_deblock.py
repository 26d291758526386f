"""Parity of the Pallas deblocking kernel (interpreter mode) against the
XLA raster formulation (ops.deblock.deblock_frame), which itself carries
frame parity vs the reference decoder (tests/test_deblock.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from h264bsd_tpu.ops.deblock import deblock_frame
from h264bsd_tpu.ops.pallas_deblock import deblock_frame_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_deblock_parity_interpret(seed):
    rng = np.random.default_rng(seed)
    w_mbs, h_mbs = 6, 4
    n = w_mbs * h_mbs
    H, W = h_mbs * 16, w_mbs * 16
    y = rng.integers(0, 255, (H, W), dtype=np.uint8)
    cb = rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8)
    cr = rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8)
    # mixed intra/inter/skip/concealed MBs, small MVs, varied QPs/slices
    mb_class = rng.integers(0, 7, n).astype(np.uint8)
    nnz = rng.integers(0, 3, (n, 24)).astype(np.int32)
    mv = rng.integers(-8, 8, (n, 16, 2)).astype(np.int16)
    ref = rng.integers(-1, 2, (n, 16)).astype(np.int8)
    sid = (np.arange(n) // 13).astype(np.uint32)
    dis = rng.integers(0, 3, n).astype(np.uint8)
    qp = rng.integers(10, 51, n).astype(np.uint8)
    fa = rng.integers(-4, 5, n).astype(np.int8)
    fb = rng.integers(-4, 5, n).astype(np.int8)
    cqo = rng.integers(-6, 7, n).astype(np.int8)

    args = (jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
            jnp.asarray(mb_class), jnp.asarray(nnz), jnp.asarray(mv),
            jnp.asarray(ref), jnp.asarray(sid), jnp.asarray(dis),
            jnp.asarray(qp), jnp.asarray(fa), jnp.asarray(fb),
            jnp.asarray(cqo), w_mbs, h_mbs)
    want = deblock_frame(*args)
    got = deblock_frame_pallas(*args, interpret=True)
    for w, g, name in zip(want, got, "y cb cr".split()):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), name)


@pytest.mark.parametrize("shear", [True, False])
@pytest.mark.parametrize("seed,dims", [(0, (6, 4)), (1, (9, 5)),
                                       (2, (3, 7))])
def test_deblock_wavefront_parity_interpret(seed, dims, shear):
    from h264bsd_tpu.ops.pallas_deblock_wf import deblock_frame_wavefront
    rng = np.random.default_rng(seed)
    w_mbs, h_mbs = dims
    n = w_mbs * h_mbs
    H, W = h_mbs * 16, w_mbs * 16
    y = rng.integers(0, 255, (H, W), dtype=np.uint8)
    cb = rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8)
    cr = rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8)
    mb_class = rng.integers(0, 7, n).astype(np.uint8)
    nnz = rng.integers(0, 3, (n, 24)).astype(np.int32)
    mv = rng.integers(-8, 8, (n, 16, 2)).astype(np.int16)
    ref = rng.integers(-1, 2, (n, 16)).astype(np.int8)
    sid = (np.arange(n) // 13).astype(np.uint32)
    dis = rng.integers(0, 3, n).astype(np.uint8)
    qp = rng.integers(10, 51, n).astype(np.uint8)
    fa = rng.integers(-4, 5, n).astype(np.int8)
    fb = rng.integers(-4, 5, n).astype(np.int8)
    cqo = rng.integers(-6, 7, n).astype(np.int8)

    args = (jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
            jnp.asarray(mb_class), jnp.asarray(nnz), jnp.asarray(mv),
            jnp.asarray(ref), jnp.asarray(sid), jnp.asarray(dis),
            jnp.asarray(qp), jnp.asarray(fa), jnp.asarray(fb),
            jnp.asarray(cqo), w_mbs, h_mbs)
    want = deblock_frame(*args)
    got = deblock_frame_wavefront(*args, interpret=True, shear=shear)
    for w, g, name in zip(want, got, "y cb cr".split()):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), name)
