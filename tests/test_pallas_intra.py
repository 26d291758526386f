"""Parity of the Pallas intra pass (interpreter mode) against the XLA
sequential pass (ops.intra.intra_pass), which itself carries frame parity
vs the reference decoder (tests/test_intra.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from h264bsd_tpu.ops.intra import intra_pass
from h264bsd_tpu.ops.pallas_intra import intra_pass_pallas


def _gen_case(seed, w_mbs, h_mbs):
    """Random conformant intra frame state (see mode-conformance notes
    inline): returns (y, cb, cr, args) for the intra passes."""
    rng = np.random.default_rng(seed)
    n = w_mbs * h_mbs
    H, W = h_mbs * 16, w_mbs * 16
    y = rng.integers(0, 255, (H, W), dtype=np.uint8)
    cb = rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8)
    cr = rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8)
    mb_class = rng.integers(2, 5, n).astype(np.int32)     # inter/i4/i16 mix
    # availability consistent with the grid (A/B/C/D from position),
    # plus random C-off to exercise the above-right replication
    r, c = np.arange(n) // w_mbs, np.arange(n) % w_mbs
    mb_avail = ((c > 0) * 1 | (r > 0) * 2 | ((r > 0) & (c > 0)) * 8
                ).astype(np.int32)
    i4_avail = np.zeros((n, 16), np.int32)
    i4_modes = np.zeros((n, 16), np.int32)
    # conformant modes only: a mode may be signalled only when the
    # neighbours it predicts from are available (what an encoder can
    # emit; with neighbours missing the don't-care paths of the two
    # implementations legitimately differ)
    NEED_A = {1, 4, 5, 6, 8}      # left
    NEED_B = {0, 3, 4, 5, 6, 7}   # above
    for b in range(16):
        bx, by = b % 4, b // 4
        a = ((bx > 0) | (c > 0)) * 1 | ((by > 0) | (r > 0)) * 2
        cc = rng.integers(0, 2, n) * 4
        d = ((bx > 0) | (c > 0)) & ((by > 0) | (r > 0))
        i4_avail[:, b] = a | cc | d * 8
        for i in range(n):
            av = int(i4_avail[i, b])
            ok = [m for m in range(9)
                  if (av & 1 or m not in NEED_A)
                  and (av & 2 or m not in NEED_B)]
            i4_modes[i, b] = ok[rng.integers(0, len(ok))]
    # i16/chroma plane and directional modes likewise need neighbours
    i16_mode = np.array([rng.integers(0, 4) if (av & 3) == 3 else 2
                         for av in mb_avail], np.int32)
    chroma_mode = np.array([rng.integers(0, 4) if (av & 3) == 3 else 0
                            for av in mb_avail], np.int32)
    resid_luma = rng.integers(-200, 200, (n, 16, 16)).astype(np.int32)
    resid_chroma = rng.integers(-200, 200, (n, 2, 8, 8)).astype(np.int32)

    args = (jnp.asarray(mb_class), jnp.asarray(i4_modes),
            jnp.asarray(i4_avail), jnp.asarray(mb_avail),
            jnp.asarray(i16_mode), jnp.asarray(chroma_mode),
            jnp.asarray(resid_luma), jnp.asarray(resid_chroma))
    return y, cb, cr, args


@pytest.mark.parametrize("seed", [0, 1])
def test_intra_parity_interpret(seed):
    w_mbs, h_mbs = 6, 4
    n = w_mbs * h_mbs
    y, cb, cr, args = _gen_case(seed, w_mbs, h_mbs)
    mb_class = np.asarray(args[0])
    want = intra_pass(jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
                      *args, w_mbs)
    got = intra_pass_pallas(jnp.asarray(y), jnp.asarray(cb),
                            jnp.asarray(cr), *args, w_mbs, h_mbs,
                            interpret=True)
    for w, g, name in zip(want, got, "y cb cr".split()):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), name)

    # list-driven mode: the sparse intra-MB id list (ascending = decode
    # order here) must reproduce the dense walk exactly, including the
    # padded tail entries
    ids = np.flatnonzero((mb_class == 3) | (mb_class == 4)).astype(np.int32)
    ids = np.concatenate([ids, np.full(5, n, np.int32)])     # padding
    got_list = intra_pass_pallas(jnp.asarray(y), jnp.asarray(cb),
                                 jnp.asarray(cr), *args, w_mbs, h_mbs,
                                 interpret=True,
                                 intra_ids=jnp.asarray(ids))
    for w, g, name in zip(want, got_list, "y cb cr".split()):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      "list " + name)

    # the wavefront-batched kernel (intra-heavy frames) must match too
    from h264bsd_tpu.ops.pallas_intra_wf import intra_pass_wavefront_pallas
    got_wf = intra_pass_wavefront_pallas(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), *args,
        w_mbs, h_mbs, interpret=True)
    for w, g, name in zip(want, got_wf, "y cb cr".split()):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      "wavefront " + name)


@pytest.mark.parametrize("w_mbs,h_mbs", [(12, 9), (16, 3), (5, 11),
                                         (3, 2), (9, 16)])
def test_intra_wavefront_geometry_sweep(w_mbs, h_mbs):
    """Wavefront-kernel parity across geometries that exercise the G=8
    group machinery: band counts not a multiple of G, single-band
    frames, tall narrow frames (ramp-dominated wavefronts), and the
    tiny-frame fallback."""
    from h264bsd_tpu.ops.pallas_intra_wf import intra_pass_wavefront_pallas
    y, cb, cr, args = _gen_case(7, w_mbs, h_mbs)
    want = intra_pass(jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
                      *args, w_mbs)
    got = intra_pass_wavefront_pallas(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), *args,
        w_mbs, h_mbs, interpret=True)
    for w, g, name in zip(want, got, "y cb cr".split()):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), name)
