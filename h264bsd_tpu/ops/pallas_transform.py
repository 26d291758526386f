"""Pallas TPU kernel for the batched dequant + inverse transform.

Same semantics as ops.transform's dequant + 4x4 integer IDCT. Hardware
layout: the 16 coefficient positions live in the sublane dimension and
independent blocks stream along the 128-wide lane dimension, so every
butterfly is a full-width VPU op on rows of the (16, TILE) block
(TPU tiles require a 128-lane minor dimension; a (N, 16) layout cannot
map). The XLA path remains the pipeline default (decode is host/transfer
bound); parity is pinned by tests/test_pallas.py on both the interpreter
and real TPUs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # blocks per grid step (lane dim, multiple of 128)


def _idct_kernel(coeff_ref, scale_ref, dc_ref, skip_dc_ref, out_ref):
    """One tile: dequant (with optional external DC) + 4x4 IDCT.

    coeff_ref/scale_ref: (16, TILE) int32 — raster coefficient positions
    in sublanes, blocks in lanes. dc_ref/skip_dc_ref: (1, TILE)."""
    d = coeff_ref[:] * scale_ref[:]
    row0 = jnp.where(skip_dc_ref[0] != 0, dc_ref[0], d[0])
    rows = [row0] + [d[i] for i in range(1, 16)]

    # horizontal butterflies: positions 4g..4g+3 form one pixel row
    h = [None] * 16
    for g in range(4):
        a, b, c, e = rows[4 * g], rows[4 * g + 1], rows[4 * g + 2], rows[4 * g + 3]
        t0 = a + c
        t1 = a - c
        t2 = (b >> 1) - e
        t3 = b + (e >> 1)
        h[4 * g + 0] = t0 + t3
        h[4 * g + 1] = t1 + t2
        h[4 * g + 2] = t1 - t2
        h[4 * g + 3] = t0 - t3

    # vertical butterflies: stride-4 positions form one pixel column
    v = [None] * 16
    for c in range(4):
        a, b, cc, e = h[c], h[c + 4], h[c + 8], h[c + 12]
        t0 = a + cc
        t1 = a - cc
        t2 = (b >> 1) - e
        t3 = b + (e >> 1)
        v[c + 0] = (t0 + t3 + 32) >> 6
        v[c + 4] = (t1 + t2 + 32) >> 6
        v[c + 8] = (t1 - t2 + 32) >> 6
        v[c + 12] = (t0 - t3 + 32) >> 6

    out_ref[:] = jnp.stack(v, axis=0)


@partial(jax.jit, static_argnames=())
def idct_blocks_pallas(coeff, scales, ext_dc, skip_dc):
    """(N, 16) raw levels -> (N, 16) pixel-domain residual via Pallas.

    N must be a multiple of TILE (pad with zeros). scales are the
    per-raster-position dequant multipliers; ext_dc/skip_dc implement the
    reference's skip-dc path (transform.c:97 'skip' argument)."""
    n = coeff.shape[0]
    ct = coeff.astype(jnp.int32).T        # (16, N)
    st = scales.astype(jnp.int32).T
    dc = ext_dc.astype(jnp.int32).reshape(1, n)
    sk = skip_dc.astype(jnp.int32).reshape(1, n)

    grid = (n // TILE,)
    spec16 = pl.BlockSpec((16, TILE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _idct_kernel,
        grid=grid,
        in_specs=[spec16, spec16, spec1, spec1],
        out_specs=spec16,
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.int32),
    )(ct, st, dc, sk)
    return out.T
