"""Shared Pallas TPU helpers.

lane_roll_narrow: Mosaic's dynamic lane rotate only exists for 32-bit
data, so rolling a uint8 superset used to mean widening the whole
(rows, 256) tile to int32 first — 4x the vregs, and the rolls dominate
the window-load cost of every kernel here. pltpu.bitcast packs along
the SECOND-MINOR dim (4 consecutive u8 rows into one u32 row), which
makes a u32 lane roll of the packed view move whole byte-columns —
i.e. it IS the u8 lane roll, at a quarter of the vreg traffic. The
int32 cast then happens on the small sliced window instead of the full
superset.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def lane_roll_narrow(x, shift):
    """Dynamic lane roll of a (rows, lanes) uint8/int8/int16 array via the
    u32-packed view. rows * itemsize_bits must be a multiple of 32.
    Static shifts are normalized to [0, lanes) (Mosaic rejects negative
    static rotate amounts; dynamic ones wrap at runtime)."""
    if isinstance(shift, int):
        shift %= x.shape[1]
        if shift == 0:
            return x
    w = pltpu.bitcast(x, jnp.uint32)
    w = pltpu.roll(w, shift, 1)
    return pltpu.bitcast(w, x.dtype)
