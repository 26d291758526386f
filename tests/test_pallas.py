"""Pallas kernel parity: the Pallas dequant+IDCT must match the XLA path
bit for bit on real stream data (runs in interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "cpu"),
                    reason="needs TPU or pallas interpreter")
def test_pallas_idct_parity():
    from h264bsd_tpu.frontend.binding import (FrontendDecoder, PIC_RDY,
                                              HDRS_RDY, ERROR)
    from h264bsd_tpu.ops.transform import (_dequant_scales, idct4x4)
    from h264bsd_tpu.utils.golden import stream_path
    import h264bsd_tpu.ops.pallas_transform as pt

    interpret = jax.default_backend() != "tpu"
    if interpret:
        # run the kernel in interpreter mode on CPU
        import jax.experimental.pallas as pl
        orig = pl.pallas_call
        pl.pallas_call = lambda *a, **k: orig(*a, interpret=True, **k)

    data = stream_path("640x360").read_bytes()
    dec = FrontendDecoder()
    pos = 0
    n_mbs = None
    while pos < len(data):
        s, r = dec.decode(data[pos:])
        pos += r
        if s == HDRS_RDY:
            i = dec.stream_info()
            n_mbs = i["width_mbs"] * i["height_mbs"]
        elif s == PIC_RDY:
            break
    t = dec.tensors(n_mbs)

    # luma blocks of all MBs, qp-dependent scales
    coeff = jnp.asarray(t["coeff"][:, :16].reshape(-1, 16), jnp.int32)
    qp = jnp.asarray(np.repeat(t["qp_y"], 16), jnp.int32)
    scales = _dequant_scales(qp)
    n = coeff.shape[0]
    pad = (-n) % pt.TILE
    coeffp = jnp.pad(coeff, ((0, pad), (0, 0)))
    scalesp = jnp.pad(scales, ((0, pad), (0, 0)))
    zeros = jnp.zeros((n + pad,), jnp.int32)

    got = pt.idct_blocks_pallas(coeffp, scalesp, zeros, zeros)[:n]
    want = idct4x4(coeff * scales)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    if interpret:
        pl.pallas_call = orig
