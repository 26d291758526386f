"""Residual transform parity: batched dequant+IDCT output must equal the
reference's per-block ProcessResidual results (pixel-domain residuals
captured in the instrumented trace, incl. the MARK_RESIDUAL_EMPTY paths)."""

import numpy as np
import pytest

from h264bsd_tpu.frontend.binding import FrontendDecoder, PIC_RDY, HDRS_RDY, ERROR
from h264bsd_tpu.ops.transform import residual_transform
from h264bsd_tpu.utils.golden import stream_path
from h264bsd_tpu.utils.reftrace import ZIG2RAS, read_trace, trace_stream

EMPTY = 0xFFFFFF
N_TEST_PICS = 8


def frames(name, n):
    data = stream_path(name).read_bytes()
    dec = FrontendDecoder()
    pos = 0
    n_mbs = None
    got = 0
    while pos < len(data) and got < n:
        status, read = dec.decode(data[pos:])
        pos += read
        if status == HDRS_RDY:
            info = dec.stream_info()
            n_mbs = info["width_mbs"] * info["height_mbs"]
        elif status == PIC_RDY:
            yield dec.tensors(n_mbs)
            got += 1
        elif status >= ERROR:
            assert read > 0


def test_residual_transform_parity():
    import jax.numpy as jnp
    name = "640x360"
    trace = read_trace(trace_stream(name), max_pics=N_TEST_PICS)
    checked = 0
    for pic_idx, t in enumerate(frames(name, N_TEST_PICS)):
        res, empty = residual_transform(
            jnp.asarray(t["coeff"], jnp.int32),
            jnp.asarray(t["luma_dc"], jnp.int32),
            jnp.asarray(t["chroma_dc"], jnp.int32),
            jnp.asarray(t["qp_y"], jnp.int32),
            jnp.asarray(t["chroma_qp_offset"], jnp.int32),
            jnp.asarray(t["nnz"], jnp.int32),
            jnp.asarray(t["nnz_dc"], jnp.int32),
            jnp.asarray(t["mb_class"] == 4),
        )
        res = np.asarray(res)
        empty = np.asarray(empty)

        for mb_num, rmb in trace[pic_idx].mbs.items():
            if rmb.mb_type == 0 or rmb.mb_type == 31:
                continue  # skip MBs (stale scratch) and I_PCM (raw samples)
            # luma blocks: trace zigzag z -> our raster block ZIG2RAS[z]
            for z in range(16):
                ref = rmb.levels[z]
                r = ZIG2RAS[z]
                if ref[0] == EMPTY:
                    assert empty[mb_num, r], (pic_idx, mb_num, z)
                else:
                    assert not empty[mb_num, r], (pic_idx, mb_num, z)
                    assert np.array_equal(res[mb_num, r], ref), (
                        pic_idx, mb_num, z, res[mb_num, r], ref)
                checked += 1
            for b in range(16, 24):
                ref = rmb.levels[b]
                if ref[0] == EMPTY:
                    assert empty[mb_num, b], (pic_idx, mb_num, b)
                else:
                    assert not empty[mb_num, b], (pic_idx, mb_num, b)
                    assert np.array_equal(res[mb_num, b], ref), (
                        pic_idx, mb_num, b)
                checked += 1
    assert checked > 10000
