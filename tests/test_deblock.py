"""Deblocking parity: filtering the reference's own pre-deblock frames must
reproduce its post-deblock frames byte-for-byte (isolates the filter)."""

import numpy as np
import pytest

from h264bsd_tpu.frontend.binding import FrontendDecoder, PIC_RDY, HDRS_RDY, ERROR
from h264bsd_tpu.ops.deblock import deblock_frame
from h264bsd_tpu.utils.golden import stream_path
from h264bsd_tpu.utils.reftrace import read_trace, trace_stream

N_PICS = 3


def test_deblock_parity():
    import jax.numpy as jnp
    name = "640x360"
    data = stream_path(name).read_bytes()
    dec = FrontendDecoder()
    pos = 0
    n_mbs = w_mbs = h_mbs = None
    frames = []
    while pos < len(data) and len(frames) < N_PICS:
        status, read = dec.decode(data[pos:])
        pos += read
        if status == HDRS_RDY:
            info = dec.stream_info()
            w_mbs, h_mbs = info["width_mbs"], info["height_mbs"]
            n_mbs = w_mbs * h_mbs
        elif status == PIC_RDY:
            frames.append(dec.tensors(n_mbs))
        elif status >= ERROR:
            assert read > 0

    trace = read_trace(trace_stream(name), max_pics=N_PICS, with_frames=True)
    W, H = w_mbs * 16, h_mbs * 16

    def split(buf):
        return (np.frombuffer(buf[:W * H], np.uint8).reshape(H, W),
                np.frombuffer(buf[W * H:W * H * 5 // 4], np.uint8).reshape(
                    H // 2, W // 2),
                np.frombuffer(buf[W * H * 5 // 4:], np.uint8).reshape(
                    H // 2, W // 2))

    for pic in range(N_PICS):
        t = frames[pic]
        y0, cb0, cr0 = split(trace[pic].pre_deblock)
        y, cb, cr = deblock_frame(
            jnp.asarray(y0), jnp.asarray(cb0), jnp.asarray(cr0),
            jnp.asarray(t["mb_class"]), jnp.asarray(t["nnz"]),
            jnp.asarray(t["mv"]), jnp.asarray(t["ref_slot"]),
            jnp.asarray(t["slice_id"]), jnp.asarray(t["disable_dblk"]),
            jnp.asarray(t["qp_y"]), jnp.asarray(t["filter_off_a"]),
            jnp.asarray(t["filter_off_b"]),
            jnp.asarray(t["chroma_qp_offset"]), w_mbs, h_mbs)
        ry, rcb, rcr = split(trace[pic].post_deblock)
        for ours, refp, label in ((np.asarray(y), ry, "Y"),
                                  (np.asarray(cb), rcb, "Cb"),
                                  (np.asarray(cr), rcr, "Cr")):
            diff = ours != refp
            assert not diff.any(), (
                f"pic {pic} {label}: {diff.sum()} diffs, first "
                f"{np.argwhere(diff)[:5].tolist()}, "
                f"ours={ours[diff][:8].tolist()} "
                f"ref={refp[diff][:8].tolist()}")
