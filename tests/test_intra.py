"""Intra reconstruction parity: frame 0 (IDR, all-intra) of the 640x360
stream, reconstructed with residual_transform + intra_pass, must equal the
reference's pre-deblocking frame byte for byte."""

import numpy as np

from h264bsd_tpu.frontend.binding import FrontendDecoder, PIC_RDY, HDRS_RDY, ERROR
from h264bsd_tpu.ops.transform import mb_residual_planes, residual_transform
from h264bsd_tpu.ops.intra import intra_pass
from h264bsd_tpu.utils.golden import stream_path
from h264bsd_tpu.utils.reftrace import read_trace, trace_stream


def first_frame_tensors(name):
    data = stream_path(name).read_bytes()
    dec = FrontendDecoder()
    pos = 0
    n_mbs = w = h = None
    while pos < len(data):
        status, read = dec.decode(data[pos:])
        pos += read
        if status == HDRS_RDY:
            info = dec.stream_info()
            w, h = info["width_mbs"], info["height_mbs"]
            n_mbs = w * h
        elif status == PIC_RDY:
            return dec.tensors(n_mbs), w, h
        elif status >= ERROR:
            assert read > 0
    raise AssertionError("no frame")


def test_intra_frame0_parity():
    import jax.numpy as jnp
    name = "640x360"
    t, w_mbs, h_mbs = first_frame_tensors(name)
    trace = read_trace(trace_stream(name), max_pics=1, with_frames=True)
    ref = trace[0].pre_deblock
    W, H = w_mbs * 16, h_mbs * 16

    res, _ = residual_transform(
        jnp.asarray(t["coeff"], jnp.int32),
        jnp.asarray(t["luma_dc"], jnp.int32),
        jnp.asarray(t["chroma_dc"], jnp.int32),
        jnp.asarray(t["qp_y"], jnp.int32),
        jnp.asarray(t["chroma_qp_offset"], jnp.int32),
        jnp.asarray(t["nnz"], jnp.int32),
        jnp.asarray(t["nnz_dc"], jnp.int32),
        jnp.asarray(t["mb_class"] == 4),
    )
    rl, rc = mb_residual_planes(res)

    y = jnp.zeros((H, W), jnp.uint8)
    cb = jnp.zeros((H // 2, W // 2), jnp.uint8)
    cr = jnp.zeros((H // 2, W // 2), jnp.uint8)
    y, cb, cr = intra_pass(
        y, cb, cr,
        jnp.asarray(t["mb_class"]), jnp.asarray(t["i4_modes"], jnp.int32),
        jnp.asarray(t["i4_avail"], jnp.int32),
        jnp.asarray(t["mb_avail"], jnp.int32),
        jnp.asarray(t["i16_mode"], jnp.int32),
        jnp.asarray(t["chroma_mode"], jnp.int32), rl, rc, w_mbs)

    ref_y = np.frombuffer(ref[:W * H], np.uint8).reshape(H, W)
    ref_cb = np.frombuffer(ref[W * H:W * H * 5 // 4], np.uint8).reshape(
        H // 2, W // 2)
    ref_cr = np.frombuffer(ref[W * H * 5 // 4:], np.uint8).reshape(
        H // 2, W // 2)

    y, cb, cr = np.asarray(y), np.asarray(cb), np.asarray(cr)
    for ours, refp, label in ((y, ref_y, "Y"), (cb, ref_cb, "Cb"),
                              (cr, ref_cr, "Cr")):
        diff = ours != refp
        assert not diff.any(), (
            f"{label}: {diff.sum()} differing pels, first at "
            f"{np.argwhere(diff)[:5].tolist()}, "
            f"ours={ours[diff][:8].tolist()} ref={refp[diff][:8].tolist()}")
