"""Inter reconstruction parity: frame 1 (first P frame) of the 640x360
stream, motion-compensated from the reference's own post-deblock frame 0
(isolates MC from deblocking), must match the reference pre-deblock frame 1
byte for byte."""

import numpy as np

from h264bsd_tpu.frontend.binding import FrontendDecoder, PIC_RDY, HDRS_RDY, ERROR
from h264bsd_tpu.ops.reconstruct import reconstruct_frame
from h264bsd_tpu.utils.golden import stream_path
from h264bsd_tpu.utils.reftrace import read_trace, trace_stream


def test_inter_frame1_parity():
    import jax.numpy as jnp
    name = "640x360"
    data = stream_path(name).read_bytes()
    dec = FrontendDecoder()
    pos = 0
    n_mbs = w_mbs = h_mbs = None
    frames = []
    while pos < len(data) and len(frames) < 2:
        status, read = dec.decode(data[pos:])
        pos += read
        if status == HDRS_RDY:
            info = dec.stream_info()
            w_mbs, h_mbs = info["width_mbs"], info["height_mbs"]
            n_mbs = w_mbs * h_mbs
        elif status == PIC_RDY:
            frames.append((dec.pic_info(), dec.tensors(n_mbs)))
        elif status >= ERROR:
            assert read > 0

    trace = read_trace(trace_stream(name), max_pics=2, with_frames=True)
    W, H = w_mbs * 16, h_mbs * 16

    def split(buf):
        y = np.frombuffer(buf[:W * H], np.uint8).reshape(H, W)
        cb = np.frombuffer(buf[W * H:W * H * 5 // 4], np.uint8).reshape(
            H // 2, W // 2)
        cr = np.frombuffer(buf[W * H * 5 // 4:], np.uint8).reshape(
            H // 2, W // 2)
        return y, cb, cr

    # seed the DPB with the reference's post-deblock frame 0 in the slot our
    # front-end assigned to it
    info0, _ = frames[0]
    info1, t1 = frames[1]
    n_slots = dec.stream_info()["dpb_slots"]
    ref0_y, ref0_cb, ref0_cr = split(trace[0].post_deblock)
    dpb_y = np.zeros((n_slots, H, W), np.uint8)
    dpb_cb = np.zeros((n_slots, H // 2, W // 2), np.uint8)
    dpb_cr = np.zeros((n_slots, H // 2, W // 2), np.uint8)
    dpb_y[info0["slot"]] = ref0_y
    dpb_cb[info0["slot"]] = ref0_cb
    dpb_cr[info0["slot"]] = ref0_cr

    tj = {k: jnp.asarray(v) for k, v in t1.items()}
    tj["pcm_y"] = jnp.zeros((n_mbs, 16, 16), jnp.uint8)
    tj["pcm_cb"] = jnp.zeros((n_mbs, 8, 8), jnp.uint8)
    tj["pcm_cr"] = jnp.zeros((n_mbs, 8, 8), jnp.uint8)
    y, cb, cr = reconstruct_frame(tj, jnp.asarray(dpb_y),
                                  jnp.asarray(dpb_cb), jnp.asarray(dpb_cr),
                                  w_mbs, h_mbs)

    ref1_y, ref1_cb, ref1_cr = split(trace[1].pre_deblock)
    for ours, refp, label in ((np.asarray(y), ref1_y, "Y"),
                              (np.asarray(cb), ref1_cb, "Cb"),
                              (np.asarray(cr), ref1_cr, "Cr")):
        diff = ours != refp
        assert not diff.any(), (
            f"{label}: {diff.sum()} differing pels, first "
            f"{np.argwhere(diff)[:5].tolist()}, "
            f"ours={ours[diff][:8].tolist()} ref={refp[diff][:8].tolist()}")
