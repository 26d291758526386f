"""Quick on-TPU profile of the 1080p decode hot path with pinned caps.

Prints: e2e fps for several WINDOW settings, per-stage device times of a
representative P frame (unpack / residual / mc / intra / deblock-wf /
full step), and the window-dispatch count. Much faster than
profile_stages.py because every jit shape is pinned up front (the
caps-pin dry parse) and stages reuse the warm compile cache.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/h264tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from h264bsd_tpu.frontend import binding as fe
    from h264bsd_tpu.models import decoder as D
    from h264bsd_tpu.utils import golden

    int(jnp.uint32(1) + jnp.uint32(2))   # open transfer path
    data = golden.stream_path("1920x1080").read_bytes()
    pin = D.pin_caps_for_stream(data)
    print("pin:", pin, flush=True)

    # collect preps once
    dec = D.Decoder(caps_pin=pin)
    preps = []
    pos = 0
    while pos < len(data):
        st, rd = dec._fe.decode(data[pos:], 0)
        pos += rd
        if st == fe.HDRS_RDY:
            dec._geom = dec._fe.stream_info()
        elif st == fe.PIC_RDY:
            preps.append(dec._prepare())
            while dec._fe.next_output() is not None:
                pass
        elif st >= fe.ERROR and rd == 0:
            break
    print(f"{len(preps)} preps", flush=True)

    # ---- per-stage timings on a mid-stream P frame ----
    from functools import partial
    from h264bsd_tpu.ops.unpack import unpack_blob, unpack_meta
    from h264bsd_tpu.ops.transform import residual_planes_sparse
    from h264bsd_tpu.ops.pallas_mc import mc_predict_grids
    from h264bsd_tpu.ops.pallas_intra import intra_pass_pallas
    from h264bsd_tpu.ops.pallas_deblock_wf import deblock_frame_wavefront
    from h264bsd_tpu.ops.deblock import boundary_strengths, edge_thresholds

    p = next(p for i, p in enumerate(preps) if not p["wavefront"] and i > 2)
    w_mbs, h_mbs = p["w_mbs"], p["h_mbs"]
    n_mbs = w_mbs * h_mbs
    H, W = h_mbs * 16, w_mbs * 16
    caps = p["caps"]
    dpb = (jnp.zeros((5, H, W), jnp.uint8),
           jnp.zeros((5, H // 2, W // 2), jnp.uint8),
           jnp.zeros((5, H // 2, W // 2), jnp.uint8))
    blob = jnp.asarray(p["blob"].view(np.uint32))
    used = jnp.asarray(p["used_slots"])

    @partial(jax.jit, static_argnames=("what",))
    def stage(blob, dy, dcb, dcr, used, what):
        s = unpack_blob(blob, n_mbs, *caps)
        t = unpack_meta(s[0], s[1], s[4], s[5], s[6], s[7], n_mbs, s[8], sparse_ids=s[2])
        if what == "unpack":
            return t
        mb_class = t["mb_class"].astype(jnp.int32)
        if what == "bsmaps":
            bl, bt = boundary_strengths(
                mb_class, t["nnz"].astype(jnp.int32),
                t["mv"].astype(jnp.int32), t["ref_slot"].astype(jnp.int32),
                t["slice_id"].astype(jnp.int32),
                t["disable_dblk"].astype(jnp.int32), w_mbs, h_mbs)
            la = edge_thresholds(t["qp_y"], t["slice_id"],
                                 t["filter_off_a"], t["filter_off_b"],
                                 t["chroma_qp_offset"], w_mbs, h_mbs,
                                 chroma=False)
            return bl, bt, la
        res = residual_planes_sparse(
            s[2].reshape(-1).astype(jnp.int32), s[3].astype(jnp.int32),
            t["qp_y"].astype(jnp.int32),
            t["chroma_qp_offset"].astype(jnp.int32),
            t["nnz_dc"].astype(jnp.int32), mb_class == 4, n_mbs)
        if what == "residual":
            return res
        if what == "mc":
            return mc_predict_grids(
                dy, dcb, dcr, t["mv"].astype(jnp.int32),
                t["ref_slot"].astype(jnp.int32),
                s[4].reshape(-1).astype(jnp.int32), used, w_mbs, h_mbs)
        if what == "intra":
            return intra_pass_pallas(
                dy[0], dcb[0], dcr[0], mb_class,
                t["i4_modes"].astype(jnp.int32),
                t["i4_avail"].astype(jnp.int32),
                t["mb_avail"].astype(jnp.int32),
                t["i16_mode"].astype(jnp.int32),
                t["chroma_mode"].astype(jnp.int32), res[0], res[1], w_mbs,
                h_mbs, intra_ids=s[6].reshape(-1).astype(jnp.int32))
        if what == "deblock":
            return deblock_frame_wavefront(
                dy[0], dcb[0], dcr[0], t["mb_class"], t["nnz"], t["mv"],
                t["ref_slot"], t["slice_id"], t["disable_dblk"], t["qp_y"],
                t["filter_off_a"], t["filter_off_b"],
                t["chroma_qp_offset"], w_mbs, h_mbs)

    def tt(fn, *a, reps=5):
        out = fn(*a)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    for what in ("unpack", "bsmaps", "residual", "mc", "intra", "deblock"):
        dt = tt(lambda w=what: stage(blob, *dpb, used, w))
        print(f"P-stage {what:9s} {dt*1e3:7.2f} ms", flush=True)

    def full():
        return D._decode_step(
            blob, *dpb, jnp.zeros((n_mbs, 16, 16), jnp.uint8),
            jnp.zeros((n_mbs, 8, 8), jnp.uint8),
            jnp.zeros((n_mbs, 8, 8), jnp.uint8), jnp.int32(0),
            jnp.bool_(False), jnp.int32(-1), w_mbs, h_mbs, caps,
            p["wavefront"], used, p["mc_pallas"], p["deblock_pallas"])
    print(f"P full_step        {tt(full)*1e3:7.2f} ms", flush=True)

    # ---- e2e at several WINDOW settings ----
    for wnd in ("4", "8", "16"):
        os.environ["H264TPU_WINDOW"] = wnd
        # warm
        for pic in D.decode_stream(data, caps_pin=pin):
            last = pic
        jax.block_until_ready(last.yuv_planes())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = 0
            for pic in D.decode_stream(data, caps_pin=pin):
                last = pic
                n += 1
            jax.block_until_ready(last.yuv_planes())
            best = min(best, time.perf_counter() - t0)
        print(f"WINDOW={wnd:3s} e2e {n / best:6.1f} fps "
              f"({best / n * 1e3:.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
