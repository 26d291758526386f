"""Throughput timing of the device kernels on the real TPU.

The tunneled transport has a ~24 ms blocking round trip, so blocking
per-dispatch timings measure latency, not cost. Here each stage is
enqueued N times back-to-back and blocked once: (total - round_trip)/N
approximates the true device occupancy per dispatch — the number that
governs pipelined decode throughput.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", default="1920x1080")
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--stages", default="mc,intra,deblock,full")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/h264tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from functools import partial
    from h264bsd_tpu.frontend import binding as fe
    from h264bsd_tpu.models import decoder as D
    from h264bsd_tpu.utils import golden
    from h264bsd_tpu.ops.pallas_deblock import deblock_frame_pallas
    from h264bsd_tpu.ops.pallas_mc import mc_predict_grids
    from h264bsd_tpu.ops.pallas_intra import intra_pass_pallas
    from h264bsd_tpu.ops.transform import residual_planes_sparse
    from h264bsd_tpu.ops.unpack import unpack_blob, unpack_meta

    int(jnp.uint32(1) + jnp.uint32(2))

    data = golden.stream_path(args.stream).read_bytes()

    d = D.Decoder()
    preps = []
    pos = 0
    while pos < len(data):
        status, read = d._fe.decode(data[pos:], 0)
        pos += read
        if status == fe.HDRS_RDY:
            d._geom = d._fe.stream_info()
        elif status == fe.PIC_RDY:
            preps.append(d._prepare())
            while d._fe.next_output() is not None:
                pass
        elif status >= fe.ERROR and read == 0:
            break

    g = preps[0]
    w_mbs, h_mbs = g["w_mbs"], g["h_mbs"]
    n_mbs = w_mbs * h_mbs
    H, W = h_mbs * 16, w_mbs * 16
    dpb = (jnp.zeros((6, H, W), jnp.uint8),
           jnp.zeros((6, H // 2, W // 2), jnp.uint8),
           jnp.zeros((6, H // 2, W // 2), jnp.uint8))

    @partial(jax.jit, static_argnames=("caps",))
    def stage_mc(blob, caps, dpb_y, dpb_cb, dpb_cr, used):
        s = unpack_blob(blob, n_mbs, *caps)
        t = unpack_meta(s[0], s[1], s[4], s[5], s[6], s[7], n_mbs, s[8], sparse_ids=s[2])
        return mc_predict_grids(
            dpb_y, dpb_cb, dpb_cr, t["mv"].astype(jnp.int32),
            t["ref_slot"].astype(jnp.int32),
            s[4].reshape(-1).astype(jnp.int32), used, w_mbs, h_mbs)

    @partial(jax.jit, static_argnames=("caps",))
    def stage_intra(blob, caps, y, cb, cr):
        s = unpack_blob(blob, n_mbs, *caps)
        t = unpack_meta(s[0], s[1], s[4], s[5], s[6], s[7], n_mbs, s[8], sparse_ids=s[2])
        mb_class = t["mb_class"].astype(jnp.int32)
        res_l, res_c = residual_planes_sparse(
            s[2].reshape(-1).astype(jnp.int32), s[3].astype(jnp.int32),
            t["qp_y"].astype(jnp.int32),
            t["chroma_qp_offset"].astype(jnp.int32),
            t["nnz_dc"].astype(jnp.int32), mb_class == 4, n_mbs)
        return intra_pass_pallas(
            y, cb, cr, mb_class, t["i4_modes"].astype(jnp.int32),
            t["i4_avail"].astype(jnp.int32), t["mb_avail"].astype(jnp.int32),
            t["i16_mode"].astype(jnp.int32),
            t["chroma_mode"].astype(jnp.int32), res_l, res_c, w_mbs, h_mbs)

    @partial(jax.jit, static_argnames=("caps",))
    def stage_deblock(blob, caps, y, cb, cr):
        s = unpack_blob(blob, n_mbs, *caps)
        t = unpack_meta(s[0], s[1], s[4], s[5], s[6], s[7], n_mbs, s[8], sparse_ids=s[2])
        return deblock_frame_pallas(
            y, cb, cr, t["mb_class"], t["nnz"], t["mv"], t["ref_slot"],
            t["slice_id"], t["disable_dblk"], t["qp_y"], t["filter_off_a"],
            t["filter_off_b"], t["chroma_qp_offset"], w_mbs, h_mbs)

    def throughput(fn, *a, reps=args.reps):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        rt = time.perf_counter() - t0  # 1 dispatch incl round trip
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best / reps, rt

    idx_p = next(i for i, p in enumerate(preps)
                 if not p["wavefront"] and i > 2)
    for tag, idx in (("I", 0), ("P", idx_p)):
        p = preps[idx]
        blob = jnp.asarray(p["blob"])
        caps = p["caps"]
        used = jnp.asarray(p["used_slots"])
        y0, cb0, cr0 = dpb[0][0], dpb[1][0], dpb[2][0]
        res = {}
        if "mc" in stages:
            res["mc"] = throughput(stage_mc, blob, caps, *dpb, used)
        if "intra" in stages:
            res["intra"] = throughput(stage_intra, blob, caps, y0, cb0, cr0)
        if "deblock" in stages:
            res["deblock"] = throughput(stage_deblock, blob, caps,
                                        y0, cb0, cr0)
        if "full" in stages:
            step_args = (blob, *dpb, jnp.zeros((n_mbs, 16, 16), jnp.uint8),
                         jnp.zeros((n_mbs, 8, 8), jnp.uint8),
                         jnp.zeros((n_mbs, 8, 8), jnp.uint8), jnp.int32(0),
                         jnp.bool_(False), jnp.int32(-1))

            def full():
                return D._decode_step(
                    *step_args, w_mbs, h_mbs, p["caps"], p["wavefront"],
                    jnp.asarray(p["used_slots"]), p["mc_pallas"],
                    p["deblock_pallas"])

            res["full"] = throughput(full)
        print(f"frame {tag}: " + "  ".join(
            f"{k}={v[0]*1e3:.2f}ms(rt {v[1]*1e3:.0f})"
            for k, v in res.items()), flush=True)

    d.close()


if __name__ == "__main__":
    main()
