"""Per-stage wall-time breakdown of the 1080p decode pipeline on the
current backend. Run on the TPU to find the frame-time bottleneck.

Stages measured independently (each pre-warmed):
  parse      - C++ front-end decode of every NAL (no device work)
  prepare    - host half of a frame (blob assembly + tier pick)
  transfer   - jnp.asarray(blob) + block_until_ready
  step       - full _decode_step dispatch (unpack..deblock..store)
  e2e        - decode_stream end to end (the bench path)
Plus a device-stage breakdown of one representative P frame and one I
frame via separately jitted sub-stages.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", default="1920x1080")
    ap.add_argument("--frames", type=int, default=73)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/h264tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from h264bsd_tpu.frontend import binding as fe
    from h264bsd_tpu.models import decoder as D
    from h264bsd_tpu.utils import golden

    # transfer-path warmup (see bench.py)
    int(jnp.uint32(1) + jnp.uint32(2))

    data = golden.stream_path(args.stream).read_bytes()

    # ---- parse-only ----
    def parse_only():
        d = fe.FrontendDecoder(False)
        pos = 0
        t0 = time.perf_counter()
        while pos < len(data):
            status, read = d.decode(data[pos:], 0)
            pos += read
            if status == fe.PIC_RDY:
                while d.next_output() is not None:
                    pass
            elif status >= fe.ERROR and read == 0:
                break
        dt = time.perf_counter() - t0
        d.close()
        return dt

    print("profiling: parse...", flush=True)
    parse_only()
    t_parse = min(parse_only() for _ in range(2))

    # ---- parse + prepare (blob build) ----
    def parse_prepare():
        d = D.Decoder()
        preps = []
        pos = 0
        t0 = time.perf_counter()
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
        dt = time.perf_counter() - t0
        d.close()
        return dt, preps

    print(f"parse_only {t_parse*1e3:.1f} ms", flush=True)
    parse_prepare()
    t_prep, preps = min(
        (parse_prepare() for _ in range(2)), key=lambda x: x[0])
    n_frames = len(preps)
    blob_bytes = sum(p["blob"].nbytes for p in preps)

    # ---- transfer-only (all blobs, sequential H2D) ----
    def transfer_only():
        t0 = time.perf_counter()
        last = None
        for p in preps:
            last = jnp.asarray(p["blob"])
        jax.block_until_ready(last)
        return time.perf_counter() - t0

    print(f"parse+prepare {t_prep*1e3:.1f} ms", flush=True)
    transfer_only()
    t_xfer = min(transfer_only() for _ in range(2))

    # ---- full pipeline, counting dispatch stalls ----
    def run_steps():
        d = D.Decoder()
        d._geom = preps[0]["info"] and None
        # rebuild geometry/DPB off the first prep
        dd = fe.FrontendDecoder(False)
        pos = 0
        while pos < len(data):
            status, read = dd.decode(data[pos:], 0)
            pos += read
            if status == fe.HDRS_RDY:
                break
        d._fe, old = dd, d._fe
        d._geom = dd.stream_info()
        old.close()
        d._ensure_dpb()
        t0 = time.perf_counter()
        for p in preps:
            d._submit(p)
        jax.block_until_ready(d._dpb)
        dt = time.perf_counter() - t0
        dd.close()
        return dt

    print(f"transfer {t_xfer*1e3:.1f} ms", flush=True)
    run_steps()
    t_steps = min(run_steps() for _ in range(2))

    # ---- e2e (bench path) ----
    def e2e():
        t0 = time.perf_counter()
        last = None
        for pic in D.decode_stream(data):
            last = pic
        jax.block_until_ready(last.yuv_planes())
        return time.perf_counter() - t0

    print(f"steps {t_steps*1e3:.1f} ms", flush=True)
    e2e()
    t_e2e = min(e2e() for _ in range(2))

    # ---- device sub-stage breakdown on representative frames ----
    from functools import partial

    from h264bsd_tpu.ops.deblock import boundary_strengths, edge_thresholds
    from h264bsd_tpu.ops.pallas_deblock import deblock_frame_pallas
    from h264bsd_tpu.ops.unpack import unpack_blob, unpack_meta
    from h264bsd_tpu.ops.transform import residual_planes_sparse
    from h264bsd_tpu.ops.pallas_mc import mc_predict_grids
    from h264bsd_tpu.ops.pallas_intra import intra_pass_pallas
    from h264bsd_tpu.ops.reconstruct import mb_grid_to_plane

    g_info = preps[0]
    w_mbs, h_mbs = g_info["w_mbs"], g_info["h_mbs"]
    n_mbs = w_mbs * h_mbs
    H, W = h_mbs * 16, w_mbs * 16
    dpb_slots = 6
    dpb = (jnp.zeros((dpb_slots, H, W), jnp.uint8),
           jnp.zeros((dpb_slots, H // 2, W // 2), jnp.uint8),
           jnp.zeros((dpb_slots, H // 2, W // 2), jnp.uint8))

    @partial(jax.jit, static_argnames=("caps",))
    def stage_unpack(blob, caps):
        s = unpack_blob(blob, n_mbs, *caps)
        t = unpack_meta(s[0], s[1], s[4], s[5], s[6], s[7], n_mbs, s[8], sparse_ids=s[2])
        return s, t

    @partial(jax.jit, static_argnames=("caps",))
    def stage_residual(blob, caps):
        s = unpack_blob(blob, n_mbs, *caps)
        t = unpack_meta(s[0], s[1], s[4], s[5], s[6], s[7], n_mbs, s[8], sparse_ids=s[2])
        mb_class = t["mb_class"].astype(jnp.int32)
        return residual_planes_sparse(
            s[2].reshape(-1).astype(jnp.int32), s[3].astype(jnp.int32),
            t["qp_y"].astype(jnp.int32),
            t["chroma_qp_offset"].astype(jnp.int32),
            t["nnz_dc"].astype(jnp.int32), mb_class == 4, n_mbs)

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

    @partial(jax.jit, static_argnames=("caps",))
    def stage_bs_only(blob, caps):
        s = unpack_blob(blob, n_mbs, *caps)
        t = unpack_meta(s[0], s[1], s[4], s[5], s[6], s[7], n_mbs, s[8], sparse_ids=s[2])
        bl, bt = boundary_strengths(
            t["mb_class"].astype(jnp.int32), t["nnz"].astype(jnp.int32),
            t["mv"].astype(jnp.int32), t["ref_slot"].astype(jnp.int32),
            t["slice_id"].astype(jnp.int32),
            t["disable_dblk"].astype(jnp.int32), w_mbs, h_mbs)
        la, lb, lt = edge_thresholds(
            t["qp_y"], t["slice_id"], t["filter_off_a"], t["filter_off_b"],
            t["chroma_qp_offset"], w_mbs, h_mbs, chroma=False)
        return bl, bt, la, lb, lt

    def time_stage(fn, *a, reps=3):
        out = fn(*a)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    # pick representative frames: first (I) and a middle P
    idx_i = 0
    idx_p = next(i for i, p in enumerate(preps)
                 if not p["wavefront"] and i > 2)
    rep = {}
    for tag, idx in (("I", idx_i), ("P", idx_p)):
        p = preps[idx]
        blob = jnp.asarray(p["blob"])
        caps = p["caps"]
        used = jnp.asarray(p["used_slots"])
        y0 = dpb[0][0]
        cb0, cr0 = dpb[1][0], dpb[2][0]
        rep[tag] = {
            "unpack": time_stage(stage_unpack, blob, caps),
            "residual": time_stage(stage_residual, blob, caps),
            "mc": time_stage(stage_mc, blob, caps, *dpb, used),
            "intra": time_stage(stage_intra, blob, caps, y0, cb0, cr0),
            "bs_only": time_stage(stage_bs_only, blob, caps),
            "deblock": time_stage(stage_deblock, blob, caps, y0, cb0, cr0),
        }
        # full step dispatch for this frame
        step_args = (blob, *dpb, jnp.zeros((n_mbs, 16, 16), jnp.uint8),
                     jnp.zeros((n_mbs, 8, 8), jnp.uint8),
                     jnp.zeros((n_mbs, 8, 8), jnp.uint8), jnp.int32(0),
                     jnp.bool_(False), jnp.int32(-1))

        def full(blob=blob, p=p, step_args=step_args):
            return D._decode_step(
                *step_args, w_mbs, h_mbs, p["caps"], p["wavefront"],
                jnp.asarray(p["used_slots"]), p["mc_pallas"],
                p["deblock_pallas"])

        rep[tag]["full_step"] = time_stage(full)
        print(f"frame {tag}: " + " ".join(f"{k}={v*1e3:.2f}ms" for k, v in rep[tag].items()), flush=True)

    print(f"frames={n_frames} blob_total={blob_bytes/1e6:.1f} MB "
          f"({blob_bytes/n_frames/1e3:.0f} KB/frame)")
    print(f"parse_only      {t_parse*1e3:8.1f} ms  "
          f"({t_parse/n_frames*1e3:6.2f} ms/frame)")
    print(f"parse+prepare   {t_prep*1e3:8.1f} ms  "
          f"({t_prep/n_frames*1e3:6.2f} ms/frame)")
    print(f"transfer(all)   {t_xfer*1e3:8.1f} ms  "
          f"({t_xfer/n_frames*1e3:6.2f} ms/frame)")
    print(f"steps(serial)   {t_steps*1e3:8.1f} ms  "
          f"({t_steps/n_frames*1e3:6.2f} ms/frame)")
    print(f"e2e pipelined   {t_e2e*1e3:8.1f} ms  "
          f"({t_e2e/n_frames*1e3:6.2f} ms/frame, "
          f"{n_frames/t_e2e:.1f} fps)")
    for tag in ("I", "P"):
        print(f"-- frame {tag} device sub-stages (independent, "
              f"each includes unpack):")
        for k, v in rep[tag].items():
            print(f"   {k:10s} {v*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
