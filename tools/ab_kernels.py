"""A/B the packed-roll (new) vs i32-roll (old) Pallas kernels on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/h264tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from functools import partial
    from h264bsd_tpu.frontend import binding as fe
    from h264bsd_tpu.models import decoder as D
    from h264bsd_tpu.utils import golden
    from h264bsd_tpu.ops import pallas_deblock as dbl_new
    from h264bsd_tpu.ops import pallas_deblock_old as dbl_old
    from h264bsd_tpu.ops import pallas_mc as mc_new
    from h264bsd_tpu.ops import pallas_mc_old as mc_old
    from h264bsd_tpu.ops.transform import residual_planes_sparse
    from h264bsd_tpu.ops.unpack import unpack_blob, unpack_meta

    int(jnp.uint32(1) + jnp.uint32(2))

    data = golden.stream_path("1920x1080").read_bytes()
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

    def make_deblock(mod):
        @partial(jax.jit, static_argnames=("caps",))
        def stage(blob, caps, y, cb, cr):
            s = unpack_blob(blob, n_mbs, *caps)
            t = unpack_meta(s[0], s[1], s[4], s[5], s[6], s[7], n_mbs, s[8], sparse_ids=s[2])
            return mod.deblock_frame_pallas(
                y, cb, cr, t["mb_class"], t["nnz"], t["mv"], t["ref_slot"],
                t["slice_id"], t["disable_dblk"], t["qp_y"],
                t["filter_off_a"], t["filter_off_b"], t["chroma_qp_offset"],
                w_mbs, h_mbs)
        return stage

    def make_mc(mod):
        @partial(jax.jit, static_argnames=("caps",))
        def stage(blob, caps, dpb_y, dpb_cb, dpb_cr, used):
            s = unpack_blob(blob, n_mbs, *caps)
            t = unpack_meta(s[0], s[1], s[4], s[5], s[6], s[7], n_mbs, s[8], sparse_ids=s[2])
            return mod.mc_predict_grids(
                dpb_y, dpb_cb, dpb_cr, t["mv"].astype(jnp.int32),
                t["ref_slot"].astype(jnp.int32),
                s[4].reshape(-1).astype(jnp.int32), used, w_mbs, h_mbs)
        return stage

    def throughput(fn, *a, reps=30):
        jax.block_until_ready(fn(*a))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best / reps

    idx_p = next(i for i, p in enumerate(preps)
                 if not p["wavefront"] and i > 2)
    for tag, idx in (("P", idx_p), ("I", 0)):
        p = preps[idx]
        blob = jnp.asarray(p["blob"])
        caps = p["caps"]
        used = jnp.asarray(p["used_slots"])
        y0, cb0, cr0 = dpb[0][0], dpb[1][0], dpb[2][0]
        for name, mod, mk in (("deblock_new", dbl_new, make_deblock),
                              ("deblock_old", dbl_old, make_deblock)):
            t = throughput(mk(mod), blob, caps, y0, cb0, cr0)
            print(f"{tag} {name}: {t*1e3:.2f} ms", flush=True)
        for name, mod in (("mc_new", mc_new), ("mc_old", mc_old)):
            t = throughput(make_mc(mod), blob, caps, *dpb, used)
            print(f"{tag} {name}: {t*1e3:.2f} ms", flush=True)

    d.close()


if __name__ == "__main__":
    main()
