"""Sweep deblock wavefront-kernel knobs (H264TPU_DEBLOCK_G/GC) on a real
1080p P frame. Times a 16x chained in-jit application (lax.scan over the
same maps) so the ~25 ms tunnel dispatch floor amortizes away; prints
ms/frame per setting. Run one setting per process:

    for gc in 4 8 16 32; do H264TPU_DEBLOCK_GC=$gc python tools/sweep_deblock.py; done
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
    from h264bsd_tpu.ops import pallas_deblock_wf as wf
    from h264bsd_tpu.ops.unpack import unpack_blob, unpack_meta
    from h264bsd_tpu.utils import golden

    int(jnp.uint32(1) + jnp.uint32(2))
    data = golden.stream_path("1920x1080").read_bytes()
    pin = D.pin_caps_for_stream(data)
    dec = D.Decoder(caps_pin=pin)
    preps = []
    pos = 0
    while pos < len(data) and len(preps) < 8:
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
    p = next(p for i, p in enumerate(preps) if not p["wavefront"] and i > 2)
    w_mbs, h_mbs = p["w_mbs"], p["h_mbs"]
    n_mbs = w_mbs * h_mbs
    H, W = h_mbs * 16, w_mbs * 16
    caps = p["caps"]
    blob = jnp.asarray(p["blob"].view(np.uint32))

    K = 16

    @jax.jit
    def chained(blob, y, cb, cr):
        s = unpack_blob(blob, n_mbs, *caps)
        t = unpack_meta(s[0], s[1], s[4], s[5], s[6], s[7], n_mbs, s[8],
                        sparse_ids=s[2])

        def body(carry, _):
            y, cb, cr = carry
            y, cb, cr = wf.deblock_frame_wavefront(
                y, cb, cr, t["mb_class"], t["nnz"], t["mv"],
                t["ref_slot"], t["slice_id"], t["disable_dblk"],
                t["qp_y"], t["filter_off_a"], t["filter_off_b"],
                t["chroma_qp_offset"], w_mbs, h_mbs)
            return (y, cb, cr), None

        (y, cb, cr), _ = jax.lax.scan(body, (y, cb, cr), None, length=K)
        return y, cb, cr

    y = jnp.zeros((H, W), jnp.uint8)
    cb = jnp.zeros((H // 2, W // 2), jnp.uint8)
    cr = jnp.zeros((H // 2, W // 2), jnp.uint8)
    out = chained(blob, y, cb, cr)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(blob, y, cb, cr))
        best = min(best, time.perf_counter() - t0)
    print(f"G={wf.G} GC={wf.GC} SKIP={os.environ.get('H264TPU_DEBLOCK_SKIP','1')}"
          f"  {best / K * 1e3:.3f} ms/frame (chained x{K}, best of 8)",
          flush=True)


if __name__ == "__main__":
    main()
