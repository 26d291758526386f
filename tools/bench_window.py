"""Compare per-frame dispatch vs scanned-window dispatch on the real TPU.

Times decode_stream end-to-end for H264TPU_WINDOW in {1, 8} (the env var
is read at iteration time inside decode_stream, so it can be flipped
between runs in-process). Prints ms/frame and fps for each.
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

    from h264bsd_tpu.models import decoder as D
    from h264bsd_tpu.utils import golden

    int(jnp.uint32(1) + jnp.uint32(2))  # transfer-path warmup

    data = golden.stream_path("1920x1080").read_bytes()

    for window in (1, 8):
        os.environ["H264TPU_WINDOW"] = str(window)
        # warm pass (absorbs compiles of this window's scan variants)
        t0 = time.perf_counter()
        last = None
        n = 0
        for pic in D.decode_stream(data):
            last = pic
            n += 1
        jax.block_until_ready(last.yuv_planes())
        warm = time.perf_counter() - t0
        print(f"window={window} warm pass: {n} frames in {warm:.2f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = 0
            for pic in D.decode_stream(data):
                last = pic
                n += 1
            jax.block_until_ready(last.yuv_planes())
            best = min(best, time.perf_counter() - t0)
        print(f"window={window}: {n} frames, best {best:.3f}s = "
              f"{n / best:.1f} fps, {1000 * best / n:.2f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
