"""Headline benchmark: frames/sec/chip decoding test_1920x1080.h264, bit-exact
vs the reference decoder (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the ratio to the measured scalar-C reference fps on this
machine's CPU (see BASELINE.md; re-measured here for honesty).
"""

import json
import sys
import time


def enable_compile_cache() -> None:
    """Persist jit compilations across bench runs (the decode step's
    Pallas kernels take tens of seconds each to compile through the
    tunneled remote-compile helper; the cache makes the verification
    pass warm on repeat runs)."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/h264tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def measure_reference_fps(stream: str, frames: int) -> float:
    import subprocess
    from h264bsd_tpu.utils.golden import reference_binary, stream_path

    binary = reference_binary()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        subprocess.run([str(binary), str(stream_path(stream))], check=True,
                       capture_output=True)
        best = min(best, time.perf_counter() - t0)
    return frames / best


def warm_up_transfer() -> None:
    """Open the device->host transfer path before any heavy traffic.

    The first D2H read on the tunneled TPU transport takes 1-3 minutes
    (handshake), and grows unboundedly if bulk uploads are queued first.
    Paying it up front, on an empty device, keeps every later read fast.
    """
    import jax.numpy as jnp

    int(jnp.uint32(1) + jnp.uint32(2))


def main() -> None:
    stream = "1920x1080"
    n_frames = 73
    enable_compile_cache()
    warm_up_transfer()
    ref_fps = measure_reference_fps(stream, n_frames)

    try:
        from h264bsd_tpu.models.decoder import benchmark_decode

        fps, bit_exact = benchmark_decode(stream)
        if not bit_exact:
            fps = 0.0
    except Exception as exc:  # decoder not complete yet
        print(f"bench: decode path unavailable: {exc}", file=sys.stderr)
        fps = 0.0

    print(json.dumps({
        "metric": "fps_per_chip_1080p_bitexact",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / ref_fps, 3) if ref_fps else 0.0,
    }))


if __name__ == "__main__":
    main()
