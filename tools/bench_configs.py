#!/usr/bin/env python3
"""Benchmark every BASELINE.json config on the attached chip.

The driver-facing headline metric stays in bench.py (one JSON line);
this tool reports the full config matrix:

  1. test_640x360.h264 full decode loop, bit-exact
  2. test_1920x1080.h264 + fullRange, bit-exact (the bench.py metric)
  3. intra-only all-I 720p stream (crafted, utils/streamgen) — stresses
     the CAVLC front-end and the device intra wavefront
  4. GOP-sharded decode of a long IPPP stream (single-host stand-in:
     GOP workers round-robin on the local device set)
  5. batched multi-stream decode, N concurrent 640x360 streams

Usage: python tools/bench_configs.py [--streams N]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import jax
import numpy as np


def _fps(fn, repeats=3):
    best = float("inf")
    n = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        n = fn()
        best = min(best, time.perf_counter() - t0)
    return n / best


def config_single(name):
    from h264bsd_tpu.models.decoder import benchmark_decode
    fps, exact = benchmark_decode(name)
    return {"config": f"single-stream {name}", "fps": round(fps, 2),
            "bit_exact": exact}


def config_intra_720p(n_frames=6):
    # n_frames is modest because the pure-Python bitstream generator is
    # the slow part (~1.7 Mbit of BitWriter appends per 720p all-I frame)
    from h264bsd_tpu.models.decoder import decode_stream
    from h264bsd_tpu.utils import golden
    from h264bsd_tpu.utils.streamgen import make_intra_stress_stream
    data = make_intra_stress_stream(width_mbs=80, height_mbs=45,
                                    n_frames=n_frames)

    def run():
        last = None
        n = 0
        for pic in decode_stream(data):
            last, n = pic, n + 1
        jax.block_until_ready(last.yuv_planes())
        return n

    fps = _fps(run)
    # verify once against the reference binary
    tmp = pathlib.Path("/tmp/bench_intra720.h264")
    out = pathlib.Path("/tmp/bench_intra720.yuv")
    tmp.write_bytes(data)
    out.unlink(missing_ok=True)
    subprocess.run([str(golden.reference_binary()), "-o", str(out),
                    str(tmp)], check=True, capture_output=True, timeout=300)
    ref = out.read_bytes()
    ours = b"".join(np.asarray(pl).tobytes() for p in decode_stream(data)
                    for pl in p.yuv_planes())
    return {"config": f"intra-only 720p all-I x{n_frames}",
            "fps": round(fps, 2), "bit_exact": ours == ref}


def config_gop(n_repeats=4):
    from h264bsd_tpu.parallel.gop import decode_stream_gop_parallel
    from h264bsd_tpu.utils.golden import stream_path
    # long IPPP stream stand-in: the 640x360 clip repeated (IDR keyint=40
    # gives several closed GOPs per copy)
    data = stream_path("640x360").read_bytes() * n_repeats

    def run():
        last = None
        n = 0
        for pic in decode_stream_gop_parallel(data):
            last, n = pic, n + 1
        jax.block_until_ready(last.yuv_planes())
        return n

    return {"config": f"GOP-sharded long IPPP ({n_repeats}x clip)",
            "fps": round(_fps(run, repeats=2), 2)}


def config_multistream(n_streams):
    from h264bsd_tpu.parallel.multistream import MultiStreamDecoder
    from h264bsd_tpu.utils.golden import stream_path
    data = stream_path("640x360").read_bytes()

    def run():
        ms = MultiStreamDecoder([data] * n_streams)
        counts = ms.run()
        jax.block_until_ready(ms.dpb)
        return sum(counts)

    return {"config": f"multi-stream x{n_streams} 640x360",
            "aggregate_fps": round(_fps(run), 2)}


CONFIGS = {
    "640x360": lambda a: config_single("640x360"),
    "1080p": lambda a: config_single("1920x1080"),
    "1080p_fullRange": lambda a: config_single("1920x1080_fullRange"),
    "intra720p": lambda a: config_intra_720p(),
    "gop": lambda a: config_gop(),
    "multistream": lambda a: config_multistream(a.streams),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8,
                    help="stream count for the multi-stream config")
    ap.add_argument("--only", choices=sorted(CONFIGS),
                    help="run one config in-process (used by the default "
                         "mode, which forks a fresh interpreter per config "
                         "— tunneled-TPU throughput degrades measurably "
                         "over a long-lived process)")
    ap.add_argument("--out", type=pathlib.Path,
                    help="also append each result line to this file "
                         "(survives an interrupted matrix run)")
    args = ap.parse_args()

    def emit(obj):
        line = json.dumps(obj)
        print(line, flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")

    if args.only:
        emit(CONFIGS[args.only](args))
        return
    for name in CONFIGS:
        r = subprocess.run(
            [sys.executable, __file__, "--only", name,
             "--streams", str(args.streams)],
            capture_output=True, text=True, timeout=3600)
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        emit(json.loads(out[-1]) if out else
             {"config": name, "error": (r.stderr or "no output")[-300:]})


if __name__ == "__main__":
    main()
