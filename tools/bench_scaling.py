"""Multi-device scaling bench: frames/s at 1/2/4/8 devices for the two
production sharding axes (BASELINE.md "≥80% frames/s scaling 1→N"):

  gop          — GOP segments decoded concurrently across devices
                 (parallel.gop, pipeline-parallel analogue; strong
                 scaling over a fixed 8-GOP stream)
  multistream  — N independent streams through the stream-sharded batched
                 step (parallel.multistream under shard_map)

Runs on the virtual CPU mesh by default (JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count) so the method transfers to real
chips; on a shared-core host the wall clock is a proxy and the scaling
ceiling is min(n_devices, host_cores) — both are recorded in the JSON.

Writes SCALING_r{round}.json at the repo root and prints it.
"""

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()


def bench_gop(data, devices, repeats=2):
    from h264bsd_tpu.parallel.gop import decode_stream_gop_parallel
    best = float("inf")
    n = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        n = sum(1 for _ in decode_stream_gop_parallel(data,
                                                      devices=devices))
        best = min(best, time.perf_counter() - t0)
    return n / best, n


def _rowshard_frames(w_mbs, h_mbs, n_frames):
    from h264bsd_tpu.frontend import binding as fe
    from h264bsd_tpu.ops.reconstruct import build_pcm_tensors
    from h264bsd_tpu.utils.streamgen import make_conformance_stream

    data = make_conformance_stream(width_mbs=w_mbs, height_mbs=h_mbs,
                                   n_frames=n_frames)
    d = fe.FrontendDecoder()
    frames = []
    info = None
    pos = 0
    while pos < len(data):
        status, read = d.decode(data[pos:], 0)
        pos += read
        if status == fe.HDRS_RDY:
            info = d.stream_info()
        elif status == fe.PIC_RDY:
            n_mbs = info["width_mbs"] * info["height_mbs"]
            t = d.tensors(n_mbs)
            mb, blob = d.ipcm()
            t["pcm_y"], t["pcm_cb"], t["pcm_cr"] = build_pcm_tensors(
                n_mbs, mb, blob)
            frames.append((t, int(d.pic_info()["slot"])))
            while d.next_output() is not None:
                pass
        elif status >= fe.ERROR and read == 0:
            break
    d.close()
    return frames


def bench_rowshard(devices, repeats=2, w_mbs=16, h_mbs=8, n_frames=8):
    """MB-row sharding: frames of one crafted stream decoded with the
    halo-pipeline step over n row shards (strong scaling of a single
    stream's frame work; the intra/deblock pipelines serialize stripes,
    so ideal scaling applies only to phase A — measured honestly)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from h264bsd_tpu.parallel.rowshard import make_row_sharded_step

    n_row = len(devices)
    frames = _rowshard_frames(w_mbs, h_mbs, n_frames)
    frames = [({k: jnp.asarray(v) for k, v in t.items()}, s)
              for t, s in frames]
    mesh = Mesh(np.array(devices), ("row",))
    step = make_row_sharded_step(mesh, "row", w_mbs, h_mbs)
    h, w = h_mbs * 16, w_mbs * 16
    n_slots = 2

    def run():
        dpb = (jnp.zeros((n_slots, h, w), jnp.uint8),
               jnp.zeros((n_slots, h // 2, w // 2), jnp.uint8),
               jnp.zeros((n_slots, h // 2, w // 2), jnp.uint8))
        for t, slot in frames:
            dpb = step(t, *dpb, jnp.int32(slot))
        jax.block_until_ready(dpb)

    run()                                  # absorb compiles
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return len(frames) / best, len(frames)


def bench_multistream(streams, mesh, rounds, repeats=2):
    import numpy as np
    from jax.sharding import Mesh

    from h264bsd_tpu.parallel.multistream import MultiStreamDecoder
    best = float("inf")
    n = 0
    for _ in range(repeats):
        ms = MultiStreamDecoder(streams, mesh=mesh)
        t0 = time.perf_counter()
        n = 0
        for _ in range(rounds):
            got = ms.step()
            if not got:
                break
            n += got
        import jax
        jax.block_until_ready(ms.dpb)
        best = min(best, time.perf_counter() - t0)
    return n / best, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--ms-rounds", type=int, default=12)
    ap.add_argument("--gop-copies", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from h264bsd_tpu.utils.golden import stream_path

    devs = jax.devices()
    data = stream_path("640x360").read_bytes()
    gop_data = data * args.gop_copies          # 2 GOPs per copy
    n_streams = max(args.devices)

    out = {"metric": "frames/sec scaling on virtual CPU mesh",
           "host_cores": os.cpu_count(),
           "stream": "640x360",
           "axes": {}}

    for axis, runner in (
            ("gop", lambda n: bench_gop(gop_data, devs[:n])),
            ("multistream", lambda n: bench_multistream(
                [data] * n_streams,
                Mesh(np.array(devs[:n]), ("stream",)), args.ms_rounds)),
            ("rowshard", lambda n: bench_rowshard(devs[:n]))):
        fps = {}
        frames = {}
        for n in args.devices:
            if n > len(devs):
                continue
            f, cnt = runner(n)
            fps[str(n)] = round(f, 2)
            frames[str(n)] = cnt
            print(f"{axis} x{n}: {f:.2f} fps ({cnt} frames)", flush=True)
        base = fps.get("1")
        eff = {k: round(v / (int(k) * base), 3) for k, v in fps.items()} \
            if base else {}
        out["axes"][axis] = {"fps": fps, "frames": frames,
                             "efficiency_vs_1dev": eff}

    out["notes"] = (
        "wall-clock proxy on a shared-core host: every virtual device "
        "competes for the same physical cores, so the scaling ceiling is "
        f"min(n_devices, {os.cpu_count()} cores); efficiency at "
        "n_devices > cores is expected to collapse here but not on real "
        "chips, where each device has its own compute.")

    path = pathlib.Path(__file__).resolve().parent.parent / \
        f"SCALING_r{args.round:02d}.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
