"""Capture an xplane trace of warm window-step dispatches at 1080p and
print per-op device-time totals, grouped by fusion/kernel name. This is
the ground truth for where the frame budget goes (single-dispatch wall
timings are floored by the tunnel round trip, ~26 ms)."""

import glob
import os
import sys
import time
from collections import defaultdict

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

    int(jnp.uint32(1) + jnp.uint32(2))
    data = golden.stream_path("1920x1080").read_bytes()
    pin = D.pin_caps_for_stream(data)

    # slot_margin as decode_stream sets it: windows run carry-only
    dec = D.Decoder(caps_pin=pin, slot_margin=16)
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

    # a window of 16 windowable same-caps P frames (the steady state)
    head = next(p for i, p in enumerate(preps)
                if not p["wavefront"] and i > 2)
    win = [p for p in preps
           if p["caps"] == head["caps"] and
           p["wavefront"] == head["wavefront"] and
           p["used_slots"].shape == head["used_slots"].shape and
           p["blob"].nbytes == head["blob"].nbytes and
           p["rowtile"] == head["rowtile"]][:16]
    print(f"{len(win)} frames in traced window", flush=True)

    dec._ensure_dpb()
    dec._submit_window(win)          # warm compile
    jax.block_until_ready(dec._dpb)

    trace_dir = "/tmp/h264tpu_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    dec._submit_window(win)
    jax.block_until_ready(dec._dpb)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced window wall: {wall*1e3:.1f} ms "
          f"({wall/len(win)*1e3:.2f} ms/frame)", flush=True)

    # ---- parse the xplane proto ----
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ImportError:   # tensorflow >= 2.21 moved the proto under tsl
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("trace files:", files, flush=True)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for f in files:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(f, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            print("plane:", plane.name, flush=True)
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    tot[name] += ev.duration_ps / 1e9   # ms
                    cnt[name] += 1
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    print(f"{'total_ms':>9} {'n':>5}  op")
    for name, ms in items[:45]:
        print(f"{ms:9.3f} {cnt[name]:5d}  {name[:110]}")
    print(f"sum of tracked ops: {sum(tot.values()):.1f} ms "
          f"(includes overlapping lines; see per-line breakdown above)")


if __name__ == "__main__":
    main()
