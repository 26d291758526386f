"""Join the latest xplane Chrome trace with the compiled HLO's metadata:
prints device time per SOURCE LINE, so the diffuse XLA-fusion tail
(~hundreds of sub-0.1 ms ops) becomes attributable. Run after
tools/trace_window.py."""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/h264tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from h264bsd_tpu.models import decoder as D
    from h264bsd_tpu.utils import golden

    data = golden.stream_path("1920x1080").read_bytes()
    pin = D.pin_caps_for_stream(data)
    caps, tot = pin[False][0]
    n_mbs, w_mbs, h_mbs, H, W = 8160, 120, 68, 1088, 1920
    K = 16
    # the PRODUCTION steady-state config: rowtile layouts + carry-only
    # scan (slot margin >= K), matching what decode_stream dispatches
    n_slots = 5 + 16
    lowered = D._decode_window_step.lower(
        jnp.zeros((K, tot), jnp.uint32),
        jnp.zeros((n_slots, H, W), jnp.uint8),
        jnp.zeros((n_slots, H // 2, W // 2), jnp.uint8),
        jnp.zeros((n_slots, H // 2, W // 2), jnp.uint8),
        jnp.zeros((n_mbs // 8, 16, 128), jnp.uint8),
        jnp.zeros((n_mbs // 8, 8, 64), jnp.uint8),
        jnp.zeros((n_mbs // 8, 8, 64), jnp.uint8),
        jnp.zeros((K,), jnp.int32), jnp.zeros((K,), bool),
        jnp.full((K,), -1, jnp.int32), w_mbs, h_mbs, caps, False,
        jnp.zeros((K, 4), jnp.int32), True, True, True, False)
    txt = lowered.compile().as_text()

    # op name -> (source_file:line, op_name path tail)
    srcmap = {}
    for m in re.finditer(
            r'%?([\w.-]+\.\d+) = [^\n]*?metadata={op_name="([^"]*)"'
            r'(?: source_file="([^"]*)" source_line=(\d+))?', txt):
        name, op, f, ln = m.groups()
        tail = "/".join(op.split("/")[-2:])
        src = f"{(f or '?').split('/')[-1]}:{ln or '?'}"
        srcmap[name] = (src, tail)

    fs = sorted(glob.glob(
        "/tmp/h264tpu_trace/plugins/profile/*/vm.trace.json.gz"),
        key=os.path.getmtime)
    d = json.load(gzip.open(fs[-1]))
    evs = d["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in evs
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    by_src = defaultdict(float)
    unattr = defaultdict(float)
    total = 0.0
    for e in evs:
        if e.get("ph") == "X" and "dur" in e and \
                "TPU" in pids.get(e["pid"], "") and \
                tids.get((e["pid"], e["tid"])) == "XLA Ops":
            name = e["name"]
            if name.startswith("while") or name.startswith("closed_call") \
                    or "reconstruct_frame_fast" in name:
                continue   # containers / custom calls, listed separately
            ms = e["dur"] / 1e3
            total += ms
            if name in srcmap:
                src, tail = srcmap[name]
                by_src[f"{src:40s} {tail[:50]}"] += ms
            else:
                unattr[name.split(".")[0]] += ms
    print(f"attributed fusion/glue total: {total:.1f} ms "
          f"({total/16:.2f} ms/frame over 16 frames)")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:8.2f}  {k}")
    print("-- unattributed by op kind --")
    for k, v in sorted(unattr.items(), key=lambda kv: -kv[1])[:10]:
        print(f"{v:8.2f}  {k}")


if __name__ == "__main__":
    main()
