#!/usr/bin/env python
"""Device-time attribution for the decode span via jax.profiler.

Captures an xplane trace of one (compiled) decode span and aggregates the
'XLA Ops' line by op name, so the 7.7 ms device step decomposes into the
actual kernels (pallas custom-calls show up under their kernel names).
Run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (the C++ descriptor
pool rejects tsl's generated xplane_pb2 in this image).

  python tools/profile_decode.py [--model qwen2.5-7b] [--bits 4] [--top 30]
  python tools/profile_decode.py --parse-only /tmp/mvt_trace_r2
"""

from __future__ import annotations

import argparse
import collections
import glob
import re
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def aggregate(trace_dir: str, top: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not xs:
        print("no xplane under", trace_dir, file=sys.stderr)
        return
    xspace = xplane_pb2.XSpace()
    with open(xs[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = collections.Counter()
            calls = collections.Counter()
            total = 0
            for ev in line.events:
                name = meta[ev.metadata_id].name
                # strip fusion numbering so repeats group: "fusion.123" ->
                # "fusion", "custom-call.5" -> its kernel target if present
                base = re.sub(r"[.]\d+$", "", name)
                agg[base] += ev.duration_ps
                calls[base] += 1
                total += ev.duration_ps
            print(f"device total: {total/1e9:.3f} ms over "
                  f"{sum(calls.values())} op executions")
            for name, ps in agg.most_common(top):
                print(f"  {ps/1e9:8.3f} ms  {calls[name]:6d}x  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-7b")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--span", type=int, default=32)
    ap.add_argument("--context", type=int, default=256)
    ap.add_argument("--trace-dir", default="/tmp/mvt_trace_r2")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--parse-only", default=None,
                    help="skip capture; aggregate this trace dir")
    args = ap.parse_args()

    if args.parse_only:
        aggregate(args.parse_only, args.top)
        return

    from bench_step_breakdown import time_span
    from microvllm_tpu.config import PRESETS

    mcfg = PRESETS[args.model]
    ms = time_span(mcfg, args.bits, args.batch, args.span, args.context)
    print(f"span time {ms:.2f} ms (pre-trace)", file=sys.stderr)
    with jax.profiler.trace(args.trace_dir):
        time_span(mcfg, args.bits, args.batch, args.span, args.context)
    aggregate(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
