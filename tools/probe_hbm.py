#!/usr/bin/env python
"""Print HBM usage after building an engine (diagnose ResourceExhausted)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")

ap = argparse.ArgumentParser()
ap.add_argument("--model", default="gemma2-9b")
ap.add_argument("--bits", type=int, default=4)
ap.add_argument("--kv-pages", type=int, default=60)
ap.add_argument("--max-pages-per-seq", type=int, default=12)
args = ap.parse_args()

from bench import build_engine

eng = build_engine(args.model, args.bits, batch=4, kv_pages=args.kv_pages,
                   page_size=64, max_pages_per_seq=args.max_pages_per_seq,
                   span=16)
d = jax.devices()[0]
stats = d.memory_stats() or {}
for k in sorted(stats):
    if "bytes" in k:
        print(f"{k}: {stats[k] / 1e9:.2f} GB")
import numpy as np

for name, leaf in [("embed", eng.params["embed"]),
                   ("k_cache", eng.k_cache)]:
    print(name, leaf.shape, leaf.dtype,
          leaf.size * leaf.dtype.itemsize / 1e9, "GB")
