#!/usr/bin/env python
"""TPU smoke for the penalized decode span: compile + generate on the
0.5B preset with enable_penalties, assert the huge-frequency-penalty
output is all-distinct and the unpenalized one on the same engine is not
affected (engine accepts both through one compiled variant)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microvllm_tpu.config import (CacheConfig, EngineConfig, PRESETS,
                                  SchedulerConfig)
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import SamplingParams

cfg = EngineConfig(
    model=PRESETS["qwen2.5-0.5b"],
    cache=CacheConfig(num_pages=128, page_size=64, max_pages_per_seq=8),
    scheduler=SchedulerConfig(
        max_batch_size=4, decode_buckets=(4,), prefill_len_buckets=(128,),
        prefill_batch_buckets=(4,), prefill_wait_s=0.0, decode_spans=(8,)),
    max_model_len=512, enable_penalties=True)
eng = InferenceEngine(cfg)
print("engine built", file=sys.stderr)

prompts = [[5, 9, 2, 77]]
pen = eng.generate(prompts, sampling=SamplingParams(
    temperature=0.0, max_new_tokens=24, ignore_eos=True,
    frequency_penalty=2.0, presence_penalty=2.0))[0].output_token_ids
base = eng.generate(prompts, sampling=SamplingParams(
    temperature=0.0, max_new_tokens=24, ignore_eos=True))[0].output_token_ids
print("penalized distinct:", len(set(pen)) == len(pen), len(set(pen)), "/",
      len(pen))
print("baseline degenerate:", len(set(base)) < len(base))
assert len(set(pen)) == len(pen)
print("OK")
