#!/usr/bin/env python
"""Multi-host engine smoke worker: one process of an N-process SPMD engine.

Used by tests/test_multihost.py (2 CPU processes x 4 virtual devices) and as
the template for real multi-host TPU deployment:

  MVT_COORDINATOR=host0:1234 MVT_NUM_PROCESSES=2 MVT_PROCESS_ID=i \
      python tools/multihost_worker.py

Every process runs the identical engine loop over the identical request
stream (here hardcoded; in serving, via parallel.distributed.RequestFanout),
so schedules match and the only cross-host traffic is the jit'd collectives.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

devices_per_proc = int(os.environ.get("MVT_LOCAL_DEVICES", "4"))
if os.environ.get("MVT_FORCE_CPU", "0") == "1":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={devices_per_proc}")

import jax

if os.environ.get("MVT_FORCE_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

from microvllm_tpu.parallel.distributed import init_distributed

init_distributed()

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  ParallelConfig, SchedulerConfig)
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import SamplingParams


def main() -> None:
    tp = int(os.environ.get("MVT_TP", "2"))
    dp = jax.device_count() // tp
    cfg = EngineConfig(
        model=ModelConfig.tiny(num_heads=8, num_kv_heads=4, head_dim=32,
                               hidden_size=128, intermediate_size=256),
        cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=dp * 2, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(dp, dp * 2), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(dp, dp * 2), decode_spans=(1, 4)),
        max_model_len=128,
        parallel=ParallelConfig(tp_size=tp, dp_size=dp),
    )
    eng = InferenceEngine(cfg)

    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6], [11, 12, 13],
               [2, 4, 6], [3, 5, 7], [10, 20], [30, 31, 32]]
    seqs = eng.generate(prompts,
                        sampling=SamplingParams(temperature=0.0,
                                                max_new_tokens=5))
    out = {"process": jax.process_index(),
           "mesh": dict(eng._mesh.shape),
           "outputs": [s.output_token_ids for s in seqs]}
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
