#!/usr/bin/env python
"""Runnable walkthrough: multi-LoRA serving on the tiny model (CPU).

Three requests share one continuous-batching engine; two select different
LoRA adapters, one runs the base model. The adapters live on device as
``[L, N, K, r]`` stacks and each batch row gathers its own — no weight
swapping, no per-adapter engines (the reference serves exactly one set of
weights; see COVERAGE.md).

  python examples/multi_lora_serving.py
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from microvllm_tpu.config import (CacheConfig, EngineConfig, LoRAConfig,
                                  ModelConfig, SchedulerConfig)
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import SamplingParams

RANK = 4

cfg = EngineConfig(
    model=ModelConfig.tiny(dtype="float32"),
    cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
    scheduler=SchedulerConfig(
        max_batch_size=4, prefill_wait_s=0.0,
        decode_buckets=(1, 2, 4), prefill_len_buckets=(16,),
        prefill_batch_buckets=(1, 2, 4), decode_spans=(1, 4)),
    max_model_len=128,
    lora=LoRAConfig(rank=RANK, max_adapters=4),
)
engine = InferenceEngine(cfg)
m = engine.mcfg


def random_adapter(seed: int) -> dict:
    kg = jax.random.PRNGKey
    L, H = m.num_layers, m.hidden_size
    qkv_out = m.q_dim + 2 * m.kv_dim
    return {
        "qkv_a": jax.random.normal(kg(seed), (L, H, RANK)) * 0.4,
        "qkv_b": jax.random.normal(kg(seed + 1), (L, RANK, qkv_out)) * 0.4,
        "o_a": jax.random.normal(kg(seed + 2), (L, m.q_dim, RANK)) * 0.4,
        "o_b": jax.random.normal(kg(seed + 3), (L, RANK, H)) * 0.4,
    }


slot_a = engine.load_adapter(random_adapter(10))
slot_b = engine.load_adapter(random_adapter(20))
print(f"loaded adapters into slots {slot_a} and {slot_b} "
      f"(slot 0 = base model)\n")

prompt = [7, 3, 9, 4]
sp = SamplingParams(temperature=0.0, max_new_tokens=8)
ids = {
    "base      ": engine.add_request(prompt_token_ids=prompt, sampling=sp),
    f"adapter {slot_a} ": engine.add_request(
        prompt_token_ids=prompt, sampling=sp, adapter_id=slot_a),
    f"adapter {slot_b} ": engine.add_request(
        prompt_token_ids=prompt, sampling=sp, adapter_id=slot_b),
}
while not engine.scheduler.is_finished():
    engine.step()
done = {s.seq_id: s for s in engine.scheduler.pop_finished()}

print(f"greedy continuations of prompt {prompt} (one batched engine):")
outs = {}
for name, sid in ids.items():
    outs[name] = done[sid].output_token_ids
    print(f"  {name}: {outs[name]}")

assert len({tuple(v) for v in outs.values()}) == 3, \
    "each adapter should steer generation differently"
print("\nall three rows decoded in the same batch, each with its own "
      "weights delta — that's multi-LoRA serving.")
