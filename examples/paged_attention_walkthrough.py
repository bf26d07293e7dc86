#!/usr/bin/env python
"""Educational walkthrough: how paged attention addresses the KV cache.

The TPU-flavored analog of the reference's standalone teaching scripts
(`math/softmax.py` etc.): runs on CPU, prints each step of the block-table
indirection and verifies paged attention equals dense attention.

  python examples/paged_attention_walkthrough.py
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from microvllm_tpu.ops.attention import (append_kv, paged_decode_attention_ref,
                                         slot_coords)

PAGE_SIZE, NUM_PAGES, KV_HEADS, HEAD_DIM = 4, 8, 1, 8

print("=== Paged KV cache walkthrough ===\n")
print(f"cache: {NUM_PAGES} pages x {PAGE_SIZE} slots "
      f"(page 0 is the reserved trash page)\n")

k_pages = jnp.zeros((NUM_PAGES, KV_HEADS, PAGE_SIZE, HEAD_DIM))
v_pages = jnp.zeros((NUM_PAGES, KV_HEADS, PAGE_SIZE, HEAD_DIM))

# A sequence of 10 tokens needs ceil(10/4) = 3 pages; the allocator hands
# out pages 2, 5, 1 (deliberately non-contiguous — that's the point).
block_table = jnp.array([[2, 5, 1, 0]], dtype=jnp.int32)
seq_len = 10
print(f"sequence of {seq_len} tokens -> block table {block_table[0].tolist()}")

key = jax.random.PRNGKey(0)
k = jax.random.normal(key, (seq_len, KV_HEADS, HEAD_DIM))
v = jax.random.normal(jax.random.PRNGKey(1), (seq_len, KV_HEADS, HEAD_DIM))

positions = jnp.arange(seq_len, dtype=jnp.int32)
pages, offsets = slot_coords(block_table.repeat(seq_len, 0), positions,
                             PAGE_SIZE)
print("\ntoken -> (page, slot) mapping:")
for t in range(seq_len):
    print(f"  token {t}: page {int(pages[t])}, slot {int(offsets[t])}")

k_pages, v_pages = append_kv(k_pages, v_pages, k, v, pages, offsets)

q = jax.random.normal(jax.random.PRNGKey(2), (1, KV_HEADS, HEAD_DIM))
out = paged_decode_attention_ref(q, k_pages, v_pages, block_table,
                                 jnp.array([seq_len]), HEAD_DIM ** -0.5)

# dense oracle
scores = (q[0, 0] @ k[:, 0].T) * HEAD_DIM ** -0.5
probs = jax.nn.softmax(scores)
dense = probs @ v[:, 0]
print(f"\npaged vs dense attention max diff: "
      f"{float(jnp.abs(out[0, 0] - dense).max()):.2e}")
print("\nKey idea: attention never sees the fragmentation — the block table"
      "\nis the only indirection, and on TPU the Pallas kernel DMAs each"
      "\npage HBM->VMEM exactly once while accumulating online softmax.")
