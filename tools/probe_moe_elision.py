"""Probe: does slot-dedup (DMA elision) help the batched fused-MoE kernel?

Times fused_moe_block at deepseek-v2-lite expert shapes with 48 slots of
(a) all-distinct experts, (b) 8 unique x 6 adjacent, (c) 1 unique x 48.
Finding (RESULTS.md r4): all three take ~1.5 ms — the kernel is per-slot
COMPUTE/latency-bound (short-contraction a8 group dots + per-step
pipeline overhead), not expert-DMA-bound, so routing dedup cannot win;
the lever would be a multi-slot-per-step kernel.
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from microvllm_tpu.ops.quant import quantize
from microvllm_tpu.ops.pallas.fused_moe import fused_moe_block

L, E, K, I, gs = 2, 64, 2048, 1408, 128
kg = jax.random.PRNGKey
gu = quantize(jax.random.normal(kg(1), (K, 2*I), jnp.float32)*0.05, 4, gs)
dn = quantize(jax.random.normal(kg(2), (I, K), jnp.float32)*0.05, 4, gs)
# stack L*E experts by tiling the same quantized tensors (bytes identical)
q_gu = jnp.broadcast_to(gu.q[None], (L*E, *gu.q.shape)).copy()
s_gu = jnp.broadcast_to(gu.scales_tiled[None], (L*E, *gu.scales_tiled.shape)).copy()
q_dn = jnp.broadcast_to(dn.q[None], (L*E, *dn.q.shape)).copy()
s_dn = jnp.broadcast_to(dn.scales_tiled[None], (L*E, *dn.scales_tiled.shape)).copy()
TI = dn.block_k
M, S = 8, 48
attn = jax.random.normal(kg(3), (M, K), jnp.bfloat16)
hid = jax.random.normal(kg(4), (M, K), jnp.bfloat16)
nw = jnp.ones((K,), jnp.float32)
wts = jnp.full((M, S), 0.02, jnp.float32)

def run(idx, tag, iters=30):
    idx = jnp.asarray(idx, jnp.int32)
    f = lambda a: fused_moe_block(a, hid, nw, idx, wts, q_gu, s_gu, q_dn, s_dn,
                                  group_size=gs, bits=4, tile_i=TI, eps=1e-6)
    o = f(attn); np.asarray(o[0, :1])  # warm + sync
    t0 = time.monotonic()
    o = attn
    for _ in range(iters):
        o = f(o)
    np.asarray(o[0, :1])
    dt = (time.monotonic() - t0) / iters * 1e3
    print(f"{tag}: {dt:.3f} ms/call", flush=True)

distinct = list(range(48))                      # 48 distinct experts
dup = sorted(list(range(8)) * 6)                # 8 unique x 6 adjacent
run([e*L+1 for e in distinct], "48 distinct")
run([e*L+1 for e in dup],      "8 unique x6 adjacent")
run([0*L+1]*48,                "1 unique x48")
