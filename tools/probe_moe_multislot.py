"""Probe: multi-slot fused-MoE kernel — per-step latency amortization.

The r4 elision probe proved batched MoE is per-grid-step latency-bound
(~31 us/slot at deepseek shapes even with ALL weight DMA elided, vs a
~6 us tile-math floor). This times fused_moe_block with S slots packed
per grid step (S = 1/2/4/8) at deepseek-v2-lite and OLMoE expert shapes,
48/64 sorted slots (the b8 decode layout).

Usage: python tools/probe_moe_multislot.py [deepseek|olmoe]
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from microvllm_tpu.ops.quant import quantize
from microvllm_tpu.ops.pallas.fused_moe import fused_moe_block

which = sys.argv[1] if len(sys.argv) > 1 else "deepseek"  # noqa
BITS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
if which == "deepseek":
    L, E, K, I, gs, n_slots = 2, 64, 2048, 1408, 128, 48   # b8 x top-6
else:
    L, E, K, I, gs, n_slots = 2, 64, 2048, 1024, 128, 64   # b8 x top-8
kg = jax.random.PRNGKey
gu = quantize(jax.random.normal(kg(1), (K, 2*I), jnp.float32)*0.05, BITS, gs)
dn = quantize(jax.random.normal(kg(2), (I, K), jnp.float32)*0.05, BITS, gs)
q_gu = jnp.broadcast_to(gu.q[None], (L*E, *gu.q.shape)).copy()
s_gu = jnp.broadcast_to(gu.scales_tiled[None],
                        (L*E, *gu.scales_tiled.shape)).copy()
q_dn = jnp.broadcast_to(dn.q[None], (L*E, *dn.q.shape)).copy()
s_dn = jnp.broadcast_to(dn.scales_tiled[None],
                        (L*E, *dn.scales_tiled.shape)).copy()
TI = dn.block_k
M = 8
attn = jax.random.normal(kg(3), (M, K), jnp.bfloat16)
hid = jax.random.normal(kg(4), (M, K), jnp.bfloat16)
nw = jnp.ones((K,), jnp.float32)

# sorted slots: ~union-of-35-experts pattern (distinct ids, realistic)
ids = sorted(np.random.default_rng(0).integers(0, E, n_slots).tolist())
base_idx = [e * L + 1 for e in ids]


def run(S, iters=30, ids=None, tag=""):
    ns = n_slots + ((-n_slots) % S)
    bi = ([e * L + 1 for e in ids] if ids is not None else base_idx)
    idx = jnp.asarray(bi + [bi[-1]] * (ns - n_slots), jnp.int32)
    wts = jnp.concatenate(
        [jnp.full((M, n_slots), 0.02, jnp.float32),
         jnp.zeros((M, ns - n_slots), jnp.float32)], axis=1)
    f = lambda a: fused_moe_block(
        a, hid, nw, idx, wts, q_gu, s_gu, q_dn, s_dn, group_size=gs,
        bits=BITS, tile_i=TI, eps=1e-6, slots_per_step=S)
    o = f(attn); np.asarray(o[0, :1])  # warm + sync
    t0 = time.monotonic()
    o = attn
    for _ in range(iters):
        o = f(o)
    np.asarray(o[0, :1])
    dt = (time.monotonic() - t0) / iters * 1e3
    print(f"{which} int{BITS} S={S}{tag}: {dt:.3f} ms/call "
          f"({dt*1e3/n_slots:.1f} us/slot)", flush=True)


if len(sys.argv) > 3 and sys.argv[3] == "dup":
    # bottleneck split: all-duplicate ids elide every weight DMA after the
    # first slot (same-block-index pipeline reuse) but still run every
    # slot's unpack + dots; all-unique ids pay full DMA. dup ~= unique
    # -> per-slot COMPUTE (unpack + short-M dot issues) is the floor.
    run(1, ids=[ids[0]] * n_slots, tag=" all-dup")
    run(1, ids=sorted(range(n_slots)), tag=" all-unique")
else:
    for S in (1,):
        run(S)
