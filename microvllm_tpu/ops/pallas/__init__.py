"""Pallas TPU kernels — the native tier of the engine.

Each kernel has a jnp reference oracle in `microvllm_tpu/ops/` and numerics
tests comparing the two (run in interpret mode on CPU, compiled on TPU).
"""
