"""microvllm_tpu — a TPU-native LLM inference engine (JAX/XLA/Pallas).

Brand-new implementation of the capability set of benyuereal/micro-vllm
(see SURVEY.md): paged KV cache, continuous batching, fused kernels,
tensor parallelism, streaming serving — designed TPU-first.
"""

from .config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    PRESETS,
    QuantConfig,
    SchedulerConfig,
)

__version__ = "0.1.0"

__all__ = [
    "CacheConfig",
    "EngineConfig",
    "ModelConfig",
    "ParallelConfig",
    "PRESETS",
    "QuantConfig",
    "SchedulerConfig",
]
