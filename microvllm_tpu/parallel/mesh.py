"""Device mesh construction.

Replaces the reference's `torch.distributed` process-group setup
(`core/parallel_config.py:14-40`, NCCL/Gloo) with a `jax.sharding.Mesh` over
ICI: the ``model`` axis carries Megatron-style tensor parallelism (the
reference's only strategy, `model_graph.py:97-116`), the ``data`` axis
replicates for data-parallel serving. Multi-host extends the same mesh over
DCN via `jax.distributed.initialize` — no per-step object broadcast control
plane is needed in SPMD (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import ParallelConfig

DATA_AXIS = "data"
SEQ_AXIS = "seq"        # KV page sharding (sequence/context parallelism)
MODEL_AXIS = "model"


def make_mesh(cfg: ParallelConfig,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = cfg.world_size
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    # model (TP) innermost = fastest-varying so its per-layer psums ride
    # adjacent-chip ICI; seq next (one tiny flash-partials psum per step);
    # data outermost (replicas only exchange KV appends)
    grid = np.array(devices[:n]).reshape(cfg.dp_size, cfg.sp_size,
                                         cfg.tp_size)
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1),
                (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))
