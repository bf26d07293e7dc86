#!/usr/bin/env python
"""Multi-host SERVING worker: one process of an N-process SPMD HTTP server.

Used by tests/test_multihost.py::test_two_process_http_serving — process 0
runs the leader HTTP server (+ request fanout), process 1 a follower HTTP
server consuming the replicated stream. The test client talks only to the
leader; the follower's scheduler runs the same sequences in lock-step
(reference anchor: the multi-rank serving loop, `api_server.py:61-90`).

Exits when the file named by MVT_DONE_FILE appears.
"""

import asyncio
import json
import os
import sys
import time

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

from aiohttp import web

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  ParallelConfig, SchedulerConfig)
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.server.api import EngineServer, build_app


async def amain() -> None:
    pid = jax.process_index()
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
    engine = InferenceEngine(cfg)
    fanout_port = int(os.environ["MVT_FANOUT_PORT"])
    http_port = int(os.environ["MVT_HTTP_PORT_BASE"]) + pid
    if pid == 0:
        srv = EngineServer(engine, fanout_port=fanout_port)
        srv.wait_for_followers(jax.process_count() - 1, timeout=120)
    else:
        srv = EngineServer(engine, leader=f"127.0.0.1:{fanout_port}")
    srv.start()
    runner = web.AppRunner(build_app(srv))
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", http_port)
    await site.start()
    print(f"READY {http_port}", flush=True)

    done_file = os.environ["MVT_DONE_FILE"]
    while not os.path.exists(done_file):
        await asyncio.sleep(0.1)
    if pid != 0:
        print("RESULT " + json.dumps(
            {"process": pid,
             "replicated_finished": srv.replicated_finished}), flush=True)
    await runner.cleanup()


if __name__ == "__main__":
    asyncio.run(amain())
