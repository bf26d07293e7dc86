"""bench.py must never crash: the driver runs it no-arg at round end."""

import json
import subprocess
import sys
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_tiny_cpu():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["MVT_NATIVE_ALLOC"] = "1"
    out = subprocess.run(
        [sys.executable, "bench.py", "--model", "tiny", "--bits", "16",
         "--batch", "2", "--steps", "4", "--context", "16",
         "--page-size", "16", "--kv-pages", "64", "--max-pages-per-seq", "8",
         "--span", "4", "--platform", "cpu"],  # env var is not enough: the
        # axon sitecustomize shim initializes its backend regardless, and a
        # wedged tunnel then hangs jax.devices(); --platform cpu uses
        # jax.config.update, which actually wins
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(data)
    assert data["value"] > 0


def test_auto_page_size_rule():
    from microvllm_tpu.config import auto_page_size
    assert auto_page_size(256) == 64
    assert auto_page_size(2048) == 64
    assert auto_page_size(3800) == 128
    assert auto_page_size(8192) == 128
