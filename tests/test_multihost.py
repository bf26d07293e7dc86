"""True multi-process SPMD test: 2 CPU processes x 4 virtual devices run the
sharded engine over a shared mesh; outputs must be identical on both hosts
and match a single-process engine (the reference's multi-rank lock-step,
`api_server.py:61-90`, without any control-plane broadcast)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_engine_lockstep():
    env = dict(os.environ)
    env.update({
        "MVT_FORCE_CPU": "1",
        "MVT_LOCAL_DEVICES": "4",
        "MVT_COORDINATOR": "localhost:29711",
        "MVT_NUM_PROCESSES": "2",
        "MVT_TP": "2",
        "MVT_NATIVE_ALLOC": "0",   # keep subprocess deps minimal
    })
    worker = os.path.join(ROOT, "tools", "multihost_worker.py")
    procs = []
    for pid in range(2):
        e = dict(env)
        e["MVT_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=e, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[0][len("RESULT "):]))

    assert results[0]["mesh"] == {"data": 4, "model": 2}
    assert results[0]["outputs"] == results[1]["outputs"]
    assert all(len(o) == 5 for o in results[0]["outputs"])
