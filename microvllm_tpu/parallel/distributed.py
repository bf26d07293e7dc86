"""Multi-host bootstrap + host↔global array plumbing.

Replaces the reference's per-step pickled `broadcast_object_list` control
plane (`core/inference_context.py:25-77`) with the SPMD model: every host
runs the same engine loop over the same request stream, so schedules are
identical by construction; only the jit'd steps touch the network (ICI/DCN
collectives inserted by shard_map).

Topology: `ParallelConfig(tp_size, dp_size)` over all processes' devices —
lay TP over ICI (within a host's slice) and DP over DCN (across hosts) by
keeping tp_size <= devices-per-host.

Request replication across hosts (so all schedulers see the same stream) is
the deployment's job: point every host's `RequestReplicator` at host 0 (a
~100-line TCP fanout below) or feed hosts from an external queue.
"""

from __future__ import annotations

import json
import logging
import os
import socket
import threading
from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("microvllm_tpu.distributed")


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or MVT_* env vars.

    MVT_COORDINATOR=host:port  MVT_NUM_PROCESSES=N  MVT_PROCESS_ID=i
    """
    coordinator = coordinator or os.environ.get("MVT_COORDINATOR")
    if coordinator is None:
        return  # single process
    num_processes = int(num_processes or os.environ["MVT_NUM_PROCESSES"])
    process_id = int(process_id if process_id is not None
                     else os.environ["MVT_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("jax.distributed up: process %d/%d, %d local / %d global devices",
                process_id, num_processes, jax.local_device_count(),
                jax.device_count())


def put_global(x: np.ndarray, mesh: Mesh, spec: P) -> jax.Array:
    """Build a (possibly multi-process) global array from the full
    host-replicated numpy value.

    Every host's engine computes the same full batch arrays; this carves out
    the rows each process's devices own and assembles the global Array. In
    single-process meshes it is just device_put.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)

    def cb(index):
        return x[index]

    return jax.make_array_from_callback(x.shape, sharding, cb)


def fetch_replicated(arr: jax.Array) -> np.ndarray:
    """Read back an array that is fully replicated across processes (each
    process reads its local copy — no cross-host transfer)."""
    return np.asarray(arr.addressable_shards[0].data)


# ---------------------------------------------------------------------------
# Request replication: host 0 fans requests out to every host's engine so
# all schedulers stay in lock-step without per-step broadcasts.
# ---------------------------------------------------------------------------


class RequestFanout:
    """Host 0: accepts follower connections, replays every request to all."""

    def __init__(self, port: int):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("0.0.0.0", port))
        self._srv.listen(16)
        self._followers: list[socket.socket] = []
        self._lock = threading.Lock()
        self._accept_thread = threading.Thread(target=self._accept_loop,
                                               daemon=True)
        self._accept_thread.start()

    def _accept_loop(self) -> None:
        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            with self._lock:
                self._followers.append(conn)

    @property
    def num_followers(self) -> int:
        with self._lock:
            return len(self._followers)

    def publish(self, request: dict) -> None:
        """Send one request record to every follower (newline-delimited
        JSON). Call BEFORE admitting the request locally."""
        data = (json.dumps(request) + "\n").encode()
        with self._lock:
            dead = []
            for conn in self._followers:
                try:
                    conn.sendall(data)
                except OSError:
                    dead.append(conn)
            for conn in dead:
                self._followers.remove(conn)

    def close(self) -> None:
        self._srv.close()


class RequestFollower:
    """Hosts 1..N-1: receive the replicated request stream."""

    def __init__(self, leader: str, port: int,
                 on_request: Callable[[dict], None],
                 connect_timeout: float = 60.0):
        # retry: the leader binds its fanout port at EngineServer build,
        # which may lag this process by several seconds
        import time as _time
        deadline = _time.monotonic() + connect_timeout
        while True:
            try:
                self._sock = socket.create_connection((leader, port),
                                                      timeout=30)
                break
            except OSError:
                if _time.monotonic() >= deadline:
                    raise
                _time.sleep(0.2)
        self._on_request = on_request
        self._thread = threading.Thread(target=self._recv_loop, daemon=True)
        self._thread.start()

    def _recv_loop(self) -> None:
        buf = b""
        while True:
            try:
                chunk = self._sock.recv(65536)
            except OSError:
                return
            if not chunk:
                return
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                if line:
                    self._on_request(json.loads(line))

    def close(self) -> None:
        self._sock.close()
