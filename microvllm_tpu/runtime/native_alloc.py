"""ctypes bindings for the native (C++) page allocator.

Drop-in replacement for :class:`PageAllocator` backed by
`native/page_allocator.cpp`. The shared library is built on demand with
`native/build.sh` (g++); if unavailable the engine falls back to the pure
Python allocator transparently.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

from ..config import CacheConfig
from .kv_cache import CacheStats, OutOfPagesError, TRASH_PAGE

logger = logging.getLogger("microvllm_tpu.native")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmvt_native.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("MVT_NATIVE_ALLOC", "1") == "0":
        return None
    src = os.path.join(_NATIVE_DIR, "page_allocator.cpp")
    try:
        stale = (not os.path.exists(_LIB_PATH)
                 or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
        if stale:
            subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception as e:  # toolchain or load failure -> python fallback
        logger.info("native allocator unavailable (%s); using python", e)
        return None

    lib.mvt_alloc_create.restype = ctypes.c_void_p
    lib.mvt_alloc_create.argtypes = [ctypes.c_int32] * 4
    lib.mvt_alloc_destroy.argtypes = [ctypes.c_void_p]
    lib.mvt_alloc_num_free.restype = ctypes.c_int64
    lib.mvt_alloc_num_free.argtypes = [ctypes.c_void_p]
    lib.mvt_alloc_seq_len.restype = ctypes.c_int64
    lib.mvt_alloc_seq_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.mvt_alloc_has_seq.restype = ctypes.c_int32
    lib.mvt_alloc_has_seq.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.mvt_alloc_allocate.restype = ctypes.c_int32
    lib.mvt_alloc_allocate.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_int64]
    lib.mvt_alloc_extend.restype = ctypes.c_int32
    lib.mvt_alloc_extend.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int64]
    lib.mvt_alloc_append_token.restype = ctypes.c_int32
    lib.mvt_alloc_append_token.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.mvt_alloc_release_below.restype = ctypes.c_int64
    lib.mvt_alloc_release_below.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                            ctypes.c_int64]
    lib.mvt_alloc_truncate.restype = ctypes.c_int32
    lib.mvt_alloc_truncate.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_int64]
    lib.mvt_alloc_free.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.mvt_alloc_reset.argtypes = [ctypes.c_void_p]
    lib.mvt_alloc_block_table_row.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    lib.mvt_alloc_batch_views.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    lib.mvt_alloc_stats.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
    _keyptr = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.mvt_alloc_create_prefix.restype = ctypes.c_void_p
    lib.mvt_alloc_create_prefix.argtypes = [ctypes.c_int32] * 4
    lib.mvt_alloc_match_len.restype = ctypes.c_int64
    lib.mvt_alloc_match_len.argtypes = [ctypes.c_void_p, _keyptr,
                                        ctypes.c_int64]
    lib.mvt_alloc_allocate_prefix.restype = ctypes.c_int64
    lib.mvt_alloc_allocate_prefix.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, _keyptr, ctypes.c_int64,
        ctypes.c_int64]
    lib.mvt_alloc_register_seq.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                           _keyptr, ctypes.c_int64]
    lib.mvt_alloc_prefix_stats.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


class NativePageAllocator:
    """Same contract as :class:`PageAllocator`, C++ underneath."""

    def __init__(self, cfg: CacheConfig):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native allocator library not available")
        self.cfg = cfg
        self._lib = lib
        self._h = lib.mvt_alloc_create(cfg.num_pages, cfg.page_size,
                                       cfg.max_pages_per_seq,
                                       getattr(cfg, "reserved_pages", 1))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.mvt_alloc_destroy(self._h)
            self._h = None

    # -- queries ----------------------------------------------------------

    @property
    def num_free(self) -> int:
        return int(self._lib.mvt_alloc_num_free(self._h))

    def can_allocate(self, num_tokens: int) -> bool:
        return self.pages_needed(num_tokens) <= self.num_free

    def pages_needed(self, num_tokens: int) -> int:
        return -(-num_tokens // self.cfg.page_size)

    def seq_len(self, seq_id: int) -> int:
        return int(self._lib.mvt_alloc_seq_len(self._h, seq_id))

    def has_seq(self, seq_id: int) -> bool:
        return bool(self._lib.mvt_alloc_has_seq(self._h, seq_id))

    # -- lifecycle --------------------------------------------------------

    def _check(self, rc: int, what: str, seq_id: int) -> None:
        if rc == 0:
            return
        if rc == -1:
            raise OutOfPagesError(f"{what}: no free pages for seq {seq_id}")
        if rc == -2:
            raise OutOfPagesError(
                f"{what}: seq {seq_id} exceeds max_pages_per_seq "
                f"{self.cfg.max_pages_per_seq}")
        raise AssertionError(f"{what}: bad state for seq {seq_id} (rc={rc})")

    def allocate(self, seq_id: int, num_tokens: int) -> None:
        self._check(self._lib.mvt_alloc_allocate(self._h, seq_id, num_tokens),
                    "allocate", seq_id)

    def extend(self, seq_id: int, num_tokens: int) -> None:
        self._check(self._lib.mvt_alloc_extend(self._h, seq_id, num_tokens),
                    "extend", seq_id)

    def append_token(self, seq_id: int) -> None:
        self._check(self._lib.mvt_alloc_append_token(self._h, seq_id),
                    "append_token", seq_id)

    def truncate(self, seq_id: int, new_len: int) -> None:
        rc = self._lib.mvt_alloc_truncate(self._h, seq_id, new_len)
        if rc != 0:
            raise AssertionError(
                f"truncate: bad state for seq {seq_id} (rc={rc})")

    def release_below(self, seq_id: int, first_needed_token: int) -> int:
        """Sliding-window KV eviction (see the Python twin's docstring —
        kv_cache.py::PageAllocator.release_below defines the semantics)."""
        n = int(self._lib.mvt_alloc_release_below(
            self._h, seq_id, first_needed_token))
        if n == -3:
            raise AssertionError(f"release_below: unknown seq {seq_id}")
        return n

    def free(self, seq_id: int) -> None:
        self._lib.mvt_alloc_free(self._h, seq_id)

    def reset(self) -> None:
        self._lib.mvt_alloc_reset(self._h)

    # -- device-facing views ---------------------------------------------

    def block_table_row(self, seq_id: int) -> np.ndarray:
        row = np.empty(self.cfg.max_pages_per_seq, dtype=np.int32)
        self._lib.mvt_alloc_block_table_row(self._h, seq_id, row)
        return row

    def batch_views(self, seq_ids: list[int], batch_size: int):
        ids = np.asarray(seq_ids, dtype=np.int64)
        tables = np.empty((batch_size, self.cfg.max_pages_per_seq), np.int32)
        lens = np.empty(batch_size, np.int32)
        self._lib.mvt_alloc_batch_views(self._h, ids, len(seq_ids),
                                        batch_size, tables, lens)
        return tables, lens

    # -- stats ------------------------------------------------------------

    @property
    def stats(self) -> CacheStats:
        out = np.empty(5, dtype=np.int64)
        self._lib.mvt_alloc_stats(self._h, out)
        usable, free_p, used, num_seqs, used_slots = (int(x) for x in out)
        allocated_slots = used * self.cfg.page_size
        return CacheStats(
            total_pages=usable,
            free_pages=free_p,
            used_pages=used,
            num_seqs=num_seqs,
            utilization=used / usable if usable else 0.0,
            fragmentation=(1.0 - used_slots / allocated_slots
                           if allocated_slots else 0.0),
        )


class NativePrefixCachingAllocator(NativePageAllocator):
    """Same contract as :class:`PrefixCachingAllocator`, C++ underneath.
    Content keys (chained blake2b) are computed here in Python — one hash
    implementation shared with the pure-Python twin — and handed to the
    C++ side as uint64 (first 8 digest bytes, little-endian)."""

    def __init__(self, cfg: CacheConfig):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native allocator library not available")
        self.cfg = cfg
        self._lib = lib
        self._h = lib.mvt_alloc_create_prefix(
            cfg.num_pages, cfg.page_size, cfg.max_pages_per_seq,
            getattr(cfg, "reserved_pages", 1))

    def _keys(self, token_ids, n_pages: int) -> np.ndarray:
        from .kv_cache import page_keys
        raw = page_keys(token_ids, self.cfg.page_size, n_pages)
        return np.asarray([int.from_bytes(k, "little") for k in raw],
                          dtype=np.uint64)

    def match_len(self, token_ids, target: int) -> int:
        ps = self.cfg.page_size
        cap = max(0, (min(target, len(token_ids)) - 1) // ps)
        keys = self._keys(token_ids, cap)
        return int(self._lib.mvt_alloc_match_len(self._h, keys, len(keys)))

    def allocate_prefix(self, seq_id: int, token_ids, target: int) -> int:
        ps = self.cfg.page_size
        cap = min((min(target, len(token_ids)) - 1) // ps,
                  self.cfg.max_pages_per_seq - 1)
        cap = max(0, cap)
        keys = self._keys(token_ids, cap)
        got = int(self._lib.mvt_alloc_allocate_prefix(
            self._h, seq_id, keys, len(keys), target))
        assert got >= 0, f"seq {seq_id} already allocated"
        return got

    def register_seq(self, seq_id: int, token_ids, upto: int) -> None:
        n = min(upto, self.seq_len(seq_id)) // self.cfg.page_size
        keys = self._keys(token_ids, n)
        self._lib.mvt_alloc_register_seq(self._h, seq_id, keys, len(keys))

    def _prefix_stats(self) -> tuple[int, int, int, int]:
        out = np.empty(4, dtype=np.int64)
        self._lib.mvt_alloc_prefix_stats(self._h, out)
        return tuple(int(x) for x in out)

    @property
    def hits(self) -> int:
        return self._prefix_stats()[0]

    @property
    def misses(self) -> int:
        return self._prefix_stats()[1]

    @property
    def evictions(self) -> int:
        return self._prefix_stats()[2]


def make_allocator(cfg: CacheConfig):
    """Native (C++) if buildable, else the Python twin — for both the plain
    and the prefix-caching allocator."""
    from .kv_cache import PageAllocator, PrefixCachingAllocator

    if getattr(cfg, "prefix_cache", False):
        if native_available():
            try:
                return NativePrefixCachingAllocator(cfg)
            except Exception:
                logger.exception(
                    "native prefix allocator init failed; using python")
        return PrefixCachingAllocator(cfg)
    if native_available():
        try:
            return NativePageAllocator(cfg)
        except Exception:
            logger.exception("native allocator init failed; using python")
    return PageAllocator(cfg)
