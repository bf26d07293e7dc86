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
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception as e:  # toolchain or load failure -> python fallback
        logger.info("native allocator unavailable (%s); using python", e)
        return None

    lib.mvt_alloc_create.restype = ctypes.c_void_p
    lib.mvt_alloc_create.argtypes = [ctypes.c_int32] * 3
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
                                       cfg.max_pages_per_seq)

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


def make_allocator(cfg: CacheConfig):
    """Native if buildable, else the Python allocator. Prefix caching uses
    the Python :class:`PrefixCachingAllocator` (hash index + LRU + refcounts
    are host bookkeeping off the hot decode path)."""
    from .kv_cache import PageAllocator, PrefixCachingAllocator

    if getattr(cfg, "prefix_cache", False):
        return PrefixCachingAllocator(cfg)
    if native_available():
        try:
            return NativePageAllocator(cfg)
        except Exception:
            logger.exception("native allocator init failed; using python")
    return PageAllocator(cfg)
