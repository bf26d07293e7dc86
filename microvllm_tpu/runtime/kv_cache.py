"""Host-side paged KV cache manager.

Functional equivalent of the reference's `KVCacheManager`
(`core/cache_manager.py:262-691`): O(1) page alloc/free from a free list,
per-sequence page tables, utilization/fragmentation stats. The device-side
tensors live elsewhere (owned by the engine, updated inside the jitted step);
this class only does the bookkeeping and emits fixed-shape int32 block
tables, mirroring the reference's static pre-allocated block-table buffers
(`cache_manager.py:342-349`) which exist for CUDA-graph stability — here the
fixed shape is what keeps XLA from recompiling.

Page 0 is reserved as the trash page: padding rows/tokens write their KV
there, replacing the reference's duplicate-sequence padding + dedupe-mask
scheme (`core/scheduler.py:87-94`, `core/engine.py:248-252`).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import numpy as np

from ..config import CacheConfig

TRASH_PAGE = 0


class OutOfPagesError(RuntimeError):
    pass


@dataclass
class CacheStats:
    total_pages: int
    free_pages: int
    used_pages: int
    num_seqs: int
    utilization: float          # used / total usable
    fragmentation: float        # wasted slots in tail pages / allocated slots


class PageAllocator:
    """Free-list page allocator + per-sequence page tables."""

    def __init__(self, cfg: CacheConfig):
        self.cfg = cfg
        self._free: deque[int] = deque(range(1, cfg.num_pages))  # 0 = trash
        self._tables: dict[int, list[int]] = {}
        self._lens: dict[int, int] = {}

    # -- queries ----------------------------------------------------------

    @property
    def num_free(self) -> int:
        return len(self._free)

    def can_allocate(self, num_tokens: int) -> bool:
        return self.pages_needed(num_tokens) <= self.num_free

    def pages_needed(self, num_tokens: int) -> int:
        return -(-num_tokens // self.cfg.page_size)

    def seq_len(self, seq_id: int) -> int:
        return self._lens.get(seq_id, 0)

    def has_seq(self, seq_id: int) -> bool:
        return seq_id in self._tables

    # -- lifecycle --------------------------------------------------------

    def allocate(self, seq_id: int, num_tokens: int) -> list[int]:
        """Allocate pages to hold ``num_tokens`` for a new sequence."""
        assert seq_id not in self._tables, f"seq {seq_id} already allocated"
        need = self.pages_needed(num_tokens)
        if need > len(self._free):
            raise OutOfPagesError(
                f"need {need} pages for seq {seq_id}, have {len(self._free)}")
        if need > self.cfg.max_pages_per_seq:
            raise OutOfPagesError(
                f"seq {seq_id} needs {need} pages > max_pages_per_seq "
                f"{self.cfg.max_pages_per_seq}")
        pages = [self._free.popleft() for _ in range(need)]
        self._tables[seq_id] = pages
        self._lens[seq_id] = num_tokens
        return pages

    def append_token(self, seq_id: int) -> None:
        """Grow a sequence by one token, taking a new page on boundary."""
        table = self._tables[seq_id]
        length = self._lens[seq_id]
        if length == len(table) * self.cfg.page_size:  # current pages full
            if not self._free:
                raise OutOfPagesError(f"no free page for seq {seq_id}")
            if len(table) >= self.cfg.max_pages_per_seq:
                raise OutOfPagesError(
                    f"seq {seq_id} hit max_pages_per_seq {self.cfg.max_pages_per_seq}")
            table.append(self._free.popleft())
        self._lens[seq_id] = length + 1

    def extend(self, seq_id: int, num_tokens: int) -> None:
        """Grow a sequence by ``num_tokens`` (chunked prefill)."""
        table = self._tables[seq_id]
        new_len = self._lens[seq_id] + num_tokens
        need = self.pages_needed(new_len) - len(table)
        if need > len(self._free):
            raise OutOfPagesError(f"need {need} pages to extend seq {seq_id}")
        if self.pages_needed(new_len) > self.cfg.max_pages_per_seq:
            raise OutOfPagesError(f"seq {seq_id} exceeds max_pages_per_seq")
        for _ in range(need):
            table.append(self._free.popleft())
        self._lens[seq_id] = new_len

    def truncate(self, seq_id: int, new_len: int) -> None:
        """Shrink a sequence to ``new_len`` tokens, freeing tail pages
        (speculative decoding reserves worst-case growth, then truncates to
        the accepted length)."""
        table = self._tables[seq_id]
        assert new_len <= self._lens[seq_id], (new_len, self._lens[seq_id])
        keep = self.pages_needed(new_len)
        while len(table) > keep:
            self._free.append(table.pop())
        self._lens[seq_id] = new_len

    def free(self, seq_id: int) -> None:
        pages = self._tables.pop(seq_id, None)
        if pages:
            self._free.extend(pages)
        self._lens.pop(seq_id, None)

    def reset(self) -> None:
        self._free = deque(range(1, self.cfg.num_pages))
        self._tables.clear()
        self._lens.clear()

    # -- device-facing views ---------------------------------------------

    def block_table_row(self, seq_id: int) -> np.ndarray:
        """Fixed-width int32 row, unused entries point at the trash page."""
        row = np.full(self.cfg.max_pages_per_seq, TRASH_PAGE, dtype=np.int32)
        pages = self._tables.get(seq_id, ())
        row[: len(pages)] = pages
        return row

    def batch_views(self, seq_ids: list[int], batch_size: int
                    ) -> tuple[np.ndarray, np.ndarray]:
        """(block_tables ``[batch_size, max_pages]``, context_lens
        ``[batch_size]``) padded with trash rows / zero lens."""
        tables = np.full((batch_size, self.cfg.max_pages_per_seq), TRASH_PAGE,
                         dtype=np.int32)
        lens = np.zeros(batch_size, dtype=np.int32)
        for i, sid in enumerate(seq_ids):
            tables[i] = self.block_table_row(sid)
            lens[i] = self._lens[sid]
        return tables, lens

    # -- stats (reference: `cache_manager.py:654-691`) --------------------

    @property
    def stats(self) -> CacheStats:
        usable = self.cfg.num_usable_pages
        used = usable - len(self._free)
        allocated_slots = used * self.cfg.page_size
        used_slots = sum(self._lens.values())
        frag = 0.0
        if allocated_slots:
            frag = 1.0 - used_slots / allocated_slots
        return CacheStats(
            total_pages=usable,
            free_pages=len(self._free),
            used_pages=used,
            num_seqs=len(self._tables),
            utilization=used / usable if usable else 0.0,
            fragmentation=frag,
        )
