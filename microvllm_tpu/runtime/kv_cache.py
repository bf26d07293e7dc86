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
        # pages 0..reserved-1 are trash (1 normally; sp under sequence-
        # parallel KV so every rank's local slot 0 stays inert)
        reserved = getattr(cfg, "reserved_pages", 1)
        self._free: deque[int] = deque(range(reserved, cfg.num_pages))
        self._tables: dict[int, list[int]] = {}
        self._lens: dict[int, int] = {}

    # -- page pool hooks (PrefixCachingAllocator overrides these) ----------

    def _take_page(self) -> int:
        return self._free.popleft()

    def _release_page(self, page: int) -> None:
        self._free.append(page)

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
        if need > self.num_free:
            raise OutOfPagesError(
                f"need {need} pages for seq {seq_id}, have {self.num_free}")
        if need > self.cfg.max_pages_per_seq:
            raise OutOfPagesError(
                f"seq {seq_id} needs {need} pages > max_pages_per_seq "
                f"{self.cfg.max_pages_per_seq}")
        pages = [self._take_page() for _ in range(need)]
        self._tables[seq_id] = pages
        self._lens[seq_id] = num_tokens
        return pages

    def append_token(self, seq_id: int) -> None:
        """Grow a sequence by one token, taking a new page on boundary."""
        table = self._tables[seq_id]
        length = self._lens[seq_id]
        if length == len(table) * self.cfg.page_size:  # current pages full
            if self.num_free == 0:
                raise OutOfPagesError(f"no free page for seq {seq_id}")
            if len(table) >= self.cfg.max_pages_per_seq:
                raise OutOfPagesError(
                    f"seq {seq_id} hit max_pages_per_seq {self.cfg.max_pages_per_seq}")
            table.append(self._take_page())
        self._lens[seq_id] = length + 1

    def extend(self, seq_id: int, num_tokens: int) -> None:
        """Grow a sequence by ``num_tokens`` (chunked prefill)."""
        table = self._tables[seq_id]
        new_len = self._lens[seq_id] + num_tokens
        need = self.pages_needed(new_len) - len(table)
        if need > self.num_free:
            raise OutOfPagesError(f"need {need} pages to extend seq {seq_id}")
        if self.pages_needed(new_len) > self.cfg.max_pages_per_seq:
            raise OutOfPagesError(f"seq {seq_id} exceeds max_pages_per_seq")
        for _ in range(need):
            table.append(self._take_page())
        self._lens[seq_id] = new_len

    def truncate(self, seq_id: int, new_len: int) -> None:
        """Shrink a sequence to ``new_len`` tokens, freeing tail pages
        (speculative decoding reserves worst-case growth, then truncates to
        the accepted length)."""
        table = self._tables[seq_id]
        assert new_len <= self._lens[seq_id], (new_len, self._lens[seq_id])
        keep = self.pages_needed(new_len)
        while len(table) > keep:
            p = table.pop()
            if p != TRASH_PAGE:           # window-evicted slot
                self._release_page(p)
        self._lens[seq_id] = new_len

    def release_below(self, seq_id: int, first_needed_token: int) -> int:
        """Sliding-window KV eviction: free whole pages strictly below
        ``first_needed_token`` (positions <= ctx - window are never read
        again by ANY future query once every layer's attention is windowed).
        Freed slots are replaced with the trash page so the fixed-width,
        position-indexed block table keeps addressing later pages; the
        kernels never DMA below the window (`ops/pallas/decode_attention.py`
        start_chunk) and the jnp oracles mask those positions, so trash
        content is inert. Bounds a windowed sequence's live KV to
        O(window) pages regardless of generation length (capacity win for
        concurrent windowed streams; the position-indexed table still caps
        total length at max_pages_per_seq * page_size). Returns #freed."""
        table = self._tables[seq_id]
        keep_from = min(max(first_needed_token, 0) // self.cfg.page_size,
                        len(table))
        freed = 0
        for i in range(keep_from):
            if table[i] != TRASH_PAGE:
                self._release_page(table[i])
                table[i] = TRASH_PAGE
                freed += 1
        return freed

    def free(self, seq_id: int) -> None:
        pages = self._tables.pop(seq_id, None)
        if pages:
            for p in pages:
                if p != TRASH_PAGE:       # window-evicted slot
                    self._release_page(p)
        self._lens.pop(seq_id, None)

    def reset(self) -> None:
        reserved = getattr(self.cfg, "reserved_pages", 1)
        self._free = deque(range(reserved, self.cfg.num_pages))
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
        used = usable - self.num_free
        allocated_slots = used * self.cfg.page_size
        used_slots = sum(self._lens.values())
        frag = 0.0
        if allocated_slots:
            # clamp: window eviction frees pages while lens keep counting
            # logical positions, which can push used_slots past allocated
            frag = max(0.0, 1.0 - used_slots / allocated_slots)
        return CacheStats(
            total_pages=usable,
            free_pages=self.num_free,
            used_pages=used,
            num_seqs=len(self._tables),
            utilization=used / usable if usable else 0.0,
            fragmentation=frag,
        )


# ---------------------------------------------------------------------------
# Automatic prefix caching (beyond the reference; vLLM-style block reuse)
# ---------------------------------------------------------------------------


def page_keys(token_ids, page_size: int, n_pages: int) -> list[bytes]:
    """Chained content keys for the first ``n_pages`` FULL pages of a token
    sequence: ``key_i = blake2b(key_{i-1} || tokens_of_page_i)``.

    The chain makes a key identify the page's tokens AND its entire prefix —
    required because a page's KV content depends on every earlier token
    (attention mixes the prefix into each position's hidden state).
    Deterministic across processes and hosts (multi-host schedulers stay in
    lockstep), unlike Python's seeded ``hash()``.
    """
    import hashlib

    keys: list[bytes] = []
    prev = b"\x00" * 8
    arr = np.asarray(token_ids[: n_pages * page_size], dtype=np.int32)
    for i in range(n_pages):
        h = hashlib.blake2b(prev, digest_size=8)
        h.update(arr[i * page_size:(i + 1) * page_size].tobytes())
        prev = h.digest()
        keys.append(prev)
    return keys


class PrefixCachingAllocator(PageAllocator):
    """PageAllocator with automatic prefix caching (content-addressed reuse
    of full KV pages — vLLM's automatic-prefix-caching, absent in the
    reference).

    * Full prompt pages are registered in a content-hash index after their
      KV is computed (:meth:`register_seq`).
    * New sequences match the longest chain of already-cached full pages
      (:meth:`allocate_prefix`) and skip prefilling those tokens; matched
      pages are shared via refcounts and are never written again (decode
      appends only ever touch a sequence's unshared tail page).
    * Pages whose refcount drops to zero stay cached in an LRU pool and are
      still matchable; taking a fresh page evicts from the LRU only when the
      free list is empty, so caching never reduces usable capacity.
    """

    def __init__(self, cfg: CacheConfig):
        super().__init__(cfg)
        self._ref: dict[int, int] = {}            # page -> refcount
        self._index: dict[bytes, int] = {}        # chain key -> page
        self._key_of: dict[int, bytes] = {}       # page -> chain key
        from collections import OrderedDict
        self._lru: OrderedDict[int, None] = OrderedDict()  # ref==0, cached
        self.hits = 0                             # pages reused
        self.misses = 0                           # pages prefilled fresh
        self.evictions = 0

    # -- page pool ----------------------------------------------------------

    @property
    def num_free(self) -> int:
        return len(self._free) + len(self._lru)   # LRU pages are reclaimable

    def _take_page(self) -> int:
        if self._free:
            page = self._free.popleft()
        else:
            page, _ = self._lru.popitem(last=False)   # evict oldest cached
            key = self._key_of.pop(page)
            self._index.pop(key, None)
            self.evictions += 1
        self._ref[page] = 1
        return page

    def _release_page(self, page: int) -> None:
        n = self._ref.get(page, 1) - 1
        if n > 0:
            self._ref[page] = n
            return
        self._ref.pop(page, None)
        if page in self._key_of:                   # cached: keep matchable
            self._lru[page] = None
            self._lru.move_to_end(page)
        else:
            self._free.append(page)

    def reset(self) -> None:
        super().reset()
        self._ref.clear()
        self._index.clear()
        self._key_of.clear()
        self._lru.clear()

    # -- prefix matching ------------------------------------------------------

    def match_len(self, token_ids, target: int) -> int:
        """Tokens coverable by cached pages (no state change; admission
        sizing). At least one token is always left to prefill so the final
        chunk computes the next-token logits."""
        ps = self.cfg.page_size
        cap = (min(target, len(token_ids)) - 1) // ps
        n = 0
        for key in page_keys(token_ids, ps, cap):
            if key not in self._index:
                break
            n += 1
        return n * ps

    def allocate_prefix(self, seq_id: int, token_ids, target: int) -> int:
        """Install the longest cached page chain as the head of a NEW
        sequence's page table (refcount++, revived from the LRU if idle).
        Returns the number of tokens covered; the caller then ``extend``\\ s
        for the tokens it actually prefills. ``target`` is the prefill
        target (> the match, so the last token's logits are computed)."""
        assert seq_id not in self._tables, f"seq {seq_id} already allocated"
        ps = self.cfg.page_size
        cap = min((min(target, len(token_ids)) - 1) // ps,
                  self.cfg.max_pages_per_seq - 1)
        pages: list[int] = []
        for key in page_keys(token_ids, ps, cap):
            page = self._index.get(key)
            if page is None:
                break
            self._ref[page] = self._ref.get(page, 0) + 1
            self._lru.pop(page, None)              # pinned again
            pages.append(page)
        if not pages:
            return 0
        self._tables[seq_id] = pages
        self._lens[seq_id] = len(pages) * ps
        self.hits += len(pages)
        self.misses += self.pages_needed(target) - len(pages)
        return len(pages) * ps

    def register_seq(self, seq_id: int, token_ids, upto: int) -> None:
        """Index this sequence's full pages covering ``token_ids[:upto]``
        whose KV is now computed (call after a prefill chunk completes).
        Pages already indexed under a different physical page are left
        alone — one canonical page per content key."""
        table = self._tables.get(seq_id)
        if not table:
            return
        ps = self.cfg.page_size
        n = min(upto, self._lens[seq_id]) // ps
        for i, key in enumerate(page_keys(token_ids, ps, n)):
            page = table[i]
            if page == TRASH_PAGE:
                continue                           # window-evicted slot
            if page in self._key_of:
                continue                           # already indexed (matched
                                                   # head / earlier chunk)
            if key in self._index:
                continue                           # duplicate content under
                                                   # another page
            self._index[key] = page
            self._key_of[page] = key
