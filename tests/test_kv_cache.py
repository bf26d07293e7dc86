"""PageAllocator unit tests (reference behavior: `core/cache_manager.py`
alloc/append/free/reset lifecycle, exercised there only via a __main__ smoke
test at `cache_manager.py:698-749`)."""

import numpy as np
import pytest

from microvllm_tpu.config import CacheConfig
from microvllm_tpu.runtime.kv_cache import OutOfPagesError, PageAllocator, TRASH_PAGE


def make(num_pages=9, page_size=16, max_pages=4):
    return PageAllocator(CacheConfig(num_pages=num_pages, page_size=page_size,
                                     max_pages_per_seq=max_pages))


def test_trash_page_reserved():
    a = make()
    assert a.num_free == 8
    pages = a.allocate(1, 16)
    assert TRASH_PAGE not in pages


def test_allocate_rounding():
    a = make()
    assert a.allocate(1, 1) == [1]
    assert a.allocate(2, 17) == [2, 3]   # 17 tokens -> 2 pages
    assert a.seq_len(1) == 1
    assert a.seq_len(2) == 17


def test_append_token_page_boundary():
    a = make()
    a.allocate(1, 16)                     # exactly one full page
    assert len(a.block_table_row(1)[a.block_table_row(1) != TRASH_PAGE]) == 1
    a.append_token(1)                     # crosses into a second page
    row = a.block_table_row(1)
    assert (row != TRASH_PAGE).sum() == 2
    assert a.seq_len(1) == 17


def test_free_returns_pages():
    a = make()
    a.allocate(1, 64)
    before = a.num_free
    a.free(1)
    assert a.num_free == before + 4
    assert not a.has_seq(1)


def test_out_of_pages():
    a = make(num_pages=3)                 # 2 usable
    a.allocate(1, 32)
    with pytest.raises(OutOfPagesError):
        a.allocate(2, 1)


def test_max_pages_per_seq_enforced():
    a = make(num_pages=20, max_pages=2)
    with pytest.raises(OutOfPagesError):
        a.allocate(1, 33)                 # needs 3 pages > max 2


def test_extend_chunked():
    a = make(num_pages=9)
    a.allocate(1, 10)
    a.extend(1, 10)                       # 20 tokens -> 2 pages
    assert a.seq_len(1) == 20
    row = a.block_table_row(1)
    assert (row != TRASH_PAGE).sum() == 2


def test_batch_views_padding():
    a = make()
    a.allocate(7, 20)
    tables, lens = a.batch_views([7], batch_size=4)
    assert tables.shape == (4, 4)
    assert lens.tolist() == [20, 0, 0, 0]
    assert (tables[1:] == TRASH_PAGE).all()


def test_stats_fragmentation():
    a = make()
    a.allocate(1, 17)                     # 2 pages, 17/32 slots used
    s = a.stats
    assert s.used_pages == 2
    assert s.num_seqs == 1
    assert s.fragmentation == pytest.approx(1 - 17 / 32)


def test_reset():
    a = make()
    a.allocate(1, 50)
    a.reset()
    assert a.num_free == 8
    assert not a.has_seq(1)


# ---------------------------------------------------------------------------
# Native (C++) allocator: same contract, exercised through the same paths
# ---------------------------------------------------------------------------

native = pytest.importorskip("microvllm_tpu.runtime.native_alloc")


@pytest.fixture
def native_alloc():
    if not native.native_available():
        pytest.skip("native allocator not buildable here")
    return native.NativePageAllocator(
        CacheConfig(num_pages=9, page_size=16, max_pages_per_seq=4))


def test_native_lifecycle(native_alloc):
    a = native_alloc
    a.allocate(1, 17)
    assert a.seq_len(1) == 17
    assert a.num_free == 6
    a.append_token(1)
    assert a.seq_len(1) == 18
    row = a.block_table_row(1)
    assert (row != TRASH_PAGE).sum() == 2
    a.free(1)
    assert a.num_free == 8
    assert not a.has_seq(1)


def test_native_oom_and_max_pages(native_alloc):
    a = native_alloc
    with pytest.raises(OutOfPagesError):
        a.allocate(1, 1000)
    a.allocate(2, 16)
    with pytest.raises(OutOfPagesError):
        a.extend(2, 64)   # > max_pages_per_seq


def test_native_matches_python_behavior():
    if not native.native_available():
        pytest.skip("native allocator not buildable here")
    cfg = CacheConfig(num_pages=17, page_size=8, max_pages_per_seq=6)
    py, nat = PageAllocator(cfg), native.NativePageAllocator(cfg)
    import random
    rng = random.Random(0)
    live = []
    for step in range(300):
        op = rng.random()
        if op < 0.4 or not live:
            sid = step
            n = rng.randint(1, 30)
            try:
                py.allocate(sid, n)
                ok_py = True
            except OutOfPagesError:
                ok_py = False
            try:
                nat.allocate(sid, n)
                ok_nat = True
            except OutOfPagesError:
                ok_nat = False
            assert ok_py == ok_nat
            if ok_py:
                live.append(sid)
        elif op < 0.7:
            sid = rng.choice(live)
            try:
                py.append_token(sid)
                ok_py = True
            except OutOfPagesError:
                ok_py = False
            try:
                nat.append_token(sid)
                ok_nat = True
            except OutOfPagesError:
                ok_nat = False
            assert ok_py == ok_nat
        else:
            sid = live.pop(rng.randrange(len(live)))
            py.free(sid)
            nat.free(sid)
        assert py.num_free == nat.num_free
        for sid in live:
            assert py.seq_len(sid) == nat.seq_len(sid)
            assert (py.block_table_row(sid) == nat.block_table_row(sid)).all()


def test_release_below_window_eviction():
    """Sliding-window KV eviction: pages wholly behind the window are
    freed, their table slots become trash, later pages keep their
    position-indexed addresses, and lifecycle ops stay consistent."""
    cfg = CacheConfig(num_pages=16, page_size=16, max_pages_per_seq=8)
    a = PageAllocator(cfg)
    a.allocate(1, 100)                      # 7 pages (0..99)
    before = list(a.block_table_row(1)[:7])
    free0 = a.num_free
    # window 40: ctx=100 -> first needed position 61 -> pages 0..2 dead
    freed = a.release_below(1, 100 - 40 + 1)
    assert freed == 3 and a.num_free == free0 + 3
    row = a.block_table_row(1)
    assert list(row[:3]) == [0, 0, 0]
    assert list(row[3:7]) == before[3:7]    # later pages keep addresses
    assert a.seq_len(1) == 100              # logical length unchanged
    # idempotent
    assert a.release_below(1, 61) == 0
    # growth still works and free() doesn't double-release trash slots
    a.extend(1, 16)
    a.free(1)
    assert a.num_free == cfg.num_usable_pages
    # truncate over a trashed head must not free page 0: seq 2 ends up
    # holding ONLY its trashed slot (0 real pages) and the free count
    # must balance exactly — double-releasing page 0 would corrupt it
    a.allocate(2, 64)
    a.release_below(2, 33)                  # first 2 pages -> trash
    a.truncate(2, 8)                        # drops the 2 real tail pages
    assert a.num_free == cfg.num_usable_pages
    a.free(2)
    assert a.num_free == cfg.num_usable_pages


def test_release_below_native_lockstep():
    if not native.native_available():
        pytest.skip("native allocator not buildable here")
    cfg = CacheConfig(num_pages=32, page_size=16, max_pages_per_seq=16)
    py = PageAllocator(cfg)
    nat = native.NativePageAllocator(cfg)
    rng = __import__("random").Random(11)
    live = []
    next_id = 0
    for _ in range(300):
        op = rng.random()
        if op < 0.3 or not live:
            n = rng.randrange(1, 80)
            try:
                py.allocate(next_id, n)
                ok = True
            except OutOfPagesError:
                ok = False
            try:
                nat.allocate(next_id, n)
                ok_n = True
            except OutOfPagesError:
                ok_n = False
            assert ok == ok_n
            if ok:
                live.append(next_id)
            next_id += 1
        elif op < 0.55:
            sid = rng.choice(live)
            n = rng.randrange(1, 40)
            try:
                py.extend(sid, n)
                ok = True
            except OutOfPagesError:
                ok = False
            try:
                nat.extend(sid, n)
                ok_n = True
            except OutOfPagesError:
                ok_n = False
            assert ok == ok_n
        elif op < 0.85:
            sid = rng.choice(live)
            first = rng.randrange(0, py.seq_len(sid) + 5)
            assert (py.release_below(sid, first)
                    == nat.release_below(sid, first))
        else:
            sid = live.pop(rng.randrange(len(live)))
            py.free(sid)
            nat.free(sid)
        assert py.num_free == nat.num_free
        for sid in live:
            assert (py.block_table_row(sid)
                    == nat.block_table_row(sid)).all()
