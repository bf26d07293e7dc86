// Native page allocator for the paged KV cache.
//
// C++ implementation of the host-side bookkeeping that backs
// microvllm_tpu/runtime/kv_cache.py (the reference keeps this in Python,
// core/cache_manager.py:262-691; at high request rates the per-step
// table-building becomes host-bound, so the engine loads this via ctypes
// when built — python fallback otherwise).
//
// Build: native/build.sh  (g++ -O2 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <deque>
#include <list>
#include <unordered_map>
#include <vector>

namespace {

// Optionally prefix-caching (see kv_cache.py::PrefixCachingAllocator — the
// Python twin defines the semantics; this implementation must stay in
// lockstep with it, enforced by tests/test_prefix_cache.py's randomized
// python<->native comparison). Content keys are computed by the Python
// binding (chained blake2b, first 8 bytes) so both sides share one hash.
struct Allocator {
  int32_t num_pages;        // includes the reserved trash pages
  int32_t page_size;
  int32_t max_pages_per_seq;
  int32_t reserved;         // leading trash pages (1 normally; sp under
                            // sequence-parallel KV page sharding)
  bool prefix;              // prefix caching enabled
  std::deque<int32_t> free_pages;
  std::unordered_map<int64_t, std::vector<int32_t>> tables;
  std::unordered_map<int64_t, int64_t> lens;
  // prefix-caching state
  std::unordered_map<int32_t, int32_t> ref;       // page -> refcount
  std::unordered_map<uint64_t, int32_t> index;    // content key -> page
  std::unordered_map<int32_t, uint64_t> key_of;   // page -> content key
  std::list<int32_t> lru;                         // ref==0 cached; front=old
  std::unordered_map<int32_t, std::list<int32_t>::iterator> lru_pos;
  int64_t hits = 0, misses = 0, evictions = 0;

  explicit Allocator(int32_t np, int32_t ps, int32_t mpps, bool pf = false,
                     int32_t rsv = 1)
      : num_pages(np), page_size(ps), max_pages_per_seq(mpps), reserved(rsv),
        prefix(pf) {
    for (int32_t p = rsv; p < np; ++p) free_pages.push_back(p);
  }

  int64_t pages_needed(int64_t tokens) const {
    return (tokens + page_size - 1) / page_size;
  }

  int64_t num_free() const {
    return static_cast<int64_t>(free_pages.size()) +
           (prefix ? static_cast<int64_t>(lru.size()) : 0);
  }

  int32_t take_page() {
    if (!free_pages.empty()) {
      int32_t p = free_pages.front();
      free_pages.pop_front();
      if (prefix) ref[p] = 1;
      return p;
    }
    // prefix mode only: evict the oldest idle cached page
    int32_t p = lru.front();
    lru.pop_front();
    lru_pos.erase(p);
    auto it = key_of.find(p);
    if (it != key_of.end()) {
      index.erase(it->second);
      key_of.erase(it);
    }
    ++evictions;
    ref[p] = 1;
    return p;
  }

  void release_page(int32_t p) {
    if (!prefix) {
      free_pages.push_back(p);
      return;
    }
    auto it = ref.find(p);
    int32_t n = (it == ref.end() ? 1 : it->second) - 1;
    if (n > 0) {
      it->second = n;
      return;
    }
    if (it != ref.end()) ref.erase(it);
    if (key_of.count(p)) {                 // cached: keep matchable (LRU)
      lru.push_back(p);
      lru_pos[p] = std::prev(lru.end());
    } else {
      free_pages.push_back(p);
    }
  }

  void unlru(int32_t p) {                  // pin a matched page again
    auto it = lru_pos.find(p);
    if (it != lru_pos.end()) {
      lru.erase(it->second);
      lru_pos.erase(it);
    }
  }
};

}  // namespace

extern "C" {

void* mvt_alloc_create(int32_t num_pages, int32_t page_size,
                       int32_t max_pages_per_seq, int32_t reserved) {
  return new Allocator(num_pages, page_size, max_pages_per_seq, false,
                       reserved);
}

void* mvt_alloc_create_prefix(int32_t num_pages, int32_t page_size,
                              int32_t max_pages_per_seq, int32_t reserved) {
  return new Allocator(num_pages, page_size, max_pages_per_seq, true,
                       reserved);
}

void mvt_alloc_destroy(void* h) { delete static_cast<Allocator*>(h); }

int64_t mvt_alloc_num_free(void* h) {
  return static_cast<Allocator*>(h)->num_free();
}

int64_t mvt_alloc_seq_len(void* h, int64_t seq_id) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->lens.find(seq_id);
  return it == a->lens.end() ? 0 : it->second;
}

int32_t mvt_alloc_has_seq(void* h, int64_t seq_id) {
  auto* a = static_cast<Allocator*>(h);
  return a->tables.count(seq_id) ? 1 : 0;
}

// Returns 0 on success, -1 out of pages, -2 exceeds max_pages_per_seq,
// -3 already allocated.
int32_t mvt_alloc_allocate(void* h, int64_t seq_id, int64_t num_tokens) {
  auto* a = static_cast<Allocator*>(h);
  if (a->tables.count(seq_id)) return -3;
  int64_t need = a->pages_needed(num_tokens);
  if (need > a->num_free()) return -1;
  if (need > a->max_pages_per_seq) return -2;
  auto& table = a->tables[seq_id];
  table.reserve(need);
  for (int64_t i = 0; i < need; ++i) table.push_back(a->take_page());
  a->lens[seq_id] = num_tokens;
  return 0;
}

int32_t mvt_alloc_extend(void* h, int64_t seq_id, int64_t num_tokens) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->tables.find(seq_id);
  if (it == a->tables.end()) return -3;
  int64_t new_len = a->lens[seq_id] + num_tokens;
  int64_t total = a->pages_needed(new_len);
  int64_t need = total - static_cast<int64_t>(it->second.size());
  if (total > a->max_pages_per_seq) return -2;
  if (need > a->num_free()) return -1;
  for (int64_t i = 0; i < need; ++i) it->second.push_back(a->take_page());
  a->lens[seq_id] = new_len;
  return 0;
}

int32_t mvt_alloc_append_token(void* h, int64_t seq_id) {
  return mvt_alloc_extend(h, seq_id, 1);
}

// Shrink a sequence to new_len tokens, returning now-unneeded tail pages to
// the free list (speculative decoding reserves worst-case growth up front,
// then truncates to the accepted length).
int32_t mvt_alloc_truncate(void* h, int64_t seq_id, int64_t new_len) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->tables.find(seq_id);
  if (it == a->tables.end()) return -3;
  if (new_len > a->lens[seq_id]) return -4;
  int64_t keep = a->pages_needed(new_len);
  while (static_cast<int64_t>(it->second.size()) > keep) {
    int32_t p = it->second.back();
    if (p != 0) a->release_page(p);  // 0 = window-evicted slot (trash)
    it->second.pop_back();
  }
  a->lens[seq_id] = new_len;
  return 0;
}

// Sliding-window KV eviction: free whole pages strictly below
// first_needed_token (see kv_cache.py::release_below — the Python twin
// defines the semantics). Freed slots become the trash page so the
// position-indexed block table keeps addressing later pages. Returns the
// number of pages freed, or -3 for an unknown sequence.
int64_t mvt_alloc_release_below(void* h, int64_t seq_id,
                                int64_t first_needed_token) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->tables.find(seq_id);
  if (it == a->tables.end()) return -3;
  int64_t keep_from = first_needed_token < 0 ? 0
                      : first_needed_token / a->page_size;
  if (keep_from > static_cast<int64_t>(it->second.size()))
    keep_from = static_cast<int64_t>(it->second.size());
  int64_t freed = 0;
  for (int64_t i = 0; i < keep_from; ++i) {
    int32_t p = it->second[i];
    if (p != 0) {
      a->release_page(p);
      it->second[i] = 0;
      ++freed;
    }
  }
  return freed;
}

void mvt_alloc_free(void* h, int64_t seq_id) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->tables.find(seq_id);
  if (it == a->tables.end()) return;
  for (int32_t p : it->second)
    if (p != 0) a->release_page(p);  // 0 = window-evicted slot
  a->tables.erase(it);
  a->lens.erase(seq_id);
}

void mvt_alloc_reset(void* h) {
  auto* a = static_cast<Allocator*>(h);
  a->tables.clear();
  a->lens.clear();
  a->free_pages.clear();
  a->ref.clear();
  a->index.clear();
  a->key_of.clear();
  a->lru.clear();
  a->lru_pos.clear();
  for (int32_t p = a->reserved; p < a->num_pages; ++p)
    a->free_pages.push_back(p);
}

// -- prefix caching (keys computed by the Python binding: chained blake2b
//    over page token ids, first 8 bytes little-endian) ----------------------

// Non-mutating probe: consecutive cached pages from the start of `keys`.
int64_t mvt_alloc_match_len(void* h, const uint64_t* keys, int64_t n_keys) {
  auto* a = static_cast<Allocator*>(h);
  int64_t n = 0;
  while (n < n_keys && a->index.count(keys[n])) ++n;
  return n * a->page_size;
}

// Install the longest cached chain as a NEW sequence's table head.
// Returns matched tokens (>= 0) or -3 if the seq already exists.
// `target_tokens` is the prefill target (miss accounting only).
int64_t mvt_alloc_allocate_prefix(void* h, int64_t seq_id,
                                  const uint64_t* keys, int64_t n_keys,
                                  int64_t target_tokens) {
  auto* a = static_cast<Allocator*>(h);
  if (a->tables.count(seq_id)) return -3;
  std::vector<int32_t> pages;
  for (int64_t i = 0; i < n_keys; ++i) {
    auto it = a->index.find(keys[i]);
    if (it == a->index.end()) break;
    int32_t p = it->second;
    ++a->ref[p];
    a->unlru(p);
    pages.push_back(p);
  }
  if (pages.empty()) return 0;
  int64_t matched = static_cast<int64_t>(pages.size()) * a->page_size;
  a->tables[seq_id] = std::move(pages);
  a->lens[seq_id] = matched;
  a->hits += static_cast<int64_t>(a->tables[seq_id].size());
  a->misses += a->pages_needed(target_tokens) -
               static_cast<int64_t>(a->tables[seq_id].size());
  return matched;
}

// Index this sequence's first n_keys full pages (KV now computed).
void mvt_alloc_register_seq(void* h, int64_t seq_id, const uint64_t* keys,
                            int64_t n_keys) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->tables.find(seq_id);
  if (it == a->tables.end()) return;
  int64_t n = std::min<int64_t>(
      n_keys, std::min<int64_t>(it->second.size(),
                                a->lens[seq_id] / a->page_size));
  for (int64_t i = 0; i < n; ++i) {
    int32_t p = it->second[i];
    if (p == 0) continue;               // window-evicted slot
    if (a->key_of.count(p)) continue;   // already indexed
    if (a->index.count(keys[i])) continue;  // duplicate content elsewhere
    a->index[keys[i]] = p;
    a->key_of[p] = keys[i];
  }
}

// [hits, misses, evictions, cached_pages]
void mvt_alloc_prefix_stats(void* h, int64_t* out) {
  auto* a = static_cast<Allocator*>(h);
  out[0] = a->hits;
  out[1] = a->misses;
  out[2] = a->evictions;
  out[3] = static_cast<int64_t>(a->index.size());
}

// Fill a fixed-width int32 row (width == max_pages_per_seq); unused entries
// get the trash page 0.
void mvt_alloc_block_table_row(void* h, int64_t seq_id, int32_t* out) {
  auto* a = static_cast<Allocator*>(h);
  std::memset(out, 0, sizeof(int32_t) * a->max_pages_per_seq);
  auto it = a->tables.find(seq_id);
  if (it == a->tables.end()) return;
  std::memcpy(out, it->second.data(), sizeof(int32_t) * it->second.size());
}

// Fill [batch, max_pages] tables and [batch] lens for a batch of seq ids
// (n <= batch); padding rows are all-trash / zero.
void mvt_alloc_batch_views(void* h, const int64_t* seq_ids, int32_t n,
                           int32_t batch, int32_t* tables_out,
                           int32_t* lens_out) {
  auto* a = static_cast<Allocator*>(h);
  std::memset(tables_out, 0,
              sizeof(int32_t) * batch * a->max_pages_per_seq);
  std::memset(lens_out, 0, sizeof(int32_t) * batch);
  for (int32_t i = 0; i < n; ++i) {
    mvt_alloc_block_table_row(h, seq_ids[i],
                              tables_out + i * a->max_pages_per_seq);
    lens_out[i] = static_cast<int32_t>(mvt_alloc_seq_len(h, seq_ids[i]));
  }
}

// Stats: [total_usable, free, used, num_seqs, used_slots]
// (free includes idle LRU-cached pages — they are reclaimable)
void mvt_alloc_stats(void* h, int64_t* out) {
  auto* a = static_cast<Allocator*>(h);
  int64_t usable = a->num_pages - a->reserved;
  int64_t free_p = a->num_free();
  int64_t used_slots = 0;
  for (auto& kv : a->lens) used_slots += kv.second;
  out[0] = usable;
  out[1] = free_p;
  out[2] = usable - free_p;
  out[3] = static_cast<int64_t>(a->tables.size());
  out[4] = used_slots;
}

}  // extern "C"
