// Native graph-structure builder.
//
// Parity role: the reference's C++ aten format-conversion core
// (src/array/array.cc COOToCSR / COOSort and the CSR machinery in
// include/dgl/aten/csr.h). The TPU rebuild keeps graph construction on
// the host; numpy's argsort+gather pipeline is ~10x slower than a
// counting sort here (random-access bound), so the hot construction path
// is this small C++ library, JIT-compiled by dgl1_tpu._native and bound
// via ctypes. All functions are exact drop-ins for the numpy fallbacks
// in python (graph._build_formats / graph._build_tiles).

#include <cstdint>
#include <cstring>

extern "C" {

// Counting-sort edges by key (either src or dst). Outputs, for the sorted
// order: indptr[num_keys+1], other endpoint, edge id, and the sorted key
// itself. All output arrays are caller-allocated. Stable: edges with the
// same key keep ascending edge-id order.
void build_adj(const int32_t* key, const int32_t* other, int64_t num_edges,
               int32_t num_keys, int32_t* indptr, int32_t* sorted_other,
               int32_t* sorted_eid, int32_t* sorted_key) {
  // counts
  for (int32_t i = 0; i <= num_keys; ++i) indptr[i] = 0;
  for (int64_t e = 0; e < num_edges; ++e) indptr[key[e] + 1]++;
  for (int32_t i = 0; i < num_keys; ++i) indptr[i + 1] += indptr[i];
  // place (stable because e ascends)
  int32_t* cursor = new int32_t[num_keys];
  std::memcpy(cursor, indptr, sizeof(int32_t) * num_keys);
  for (int64_t e = 0; e < num_edges; ++e) {
    int32_t k = key[e];
    int32_t pos = cursor[k]++;
    sorted_other[pos] = other[e];
    sorted_eid[pos] = (int32_t)e;
    sorted_key[pos] = k;
  }
  delete[] cursor;
}

// Build the Pallas edge-tile descriptors from target-sorted edge arrays.
// T = tile slots, R = rows per block. Caller passes n_tiles computed by
// plan_tiles(); arrays rows[n_tiles], first[n_tiles], lid[n_tiles*T],
// gather[n_tiles*T], eid_out[n_tiles*T] are caller-allocated.
// lid is pre-filled with -1 and gather/eid_out with 0 by the caller.
void build_tiles(const int32_t* tgt_sorted, const int32_t* gather_sorted,
                 const int32_t* eid_sorted, int64_t num_edges,
                 int32_t num_target, int32_t T, int32_t R, int32_t* rows,
                 int32_t* first, int32_t* lid, int32_t* gather,
                 int32_t* eid_out) {
  int32_t n_blocks = (num_target + R - 1) / R;
  if (n_blocks < 1) n_blocks = 1;
  // per-block edge counts
  int64_t* cnt = new int64_t[n_blocks]();
  for (int64_t e = 0; e < num_edges; ++e) cnt[tgt_sorted[e] / R]++;
  // Empty blocks get no tiles; consumers mask their rows via block_mask.
  int64_t tile_cursor = 0;
  int64_t slot_base = 0;
  int64_t edge_cursor = 0;
  for (int32_t b = 0; b < n_blocks; ++b) {
    int64_t tiles = (cnt[b] + T - 1) / T;
    for (int64_t t = 0; t < tiles; ++t) {
      rows[tile_cursor] = b;
      first[tile_cursor] = (t == 0) ? 1 : 0;
      tile_cursor++;
    }
    for (int64_t i = 0; i < cnt[b]; ++i) {
      int64_t slot = slot_base + i;
      int64_t e = edge_cursor + i;
      lid[slot] = tgt_sorted[e] - b * R;
      gather[slot] = gather_sorted[e];
      eid_out[slot] = eid_sorted[e];
    }
    edge_cursor += cnt[b];
    slot_base += tiles * T;
  }
  delete[] cnt;
}

// Number of tiles build_tiles will produce.
int64_t plan_tiles(const int32_t* tgt_sorted, int64_t num_edges,
                   int32_t num_target, int32_t T, int32_t R) {
  int32_t n_blocks = (num_target + R - 1) / R;
  if (n_blocks < 1) n_blocks = 1;
  int64_t* cnt = new int64_t[n_blocks]();
  for (int64_t e = 0; e < num_edges; ++e) cnt[tgt_sorted[e] / R]++;
  int64_t total = 0;
  for (int32_t b = 0; b < n_blocks; ++b) {
    total += (cnt[b] + T - 1) / T;
  }
  delete[] cnt;
  return total;
}

// Parallel row gather: dst[i] = src[ids[i]] for row_bytes-sized rows.
// Parity role: the host side of DistDGL's KVStore pull fast path
// (python/dgl/distributed/kvstore.py local shared-memory reads) and the
// feature slicing in the sampling pipeline. numpy fancy indexing on this
// host is page-fault/loop bound (~25 MB/s cold); threaded memcpy reaches
// memory bandwidth.
void gather_rows(const char* src, const int64_t* ids, int64_t n,
                 int64_t row_bytes, char* dst, int32_t num_threads);

// Degree-bucketed ELL layout (see graph._build_ell for the contract and
// ladder definition — this is an exact drop-in). plan_ell writes per-rung
// (k, n_rows) pairs into meta_k/meta_nb (caller-allocated, >= 64 slots)
// and returns the bucket count; n_out[0] = total slots, n_out[1] = number
// of nonzero rows. fill_ell recomputes the plan and fills idx/eid
// (total_slots, sentinel 1<<30 / 0 padding) and inv_perm (num_target).
int32_t plan_ell(const int32_t* indptr, int32_t num_target,
                 int64_t num_edges, int64_t min_slots, int64_t* meta_k,
                 int64_t* meta_nb, int64_t* n_out);
void fill_ell(const int32_t* indptr, const int32_t* nbr_sorted,
              const int32_t* eid_sorted, int32_t num_target,
              int64_t num_edges, int64_t min_slots, int32_t* idx,
              int32_t* eid, int32_t* inv_perm);

// Fused neighbor sample + bipartite relabel (one pass, hash-map compact
// ids). Parity role: src/array/cpu/rowwise_sampling.cc (uniform, without
// replacement, Floyd's subset sampling) + src/graph/transform/
// to_bipartite.cc :: ToBlock, emitting the TPU static-shape block
// contract directly. Seeds may carry a phantom tail: only the first
// num_real_dst rows are sampled. Outputs (caller-allocated):
//   out_deg   (num_dst_pad)  sampled in-degree per dst row
//   out_lsrc  (cap_edges)    compact local src id per edge, dst-major
//   out_peid  (cap_edges)    parent edge id per edge
//   out_src   (cap_src)      parent id per local src id (seeds first)
//   counts    [n_edges, n_src]
// Returns 0 on success, -1 if cap_edges/cap_src would overflow.
int32_t sample_block(const int32_t* indptr, const int32_t* nbr,
                     const int32_t* eid, int32_t has_eid,
                     const int64_t* seeds, int64_t num_dst_pad,
                     int64_t num_real_dst, int32_t fanout,
                     uint64_t rng_seed, int64_t cap_edges, int64_t cap_src,
                     int32_t* out_deg, int32_t* out_lsrc, int32_t* out_peid,
                     int64_t* out_src, int64_t* counts);

}  // extern "C"

#include <thread>
#include <vector>

extern "C" void gather_rows(const char* src, const int64_t* ids, int64_t n,
                            int64_t row_bytes, char* dst,
                            int32_t num_threads) {
  if (num_threads < 1) num_threads = 1;
  if (num_threads > 64) num_threads = 64;
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(dst + i * row_bytes, src + ids[i] * row_bytes, row_bytes);
    }
  };
  if (num_threads == 1 || n < 4096) {
    work(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t per = (n + num_threads - 1) / num_threads;
  for (int32_t t = 0; t < num_threads; ++t) {
    int64_t lo = t * per;
    int64_t hi = lo + per < n ? lo + per : n;
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------
// ELL builder (exact drop-in for graph._build_ell's numpy fallback).
// ---------------------------------------------------------------------

namespace {

constexpr int32_t kEllSentinel = 1 << 30;
constexpr int32_t kMaxRungs = 64;

// Ladder: 1, 2, 3, then ladder[i] = ladder[i-2] * 2 until > 2^24.
int32_t make_ladder(int64_t* ladder) {
  ladder[0] = 1;
  ladder[1] = 2;
  ladder[2] = 3;
  int32_t n = 3;
  while (ladder[n - 1] < (int64_t(1) << 24)) {
    ladder[n] = ladder[n - 2] * 2;
    ++n;
  }
  return n;
}

// Shared bucketing pass: computes each row's rung after small-bucket
// coalescing. kidx_out must hold num_target entries. Returns rung count.
int32_t bucket_rows(const int32_t* indptr, int32_t num_target,
                    int64_t num_edges, int64_t min_slots, int64_t* ladder,
                    int32_t* kidx_out, int64_t* counts) {
  int32_t n_ladder = make_ladder(ladder);
  for (int32_t r = 0; r < n_ladder; ++r) counts[r] = 0;
  if (min_slots < 0) {  // default: min(1<<16, max(num_edges//4, 1))
    min_slots = num_edges / 4;
    if (min_slots < 1) min_slots = 1;
    if (min_slots > (1 << 16)) min_slots = 1 << 16;
  }
  for (int32_t v = 0; v < num_target; ++v) {
    int64_t deg = indptr[v + 1] - indptr[v];
    int32_t r = 0;
    while (r < n_ladder - 1 && ladder[r] < deg) ++r;
    kidx_out[v] = r;
    if (deg > 0) counts[r]++;
  }
  // Coalesce small rungs upward (launch overhead beats padding).
  bool moved[kMaxRungs] = {false};
  for (int32_t r = 0; r < n_ladder - 1; ++r) {
    if (counts[r] && counts[r] * ladder[r] < min_slots) {
      counts[r + 1] += counts[r];
      counts[r] = 0;
      moved[r] = true;
    }
  }
  for (int32_t v = 0; v < num_target; ++v) {
    int64_t deg = indptr[v + 1] - indptr[v];
    if (deg <= 0) continue;
    int32_t r = kidx_out[v];
    while (moved[r]) ++r;
    kidx_out[v] = r;
  }
  return n_ladder;
}

}  // namespace

extern "C" int32_t plan_ell(const int32_t* indptr, int32_t num_target,
                            int64_t num_edges, int64_t min_slots,
                            int64_t* meta_k, int64_t* meta_nb,
                            int64_t* n_out) {
  int64_t ladder[kMaxRungs];
  int64_t counts[kMaxRungs];
  int32_t* kidx = new int32_t[num_target > 0 ? num_target : 1];
  int32_t n_ladder =
      bucket_rows(indptr, num_target, num_edges, min_slots, ladder, kidx,
                  counts);
  delete[] kidx;
  int32_t n_buckets = 0;
  int64_t total_slots = 0, n_nz = 0;
  for (int32_t r = 0; r < n_ladder; ++r) {
    if (!counts[r]) continue;
    meta_k[n_buckets] = ladder[r];
    meta_nb[n_buckets] = counts[r];
    total_slots += ladder[r] * counts[r];
    n_nz += counts[r];
    ++n_buckets;
  }
  n_out[0] = total_slots;
  n_out[1] = n_nz;
  return n_buckets;
}

extern "C" void fill_ell(const int32_t* indptr, const int32_t* nbr_sorted,
                         const int32_t* eid_sorted, int32_t num_target,
                         int64_t num_edges, int64_t min_slots, int32_t* idx,
                         int32_t* eid, int32_t* inv_perm) {
  int64_t ladder[kMaxRungs];
  int64_t counts[kMaxRungs];
  int32_t* kidx = new int32_t[num_target > 0 ? num_target : 1];
  int32_t n_ladder =
      bucket_rows(indptr, num_target, num_edges, min_slots, ladder, kidx,
                  counts);
  // Per-rung base offsets, in slots and in row positions (rows come back
  // bucket-sorted, original order within a rung == numpy stable argsort).
  int64_t slot_base[kMaxRungs];
  int64_t row_base[kMaxRungs];
  int64_t sb = 0, rb = 0;
  for (int32_t r = 0; r < n_ladder; ++r) {
    slot_base[r] = sb;
    row_base[r] = rb;
    sb += counts[r] * ladder[r];
    rb += counts[r];
  }
  int64_t n_nz = rb;
  int64_t cursor_rows[kMaxRungs] = {0};
  for (int32_t v = 0; v < num_target; ++v) {
    int64_t deg = indptr[v + 1] - indptr[v];
    if (deg <= 0) {
      inv_perm[v] = (int32_t)n_nz;
      continue;
    }
    int32_t r = kidx[v];
    int64_t k = ladder[r];
    int64_t row = cursor_rows[r]++;
    inv_perm[v] = (int32_t)(row_base[r] + row);
    int64_t slot = slot_base[r] + row * k;
    int64_t s = indptr[v];
    for (int64_t i = 0; i < deg; ++i) {
      idx[slot + i] = nbr_sorted[s + i];
      eid[slot + i] = eid_sorted[s + i];
    }
    for (int64_t i = deg; i < k; ++i) {
      idx[slot + i] = kEllSentinel;
      eid[slot + i] = 0;
    }
  }
  delete[] kidx;
}

// ---------------------------------------------------------------------
// Fused neighbor sample + block relabel.
// ---------------------------------------------------------------------

namespace {

inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9E3779B97F4A7C15ull);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

// Open-addressing map parent-id -> local-id (linear probing, pow2 cap).
struct Relabel {
  int64_t* keys;
  int32_t* vals;
  uint64_t mask;
  explicit Relabel(int64_t want) {
    uint64_t cap = 64;
    while (cap < (uint64_t)want * 2) cap <<= 1;
    mask = cap - 1;
    keys = new int64_t[cap];
    vals = new int32_t[cap];
    for (uint64_t i = 0; i < cap; ++i) keys[i] = -1;
  }
  ~Relabel() {
    delete[] keys;
    delete[] vals;
  }
  // Insert if absent; returns local id (existing or assigned).
  int32_t get_or_add(int64_t key, int32_t next_id, bool* added) {
    uint64_t h = (uint64_t)key * 0x9E3779B97F4A7C15ull;
    uint64_t i = h & mask;
    while (true) {
      if (keys[i] == key) {
        *added = false;
        return vals[i];
      }
      if (keys[i] < 0) {
        keys[i] = key;
        vals[i] = next_id;
        *added = true;
        return next_id;
      }
      i = (i + 1) & mask;
    }
  }
};

}  // namespace

extern "C" int32_t sample_block(
    const int32_t* indptr, const int32_t* nbr, const int32_t* eid,
    int32_t has_eid, const int64_t* seeds, int64_t num_dst_pad,
    int64_t num_real_dst, int32_t fanout, uint64_t rng_seed,
    int64_t cap_edges, int64_t cap_src, int32_t* out_deg, int32_t* out_lsrc,
    int32_t* out_peid, int64_t* out_src, int64_t* counts) {
  Relabel map(num_real_dst + cap_edges + 1);
  // Seeds first (to_block's include_dst_in_src contract): real seeds get
  // local ids [0, num_real_dst) in order; first occurrence wins on dupes.
  if (num_real_dst > cap_src) return -1;
  for (int64_t i = 0; i < num_real_dst; ++i) {
    bool added;
    map.get_or_add(seeds[i], (int32_t)i, &added);
    out_src[i] = seeds[i];
  }
  int32_t n_src = (int32_t)num_real_dst;
  int64_t n_edges = 0;
  int64_t picked[4096];  // sampled positions within a row (fanout cap)
  if (fanout > 4096) return -1;
  for (int64_t row = 0; row < num_dst_pad; ++row) {
    if (row >= num_real_dst) {
      out_deg[row] = 0;
      continue;
    }
    int64_t v = seeds[row];
    int64_t s = indptr[v];
    int64_t d = indptr[v + 1] - s;
    int64_t take;
    if (d <= fanout) {
      take = d;
      for (int64_t i = 0; i < d; ++i) picked[i] = i;
    } else {
      // Floyd's uniform k-subset, then insertion sort ascending so the
      // emitted edge order is deterministic and scan-friendly.
      take = fanout;
      uint64_t st = rng_seed ^ (0xD1B54A32D192ED03ull * (uint64_t)(v + 1));
      int64_t n_ch = 0;
      for (int64_t j = d - take; j < d; ++j) {
        int64_t t = (int64_t)(splitmix64(st) % (uint64_t)(j + 1));
        bool dup = false;
        for (int64_t c = 0; c < n_ch; ++c) {
          if (picked[c] == t) {
            dup = true;
            break;
          }
        }
        picked[n_ch++] = dup ? j : t;
      }
      for (int64_t a = 1; a < take; ++a) {
        int64_t x = picked[a];
        int64_t b = a - 1;
        while (b >= 0 && picked[b] > x) {
          picked[b + 1] = picked[b];
          --b;
        }
        picked[b + 1] = x;
      }
    }
    if (n_edges + take > cap_edges) return -1;
    out_deg[row] = (int32_t)take;
    for (int64_t i = 0; i < take; ++i) {
      int64_t pos = s + picked[i];
      int64_t parent_src = nbr[pos];
      bool added;
      int32_t lid = map.get_or_add(parent_src, n_src, &added);
      if (added) {
        if (n_src >= cap_src) return -1;
        out_src[n_src++] = parent_src;
      }
      out_lsrc[n_edges] = lid;
      out_peid[n_edges] = has_eid ? eid[pos] : (int32_t)pos;
      ++n_edges;
    }
  }
  counts[0] = n_edges;
  counts[1] = n_src;
  return 0;
}
