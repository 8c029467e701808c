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
