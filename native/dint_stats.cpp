// Native sub-block statistics collector for dint_tpu.
//
// Exact-content replacement for the numpy path in
// dint_tpu/stats/collectors.py + block_stats._filter_sort (reference
// semantics: statistics_collectors.hpp "adjusted" single :109-118 and
// multi :90-107, freq_length_sorter :57-64).  The reference counts
// windows under a 64-bit hash (collisions conflate); like the numpy
// path we count exact window content: open-addressing tables keyed by
// a 64-bit hash with full content verification against an arena, so
// two distinct windows never share a counter.
//
// One (context, size) table per target size; single has one context,
// multi has one per selector (ceil_log2(ceil_log2(max+1)) of each
// 256-int block).  finalize() applies the DSF saving filter
// (freq * (initial_bpi*len - codeword_bits) / total > threshold, with
// len==1 kept unconditionally — dictionary_builders compute_saving
// semantics) and sorts by (freq desc, len desc, content asc), matching
// block_stats._filter_sort's np.lexsort key for bit-identical output.
//
// Built by dint_tpu/stats/native_stats.py (g++ -O3 shared object).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kMaxSizes = 8;
constexpr int kMaxCtx = 8;

inline uint64_t hash_win(const uint32_t* w, int s) {
  uint64_t h = 0x9E3779B97F4A7C15ull ^ (uint64_t)s;
  for (int i = 0; i < s; ++i) {
    h ^= (uint64_t)w[i] * 0x9DDFEA08EB382D69ull;
    h = (h ^ (h >> 29)) * 0xBF58476D1CE4E5B9ull;
  }
  h ^= h >> 32;
  return h | 1;  // 0 marks an empty slot
}

struct Table {
  int size = 0;  // ints per window
  std::vector<uint64_t> hash;
  std::vector<uint32_t> off;  // arena element offset / size (window index)
  std::vector<uint64_t> cnt;
  std::vector<uint32_t> arena;  // unique window contents, size ints each
  uint64_t n = 0;
  size_t mask = 0;

  void init(int s) {
    size = s;
    size_t cap = 1 << 16;
    hash.assign(cap, 0);
    off.assign(cap, 0);
    cnt.assign(cap, 0);
    mask = cap - 1;
  }

  void grow() {
    size_t cap = hash.size() * 2;
    std::vector<uint64_t> nh(cap, 0);
    std::vector<uint32_t> no(cap);
    std::vector<uint64_t> nc(cap);
    size_t nm = cap - 1;
    for (size_t i = 0; i < hash.size(); ++i) {
      if (!hash[i]) continue;
      size_t j = hash[i] & nm;
      while (nh[j]) j = (j + 1) & nm;
      nh[j] = hash[i];
      no[j] = off[i];
      nc[j] = cnt[i];
    }
    hash.swap(nh);
    off.swap(no);
    cnt.swap(nc);
    mask = nm;
  }

  inline void add(const uint32_t* w, uint64_t weight) {
    add_hashed(w, hash_win(w, size), weight);
  }

  inline void add_hashed(const uint32_t* w, uint64_t h, uint64_t weight) {
    size_t i = h & mask;
    while (true) {
      uint64_t hv = hash[i];
      if (!hv) {
        hash[i] = h;
        off[i] = (uint32_t)(arena.size() / (size_t)size);
        cnt[i] = weight;
        arena.insert(arena.end(), w, w + size);
        if (++n * 2 > hash.size()) grow();
        return;
      }
      if (hv == h &&
          std::memcmp(&arena[(size_t)off[i] * size], w,
                      (size_t)size * 4) == 0) {
        cnt[i] += weight;
        return;
      }
      i = (i + 1) & mask;
    }
  }
};

struct Rec {
  uint64_t freq;
  uint64_t head;  // first two content words, (c0<<32)|c1 — numeric
                  // compare == u32-lexicographic compare of (c0, c1)
  const uint32_t* ptr;  // resolved content (len words, arena-owned)
  int32_t len;
};

struct Stats {
  int multi = 0;
  int n_sizes = 0;
  int n_ctx = 0;
  int sizes[kMaxSizes] = {0};
  int block_size = 256;
  Table tab[kMaxCtx][kMaxSizes];
  std::vector<Rec> sorted[kMaxCtx];  // finalize() output order

  inline int selector(const uint32_t* b) const {
    uint32_t mx = 0;
    for (int i = 0; i < block_size; ++i) mx = b[i] > mx ? b[i] : mx;
    // sel = #{thresholds <= mx} over {2,4,16,256,65536}
    int s = (mx >= 2) + (mx >= 4) + (mx >= 16) + (mx >= 256);
    return s + (mx >= 65536);
  }

  // Hash-then-probe in prefetched batches: the tables are far larger
  // than L2, so the probe stream is all cache misses — computing a
  // batch of hashes first and prefetching each home slot overlaps the
  // misses (same discipline as the encoder's lookup_pass).
  static void add_windows(Table& t, const uint32_t* base, int s, int64_t m) {
    constexpr int64_t B = 64;
    uint64_t hs[B];
    for (int64_t k0 = 0; k0 < m; k0 += B) {
      int64_t e = (m - k0) < B ? (m - k0) : B;
      for (int64_t i = 0; i < e; ++i) {
        hs[i] = hash_win(base + (k0 + i) * s, s);
        __builtin_prefetch(&t.hash[hs[i] & t.mask]);
      }
      for (int64_t i = 0; i < e; ++i)
        t.add_hashed(base + (k0 + i) * s, hs[i], 1);
    }
  }

  void add_list(const uint32_t* buf, int64_t n) {
    if (!multi) {
      for (int si = 0; si < n_sizes; ++si) {
        int s = sizes[si];
        add_windows(tab[0][si], buf, s, n / s);
      }
      return;
    }
    int64_t nb = n / block_size;
    for (int64_t b = 0; b < nb; ++b) {
      const uint32_t* blk = buf + b * block_size;
      int sel = selector(blk);
      for (int si = 0; si < n_sizes; ++si) {
        int s = sizes[si];
        add_windows(tab[sel][si], blk, s, block_size / s);
      }
    }
  }
};

}  // namespace

extern "C" {

void* stats_create(int multi, const int32_t* sizes, int n_sizes,
                   int block_size, int n_selectors) {
  Stats* st = new Stats();
  st->multi = multi;
  st->n_sizes = n_sizes;
  st->block_size = block_size;
  st->n_ctx = multi ? n_selectors : 1;
  for (int i = 0; i < n_sizes; ++i) st->sizes[i] = sizes[i];
  for (int c = 0; c < st->n_ctx; ++c)
    for (int i = 0; i < n_sizes; ++i) st->tab[c][i].init(sizes[i]);
  return st;
}

void stats_destroy(void* h) { delete (Stats*)h; }

// flat: concatenated gap-transformed lists; offs: n_lists+1 element
// offsets into flat.
void stats_add(void* h, const uint32_t* flat, const int64_t* offs,
               int64_t n_lists) {
  Stats* st = (Stats*)h;
  for (int64_t i = 0; i < n_lists; ++i)
    st->add_list(flat + offs[i], offs[i + 1] - offs[i]);
}

// DSF filter + (freq desc, len desc, content asc) sort; returns U.
int64_t stats_finalize(void* h, int ctx, double total_integers,
                       double initial_bpi, double codeword_bits,
                       double threshold) {
  Stats* st = (Stats*)h;
  std::vector<Rec>& out = st->sorted[ctx];
  out.clear();
  size_t survivors = 0;  // pre-count so the vector allocates once
  for (int si = 0; si < st->n_sizes; ++si) {
    Table& t = st->tab[ctx][si];
    double per_len = initial_bpi * (double)t.size - codeword_bits;
    for (size_t i = 0; i < t.hash.size(); ++i) {
      if (!t.hash[i]) continue;
      double saving = (double)t.cnt[i] * per_len / total_integers;
      if (saving > threshold || t.size == 1) ++survivors;
    }
  }
  out.reserve(survivors);
  for (int si = 0; si < st->n_sizes; ++si) {
    Table& t = st->tab[ctx][si];
    int len = t.size;
    double per_len = initial_bpi * (double)len - codeword_bits;
    for (size_t i = 0; i < t.hash.size(); ++i) {
      if (!t.hash[i]) continue;
      double saving = (double)t.cnt[i] * per_len / total_integers;
      if (saving > threshold || len == 1) {
        const uint32_t* p = &t.arena[(size_t)t.off[i] * len];
        uint64_t head = ((uint64_t)p[0] << 32) | (len > 1 ? p[1] : 0);
        out.push_back(Rec{t.cnt[i], head, p, len});
      }
    }
  }
  std::sort(out.begin(), out.end(), [](const Rec& a, const Rec& b) {
    if (a.freq != b.freq) return a.freq > b.freq;
    if (a.len != b.len) return a.len > b.len;
    if (a.head != b.head) return a.head < b.head;
    for (int i = 2; i < a.len; ++i)  // equal lengths beyond the head
      if (a.ptr[i] != b.ptr[i]) return a.ptr[i] < b.ptr[i];
    return false;
  });
  return (int64_t)out.size();
}

// lens: (U,) i32; freqs: (U,) i64; data: (U, max_entry_size) u32
// zero-padded.  Call after stats_finalize(ctx).
void stats_export(void* h, int ctx, int max_entry_size, int32_t* lens,
                  int64_t* freqs, uint32_t* data) {
  Stats* st = (Stats*)h;
  std::vector<Rec>& out = st->sorted[ctx];
  constexpr size_t PF = 16;  // arena reads are in sorted (random) order
  for (size_t i = 0; i < out.size(); ++i) {
    if (i + PF < out.size()) __builtin_prefetch(out[i + PF].ptr);
    const Rec& r = out[i];
    lens[i] = r.len;
    freqs[i] = (int64_t)r.freq;
    uint32_t* row = data + i * (size_t)max_entry_size;
    std::memset(row, 0, (size_t)max_entry_size * 4);
    std::memcpy(row, r.ptr, (size_t)r.len * 4);
  }
}

// Unpadded columnar export of the sorted records: lens (U,) i32,
// freqs (U,) i64, vals = concatenated contents.  Cheap alternative to
// the (U, 16)-padded stats_export when only the top-K padded rows are
// needed downstream (dictionary targets cap at num_entries).
int64_t stats_vals_words(void* h, int ctx) {
  Stats* st = (Stats*)h;
  int64_t n = 0;
  for (const Rec& r : st->sorted[ctx]) n += r.len;
  return n;
}

void stats_export_flat(void* h, int ctx, int32_t* lens, int64_t* freqs,
                       uint32_t* vals) {
  Stats* st = (Stats*)h;
  std::vector<Rec>& out = st->sorted[ctx];
  constexpr size_t PF = 16;
  uint32_t* p = vals;
  for (size_t i = 0; i < out.size(); ++i) {
    if (i + PF < out.size()) __builtin_prefetch(out[i + PF].ptr);
    const Rec& r = out[i];
    lens[i] = r.len;
    freqs[i] = (int64_t)r.freq;
    std::memcpy(p, r.ptr, (size_t)r.len * 4);
    p += r.len;
  }
}

// on-disk record stream straight from the columnar form
void records_from_flat(const int32_t* lens, const int64_t* freqs,
                       const uint32_t* vals, int64_t U, uint32_t* out) {
  const uint32_t* v = vals;
  uint32_t* p = out;
  for (int64_t i = 0; i < U; ++i) {
    int n = lens[i];
    *p++ = (uint32_t)n;
    *p++ = (uint32_t)((uint64_t)freqs[i] & 0xFFFFFFFFull);
    std::memcpy(p, v, (size_t)n * 4);
    p += n;
    v += n;
  }
}

// Gap-transform a whole collection in one pass (block_statistics
// :62-79 semantics): for docs, out = [d0, d1-d0-1, ...] per list; for
// freqs, out = f-1.  words is the raw length-prefixed stream; offs[i]
// points at list i's length word, lens[i] its payload length.
// Returns total ints written; out_offs gets n_seqs+1 offsets.
int64_t collection_gaps(const uint32_t* words, const int64_t* offs,
                        const int64_t* lens, int64_t n_seqs,
                        int docs_mode, uint32_t* out, int64_t* out_offs) {
  int64_t w = 0;
  for (int64_t i = 0; i < n_seqs; ++i) {
    out_offs[i] = w;
    const uint32_t* v = words + offs[i] + 1;
    int64_t n = lens[i];
    if (!n) continue;
    if (docs_mode) {
      out[w++] = v[0];
      for (int64_t j = 1; j < n; ++j) out[w++] = v[j] - v[j - 1] - 1;
    } else {
      for (int64_t j = 0; j < n; ++j) out[w++] = v[j] - 1;
    }
  }
  out_offs[n_seqs] = w;
  return w;
}

// --- ragged helpers -------------------------------------------------
// numpy repeat/fancy-index at 30M+ elements runs at only a few M
// elem/s on this host; these sequential loops run at memory speed.

// data16: (U, max) zero-padded rows <- flat concatenated values
void ragged_pad(const int32_t* lens, int64_t U, int max_entry_size,
                const uint32_t* flat, uint32_t* data16) {
  const uint32_t* p = flat;
  for (int64_t i = 0; i < U; ++i) {
    uint32_t* row = data16 + i * (size_t)max_entry_size;
    int n = lens[i];
    std::memcpy(row, p, (size_t)n * 4);
    std::memset(row + n, 0, (size_t)(max_entry_size - n) * 4);
    p += n;
  }
}

// flat concatenated values <- (U, max) padded rows
void ragged_flatten(const int32_t* lens, int64_t U, int max_entry_size,
                    const uint32_t* data16, uint32_t* flat) {
  uint32_t* p = flat;
  for (int64_t i = 0; i < U; ++i) {
    std::memcpy(p, data16 + i * (size_t)max_entry_size,
                (size_t)lens[i] * 4);
    p += lens[i];
  }
}

// on-disk record stream: per record (u32 size, u32 freq, size x u32)
void records_build(const int32_t* lens, const int64_t* freqs,
                   const uint32_t* data16, int64_t U, int max_entry_size,
                   uint32_t* out) {
  uint32_t* p = out;
  for (int64_t i = 0; i < U; ++i) {
    int n = lens[i];
    *p++ = (uint32_t)n;
    *p++ = (uint32_t)((uint64_t)freqs[i] & 0xFFFFFFFFull);
    std::memcpy(p, data16 + i * (size_t)max_entry_size, (size_t)n * 4);
    p += n;
  }
}

}  // extern "C"
