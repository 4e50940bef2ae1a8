// Native DINT encoder: shortest-path parse + stream emission.
//
// Semantics mirror the reference DP encoders
// (/root/reference/vroom_env/dint_codecs.hpp single_opt_dint :190-330,
// multi_opt_dint :332-518) and are kept byte-identical with this
// repo's Python oracle (dint_tpu/codecs/dint.py) — the relaxation
// order (runs 256..16, dict sizes 16..1, exception) with strict '>'
// reproduces first-writer-wins tie-breaking.  Unlike the reference's
// collision-tolerant murmur maps, lookups verify entry content, so a
// hash collision costs a probe, never a corrupt stream.
//
// Exposed as a C ABI for ctypes.  Build: see dint_tpu/native_build.py.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kExceptions = 2;
constexpr uint32_t kMaxEntrySize = 16;
constexpr int kNumTargetSizes = 5;
constexpr uint32_t kTargetSizes[kNumTargetSizes] = {16, 8, 4, 2, 1};
constexpr uint32_t kRunKs[5] = {256, 128, 64, 32, 16};
constexpr uint32_t kSmallLimit = 1u << 16;
constexpr int64_t kBig = int64_t(1) << 60;

static inline uint64_t mix64(uint64_t z) {
  z += 0x9e3779b97f4a7c15ull;
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
  return z ^ (z >> 31);
}

// Slideable polynomial hash: h(w) = sum_t mix64(w_t) * PINV^t (mod 2^64).
// Window hashes at every position come from one prefix pass (see
// UnitScratch), so DP lookups cost O(1) hashing.
constexpr uint64_t kP = 0x9e3779b97f4a7c15ull;
constexpr uint64_t kPinv = 0xf1de83e19937733dull;  // kP * kPinv == 1 mod 2^64

static std::vector<uint64_t> g_ppow{1}, g_pinvpow{1};

static void grow_pows(size_t n) {
  while (g_ppow.size() <= n) {
    g_ppow.push_back(g_ppow.back() * kP);
    g_pinvpow.push_back(g_pinvpow.back() * kPinv);
  }
}

static inline uint64_t hash_window(const uint32_t* w, uint32_t len) {
  grow_pows(len);
  uint64_t h = 0;
  for (uint32_t t = 0; t < len; ++t) h += mix64(w[t]) * g_pinvpow[t];
  return h;
}

// Open-addressing hash table: content-verified window -> codeword index.
struct LookupMap {
  std::vector<uint64_t> keys;   // 0 = empty slot sentinel (keys are mixed)
  std::vector<uint32_t> vals;
  std::vector<uint32_t> lens;
  const uint32_t* table = nullptr;      // shared flat entry table
  std::vector<uint32_t> ent_off;        // per stored value: entry offset
  uint64_t mask = 0;

  void init(size_t capacity_pow2) {
    size_t cap = 1;
    while (cap < capacity_pow2 * 2) cap <<= 1;
    keys.assign(cap, 0);
    vals.assign(cap, 0);
    lens.assign(cap, 0);
    ent_off.assign(cap, 0);
    mask = cap - 1;
  }

  // later insertions override earlier ones with identical content,
  // mirroring prepare_for_encoding's map[hash] = i overwrite
  // (single_dictionary.hpp:154-165).
  void insert(const uint32_t* content, uint32_t len, uint32_t off,
              uint32_t index) {
    uint64_t h = hash_window(content, len);
    if (h == 0) h = 1;
    uint64_t slot = h & mask;
    while (true) {
      if (keys[slot] == 0) {
        keys[slot] = h;
        vals[slot] = index;
        lens[slot] = len;
        ent_off[slot] = off;
        return;
      }
      if (keys[slot] == h && lens[slot] == len &&
          std::memcmp(table + ent_off[slot], content, len * 4) == 0) {
        vals[slot] = index;  // override
        ent_off[slot] = off;
        return;
      }
      slot = (slot + 1) & mask;
    }
  }

  inline int64_t lookup_hashed(uint64_t h, const uint32_t* w,
                               uint32_t len) const {
    if (h == 0) h = 1;
    uint64_t slot = h & mask;
    while (true) {
      if (keys[slot] == 0) return -1;
      if (keys[slot] == h && lens[slot] == len &&
          std::memcmp(table + ent_off[slot], w, len * 4) == 0)
        return vals[slot];
      slot = (slot + 1) & mask;
    }
  }
};

struct Encoder {
  std::vector<uint32_t> table;          // flat entry table (+16 zero pad)
  std::vector<LookupMap> maps16;        // per context
  std::vector<LookupMap> maps8;         // per context (indices < 256 only)
  int n_contexts = 0;

  // per-unit scratch (reused across units and trials)
  std::vector<int64_t> cost;
  std::vector<int32_t> parent;
  std::vector<int32_t> codeword;
  std::vector<uint32_t> zrun;
  std::vector<uint64_t> prefix;            // rolling-hash prefix sums
  std::vector<uint64_t> winhash[kNumTargetSizes];  // per-size window hashes
};

// Precompute zero-run lengths and all window hashes for one unit; shared
// by every trial parse (the multi encoder runs 12 parses per unit).
static void precompute_unit(Encoder* e, const uint32_t* gaps, int64_t n) {
  e->zrun.assign(n, 0);
  uint32_t run = 0;
  for (int64_t i = n - 1; i >= 0; --i) {
    run = gaps[i] == 0 ? (run < 256 ? run + 1 : 256) : 0;
    e->zrun[i] = run;
  }
  grow_pows(size_t(n) + 1);
  e->prefix.resize(n + 1);
  e->prefix[0] = 0;
  for (int64_t i = 0; i < n; ++i)
    e->prefix[i + 1] = e->prefix[i] + mix64(gaps[i]) * g_pinvpow[i];
  for (int t = 0; t < kNumTargetSizes; ++t) {
    int64_t s = kTargetSizes[t];
    int64_t cnt = n - s + 1;
    e->winhash[t].resize(cnt > 0 ? cnt : 0);
    for (int64_t i = 0; i < cnt; ++i)
      e->winhash[t][i] = (e->prefix[i + s] - e->prefix[i]) * g_ppow[i];
  }
}

// DP parse of gaps[0..n) under one lookup map; fills enc->cost/parent/cw.
// precompute_unit must have run for this unit.
static void parse(Encoder* e, const LookupMap& map, const uint32_t* gaps,
                  int64_t n) {
  e->cost.assign(n + 1, kBig);
  e->parent.assign(n + 1, 0);
  e->codeword.assign(n + 1, 1);
  e->cost[0] = 0;
  for (int64_t j = 1; j <= n; ++j) {
    int64_t best = kBig;
    int32_t bpar = 0, bcw = 1;
    // run edges, largest span (earliest source) first
    for (int t = 0; t < 5; ++t) {
      int64_t k = kRunKs[t];
      if (j >= k && e->zrun[j - k] >= (uint32_t)k) {
        int64_t c = e->cost[j - k] + 1;
        if (c < best) { best = c; bpar = int32_t(j - k); bcw = kExceptions + t; }
      }
    }
    // dictionary-hit edges
    for (int t = 0; t < kNumTargetSizes; ++t) {
      int64_t s = kTargetSizes[t];
      if (j >= s) {
        int64_t i = j - s;
        int64_t hit = map.lookup_hashed(e->winhash[t][i], gaps + i, (uint32_t)s);
        if (hit >= 0) {
          int64_t c = e->cost[i] + 1;
          if (c < best) { best = c; bpar = int32_t(i); bcw = int32_t(hit); }
        }
      }
    }
    // exception edge
    {
      bool large = gaps[j - 1] >= kSmallLimit;
      int64_t c = e->cost[j - 1] + 2 + (large ? 1 : 0);
      if (c < best) { best = c; bpar = int32_t(j - 1); bcw = large ? 1 : 0; }
    }
    e->cost[j] = best;
    e->parent[j] = bpar;
    e->codeword[j] = bcw;
  }
}

static void emit(const Encoder* e, const uint32_t* gaps, int64_t n, int b,
                 std::vector<uint8_t>* out) {
  // backtrack (nodes strictly decrease), then emit in forward order
  static thread_local std::vector<int32_t> nodes;
  nodes.clear();
  for (int64_t i = n; i != 0; i = e->parent[i]) nodes.push_back(int32_t(i));
  for (size_t t = nodes.size(); t-- > 0;) {
    int32_t v = nodes[t];
    int32_t cw = e->codeword[v];
    if (cw > 1) {
      out->push_back(uint8_t(cw & 0xff));
      if (b == 16) out->push_back(uint8_t((cw >> 8) & 0xff));
    } else {
      uint32_t val = gaps[e->parent[v]];
      if (val < kSmallLimit) {
        out->push_back(0);
        if (b == 16) out->push_back(0);
        out->push_back(uint8_t(val & 0xff));
        out->push_back(uint8_t((val >> 8) & 0xff));
      } else {
        out->push_back(1);
        if (b == 16) out->push_back(0);
        for (int k = 0; k < 4; ++k) out->push_back(uint8_t((val >> (8 * k)) & 0xff));
      }
    }
  }
}

static int64_t stream_bytes(const Encoder* e, int64_t n, int b) {
  int64_t total = 0;
  for (int64_t i = n; i != 0; i = e->parent[i]) {
    int32_t cw = e->codeword[i];
    if (b == 16)
      total += cw > 1 ? 2 : (cw == 0 ? 4 : 6);
    else
      total += cw > 1 ? 1 : (cw == 0 ? 3 : 5);
  }
  return total;
}

}  // namespace

extern "C" {

// offsets/lengths: (n_contexts, entries_per_ctx) row-major; table flat u32.
void* dint_encoder_create(const uint32_t* table, int64_t table_len,
                          const uint32_t* offsets, const int32_t* lengths,
                          const int32_t* counts, int32_t n_contexts,
                          int32_t entries_per_ctx) {
  Encoder* e = new Encoder();
  e->n_contexts = n_contexts;
  e->table.assign(table, table + table_len);
  e->table.resize(table_len + kMaxEntrySize, 0);
  static const uint32_t zeros[256] = {0};
  e->maps16.resize(n_contexts);
  e->maps8.resize(n_contexts);
  for (int32_t d = 0; d < n_contexts; ++d) {
    int32_t cnt = counts[d];
    e->maps16[d].table = e->table.data();
    e->maps8[d].table = e->table.data();
    e->maps16[d].init(size_t(cnt) + 16);
    e->maps8[d].init(512);
    // runs first (indices 2..6), then entries ascending (overrides)
    uint32_t idx = kExceptions;
    for (uint32_t nrun = 256; nrun >= 16; nrun /= 2, ++idx) {
      e->maps16[d].insert(zeros, nrun, /*off=*/0, idx);
      e->maps8[d].insert(zeros, nrun, 0, idx);
    }
    for (int32_t i = kExceptions + 5; i < cnt; ++i) {
      uint32_t off = offsets[int64_t(d) * entries_per_ctx + i];
      int32_t len = lengths[int64_t(d) * entries_per_ctx + i];
      if (len > (int32_t)kMaxEntrySize) continue;  // run rows: not content
      e->maps16[d].insert(e->table.data() + off, len, off, uint32_t(i));
      if (i < 256) e->maps8[d].insert(e->table.data() + off, len, off, uint32_t(i));
    }
  }
  return e;
}

void dint_encoder_destroy(void* enc) { delete static_cast<Encoder*>(enc); }

// mode 0: single-dict opt b=16 (context 0), one parse per unit.
// mode 1: multi exhaustive — per unit try all contexts x {16,8}; emit
//         selector byte + winner (multi_opt_dint :467-491 tie rules).
// Returns total bytes written, or -(needed) if out_cap insufficient.
int64_t dint_encode_units(void* enc, const uint32_t* gaps,
                          const int64_t* unit_offs, int64_t n_units, int mode,
                          uint8_t* out_buf, int64_t out_cap,
                          int64_t* out_lens) {
  Encoder* e = static_cast<Encoder*>(enc);
  std::vector<uint8_t> buf;
  int64_t written = 0;
  for (int64_t u = 0; u < n_units; ++u) {
    const uint32_t* g = gaps + unit_offs[u];
    int64_t n = unit_offs[u + 1] - unit_offs[u];
    buf.clear();
    precompute_unit(e, g, n);
    if (mode == 0) {
      parse(e, e->maps16[0], g, n);
      emit(e, g, n, 16, &buf);
    } else {
      int64_t best_size = kBig;
      int32_t best_sc = 0;
      for (int32_t s = 0; s < e->n_contexts; ++s) {
        parse(e, e->maps16[s], g, n);
        int64_t sz16 = stream_bytes(e, n, 16);
        parse(e, e->maps8[s], g, n);
        int64_t sz8 = stream_bytes(e, n, 8);
        int64_t sz = sz16;
        int32_t sc = s;
        if (sz8 <= sz16) { sz = sz8; sc = s + e->n_contexts; }
        if (sz < best_size) { best_size = sz; best_sc = sc; }
      }
      buf.push_back(uint8_t(best_sc));
      int32_t ctx = best_sc % e->n_contexts;
      int b = best_sc >= e->n_contexts ? 8 : 16;
      parse(e, b == 8 ? e->maps8[ctx] : e->maps16[ctx], g, n);
      emit(e, g, n, b, &buf);
    }
    if (written + int64_t(buf.size()) > out_cap)
      return -(written + int64_t(buf.size()));
    std::memcpy(out_buf + written, buf.data(), buf.size());
    written += int64_t(buf.size());
    out_lens[u] = int64_t(buf.size());
  }
  return written;
}

}  // extern "C"
