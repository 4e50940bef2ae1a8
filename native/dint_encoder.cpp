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

#include <chrono>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <cstdlib>
#include <mutex>
#include <thread>
#include <unordered_map>
#include <vector>

#if defined(__AVX512F__) && !defined(DINT_SCALAR)
#include <immintrin.h>
#define DINT_AVX512 1
#endif

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

// Open-addressing hash table: window -> codeword indices.  One fused
// table per context holds BOTH the b=16 index and the b=8 index
// (entries with codeword < 256 only), so one probe pass serves both
// trial parses of the multi encoder.
//
// Slots are a single 16-byte struct (key + both values): a probe costs
// ONE cache line.  The probe key folds the window length into the
// 64-bit rolling hash and is trusted without content comparison on the
// hot path — every emitted unit is decode-verified against its input
// afterwards (encode_units), and the vanishingly-rare hash collision
// falls back to a content-verified re-parse.  Insertions always verify
// content (lens/ent_off kept separately, cold), so the map's final
// content->index assignment matches the oracle exactly.
constexpr uint32_t kNoHit = 0xffffffffu;
constexpr uint16_t kNoHit8 = 0xffffu;

static inline uint64_t slot_key(uint64_t h, uint32_t len) {
  uint64_t k = h ^ (uint64_t(len) * 0x9ddfea08eb382d69ull);
  // upper 48 bits form the stored fingerprint; must be nonzero
  return (k >> 16) ? k : (k | (1ull << 16));
}

// Count of trusted-fingerprint probe HITS since the last reset.  When
// a whole lookup pass records zero trusted hits, every edge the DP saw
// came from a content-exact source (direct-value tables, packed-key
// maps, zero-run constants, or true misses — a fingerprint false MISS
// is impossible since identical content always produces the identical
// key), so the parse equals the content-verified parse and
// verify_parse can be skipped.
static thread_local uint64_t g_trusted_hits = 0;

struct LookupMap {
  // hot: one u64 per slot = fingerprint48 << 16 | val16codeword.
  // 131072 slots x 8B = 1 MiB — L2-resident on this machine (2 MiB L2),
  // which is what makes the probe passes fast.
  std::vector<uint64_t> slots;
  std::vector<uint16_t> vals8;    // b=8 codeword (kNoHit8 if none); only
                                  // read on hit by the multi encoder
  std::vector<uint32_t> lens;     // insert-time verification only
  std::vector<uint32_t> ent_off;  // insert-time verification only
  const uint32_t* table = nullptr;  // shared flat entry table
  uint64_t mask = 0;
  // size-1 direct map: value -> b=16 codeword (content-exact, no
  // hashing) for values < kDir1; -1 = absent.  99.9% of size-1 probes
  // land here, and the access pattern concentrates at small gap
  // values (L1-resident head).
  static constexpr uint32_t kDir1 = 1u << 16;
  std::vector<int32_t> dirv;
  // size-2 direct map: (v0<<8)|v1 -> b=16 codeword for windows whose
  // both gaps are < 256 (the overwhelming majority).  Content-exact
  // like dirv; 256 KiB, L2-resident — replaces a hash + 1 MiB map
  // probe with one load for the highest-volume probe class.
  std::vector<int32_t> dir2;
  // content-exact len-4 map: key = the 4 gap bytes packed LE (windows
  // with all gaps < 256 — nearly all size-4 probes), slot = key32<<32
  // | 1<<16 | val16.  Sized to the len-4 entry census (grows by
  // rehash), so it is far smaller than the main map AND exact — len-4
  // edges skip the verify-pass memcmp entirely.
  std::vector<uint64_t> map4;
  uint64_t mask4 = 0;
  size_t cnt4 = 0;

  static inline uint64_t hash4(uint32_t key) {
    return (uint64_t(key) * 0x9e3779b97f4a7c15ull) >> 24;
  }

  void insert4(uint32_t key, uint32_t val) {
    if ((cnt4 + 1) * 2 > map4.size()) {  // grow: load factor <= 0.5
      std::vector<uint64_t> old;
      old.swap(map4);
      map4.assign(old.size() * 2, 0);
      mask4 = map4.size() - 1;
      for (uint64_t s : old)
        if (s) {
          uint64_t slot = hash4(uint32_t(s >> 32)) & mask4;
          while (map4[slot]) slot = (slot + 1) & mask4;
          map4[slot] = s;
        }
    }
    uint64_t slot = hash4(key) & mask4;
    while (true) {
      uint64_t s = map4[slot];
      if (s == 0) {
        map4[slot] = (uint64_t(key) << 32) | 0x10000u | val;
        ++cnt4;
        return;
      }
      if (uint32_t(s >> 32) == key) {
        map4[slot] = (uint64_t(key) << 32) | 0x10000u | val;  // override
        return;
      }
      slot = (slot + 1) & mask4;
    }
  }

  inline uint32_t find4(uint32_t key) const {
    uint64_t slot = hash4(key) & mask4;
    while (true) {
      uint64_t s = map4[slot];
      if (s == 0) return kNoHit;
      if (uint32_t(s >> 32) == key) return uint32_t(s & 0xffff);
      slot = (slot + 1) & mask4;
    }
  }

  // content-exact overflow maps for the rare size-1 (value >= kDir1)
  // and size-2 (a gap >= 256) windows the direct tables don't cover:
  // the 64-bit key IS the window content, so hits here are exact and
  // never force a verify pass.  Both censuses are tiny (a few hundred
  // entries at most), so the maps stay L1/L2-resident.
  struct XSlot {
    uint64_t key;  // size1: (kX1Tag<<32)|value; size2: (v0<<32)|v1
    uint32_t val;
    uint32_t pad;
  };
  // Size-1 keys are tagged with v0 = 0xffffffff.  A size-2 entry whose
  // FIRST gap is 0xffffffff (the u32 maximum) would be ambiguous, so
  // such entries are excluded from xmap at insert AND probe time (they
  // take the trusted find_fast path instead) — xmap hits are therefore
  // always unambiguous content matches.
  static constexpr uint64_t kX1Tag = 0xffffffffull;
  std::vector<XSlot> xmap;
  uint64_t xmask = 0;
  size_t xcnt = 0;

  static inline uint64_t xhash(uint64_t key) {
    return (key * 0x9e3779b97f4a7c15ull) >> 29;
  }

  void xinsert(uint64_t key, uint32_t val) {
    if ((xcnt + 1) * 2 > xmap.size()) {
      std::vector<XSlot> old;
      old.swap(xmap);
      xmap.assign(old.size() * 2, XSlot{0, 0, 0});
      xmask = xmap.size() - 1;
      for (const XSlot& s : old)
        if (s.key) {
          uint64_t slot = xhash(s.key) & xmask;
          while (xmap[slot].key) slot = (slot + 1) & xmask;
          xmap[slot] = s;
        }
    }
    uint64_t slot = xhash(key) & xmask;
    while (true) {
      XSlot& s = xmap[slot];
      if (s.key == 0) {
        s.key = key;
        s.val = val;
        ++xcnt;
        return;
      }
      if (s.key == key) {
        s.val = val;  // override, like the main map
        return;
      }
      slot = (slot + 1) & xmask;
    }
  }

  inline uint32_t xfind(uint64_t key) const {
    uint64_t slot = xhash(key) & xmask;
    while (true) {
      const XSlot& s = xmap[slot];
      if (s.key == 0) return kNoHit;
      if (s.key == key) return s.val;
      slot = (slot + 1) & xmask;
    }
  }
  // negative filter for the high-miss window sizes (16/8): one bit per
  // inserted len>=8 entry, keyed by slot_key bits.  Bit clear => the
  // window is DEFINITELY absent (no false negatives), so most misses
  // skip the 1 MiB map probe for a 256 KiB L2 bit test.
  static constexpr uint64_t kFilterBits = 1ull << 21;
  std::vector<uint64_t> filter;

  static inline uint64_t filter_bit(uint64_t k) {
    return (k >> 40) & (kFilterBits - 1);
  }

  void init(size_t capacity) {
    size_t cap = 1;
    while (cap < capacity * 2) cap <<= 1;  // load factor <= 0.5
    slots.assign(cap, 0);
    vals8.assign(cap, kNoHit8);
    lens.assign(cap, 0);
    ent_off.assign(cap, 0);
    mask = cap - 1;
    dirv.assign(kDir1, -1);
    dir2.assign(1u << 16, -1);
    map4.assign(1u << 13, 0);
    mask4 = map4.size() - 1;
    cnt4 = 0;
    xmap.assign(1u << 10, XSlot{0, 0, 0});
    xmask = xmap.size() - 1;
    xcnt = 0;
    filter.assign(kFilterBits / 64, 0);
  }

  // later insertions override earlier ones with identical content,
  // mirroring prepare_for_encoding's map[hash] = i overwrite
  // (single_dictionary.hpp:154-165).
  void insert(const uint32_t* content, uint32_t len, uint32_t off,
              uint32_t index) {
    uint64_t k = slot_key(hash_window(content, len), len);
    if (len >= 8) filter[filter_bit(k) >> 6] |= 1ull << (filter_bit(k) & 63);
    uint64_t fp = k & ~0xffffull;
    uint64_t slot = k & mask;
    while (true) {
      if (slots[slot] == 0) {
        slots[slot] = fp | index;
        if (index < 256) vals8[slot] = uint16_t(index);
        lens[slot] = len;
        ent_off[slot] = off;
        break;
      }
      if ((slots[slot] & ~0xffffull) == fp && lens[slot] == len &&
          std::memcmp(table + ent_off[slot], content, len * 4) == 0) {
        slots[slot] = fp | index;  // override
        if (index < 256) vals8[slot] = uint16_t(index);
        ent_off[slot] = off;
        break;
      }
      slot = (slot + 1) & mask;
    }
    if (len == 1 && content[0] < kDir1) dirv[content[0]] = int32_t(index);
    if (len == 1 && content[0] >= kDir1)
      xinsert((kX1Tag << 32) | content[0], index);
    if (len == 2 && content[0] < 256 && content[1] < 256)
      dir2[(content[0] << 8) | content[1]] = int32_t(index);
    if (len == 2 && (content[0] >= 256 || content[1] >= 256) &&
        content[0] != 0xffffffffu)  // kX1Tag ambiguity exclusion
      xinsert((uint64_t(content[0]) << 32) | content[1], index);
    if (len == 4 && (content[0] | content[1] | content[2] | content[3]) < 256)
      insert4(content[0] | (content[1] << 8) | (content[2] << 16) |
                  (content[3] << 24),
              index);
  }

  // Trusted probe (hot path): matches the 48-bit fingerprint only;
  // verify_parse backstops collisions.  Returns slot index or SIZE_MAX.
  inline size_t find_fast_keyed(uint64_t k) const {
    uint64_t fp = k & ~0xffffull;
    uint64_t slot = k & mask;
    while (true) {
      uint64_t s = slots[slot];
      if ((s & ~0xffffull) == fp && s != 0) {
        ++g_trusted_hits;
        return size_t(slot);
      }
      if (s == 0) return size_t(-1);
      slot = (slot + 1) & mask;
    }
  }

  inline size_t find_fast(uint64_t h, uint32_t len) const {
    return find_fast_keyed(slot_key(h, len));
  }

  // Content-verified probe (fallback path).
  inline size_t find_verified(uint64_t h, const uint32_t* w,
                              uint32_t len) const {
    return find_verified_keyed(slot_key(h, len), w, len);
  }

  inline size_t find_verified_keyed(uint64_t k, const uint32_t* w,
                                    uint32_t len) const {
    uint64_t fp = k & ~0xffffull;
    uint64_t slot = k & mask;
    while (true) {
      uint64_t s = slots[slot];
      if (s == 0) return size_t(-1);
      if ((s & ~0xffffull) == fp && lens[slot] == len &&
          std::memcmp(table + ent_off[slot], w, len * 4) == 0)
        return size_t(slot);
      slot = (slot + 1) & mask;
    }
  }

  inline uint32_t val16_at(size_t slot) const {
    return uint32_t(slots[slot] & 0xffff);
  }

  inline int64_t lookup_hashed(uint64_t h, const uint32_t* w,
                               uint32_t len) const {
    size_t s = find_verified(h, w, len);
    return s == size_t(-1) ? -1 : int64_t(val16_at(s));
  }
};

// Per-unit precomputed state shared by every trial parse.
struct UnitScratch {
  std::vector<uint32_t> zrun;
  std::vector<uint64_t> prefix;  // rolling-hash prefix sums
  bool has_run16 = false;        // any run >= 16 (DP run edges reachable)
};

constexpr int kMaxCtxFwd = 8;  // matches kMaxCtx below

// All mutable per-unit working state lives in one thread_local bundle,
// so worker threads encode disjoint unit ranges concurrently over the
// SHARED read-only Encoder (maps/tables) — the prepare-parallel half
// of the reference's semiasync_queue contract; the commit half is the
// ordered concatenation in dint_encode_units.
// Per-position bundle of EVERY context's codewords for one window —
// filled once by the combined-map probe pass, read by all 12 trial
// parses.  Mirrors MSlot's value block (one 24-byte copy on hit).
// Sentinel 0 = absent (indices 0/1 are exceptions, never entries).
struct alignas(32) MVal {
  uint16_t v16[kMaxCtxFwd];
  uint8_t v8[kMaxCtxFwd];
  uint8_t pad[8];
};

struct TLScratch {
  std::vector<int64_t> cost;
  std::vector<int32_t> parent;
  std::vector<int32_t> codeword;
  std::vector<int64_t> cost8;
  std::vector<int32_t> parent8;
  std::vector<int32_t> codeword8;
  // all-contexts DP sweep scratch: packed key per (position, context)
  // for both trial widths — keys16[j*8+c] is context c's b=16 key at j
  std::vector<uint64_t> mkey16;
  std::vector<uint64_t> mkey8;
  UnitScratch scr0;
  std::vector<uint32_t> hit16[kNumTargetSizes];
  std::vector<uint32_t> hit8[kNumTargetSizes];
  std::vector<MVal> mvals[kNumTargetSizes];
};

static thread_local TLScratch g_tls;

constexpr int kMaxCtx = 8;

// Combined multi-context map: ONE probe returns every context's b=16
// and b=8 codeword for the window (the 6 per-context dictionaries
// share entry contents, multi_dictionary.hpp:152-184, so keying by
// content once cuts the multi encoder's probe volume 6x).  Codeword
// sentinels: 0 = absent (indices 0/1 are exception codes, never
// dictionary entries).
struct MSlot {
  uint64_t key;
  uint16_t v16[kMaxCtx];  // 0 = absent
  uint8_t v8[kMaxCtx];    // 0 = absent
};

struct MultiMap {
  std::vector<MSlot> slots;
  std::vector<uint32_t> lens;     // insert-time verification only
  std::vector<uint32_t> ent_off;  // insert-time verification only
  const uint32_t* table = nullptr;
  uint64_t mask = 0;
  // size-1 direct map (value -> slot index, ~0u = absent): the combined
  // table is ~20 MiB (RAM-resident), so skipping the hash probe for the
  // overwhelmingly-common small single values matters even more here
  static constexpr uint32_t kDir1 = 1u << 16;
  std::vector<uint32_t> dir1;
  // size-2 direct map: (v0<<8)|v1 -> slot index (see LookupMap::dir2)
  std::vector<uint32_t> dir2;
  // content-exact len-4 map (see LookupMap::map4): key32<<32 |
  // (main-map slot index + 1); 0 = empty
  std::vector<uint64_t> map4;
  uint64_t mask4 = 0;
  size_t cnt4 = 0;

  static inline uint64_t hash4(uint32_t key) {
    return (uint64_t(key) * 0x9e3779b97f4a7c15ull) >> 24;
  }

  void insert4(uint32_t key, uint32_t slotidx) {
    if ((cnt4 + 1) * 2 > map4.size()) {
      std::vector<uint64_t> old;
      old.swap(map4);
      map4.assign(old.size() * 2, 0);
      mask4 = map4.size() - 1;
      for (uint64_t s : old)
        if (s) {
          uint64_t slot = hash4(uint32_t(s >> 32)) & mask4;
          while (map4[slot]) slot = (slot + 1) & mask4;
          map4[slot] = s;
        }
    }
    uint64_t slot = hash4(key) & mask4;
    while (true) {
      uint64_t s = map4[slot];
      if (s == 0) {
        map4[slot] = (uint64_t(key) << 32) | (slotidx + 1);
        ++cnt4;
        return;
      }
      if (uint32_t(s >> 32) == key) {
        map4[slot] = (uint64_t(key) << 32) | (slotidx + 1);
        return;
      }
      slot = (slot + 1) & mask4;
    }
  }

  inline const MSlot* find4(uint32_t key) const {
    uint64_t slot = hash4(key) & mask4;
    while (true) {
      uint64_t s = map4[slot];
      if (s == 0) return nullptr;
      if (uint32_t(s >> 32) == key) return &slots[uint32_t(s) - 1];
      slot = (slot + 1) & mask4;
    }
  }
  // negative filter for window sizes >= 8 (see LookupMap::filter)
  static constexpr uint64_t kFilterBits = 1ull << 22;
  std::vector<uint64_t> filter;

  static inline uint64_t filter_bit(uint64_t k) {
    return (k >> 40) & (kFilterBits - 1);
  }

  void init(size_t capacity) {
    size_t cap = 1;
    while (cap < capacity * 2) cap <<= 1;
    slots.assign(cap, MSlot{});
    lens.assign(cap, 0);
    ent_off.assign(cap, 0);
    mask = cap - 1;
    dir1.assign(kDir1, ~0u);
    dir2.assign(1u << 16, ~0u);
    map4.assign(1u << 13, 0);
    mask4 = map4.size() - 1;
    cnt4 = 0;
    filter.assign(kFilterBits / 64, 0);
  }

  void insert(const uint32_t* content, uint32_t len, uint32_t off,
              uint32_t index, int ctx) {
    uint64_t k = slot_key(hash_window(content, len), len);
    if (len >= 8) filter[filter_bit(k) >> 6] |= 1ull << (filter_bit(k) & 63);
    uint64_t slot = k & mask;
    while (true) {
      MSlot& s = slots[slot];
      if (s.key == 0) {
        s.key = k;
        lens[slot] = len;
        ent_off[slot] = off;
        s.v16[ctx] = uint16_t(index);
        if (index < 256) s.v8[ctx] = uint8_t(index);
        break;
      }
      if (s.key == k && lens[slot] == len &&
          std::memcmp(table + ent_off[slot], content, len * 4) == 0) {
        s.v16[ctx] = uint16_t(index);  // override (ascending inserts)
        if (index < 256) s.v8[ctx] = uint8_t(index);
        ent_off[slot] = off;
        break;
      }
      slot = (slot + 1) & mask;
    }
    if (len == 1 && content[0] < kDir1) dir1[content[0]] = uint32_t(slot);
    if (len == 2 && content[0] < 256 && content[1] < 256)
      dir2[(content[0] << 8) | content[1]] = uint32_t(slot);
    if (len == 4 && (content[0] | content[1] | content[2] | content[3]) < 256)
      insert4(content[0] | (content[1] << 8) | (content[2] << 16) |
                  (content[3] << 24),
              uint32_t(slot));
  }

  inline const MSlot* find_fast_keyed(uint64_t k) const {
    uint64_t slot = k & mask;
    while (true) {
      const MSlot& s = slots[slot];
      if (s.key == k) {
        ++g_trusted_hits;
        return &s;
      }
      if (s.key == 0) return nullptr;
      slot = (slot + 1) & mask;
    }
  }

  inline const MSlot* find_fast(uint64_t h, uint32_t len) const {
    return find_fast_keyed(slot_key(h, len));
  }

  inline const MSlot* find_verified(uint64_t h, const uint32_t* w,
                                    uint32_t len) const {
    uint64_t k = slot_key(h, len);
    uint64_t slot = k & mask;
    while (true) {
      const MSlot& s = slots[slot];
      if (s.key == 0) return nullptr;
      if (s.key == k && lens[slot] == len &&
          std::memcmp(table + ent_off[slot], w, len * 4) == 0)
        return &s;
      slot = (slot + 1) & mask;
    }
  }
};

struct Encoder {
  std::vector<uint32_t> table;          // flat entry table (+16 zero pad)
  std::vector<LookupMap> maps;          // per context (fused 16/8 values)
  MultiMap mmap;                        // combined map (n_contexts > 1)
  // constant lookup result for an all-zero window of each target size
  // (windows inside zero runs hit these without probing)
  uint32_t zhit16[kMaxCtx][kNumTargetSizes];
  uint32_t zhit8[kMaxCtx][kNumTargetSizes];
  MVal zmval[kNumTargetSizes];  // same constants, every context at once
  int n_contexts = 0;

  // decode tables for the verification pass (row-major per context)
  std::vector<uint32_t> dec_off;
  std::vector<int32_t> dec_len;
  int32_t entries_per_ctx = 0;
  std::mutex memo_mu;  // guards `memo` under threaded encode

  // content-verified unit memo: identical gap units encode identically,
  // and real freq streams repeat the same 256-gap patterns constantly
  // (all-ones freqs are an all-zero gap unit).  Keyed by rolling hash,
  // verified by full content compare, bounded.
  struct MemoEnt {
    std::vector<uint32_t> gaps;
    std::vector<uint8_t> bytes;
  };
  std::unordered_map<uint64_t, MemoEnt> memo;
  static constexpr size_t kMemoCap = 1 << 16;
};

// Verify the current parse against the source gaps — the backstop
// that lets the hot lookup path trust 64-bit hashes.  Every used DICT
// codeword's entry content is compared to its source window (runs
// check the zero-run table; exceptions copy the value verbatim in
// emit, nothing to check).  Touches each used codeword once (vs 5
// probes per position for content-verified probing) with lookahead
// prefetching of the scattered entry reads.
// exact_small: the mode-0 single-map lookup resolves ALL size-1/2/4
// windows through content-exact structures (dirv/dir2/find4 packed-key
// maps, xmap overflow maps, find_verified fallbacks) — the only
// trusted-fingerprint sources are the size-8/16 filter survivors and
// the kX1Tag-ambiguous size-2 probe — so verification reduces to those
// edge types.  Mode 1 (multi map) resolves non-small windows of every
// size through find_fast, so it keeps the full check set.
static bool verify_parse(Encoder* e, const UnitScratch& u,
                         const uint32_t* gaps, int64_t n, int ctx,
                         bool exact_small = false) {
  const uint32_t* offs = e->dec_off.data() + int64_t(ctx) * e->entries_per_ctx;
  const int32_t* lens = e->dec_len.data() + int64_t(ctx) * e->entries_per_ctx;
  static thread_local std::vector<int64_t> srcs;
  static thread_local std::vector<int32_t> cws;
  srcs.clear();
  cws.clear();
  for (int64_t i = n; i != 0; i = g_tls.parent[i]) {
    int32_t cw = g_tls.codeword[i];
    if (cw >= (int32_t)kExceptions) {
      srcs.push_back(g_tls.parent[i]);
      cws.push_back(cw);
    }
  }
  size_t m = srcs.size();
  constexpr size_t PF = 8;
  for (size_t t = 0; t < m; ++t) {
    if (t + PF < m) __builtin_prefetch(&offs[cws[t + PF]]);
    if (t + PF / 2 < m)
      __builtin_prefetch(e->table.data() + offs[cws[t + PF / 2]]);
    int32_t cw = cws[t];
    int64_t src = srcs[t];
    int64_t ln = lens[cw];
    if (ln > (int64_t)kMaxEntrySize) {  // run entry: all zeros
      if (u.zrun[src] < (uint32_t)ln) return false;
    } else if ((ln == 8 || ln == 16) && u.zrun[src] >= (uint32_t)ln) {
      // zero-run constant shortcut in the lookup: the stored hit IS
      // the dictionary's all-zero entry and the window is all zeros
      continue;
    } else if (exact_small && ln <= 4 &&
               !(ln == 2 && gaps[src] == 0xffffffffu)) {
      // mode-0 small windows are content-exact by construction
      continue;
    } else if (ln == 1 && gaps[src] < LookupMap::kDir1) {
      // content-exact by construction: every unverified lookup path
      // resolves size-1 windows with value < kDir1 through the direct
      // dirv/dir1 tables, never through a fingerprint probe
      continue;
    } else if (ln == 2 && (gaps[src] | gaps[src + 1]) < 256) {
      // ditto for size-2 via dir2
      continue;
    } else if (ln == 4 && (gaps[src] | gaps[src + 1] | gaps[src + 2] |
                           gaps[src + 3]) < 256) {
      // ditto for size-4 via the packed-key content-exact map
      continue;
    } else {
      if (std::memcmp(e->table.data() + offs[cw], gaps + src,
                      size_t(ln) * 4) != 0)
        return false;
    }
  }
  return true;
}

// Precompute zero-run lengths and all window hashes for one unit; shared
// by every trial parse (the multi encoder runs 12 parses per unit).
static void precompute_zrun(UnitScratch* u, const uint32_t* gaps, int64_t n) {
  u->zrun.assign(n, 0);
  uint32_t run = 0, maxrun = 0;
  for (int64_t i = n - 1; i >= 0; --i) {
    run = gaps[i] == 0 ? (run < 256 ? run + 1 : 256) : 0;
    maxrun = run > maxrun ? run : maxrun;
    u->zrun[i] = run;
  }
  u->has_run16 = maxrun >= 16;
}

static void precompute_prefix(UnitScratch* u, const uint32_t* gaps,
                              int64_t n) {
  grow_pows(size_t(n) + 1);
  u->prefix.resize(n + 1);
  u->prefix[0] = 0;
  for (int64_t i = 0; i < n; ++i)
    u->prefix[i + 1] = u->prefix[i] + mix64(gaps[i]) * g_pinvpow[i];
  // window hashes are derived on the fly in the probe loops:
  // wh(i, s) = (prefix[i+s] - prefix[i]) * ppow[i]
}

static void precompute_unit(UnitScratch* u, const uint32_t* gaps, int64_t n) {
  precompute_zrun(u, gaps, n);
  precompute_prefix(u, gaps, n);
}

static inline uint64_t win_hash(const UnitScratch& u, int64_t i, int64_t s) {
  return (u.prefix[i + s] - u.prefix[i]) * g_ppow[i];
}

// Probe all window hashes of one context sequentially, filling the
// per-position hit arrays for both b=16 and b=8 parses.  Hoisting the
// probes out of the DP recurrence is the main speed lever: iterations
// are independent, so out-of-order execution + explicit prefetch keep
// many cache misses in flight (the DP loop serialized them), and
// windows lying inside zero runs resolve to a precomputed constant
// without touching the table at all.
#ifdef DINT_TPROF
// per-window-size lookup nanoseconds (harness builds only)
double g_tprof[kNumTargetSizes] = {0};
int64_t g_tcnt[kNumTargetSizes] = {0};   // positions swept
int64_t g_tsurv[kNumTargetSizes] = {0};  // filter survivors probed
int64_t g_thit[kNumTargetSizes] = {0};   // probe hits
#endif

static void lookup_pass(Encoder* e, const UnitScratch& u, int ctx,
                        const uint32_t* gaps, int64_t n,
                        bool verified = false, bool need8 = true) {
  const LookupMap& map = e->maps[ctx];
  for (int t = 0; t < kNumTargetSizes; ++t) {
#ifdef DINT_TPROF
    auto tpa = std::chrono::steady_clock::now();
    struct TP {
      std::chrono::steady_clock::time_point a;
      int t;
      ~TP() {
        g_tprof[t] += std::chrono::duration<double, std::nano>(
                          std::chrono::steady_clock::now() - a)
                          .count();
      }
    } tp{tpa, t};
#endif
    int64_t s = kTargetSizes[t];
    int64_t cnt = n - s + 1;
    if (cnt < 0) cnt = 0;
    g_tls.hit16[t].resize(cnt);

    uint32_t* h16 = g_tls.hit16[t].data();
    const uint32_t z16 = e->zhit16[ctx][t];
    constexpr int64_t PF = 32;

    if (verified || need8) {
      // exact / full-width path (rare: collision retries only)
      g_tls.hit8[t].resize(cnt);
      uint32_t* h8 = g_tls.hit8[t].data();
      const uint32_t z8 = e->zhit8[ctx][t];
      for (int64_t i = 0; i < cnt; ++i) {
        if (u.zrun[i] >= (uint32_t)s) {
          h16[i] = z16;
          h8[i] = z8;
          continue;
        }
        size_t sl;
        if (s == 1 && gaps[i] < LookupMap::kDir1) {
          // content-exact: usable even on the verified path
          int32_t dv = map.dirv[gaps[i]];
          h16[i] = dv < 0 ? kNoHit : uint32_t(dv);
          sl = size_t(-1);
          if (need8 && dv >= 0)
            sl = verified ? map.find_verified(win_hash(u, i, s), gaps + i, 1)
                          : map.find_fast(win_hash(u, i, s), 1);
          if (!need8) continue;
        } else {
          sl = verified ? map.find_verified(win_hash(u, i, s), gaps + i, (uint32_t)s)
                        : map.find_fast(win_hash(u, i, s), (uint32_t)s);
          h16[i] = sl == size_t(-1) ? kNoHit : map.val16_at(sl);
        }
        if (sl == size_t(-1)) {
          h8[i] = kNoHit;
        } else {
          uint16_t v8 = map.vals8[sl];
          h8[i] = v8 == kNoHit8 ? kNoHit : uint32_t(v8);
        }
      }
      continue;
    }

    // fast trusted path.  No zrun handling at all: an all-zero window
    // probes to the dictionary's own zero entry (what the old per-
    // position constant returned), so zeros flow through the same
    // branchless loops as everything else.
    if (s == 1) {
      // branchless direct-value loop (the >= kDir1 tail is ~0.06%);
      // the tail takes the content-exact overflow map, so size-1
      // lookups never record a trusted hit
      for (int64_t i = 0; i < cnt; ++i) {
        uint32_t v = gaps[i];
        uint32_t vm = v < LookupMap::kDir1 ? v : 0;
        int32_t dv = map.dirv[vm];
        uint32_t hit = dv < 0 ? kNoHit : uint32_t(dv);
        if (v >= LookupMap::kDir1)
          hit = map.xfind((LookupMap::kX1Tag << 32) | v);
        h16[i] = hit;
      }
    } else if (s >= 8) {
      // negative filter screens the (almost-all-miss) big windows.
      // Zero-run windows (a quarter of real doc-gap positions) resolve
      // to the dictionary's zero-entry constant with no hash, filter,
      // or probe.  The rest sweep the filter branchlessly, appending
      // (pos, key) survivors so the probe phase never re-hashes.
      struct Surv {
        int64_t pos;
        uint64_t key;
      };
      static thread_local std::vector<Surv> surv;
      surv.resize(size_t(cnt));
      Surv* sv = surv.data();
      const uint32_t* zr = u.zrun.data();
      int64_t ns = 0;
      for (int64_t i = 0; i < cnt; ++i) {
        uint64_t zero = zr[i] >= (uint32_t)s;
        uint64_t k = slot_key(win_hash(u, i, s), (uint32_t)s);
        uint64_t b = LookupMap::filter_bit(k);
        uint64_t pass = (map.filter[b >> 6] >> (b & 63)) & 1 & ~zero;
        h16[i] = zero ? z16 : kNoHit;
        sv[ns].pos = i;
        sv[ns].key = k;
        ns += int64_t(pass);
      }
#ifdef DINT_TPROF
      g_tcnt[t] += cnt;
      g_tsurv[t] += ns;
#endif
      for (int64_t j = 0; j < ns; ++j) {
        if (j + 8 < ns) __builtin_prefetch(&map.slots[sv[j + 8].key & map.mask]);
        // trusted fingerprint probe: touches ONLY the 1 MiB slots
        // array (L2).  A verified-on-hit variant was measured: ~30% of
        // 8-windows are genuine hits, so per-hit table memcmps hit the
        // 4 MiB entry table in RAM and cost more than the path-only
        // verify_parse backstop these trusted hits force.
        size_t sl = map.find_fast_keyed(sv[j].key);
        if (sl != size_t(-1)) {
          h16[sv[j].pos] = map.val16_at(sl);
#ifdef DINT_TPROF
          ++g_thit[t];
#endif
        }
      }
    } else if (s == 2) {
      // direct (v0,v1) table serves both-bytes-small windows (the
      // overwhelming majority) with one L2 load, no hashing; larger
      // windows take the content-exact overflow map (except the
      // kX1Tag-ambiguous v0 == u32max, which stays on the trusted
      // probe and forces a verify)
      for (int64_t i = 0; i < cnt; ++i) {
        uint32_t v0 = gaps[i], v1 = gaps[i + 1];
        if ((v0 | v1) < 256) {
          int32_t dv = map.dir2[(v0 << 8) | v1];
          h16[i] = dv < 0 ? kNoHit : uint32_t(dv);
        } else if (v0 != 0xffffffffu) {
          h16[i] = map.xfind((uint64_t(v0) << 32) | v1);
        } else {
          size_t sl = map.find_fast(win_hash(u, i, s), 2);
          h16[i] = sl == size_t(-1) ? kNoHit : map.val16_at(sl);
        }
      }
    } else {
      // high-hit class (4): zero-run windows short-circuit to the
      // zero-entry constant (31% of bench positions); the content-
      // exact packed-key map serves all-bytes-small windows (nearly
      // all of the rest); the remainder take the generic probe.
      for (int64_t i = 0; i < cnt; ++i) {
        if (u.zrun[i] >= 4) {
          h16[i] = z16;
          continue;
        }
        uint32_t v0 = gaps[i], v1 = gaps[i + 1], v2 = gaps[i + 2],
                 v3 = gaps[i + 3];
        if (i + PF < cnt) {
          uint32_t p = gaps[i + PF] | (gaps[i + PF + 1] << 8) |
                       (gaps[i + PF + 2] << 16) | (gaps[i + PF + 3] << 24);
          __builtin_prefetch(&map.map4[LookupMap::hash4(p) & map.mask4]);
        }
        if ((v0 | v1 | v2 | v3) < 256) {
          h16[i] = map.find4(v0 | (v1 << 8) | (v2 << 16) | (v3 << 24));
#ifdef DINT_TPROF
          g_tcnt[2] += 1;
          g_thit[2] += h16[i] != kNoHit;
#endif
        } else {
          // verified-on-hit (see the s >= 8 loop)
          size_t sl = map.find_verified(win_hash(u, i, s), gaps + i, 4);
          h16[i] = sl == size_t(-1) ? kNoHit : map.val16_at(sl);
        }
      }
    }
  }
}

// DP parse of gaps[0..n) using the hit arrays of the last lookup_pass;
// fills enc->cost/parent/cw.  Branchless formulation: each edge packs
// (cost, relaxation-order, codeword) into one u64 key and the winner is
// the min — equal-cost ties resolve to the SMALLEST order field, which
// reproduces the oracle's first-writer-wins relaxation order exactly
// (runs largest-first = orders 0-4, dict sizes 16..1 = 5-9,
// exception = 10; strict '<').
static constexpr int32_t kEdgeSpan[11] = {256, 128, 64, 32, 16,
                                          16, 8, 4, 2, 1, 1};

template <bool RUNS>
static void parse_hits_arrays_impl(const UnitScratch& u,
                                   const uint32_t* const hits[kNumTargetSizes],
                                   const uint32_t* gaps, int64_t n) {
  // resize only — every slot 1..n is stored by the loop below, and the
  // only index read before being written is cost[0] (the im clamp), so
  // no kBig/default fills are needed (16B/position of memset saved)
  g_tls.cost.resize(size_t(n + 1));
  g_tls.parent.resize(size_t(n + 1));
  g_tls.codeword.resize(size_t(n + 1));
  g_tls.cost[0] = 0;
  const int64_t* cost = g_tls.cost.data();
  const uint32_t* zrun = u.zrun.data();
  // units shorter than a window size have EMPTY hit arrays; the
  // branchless loop always reads index `im`, so point those at a
  // kNoHit dummy (their `valid` flag is false anyway)
  static const uint32_t kNoHitCell = kNoHit;
  const uint32_t* ht[kNumTargetSizes];
  for (int t = 0; t < kNumTargetSizes; ++t)
    ht[t] = n - (int64_t)kTargetSizes[t] >= 0 ? hits[t] : &kNoHitCell;

  // Dependency-split DP: only the two span-1 edges (exception and the
  // size-1 dictionary hit) read cost[j-1], so only they sit on the
  // loop-carried critical path (kept in the register cprev).  Every
  // span >= 2 edge into j+1 reads cost[<= j-1], so its 8-way min tree
  // is computed one iteration AHEAD (`pre`), off the critical chain —
  // the out-of-order core overlaps it with the short chain.  The key
  // packing makes the min order-independent, so results are identical
  // to the naive relaxation.
  auto span2_min = [&](int64_t j) -> uint64_t {
    // min key over span >= 2 edges into j (j may be n+1: guarded)
    uint64_t p = ~0ull;
    if (j > n) return p;
    if (RUNS) {
      for (int t = 0; t < 5; ++t) {
        int64_t k = kRunKs[t];
        int64_t i = j - k;
        int64_t im = i >= 0 ? i : 0;
        bool valid = (i >= 0) & (zrun[im] >= (uint32_t)k);
        uint64_t ck = valid ? ((uint64_t(cost[im] + 1) << 24) |
                               (uint64_t(t) << 16) | (kExceptions + t))
                            : ~0ull;
        p = ck < p ? ck : p;
      }
    }
    for (int t = 0; t + 1 < kNumTargetSizes; ++t) {  // sizes 16,8,4,2
      int64_t s = kTargetSizes[t];
      int64_t i = j - s;
      int64_t im = i >= 0 ? i : 0;
      uint32_t hit = ht[t][im];
      bool valid = (i >= 0) & (hit != kNoHit);
      uint64_t ck = valid ? ((uint64_t(cost[im] + 1) << 24) |
                             (uint64_t(5 + t) << 16) | hit)
                          : ~0ull;
      p = ck < p ? ck : p;
    }
    return p;
  };

  const uint32_t* ht1 = ht[kNumTargetSizes - 1];  // size-1 hits
  uint64_t cprev = 0;  // cost[0]
  // prologue: j <= 256 needs the i>=0 clamps (span2_min handles them)
  int64_t jmid = RUNS ? 256 : 16;
  if (jmid > n) jmid = n;
  for (int64_t j = 1; j <= jmid; ++j) {
    uint32_t large = gaps[j - 1] >= kSmallLimit;
    uint64_t key = ((cprev + 2 + large) << 24) | (10ull << 16) | large;
    uint32_t hit1 = ht1[j - 1];
    uint64_t ck = hit1 != kNoHit
                      ? (((cprev + 1) << 24) | (9ull << 16) | hit1)
                      : ~0ull;
    key = ck < key ? ck : key;
    uint64_t pre = span2_min(j);
    key = pre < key ? pre : key;
    uint32_t order = uint32_t(key >> 16) & 0xff;
    cprev = key >> 24;
    g_tls.cost[j] = int64_t(cprev);
    g_tls.parent[j] = int32_t(j - kEdgeSpan[order]);
    g_tls.codeword[j] = int32_t(key & 0xffff);
  }
  // main loop: no index clamps; the up-to-9 span>=2 candidate keys are
  // independent loads/ALU, minned in a BALANCED tree (the sequential
  // cmov chain was the critical path: ~2 cycles x 9 deep per position)
  const uint32_t* h16p = ht[0];
  const uint32_t* h8p = ht[1];
  const uint32_t* h4p = ht[2];
  const uint32_t* h2p = ht[3];
  for (int64_t j = jmid + 1; j <= n; ++j) {
    uint32_t large = gaps[j - 1] >= kSmallLimit;
    uint64_t key = ((cprev + 2 + large) << 24) | (10ull << 16) | large;
    uint32_t hit1 = ht1[j - 1];
    uint64_t ck1 = hit1 != kNoHit
                       ? (((cprev + 1) << 24) | (9ull << 16) | hit1)
                       : ~0ull;
    uint32_t hit16 = h16p[j - 16], hit8 = h8p[j - 8], hit4 = h4p[j - 4],
             hit2 = h2p[j - 2];
    uint64_t ck16 = hit16 != kNoHit ? ((uint64_t(cost[j - 16] + 1) << 24) |
                                       (5ull << 16) | hit16)
                                    : ~0ull;
    uint64_t ck8 = hit8 != kNoHit ? ((uint64_t(cost[j - 8] + 1) << 24) |
                                     (6ull << 16) | hit8)
                                  : ~0ull;
    uint64_t ck4 = hit4 != kNoHit ? ((uint64_t(cost[j - 4] + 1) << 24) |
                                     (7ull << 16) | hit4)
                                  : ~0ull;
    uint64_t ck2 = hit2 != kNoHit ? ((uint64_t(cost[j - 2] + 1) << 24) |
                                     (8ull << 16) | hit2)
                                  : ~0ull;
    uint64_t ma = ck16 < ck8 ? ck16 : ck8;
    uint64_t mb = ck4 < ck2 ? ck4 : ck2;
    uint64_t md = ma < mb ? ma : mb;
    if (RUNS) {
      uint64_t mr = ~0ull;
      for (int t = 0; t < 5; ++t) {
        int64_t k = kRunKs[t];
        uint64_t ck = zrun[j - k] >= (uint32_t)k
                          ? ((uint64_t(cost[j - k] + 1) << 24) |
                             (uint64_t(t) << 16) | (kExceptions + t))
                          : ~0ull;
        mr = ck < mr ? ck : mr;
      }
      md = mr < md ? mr : md;
    }
    key = ck1 < key ? ck1 : key;
    key = md < key ? md : key;
    uint32_t order = uint32_t(key >> 16) & 0xff;
    cprev = key >> 24;
    g_tls.cost[j] = int64_t(cprev);
    g_tls.parent[j] = int32_t(j - kEdgeSpan[order]);
    g_tls.codeword[j] = int32_t(key & 0xffff);
  }
}

static void parse_hits_arrays(Encoder* e, const UnitScratch& u,
                              const uint32_t* const hits[kNumTargetSizes],
                              const uint32_t* gaps, int64_t n) {
  if (u.has_run16)
    parse_hits_arrays_impl<true>(u, hits, gaps, n);
  else
    parse_hits_arrays_impl<false>(u, hits, gaps, n);
}

// Fused probe + forward-relaxation DP for the single-dict (mode 0)
// parse.  One pass over the unit replaces the five per-size probe
// passes and the backward DP sweep: at position i the cost key[i] is
// final (every edge spans forward), so all out-edges of i — exception,
// runs, and the five dictionary window sizes starting AT i — relax
// their targets immediately.  The (cost<<24 | order<<16 | cw) key
// packing makes the min order-independent, so the result is edge-for-
// edge identical to parse_hits_arrays (same oracle tie-breaks).
// Every probe here is content-exact (direct tables, packed-key maps,
// the xmap overflow maps, or find_verified for sizes >= 4), so the
// parse never needs a verify_parse backstop and g_trusted_hits stays
// untouched.  Fills g_tls.parent/codeword along the used path only.
static void fused_parse_single(Encoder* e, const UnitScratch& u,
                               const uint32_t* gaps, int64_t n) {
  const LookupMap& map = e->maps[0];
  static thread_local std::vector<uint64_t> key;
  key.assign(size_t(n + 1), ~0ull);
  uint64_t* kp = key.data();
  kp[0] = 0;
  const uint32_t* zrun = u.zrun.data();
  const bool runs = u.has_run16;
  const uint32_t z16_16 = e->zhit16[0][0], z16_8 = e->zhit16[0][1];
  for (int64_t i = 0; i < n; ++i) {
    const uint64_t ci = (kp[i] >> 24) + 1;  // cost of a 1-codeword edge
    // exception edge (order 10)
    {
      uint64_t large = gaps[i] >= kSmallLimit;
      uint64_t nk = ((ci + 1 + large) << 24) | (10ull << 16) | large;
      if (nk < kp[i + 1]) kp[i + 1] = nk;
    }
    if (runs && zrun[i] >= 16) {
      // run edges (orders 0-4), spans 256..16
      for (int t = 0; t < 5; ++t) {
        int64_t k = kRunKs[t];
        if (zrun[i] >= (uint32_t)k && i + k <= n) {
          uint64_t nk = (ci << 24) | (uint64_t(t) << 16) | (kExceptions + t);
          if (nk < kp[i + k]) kp[i + k] = nk;
        }
      }
    }
    // dict edges (orders 5-9), sizes 16, 8, 4, 2, 1
    // sizes 16/8: zero-run constant, else negative filter + verified
    for (int t = 0; t < 2; ++t) {
      int64_t s = (int64_t)kTargetSizes[t];
      if (i + s > n) continue;
      uint32_t hit;
      if (zrun[i] >= (uint32_t)s) {
        hit = t == 0 ? z16_16 : z16_8;
      } else {
        uint64_t k = slot_key(win_hash(u, i, s), (uint32_t)s);
        uint64_t b = LookupMap::filter_bit(k);
        if (!((map.filter[b >> 6] >> (b & 63)) & 1)) continue;
        size_t sl = map.find_verified(win_hash(u, i, s), gaps + i,
                                      (uint32_t)s);
        hit = sl == size_t(-1) ? kNoHit : map.val16_at(sl);
      }
      if (hit != kNoHit) {
        uint64_t nk = (ci << 24) | (uint64_t(5 + t) << 16) | hit;
        if (nk < kp[i + s]) kp[i + s] = nk;
      }
    }
    // size 4 (order 7): packed-key map / verified fallback
    if (i + 4 <= n) {
      uint32_t v0 = gaps[i], v1 = gaps[i + 1], v2 = gaps[i + 2],
               v3 = gaps[i + 3];
      uint32_t hit;
      if ((v0 | v1 | v2 | v3) < 256) {
        hit = map.find4(v0 | (v1 << 8) | (v2 << 16) | (v3 << 24));
      } else {
        size_t sl = map.find_verified(win_hash(u, i, 4), gaps + i, 4);
        hit = sl == size_t(-1) ? kNoHit : map.val16_at(sl);
      }
      if (hit != kNoHit) {
        uint64_t nk = (ci << 24) | (7ull << 16) | hit;
        if (nk < kp[i + 4]) kp[i + 4] = nk;
      }
    }
    // size 2 (order 8): direct table / content-exact overflow map
    if (i + 2 <= n) {
      uint32_t v0 = gaps[i], v1 = gaps[i + 1];
      uint32_t hit;
      if ((v0 | v1) < 256) {
        int32_t dv = map.dir2[(v0 << 8) | v1];
        hit = dv < 0 ? kNoHit : uint32_t(dv);
      } else if (v0 != 0xffffffffu) {
        hit = map.xfind((uint64_t(v0) << 32) | v1);
      } else {
        size_t sl = map.find_verified(win_hash(u, i, 2), gaps + i, 2);
        hit = sl == size_t(-1) ? kNoHit : map.val16_at(sl);
      }
      if (hit != kNoHit) {
        uint64_t nk = (ci << 24) | (8ull << 16) | hit;
        if (nk < kp[i + 2]) kp[i + 2] = nk;
      }
    }
    // size 1 (order 9): direct value table / overflow map
    {
      uint32_t v = gaps[i];
      uint32_t hit;
      if (v < LookupMap::kDir1) {
        int32_t dv = map.dirv[v];
        hit = dv < 0 ? kNoHit : uint32_t(dv);
      } else {
        hit = map.xfind((LookupMap::kX1Tag << 32) | v);
      }
      if (hit != kNoHit) {
        uint64_t nk = (ci << 24) | (9ull << 16) | hit;
        if (nk < kp[i + 1]) kp[i + 1] = nk;
      }
    }
  }
  // reconstruct parent/codeword along the winning path only (every
  // node 1..n is reachable via exception edges, so kp[j] is never the
  // ~0 sentinel)
  g_tls.parent.resize(size_t(n + 1));
  g_tls.codeword.resize(size_t(n + 1));
  for (int64_t j = n; j != 0;) {
    uint64_t k = kp[j];
    uint32_t order = uint32_t(k >> 16) & 0xff;
    int32_t span = kEdgeSpan[order];
    g_tls.parent[j] = int32_t(j - span);
    g_tls.codeword[j] = int32_t(k & 0xffff);
    j -= span;
  }
}

static void parse_hits(Encoder* e, const UnitScratch& u, bool b8,
                       const uint32_t* gaps, int64_t n) {
  const uint32_t* hits[kNumTargetSizes];
  for (int t = 0; t < kNumTargetSizes; ++t)
    hits[t] = b8 ? g_tls.hit8[t].data() : g_tls.hit16[t].data();
  parse_hits_arrays(e, u, hits, gaps, n);
}

// One probe pass over the COMBINED map fills the hit arrays of every
// context at once (multi mode's main speed lever: 5 probes/position
// total instead of 5 per context).
static void lookup_pass_multi(Encoder* e, const UnitScratch& u,
                              const uint32_t* gaps, int64_t n,
                              bool verified = false) {
  const MultiMap& map = e->mmap;
  for (int t = 0; t < kNumTargetSizes; ++t) {
    int64_t s = kTargetSizes[t];
    int64_t cnt = n - s + 1;
    if (cnt < 0) cnt = 0;
    g_tls.mvals[t].resize(cnt);
    MVal* mv = g_tls.mvals[t].data();
    const MVal& zv = e->zmval[t];
    constexpr int64_t PF = 32;

    auto fill = [&](int64_t i, const MSlot* sl) {
      if (sl)
        std::memcpy(mv[i].v16, sl->v16, 24);  // v16[8] + v8[8], contiguous
      else
        std::memset(&mv[i], 0, sizeof(MVal));
    };

    if (verified) {
      for (int64_t i = 0; i < cnt; ++i) {
        if (u.zrun[i] >= (uint32_t)s) {
          mv[i] = zv;
          continue;
        }
        fill(i, map.find_verified(win_hash(u, i, s), gaps + i, (uint32_t)s));
      }
      continue;
    }

    if (s == 1) {
      // direct-value map; handles zeros too (dir1[0] IS the zero entry)
      for (int64_t i = 0; i < cnt; ++i) {
        uint32_t v = gaps[i];
        if (v < MultiMap::kDir1) {
          uint32_t ds = map.dir1[v];
          fill(i, ds == ~0u ? nullptr : &map.slots[ds]);
        } else {
          fill(i, map.find_fast(win_hash(u, i, s), 1));
        }
      }
    } else if (s >= 8) {
      // negative filter screens the (almost-all-miss) big windows;
      // all-zero windows keep the constant shortcut — the combined map
      // is RAM-resident, so skipped probes matter.  Two phases like
      // the single-map path: branchless survivor sweep, then probes.
      static thread_local std::vector<int32_t> surv;
      surv.resize(size_t(cnt));
      int32_t* sv = surv.data();
      int64_t ns = 0;
      std::memset(mv, 0, sizeof(MVal) * size_t(cnt));
      for (int64_t i = 0; i < cnt; ++i) {
        if (u.zrun[i] >= (uint32_t)s) {
          mv[i] = zv;
          continue;
        }
        uint64_t k = slot_key(win_hash(u, i, s), (uint32_t)s);
        uint64_t b = MultiMap::filter_bit(k);
        uint64_t pass = (map.filter[b >> 6] >> (b & 63)) & 1;
        sv[ns] = int32_t(i);
        ns += int64_t(pass);
      }
      for (int64_t j = 0; j < ns; ++j) {
        if (j + 8 < ns) {
          uint64_t kp = slot_key(win_hash(u, sv[j + 8], s), (uint32_t)s);
          __builtin_prefetch(&map.slots[kp & map.mask]);
        }
        int64_t i = sv[j];
        const MSlot* sl =
            map.find_fast_keyed(slot_key(win_hash(u, i, s), (uint32_t)s));
        if (sl) std::memcpy(mv[i].v16, sl->v16, 24);
      }
    } else if (s == 2) {
      // direct (v0,v1) table: one RAM/L2 load replaces hash + probe
      // for both-bytes-small windows; (0,0) rides the same path, so
      // no zero-run branch is needed
      for (int64_t i = 0; i < cnt; ++i) {
        uint32_t v0 = gaps[i], v1 = gaps[i + 1];
        if ((v0 | v1) < 256) {
          uint32_t ds = map.dir2[(v0 << 8) | v1];
          if (i + PF < cnt) {
            uint32_t p0 = gaps[i + PF], p1 = gaps[i + PF + 1];
            if ((p0 | p1) < 256)
              __builtin_prefetch(&map.slots[map.dir2[(p0 << 8) | p1]]);
          }
          fill(i, ds == ~0u ? nullptr : &map.slots[ds]);
        } else {
          fill(i, map.find_fast(win_hash(u, i, s), 2));
        }
      }
    } else {
      // size 4: content-exact packed-key map for all-bytes-small
      // windows, generic probe otherwise
      for (int64_t i = 0; i < cnt; ++i) {
        if (u.zrun[i] >= (uint32_t)s) {
          mv[i] = zv;
          continue;
        }
        uint32_t v0 = gaps[i], v1 = gaps[i + 1], v2 = gaps[i + 2],
                 v3 = gaps[i + 3];
        if ((v0 | v1 | v2 | v3) < 256) {
          if (i + PF < cnt) {
            uint32_t p = gaps[i + PF] | (gaps[i + PF + 1] << 8) |
                         (gaps[i + PF + 2] << 16) | (gaps[i + PF + 3] << 24);
            __builtin_prefetch(&map.map4[MultiMap::hash4(p) & map.mask4]);
          }
          fill(i, map.find4(v0 | (v1 << 8) | (v2 << 16) | (v3 << 24)));
        } else {
          fill(i, map.find_fast(win_hash(u, i, s), (uint32_t)s));
        }
      }
    }
  }
}

// Materialize one context/width's u32 hit arrays from the MVal scratch
// (only used for the winner's emit parse and the verified fallback).
static void parse_mhits(Encoder* e, const UnitScratch& u, int ctx, bool b8,
                        const uint32_t* gaps, int64_t n) {
  const uint32_t* hits[kNumTargetSizes];
  for (int t = 0; t < kNumTargetSizes; ++t) {
    int64_t cnt = n - (int64_t)kTargetSizes[t] + 1;
    if (cnt < 0) cnt = 0;
    g_tls.hit16[t].resize(cnt);
    uint32_t* arr = g_tls.hit16[t].data();
    const MVal* mv = g_tls.mvals[t].data();
    for (int64_t i = 0; i < cnt; ++i) {
      uint32_t v = b8 ? mv[i].v8[ctx] : mv[i].v16[ctx];
      arr[i] = v ? v : kNoHit;
    }
    hits[t] = arr;
  }
  parse_hits_arrays(e, u, hits, gaps, n);
}

// Both trial widths of one context in a single DP sweep: the run and
// exception edges are shared work, only the dictionary hits differ.
// Fills cost/parent/codeword (b=16) and cost8/parent8/codeword8 (b=8).
// Key packing for the dual sweep: cost<<40 | order<<35 | cw<<19 |
// nedges.  (cost, order) uniquely identify an edge at a given j, so
// the cw/nedges low bits never affect the argmin — ties still resolve
// exactly like the oracle's relaxation order.  nedges (the parse's
// codeword count) rides along so serialized sizes come straight off
// the final key: bytes16 = 2*cost16 (every b=16 emission is 2*edge
// cost bytes), bytes8 = 2*cost8 - nedges8 (b=8 emissions are
// 2*edge_cost - 1 bytes each) — no backtracking walks needed.
static constexpr int kCostShift = 40, kOrderShift = 35, kCwShift = 19;
static constexpr uint64_t kNedgeMask = (1ull << kCwShift) - 1;

template <bool RUNS>
static void parse_mhits_dual_impl(Encoder* e, const UnitScratch& u, int ctx,
                                  const uint32_t* gaps, int64_t n) {
  g_tls.cost.assign(n + 1, 0);   // holds the full packed key per j
  g_tls.parent.assign(n + 1, 0);
  g_tls.codeword.assign(n + 1, 1);
  g_tls.cost8.assign(n + 1, 0);
  g_tls.parent8.assign(n + 1, 0);
  g_tls.codeword8.assign(n + 1, 1);
  const uint64_t* kv = (const uint64_t*)g_tls.cost.data();
  const uint64_t* kv8 = (const uint64_t*)g_tls.cost8.data();
  const uint32_t* zrun = u.zrun.data();
  static const MVal kZeroMVal{};
  const MVal* mv[kNumTargetSizes];
  for (int t = 0; t < kNumTargetSizes; ++t)
    mv[t] = n - (int64_t)kTargetSizes[t] >= 0 ? g_tls.mvals[t].data()
                                              : &kZeroMVal;
  auto relax = [](uint64_t kim, uint64_t ec, uint64_t order, uint64_t cw) {
    return (((kim >> kCostShift) + ec) << kCostShift) | (order << kOrderShift) |
           (cw << kCwShift) | ((kim & kNedgeMask) + 1);
  };
  for (int64_t j = 1; j <= n; ++j) {
    uint32_t large = gaps[j - 1] >= kSmallLimit;
    uint64_t add = 2 + large;
    uint64_t key = relax(kv[j - 1], add, 10, large);
    uint64_t key8 = relax(kv8[j - 1], add, 10, large);
    if (RUNS) {
      for (int t = 0; t < 5; ++t) {
        int64_t k = kRunKs[t];
        int64_t i = j - k;
        int64_t im = i >= 0 ? i : 0;
        bool valid = (i >= 0) & (zrun[im] >= (uint32_t)k);
        uint64_t ck = valid ? relax(kv[im], 1, t, kExceptions + t) : ~0ull;
        key = ck < key ? ck : key;
        uint64_t ck8 = valid ? relax(kv8[im], 1, t, kExceptions + t) : ~0ull;
        key8 = ck8 < key8 ? ck8 : key8;
      }
    }
    for (int t = 0; t < kNumTargetSizes; ++t) {
      int64_t s = kTargetSizes[t];
      int64_t i = j - s;
      int64_t im = i >= 0 ? i : 0;
      uint32_t hit = mv[t][im].v16[ctx];
      bool valid = (i >= 0) & (hit != 0);
      uint64_t ck = valid ? relax(kv[im], 1, 5 + t, hit) : ~0ull;
      key = ck < key ? ck : key;
      uint32_t hit8v = mv[t][im].v8[ctx];
      bool valid8 = (i >= 0) & (hit8v != 0);
      uint64_t ck8 = valid8 ? relax(kv8[im], 1, 5 + t, hit8v) : ~0ull;
      key8 = ck8 < key8 ? ck8 : key8;
    }
    uint32_t order = uint32_t(key >> kOrderShift) & 0x1f;
    g_tls.cost[j] = int64_t(key);
    g_tls.parent[j] = int32_t(j - kEdgeSpan[order]);
    g_tls.codeword[j] = int32_t((key >> kCwShift) & 0xffff);
    uint32_t order8 = uint32_t(key8 >> kOrderShift) & 0x1f;
    g_tls.cost8[j] = int64_t(key8);
    g_tls.parent8[j] = int32_t(j - kEdgeSpan[order8]);
    g_tls.codeword8[j] = int32_t((key8 >> kCwShift) & 0xffff);
  }
}

// Returns (bytes16, bytes8) of the two trial parses.
static std::pair<int64_t, int64_t> parse_mhits_dual(Encoder* e,
                                                    const UnitScratch& u,
                                                    int ctx,
                                                    const uint32_t* gaps,
                                                    int64_t n) {
  if (u.has_run16)
    parse_mhits_dual_impl<true>(e, u, ctx, gaps, n);
  else
    parse_mhits_dual_impl<false>(e, u, ctx, gaps, n);
  uint64_t kf = uint64_t(g_tls.cost[n]);
  uint64_t kf8 = uint64_t(g_tls.cost8[n]);
  int64_t bytes16 = 2 * int64_t(kf >> kCostShift);
  int64_t bytes8 =
      2 * int64_t(kf8 >> kCostShift) - int64_t(kf8 & kNedgeMask);
  return {bytes16, bytes8};
}

// ALL contexts x both widths in ONE DP sweep: each of the 8 u64 SIMD
// lanes runs an independent trial DP (context c in lane c), reading
// its dictionary hits straight out of the MVal bundles (v16[8]/v8[8]
// are exactly one 128/64-bit lane-load away).  The 12 sequential
// dual sweeps collapse into one pass with two 8-lane min chains.
// Lanes >= n_contexts compute garbage and are never read.
#ifdef DINT_AVX512
template <bool RUNS>
static void parse_mall_impl(const UnitScratch& u, const uint32_t* gaps,
                            int64_t n) {
  g_tls.mkey16.resize(size_t(n + 1) * 8);
  g_tls.mkey8.resize(size_t(n + 1) * 8);
  uint64_t* K16 = g_tls.mkey16.data();
  uint64_t* K8 = g_tls.mkey8.data();
  std::memset(K16, 0, 64);  // j=0: cost 0, nedges 0 in every lane
  std::memset(K8, 0, 64);
  const uint32_t* zrun = u.zrun.data();
  static const MVal kZeroMVal{};
  const MVal* mv[kNumTargetSizes];
  for (int t = 0; t < kNumTargetSizes; ++t)
    mv[t] = n - (int64_t)kTargetSizes[t] >= 0 ? g_tls.mvals[t].data()
                                              : &kZeroMVal;
  const __m512i vones = _mm512_set1_epi64(-1);
  const __m512i vone = _mm512_set1_epi64(1);
  const __m512i vnmask = _mm512_set1_epi64(int64_t(kNedgeMask));
  // relax with a constant (order|cw) OR-term, edge cost ec
  auto relax_c = [&](__m512i kim, int64_t ec, uint64_t oc) {
    __m512i hi = _mm512_slli_epi64(
        _mm512_add_epi64(_mm512_srli_epi64(kim, kCostShift),
                         _mm512_set1_epi64(ec)),
        kCostShift);
    __m512i ne = _mm512_add_epi64(_mm512_and_epi64(kim, vnmask), vone);
    return _mm512_or_epi64(_mm512_or_epi64(hi, _mm512_set1_epi64(int64_t(oc))),
                           ne);
  };
  // relax with per-lane cw values (dictionary hits); invalid (cw==0)
  // lanes resolve to all-ones (never the min)
  auto relax_h = [&](__m512i kim, uint64_t order, __m512i cw) {
    __mmask8 valid = _mm512_cmpneq_epu64_mask(cw, _mm512_setzero_si512());
    __m512i hi = _mm512_slli_epi64(
        _mm512_add_epi64(_mm512_srli_epi64(kim, kCostShift), vone),
        kCostShift);
    __m512i ne = _mm512_add_epi64(_mm512_and_epi64(kim, vnmask), vone);
    __m512i ck = _mm512_or_epi64(
        _mm512_or_epi64(hi, _mm512_set1_epi64(int64_t(order << kOrderShift))),
        _mm512_or_epi64(_mm512_slli_epi64(cw, kCwShift), ne));
    return _mm512_mask_mov_epi64(vones, valid, ck);
  };
  for (int64_t j = 1; j <= n; ++j) {
    uint64_t large = gaps[j - 1] >= kSmallLimit;
    int64_t add = int64_t(2 + large);
    uint64_t oc_exc = (10ull << kOrderShift) | (large << kCwShift);
    __m512i kp = _mm512_loadu_si512((const void*)(K16 + (j - 1) * 8));
    __m512i kp8 = _mm512_loadu_si512((const void*)(K8 + (j - 1) * 8));
    __m512i key = relax_c(kp, add, oc_exc);
    __m512i key8 = relax_c(kp8, add, oc_exc);
    if (RUNS) {
      for (int t = 0; t < 5; ++t) {
        int64_t k = kRunKs[t];
        int64_t i = j - k;
        if (i >= 0 && zrun[i] >= (uint32_t)k) {
          uint64_t oc = (uint64_t(t) << kOrderShift) |
                        (uint64_t(kExceptions + t) << kCwShift);
          __m512i ki = _mm512_loadu_si512((const void*)(K16 + i * 8));
          key = _mm512_min_epu64(key, relax_c(ki, 1, oc));
          __m512i ki8 = _mm512_loadu_si512((const void*)(K8 + i * 8));
          key8 = _mm512_min_epu64(key8, relax_c(ki8, 1, oc));
        }
      }
    }
    for (int t = 0; t < kNumTargetSizes; ++t) {
      int64_t s = kTargetSizes[t];
      int64_t i = j - s;
      if (i < 0) continue;
      const MVal& m = mv[t][i];
      __m512i hit = _mm512_cvtepu16_epi64(
          _mm_loadu_si128((const __m128i*)m.v16));
      __m512i ki = _mm512_loadu_si512((const void*)(K16 + i * 8));
      key = _mm512_min_epu64(key, relax_h(ki, uint64_t(5 + t), hit));
      __m512i hit8 = _mm512_cvtepu8_epi64(
          _mm_loadl_epi64((const __m128i*)m.v8));
      __m512i ki8 = _mm512_loadu_si512((const void*)(K8 + i * 8));
      key8 = _mm512_min_epu64(key8, relax_h(ki8, uint64_t(5 + t), hit8));
    }
    _mm512_storeu_si512((void*)(K16 + j * 8), key);
    _mm512_storeu_si512((void*)(K8 + j * 8), key8);
  }
}

static void parse_mall(Encoder* e, const UnitScratch& u, const uint32_t* gaps,
                       int64_t n, int nctx) {
  (void)e;
  (void)nctx;
  if (u.has_run16)
    parse_mall_impl<true>(u, gaps, n);
  else
    parse_mall_impl<false>(u, gaps, n);
}
#else
// Scalar fallback: run the per-context dual sweeps and scatter their
// packed keys into the lane layout parse_mall's consumers expect.
static void parse_mall(Encoder* e, const UnitScratch& u, const uint32_t* gaps,
                       int64_t n, int nctx) {
  g_tls.mkey16.resize(size_t(n + 1) * 8);
  g_tls.mkey8.resize(size_t(n + 1) * 8);
  for (int c = 0; c < nctx; ++c) {
    parse_mhits_dual(e, u, c, gaps, n);
    for (int64_t j = 0; j <= n; ++j) {
      g_tls.mkey16[size_t(j) * 8 + c] = uint64_t(g_tls.cost[j]);
      g_tls.mkey8[size_t(j) * 8 + c] = uint64_t(g_tls.cost8[j]);
    }
  }
}
#endif

// Serialized byte sizes of context `ctx`'s two trials, off the final keys.
static std::pair<int64_t, int64_t> parse_mall_sizes(int ctx, int64_t n) {
  uint64_t kf = g_tls.mkey16[size_t(n) * 8 + ctx];
  uint64_t kf8 = g_tls.mkey8[size_t(n) * 8 + ctx];
  int64_t bytes16 = 2 * int64_t(kf >> kCostShift);
  int64_t bytes8 = 2 * int64_t(kf8 >> kCostShift) - int64_t(kf8 & kNedgeMask);
  return {bytes16, bytes8};
}

// Reconstruct the winning trial's parse path into g_tls.parent /
// g_tls.codeword (path nodes only — emit and verify_parse walk the
// path from n, never the full arrays).
static void parse_mall_extract(int ctx, bool b8, int64_t n) {
  const uint64_t* K = (b8 ? g_tls.mkey8 : g_tls.mkey16).data();
  g_tls.parent.resize(n + 1);
  g_tls.codeword.resize(n + 1);
  int64_t j = n;
  while (j != 0) {
    uint64_t k = K[size_t(j) * 8 + ctx];
    uint32_t order = uint32_t(k >> kOrderShift) & 0x1f;
    g_tls.parent[j] = int32_t(j - kEdgeSpan[order]);
    g_tls.codeword[j] = int32_t((k >> kCwShift) & 0xffff);
    j = g_tls.parent[j];
  }
}

static void emit(const Encoder* e, const uint32_t* gaps, int64_t n, int b,
                 std::vector<uint8_t>* out) {
  // backtrack (nodes strictly decrease), then emit in forward order
  // into a pre-sized scratch (raw pointer writes — per-byte push_back
  // capacity checks measured ~12 ns/byte) and append once
  static thread_local std::vector<int32_t> nodes;
  static thread_local std::vector<uint8_t> scratch;
  nodes.clear();
  for (int64_t i = n; i != 0; i = g_tls.parent[i]) nodes.push_back(int32_t(i));
  size_t worst = nodes.size() * 6 + 8;
  if (scratch.size() < worst) scratch.resize(worst);
  uint8_t* p = scratch.data();
  for (size_t t = nodes.size(); t-- > 0;) {
    int32_t v = nodes[t];
    int32_t cw = g_tls.codeword[v];
    if (cw > 1) {
      *p++ = uint8_t(cw & 0xff);
      if (b == 16) *p++ = uint8_t((cw >> 8) & 0xff);
    } else {
      uint32_t val = gaps[g_tls.parent[v]];
      if (val < kSmallLimit) {
        *p++ = 0;
        if (b == 16) *p++ = 0;
        *p++ = uint8_t(val & 0xff);
        *p++ = uint8_t((val >> 8) & 0xff);
      } else {
        *p++ = 1;
        if (b == 16) *p++ = 0;
        for (int k = 0; k < 4; ++k) *p++ = uint8_t((val >> (8 * k)) & 0xff);
      }
    }
  }
  out->insert(out->end(), scratch.data(), p);
}

static int64_t stream_bytes(const Encoder* e, int64_t n, int b) {
  int64_t total = 0;
  for (int64_t i = n; i != 0; i = g_tls.parent[i]) {
    int32_t cw = g_tls.codeword[i];
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
  e->maps.resize(n_contexts);
  for (int32_t d = 0; d < n_contexts; ++d) {
    int32_t cnt = counts[d];
    e->maps[d].table = e->table.data();
    e->maps[d].init(size_t(cnt) + 16);
    // runs first (indices 2..6), then entries ascending (overrides).
    // Multi-dict quirk mirrored for byte parity: the reference's
    // prepare_for_encoding (multi_dictionary.hpp:187-215) bounds each
    // context's hash loop by (span - reserved), so the LAST `reserved`
    // (7) entries of every context are invisible to its encoder; a
    // context with < 14 entries contributes nothing beyond the run
    // constants.  Cross-validated byte-exact against the reference
    // binary (tests/test_ref_parity.py).  The single-dict loop
    // (single_dictionary.hpp:154-165) has no such bound.
    if (n_contexts > 1) cnt -= kExceptions + 5;
    uint32_t idx = kExceptions;
    for (uint32_t nrun = 256; nrun >= 16; nrun /= 2, ++idx)
      e->maps[d].insert(zeros, nrun, /*off=*/0, idx);
    for (int32_t i = kExceptions + 5; i < cnt; ++i) {
      uint32_t off = offsets[int64_t(d) * entries_per_ctx + i];
      int32_t len = lengths[int64_t(d) * entries_per_ctx + i];
      if (len > (int32_t)kMaxEntrySize) continue;  // run rows: not content
      e->maps[d].insert(e->table.data() + off, len, off, uint32_t(i));
    }
    // constant results for all-zero windows of each target size
    for (int t = 0; t < kNumTargetSizes; ++t) {
      uint32_t s = kTargetSizes[t];
      size_t sl = e->maps[d].find_verified(hash_window(zeros, s), zeros, s);
      if (sl == size_t(-1)) {
        e->zhit16[d][t] = kNoHit;
        e->zhit8[d][t] = kNoHit;
      } else {
        e->zhit16[d][t] = e->maps[d].val16_at(sl);
        uint16_t v8 = e->maps[d].vals8[sl];
        e->zhit8[d][t] = v8 == kNoHit8 ? kNoHit : uint32_t(v8);
      }
    }
  }
  if (n_contexts > 1 && n_contexts <= kMaxCtx) {
    // combined map: one probe returns every context's codewords
    int64_t total_cnt = 0;
    for (int32_t d = 0; d < n_contexts; ++d) total_cnt += counts[d];
    e->mmap.table = e->table.data();
    e->mmap.init(size_t(total_cnt) + 16);
    for (int32_t d = 0; d < n_contexts; ++d) {
      uint32_t idx = kExceptions;
      for (uint32_t nrun = 256; nrun >= 16; nrun /= 2, ++idx)
        e->mmap.insert(zeros, nrun, /*off=*/0, idx, d);
      // same (span - reserved) bound as the per-context maps above
      for (int32_t i = kExceptions + 5; i < counts[d] - (kExceptions + 5);
           ++i) {
        uint32_t off = offsets[int64_t(d) * entries_per_ctx + i];
        int32_t len = lengths[int64_t(d) * entries_per_ctx + i];
        if (len > (int32_t)kMaxEntrySize) continue;
        e->mmap.insert(e->table.data() + off, len, off, uint32_t(i), d);
      }
    }
  }
  // all-zero-window constants, every context at once (MVal layout)
  for (int t = 0; t < kNumTargetSizes; ++t) {
    e->zmval[t] = MVal{};
    for (int32_t d = 0; d < n_contexts && d < kMaxCtx; ++d) {
      uint32_t z16 = e->zhit16[d][t];
      uint32_t z8 = e->zhit8[d][t];
      e->zmval[t].v16[d] = z16 == kNoHit ? 0 : uint16_t(z16);
      e->zmval[t].v8[d] = z8 == kNoHit ? 0 : uint8_t(z8);
    }
  }
  // decode tables for the post-emit verification pass
  e->dec_off.assign(offsets, offsets + int64_t(n_contexts) * entries_per_ctx);
  e->dec_len.assign(lengths, lengths + int64_t(n_contexts) * entries_per_ctx);
  e->entries_per_ctx = entries_per_ctx;
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

  // pre-grow the shared hash-power tables so worker threads never
  // mutate them (grow_pows only appends when too small)
  int64_t maxn = 1;
  for (int64_t u = 0; u < n_units; ++u)
    maxn = std::max(maxn, unit_offs[u + 1] - unit_offs[u]);
  grow_pows(size_t(maxn) + 1);

  // unit memo (mode-keyed so single/multi streams never mix);
  // mutex-guarded: the map is shared across worker threads
  // sampled key (first/last 16 + every 16th): memo_get content-compares
  // on hit, so a weaker key only risks extra compares, never wrong bytes
  auto memo_key = [&](const uint32_t* g, int64_t n) {
    uint64_t h = 0;
    int64_t head = n < 16 ? n : 16;
    for (int64_t i = 0; i < head; ++i) h = h * kP + mix64(g[i]);
    for (int64_t i = head; i < n - 16; i += 16) h = h * kP + mix64(g[i]);
    for (int64_t i = n - 16 > head ? n - 16 : head; i < n; ++i)
      h = h * kP + mix64(g[i]);
    return h ^ (uint64_t(n) << 1) ^ uint64_t(mode);
  };
  auto memo_get = [&](uint64_t key, const uint32_t* g, int64_t n,
                      std::vector<uint8_t>* buf) -> bool {
    std::lock_guard<std::mutex> lk(e->memo_mu);
    auto it = e->memo.find(key);
    if (it == e->memo.end()) return false;
    const auto& m = it->second;
    if ((int64_t)m.gaps.size() != n ||
        std::memcmp(m.gaps.data(), g, size_t(n) * 4) != 0)
      return false;
    buf->assign(m.bytes.begin(), m.bytes.end());
    return true;
  };
  auto memo_put = [&](uint64_t key, const uint32_t* g, int64_t n,
                      const std::vector<uint8_t>& buf) {
    std::lock_guard<std::mutex> lk(e->memo_mu);
    if (e->memo.size() >= Encoder::kMemoCap) e->memo.clear();
    auto& m = e->memo[key];
    m.gaps.assign(g, g + n);
    m.bytes.assign(buf.begin(), buf.end());
  };

  // encode one unit into *buf (uses only thread_local scratch + the
  // read-only Encoder tables — safe to run concurrently)
  // DINT_ENC_PROF=1: per-phase wall-time breakdown to stderr (serial
  // runs only; counters are unsynchronized across threads)
  static bool prof = std::getenv("DINT_ENC_PROF") != nullptr;
  static std::atomic<int64_t> t_pre{0}, t_lookup{0}, t_parse{0},
      t_verify{0}, t_emit{0}, t_memo{0};
  auto now_ns = [] {
    return std::chrono::duration_cast<std::chrono::nanoseconds>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
  };

  auto encode_one = [&](int64_t u, std::vector<uint8_t>* buf) {
    const uint32_t* g = gaps + unit_offs[u];
    int64_t n = unit_offs[u + 1] - unit_offs[u];
    buf->clear();
    int64_t t0 = prof ? now_ns() : 0;
    uint64_t mk = memo_key(g, n);
    if (memo_get(mk, g, n, buf)) {
      if (prof) t_memo += now_ns() - t0;
      return;
    }
    if (prof) t_memo += now_ns() - t0;
    UnitScratch& sc = g_tls.scr0;
    if (prof) t0 = now_ns();
    precompute_unit(&sc, g, n);
    if (prof) {
      int64_t t1 = now_ns();
      t_pre += t1 - t0;
      t0 = t1;
    }
    if (mode == 0) {
      // fused is kept for A/B experiments; the split probe passes win
      // because probe latency stays off the DP's serial relax chain
      static const bool fused = [] {
        const char* v = std::getenv("DINT_ENC_FUSED");
        return v && v[0] == '1';
      }();
      if (fused) {
        // single fused pass; all probes content-exact, no verify
        fused_parse_single(e, sc, g, n);
        if (prof) {
          int64_t t1 = now_ns();
          t_parse += t1 - t0;
          t0 = t1;
        }
      } else {
        g_trusted_hits = 0;
        lookup_pass(e, sc, 0, g, n, /*verified=*/false, /*need8=*/false);
        if (prof) {
          int64_t t1 = now_ns();
          t_lookup += t1 - t0;
          t0 = t1;
        }
        parse_hits(e, sc, /*b8=*/false, g, n);
        if (prof) {
          int64_t t1 = now_ns();
          t_parse += t1 - t0;
          t0 = t1;
        }
        // zero trusted-fingerprint hits => the parse is already
        // content-exact; verify_parse would be a no-op scan
        if (g_trusted_hits != 0 &&
            !verify_parse(e, sc, g, n, 0, /*exact_small=*/true)) {
          // hash collision (~never): redo content-verified
          lookup_pass(e, sc, 0, g, n, /*verified=*/true, /*need8=*/false);
          parse_hits(e, sc, false, g, n);
        }
        if (prof) {
          int64_t t1 = now_ns();
          t_verify += t1 - t0;
          t0 = t1;
        }
      }
      emit(e, g, n, 16, buf);
      if (prof) t_emit += now_ns() - t0;
    } else {
      // mode 1: ONE combined-map probe pass per unit feeds all 12
      // trial parses (6 contexts x {b=16, b=8}); serialized sizes come
      // off the DP keys directly and the winning parse is cached, so
      // no trial is ever walked or re-swept
      for (int pass = 0; pass < 2; ++pass) {
        bool verified = pass == 1;
        g_trusted_hits = 0;
        lookup_pass_multi(e, sc, g, n, verified);
        parse_mall(e, sc, g, n, e->n_contexts);
        int64_t best_size = kBig;
        int32_t best_sc = 0;
        for (int32_t s = 0; s < e->n_contexts; ++s) {
          auto [sz16, sz8] = parse_mall_sizes(s, n);
          int64_t sz = sz16;
          int32_t c = s;
          if (sz8 <= sz16) { sz = sz8; c = s + e->n_contexts; }
          if (sz < best_size) {
            best_size = sz;
            best_sc = c;
          }
        }
        buf->clear();
        buf->push_back(uint8_t(best_sc));
        int32_t ctx = best_sc % e->n_contexts;
        int b = best_sc >= e->n_contexts ? 8 : 16;
        parse_mall_extract(ctx, best_sc >= e->n_contexts, n);
        if (verified || g_trusted_hits == 0 ||
            verify_parse(e, sc, g, n, ctx)) {
          emit(e, g, n, b, buf);
          break;  // hash collision otherwise: retry content-verified
        }
      }
    }
    memo_put(mk, g, n, *buf);
  };

  int nthreads = 1;
  if (const char* env = std::getenv("DS2I_THREADS")) {
    nthreads = std::max(1, atoi(env));
  } else {
    nthreads = std::max(1u, std::thread::hardware_concurrency());
  }
  nthreads = int(std::min<int64_t>(nthreads, std::min<int64_t>(n_units, 64)));

  auto prof_dump = [&] {
    if (!prof) return;
    fprintf(stderr,
            "[enc prof ms] memo=%.1f pre=%.1f lookup=%.1f parse=%.1f "
            "verify=%.1f emit=%.1f\n",
            t_memo / 1e6, t_pre / 1e6, t_lookup / 1e6, t_parse / 1e6,
            t_verify / 1e6, t_emit / 1e6);
  };

  if (nthreads <= 1) {
    std::vector<uint8_t> buf;
    int64_t written = 0;
    for (int64_t u = 0; u < n_units; ++u) {
      encode_one(u, &buf);
      if (written + int64_t(buf.size()) > out_cap)
        return -(written + int64_t(buf.size()));
      std::memcpy(out_buf + written, buf.data(), buf.size());
      written += int64_t(buf.size());
      out_lens[u] = int64_t(buf.size());
    }
    prof_dump();
    return written;
  }

  // threaded prepare (work-stealing over units), ordered commit — the
  // semiasync_queue contract (semiasync_queue.hpp:12-95) with the
  // serial in-order byte append replaced by a deterministic ordered
  // concatenation of per-unit buffers
  std::vector<std::vector<uint8_t>> bufs{size_t(n_units)};
  std::atomic<int64_t> next{0};
  auto worker = [&]() {
    while (true) {
      int64_t u = next.fetch_add(1);
      if (u >= n_units) break;
      encode_one(u, &bufs[size_t(u)]);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < nthreads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();

  int64_t total = 0;
  for (auto& b : bufs) total += int64_t(b.size());
  if (total > out_cap) return -total;
  int64_t written = 0;
  for (int64_t u = 0; u < n_units; ++u) {
    std::memcpy(out_buf + written, bufs[size_t(u)].data(),
                bufs[size_t(u)].size());
    written += int64_t(bufs[size_t(u)].size());
    out_lens[u] = int64_t(bufs[size_t(u)].size());
  }
  return written;
}

}  // extern "C"
