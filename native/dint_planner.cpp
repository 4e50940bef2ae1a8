// Native serving-image planner for the localized decode engine.
//
// Mirrors dint_tpu/kernels/decode_local.py::plan_stream exactly: walks
// each encoded DINT unit's codeword stream (exceptions inline, runs
// split into 16-zero entries — semantics of the reference decoder,
// include/dint/dint_codecs.hpp:13-49), chops tokens into sub-units
// under the (W_TOKENS, N_OUT, TABLE_CLS) budgets, and builds each
// sub-unit's local dictionary ordered by (-freq, content lex).
//
// Exposed as a C ABI for ctypes.  Build: see dint_tpu/codecs/native.py
// (same g++ -O3 -shared recipe as dint_encoder.cpp).

#include <algorithm>
#include <cassert>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr int EXCEPTIONS = 2;
constexpr int MAX_ENTRY_SIZE = 16;
constexpr int LEN_SHIFT = 13;

// One parsed local token: where its content lives.
struct Tok {
  uint32_t off;   // offset into the global table (kind DICT)
  int32_t len;    // ints emitted
  uint32_t exc;   // inline exception value (kind EXC)
  uint8_t kind;   // 0 = dict span, 1 = zeros, 2 = exception
};

struct Planner {
  // dictionary view
  const uint32_t* table;
  const uint32_t* offsets;  // (C, E)
  const int32_t* lengths;   // (C, E)
  int64_t num_entries;
  int w_tokens, n_out, table_cls;

  // outputs (row-major, growable)
  std::vector<int32_t> out_tokens;  // R * w_tokens
  std::vector<int32_t> out_meta;    // R * w_tokens
  std::vector<uint32_t> out_table;  // R * table_cls
  std::vector<int32_t> out_n;
  std::vector<int64_t> out_unit;
  std::vector<int64_t> out_pos;

  std::vector<Tok> toks;  // scratch, reused per unit

  uint32_t value(const Tok& t, int k) const {
    if (t.kind == 1) return 0;
    if (t.kind == 2) return t.exc;
    return table[t.off + k];
  }
  bool all_zero(const Tok& t) const {
    if (t.kind == 1) return true;
    if (t.kind == 2) return t.exc == 0;
    for (int k = 0; k < t.len; ++k)
      if (table[t.off + k]) return false;
    return true;
  }
  uint64_t hash(const Tok& t) const {
    uint64_t h = 1469598103934665603ull ^ (uint64_t)t.len;
    for (int k = 0; k < t.len; ++k) {
      h ^= value(t, k);
      h *= 1099511628211ull;
    }
    return h;
  }
  bool equal(const Tok& a, const Tok& b) const {
    if (a.len != b.len) return false;
    for (int k = 0; k < a.len; ++k)
      if (value(a, k) != value(b, k)) return false;
    return true;
  }
  // Python tuple comparison: lexicographic, shorter-prefix first.
  bool less(const Tok& a, const Tok& b) const {
    int n = a.len < b.len ? a.len : b.len;
    for (int k = 0; k < n; ++k) {
      uint32_t x = value(a, k), y = value(b, k);
      if (x != y) return x < y;
    }
    return a.len < b.len;
  }
};

// Parse one unit's codeword stream into planner->toks.  Returns 0 on
// success, -1 if the stream is malformed (produced != n).
int parse_unit(Planner* p, const uint8_t* payload, int64_t byte_len,
               int64_t n, int b, int ctx) {
  p->toks.clear();
  const uint32_t* offs = p->offsets + (int64_t)ctx * p->num_entries;
  const int32_t* lens = p->lengths + (int64_t)ctx * p->num_entries;
  int tw = b / 8;
  int64_t count = byte_len / tw;
  int64_t i = 0, produced = 0;
  auto tok_at = [&](int64_t idx) -> uint32_t {
    const uint8_t* q = payload + idx * tw;
    return tw == 2 ? (uint32_t)q[0] | ((uint32_t)q[1] << 8) : (uint32_t)q[0];
  };
  while (produced < n) {
    if (i >= count) return -1;
    uint32_t cw = tok_at(i);
    if (cw >= EXCEPTIONS) {
      int32_t ln = lens[cw];
      if (ln > MAX_ENTRY_SIZE) {
        int full = ln / MAX_ENTRY_SIZE, rem = ln % MAX_ENTRY_SIZE;
        for (int r = 0; r < full; ++r)
          p->toks.push_back({0, MAX_ENTRY_SIZE, 0, 1});
        if (rem) p->toks.push_back({0, rem, 0, 1});
      } else {
        p->toks.push_back({offs[cw], ln, 0, 0});
      }
      produced += ln;
      i += 1;
    } else if (cw == 1) {  // 4-byte exception
      uint32_t v;
      if (tw == 2) {
        v = tok_at(i + 1) | (tok_at(i + 2) << 16);
        i += 3;
      } else {
        v = tok_at(i + 1) | (tok_at(i + 2) << 8) | (tok_at(i + 3) << 16) |
            (tok_at(i + 4) << 24);
        i += 5;
      }
      p->toks.push_back({0, 1, v, 2});
      produced += 1;
    } else {  // 2-byte exception
      uint32_t v;
      if (tw == 2) {
        v = tok_at(i + 1);
        i += 2;
      } else {
        v = tok_at(i + 1) | (tok_at(i + 2) << 8);
        i += 3;
      }
      p->toks.push_back({0, 1, v, 2});
      produced += 1;
    }
  }
  return produced == n ? 0 : -1;
}

}  // namespace

extern "C" {

void* dint_planner_create(const uint32_t* table, int64_t /*table_len*/,
                          const uint32_t* offsets, const int32_t* lengths,
                          int64_t num_contexts, int64_t num_entries,
                          int32_t w_tokens, int32_t n_out,
                          int32_t table_cls) {
  (void)num_contexts;
  auto* p = new Planner();
  p->table = table;
  p->offsets = offsets;
  p->lengths = lengths;
  p->num_entries = num_entries;
  p->w_tokens = w_tokens;
  p->n_out = n_out;
  p->table_cls = table_cls;
  return p;
}

void dint_planner_destroy(void* h) { delete static_cast<Planner*>(h); }

// Plan all units.  Returns total rows, or -1-unit_index on a malformed
// unit.  Arrays are read through the arena with per-unit offsets.
int64_t dint_plan_units(void* h, const uint8_t* arena, const int64_t* starts,
                        const int64_t* byte_lens, const int32_t* ns,
                        const int32_t* ctxs, const int32_t* b_bits,
                        int64_t num_units) {
  auto* p = static_cast<Planner*>(h);
  const int W = p->w_tokens, NOUT = p->n_out, TCLS = p->table_cls;

  struct Slot {
    uint64_t hash;
    int first_tok;  // representative token index
    int freq;
  };
  std::vector<Slot> vocab;            // insertion-ordered
  std::unordered_map<uint64_t, std::vector<int>> probe;  // hash -> slots
  std::vector<int> tok_slot;          // per in-window token: its slot

  for (int64_t u = 0; u < num_units; ++u) {
    if (parse_unit(p, arena + starts[u], byte_lens[u], ns[u], b_bits[u],
                   ctxs[u]) != 0)
      return -1 - u;
    const auto& T = p->toks;
    int64_t num_toks = (int64_t)T.size();
    int64_t i = 0, out_pos = 0;
    while (i < num_toks) {
      vocab.clear();
      probe.clear();
      tok_slot.clear();
      int64_t j = i;
      int outs = 0, words = MAX_ENTRY_SIZE;
      while (j < num_toks && (j - i) < W && outs + T[j].len <= NOUT) {
        uint64_t hh = p->hash(T[j]);
        int slot = -1;
        auto it = probe.find(hh);
        if (it != probe.end())
          for (int s : it->second)
            if (p->equal(T[vocab[s].first_tok], T[j])) { slot = s; break; }
        if (slot < 0) {
          int extra = p->all_zero(T[j]) ? 0 : T[j].len;
          if (words + extra > TCLS) break;
          slot = (int)vocab.size();
          vocab.push_back({hh, (int)j, 0});
          probe[hh].push_back(slot);
          words += extra;
        }
        vocab[slot].freq += 1;
        tok_slot.push_back(slot);
        outs += T[j].len;
        j += 1;
      }
      // order local dictionary by (-freq, content lex)
      int V = (int)vocab.size();
      std::vector<int> order(V);
      for (int v = 0; v < V; ++v) order[v] = v;
      std::sort(order.begin(), order.end(), [&](int a, int b) {
        if (vocab[a].freq != vocab[b].freq)
          return vocab[a].freq > vocab[b].freq;
        return p->less(T[vocab[a].first_tok], T[vocab[b].first_tok]);
      });
      std::vector<int> rank(V);
      for (int v = 0; v < V; ++v) rank[order[v]] = v;

      size_t mrow = p->out_meta.size(), trow = p->out_table.size();
      p->out_meta.resize(mrow + W, 0);
      p->out_table.resize(trow + TCLS, 0);
      p->out_tokens.resize(p->out_tokens.size() + W, V);
      int pos = MAX_ENTRY_SIZE;
      for (int v = 0; v < V; ++v) {
        const Tok& c = T[vocab[order[v]].first_tok];
        int off;
        if (p->all_zero(c)) {
          off = 0;
        } else {
          off = pos;
          for (int k = 0; k < c.len; ++k)
            p->out_table[trow + pos + k] = p->value(c, k);
          pos += c.len;
        }
        p->out_meta[mrow + v] = (int32_t)((c.len << LEN_SHIFT) | off);
      }
      int32_t* trow_toks =
          p->out_tokens.data() + p->out_tokens.size() - W;
      for (size_t t = 0; t < tok_slot.size(); ++t)
        trow_toks[t] = rank[tok_slot[t]];
      p->out_n.push_back(outs);
      p->out_unit.push_back(u);
      p->out_pos.push_back(out_pos);
      out_pos += outs;
      i = j;
    }
  }
  return (int64_t)p->out_n.size();
}

void dint_plan_export(void* h, int32_t* tokens, int32_t* meta,
                      uint32_t* table, int32_t* out_n, int64_t* unit_id,
                      int64_t* out_pos) {
  auto* p = static_cast<Planner*>(h);
  std::memcpy(tokens, p->out_tokens.data(),
              p->out_tokens.size() * sizeof(int32_t));
  std::memcpy(meta, p->out_meta.data(), p->out_meta.size() * sizeof(int32_t));
  std::memcpy(table, p->out_table.data(),
              p->out_table.size() * sizeof(uint32_t));
  std::memcpy(out_n, p->out_n.data(), p->out_n.size() * sizeof(int32_t));
  std::memcpy(unit_id, p->out_unit.data(),
              p->out_unit.size() * sizeof(int64_t));
  std::memcpy(out_pos, p->out_pos.data(),
              p->out_pos.size() * sizeof(int64_t));
}

}  // extern "C"

// ===========================================================================
// plan2: the STREAMING image planner.
//
// plan_stream + pack_plan_units + plan_to_vidx + the engine's class
// split, fused into one native pass so a shard of units goes straight
// to engine-ready arrays: per width class (zero / packed-u16 / i32)
// the final u8 vidx, lane-packed table and out_n, plus a segment map
// (class, row-in-class, off, len, unit, pos) for host re-assembly.
// The old pipeline materialized whole-stream intermediates (tokens,
// meta, per-output i64 repeats in plan_to_vidx) — ~88 transient
// bytes/int, 79.7 GiB peak and ~9 min at 908M ints; this pass is
// O(shard) scratch + O(image) output and is driven shard-by-shard
// from Python (DS2I_THREADS shards in flight: ctypes releases the
// GIL, each shard owns a private handle).
//
// Packing is first-fit-decreasing by output count within each width
// class (the pack_plan_units policy) but WITHOUT the token-count
// budget: merged rows are emitted as direct vidx, so only the output
// (<= N_OUT) and content-word (<= TABLE_CLS) budgets are real.  Local
// vocabularies keep per-row dedup; cross-row dedup is not attempted
// (measured 98.6% unique full tables).
// ===========================================================================

namespace {

struct RowScratch {
  int64_t tok_begin, tok_end;  // span in unit token list
  int64_t unit;                // global unit id
  int64_t pos;                 // output offset within unit
  int32_t outs;
  int32_t words;     // content words (excl. the 16-word zero region)
  uint32_t tabmax;   // max content value
  // local vocab: per token in span, (content off in row_table, len)
  int32_t vtab_begin;  // span into planner vtab_off/vtab_len
};

struct Planner2 {
  const uint32_t* table;
  const uint32_t* offsets;
  const int32_t* lengths;
  int64_t num_entries;
  int w_tokens, n_out, table_cls;

  Planner p1;  // reuse parse_unit scratch/toks

  // per-shard row scratch
  std::vector<RowScratch> rows;
  std::vector<uint32_t> row_table;   // concatenated per-row content words
  std::vector<int64_t> row_tab_off;  // per row: offset into row_table
  std::vector<int32_t> vidx_scratch; // per row: n_out entries (table idx)
  std::vector<int64_t> row_vidx_off;

  // shard outputs, per class
  std::vector<int32_t> n0;
  std::vector<uint8_t> vidx16;
  std::vector<uint32_t> tab16;  // (rows16, table_cls/2) lane-packed
  std::vector<int32_t> n16;
  std::vector<uint8_t> vidx32;
  std::vector<uint32_t> tab32;  // (rows32, table_cls)
  std::vector<int32_t> n32;
  std::vector<uint8_t> seg_cls;
  std::vector<int64_t> seg_row;
  std::vector<int32_t> seg_off;
  std::vector<int32_t> seg_len;
  std::vector<int64_t> seg_unit;
  std::vector<int64_t> seg_pos;
};

// FFD-pack `idx` (row ids of one class) and emit merged rows through
// `emit(group)`; groups preserve stream order internally.
template <typename EmitFn>
static void ffd_pack(Planner2* p, std::vector<int>& idx, EmitFn emit) {
  const int NOUT = p->n_out;
  const int WBUDGET = p->table_cls - MAX_ENTRY_SIZE;
  std::stable_sort(idx.begin(), idx.end(), [&](int a, int b) {
    return p->rows[a].outs > p->rows[b].outs;
  });
  constexpr int MAX_OPEN = 48;
  struct Bin {
    std::vector<int> members;
    int outs = 0, words = 0;
  };
  std::vector<Bin> bins;
  std::vector<int> open;
  for (int r : idx) {
    int o = p->rows[r].outs, w = p->rows[r].words;
    int placed = -1;
    for (int bi : open) {
      if (bins[bi].outs + o <= NOUT && bins[bi].words + w <= WBUDGET) {
        placed = bi;
        break;
      }
    }
    if (placed < 0) {
      placed = (int)bins.size();
      bins.push_back({});
      open.push_back(placed);
    }
    bins[placed].members.push_back(r);
    bins[placed].outs += o;
    bins[placed].words += w;
    if (bins[placed].outs > NOUT - 8) {
      open.erase(std::find(open.begin(), open.end(), placed));
    } else if ((int)open.size() > MAX_OPEN) {
      open.erase(open.begin());
    }
  }
  for (auto& b : bins) {
    std::sort(b.members.begin(), b.members.end());  // stream order
    emit(b.members);
  }
}

}  // namespace

extern "C" {

void* dint_planner2_create(const uint32_t* table, int64_t /*table_len*/,
                           const uint32_t* offsets, const int32_t* lengths,
                           int64_t /*num_contexts*/, int64_t num_entries,
                           int32_t w_tokens, int32_t n_out,
                           int32_t table_cls) {
  auto* p = new Planner2();
  p->table = table;
  p->offsets = offsets;
  p->lengths = lengths;
  p->num_entries = num_entries;
  p->w_tokens = w_tokens;
  p->n_out = n_out;
  p->table_cls = table_cls;
  p->p1.table = table;
  p->p1.offsets = offsets;
  p->p1.lengths = lengths;
  p->p1.num_entries = num_entries;
  return p;
}

void dint_planner2_destroy(void* h) { delete static_cast<Planner2*>(h); }

// Plan one shard of units into engine-ready class arrays.
// Returns 0, or -1-u on a malformed unit u (shard-relative).
int64_t dint_plan2_units(void* h, const uint8_t* arena, const int64_t* starts,
                         const int64_t* byte_lens, const int32_t* ns,
                         const int32_t* ctxs, const int32_t* b_bits,
                         int64_t num_units, int64_t unit_base) {
  auto* p = static_cast<Planner2*>(h);
  const int W = p->w_tokens, NOUT = p->n_out, TCLS = p->table_cls;

  // ---- pass 1: chop every unit into rows with direct local tables ----
  p->rows.clear();
  p->row_table.clear();
  p->row_tab_off.clear();
  p->vidx_scratch.clear();
  p->row_vidx_off.clear();

  struct Slot {
    uint64_t hash;
    int first_tok;
    int off;  // content offset within this row's table (0 = zero region)
  };
  std::vector<Slot> vocab;
  std::unordered_map<uint64_t, std::vector<int>> probe;

  for (int64_t u = 0; u < num_units; ++u) {
    if (parse_unit(&p->p1, arena + starts[u], byte_lens[u], ns[u], b_bits[u],
                   ctxs[u]) != 0)
      return -1 - u;
    const auto& T = p->p1.toks;
    int64_t num_toks = (int64_t)T.size();
    int64_t i = 0, out_pos = 0;
    while (i < num_toks) {
      vocab.clear();
      probe.clear();
      int64_t j = i;
      int outs = 0, words = 0;  // words EXCLUDES the 16-word zero region
      uint32_t tabmax = 0;
      int64_t tab_off = (int64_t)p->row_table.size();
      int64_t vidx_off = (int64_t)p->vidx_scratch.size();
      while (j < num_toks && (j - i) < W && outs + T[j].len <= NOUT) {
        uint64_t hh = p->p1.hash(T[j]);
        int slot = -1;
        auto it = probe.find(hh);
        if (it != probe.end())
          for (int s : it->second)
            if (p->p1.equal(T[vocab[s].first_tok], T[j])) {
              slot = s;
              break;
            }
        if (slot < 0) {
          bool zero = p->p1.all_zero(T[j]);
          int extra = zero ? 0 : T[j].len;
          if (MAX_ENTRY_SIZE + words + extra > TCLS) break;
          int off = 0;
          if (!zero) {
            off = MAX_ENTRY_SIZE + words;
            for (int k = 0; k < T[j].len; ++k) {
              uint32_t v = p->p1.value(T[j], k);
              p->row_table.push_back(v);
              if (v > tabmax) tabmax = v;
            }
            words += T[j].len;
          }
          slot = (int)vocab.size();
          vocab.push_back({hh, (int)j, off});
          probe[hh].push_back(slot);
        }
        // direct vidx: positions of this token read off+k (zero region
        // positions read 0..len-1, all zeros)
        int off = vocab[slot].off;
        for (int k = 0; k < T[j].len; ++k)
          p->vidx_scratch.push_back(off + k);
        outs += T[j].len;
        j += 1;
      }
      RowScratch r;
      r.tok_begin = i;
      r.tok_end = j;
      r.unit = unit_base + u;
      r.pos = out_pos;
      r.outs = outs;
      r.words = words;
      r.tabmax = tabmax;
      r.vtab_begin = 0;
      p->row_tab_off.push_back(tab_off);
      p->row_vidx_off.push_back(vidx_off);
      p->rows.push_back(r);
      out_pos += outs;
      i = j;
    }
  }

  // ---- pass 2: classify + FFD-pack per class + emit final arrays ----
  std::vector<int> cls0, cls16, cls32;
  for (int r = 0; r < (int)p->rows.size(); ++r) {
    if (p->rows[r].tabmax == 0)
      cls0.push_back(r);
    else if (p->rows[r].tabmax < (1u << 16))
      cls16.push_back(r);
    else
      cls32.push_back(r);
  }

  const int LANES16 = TCLS / 2;

  auto emit_group = [&](const std::vector<int>& group, int mode) {
    int64_t rid;
    uint8_t* vx = nullptr;
    uint32_t* tb = nullptr;
    if (mode == 0) {
      rid = (int64_t)p->n0.size();
      p->n0.push_back(0);
    } else if (mode == 16) {
      rid = (int64_t)p->n16.size();
      p->vidx16.resize(p->vidx16.size() + NOUT, 0);
      p->tab16.resize(p->tab16.size() + LANES16, 0);
      p->n16.push_back(0);
      vx = p->vidx16.data() + rid * NOUT;
      tb = p->tab16.data() + rid * LANES16;
    } else {
      rid = (int64_t)p->n32.size();
      p->vidx32.resize(p->vidx32.size() + NOUT, 0);
      p->tab32.resize(p->tab32.size() + TCLS, 0);
      p->n32.push_back(0);
      vx = p->vidx32.data() + rid * NOUT;
      tb = p->tab32.data() + rid * TCLS;
    }
    int cur_out = 0, cur_words = 0;
    for (int r : group) {
      const RowScratch& rs = p->rows[r];
      p->seg_cls.push_back((uint8_t)mode);
      p->seg_row.push_back(rid);
      p->seg_off.push_back(cur_out);
      p->seg_len.push_back(rs.outs);
      p->seg_unit.push_back(rs.unit);
      p->seg_pos.push_back(rs.pos);
      if (mode != 0) {
        int shift = cur_words;  // content words already placed
        const int32_t* vsrc = p->vidx_scratch.data() + p->row_vidx_off[r];
        for (int k = 0; k < rs.outs; ++k) {
          int v = vsrc[k];
          // zero-region reads stay in [0,16); content shifts up
          vx[cur_out + k] =
              (uint8_t)(v < MAX_ENTRY_SIZE ? v : v + shift);
        }
        const uint32_t* tsrc = p->row_table.data() + p->row_tab_off[r];
        if (mode == 16) {
          for (int k = 0; k < rs.words; ++k) {
            int e = MAX_ENTRY_SIZE + shift + k;  // final entry index
            tb[e >> 1] |= (tsrc[k] & 0xFFFFu) << (16 * (e & 1));
          }
        } else {
          std::memcpy(tb + MAX_ENTRY_SIZE + shift, tsrc,
                      rs.words * sizeof(uint32_t));
        }
        cur_words += rs.words;
      }
      cur_out += rs.outs;
    }
    if (mode == 0)
      p->n0.back() = cur_out;
    else if (mode == 16)
      p->n16.back() = cur_out;
    else
      p->n32.back() = cur_out;
  };

  ffd_pack(p, cls0, [&](const std::vector<int>& g) { emit_group(g, 0); });
  ffd_pack(p, cls16, [&](const std::vector<int>& g) { emit_group(g, 16); });
  ffd_pack(p, cls32, [&](const std::vector<int>& g) { emit_group(g, 32); });
  return 0;
}

void dint_plan2_sizes(void* h, int64_t* out) {
  auto* p = static_cast<Planner2*>(h);
  out[0] = (int64_t)p->n0.size();
  out[1] = (int64_t)p->n16.size();
  out[2] = (int64_t)p->n32.size();
  out[3] = (int64_t)p->seg_cls.size();
}

void dint_plan2_export(void* h, int32_t* n0, uint8_t* vidx16, uint32_t* tab16,
                       int32_t* n16, uint8_t* vidx32, uint32_t* tab32,
                       int32_t* n32, uint8_t* seg_cls, int64_t* seg_row,
                       int32_t* seg_off, int32_t* seg_len, int64_t* seg_unit,
                       int64_t* seg_pos) {
  auto* p = static_cast<Planner2*>(h);
  auto cp = [](auto* dst, const auto& src) {
    if (!src.empty())
      std::memcpy(dst, src.data(), src.size() * sizeof(src[0]));
  };
  cp(n0, p->n0);
  cp(vidx16, p->vidx16);
  cp(tab16, p->tab16);
  cp(n16, p->n16);
  cp(vidx32, p->vidx32);
  cp(tab32, p->tab32);
  cp(n32, p->n32);
  cp(seg_cls, p->seg_cls);
  cp(seg_row, p->seg_row);
  cp(seg_off, p->seg_off);
  cp(seg_len, p->seg_len);
  cp(seg_unit, p->seg_unit);
  cp(seg_pos, p->seg_pos);
  // reset shard outputs for handle reuse
  p->n0.clear();
  p->vidx16.clear();
  p->tab16.clear();
  p->n16.clear();
  p->vidx32.clear();
  p->tab32.clear();
  p->n32.clear();
  p->seg_cls.clear();
  p->seg_row.clear();
  p->seg_off.clear();
  p->seg_len.clear();
  p->seg_unit.clear();
  p->seg_pos.clear();
}

}  // extern "C"
