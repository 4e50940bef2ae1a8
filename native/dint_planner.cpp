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
