// Native host query engine over the dint_tpu index layout.
//
// The reference serves queries from C++ enumerators walking a byte
// blob (include/ds2i/queries.hpp:34-573, include/dint/
// dict_posting_list.hpp:84-344).  Our host engine was Python/numpy and
// paid ~300 us of interpreter overhead per query; this module is the
// native equivalent the framework ships for host serving: cursors over
// the index's structure-of-arrays layout (dint_tpu/index/dint_index.py
// — list_n / block_ptr / block_max / docs_end / block_end / arena),
// DINT + interpolative block decode, and the six query algorithms with
// the reference's exact semantics:
//   and/or (+freq variants)  queries.hpp:34-130
//   wand                     queries.hpp:190-307
//   ranked_and               queries.hpp:309-385
//   ranked_or                queries.hpp:387-457
//   maxscore                 queries.hpp:459-573
// BM25 matches bm25.hpp:7-25 (k1=1.2, b=0.5, idf floor 1e-6).
//
// All algorithm results are cross-validated against the Python oracle
// engine (tests/test_native_query.py): result counts exactly, top-k
// scores within float tolerance.
//
// Driven via ctypes (dint_tpu/query/native_host.py); arrays are
// borrowed zero-copy from numpy and must outlive the context.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

// block-codec decoders (native/zoo_decode.cpp, compiled into this .so
// so the cursor engine serves block_freq_index kinds too — same
// (buf, avail, n, out) -> consumed contract, byte-parity-gated against
// the python codecs by tests/test_zoo_native.py)
extern "C" {
int64_t zoo_vbyte(const uint8_t*, int64_t, int64_t, uint32_t*);
int64_t zoo_maskedvbyte(const uint8_t*, int64_t, int64_t, uint32_t*);
int64_t zoo_streamvbyte(const uint8_t*, int64_t, int64_t, uint32_t*);
int64_t zoo_varintgb(const uint8_t*, int64_t, int64_t, uint32_t*);
int64_t zoo_varintg8iu(const uint8_t*, int64_t, int64_t, uint32_t*);
int64_t zoo_simple16(const uint8_t*, int64_t, int64_t, uint32_t*);
int64_t zoo_optpfor_block(const uint8_t*, int64_t, int64_t, uint32_t*);
int64_t zoo_interpolative(const uint8_t*, int64_t, int64_t, uint32_t*);
int64_t zoo_qmx(const uint8_t*, int64_t, int64_t, uint32_t*);
}

namespace {

constexpr int BLOCK_SIZE = 256;
constexpr int MAX_ENTRY_SIZE = 16;
constexpr int EXCEPTIONS = 2;
constexpr int NUM_SELECTORS = 6;
constexpr float K1 = 1.2f;
constexpr float B = 0.5f;
constexpr double EPS_SCORE = 1e-6;
constexpr uint32_t UNKNOWN_SUM = 0xFFFFFFFFu;

#define DS2I_UNLIKELY_(x) __builtin_expect(!!(x), 0)

// the reference's do_not_optimize_away (util.hpp:99-102)
static inline void do_not_elide(uint64_t v) {
    asm volatile("" : : "r"(v) : "memory");
}

static inline double now_us() {
    auto t = std::chrono::steady_clock::now().time_since_epoch();
    return std::chrono::duration<double, std::micro>(t).count();
}

// QH_PROF=1: per-batch work counters (diagnosis only — a handful of
// predictable increments per posting; qh_prof_read drains them)
struct ProfCounters {
    uint64_t docs_blocks = 0;
    uint64_t freqs_blocks = 0;
    uint64_t ess_docs = 0;     // essential-loop doc iterations
    uint64_t ess_scans = 0;    // essential-loop cursor scans
    uint64_t ne_probes = 0;    // non-essential next_geq probes
    uint64_t geq_calls = 0;
    uint64_t nexts = 0;
    double docs_us = 0;   // time inside docs-block decode
    double freqs_us = 0;  // time inside freqs-block decode
};
static ProfCounters g_prof;
static bool g_prof_on = false;

// ---------------------------------------------------------------- bits

struct BitReader {
    // little-endian bit stream: bit k = bit (k%8) of byte (k/8)
    // (dint_tpu/codecs/interpolative.py BitWriter/BitReader)
    const uint8_t* buf;
    uint64_t bitpos = 0;
    explicit BitReader(const uint8_t* b) : buf(b) {}
    inline uint64_t read(int len) {
        if (len == 0) return 0;
        uint64_t start = bitpos;
        bitpos += len;
        const uint8_t* p = buf + (start >> 3);
        // values are coded in <= 33 bits; an unaligned 64-bit load plus
        // one spill byte covers any (shift, len<=33) combination
        uint64_t w;
        std::memcpy(&w, p, 8);
        int shift = int(start & 7);
        uint64_t v = w >> shift;
        int got = 64 - shift;
        if (got < len) v |= uint64_t(p[8]) << got;
        return v & ((len == 64) ? ~0ull : ((1ull << len) - 1));
    }
};

static inline uint32_t vbyte_decode_single(const uint8_t* data, uint64_t& pos) {
    // TightVariableByte (block_codecs.hpp:20-102): 7-bit groups,
    // HIGH bit marks the LAST byte of a value
    uint32_t v = 0;
    int shift = 0;
    for (;;) {
        uint8_t c = data[pos++];
        v |= uint32_t(c & 0x7F) << shift;
        if (c & 0x80) return v;
        shift += 7;
    }
}

static inline int floor_log2_u64(uint64_t u) {
    return 63 - __builtin_clzll(u);
}

// Level-ordered binary interpolative decode
// (dint_tpu/codecs/interpolative.py decode_prefix_sums: BFS levels,
// per level a fixed-width plane then an extra-bit plane; same bit
// count as the reference's DFS coder, interpolative_coding.hpp).
struct IpNode {
    int s, e;
    uint64_t low, high;
};

static void decode_prefix_sums(BitReader& br, int n, uint64_t low0,
                               uint64_t high0, uint64_t* vals) {
    if (n <= 0) return;
    // a level of the (n<=256)-node tree holds <= 128 nodes; stack
    // buffers keep the hot loop free of allocator/TLS traffic
    IpNode buf_a[160], buf_b[160];
    uint64_t xs[160];
    uint32_t ms[160];
    uint8_t need[160];
    IpNode* level = buf_a;
    IpNode* next = buf_b;
    level[0] = {0, n, low0, high0};
    int L = 1;
    while (L) {
        for (int i = 0; i < L; ++i) {
            uint64_t u = level[i].high - level[i].low + 1;
            int b = floor_log2_u64(u);
            uint64_t m = (1ull << (b + 1)) - u;
            uint64_t x = br.read(b);
            xs[i] = x;
            ms[i] = uint32_t(m);
            need[i] = x >= m;
        }
        for (int i = 0; i < L; ++i)
            if (need[i]) xs[i] = 2 * xs[i] + br.read(1) - ms[i];
        int nl = 0;
        for (int i = 0; i < L; ++i) {
            const IpNode& nd = level[i];
            int h = (nd.e - nd.s) / 2;
            int mid = nd.s + h;
            uint64_t val = nd.low + xs[i];
            vals[mid] = val;
            if (mid - nd.s > 0) next[nl++] = {nd.s, mid, nd.low, val};
            if (nd.e - (mid + 1) > 0)
                next[nl++] = {mid + 1, nd.e, val, nd.high};
        }
        std::swap(level, next);
        L = nl;
    }
}

// interpolative block (dint_tpu/codecs/interpolative.py encode_block /
// decode_block; block_codecs.hpp:104-151 semantics): values are
// prefix-summed, last sum implied (or vbyte-prefixed when unknown),
// first n-1 prefix sums interpolative-coded in [0, sum].
static void interp_decode_block(const uint8_t* data, uint64_t pos, int n,
                                uint32_t sum_of_values, uint32_t* out) {
    if (sum_of_values == UNKNOWN_SUM)
        sum_of_values = vbyte_decode_single(data, pos);
    uint64_t psums[BLOCK_SIZE];  // partial blocks are < BLOCK_SIZE values
    BitReader br(data + pos);
    decode_prefix_sums(br, n - 1, 0, sum_of_values, psums);
    psums[n - 1] = sum_of_values;
    uint64_t prev = 0;
    for (int i = 0; i < n; ++i) {
        out[i] = uint32_t(psums[i] - prev);
        prev = psums[i];
    }
}

// docs fast path: the coded prefix sums ARE the docid deltas —
// docid[i] = base + psum[i] + i (gap g, docid = cumsum(g+1)-1+base),
// so write docids straight from the psums without the gap round-trip.
static void interp_decode_docids(const uint8_t* data, uint64_t pos, int n,
                                 uint32_t sum_of_values, uint32_t base,
                                 uint32_t* out) {
    uint64_t psums[BLOCK_SIZE];
    BitReader br(data + pos);
    decode_prefix_sums(br, n - 1, 0, sum_of_values, psums);
    psums[n - 1] = sum_of_values;
    for (int i = 0; i < n; ++i)
        out[i] = uint32_t(uint64_t(base) + psums[i] + uint64_t(i));
}

// ----------------------------------------------------------- dict view

struct DictView {
    const uint32_t* table;
    const uint32_t* offsets;  // (C, 65536)
    const int32_t* lengths;   // (C, 65536)
    int contexts;
    // fused per-entry rows, (C, 65536, 17): [len, 16 content words] —
    // ONE contiguous load per codeword instead of scattered
    // offsets/lengths/table hits across the ~0.5 MB maps (the
    // reference's rectangular_dictionary.hpp:206-213 layout wins for
    // exactly this reason; built once at qh_create)
    const uint32_t* rows = nullptr;
};

static constexpr int ROW_W = MAX_ENTRY_SIZE + 1;

static void build_dict_rows(DictView& v, std::vector<uint32_t>& store) {
    store.assign(size_t(v.contexts) * 65536 * ROW_W, 0);
    for (int c = 0; c < v.contexts; ++c) {
        const uint32_t* offs = v.offsets + size_t(c) * 65536;
        const int32_t* lens = v.lengths + size_t(c) * 65536;
        uint32_t* out = store.data() + size_t(c) * 65536 * ROW_W;
        for (int e = 0; e < 65536; ++e) {
            int32_t ln = lens[e];
            uint32_t* row = out + size_t(e) * ROW_W;
            row[0] = uint32_t(ln);
            int cp = ln < MAX_ENTRY_SIZE ? ln : MAX_ENTRY_SIZE;
            if (cp > 0)
                std::memcpy(row + 1, v.table + offs[e],
                            size_t(cp) * sizeof(uint32_t));
        }
    }
    v.rows = store.data();
}

// single_dint::decode semantics (vroom_env/dint_codecs.hpp:37-107):
// u16/u8 codeword stream; index>=2 copies a dictionary entry, 1 is an
// inline 4-byte exception, 0 a 2-byte exception.  Run entries
// (ln > 16) zero their own tail explicitly, so the output does NOT
// need pre-zeroing and block buffers need no per-block memset (the
// reference skips both the tail write and the memset, which is a
// latent stale-buffer bug for >16-runs its bundled data never hits —
// dict_posting_list.hpp:104, vroom_env/dint_codecs.hpp:51 copy 16
// words and skip; correct only while the buffer still holds its
// construction-time zeros).
static uint64_t dint_decode_single(const DictView& v, const uint8_t* data,
                                   uint64_t pos, int n, uint32_t* out,
                                   int b, int context) {
    const uint32_t* rows = v.rows + size_t(context) * 65536 * ROW_W;
    int i = 0;
    int out_pos = 0;
    // i < n (not !=): a malformed stream whose entry lengths overshoot
    // n must terminate, not spin (qh_decode_units_flat checks the byte
    // budget after return)
    while (i < n) {
        uint32_t index;
        if (b == 16) {
            index = uint32_t(data[pos]) | (uint32_t(data[pos + 1]) << 8);
            pos += 2;
        } else {
            index = data[pos];
            pos += 1;
        }
        if (index > EXCEPTIONS - 1) {
            const uint32_t* row = rows + size_t(index) * ROW_W;
            int ln = int(row[0]);
            // copy 16 words unconditionally (row is padded); runs
            // (ln > 16) zero their tail explicitly (rare, predictable)
            std::memcpy(out + out_pos, row + 1,
                        MAX_ENTRY_SIZE * sizeof(uint32_t));
            if (DS2I_UNLIKELY_(ln > MAX_ENTRY_SIZE))
                std::memset(out + out_pos + MAX_ENTRY_SIZE, 0,
                            size_t(ln - MAX_ENTRY_SIZE) * sizeof(uint32_t));
            out_pos += ln;
            i += ln;
        } else if (index == 1) {
            uint32_t val;
            std::memcpy(&val, data + pos, 4);
            pos += 4;
            out[out_pos++] = val;
            ++i;
        } else {
            uint32_t val = uint32_t(data[pos]) | (uint32_t(data[pos + 1]) << 8);
            pos += 2;
            out[out_pos++] = val;
            ++i;
        }
    }
    return pos;
}

// Docs-block variant: emits ABSOLUTE docids in one pass — the gap is
// converted right after each codeword's 16-word copy while it sits in
// L1 (docid = base + cumsum(gap + 1) - 1).  The reference keeps gap
// buffers and accumulates in next() (dict_posting_list.hpp:113-124);
// absolute buffers instead buy binary-search skips (next_geq,
// count_lt), and the fusion removes the separate 256-wide cumsum pass
// that made block entry ~2 L1 accesses/int dearer than the reference.
static uint64_t dint_decode_single_docids(const DictView& v,
                                          const uint8_t* data, uint64_t pos,
                                          int n, uint32_t* out, int b,
                                          int context, uint32_t base) {
    const uint32_t* rows = v.rows + size_t(context) * 65536 * ROW_W;
    int i = 0;
    int out_pos = 0;
    uint64_t acc = base;
    while (i != n) {
        uint32_t index;
        if (b == 16) {
            index = uint32_t(data[pos]) | (uint32_t(data[pos + 1]) << 8);
            pos += 2;
        } else {
            index = data[pos];
            pos += 1;
        }
        if (index > EXCEPTIONS - 1) {
            const uint32_t* row = rows + size_t(index) * ROW_W;
            int ln = int(row[0]);
            std::memcpy(out + out_pos, row + 1,
                        MAX_ENTRY_SIZE * sizeof(uint32_t));
            int head = ln < MAX_ENTRY_SIZE ? ln : MAX_ENTRY_SIZE;
            for (int k = 0; k < head; ++k) {
                acc += out[out_pos + k];
                out[out_pos + k] = uint32_t(acc);
                acc += 1;
            }
            // run tails (ln > 16) are all-zero gaps = consecutive
            // docids: counted fill, no zero reads, no dependence chain
            for (int k = head; k < ln; ++k)
                out[out_pos + k] = uint32_t(acc + uint64_t(k - head));
            acc += uint64_t(ln - head);
            out_pos += ln;
            i += ln;
        } else if (index == 1) {
            uint32_t val;
            std::memcpy(&val, data + pos, 4);
            pos += 4;
            acc += val;
            out[out_pos++] = uint32_t(acc);
            acc += 1;
            ++i;
        } else {
            uint32_t val = uint32_t(data[pos]) | (uint32_t(data[pos + 1]) << 8);
            pos += 2;
            acc += val;
            out[out_pos++] = uint32_t(acc);
            acc += 1;
            ++i;
        }
    }
    return pos;
}

// multi_opt_dint::decode (vroom_env/dint_codecs.hpp:520-619): 256-int
// chunks, selector byte sc (b=16, context sc) or sc+6 (b=8).
static uint64_t dint_decode_multi(const DictView& v, const uint8_t* data,
                                  uint64_t pos, int n, uint32_t* out) {
    int done = 0;
    while (done < n) {
        int size = std::min(BLOCK_SIZE, n - done);
        uint8_t sc = data[pos++];
        if (sc < NUM_SELECTORS)
            pos = dint_decode_single(v, data, pos, size, out + done, 16, sc);
        else
            pos = dint_decode_single(v, data, pos, size, out + done, 8,
                                     sc - NUM_SELECTORS);
        done += size;
    }
    return pos;
}

// ------------------------------------------------------------- context

struct Ctx {
    bool is_multi;
    int codec_id = -1;  // -1 = DINT; 0-7 zoo_many ids; 8 qmx; 9 u32
                        // (block_freq_index kinds, full blocks only —
                        // partials are always interpolative,
                        // block_codecs.hpp:104-151)
    uint64_t num_lists;
    uint64_t num_docs;
    const uint32_t* list_n;
    const uint64_t* block_ptr;
    const uint32_t* block_max;
    const uint64_t* docs_end;
    const uint64_t* block_end;
    const uint8_t* arena;
    DictView docs_dict;
    DictView freqs_dict;
    const float* norm_lens;
    const float* max_weight;
    std::vector<uint32_t> docs_rows, freqs_rows;  // fused dict rows
};

// codecs whose PARTIAL (<256) blocks divert to interpolative coding
// (dint_tpu/codecs/blocks.py: varint_g8iu, optpfor, qmx — the group/
// instance formats need whole blocks); every other codec decodes any
// n natively
static inline bool zoo_partial_interp(int codec) {
    return codec == 4 || codec == 6 || codec == 8;
}

// one full (256-int) block of a block-codec index: same dispatch
// table as zoo_many (zoo_decode.cpp); qmx blocks carry a
// TightVariableByte payload-length prefix (block_codecs.hpp:320-355),
// u32 blocks are raw little-endian words
static inline int64_t zoo_block_decode(int codec, const uint8_t* buf,
                                       int64_t avail, int n,
                                       uint32_t* out) {
    typedef int64_t (*fn_t)(const uint8_t*, int64_t, int64_t, uint32_t*);
    static const fn_t FNS[8] = {
        zoo_vbyte,     zoo_maskedvbyte, zoo_streamvbyte, zoo_varintgb,
        zoo_varintg8iu, zoo_simple16,   zoo_optpfor_block,
        zoo_interpolative,
    };
    if (codec < 8) return FNS[codec](buf, avail, n, out);
    if (codec == 8) {  // qmx
        uint64_t pos = 0;
        uint32_t ln = vbyte_decode_single(buf, pos);
        if (int64_t(pos) + ln > avail) return -1;
        return zoo_qmx(buf + pos, ln, n, out) < 0
                   ? -1
                   : int64_t(pos) + ln;
    }
    // u32: raw words
    if (int64_t(n) * 4 > avail) return -1;
    std::memcpy(out, buf, size_t(n) * 4);
    return int64_t(n) * 4;
}

// document_enumerator equivalent (dict_posting_list.hpp:84-344 /
// dint_tpu/query/lazy_decode.py Cursor): per-block lazy decode with
// block_max skip data; freq block decodes only on first freq() in the
// block (lazy, dict_posting_list.hpp:164-169).
// first index in [lo, hi) with a[i] >= target, by galloping from lo:
// short forward jumps (the common next_geq case) cost 1-3 probes like
// the reference's linear gap walk (dict_posting_list.hpp:127-148),
// long jumps stay logarithmic.
static inline int gallop_geq(const uint32_t* a, int lo, int hi,
                             uint32_t target) {
    if (lo >= hi || a[lo] >= target) return lo;
    int bound = 1;
    while (lo + bound < hi && a[lo + bound] < target) bound <<= 1;
    int lo2 = lo + (bound >> 1) + 1;
    int hi2 = lo + bound < hi ? lo + bound + 1 : hi;
    return int(std::lower_bound(a + lo2, a + hi2, target) - a);
}

struct NativeCursor {
    const Ctx* ctx;
    uint32_t term;
    uint64_t p0, p1;  // absolute block range
    int n;
    int nblocks;
    int cur_block = -1;    // relative
    int pos_in_block = 0;  // index within the decoded block
    int cur_size = 0;      // cached block_size_of(cur_block)
    uint32_t cur = 0;      // current docid (num_docs when exhausted)
    bool freqs_valid = false;
    // + MAX_ENTRY_SIZE slack: the dict copy writes 16 words
    // unconditionally even when the entry's tail lands past the block
    // end (rectangular_dictionary.hpp:206-213 does the same memcpy)
    uint32_t docs_buf[BLOCK_SIZE + MAX_ENTRY_SIZE];
    uint32_t freqs_buf[BLOCK_SIZE + MAX_ENTRY_SIZE];

    void init(const Ctx* c, uint32_t t) {
        ctx = c;
        term = t;
        p0 = c->block_ptr[t];
        p1 = c->block_ptr[t + 1];
        n = int(c->list_n[t]);
        nblocks = int(p1 - p0);
        cur_block = -1;
        pos_in_block = 0;
        cur_size = 0;
        freqs_valid = false;
        if (n)
            enter_block(0, 0);
        else
            cur = uint32_t(c->num_docs);
    }

    inline int block_size_of(int rel_b) const {
        return std::min(BLOCK_SIZE, n - rel_b * BLOCK_SIZE);
    }

    void enter_block(int rel_b, int pib) {
        double t0 = g_prof_on ? now_us() : 0;
        uint64_t b = p0 + rel_b;
        int size = block_size_of(rel_b);
        uint32_t base =
            rel_b > 0 ? ctx->block_max[b - 1] + 1 : 0;
        uint64_t start = b > 0 ? ctx->block_end[b - 1] : 0;
        bool interp_blk =
            ctx->codec_id == 7 /* interpolative codec: every block */ ||
            (size < BLOCK_SIZE &&
             (ctx->codec_id < 0 || zoo_partial_interp(ctx->codec_id)));
        if (interp_blk) {
            // docs sums are KNOWN -> no vbyte header on the wire
            // (block_codecs.hpp:104-151)
            uint32_t sum_v = ctx->block_max[b] - base - uint32_t(size - 1);
            interp_decode_docids(ctx->arena, start, size, sum_v, base,
                                 docs_buf);
        } else if (ctx->codec_id >= 0) {
            uint32_t tmp[BLOCK_SIZE + 8];
            int64_t avail = int64_t(ctx->docs_end[b] - start);
            zoo_block_decode(ctx->codec_id, ctx->arena + start, avail,
                             size, tmp);
            // d-gaps -> docids: docid[j] = base + psum(g)[j] + j
            // (identical to interp_decode_docids' rebuild)
            uint32_t p = 0;
            for (int j = 0; j < size; ++j) {
                p += tmp[j];
                docs_buf[j] = base + p + uint32_t(j);
            }
        } else {
            // no memset: the decoders are self-zeroing for run tails
            if (ctx->is_multi) {
                // one BLOCK_SIZE chunk == one selector + one unit
                uint8_t sc = ctx->arena[start];
                if (sc < NUM_SELECTORS)
                    dint_decode_single_docids(ctx->docs_dict, ctx->arena,
                                              start + 1, size, docs_buf, 16,
                                              sc, base);
                else
                    dint_decode_single_docids(ctx->docs_dict, ctx->arena,
                                              start + 1, size, docs_buf, 8,
                                              sc - NUM_SELECTORS, base);
            } else {
                dint_decode_single_docids(ctx->docs_dict, ctx->arena, start,
                                          size, docs_buf, 16, 0, base);
            }
        }
        cur_block = rel_b;
        cur_size = size;
        pos_in_block = pib;
        cur = docs_buf[pib];
        freqs_valid = false;
        if (g_prof_on) { ++g_prof.docs_blocks; g_prof.docs_us += now_us() - t0; }
    }

    inline uint32_t docid() const { return cur; }
    inline int size() const { return n; }

    inline __attribute__((always_inline)) uint32_t freq() {
        if (__builtin_expect(!freqs_valid, 0)) decode_freqs_block();
        return freqs_buf[pos_in_block] + 1;
    }

    void decode_freqs_block() {
        double t0 = g_prof_on ? now_us() : 0;
        if (g_prof_on) ++g_prof.freqs_blocks;
        uint64_t b = p0 + cur_block;
        int size = cur_size;
        uint64_t start = ctx->docs_end[b];
        bool interp_blk =
            ctx->codec_id == 7 ||
            (size < BLOCK_SIZE &&
             (ctx->codec_id < 0 || zoo_partial_interp(ctx->codec_id)));
        if (interp_blk) {
            interp_decode_block(ctx->arena, start, size, UNKNOWN_SUM,
                                freqs_buf);
        } else if (ctx->codec_id >= 0) {
            int64_t avail = int64_t(ctx->block_end[b] - start);
            zoo_block_decode(ctx->codec_id, ctx->arena + start, avail,
                             size, freqs_buf);
        } else {
            // no memset: dint_decode_single zeroes run tails itself
            if (ctx->is_multi)
                dint_decode_multi(ctx->freqs_dict, ctx->arena, start,
                                  size, freqs_buf);
            else
                dint_decode_single(ctx->freqs_dict, ctx->arena, start,
                                   size, freqs_buf, 16, 0);
        }
        freqs_valid = true;
        if (g_prof_on) g_prof.freqs_us += now_us() - t0;
    }

    // the reference's next() shape (dict_posting_list.hpp:113-124):
    // one increment + one unlikely compare on the hot path
    inline __attribute__((always_inline)) void next() {
        if (__builtin_expect(++pos_in_block == cur_size, 0)) {
            if (cur_block + 1 == nblocks) {
                cur = uint32_t(ctx->num_docs);
                --pos_in_block;  // spurious further next() re-exhausts
                return;
            }
            enter_block(cur_block + 1, 0);
        } else {
            cur = docs_buf[pos_in_block];
        }
    }

    // Count the docids in [docid(), target) and advance to the first
    // docid >= target (or exhaust).  Whole blocks with block_max <
    // target are counted WITHOUT decoding (their docids are all below
    // target and block sizes are known) — the union-count fast path
    // the reference's per-doc or_query (queries.hpp:86-130) never
    // takes.
    uint64_t count_lt(uint32_t target) {
        uint64_t cnt = 0;
        if (cur >= uint32_t(ctx->num_docs)) return 0;  // exhausted
        const uint32_t* maxs = ctx->block_max + p0;
        if (target > maxs[cur_block]) {
            cnt += cur_size - pos_in_block;
            int nb = cur_block + 1;
            while (nb < nblocks && maxs[nb] < target) {
                cnt += block_size_of(nb);
                ++nb;
            }
            if (nb >= nblocks) {
                cur = uint32_t(ctx->num_docs);
                pos_in_block = cur_size - 1;  // exhausted sentinel
                return cnt;
            }
            enter_block(nb, 0);
        }
        int hi = gallop_geq(docs_buf, pos_in_block, cur_size, target);
        cnt += hi - pos_in_block;
        pos_in_block = hi;
        cur = docs_buf[hi];  // hi < size: target <= block_max ensures it
        return cnt;
    }

    // count_lt with the or_freq contract: every counted posting's
    // freq is decoded and read (the reference touches freq() per doc,
    // queries.hpp:113-117 do_not_optimize_away) — block-batched so a
    // lone cursor's segment costs block decodes + a sum, not a
    // per-doc min-walk.  `sink` accumulates the freq values so the
    // compiler cannot elide the reads.
    uint64_t count_lt_freqs(uint32_t target, uint64_t& sink) {
        uint64_t cnt = 0;
        if (cur >= uint32_t(ctx->num_docs)) return 0;
        const uint32_t* maxs = ctx->block_max + p0;
        while (target > maxs[cur_block]) {
            if (!freqs_valid) decode_freqs_block();
            for (int j = pos_in_block; j < cur_size; ++j)
                sink += freqs_buf[j];
            cnt += cur_size - pos_in_block;
            if (cur_block + 1 >= nblocks) {
                cur = uint32_t(ctx->num_docs);
                pos_in_block = cur_size - 1;  // exhausted sentinel
                return cnt;
            }
            enter_block(cur_block + 1, 0);
        }
        int hi = gallop_geq(docs_buf, pos_in_block, cur_size, target);
        if (hi > pos_in_block) {
            if (!freqs_valid) decode_freqs_block();
            for (int j = pos_in_block; j < hi; ++j) sink += freqs_buf[j];
            cnt += hi - pos_in_block;
            pos_in_block = hi;
            cur = docs_buf[hi];
        }
        return cnt;
    }

    void next_geq(uint32_t target) {
        if (g_prof_on) ++g_prof.geq_calls;
        if (target <= cur) return;
        const uint32_t* maxs = ctx->block_max + p0;
        int lo = pos_in_block + 1;  // target > cur
        if (target > maxs[cur_block]) {
            int rel_b = gallop_geq(maxs, cur_block + 1, nblocks, target);
            if (rel_b >= nblocks) {
                cur = uint32_t(ctx->num_docs);
                pos_in_block = cur_size - 1;  // exhausted sentinel
                return;
            }
            enter_block(rel_b, 0);
            lo = 0;
        }
        int in_b = gallop_geq(docs_buf, lo, cur_size, target);
        pos_in_block = in_b;
        cur = docs_buf[in_b];
    }
};

// ------------------------------------------------------------- scoring

struct TopK {
    // topk_queue (queries.hpp:150-188): min-heap of the k best scores
    int k;
    std::vector<float> q;
    explicit TopK(int kk) : k(kk) { q.reserve(kk); }
    inline bool would_enter(float s) const {
        return int(q.size()) < k || s > q.front();
    }
    bool insert(float s) {
        if (int(q.size()) < k) {
            q.push_back(s);
            std::push_heap(q.begin(), q.end(), std::greater<float>());
            return true;
        }
        if (s > q.front()) {
            std::pop_heap(q.begin(), q.end(), std::greater<float>());
            q.back() = s;
            std::push_heap(q.begin(), q.end(), std::greater<float>());
            return true;
        }
        return false;
    }
};

static inline float doc_term_weight(float f, float nl) {
    return f / (f + K1 * (1.0f - B + B * nl));  // bm25.hpp:11-16
}

struct WeightedTerm {
    uint32_t term;
    float q_weight;
    float max_weight;  // q_weight * wdata.max_term_weight[term]
};

// (term, q_weight) pairs: dedup with qf counts, sorted by term id
// (wand_query ctor, queries.hpp:209-222; bm25::query_term_weight with
// the 1e-6 idf floor, bm25.hpp:18-24)
static void query_weights(const Ctx* c, const uint32_t* terms, int nt,
                          std::vector<WeightedTerm>& out) {
    static thread_local std::vector<uint32_t> tmp;
    tmp.assign(terms, terms + nt);
    std::sort(tmp.begin(), tmp.end());
    out.clear();
    for (int i = 0; i < int(tmp.size());) {
        int j = i;
        while (j < int(tmp.size()) && tmp[j] == tmp[i]) ++j;
        uint32_t t = tmp[i];
        double df = double(c->list_n[t]);
        double idf = std::log((double(c->num_docs) - df + 0.5) / (df + 0.5));
        float qw = float(double(j - i) * std::max(EPS_SCORE, idf) *
                         (1.0 + double(K1)));
        out.push_back({t, qw, qw * c->max_weight[t]});
        i = j;
    }
}

static void dedup_sorted(const uint32_t* terms, int nt,
                         std::vector<uint32_t>& out) {
    out.assign(terms, terms + nt);
    std::sort(out.begin(), out.end());
    out.erase(std::unique(out.begin(), out.end()), out.end());
}

// ----------------------------------------------------------- operators

// and_query (queries.hpp:34-84): sort by size ascending, leapfrog
static uint64_t op_and(const Ctx* c, std::vector<NativeCursor>& cur,
                       bool with_freqs) {
    size_t m = cur.size();
    std::sort(cur.begin(), cur.end(),
              [](const NativeCursor& a, const NativeCursor& b) {
                  return a.n < b.n;
              });
    uint64_t results = 0;
    uint32_t nd = uint32_t(c->num_docs);
    uint32_t candidate = cur[0].docid();
    size_t i = 1;
    while (candidate < nd) {
        for (; i < m; ++i) {
            cur[i].next_geq(candidate);
            if (cur[i].docid() != candidate) {
                candidate = cur[i].docid();
                i = 0;
                break;
            }
        }
        if (i == m) {
            ++results;
            if (with_freqs)
                for (size_t j = 0; j < m; ++j) {
                    volatile uint32_t f = cur[j].freq();
                    (void)f;
                }
            cur[0].next();
            candidate = cur[0].docid();
            i = 1;
        }
    }
    return results;
}

// pair_wise_intersect's loop (src/pair_wise_intersect.cpp:28-59):
// op_and with the result docids MATERIALIZED into `out` — the A/B
// counterpart of the reference tool, which writes every intersection
// result into a num_docs-sized buffer.
static uint64_t op_and_collect(const Ctx* c, std::vector<NativeCursor>& cur,
                               uint32_t* out) {
    size_t m = cur.size();
    std::sort(cur.begin(), cur.end(),
              [](const NativeCursor& a, const NativeCursor& b) {
                  return a.n < b.n;
              });
    uint64_t results = 0;
    uint32_t nd = uint32_t(c->num_docs);
    uint32_t candidate = cur[0].docid();
    size_t i = 1;
    while (candidate < nd) {
        for (; i < m; ++i) {
            cur[i].next_geq(candidate);
            if (cur[i].docid() != candidate) {
                candidate = cur[i].docid();
                i = 0;
                break;
            }
        }
        if (i == m) {
            out[results] = candidate;
            ++results;
            cur[0].next();
            candidate = cur[0].docid();
            i = 1;
        }
    }
    return results;
}

// or_query (queries.hpp:86-130): min-docid merge over distinct docs.
// The counting variant run-skips: docids strictly below the
// second-smallest cursor head are unique union results (every other
// cursor's future docids are >= its current head), so the leader
// counts them in bulk via count_lt — binary search within the decoded
// block, and whole blocks by size alone when block_max < target.
static uint64_t op_or(const Ctx* c, std::vector<NativeCursor>& cur,
                      bool with_freqs) {
    uint32_t nd = uint32_t(c->num_docs);
    uint64_t results = 0;
    uint64_t freq_sink = 0;
    size_t m = cur.size();
    for (;;) {
        uint32_t best = nd, second = nd;
        size_t bi = 0;
        for (size_t i = 0; i < m; ++i) {
            uint32_t d = cur[i].docid();
            if (d < best) {
                second = best;
                best = d;
                bi = i;
            } else if (d < second) {
                second = d;
            }
        }
        if (best == nd) break;
        if (best < second) {
            // lone-cursor segment: batched count; with_freqs decodes
            // and reads every counted posting's freq (the reference's
            // per-doc do_not_optimize_away(freq()), queries.hpp:113-117)
            results += with_freqs ? cur[bi].count_lt_freqs(second,
                                                           freq_sink)
                                  : cur[bi].count_lt(second);
        } else {  // tie at the minimum: one union doc, advance every holder
            ++results;
            for (size_t i = 0; i < m; ++i)
                if (cur[i].docid() == best) {
                    if (with_freqs) freq_sink += cur[i].freq();
                    cur[i].next();
                }
        }
    }
    do_not_elide(freq_sink);
    return results;
}

struct ScoredCursor {
    NativeCursor* c;
    float q_weight;
    float max_weight;
};

// by-docid (re)sort for the handful of query cursors: the arrays are
// tiny (m = #distinct terms) and nearly sorted on every resort, so a
// stable insertion sort beats std::sort/stable_sort (which heap-
// allocates a merge buffer) — the reference pays std::sort here
// (queries.hpp:229-236)
static inline void sort_by_docid(ScoredCursor* a, size_t m) {
    for (size_t i = 1; i < m; ++i) {
        ScoredCursor key = a[i];
        size_t j = i;
        while (j > 0 && a[j - 1].c->docid() > key.c->docid()) {
            a[j] = a[j - 1];
            --j;
        }
        a[j] = key;
    }
}

// wand_query, small-query variant (plain pivot walk; the segment-
// batched variant below wins 2x+ on monster unions but costs a little
// at tiny scale — both exact, op_wand picks by total posting count)
static uint64_t op_wand_small(const Ctx* c, std::vector<NativeCursor>& cur,
                              const std::vector<WeightedTerm>& wt, int k,
                              float* out_scores) {
    size_t m = cur.size();
    std::vector<ScoredCursor> ordered(m);
    for (size_t i = 0; i < m; ++i)
        ordered[i] = {&cur[i], wt[i].q_weight, wt[i].max_weight};
    sort_by_docid(ordered.data(), m);
    TopK topk(k);
    uint32_t nd = uint32_t(c->num_docs);
    for (;;) {
        // find pivot (queries.hpp:241-253)
        float upper_bound = 0.0f;
        bool found_pivot = false;
        size_t pivot = 0;
        for (pivot = 0; pivot < m; ++pivot) {
            if (ordered[pivot].c->docid() == nd) break;
            upper_bound += ordered[pivot].max_weight;
            if (topk.would_enter(upper_bound)) {
                found_pivot = true;
                break;
            }
        }
        if (!found_pivot) break;
        uint32_t pivot_id = ordered[pivot].c->docid();
        if (pivot_id == ordered[0].c->docid()) {
            float score = 0.0f;
            float nl = c->norm_lens[pivot_id];
            for (auto& e : ordered) {
                if (e.c->docid() != pivot_id) break;
                float f = float(e.c->freq());
                score += e.q_weight * doc_term_weight(f, nl);
                e.c->next();
            }
            topk.insert(score);
            sort_by_docid(ordered.data(), m);
        } else {
            size_t next_list = pivot;
            while (ordered[next_list].c->docid() == pivot_id) --next_list;
            ordered[next_list].c->next_geq(pivot_id);
            // bubble re-sort (queries.hpp:285-293)
            for (size_t i = next_list + 1; i < m; ++i) {
                if (ordered[i].c->docid() < ordered[i - 1].c->docid())
                    std::swap(ordered[i], ordered[i - 1]);
                else
                    break;
            }
        }
    }
    std::sort(topk.q.begin(), topk.q.end(), std::greater<float>());
    for (size_t i = 0; i < topk.q.size(); ++i) out_scores[i] = topk.q[i];
    return topk.q.size();
}

// wand_query (queries.hpp:190-307), segment-batched variant
static uint64_t op_wand_batched(
    const Ctx* c, std::vector<NativeCursor>& cur,
    const std::vector<WeightedTerm>& wt, int k, float* out_scores) {
    size_t m = cur.size();
    std::vector<ScoredCursor> ordered(m);
    for (size_t i = 0; i < m; ++i)
        ordered[i] = {&cur[i], wt[i].q_weight, wt[i].max_weight};
    sort_by_docid(ordered.data(), m);
    TopK topk(k);
    uint32_t nd = uint32_t(c->num_docs);
    for (;;) {
        // find pivot (queries.hpp:241-253)
        float upper_bound = 0.0f;
        bool found_pivot = false;
        size_t pivot = 0;
        for (pivot = 0; pivot < m; ++pivot) {
            if (ordered[pivot].c->docid() == nd) break;
            upper_bound += ordered[pivot].max_weight;
            if (topk.would_enter(upper_bound)) {
                found_pivot = true;
                break;
            }
        }
        if (!found_pivot) break;
        uint32_t pivot_id = ordered[pivot].c->docid();
        if (pivot_id == ordered[0].c->docid()) {
            // segment block-batching (same idea as op_maxscore): when
            // the pivot is the lone leading cursor and the next
            // cursor's docid (stop) is far, every doc below stop is
            // scored by that cursor alone and wand would insert each
            // one unconditionally — so score whole decoded blocks in
            // vectorizable passes and re-run the pivot logic only when
            // an insert raises the threshold past the cursor's own
            // max_weight (identical insert sequence -> identical topk
            // state -> identical pivots; results are bit-exact)
            uint32_t stop = m > 1 ? ordered[1].c->docid() : nd;
            if (pivot == 0 &&
                uint64_t(stop) >= uint64_t(pivot_id) + 128) {
                NativeCursor* cu = ordered[0].c;
                const float qw = ordered[0].q_weight;
                const float mw = ordered[0].max_weight;
                const float c0 = K1 * (1.0f - B);
                const float c1 = K1 * B;
                float nlbuf[BLOCK_SIZE];
                float sbuf[BLOCK_SIZE];
                bool repivot = false;
                for (;;) {
                    if (cu->docid() >= stop) break;
                    if (!cu->freqs_valid) cu->decode_freqs_block();
                    const int sz = cu->cur_size;
                    const int j0 = cu->pos_in_block;
                    const uint32_t* db = cu->docs_buf;
                    const uint32_t* fb = cu->freqs_buf;
                    int jend = sz;
                    if (db[sz - 1] >= stop)
                        jend = int(std::lower_bound(db + j0, db + sz,
                                                    stop) - db);
                    for (int j = j0; j < jend; ++j)
                        nlbuf[j] = c->norm_lens[db[j]];
                    for (int j = j0; j < jend; ++j) {
                        float f = float(fb[j] + 1);
                        sbuf[j] = qw * (f / (f + c0 + c1 * nlbuf[j]));
                    }
                    int j = j0;
                    for (; j < jend; ++j) {
                        if (topk.insert(sbuf[j]) &&
                            !topk.would_enter(mw)) {
                            // the cursor can no longer pivot alone:
                            // position past this doc and let the outer
                            // pivot search take over (it will jump or
                            // terminate)
                            repivot = true;
                            ++j;
                            break;
                        }
                    }
                    if (j < sz) {
                        // stopped mid-block: at stop (j == jend < sz)
                        // or right after a repivot-triggering doc —
                        // both re-enter the outer pivot search
                        cu->pos_in_block = j;
                        cu->cur = db[j];
                        break;
                    }
                    if (cu->cur_block + 1 >= cu->nblocks) {
                        cu->cur = nd;  // exhausted
                        break;
                    }
                    cu->enter_block(cu->cur_block + 1, 0);
                    if (repivot) break;
                }
                sort_by_docid(ordered.data(), m);
                continue;
            }
            float score = 0.0f;
            float nl = c->norm_lens[pivot_id];
            for (auto& e : ordered) {
                if (e.c->docid() != pivot_id) break;
                float f = float(e.c->freq());
                score += e.q_weight * doc_term_weight(f, nl);
                e.c->next();
            }
            topk.insert(score);
            sort_by_docid(ordered.data(), m);
        } else {
            size_t next_list = pivot;
            while (ordered[next_list].c->docid() == pivot_id) --next_list;
            ordered[next_list].c->next_geq(pivot_id);
            // bubble re-sort (queries.hpp:285-293)
            for (size_t i = next_list + 1; i < m; ++i) {
                if (ordered[i].c->docid() < ordered[i - 1].c->docid())
                    std::swap(ordered[i], ordered[i - 1]);
                else
                    break;
            }
        }
    }
    std::sort(topk.q.begin(), topk.q.end(), std::greater<float>());
    for (size_t i = 0; i < topk.q.size(); ++i) out_scores[i] = topk.q[i];
    return topk.q.size();
}

static uint64_t op_wand(const Ctx* c, std::vector<NativeCursor>& cur,
                        const std::vector<WeightedTerm>& wt, int k,
                        float* out_scores) {
    uint64_t total = 0;
    for (auto& e : cur) total += uint64_t(e.n);
    return total < 65536 ? op_wand_small(c, cur, wt, k, out_scores)
                         : op_wand_batched(c, cur, wt, k, out_scores);
}

// maxscore_query, small-query variant: the plain per-doc loop with
// the guarded single-essential fast path.  The segment-batched
// variant below wins 1.5-2x on monster unions but its loop-carried
// bookkeeping costs ~20% at testcoll scale (both are exact;
// op_maxscore picks by total posting count).
static uint64_t op_maxscore_small(
    const Ctx* c, std::vector<NativeCursor>& cur,
    const std::vector<WeightedTerm>& wt, int k, float* out_scores) {
    size_t m = cur.size();
    std::vector<ScoredCursor> ordered(m);
    for (size_t i = 0; i < m; ++i)
        ordered[i] = {&cur[i], wt[i].q_weight, wt[i].max_weight};
    for (size_t i = 1; i < m; ++i) {  // stable insertion by max_weight
        ScoredCursor key = ordered[i];
        size_t j = i;
        while (j > 0 && ordered[j - 1].max_weight > key.max_weight) {
            ordered[j] = ordered[j - 1];
            --j;
        }
        ordered[j] = key;
    }
    std::vector<float> upper_bounds(m);
    double acc = 0.0;
    for (size_t i = 0; i < m; ++i) {
        acc += double(ordered[i].max_weight);
        upper_bounds[i] = float(acc);
    }
    TopK topk(k);
    uint32_t nd = uint32_t(c->num_docs);
    size_t non_essential = 0;
    uint32_t cur_doc = nd;
    for (auto& e : ordered) cur_doc = std::min(cur_doc, e.c->docid());

    while (non_essential < m && cur_doc < nd) {
        // single-essential tail: with exactly one essential cursor
        // left (2-term queries past the first threshold growth, and
        // every query's endgame), the union IS that cursor's
        // remaining postings — walk it directly: no per-doc scan
        // loop, docid compare, min fold, or exhausted bookkeeping.
        // On the crawl-shaped A/B this regime carries most of the
        // essential-scan volume.  Entry requires the essential cursor
        // to actually sit at cur_doc: right after an insert promotes
        // non_essential to m-1, cur_doc was computed as the min over
        // the PREVIOUS essential range and can be a just-demoted
        // cursor's docid < cu->docid() — the general iteration below
        // handles that (scores cur_doc from non-essential probes
        // only) and re-establishes cur_doc from the essential set.
        if (non_essential + 1 == m &&
            ordered[non_essential].c->docid() == cur_doc) {
            NativeCursor* cu = ordered[non_essential].c;
            float qw = ordered[non_essential].q_weight;
            do {
                if (g_prof_on) { ++g_prof.ess_docs; ++g_prof.ess_scans; }
                float nl = c->norm_lens[cur_doc];
                float score =
                    qw * doc_term_weight(float(cu->freq()), nl);
                cu->next();
                for (size_t ii = non_essential; ii-- > 0;) {
                    if (!topk.would_enter(score + upper_bounds[ii]))
                        break;
                    if (g_prof_on) ++g_prof.ne_probes;
                    auto& e2 = ordered[ii];
                    e2.c->next_geq(cur_doc);
                    if (e2.c->docid() == cur_doc) {
                        float f = float(e2.c->freq());
                        score += e2.q_weight * doc_term_weight(f, nl);
                    }
                }
                if (topk.insert(score)) {
                    while (non_essential < m &&
                           !topk.would_enter(
                               upper_bounds[non_essential]))
                        ++non_essential;
                }
                cur_doc = cu->docid();
            } while (non_essential + 1 == m && cur_doc < nd);
            continue;
        }
        if (g_prof_on) ++g_prof.ess_docs;
        float score = 0.0f;
        float nl = c->norm_lens[cur_doc];
        uint32_t next_doc = nd;
        size_t exhausted = m;
        for (size_t i = non_essential; i < m; ++i) {
            if (g_prof_on) ++g_prof.ess_scans;
            auto& e = ordered[i];
            if (e.c->docid() == cur_doc) {
                float f = float(e.c->freq());
                score += e.q_weight * doc_term_weight(f, nl);
                e.c->next();
                if (DS2I_UNLIKELY_(e.c->docid() >= nd)) exhausted = i;
            }
            next_doc = std::min(next_doc, e.c->docid());
        }
        // drop exhausted essential cursors: docid == num_docs can
        // never match again, yet the reference keeps scanning them
        // every iteration (queries.hpp:526-536) — a 5-term query with
        // singleton rares pays ~m scans per union doc forever.
        // Removing at i >= non_essential leaves upper_bounds[0..ne)
        // untouched, so the non-essential pruning logic is unchanged.
        if (DS2I_UNLIKELY_(exhausted < m)) {
            size_t w = non_essential;
            for (size_t i = non_essential; i < m; ++i)
                if (ordered[i].c->docid() < nd) ordered[w++] = ordered[i];
            m = w;  // the while condition ends the walk once ne >= m;
                    // cur_doc still completes + inserts below first
            // surviving cursors shifted down: rebuild their cumulative
            // bounds (the prefix [0, ne) is untouched, so the
            // non-essential completion checks stay exact)
            for (size_t i = non_essential; i < m; ++i)
                upper_bounds[i] =
                    (i ? upper_bounds[i - 1] : 0.0f) +
                    ordered[i].max_weight;
        }
        for (size_t ii = non_essential; ii-- > 0;) {
            if (!topk.would_enter(score + upper_bounds[ii])) break;
            if (g_prof_on) ++g_prof.ne_probes;
            auto& e = ordered[ii];
            e.c->next_geq(cur_doc);
            if (e.c->docid() == cur_doc) {
                float f = float(e.c->freq());
                score += e.q_weight * doc_term_weight(f, nl);
            }
        }
        if (topk.insert(score)) {
            while (non_essential < m &&
                   !topk.would_enter(upper_bounds[non_essential]))
                ++non_essential;
        }
        cur_doc = next_doc;
    }
    std::sort(topk.q.begin(), topk.q.end(), std::greater<float>());
    for (size_t i = 0; i < topk.q.size(); ++i) out_scores[i] = topk.q[i];
    return topk.q.size();
}

// maxscore_query (queries.hpp:459-573), segment-batched variant with
// two exact extensions the reference lacks:
//  * segment block-batching: when exactly one essential cursor holds
//    cur_doc and the next essential docid (stop) is far, every doc of
//    that cursor below stop can only match it + non-essential lists,
//    so whole blocks are scored straight from the cursor's decoded
//    buffers in vectorizable passes (gather norm_lens, pure-vertical
//    BM25 lane loop the compiler turns into vdivps) with a threshold
//    skip; only docs that can actually enter the heap fall into the
//    scalar completion loop.  Scores are the same fp expressions per
//    doc, so results are identical to the per-doc walk.
//  * exhausted cursors drop out of the scan entirely and every
//    cumulative bound above them tightens by their weight (the
//    reference keeps scanning/probing docid==num_docs cursors forever,
//    queries.hpp:526-548); bounds remain true upper bounds, so all
//    pruning decisions stay exact.
static uint64_t op_maxscore_batched(
    const Ctx* c, std::vector<NativeCursor>& cur,
    const std::vector<WeightedTerm>& wt, int k, float* out_scores) {
    size_t m = cur.size();
    std::vector<ScoredCursor> ordered(m);
    for (size_t i = 0; i < m; ++i)
        ordered[i] = {&cur[i], wt[i].q_weight, wt[i].max_weight};
    for (size_t i = 1; i < m; ++i) {  // stable insertion by max_weight
        ScoredCursor key = ordered[i];
        size_t j = i;
        while (j > 0 && ordered[j - 1].max_weight > key.max_weight) {
            ordered[j] = ordered[j - 1];
            --j;
        }
        ordered[j] = key;
    }
    std::vector<float> upper_bounds(m);
    double acc = 0.0;
    for (size_t i = 0; i < m; ++i) {
        acc += double(ordered[i].max_weight);
        upper_bounds[i] = float(acc);
    }
    TopK topk(k);
    uint32_t nd = uint32_t(c->num_docs);
    size_t non_essential = 0;
    uint32_t cur_doc = nd;
    for (auto& e : ordered) cur_doc = std::min(cur_doc, e.c->docid());

    // remove cursor i: shift down, tighten every cumulative bound above
    // it by its weight (prefix [0, i) is untouched)
    auto drop_at = [&](size_t i) {
        const float w = ordered[i].max_weight;
        for (size_t jj = i; jj + 1 < m; ++jj) {
            ordered[jj] = ordered[jj + 1];
            upper_bounds[jj] = upper_bounds[jj + 1] - w;
        }
        --m;
        if (i < non_essential) --non_essential;
    };

    const float c0 = K1 * (1.0f - B);
    const float c1 = K1 * B;
    float nlbuf[BLOCK_SIZE];
    float sbuf[BLOCK_SIZE];

    // segment analysis: who holds cur_doc (icu, at_cnt) and where the
    // next essential docid is (stop).  The general step FUSES the next
    // iteration's stats into its scoring scan, so this full scan runs
    // only at entry, after a batch, and after index-shifting events
    // (promotions / exhausted drops) — an extra per-doc cursor sweep
    // measurably hurt tiny-query latency.
    size_t icu = m;
    uint32_t stop = nd;
    int at_cnt = 0;
    auto analyze = [&]() {
        icu = m;
        stop = nd;
        at_cnt = 0;
        for (size_t i = non_essential; i < m; ++i) {
            uint32_t d = ordered[i].c->docid();
            if (d == cur_doc) {
                ++at_cnt;
                icu = i;
            } else if (d < stop) {
                stop = d;
            }
        }
    };
    analyze();
    while (non_essential < m && cur_doc < nd) {
        // batch gate: a lone holder and a far stop (short interleaved
        // segments lose to the per-doc path's lower setup cost)
        if (at_cnt == 1 && uint64_t(stop) >= uint64_t(cur_doc) + 128) {
            NativeCursor* cu = ordered[icu].c;
            const float qw = ordered[icu].q_weight;
            // completion bounds freeze at entry: essential cursors
            // demoted DURING the batch sit at docids >= stop and cannot
            // match segment docs, so the entry bound stays the exact
            // completion bound for every doc below stop
            size_t ne0 = non_essential;
            float ubtail = ne0 ? upper_bounds[ne0 - 1] : 0.0f;
            bool done_all = false;
            for (;;) {
                if (cu->docid() >= stop) break;  // nd (exhausted) incl.
                if (!cu->freqs_valid) cu->decode_freqs_block();
                const int sz = cu->cur_size;
                const int j0 = cu->pos_in_block;
                const uint32_t* db = cu->docs_buf;
                const uint32_t* fb = cu->freqs_buf;
                int jend = sz;
                if (db[sz - 1] >= stop)
                    jend = int(
                        std::lower_bound(db + j0, db + sz, stop) - db);
                if (g_prof_on) {
                    g_prof.ess_docs += uint64_t(jend - j0);
                    g_prof.ess_scans += uint64_t(jend - j0);
                }
                for (int j = j0; j < jend; ++j)
                    nlbuf[j] = c->norm_lens[db[j]];
                for (int j = j0; j < jend; ++j) {
                    float f = float(fb[j] + 1);
                    sbuf[j] = qw * (f / (f + c0 + c1 * nlbuf[j]));
                }
                for (int j = j0; j < jend; ++j) {
                    float score = sbuf[j];
                    if (!topk.would_enter(score + ubtail)) continue;
                    const uint32_t d = db[j];
                    const float nl = nlbuf[j];
                    for (size_t ii = ne0; ii-- > 0;) {
                        if (!topk.would_enter(score + upper_bounds[ii]))
                            break;
                        if (g_prof_on) ++g_prof.ne_probes;
                        auto& e2 = ordered[ii];
                        e2.c->next_geq(d);
                        uint32_t d2 = e2.c->docid();
                        if (d2 == d) {
                            float f = float(e2.c->freq());
                            score +=
                                e2.q_weight * doc_term_weight(f, nl);
                        } else if (DS2I_UNLIKELY_(d2 >= nd)) {
                            drop_at(ii);
                            --icu;
                            --ne0;
                            ubtail = ne0 ? upper_bounds[ne0 - 1] : 0.0f;
                        }
                    }
                    if (topk.insert(score)) {
                        while (non_essential < m &&
                               !topk.would_enter(
                                   upper_bounds[non_essential]))
                            ++non_essential;
                        if (non_essential >= m) {
                            done_all = true;
                            break;
                        }
                        // cu itself demoted: every remaining segment
                        // doc is bounded by upper_bounds[icu] <=
                        // threshold — jump straight to stop
                        if (non_essential > icu) break;
                    }
                }
                if (done_all || non_essential > icu) break;
                if (jend < sz) {
                    cu->pos_in_block = jend;
                    cu->cur = db[jend];
                    break;  // reached stop
                }
                if (cu->cur_block + 1 >= cu->nblocks) {
                    cu->cur = nd;  // exhausted
                    break;
                }
                cu->enter_block(cu->cur_block + 1, 0);
            }
            if (done_all) break;
            if (non_essential <= icu &&
                DS2I_UNLIKELY_(cu->docid() >= nd))
                drop_at(icu);
            cur_doc = nd;
            for (size_t i = non_essential; i < m; ++i)
                cur_doc = std::min(cur_doc, ordered[i].c->docid());
            analyze();
            continue;
        }
        if (g_prof_on) ++g_prof.ess_docs;
        float score = 0.0f;
        float nl = c->norm_lens[cur_doc];
        uint32_t next_doc = nd, next2 = nd;
        int next_cnt = 0;
        size_t next_icu = m;
        size_t exhausted = m;
        bool dirty = false;
        for (size_t i = non_essential; i < m; ++i) {
            if (g_prof_on) ++g_prof.ess_scans;
            auto& e = ordered[i];
            if (e.c->docid() == cur_doc) {
                float f = float(e.c->freq());
                score += e.q_weight * doc_term_weight(f, nl);
                e.c->next();
                if (DS2I_UNLIKELY_(e.c->docid() >= nd)) exhausted = i;
            }
            uint32_t d = e.c->docid();
            if (d < next_doc) {
                next2 = next_doc;
                next_doc = d;
                next_cnt = 1;
                next_icu = i;
            } else if (d == next_doc) {
                ++next_cnt;
            } else if (d < next2) {
                next2 = d;
            }
        }
        // drop exhausted essential cursors: docid == num_docs can
        // never match again, yet the reference keeps scanning them
        // every iteration (queries.hpp:526-536) — a 5-term query with
        // singleton rares pays ~m scans per union doc forever.
        if (DS2I_UNLIKELY_(exhausted < m)) {
            for (size_t i = m; i-- > non_essential;)
                if (ordered[i].c->docid() >= nd) drop_at(i);
            dirty = true;  // indexes shifted
        }
        for (size_t ii = non_essential; ii-- > 0;) {
            if (!topk.would_enter(score + upper_bounds[ii])) break;
            if (g_prof_on) ++g_prof.ne_probes;
            auto& e = ordered[ii];
            e.c->next_geq(cur_doc);
            uint32_t d2 = e.c->docid();
            if (d2 == cur_doc) {
                float f = float(e.c->freq());
                score += e.q_weight * doc_term_weight(f, nl);
            } else if (DS2I_UNLIKELY_(d2 >= nd)) {
                drop_at(ii);
                dirty = true;
            }
        }
        if (topk.insert(score)) {
            size_t ne0 = non_essential;
            while (non_essential < m &&
                   !topk.would_enter(upper_bounds[non_essential]))
                ++non_essential;
            if (non_essential != ne0) dirty = true;
        }
        cur_doc = next_doc;
        if (dirty) {
            analyze();
        } else {
            at_cnt = next_cnt;
            stop = next2;
            icu = next_icu;
        }
    }
    std::sort(topk.q.begin(), topk.q.end(), std::greater<float>());
    for (size_t i = 0; i < topk.q.size(); ++i) out_scores[i] = topk.q[i];
    return topk.q.size();
}

// dispatcher: the batched variant's wins live in multi-million-
// posting unions; small queries keep the lean loop (both exact)
static uint64_t op_maxscore(const Ctx* c, std::vector<NativeCursor>& cur,
                            const std::vector<WeightedTerm>& wt, int k,
                            float* out_scores) {
    uint64_t total = 0;
    for (auto& e : cur) total += uint64_t(e.n);
    return total < 65536
               ? op_maxscore_small(c, cur, wt, k, out_scores)
               : op_maxscore_batched(c, cur, wt, k, out_scores);
}

// ranked_and_query (queries.hpp:309-385): AND leapfrog + scoring
static uint64_t op_ranked_and(const Ctx* c, std::vector<NativeCursor>& cur,
                              const std::vector<WeightedTerm>& wt, int k,
                              float* out_scores) {
    size_t m = cur.size();
    std::vector<ScoredCursor> ordered(m);
    for (size_t i = 0; i < m; ++i)
        ordered[i] = {&cur[i], wt[i].q_weight, wt[i].max_weight};
    std::sort(ordered.begin(), ordered.end(),
              [](const ScoredCursor& a, const ScoredCursor& b) {
                  return a.c->n < b.c->n;
              });
    TopK topk(k);
    uint32_t nd = uint32_t(c->num_docs);
    uint32_t candidate = ordered[0].c->docid();
    size_t i = 1;
    while (candidate < nd) {
        for (; i < m; ++i) {
            ordered[i].c->next_geq(candidate);
            if (ordered[i].c->docid() != candidate) {
                candidate = ordered[i].c->docid();
                i = 0;
                break;
            }
        }
        if (i == m) {
            float score = 0.0f;
            float nl = c->norm_lens[candidate];
            for (size_t j = 0; j < m; ++j) {
                float f = float(ordered[j].c->freq());
                score += ordered[j].q_weight * doc_term_weight(f, nl);
            }
            topk.insert(score);
            ordered[0].c->next();
            candidate = ordered[0].c->docid();
            i = 1;
        }
    }
    std::sort(topk.q.begin(), topk.q.end(), std::greater<float>());
    for (size_t i2 = 0; i2 < topk.q.size(); ++i2) out_scores[i2] = topk.q[i2];
    return topk.q.size();
}

// ranked_or_query (queries.hpp:387-457): exhaustive union scoring
static uint64_t op_ranked_or(const Ctx* c, std::vector<NativeCursor>& cur,
                             const std::vector<WeightedTerm>& wt, int k,
                             float* out_scores) {
    size_t m = cur.size();
    TopK topk(k);
    uint32_t nd = uint32_t(c->num_docs);
    uint32_t cur_doc = nd;
    for (auto& e : cur) cur_doc = std::min(cur_doc, e.docid());
    while (cur_doc < nd) {
        float score = 0.0f;
        float nl = c->norm_lens[cur_doc];
        uint32_t next_doc = nd;
        for (size_t i = 0; i < m; ++i) {
            if (cur[i].docid() == cur_doc) {
                float f = float(cur[i].freq());
                score += wt[i].q_weight * doc_term_weight(f, nl);
                cur[i].next();
            }
            next_doc = std::min(next_doc, cur[i].docid());
        }
        topk.insert(score);
        cur_doc = next_doc;
    }
    std::sort(topk.q.begin(), topk.q.end(), std::greater<float>());
    for (size_t i = 0; i < topk.q.size(); ++i) out_scores[i] = topk.q[i];
    return topk.q.size();
}

}  // namespace

// ------------------------------------------------------------- C API

extern "C" {

// mode: 0 single-DINT, 1 multi-DINT, 16+id block-codec kind
// (id: zoo_many order 0-7, 8 qmx, 9 u32)
void* qh_create(int mode, uint64_t num_lists, uint64_t num_docs,
                const uint32_t* list_n, const uint64_t* block_ptr,
                const uint32_t* block_max, const uint64_t* docs_end,
                const uint64_t* block_end, const uint8_t* arena,
                const uint32_t* d_table, const uint32_t* d_offsets,
                const int32_t* d_lengths, int d_contexts,
                const uint32_t* f_table, const uint32_t* f_offsets,
                const int32_t* f_lengths, int f_contexts,
                const float* norm_lens, const float* max_weight) {
    Ctx* c = new Ctx();
    c->is_multi = mode == 1;
    c->codec_id = mode >= 16 ? mode - 16 : -1;
    c->num_lists = num_lists;
    c->num_docs = num_docs;
    c->list_n = list_n;
    c->block_ptr = block_ptr;
    c->block_max = block_max;
    c->docs_end = docs_end;
    c->block_end = block_end;
    c->arena = arena;
    c->docs_dict = {d_table, d_offsets, d_lengths, d_contexts};
    c->freqs_dict = {f_table, f_offsets, f_lengths, f_contexts};
    if (c->codec_id < 0) {  // block-codec kinds carry no dictionaries
        build_dict_rows(c->docs_dict, c->docs_rows);
        build_dict_rows(c->freqs_dict, c->freqs_rows);
    }
    c->norm_lens = norm_lens;
    c->max_weight = max_weight;
    return c;
}

void qh_destroy(void* p) { delete static_cast<Ctx*>(p); }

// op: 0 and, 1 or, 2 and_freq, 3 or_freq, 4 wand, 5 maxscore,
//     6 ranked_and, 7 ranked_or, 8 and_collect (results materialized
//     into a num_docs buffer — src/pair_wise_intersect.cpp:28-59)
// Runs the whole query batch `runs` times; the first run is untimed
// warmup (src/queries.cpp:29-32), the remaining (runs-1) write one
// per-(run,query) microsecond sample each into out_us (run-major).
// out_cnt and out_scores are written on the last run.
int qh_run(void* p, int op, int k, int runs, const uint32_t* qterms,
           const uint64_t* qoffs, uint64_t Q, double* out_us,
           uint64_t* out_cnt, float* out_scores) {
    Ctx* c = static_cast<Ctx*>(p);
    bool ranked = op >= 4 && op <= 7;
    std::vector<NativeCursor> cursors;
    std::vector<WeightedTerm> wt;
    std::vector<uint32_t> terms;
    std::vector<uint32_t> collect;
    if (op == 8) collect.resize(c->num_docs);
    for (int run = 0; run < runs; ++run) {
        for (uint64_t qi = 0; qi < Q; ++qi) {
            const uint32_t* qt = qterms + qoffs[qi];
            int nt = int(qoffs[qi + 1] - qoffs[qi]);
            double t0 = now_us();
            uint64_t cnt = 0;
            float scores[256];
            int keff = std::min(k, 256);
            if (ranked) {
                query_weights(c, qt, nt, wt);
                size_t m = wt.size();
                cursors.resize(m);
                for (size_t i = 0; i < m; ++i)
                    cursors[i].init(c, wt[i].term);
                if (m == 0) {
                    cnt = 0;
                } else if (op == 4) {
                    cnt = op_wand(c, cursors, wt, keff, scores);
                } else if (op == 5) {
                    cnt = op_maxscore(c, cursors, wt, keff, scores);
                } else if (op == 6) {
                    cnt = op_ranked_and(c, cursors, wt, keff, scores);
                } else {
                    cnt = op_ranked_or(c, cursors, wt, keff, scores);
                }
                if (run == runs - 1 && out_scores) {
                    for (int i = 0; i < keff; ++i)
                        out_scores[qi * keff + i] =
                            uint64_t(i) < cnt ? scores[i] : -1.0f;
                }
            } else {
                dedup_sorted(qt, nt, terms);
                size_t m = terms.size();
                cursors.resize(m);
                for (size_t i = 0; i < m; ++i) cursors[i].init(c, terms[i]);
                if (m == 0)
                    cnt = 0;
                else if (op == 8)
                    cnt = op_and_collect(c, cursors, collect.data());
                else if (op == 0 || op == 2)
                    cnt = op_and(c, cursors, op == 2);
                else
                    cnt = op_or(c, cursors, op == 3);
            }
            double el = now_us() - t0;
            if (run > 0) out_us[uint64_t(run - 1) * Q + qi] = el;
            if (run == runs - 1) out_cnt[qi] = cnt;
        }
    }
    return 0;
}

// Flat batch decode of DINT units for the ladder image build
// (tools/decode.py LadderStreamDecoder): every unit decodes straight
// into its slot of ONE caller-provided buffer — no per-unit arrays,
// no concatenate pass.  The numpy batch path
// (query/lazy_decode.decode_units_fast_batch) stays the cross-checked
// oracle; at 908M ints it spends minutes building + joining ~3.5M
// per-unit arrays that this pass never materializes.
//
// Contract: out_flat is PRE-ZEROED (run codewords copy only their
// leading 16 words and rely on zeros beyond — the
// vroom_env/dint_codecs.hpp:37-107 semantics) and has >= 16 words of
// slack after the last unit (each dictionary codeword memcpys 16
// words unconditionally).  Units MUST be decoded in increasing
// out_offs order: a unit's <=15-word tail overspill lands in the next
// unit's first positions, which that unit's own leading writes always
// cover (every position < 16 of a unit is explicitly written; only
// run positions >= 16 rely on the pre-zeroed buffer).
// Returns 0, or -(1+u) if unit u's parse overruns its byte budget or
// output size.
int64_t qh_decode_units_flat(
    const uint32_t* table, const uint32_t* offsets, const int32_t* lengths,
    int contexts, const uint8_t* arena, const int64_t* starts,
    const int64_t* byte_lens, const int32_t* ns, const int32_t* ctxs,
    const int32_t* b_bits, int64_t num_units, const int64_t* out_offs,
    uint32_t* out_flat) {
    DictView v{table, offsets, lengths, contexts};
    std::vector<uint32_t> store;
    build_dict_rows(v, store);
    for (int64_t u = 0; u < num_units; ++u) {
        int n = ns[u];
        if (n <= 0) continue;
        uint64_t pos = uint64_t(starts[u]);
        uint64_t end_pos = dint_decode_single(
            v, arena, pos, n, out_flat + out_offs[u], b_bits[u], ctxs[u]);
        if (end_pos > pos + uint64_t(byte_lens[u])) return -(1 + u);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Fused ladder image build: decode -> classify -> pack in ONE pass.
//
// The ladder serving image (kernels/unpack_device.py
// ladder_plan_from_values + UnpackEngine) previously materialized the
// whole 3.6 GB flat value stream in numpy and re-read it three times
// (per-block max, per-class gather, bit-pack + lane transpose) —
// 160 s of the 185 s cold start at 908M ints on this VM (fresh-page
// faults dominate every large numpy temporary here).  This builder
// never materializes the stream: units decode into a small rolling
// block window; each full 256-value block classifies by OR-reduction
// (bit_width(OR) == bit_width(max)) and bit-packs straight into its
// width class's growable row-major buffer.  qh_ladder_fetch then
// transposes each class into the engine's lane-major (W, M, 128)
// layout (row r outer / word k inner: reads sequential, live write
// set = W cache lines).
//
// Semantics mirror ladder_plan_from_values(base_relative=False)
// exactly: w_need = ceil(log2(max+1)) clamped to >= 1, smallest
// ladder width >= w_need, values packed little-endian w-bit fields,
// vpw = 32/w per word, no value straddles a word.
// ---------------------------------------------------------------------------

static const int LADDER_WIDTHS[10] = {1, 2, 3, 4, 5, 6, 8, 10, 16, 32};

struct LadderBuilder {
    int vpb = 0;
    bool base_rel = false;  // subtract per-block min (monotone docid
                            // streams: PEF); mirror of
                            // ladder_plan_from_values(base_relative)
    std::vector<uint32_t> packed[10];    // row-major, stride W_k
    std::vector<int64_t> out_base[10];
    std::vector<uint32_t> vbase[10];     // per-block min (base_rel)
    std::vector<uint32_t> scratch;
    int64_t blocks = 0;
    std::vector<uint32_t> tail;
};

static inline int ladder_slot(uint32_t mx) {
    int wn = mx ? 32 - __builtin_clz(mx) : 1;
    for (int s = 0; s < 10; ++s)
        if (LADDER_WIDTHS[s] >= wn) return s;
    return 9;
}

static void ladder_finish_block(LadderBuilder* lb, const uint32_t* v) {
    const int vpb = lb->vpb;
    uint32_t base = 0;
    if (lb->base_rel) {
        base = v[0];
        for (int j = 1; j < vpb; ++j) base = v[j] < base ? v[j] : base;
        lb->scratch.resize(size_t(vpb));
        uint32_t* s2 = lb->scratch.data();
        for (int j = 0; j < vpb; ++j) s2[j] = v[j] - base;
        v = s2;
    }
    uint32_t mx = 0;
    for (int j = 0; j < vpb; ++j) mx |= v[j];
    int s = ladder_slot(mx);
    int w = LADDER_WIDTHS[s];
    int vpw = 32 / w;
    int W = (vpb + vpw - 1) / vpw;
    auto& vec = lb->packed[s];
    size_t p = vec.size();
    vec.resize(p + size_t(W));
    uint32_t* dst = vec.data() + p;
    for (int k = 0; k < W; ++k) {
        int base = k * vpw;
        int lim = vpw < vpb - base ? vpw : vpb - base;
        uint32_t word = 0;
        for (int j = 0; j < lim; ++j) word |= v[base + j] << (j * w);
        dst[k] = word;
    }
    lb->out_base[s].push_back(lb->blocks * int64_t(vpb));
    if (lb->base_rel) lb->vbase[s].push_back(base);
    ++lb->blocks;
}

int64_t qh_ladder_build(
    const uint32_t* table, const uint32_t* offsets, const int32_t* lengths,
    int contexts, const uint8_t* arena, const int64_t* starts,
    const int64_t* byte_lens, const int32_t* ns, const int32_t* ctxs,
    const int32_t* b_bits, int64_t num_units, int32_t vpb, void** out) {
    DictView v{table, offsets, lengths, contexts};
    std::vector<uint32_t> store;
    build_dict_rows(v, store);
    auto* lb = new LadderBuilder();
    lb->vpb = vpb;
    // rolling window: decode at `fill`, flush full vpb-blocks down.
    // Slack beyond fill: each codeword memcpys 16 words
    // unconditionally and the decode writes up to n values.
    int nmax = 0;
    for (int64_t u = 0; u < num_units; ++u)
        if (ns[u] > nmax) nmax = ns[u];
    std::vector<uint32_t> win(size_t(vpb) + size_t(nmax) +
                              MAX_ENTRY_SIZE + 64);
    int fill = 0;
    for (int64_t u = 0; u < num_units; ++u) {
        int n = ns[u];
        if (n <= 0) continue;
        uint64_t pos = uint64_t(starts[u]);
        uint64_t end_pos = dint_decode_single(
            v, arena, pos, n, win.data() + fill, b_bits[u], ctxs[u]);
        if (end_pos > pos + uint64_t(byte_lens[u])) {
            delete lb;
            return -(1 + u);
        }
        fill += n;
        while (fill >= vpb) {
            ladder_finish_block(lb, win.data());
            std::memmove(win.data(), win.data() + vpb,
                         size_t(fill - vpb) * sizeof(uint32_t));
            fill -= vpb;
        }
    }
    lb->tail.assign(win.data(), win.data() + fill);
    *out = lb;
    return 0;
}

// counts[10] <- blocks per ladder width slot (LADDER_WIDTHS order).
void qh_ladder_counts(void* h, int64_t* counts) {
    auto* lb = static_cast<LadderBuilder*>(h);
    for (int s = 0; s < 10; ++s)
        counts[s] = int64_t(lb->out_base[s].size());
}

int64_t qh_ladder_tail_len(void* h) {
    return int64_t(static_cast<LadderBuilder*>(h)->tail.size());
}

void qh_ladder_tail(void* h, uint32_t* out) {
    auto* lb = static_cast<LadderBuilder*>(h);
    std::memcpy(out, lb->tail.data(), lb->tail.size() * sizeof(uint32_t));
}

// Fill one class's lane-major image (W, M, 128) — caller pre-zeroes
// (lanes >= N stay zero) — and its out_base array.  `slot` indexes
// LADDER_WIDTHS.
void qh_ladder_fetch(void* h, int32_t slot, uint32_t* lane_major,
                     int64_t m_lanes, int64_t* out_base) {
    auto* lb = static_cast<LadderBuilder*>(h);
    int w = LADDER_WIDTHS[slot];
    int vpw = 32 / w;
    int64_t W = (lb->vpb + vpw - 1) / vpw;
    int64_t N = int64_t(lb->out_base[slot].size());
    const uint32_t* src = lb->packed[slot].data();
    int64_t plane = m_lanes * 128;
    for (int64_t r = 0; r < N; ++r) {
        const uint32_t* row = src + r * W;
        for (int64_t k = 0; k < W; ++k) lane_major[k * plane + r] = row[k];
    }
    std::memcpy(out_base, lb->out_base[slot].data(),
                size_t(N) * sizeof(int64_t));
}

// Build ladder classes from an ALREADY-DECODED flat value stream (the
// zoo/PEF plan path: plan_ladder host-decodes the wire once, then this
// replaces the numpy classify+pack+transpose passes — every full pass
// over a multi-GB flat stream pays this VM's fresh-page fault tax).
// base_relative mirrors ladder_plan_from_values(base_relative=True):
// per-block minimum subtracted and recorded (PEF docid streams).
int64_t qh_ladder_from_values(const uint32_t* flat, int64_t n,
                              int32_t vpb, int base_relative,
                              void** out) {
    auto* lb = new LadderBuilder();
    lb->vpb = vpb;
    lb->base_rel = base_relative != 0;
    int64_t nb = n / vpb;
    for (int64_t b = 0; b < nb; ++b)
        ladder_finish_block(lb, flat + b * vpb);
    lb->tail.assign(flat + nb * vpb, flat + n);
    *out = lb;
    return 0;
}

// per-block bases of one class (base_relative builders only)
void qh_ladder_vbase(void* h, int32_t slot, uint32_t* out) {
    auto* lb = static_cast<LadderBuilder*>(h);
    std::memcpy(out, lb->vbase[slot].data(),
                lb->vbase[slot].size() * sizeof(uint32_t));
}

void qh_ladder_free(void* h) { delete static_cast<LadderBuilder*>(h); }

// Timed mirror of src/dict_perf_test.cpp:43-63 over the serving-time
// fused row layout (length-first (17 u32)-wide rows — same bytes per
// row as the reference's rectangular m_table, values-then-length):
// each copy is one 64-byte memcpy from a random row plus the length
// read.  Indices are drawn uniformly over [0, dict_size) host-side
// and passed in so ours and the reference time the SAME access
// pattern shape.  Returns ns per copy.
double qh_dict_copy(const uint32_t* table, const uint32_t* offsets,
                    const int32_t* lengths, int contexts,
                    const uint32_t* indexes, uint64_t n, uint32_t runs) {
    DictView v{table, offsets, lengths, contexts};
    std::vector<uint32_t> store;
    build_dict_rows(v, store);
    const uint32_t* rows = v.rows;
    alignas(64) uint32_t out[MAX_ENTRY_SIZE];
    double elapsed = 0;
    for (uint32_t run = 0; run < runs; ++run) {
        auto start = std::chrono::high_resolution_clock::now();
        for (uint64_t i = 0; i < n; ++i) {
            const uint32_t* row = rows + size_t(indexes[i]) * ROW_W;
            std::memcpy(out, row + 1, MAX_ENTRY_SIZE * sizeof(uint32_t));
            uint32_t decoded_ints = row[0];
            // do_not_optimize_away (util.hpp): keep the copy + length
            asm volatile("" : : "r"(decoded_ints), "r"(out[0]) : "memory");
        }
        auto end = std::chrono::high_resolution_clock::now();
        elapsed += double(
            std::chrono::duration_cast<std::chrono::nanoseconds>(end - start)
                .count());
    }
    return elapsed / runs / double(n);
}

void qh_prof_enable(int on) {
    g_prof_on = on != 0;
    g_prof = ProfCounters{};
}

void qh_prof_read(uint64_t* out7) {
    out7[0] = g_prof.docs_blocks;
    out7[1] = g_prof.freqs_blocks;
    out7[2] = g_prof.ess_docs;
    out7[3] = g_prof.ess_scans;
    out7[4] = g_prof.ne_probes;
    out7[5] = g_prof.geq_calls;
    out7[6] = g_prof.nexts;
    out7[7] = uint64_t(g_prof.docs_us);
    out7[8] = uint64_t(g_prof.freqs_us);
}

}  // extern "C"
