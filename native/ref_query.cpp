// Timed QUERY cross-validation harness: builds a REFERENCE index
// (the reference's own builders + encoders, compiled from the read-only
// checkout at /root/reference) over a ds2i collection, then runs the
// reference's own query algorithms (queries.hpp:34-573) with the exact
// timing protocol of src/queries.cpp:15-61 (11 runs, first untimed,
// avg/q50/q90/q95 usecs as a stats_line).  This gives the reference
// side of the query-latency A/B that scripts/ab_queries.py drives
// interleaved against our engines.
//
// The succinct read side (bit_vector enumerators) is provided by the
// ref_harness shim — an original implementation of the documented
// call-site contracts; `--check` runs the reference's own
// verify_collection over the built index, which exercises every
// enumerator path against ground truth and exits non-zero on mismatch.
//
// Build (see scripts/ab_queries.py):
//   g++ -O3 -march=native -std=c++17 -pthread
//       -I native/ref_harness -I <ref>/include -I <ref>/include/dint
//       -I <ref>/include/ds2i native/ref_query.cpp -o ref_query
//
// Usage:
//   ref_query query <index_type> <collection_basename> <query_file>
//             <ops colon-sep> [--check]
//       index_type: ef | single | uniform | opt | block_qmx | block_vbyte
//                   | block_u32 | block_varintgb | block_interpolative
//                   | single_rect_dint | single_packed_dint
//                   | multi_packed_dint
//       ops: and, and_freq, or, or_freq, wand, ranked_and, maxscore
//       (wand data is built in memory from <basename>.sizes, mirroring
//        src/create_wand_data.cpp)
//   ref_query tcopy <rect_dict_file> [num_copies] [runs]
//       mirror of src/dict_perf_test.cpp:32-63 (ns per dict.copy)
//   ref_query intersect <index_type> <collection_basename> <pairs_file>
//       mirror of src/pair_wise_intersect.cpp:28-120 (usecs/intersection)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <numeric>
#include <random>
#include <string>
#include <unordered_map>  // used unqualified by dint statistics collectors
#include <unordered_set>
#include <vector>

#include "succinct/util.hpp"

#include "index_types.hpp"
#include "queries.hpp"
#include "wand_data.hpp"

using namespace ds2i;

static const size_t NRUNS = 10 + 1;

template <typename QueryOperator, typename IndexType>
static void op_perftest(IndexType const& index, QueryOperator&& query_op,
                        std::vector<term_id_vec> const& queries,
                        std::string const& index_type,
                        std::string const& query_type, size_t runs) {
    // the exact protocol of src/queries.cpp:15-61
    std::vector<double> query_times;
    // per-query best-of-runs, dumped when REF_PERQUERY_DIR is set (the
    // per-query A/B diff harness, scripts/ab_maxscore_diff.py)
    std::vector<double> per_q(queries.size(), 1e30);
    size_t total = 0;
    for (size_t run = 0; run != runs; ++run) {
        size_t qi = 0;
        for (auto const& query : queries) {
            auto tick = get_time_usecs();
            uint64_t results = query_op(index, query);
            total += results;
            double elapsed = double(get_time_usecs() - tick);
            if (run != 0) {
                query_times.push_back(elapsed);
                if (elapsed < per_q[qi]) per_q[qi] = elapsed;
            }
            ++qi;
        }
    }
    if (const char* dir = getenv("REF_PERQUERY_DIR")) {
        std::ofstream ofs(std::string(dir) + "/" + query_type + ".txt");
        for (double v : per_q) ofs << v << "\n";
    }

    std::sort(query_times.begin(), query_times.end());
    double avg =
        std::accumulate(query_times.begin(), query_times.end(), double()) /
        query_times.size();
    double q50 = query_times[query_times.size() / 2];
    double q90 = query_times[90 * query_times.size() / 100];
    double q95 = query_times[95 * query_times.size() / 100];

    stats_line()("side", std::string("reference"))("type", index_type)(
        "query", query_type)("avg", avg)("q50", q50)("q90", q90)("q95", q95)(
        "total_results", total / runs)("num_queries", queries.size());
}

static std::vector<term_id_vec> load_queries(const char* path) {
    std::ifstream ifs(path);
    if (!ifs) {
        fprintf(stderr, "cannot open query file %s\n", path);
        exit(1);
    }
    std::vector<term_id_vec> queries;
    term_id_vec q;
    while (read_query(q, ifs)) queries.push_back(q);
    return queries;
}

template <typename IndexType>
static void run_queries(const char* basename, const char* query_file,
                        std::string const& type, std::string const& ops,
                        bool check) {
    binary_freq_collection input(basename);
    global_parameters params;

    double t0 = get_time_usecs();
    typename IndexType::builder builder(input.num_docs(), params);
    builder.build_model(basename);
    double t_model = get_time_usecs();
    size_t postings = 0;
    for (auto const& plist : input) {
        uint64_t freqs_sum = std::accumulate(
            plist.freqs.begin(), plist.freqs.end(), uint64_t(0));
        builder.add_posting_list(plist.docs.size(), plist.docs.begin(),
                                 plist.freqs.begin(), freqs_sum);
        postings += plist.docs.size();
    }
    IndexType index;
    builder.build(index);
    double t1 = get_time_usecs();
    stats_line()("side", std::string("reference"))("type", type)(
        "worker_threads", configuration::get().worker_threads)(
        "construction_time_s", (t1 - t0) / 1e6)(
        "model_time_s", (t_model - t0) / 1e6)("postings", postings);

    if (check) {
        // full-index verification against the input collection (the
        // semantics of verify_collection.hpp:7-52, run on the in-memory
        // index): every docid and freq of every list, exit 1 on mismatch
        binary_freq_collection input2(basename);
        size_t s = 0;
        for (auto seq : input2) {
            auto e = index[s];
            if (e.size() != seq.docs.size()) {
                logger() << "sequence " << s << " has wrong length! ("
                         << e.size() << " != " << seq.docs.size() << ")";
                exit(1);
            }
            for (size_t i = 0; i < e.size(); ++i, e.next()) {
                uint64_t docid = *(seq.docs.begin() + i);
                uint64_t freq = *(seq.freqs.begin() + i);
                if (docid != e.docid() || freq != e.freq()) {
                    logger() << "sequence " << s << " differs at position "
                             << i << ": (" << e.docid() << "," << e.freq()
                             << ") != (" << docid << "," << freq << ")";
                    exit(1);
                }
            }
            s += 1;
        }
        logger() << "verification ok: " << s << " lists exact" << std::endl;
        stats_line()("side", std::string("reference"))("type", type)(
            "check", std::string("ok"))("lists", s);
    }

    auto queries = load_queries(query_file);

    // warm-up protocol of src/queries.cpp:74-83
    std::unordered_set<term_id_type> warmed_up;
    for (auto const& q : queries)
        for (auto t : q)
            if (!warmed_up.count(t) && t < index.size()) {
                index.warmup(t);
                warmed_up.insert(t);
            }

    // wand data built in memory, mirroring src/create_wand_data.cpp
    binary_collection sizes_coll((std::string(basename) + ".sizes").c_str());
    binary_freq_collection coll(basename);
    wand_data<> wdata(sizes_coll.begin()->begin(), coll.num_docs(), coll);

    std::string rest = ops;
    while (!rest.empty()) {
        auto pos = rest.find(':');
        std::string t = rest.substr(0, pos);
        rest = pos == std::string::npos ? std::string() : rest.substr(pos + 1);
        if (t == "and") {
            op_perftest(index, and_query<false>(), queries, type, t, NRUNS);
        } else if (t == "and_freq") {
            op_perftest(index, and_query<true>(), queries, type, t, NRUNS);
        } else if (t == "or") {
            op_perftest(index, or_query<false>(), queries, type, t, NRUNS);
        } else if (t == "or_freq") {
            op_perftest(index, or_query<true>(), queries, type, t, NRUNS);
        } else if (t == "wand") {
            op_perftest(index, wand_query(wdata, 10), queries, type, t, NRUNS);
        } else if (t == "ranked_and") {
            op_perftest(index, ranked_and_query(wdata, 10), queries, type, t,
                        NRUNS);
        } else if (t == "maxscore") {
            op_perftest(index, maxscore_query(wdata, 10), queries, type, t,
                        NRUNS);
        } else {
            logger() << "Unsupported query type: " << t << std::endl;
        }
    }
}

// mirror of src/pair_wise_intersect.cpp:28-59
template <typename Enum>
static uint64_t intersect_pair(uint64_t num_docs, std::vector<Enum>& enums,
                               std::vector<uint32_t>& out) {
    if (enums[0].size() > enums[1].size()) std::swap(enums[0], enums[1]);
    uint64_t results = 0;
    uint64_t candidate = enums[0].docid();
    size_t i = 1;
    while (candidate < num_docs) {
        for (; i < 2; ++i) {
            enums[i].next_geq(candidate);
            if (enums[i].docid() != candidate) {
                candidate = enums[i].docid();
                i = 0;
                break;
            }
        }
        if (i == 2) {
            out[results] = candidate;
            ++results;
            enums[0].next();
            candidate = enums[0].docid();
            i = 1;
        }
    }
    return results;
}

template <typename IndexType>
static void run_intersect(const char* basename, const char* query_file,
                          std::string const& type) {
    binary_freq_collection input(basename);
    global_parameters params;
    typename IndexType::builder builder(input.num_docs(), params);
    builder.build_model(basename);
    for (auto const& plist : input) {
        uint64_t freqs_sum = std::accumulate(
            plist.freqs.begin(), plist.freqs.end(), uint64_t(0));
        builder.add_posting_list(plist.docs.size(), plist.docs.begin(),
                                 plist.freqs.begin(), freqs_sum);
    }
    IndexType index;
    builder.build(index);

    auto queries = load_queries(query_file);
    uint32_t num_queries = queries.size();
    uint64_t num_docs = index.num_docs();
    std::vector<uint32_t> out(num_docs);

    double total_usecs = 0.0;
    static const int runs = 10 + 1;
    size_t total = 0;
    typedef typename IndexType::document_enumerator enum_type;
    std::vector<enum_type> qq;
    qq.reserve(2);
    for (int run = 0; run != runs; ++run) {
        double start = get_time_usecs();
        for (uint32_t i = 0; i != num_queries; ++i) {
            qq.clear();
            for (auto term : queries[i]) qq.push_back(index[term]);
            uint64_t size = intersect_pair(num_docs, qq, out);
            total += size;
        }
        double end = get_time_usecs();
        if (run) total_usecs += end - start;
    }

    stats_line()("side", std::string("reference"))("type", type)(
        "query", std::string("pair_intersect"))(
        "usec_per_intersection", total_usecs / (runs - 1) / num_queries)(
        "num_queries", size_t(num_queries))("total_results",
                                            total / size_t(runs));
}

// mirror of src/dict_perf_test.cpp:25-63
static void run_tcopy(const char* dict_file, uint64_t n, uint32_t runs) {
    typedef single_dictionary_rectangular_type dictionary_type;
    dictionary_type dict;
    dictionary_type::builder builder;
    std::ifstream ifs(dict_file);
    if (!ifs) {
        fprintf(stderr, "cannot open dictionary %s\n", dict_file);
        exit(1);
    }
    builder.load(ifs);
    uint64_t dict_size = builder.size();
    builder.build(dict);

    std::random_device rd;
    std::default_random_engine eng(rd());
    std::uniform_int_distribution<uint32_t> uniform_dist(0, dict_size);
    std::vector<uint32_t> indexes;
    indexes.reserve(n);
    for (uint64_t i = 0; i < n; ++i) indexes.push_back(uniform_dist(eng));

    std::vector<uint32_t> out(dictionary_type::max_entry_size, 0);
    double elapsed_time = 0;
    for (uint32_t run = 0; run < runs; ++run) {
        auto start = std::chrono::high_resolution_clock::now();
        for (auto index : indexes) {
            uint32_t decoded_ints = dict.copy(index, out.data());
            do_not_optimize_away(decoded_ints);
        }
        auto end = std::chrono::high_resolution_clock::now();
        std::chrono::nanoseconds elapsed = end - start;
        elapsed_time += double(elapsed.count());
    }
    stats_line()("side", std::string("reference"))(
        "query", std::string("dict_copy"))("dict_entries", dict_size)(
        "ns_per_copy", elapsed_time / runs / double(n))("copies", n)(
        "runs", size_t(runs));
}

int main(int argc, const char** argv) {
    if (argc >= 3 && std::string(argv[1]) == "tcopy") {
        uint64_t n = argc > 3 ? strtoull(argv[3], nullptr, 10) : 10000000ull;
        uint32_t runs = argc > 4 ? uint32_t(atoi(argv[4])) : 10;
        run_tcopy(argv[2], n, runs);
        return 0;
    }
    if (argc >= 5 && std::string(argv[1]) == "intersect") {
        std::string type = argv[2];
        if (false) {
#define LOOP_BODY(R, DATA, T)                                 \
    }                                                         \
    else if (type == BOOST_PP_STRINGIZE(T)) {                 \
        run_intersect<BOOST_PP_CAT(T, _index)>(argv[3], argv[4], type); \
        /**/
            BOOST_PP_SEQ_FOR_EACH(
                LOOP_BODY, _,
                (ef)(single)(uniform)(opt)(block_qmx)(block_vbyte)(block_u32)(
                    block_varintgb)(block_interpolative)(single_rect_dint)(
                    single_packed_dint)(multi_packed_dint));
#undef LOOP_BODY
        } else {
            logger() << "ERROR: Unknown type " << type << std::endl;
            return 2;
        }
        return 0;
    }
    if (argc >= 6 && std::string(argv[1]) == "query") {
        std::string type = argv[2];
        bool check = argc > 6 && std::string(argv[6]) == "--check";
        if (false) {
#define LOOP_BODY(R, DATA, T)                                          \
    }                                                                  \
    else if (type == BOOST_PP_STRINGIZE(T)) {                          \
        run_queries<BOOST_PP_CAT(T, _index)>(argv[3], argv[4], type,   \
                                             argv[5], check);          \
        /**/
            BOOST_PP_SEQ_FOR_EACH(
                LOOP_BODY, _,
                (ef)(single)(uniform)(opt)(block_qmx)(block_vbyte)(block_u32)(
                    block_varintgb)(block_interpolative)(single_rect_dint)(
                    single_packed_dint)(multi_packed_dint));
#undef LOOP_BODY
        } else {
            logger() << "ERROR: Unknown type " << type << std::endl;
            return 2;
        }
        return 0;
    }
    fprintf(stderr,
            "usage:\n"
            "  ref_query query <type> <basename> <queries> <ops> [--check]\n"
            "  ref_query intersect <type> <basename> <pairs_file>\n"
            "  ref_query tcopy <rect_dict_file> [n] [runs]\n");
    return 2;
}
