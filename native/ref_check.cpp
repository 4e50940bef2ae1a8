// Cross-validation harness: drives the REFERENCE DINT encoders
// (read-only checkout at /root/reference, or $DINT_REF) over unit files
// produced by this repo's test suite, so our encoder's output can be
// diffed byte-for-byte against the actual reference C++ — not just
// against our own oracle.
//
// Build (see tests/test_ref_parity.py):
//   g++ -O3 -std=c++17 -I<ref>/include -I<ref>/include/dint
//       -I native/ref_harness native/ref_check.cpp -o ref_check
// The ref_harness directory shims the missing submodule headers
// (succinct, boost) with compile-only stand-ins; no reference code is
// copied into this repository.
//
// Usage:
//   ref_check single  <dict_file> <units_file> <out_file>
//   ref_check multi   <dict_file> <units_file> <out_file>
//   ref_check dsingle <dict_file> <units_file> <enc_file>   (decode check)
//   ref_check dmulti  <dict_file> <units_file> <enc_file>   (decode check)
//   ref_check tsingle|tmulti|trect <dict_file> <units_file> <reps>
//       timed encode A/B mode: per rep, a FRESH builder is loaded and
//       prepared (mirroring a fresh NativeEncoder on our side), then
//       the full unit stream is encoded once; prints per-rep prepare
//       and encode seconds + ints/s to stdout as JSON lines.  Driven
//       interleaved with our encoder by scripts/ab_encode.py.
// units_file: u64 n_units, u64 offs[n_units+1], u32 gaps[offs[n_units]]
// out_file:   u64 n_units, u64 lens[n_units], u8 bytes[...]
// dsingle/dmulti: decode enc_file (out_file format) with the REFERENCE
// decoder and compare int-for-int against the units; exit 1 on any
// mismatch.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>
#include <string>
#include <vector>

#include "succinct/util.hpp"  // ref_harness shim: ceil_div

#include "dictionary_types.hpp"
#include <pmmintrin.h>
#include <tmmintrin.h>
#include "ds2i/VarIntG8IU.h"
#include "ds2i/interpolative_coding.hpp"
#include "ds2i/partitioned_sequence.hpp"
#include "ds2i/positive_sequence.hpp"
#include "ds2i/qmx.hpp"
#include "ds2i/uniform_partitioned_sequence.hpp"
#include "ds2i/varintgb.h"
#include "vroom_env/dint_codecs.hpp"

static std::vector<uint8_t> slurp(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) {
        fprintf(stderr, "cannot open %s\n", path);
        exit(1);
    }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(sz);
    if (fread(buf.data(), 1, sz, f) != size_t(sz)) exit(1);
    fclose(f);
    return buf;
}

int main(int argc, char** argv) {
    if (argc == 4 && std::string(argv[1]) == "qmx") {
        // encode every unit with the reference QMX codec; also decode
        // the reference's own bytes back and verify round-trip.
        size_t o_unused;
        (void)o_unused;
        auto units = slurp(argv[2]);
        uint64_t n_units;
        std::memcpy(&n_units, units.data(), 8);
        const uint64_t* offs = (const uint64_t*)(units.data() + 8);
        const uint32_t* gaps =
            (const uint32_t*)(units.data() + 8 + 8 * (n_units + 1));
        std::vector<uint64_t> lens(n_units);
        std::vector<uint8_t> bytes;
        for (uint64_t u = 0; u < n_units; ++u) {
            uint64_t n = offs[u + 1] - offs[u];
            std::vector<uint8_t> buf(512 * 4 + 2 * 4 * n + 64);
            QMX::codec qc(n);
            size_t sz = qc.encode(buf.data(), gaps + offs[u]);
            lens[u] = sz;
            bytes.insert(bytes.end(), buf.data(), buf.data() + sz);
            std::vector<uint32_t> dec(n + 16 * 256 + 64, 0);
            QMX::codec qd(n);
            qd.decode(dec.data(), buf.data(), sz);
            if (std::memcmp(dec.data(), gaps + offs[u], n * 4) != 0) {
                fprintf(stderr, "qmx ref roundtrip failed at unit %llu\n",
                        (unsigned long long)u);
                return 1;
            }
        }
        FILE* f = fopen(argv[3], "wb");
        fwrite(&n_units, 8, 1, f);
        fwrite(lens.data(), 8, n_units, f);
        fwrite(bytes.data(), 1, bytes.size(), f);
        fclose(f);
        fprintf(stderr, "ref_check qmx: %llu units, %zu bytes\n",
                (unsigned long long)n_units, bytes.size());
        return 0;
    }
    if (argc == 4 && std::string(argv[1]) == "qmxdec") {
        // decode OUR qmx bytes with the reference decoder and verify
        // against the units (argv[2] = units, argv[3] = enc file)
        auto units = slurp(argv[2]);
        uint64_t n_units;
        std::memcpy(&n_units, units.data(), 8);
        const uint64_t* offs = (const uint64_t*)(units.data() + 8);
        const uint32_t* gaps =
            (const uint32_t*)(units.data() + 8 + 8 * (n_units + 1));
        auto enc = slurp(argv[3]);
        const uint64_t* elens = (const uint64_t*)(enc.data() + 8);
        const uint8_t* ebytes = enc.data() + 8 + 8 * n_units;
        uint64_t epos = 0;
        for (uint64_t u = 0; u < n_units; ++u) {
            uint64_t n = offs[u + 1] - offs[u];
            std::vector<uint32_t> dec(n + 16 * 256 + 64, 0);
            QMX::codec qd(n);
            qd.decode(dec.data(), ebytes + epos, elens[u]);
            if (std::memcmp(dec.data(), gaps + offs[u], n * 4) != 0) {
                fprintf(stderr, "qmxdec mismatch at unit %llu\n",
                        (unsigned long long)u);
                return 1;
            }
            epos += elens[u];
        }
        fprintf(stderr, "ref_check qmxdec: %llu units exact\n",
                (unsigned long long)n_units);
        return 0;
    }
    if (argc == 4 && (std::string(argv[1]) == "vgb" ||
                      std::string(argv[1]) == "g8iu")) {
        // encode every unit with the reference's VarIntGB<false> /
        // VarIntG8IU (the classes behind varintgb_block and
        // varint_G8IU_block) and emit the bytes for diffing; also
        // round-trip through the reference decoder.
        bool gb = std::string(argv[1]) == "vgb";
        auto units = slurp(argv[2]);
        uint64_t n_units;
        std::memcpy(&n_units, units.data(), 8);
        const uint64_t* offs = (const uint64_t*)(units.data() + 8);
        const uint32_t* gaps =
            (const uint32_t*)(units.data() + 8 + 8 * (n_units + 1));
        std::vector<uint64_t> lens(n_units);
        std::vector<uint8_t> bytes;
        ds2i::VarIntGB<false> vgb;
        ds2i::VarIntG8IU g8;
        for (uint64_t u = 0; u < n_units; ++u) {
            size_t n = offs[u + 1] - offs[u];
            std::vector<uint8_t> buf(16 * n + 1024);
            size_t sz;
            if (gb) {
                sz = vgb.encodeArray(gaps + offs[u], n, buf.data());
                std::vector<uint32_t> dec(n + 64, 0);
                vgb.decodeArray(buf.data(), n, dec.data());
                if (std::memcmp(dec.data(), gaps + offs[u], n * 4) != 0) {
                    fprintf(stderr, "vgb ref roundtrip failed unit %llu\n",
                            (unsigned long long)u);
                    return 1;
                }
            } else {
                // the encodeBlock loop of varint_G8IU_block::encode
                const uint32_t* src = gaps + offs[u];
                size_t srclen = n * 4;
                unsigned char* dst = buf.data();
                size_t dstlen = buf.size();
                sz = 0;
                while (srclen > 0 && dstlen >= 9)
                    sz += g8.encodeBlock(src, srclen, dst, dstlen);
            }
            lens[u] = sz;
            bytes.insert(bytes.end(), buf.data(), buf.data() + sz);
        }
        FILE* f = fopen(argv[3], "wb");
        fwrite(&n_units, 8, 1, f);
        fwrite(lens.data(), 8, n_units, f);
        fwrite(bytes.data(), 1, bytes.size(), f);
        fclose(f);
        fprintf(stderr, "ref_check %s: %llu units, %zu bytes\n", argv[1],
                (unsigned long long)n_units, bytes.size());
        return 0;
    }
    if (argc == 4 && std::string(argv[1]) == "interp") {
        // write each unit (a nondecreasing sequence; last arg of the
        // unit is the `high` bound) with the reference's recursive
        // interpolative coder and emit the BIT size per unit
        auto units = slurp(argv[2]);
        uint64_t n_units;
        std::memcpy(&n_units, units.data(), 8);
        const uint64_t* offs = (const uint64_t*)(units.data() + 8);
        const uint32_t* gaps =
            (const uint32_t*)(units.data() + 8 + 8 * (n_units + 1));
        std::vector<uint64_t> bits(n_units);
        for (uint64_t u = 0; u < n_units; ++u) {
            size_t n = offs[u + 1] - offs[u];
            if (n < 2) {
                bits[u] = 0;
                continue;
            }
            std::vector<uint32_t> buf;
            ds2i::bit_writer bw(buf);
            // values[0..n-2] coded within [0, values[n-1]]
            bw.write_interpolative(gaps + offs[u], n - 1, 0,
                                   gaps[offs[u] + n - 1]);
            bits[u] = bw.size();
        }
        FILE* f = fopen(argv[3], "wb");
        fwrite(&n_units, 8, 1, f);
        fwrite(bits.data(), 8, n_units, f);
        fclose(f);
        fprintf(stderr, "ref_check interp: %llu units\n",
                (unsigned long long)n_units);
        return 0;
    }
    if (argc == 5 && std::string(argv[1]) == "ef") {
        // write every unit (sorted values; LAST element = universe)
        // with a reference sequence writer and emit (u64 nbits,
        // u64 nwords, u64 words...) per unit for bit-level diffing
        std::string kind = argv[2];
        auto units = slurp(argv[3]);
        uint64_t n_units;
        std::memcpy(&n_units, units.data(), 8);
        const uint64_t* offs = (const uint64_t*)(units.data() + 8);
        const uint32_t* gaps =
            (const uint32_t*)(units.data() + 8 + 8 * (n_units + 1));
        ds2i::global_parameters params;
        FILE* f = fopen(argv[4], "wb");
        fwrite(&n_units, 8, 1, f);
        for (uint64_t u = 0; u < n_units; ++u) {
            size_t n = offs[u + 1] - offs[u] - 1;
            const uint32_t* vals = gaps + offs[u];
            uint64_t universe = vals[n];
            succinct::bit_vector_builder bvb;
            if (kind == "ef")
                ds2i::compact_elias_fano::write(bvb, vals, universe, n,
                                                params);
            else if (kind == "rb")
                ds2i::compact_ranked_bitvector::write(bvb, vals, universe, n,
                                                      params);
            else if (kind == "strict")
                ds2i::strict_sequence::write(bvb, vals, universe, n, params);
            else if (kind == "indexed")
                ds2i::indexed_sequence::write(bvb, vals, universe, n, params);
            else if (kind == "uniform")
                ds2i::uniform_partitioned_sequence<
                    ds2i::indexed_sequence>::write(bvb, vals, universe, n,
                                                   params);
            else if (kind == "part")
                ds2i::partitioned_sequence<ds2i::indexed_sequence>::write(
                    bvb, vals, universe, n, params);
            else if (kind == "positive")
                ds2i::positive_sequence<ds2i::strict_sequence>::write(
                    bvb, vals, universe, n, params);
            else {
                fprintf(stderr, "unknown ef kind %s\n", kind.c_str());
                return 2;
            }
            uint64_t nbits = bvb.size();
            uint64_t nwords = bvb.bits().size();
            fwrite(&nbits, 8, 1, f);
            fwrite(&nwords, 8, 1, f);
            fwrite(bvb.bits().data(), 8, nwords, f);
        }
        fclose(f);
        fprintf(stderr, "ref_check ef/%s: %llu units\n", kind.c_str(),
                (unsigned long long)n_units);
        return 0;
    }
    if (argc >= 3 && std::string(argv[1]) == "probe") {
        // debug: lookup one window (remaining argv = u32 gaps) in every
        // context/width of a multi dict
        ds2i::multi_dictionary_packed_type::builder b;
        b.load_from_file(argv[2]);
        b.prepare_for_encoding();
        std::vector<uint32_t> w;
        for (int a = 3; a < argc; ++a) w.push_back(uint32_t(atoll(argv[a])));
        for (uint32_t c = 0; c < 6; ++c)
            fprintf(stderr, "ctx%u: b16=%d b8=%d\n", c,
                    int(b.lookup(c, w.data(), w.size(), 16)),
                    int(b.lookup(c, w.data(), w.size(), 8)));
        return 0;
    }
    if (argc == 5 && argv[1][0] == 't') {
        // timed encode: tsingle | tmulti | trect  dict units reps
        const std::string tmode = argv[1];
        auto units = slurp(argv[3]);
        const int reps = atoi(argv[4]);
        uint64_t n_units;
        std::memcpy(&n_units, units.data(), 8);
        const uint64_t* offs = (const uint64_t*)(units.data() + 8);
        const uint32_t* gaps =
            (const uint32_t*)(units.data() + 8 + 8 * (n_units + 1));
        const uint64_t total_ints = offs[n_units];
        for (int rep = 0; rep < reps; ++rep) {
            double t_prep, t_enc;
            uint64_t total_bytes = 0;
            std::vector<uint8_t> out;
            out.reserve(1 << 20);
            struct timespec a, b, c;
            clock_gettime(CLOCK_MONOTONIC, &a);
            if (tmode == "tsingle" || tmode == "trect") {
                // single_opt_dint over packed/rectangular builders
                // (vroom_env/dint_codecs.hpp single_opt_dint::encode)
                if (tmode == "tsingle") {
                    ds2i::single_dictionary_packed_type::builder bld;
                    bld.load_from_file(argv[2]);
                    bld.prepare_for_encoding();
                    clock_gettime(CLOCK_MONOTONIC, &b);
                    for (uint64_t u = 0; u < n_units; ++u) {
                        out.clear();
                        ds2i::single_opt_dint::encode(
                            bld, gaps + offs[u], offs[u + 1] - offs[u], out,
                            16);
                        total_bytes += out.size();
                    }
                } else {
                    ds2i::single_dictionary_rectangular_type::builder bld;
                    bld.load_from_file(argv[2]);
                    bld.prepare_for_encoding();
                    clock_gettime(CLOCK_MONOTONIC, &b);
                    for (uint64_t u = 0; u < n_units; ++u) {
                        out.clear();
                        ds2i::single_opt_dint::encode(
                            bld, gaps + offs[u], offs[u + 1] - offs[u], out,
                            16);
                        total_bytes += out.size();
                    }
                }
            } else {
                ds2i::multi_dictionary_packed_type::builder bld;
                bld.load_from_file(argv[2]);
                bld.prepare_for_encoding();
                clock_gettime(CLOCK_MONOTONIC, &b);
                for (uint64_t u = 0; u < n_units; ++u) {
                    out.clear();
                    ds2i::multi_opt_dint::encode(
                        bld, gaps + offs[u], 0u,
                        uint32_t(offs[u + 1] - offs[u]), out);
                    total_bytes += out.size();
                }
            }
            clock_gettime(CLOCK_MONOTONIC, &c);
            t_prep = (b.tv_sec - a.tv_sec) + 1e-9 * (b.tv_nsec - a.tv_nsec);
            t_enc = (c.tv_sec - b.tv_sec) + 1e-9 * (c.tv_nsec - b.tv_nsec);
            printf("{\"mode\": \"%s\", \"rep\": %d, \"prep_s\": %.6f, "
                   "\"encode_s\": %.6f, \"ints\": %llu, \"bytes\": %llu, "
                   "\"mints_per_s\": %.3f}\n",
                   tmode.c_str(), rep, t_prep, t_enc,
                   (unsigned long long)total_ints,
                   (unsigned long long)total_bytes,
                   total_ints / t_enc / 1e6);
            fflush(stdout);
        }
        return 0;
    }
    if (argc != 5) {
        fprintf(stderr, "usage: ref_check single|multi|dsingle|dmulti dict units out\n");
        return 2;
    }
    std::string mode = argv[1];
    if (mode == "dsingle" || mode == "dmulti") {
        auto units = slurp(argv[3]);
        uint64_t n_units;
        std::memcpy(&n_units, units.data(), 8);
        const uint64_t* offs = (const uint64_t*)(units.data() + 8);
        const uint32_t* gaps =
            (const uint32_t*)(units.data() + 8 + 8 * (n_units + 1));
        auto enc = slurp(argv[4]);
        const uint64_t* elens = (const uint64_t*)(enc.data() + 8);
        const uint8_t* ebytes = enc.data() + 8 + 8 * n_units;
        std::vector<uint32_t> out;
        uint64_t epos = 0;
        for (uint64_t u = 0; u < n_units; ++u) {
            uint64_t n = offs[u + 1] - offs[u];
            out.assign(n + 256 + 16, 0);  // run copy() writes 16-word chunks
            const uint8_t* end;
            if (mode == "dsingle") {
                ds2i::single_dictionary_packed_type::builder b;
                static ds2i::single_dictionary_packed_type dict;
                static bool built = false;
                if (!built) {
                    b.load_from_file(argv[2]);
                    b.build(dict);
                    built = true;
                }
                end = ds2i::single_opt_dint::decode(dict, ebytes + epos,
                                                    out.data(), 0u, n);
            } else {
                static ds2i::multi_dictionary_packed_type dict;
                static bool built = false;
                if (!built) {
                    ds2i::multi_dictionary_packed_type::builder b;
                    b.load_from_file(argv[2]);
                    b.build(dict);
                    built = true;
                }
                end = ds2i::multi_opt_dint::decode(dict, ebytes + epos,
                                                   out.data(), 0u, n);
            }
            if (uint64_t(end - (ebytes + epos)) != elens[u]) {
                fprintf(stderr, "unit %llu: consumed %lld bytes, expected %llu\n",
                        (unsigned long long)u, (long long)(end - (ebytes + epos)),
                        (unsigned long long)elens[u]);
                return 1;
            }
            if (std::memcmp(out.data(), gaps + offs[u], n * 4) != 0) {
                fprintf(stderr, "unit %llu: decoded ints differ\n",
                        (unsigned long long)u);
                return 1;
            }
            epos += elens[u];
        }
        fprintf(stderr, "ref_check decode: %llu units exact\n",
                (unsigned long long)n_units);
        return 0;
    }
    bool multi = mode == "multi";

    auto units = slurp(argv[3]);
    uint64_t n_units;
    std::memcpy(&n_units, units.data(), 8);
    const uint64_t* offs = (const uint64_t*)(units.data() + 8);
    const uint32_t* gaps = (const uint32_t*)(units.data() + 8 + 8 * (n_units + 1));

    std::vector<uint64_t> lens(n_units);
    std::vector<uint8_t> bytes;

    if (mode == "greedy") {
        ds2i::single_dictionary_packed_type::builder b;
        b.load_from_file(argv[2]);
        b.prepare_for_encoding();
        for (uint64_t u = 0; u < n_units; ++u) {
            std::vector<uint8_t> out;
            ds2i::single_greedy_dint::encode(
                b, gaps + offs[u], 0u, uint32_t(offs[u + 1] - offs[u]), out);
            lens[u] = out.size();
            bytes.insert(bytes.end(), out.begin(), out.end());
        }
    } else if (mode == "rect") {
        ds2i::single_dictionary_rectangular_type::builder b;
        b.load_from_file(argv[2]);
        b.prepare_for_encoding();
        for (uint64_t u = 0; u < n_units; ++u) {
            std::vector<uint8_t> out;
            ds2i::single_opt_dint::encode(b, gaps + offs[u],
                                          offs[u + 1] - offs[u], out, 16);
            lens[u] = out.size();
            bytes.insert(bytes.end(), out.begin(), out.end());
        }
    } else if (!multi) {
        ds2i::single_dictionary_packed_type::builder b;
        b.load_from_file(argv[2]);
        b.prepare_for_encoding();
        for (uint64_t u = 0; u < n_units; ++u) {
            std::vector<uint8_t> out;
            ds2i::single_opt_dint::encode(b, gaps + offs[u],
                                          offs[u + 1] - offs[u], out, 16);
            lens[u] = out.size();
            bytes.insert(bytes.end(), out.begin(), out.end());
        }
    } else {
        ds2i::multi_dictionary_packed_type::builder b;
        b.load_from_file(argv[2]);
        b.prepare_for_encoding();
        for (uint64_t u = 0; u < n_units; ++u) {
            std::vector<uint8_t> out;
            ds2i::multi_opt_dint::encode(b, gaps + offs[u], 0u,
                                         uint32_t(offs[u + 1] - offs[u]), out);
            lens[u] = out.size();
            bytes.insert(bytes.end(), out.begin(), out.end());
        }
    }

    FILE* f = fopen(argv[4], "wb");
    fwrite(&n_units, 8, 1, f);
    fwrite(lens.data(), 8, n_units, f);
    fwrite(bytes.data(), 1, bytes.size(), f);
    fclose(f);
    fprintf(stderr, "ref_check: %llu units, %zu bytes\n",
            (unsigned long long)n_units, bytes.size());
    return 0;
}
