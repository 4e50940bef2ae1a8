// Standalone profiling harness for the native encoder (not shipped in
// the library path; built on demand by scripts/profile_encode.sh).
// Reads .npy dumps (header skipped crudely) and times encode phases.
#include "dint_encoder.cpp"

#include <chrono>
#include <cstdio>
#include <string>

static std::vector<uint8_t> read_npy(const char* path, size_t* data_off) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "missing %s\n", path); exit(1); }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  if (fread(buf.data(), 1, sz, f) != size_t(sz)) exit(1);
  fclose(f);
  // npy v1: magic(6) ver(2) hlen(2 LE) header
  uint16_t hlen = buf[8] | (uint16_t(buf[9]) << 8);
  *data_off = 10 + hlen;
  return buf;
}

int main(int argc, char** argv) {
  size_t o;
  auto tb = read_npy("/tmp/enc_table.npy", &o);
  const uint32_t* table = (const uint32_t*)(tb.data() + o);
  int64_t table_len = (tb.size() - o) / 4;
  auto ob = read_npy("/tmp/enc_offsets.npy", &o);
  const uint32_t* offsets = (const uint32_t*)(ob.data() + o);
  int32_t n_ctx = int32_t(((ob.size() - o) / 4) / 65536);
  auto lb = read_npy("/tmp/enc_lengths.npy", &o);
  const int32_t* lengths = (const int32_t*)(lb.data() + o);
  auto cb = read_npy("/tmp/enc_counts.npy", &o);
  const int32_t* counts = (const int32_t*)(cb.data() + o);
  auto gb = read_npy("/tmp/enc_gaps.npy", &o);
  const uint32_t* gaps = (const uint32_t*)(gb.data() + o);
  int64_t n_gaps = (gb.size() - o) / 4;
  auto fb = read_npy("/tmp/enc_offs.npy", &o);
  const int64_t* offs = (const int64_t*)(fb.data() + o);
  int64_t n_units = (fb.size() - o) / 8 - 1;
  fprintf(stderr, "ctx=%d units=%lld ints=%lld\n", n_ctx, (long long)n_units,
          (long long)n_gaps);

  void* h = dint_encoder_create(table, table_len, offsets, lengths, counts,
                                n_ctx, 65536);
  Encoder* e = (Encoder*)h;

  using clk = std::chrono::steady_clock;
  // phase timing: run each phase over all units separately
  double t_pre = 0, t_look = 0, t_parse = 0, t_ver = 0, t_emit = 0;
  std::vector<uint8_t> buf;
  int64_t total_bytes = 0;
  auto t0 = clk::now();
  for (int64_t u = 0; u < n_units; ++u) {
    const uint32_t* g = gaps + offs[u];
    int64_t n = offs[u + 1] - offs[u];
    UnitScratch& sc = g_tls.scr0;
    auto a = clk::now();
    precompute_unit(&sc, g, n);
    auto b = clk::now();
    g_trusted_hits = 0;
    lookup_pass(e, sc, 0, g, n, false, false);
    auto c = clk::now();
    parse_hits(e, sc, false, g, n);
    auto d = clk::now();
    bool okv = g_trusted_hits == 0 ||
               verify_parse(e, sc, g, n, 0, /*exact_small=*/true);
    auto f = clk::now();
    if (!okv) { fprintf(stderr, "collision!\n"); }
    buf.clear();
    emit(e, g, n, 16, &buf);
    auto g2 = clk::now();
    total_bytes += buf.size();
    t_pre += std::chrono::duration<double>(b - a).count();
    t_look += std::chrono::duration<double>(c - b).count();
    t_parse += std::chrono::duration<double>(d - c).count();
    t_ver += std::chrono::duration<double>(f - d).count();
    t_emit += std::chrono::duration<double>(g2 - f).count();
  }
  double tt = std::chrono::duration<double>(clk::now() - t0).count();
  fprintf(stderr,
          "total %.3fs (%.2f M ints/s) bytes=%lld\n pre   %.3fs\n look  %.3fs\n"
          " parse %.3fs\n ver   %.3fs\n emit  %.3fs\n",
          tt, n_gaps / tt / 1e6, (long long)total_bytes, t_pre, t_look,
          t_parse, t_ver, t_emit);
#ifdef DINT_TPROF
  fprintf(stderr, " lookup by size:");
  for (int t = 0; t < kNumTargetSizes; ++t)
    fprintf(stderr, " s%u=%.3fs", kTargetSizes[t], g_tprof[t] / 1e9);
  fprintf(stderr, "\n s4 probes=%lld hits=%lld", (long long)g_tcnt[2], (long long)g_thit[2]);
  fprintf(stderr, "\n survivors:");
  for (int t = 0; t < 2; ++t)
    fprintf(stderr, " s%u=%lld/%lld hits=%lld", kTargetSizes[t],
            (long long)g_tsurv[t], (long long)g_tcnt[t],
            (long long)g_thit[t]);
  fprintf(stderr, "\n");
#endif
  return 0;
}
