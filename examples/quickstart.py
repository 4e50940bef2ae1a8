"""End-to-end quickstart: synthesize a collection, build a DINT index,
verify it, run boolean + ranked queries (host and device engines), and
time a raw vroom stream decode.

    python examples/quickstart.py [workdir]

Everything runs on whatever JAX backend is available (set
JAX_PLATFORMS=cpu to force the host); on a TPU backend the decode and
device-engine paths run the Pallas/XLA kernels.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import dint_tpu  # noqa: E402,F401  (installs host-memory fixes)
from dint_tpu.index import dint_index  # noqa: E402
from dint_tpu.io import collection, synth  # noqa: E402
from dint_tpu.query import boolean, device_batch, ranked  # noqa: E402
from dint_tpu.query.term_decode import TermDecoder  # noqa: E402


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dint_quickstart"
    os.makedirs(work, exist_ok=True)
    base = os.path.join(work, "coll")

    # 1. a synthetic ds2i collection on disk (docs/freqs/sizes)
    docs, freqs = synth.make_collection(num_lists=200, num_docs=20000,
                                        seed=7, avg_len=120)
    collection.write_freq_collection(base, docs, freqs, num_docs=20000)
    collection.write_sizes_file(
        base, synth.doc_sizes_from_lists(docs, freqs, 20000)
    )
    print(f"collection: {len(docs)} lists, "
          f"{sum(len(d) for d in docs)} postings -> {base}.*")

    # 2. build a multi_packed_dint index (trains dictionaries, cached)
    idx = dint_index.build_index(base, kind="multi", cache_dir=work)
    stats = idx.size_stats()
    print(f"index: docs {stats['docs_bpi']:.2f} bpi, "
          f"freqs {stats['freqs_bpi']:.2f} bpi")
    dint_index.verify_index(idx, base)  # exits non-zero on any mismatch
    print("verify: every posting matches the input")

    # 3. queries — host engine (per-query) and device engine (batch)
    wdata = ranked.build_wand_data(base)
    dec = TermDecoder(idx)
    queries = [[3, 17], [5], [40, 41, 42], [7, 99]]
    for q in queries:
        top = ranked.wand(idx, dec, wdata, q, k=10)
        inter = boolean.and_query_lazy(dec.lazy_cache, q)
        print(f"  q={q}: top1 score "
              f"{top[0] if top.shape[0] else float('nan'):.4f}, "
              f"AND size {inter.shape[0]}")
    batch_top = device_batch.ranked_or_batch(idx, dec, wdata, queries, k=10)
    for q, t in zip(queries, batch_top):
        want = ranked.ranked_or(idx, dec, wdata, q, k=10)
        assert np.allclose(t[: want.shape[0]], want, rtol=1e-3)
    print("device batch engine: top-k parity with the exhaustive oracle")

    # 4. raw vroom stream: encode the .docs file, timed decode, check
    from dint_tpu.tools import decode as decode_tool
    from dint_tpu.tools import encode as encode_tool

    stream = os.path.join(work, "coll.docs.spd")
    t0 = time.perf_counter()
    encode_tool.main(
        ["single_packed_dint", base + ".docs", "--out", stream,
         "--cache-dir", work]
    )
    print(f"vroom encode: {time.perf_counter() - t0:.1f}s")
    from dint_tpu.dictionary.builder import dict_cache_name

    dict_file = os.path.join(
        work, dict_cache_name(base + ".docs", "single")
    )
    decode_tool.main(
        ["single_packed_dint", stream, "--dict", dict_file,
         "--runs", "3", "--check-collection", base + ".docs"]
    )


if __name__ == "__main__":
    main()
