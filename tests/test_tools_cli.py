"""In-process smoke tests of every CLI tool (the L5 driver layer)."""

import json
import os

import numpy as np
import pytest

from dint_tpu.io import collection, synth


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, monkeypatch_module=None):
    tmp = tmp_path_factory.mktemp("cli")
    base = str(tmp / "tc")
    docs, freqs = synth.make_collection(120, 9000, seed=77, avg_len=50)
    collection.write_freq_collection(base, docs, freqs, 9000)
    collection.write_sizes_file(
        base, synth.doc_sizes_from_lists(docs, freqs, 9000)
    )
    qf = str(tmp / "queries.txt")
    rng = np.random.default_rng(1)
    with open(qf, "w") as f:
        for _ in range(20):
            k = int(rng.integers(1, 4))
            f.write(" ".join(str(int(t)) for t in rng.integers(0, 120, k)) + "\n")
    return str(tmp), base, qf


def _cd(path):
    class _CD:
        def __enter__(self):
            self.old = os.getcwd()
            os.chdir(path)

        def __exit__(self, *a):
            os.chdir(self.old)

    return _CD()


def test_vroom_tools(workdir):
    tmp, base, qf = workdir
    from dint_tpu.tools import check_encoded_data, encode

    with _cd(tmp):
        encode.main(["single_packed_dint", base + ".docs", "--out", "s.bin"])
        check_encoded_data.main(
            [
                "single_packed_dint", "s.bin", base + ".docs",
                "--dict", f"dict.{os.path.basename(base)}.docs.single_packed.DSF-65536-16",
            ]
        )
        encode.main(["streamvbyte", base + ".docs", "--out", "z.bin"])
        check_encoded_data.main(["streamvbyte", "z.bin", base + ".docs"])


@pytest.mark.parametrize("type_name", ["single_packed_dint",
                                       "multi_packed_dint"])
def test_dint_ladder_engine_exact(workdir, type_name):
    """engine='ladder' for DINT streams (the canonical ladder image
    built from the host-decoded units) reproduces the collection
    int-for-int for both single and multi wire formats."""
    tmp, base, qf = workdir
    from dint_tpu.tools import decode, encode

    with _cd(tmp):
        out = f"lad.{type_name}.bin"
        encode.main([type_name, base + ".docs", "--out", out])
        kind = "multi_packed" if type_name.startswith("multi") else \
            "single_packed"
        dict_file = (f"dict.{os.path.basename(base)}.docs."
                     f"{kind}.DSF-65536-16")
        rec = decode.decode_stream(
            type_name, out, dict_file, runs=2,
            check_collection=base + ".docs", engine="ladder",
        )
        assert rec["check"] == "ok"
        assert int(rec["plan_bytes"]) > 0


@pytest.mark.parametrize("type_name", ["single_packed_dint",
                                       "multi_packed_dint"])
def test_native_flat_unit_decode_matches_oracle(workdir, type_name):
    """qh_decode_units_flat (the ladder cold path's native batch
    decode) == decode_units_fast_batch (the numpy oracle), value for
    value over a whole real stream."""
    tmp, base, qf = workdir
    from dint_tpu.index import stream as stream_mod
    from dint_tpu.query import native_host
    from dint_tpu.query.lazy_decode import decode_units_fast_batch
    from dint_tpu.tools import decode as dtool
    from dint_tpu.tools import encode

    if not native_host.available():
        pytest.skip("native query engine unavailable")
    with _cd(tmp):
        out = f"flat.{type_name}.bin"
        encode.main([type_name, base + ".docs", "--out", out])
        kind = "multi_packed" if type_name.startswith("multi") else \
            "single_packed"
        dict_file = (f"dict.{os.path.basename(base)}.docs."
                     f"{kind}.DSF-65536-16")
        d = dtool.load_dictionary(type_name, dict_file)
        view = d.decode_view()
        arena, meta = stream_mod.load_stream(out)
        lay = dtool.units_from_meta(
            arena, meta, type_name.startswith("multi"))
        flat = native_host.decode_units_flat(
            view, arena, lay.starts, lay.byte_lens, lay.n,
            lay.ctx, lay.b_bits)
        vals, _ = decode_units_fast_batch(
            arena, lay.starts, lay.starts + lay.byte_lens, lay.n,
            view, lay.ctx, lay.b_bits)
        want = np.concatenate(vals)
        np.testing.assert_array_equal(flat, want)


def test_index_tools(workdir):
    tmp, base, qf = workdir
    from dint_tpu.tools import (
        check_index,
        create_freq_index,
        create_wand_data,
        pair_wise_intersect,
        queries,
    )

    with _cd(tmp):
        create_freq_index.main(["single_packed_dint", base, "idx", "--check"])
        check_index.main(["single_packed_dint", "idx", base])
        create_wand_data.main([base, "wand.npz"])
        queries.main(
            [
                "single_packed_dint", "and:or:wand:maxscore:ranked_and:ranked_or",
                "idx", "wand.npz", "--queries", qf, "--runs", "1",
            ]
        )
        pair_wise_intersect.main(
            ["single_packed_dint", "idx", "--queries", qf, "--runs", "1"]
        )
        # device-batch engine end-to-end through the CLI (CPU backend)
        queries.main(
            [
                "single_packed_dint", "and:or:wand",
                "idx", "wand.npz", "--queries", qf, "--runs", "1",
                "--engine", "device",
            ]
        )


def test_dict_perf_tool(workdir):
    tmp, base, qf = workdir
    from dint_tpu.tools import dict_perf_test

    with _cd(tmp):
        dict_perf_test.main(
            [
                f"dict.{os.path.basename(base)}.docs.single_packed.DSF-65536-16",
                "single", "--copies", "10000",
            ]
        )


def test_queries_cli_host_lazy_ops_on_ef_and_block_indexes(tmp_path):
    """run_op's lazy paths must use each decoder's own cache type —
    EF and block-codec indexes crashed with BlockCache(index)
    (round-2 review finding)."""
    import numpy as np

    from dint_tpu.index import block_index, freq_index
    from dint_tpu.io import collection, synth
    from dint_tpu.query import ranked
    from dint_tpu.tools import queries as qtool

    base = str(tmp_path / "c")
    docs, freqs = synth.make_collection(30, 5000, seed=3, avg_len=90)
    collection.write_freq_collection(base, docs, freqs, 5000)
    collection.write_sizes_file(
        base, synth.doc_sizes_from_lists(docs, freqs, 5000)
    )
    wd = ranked.build_wand_data(base)
    queries_list = [[1, 2], [3], [5, 7, 9]]

    eidx = freq_index.build_freq_index(base, "ef")
    edec = freq_index.EFTermDecoder(eidx)
    for op in ("wand", "maxscore", "and", "or"):
        stats = qtool.run_op(eidx, edec, wd, queries_list, op, 1, 10)
        assert stats["avg"] >= 0

    bidx = block_index.build_block_index(base, "optpfor")
    bdec = block_index.BlockTermDecoder(bidx)
    for op in ("wand", "and"):
        stats = qtool.run_op(bidx, bdec, wd, queries_list, op, 1, 10)
        assert stats["avg"] >= 0


def test_queries_device_engine_on_ef_and_block_indexes(tmp_path):
    """The whole-batch device engine serves EVERY index family through
    the generic decoder interface; top-k parity with ranked_or."""
    import numpy as np

    from dint_tpu.index import block_index, freq_index
    from dint_tpu.io import collection, synth
    from dint_tpu.query import device_batch, ranked
    from dint_tpu.tools import queries as qtool

    base = str(tmp_path / "c")
    docs, freqs = synth.make_collection(30, 5000, seed=3, avg_len=90)
    collection.write_freq_collection(base, docs, freqs, 5000)
    collection.write_sizes_file(
        base, synth.doc_sizes_from_lists(docs, freqs, 5000)
    )
    wd = ranked.build_wand_data(base)
    queries_list = [[1, 2], [3], [5, 7, 9]]

    for idx, dec in (
        (lambda i: (i, freq_index.EFTermDecoder(i)))(
            freq_index.build_freq_index(base, "ef")
        ),
        (lambda i: (i, block_index.BlockTermDecoder(i)))(
            block_index.build_block_index(base, "optpfor")
        ),
    ):
        got = device_batch.ranked_or_batch(idx, dec, wd, queries_list, k=10)
        for q, g in zip(queries_list, got):
            want = ranked.ranked_or(idx, dec, wd, q, k=10)
            assert g.shape[0] == want.shape[0]
            np.testing.assert_allclose(g, want, rtol=1e-3)
        stats, shape, extra = qtool.run_op_device(
            idx, dec, wd, queries_list, "wand", 1, 10
        )
        assert stats["avg"] >= 0
