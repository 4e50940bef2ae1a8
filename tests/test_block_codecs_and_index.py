"""Codec-zoo round trips (test_block_codecs.cpp style) + block index.

Random values over magnitudes 2^1..2^24 and sizes {1, 16, 255, 256},
with both known and unknown sums (test_block_codecs.cpp:9-49).
"""

import numpy as np
import pytest

from dint_tpu.codecs import blocks
from dint_tpu.index import block_index
from dint_tpu.io import collection, synth

SIZES = [1, 16, 255, 256]
MAGS = [1, 4, 16, 24]


@pytest.mark.parametrize("codec", sorted(blocks.CODECS))
def test_codec_roundtrip(codec):
    enc, dec = blocks.CODECS[codec]
    rng = np.random.default_rng(hash(codec) % (2**31))
    for mag in MAGS:
        if codec == "simple16" and mag > 24:
            continue
        for n in SIZES:
            vals = rng.integers(0, 1 << mag, size=n).astype(np.uint32)
            for sum_v in (int(vals.astype(np.int64).sum()), blocks.UNKNOWN):
                buf = enc(vals, sum_v)
                out, pos = dec(np.frombuffer(buf, np.uint8), 0, n, sum_v)
                np.testing.assert_array_equal(out, vals, err_msg=f"{codec} n={n} mag={mag}")
                assert pos == len(buf), f"{codec}: stream length mismatch"


@pytest.mark.parametrize("codec", sorted(blocks.CODECS))
def test_codec_decode_accepts_plain_bytes(codec):
    """Decoders must accept `bytes` buffers on BOTH the vectorized
    (n > 32) and scalar-fallback paths — the encoder's output is bytes
    and remains a valid decoder input."""
    enc, dec = blocks.CODECS[codec]
    rng = np.random.default_rng(hash(codec) % (2**31))
    for n in (16, 256):
        vals = rng.integers(0, 1 << 12, size=n).astype(np.uint32)
        buf = enc(vals, blocks.UNKNOWN)
        out, pos = dec(buf, 0, n, blocks.UNKNOWN)
        np.testing.assert_array_equal(out, vals, err_msg=f"{codec} n={n}")
        assert pos == len(buf)


def test_codec_roundtrip_with_offset():
    # decoding must work at arbitrary byte offsets within a larger arena
    enc, dec = blocks.CODECS["streamvbyte"]
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1000, 100).astype(np.uint32)
    buf = b"\xab\xcd" + enc(vals, blocks.UNKNOWN)
    out, pos = dec(np.frombuffer(buf, np.uint8), 2, 100, blocks.UNKNOWN)
    np.testing.assert_array_equal(out, vals)


def test_optpfor_exceptions():
    enc, dec = blocks.CODECS["optpfor"]
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 16, 256).astype(np.uint32)
    vals[[3, 100, 255]] = [1 << 20, 1 << 30, 123456]  # forced exceptions
    buf = enc(vals, blocks.UNKNOWN)
    out, pos = dec(np.frombuffer(buf, np.uint8), 0, 256, blocks.UNKNOWN)
    np.testing.assert_array_equal(out, vals)
    assert len(buf) < 256 * 4  # better than raw despite exceptions


@pytest.fixture(scope="module")
def coll(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bc")
    base = str(tmp / "c")
    docs, freqs = synth.make_collection(60, 15000, seed=3, avg_len=90)
    collection.write_freq_collection(base, docs, freqs, 15000)
    return base, docs, freqs


@pytest.mark.parametrize("codec", ["optpfor", "streamvbyte", "simple16", "qmx", "vbyte"])
def test_block_index_roundtrip(coll, codec, tmp_path):
    base, docs, freqs = coll
    idx = block_index.build_block_index(base, codec)
    block_index.verify_block_index(idx, base)
    stats = idx.size_stats()
    assert stats["postings"] == sum(len(d) for d in docs)
    p = str(tmp_path / f"bi_{codec}")
    idx.save(p)
    idx2 = block_index.BlockIndex.load(p)
    assert idx2.docs_end is None
    block_index.verify_block_index(idx2, base)  # exercises docs_end recovery


def test_block_index_queries(coll):
    base, docs, freqs = coll
    from dint_tpu.query import boolean

    idx = block_index.build_block_index(base, "varintgb")
    dec = block_index.BlockTermDecoder(idx)
    rng = np.random.default_rng(5)
    for _ in range(10):
        terms = list(rng.integers(0, len(docs), size=2))
        got = boolean.and_query(dec.decode_docids(terms), terms)
        expect = sorted(
            set(docs[terms[0]].tolist()) & set(docs[int(t)].tolist())
            for t in [terms[1]]
        )[0] if len(set(terms)) > 1 else set(docs[terms[0]].tolist())
        np.testing.assert_array_equal(
            got, np.asarray(sorted(expect), np.uint32)
        )


def test_mixed_block_index(coll, tmp_path):
    base, docs, freqs = coll
    from dint_tpu.index import mixed_block
    from dint_tpu.utils import dec_time_prediction as dtp

    idx = mixed_block.build_mixed_index(base)
    block_index.verify_block_index(idx, base)
    stats = idx.size_stats()
    mixed_bpi = stats["docs_bpi"]
    tag_bpi = 8.0 * idx.num_blocks / stats["postings"]  # 1-byte tag per block
    # mixed (min-space per block) must be <= every single candidate
    for codec in mixed_block.CANDIDATES:
        single = block_index.build_block_index(base, codec).size_stats()["docs_bpi"]
        assert mixed_bpi <= single + tag_bpi + 1e-9
    p = str(tmp_path / "mixed")
    idx.save(p)
    idx2 = block_index.BlockIndex.load(p)
    block_index.verify_block_index(idx2, base)


def test_dec_time_predictor_and_weighted_mixed(coll, tmp_path):
    base, docs, freqs = coll
    import numpy as np
    from dint_tpu.index import mixed_block
    from dint_tpu.utils import dec_time_prediction as dtp

    rng = np.random.default_rng(0)
    train_blocks = [rng.integers(0, 1 << m, 256).astype(np.uint32) for m in (4, 8, 16)]
    samples = {
        c: dtp.measure_block_decode(c, train_blocks, reps=2)
        for c in mixed_block.CANDIDATES
    }
    pred = dtp.train(samples)
    p = str(tmp_path / "pred.json")
    pred.save(p)
    pred2 = dtp.Predictor.load(p)
    feats = dtp.feature_vector(train_blocks[0], 100)
    assert pred2.predict("optpfor", feats) == pred.predict("optpfor", feats)
    idx = mixed_block.build_mixed_index(base, predictor=pred2, lam=0.01)
    block_index.verify_block_index(idx, base)


def test_block_profiler(coll):
    base, docs, freqs = coll
    from dint_tpu.utils import block_profiler as bp

    bp.reset()
    bp.enable(True)
    bp.open_list(3, 5)
    bp.count_docs(3, 0)
    bp.count_docs(3, 0)
    bp.count_freqs(3, 4)
    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "prof.tsv")
    bp.dump(path)
    loaded = bp.load(path)
    assert loaded[3][0, 0] == 2 and loaded[3][1, 4] == 1
    bp.enable(False)


def test_block_reordering_roundtrip(coll):
    """get_blocks/write_blocks shuffle round-trip
    (test_block_posting_list.cpp:69-94 discipline)."""
    base, docs, freqs = coll
    rng = np.random.default_rng(11)
    idx = block_index.build_block_index(base, "optpfor")
    per_list = []
    for i in range(idx.num_lists):
        blocks = block_index.get_blocks(idx, i)
        tail = blocks[1:]
        rng.shuffle(tail)
        per_list.append([blocks[0]] + tail)
    idx2 = block_index.write_blocks(idx, per_list)
    block_index.verify_block_index(idx2, base)


def test_profile_train_mixed_pipeline(tmp_path):
    """The profiler -> predictor -> mixed_block loop end-to-end
    (VERDICT round-1 missing #6): query-driven block access counts are
    recorded by the decode hooks, a predictor trains on measured block
    decodes, and the access-weighted rebuild passes the exact check
    while shifting hot blocks to faster codecs."""
    import numpy as np

    from dint_tpu.index import block_index, mixed_block
    from dint_tpu.io import collection, synth
    from dint_tpu.query import boolean
    from dint_tpu.utils import block_profiler
    from dint_tpu.utils import dec_time_prediction as dtp

    base = str(tmp_path / "c")
    docs, freqs = synth.make_collection(30, 6000, seed=41, avg_len=150)
    collection.write_freq_collection(base, docs, freqs, 6000)
    idx = block_index.build_block_index(base, "optpfor")

    block_profiler.reset()
    block_profiler.enable(True)
    dec = block_index.BlockTermDecoder(idx)
    nonempty = [t for t in range(30) if len(docs[t])]
    rng = np.random.default_rng(3)
    for _ in range(12):
        q = list(rng.choice(nonempty, size=2, replace=False))
        decoded = dec.decode_docids(q)
        boolean.and_query(decoded, q)
        dec._doc_cache.clear()
    block_profiler.enable(False)
    prof = str(tmp_path / "prof.tsv")
    block_profiler.dump(prof)
    counts = block_profiler.load(prof)
    assert sum(int(c.sum()) for c in counts.values()) > 0

    blocks = [np.sort(rng.integers(0, 500, 256)).astype(np.uint32)
              for _ in range(8)]
    samples = {
        c: dtp.measure_block_decode(c, blocks, reps=1)
        for c in mixed_block.CANDIDATES
    }
    pred = dtp.train(samples)

    midx = mixed_block.build_mixed_index(
        base, predictor=pred, access_counts=counts, lam=100.0
    )
    block_index.verify_block_index(midx, base)  # exact
    m0 = mixed_block.build_mixed_index(base)
    block_index.verify_block_index(m0, base)
    # the profiled index spends at least as much space (it buys time)
    assert midx.size_stats()["docs_bpi"] >= m0.size_stats()["docs_bpi"]


def test_vectorized_decoders_match_scalar_oracles():
    """The vectorized zoo decoders must agree with the scalar byte-walk
    oracles on values, and on consumed bytes (streams are concatenated
    in vroom files, so the end position is load-bearing)."""
    import numpy as np

    from dint_tpu.codecs import blocks as B

    rng = np.random.default_rng(7)
    pairs = [
        (B.maskedvbyte_encode, B.maskedvbyte_decode, B._maskedvbyte_decode_scalar),
        (B.varintgb_encode, B.varintgb_decode, B._varintgb_decode_scalar),
        (B.simple16_encode, B.simple16_decode, B._simple16_decode_scalar),
        # qmx has no scalar oracle here: its oracle is the REFERENCE
        # BINARY itself (tests/test_ref_parity.py cross-validation)
        (B.varint_g8iu_encode, B.varint_g8iu_decode, B._varint_g8iu_decode_scalar),
    ]
    for mag in (3, 8, 15, 24, 27):
        for n in (1, 4, 17, 255, 256, 1000):
            v = rng.integers(0, 1 << mag, n).astype(np.uint32)
            for enc, dec, oracle in pairs:
                name = enc.__name__
                if name == "simple16_encode" and mag > 27:
                    continue
                if name == "varint_g8iu_encode" and n < 256 and mag > 23:
                    # partial g8iu blocks divert to interpolative, which
                    # inherits the reference's u32 block-sum contract
                    # (encode_block now raises loudly on overflow)
                    continue
                buf = enc(v, B.UNKNOWN)
                # prefix + suffix garbage ensures pos handling is honest
                arr = np.frombuffer(b"\xaa" * 3 + buf + b"\xbb" * 7, np.uint8)
                got, end = dec(arr, 3, n, B.UNKNOWN)
                want, wend = oracle(arr, 3, n, B.UNKNOWN)
                np.testing.assert_array_equal(got, want, err_msg=f"{name} n={n} mag={mag}")
                assert end == wend, (name, n, mag, end, wend)


def test_ladder_pack_roundtrip():
    """_pack_w no-straddle packing at every ladder width (incl. the
    non-divisor widths 3/5/6/10 whose last word is partial) inverts
    through the device unpack shift/mask layout: value j of a row sits
    in word j//vpw at shift (j%vpw)*w."""
    import numpy as np

    from dint_tpu.kernels import unpack_device as U

    rng = np.random.default_rng(11)
    for w in U._LADDER:
        vpw = 32 // w
        hi = np.uint64(1) << np.uint64(w)
        vals = rng.integers(0, int(hi), (5, 256)).astype(np.uint32)
        words = U._pack_w(vals, w)
        assert words.shape[1] == -(-256 // vpw)
        mask = np.uint32((1 << w) - 1) if w < 32 else np.uint32(0xFFFFFFFF)
        j = np.arange(256)
        got = (words[:, j // vpw] >> ((j % vpw) * w).astype(np.uint32)) & mask
        np.testing.assert_array_equal(got, vals, err_msg=f"w={w}")
    # ladder assignment: smallest ladder width >= the needed width
    for need, want in ((1, 1), (3, 3), (4, 4), (7, 8), (9, 10),
                       (11, 16), (16, 16), (17, 32), (32, 32)):
        assert U._ladder_width(need) == want, (need, want)


def test_device_unpack_engine_exact(tmp_path):
    """The width-class device unpack engine (kernels/unpack_device.py)
    reproduces the host decode bit-for-bit for optpfor and qmx vroom
    streams, including exception patching and partial tails."""
    import numpy as np

    from dint_tpu.index import stream as stream_mod
    from dint_tpu.index import vroom_zoo
    from dint_tpu.kernels import unpack_device

    rng = np.random.default_rng(31)
    lists = []
    for n in (1, 40, 256, 300, 1000, 777):
        mag = int(rng.integers(2, 26))
        lists.append(rng.integers(0, 1 << mag, n).astype(np.uint32))
    # a list with exception-heavy content (optpfor outliers)
    v = rng.integers(0, 64, 512).astype(np.uint32)
    v[rng.choice(512, 20, replace=False)] = rng.integers(1 << 20, 1 << 30, 20)
    lists.append(v)

    for codec, planner in (
        ("optpfor", unpack_device.plan_optpfor),
        ("qmx", unpack_device.plan_qmx),
    ):
        payloads, lens = [], []
        for g in lists:
            p, _ = vroom_zoo.encode_list_zoo(codec, g)
            payloads.append(p)
        path = str(tmp_path / f"s.{codec}")
        stream_mod.write_stream(
            path, payloads,
            [len(g) for g in lists],
            [int(g.astype(np.int64).sum()) for g in lists],
        )
        arena, meta = stream_mod.load_stream(path)
        plan = planner(arena, meta)
        eng = unpack_device.UnpackEngine(plan)
        got = eng.decode_all_ordered()
        want = np.concatenate(lists)
        np.testing.assert_array_equal(got, want, err_msg=codec)
        assert eng.timed_chain(2) > 0


def test_device_unpack_b0_class_with_exceptions(tmp_path):
    """optpfor blocks can choose b=0 (all values become exceptions of a
    few positions, rest zero); the device engine must apply their
    exception highs, not decode to all-zeros (round-2 review finding)."""
    import numpy as np

    from dint_tpu.index import stream as stream_mod
    from dint_tpu.index import vroom_zoo
    from dint_tpu.kernels import unpack_device

    rng = np.random.default_rng(3)
    g = np.zeros(512, np.uint32)
    g[rng.choice(512, 6, replace=False)] = 1  # sparse ones -> b=0 + exceptions
    p, _ = vroom_zoo.encode_list_zoo("optpfor", g)
    path = str(tmp_path / "s.optpfor")
    stream_mod.write_stream(path, [p], [512], [int(g.sum())])
    arena, meta = stream_mod.load_stream(path)
    plan = unpack_device.plan_optpfor(arena, meta)
    eng = unpack_device.UnpackEngine(plan)
    got = eng.decode_all_ordered()
    np.testing.assert_array_equal(got, g)
    assert eng.timed_chain(2) >= 0


def test_simple16_device_engine_exact(tmp_path):
    """Mode-class device decode of simple16 vroom streams (static
    shifts per selector): exact vs the host decode, including
    OPT_CHUNK-chunked long lists and partial final words."""
    import numpy as np

    from dint_tpu.codecs.encode_batch import OPT_CHUNK
    from dint_tpu.index import stream as stream_mod
    from dint_tpu.index import vroom_zoo
    from dint_tpu.kernels import unpack_device

    rng = np.random.default_rng(13)
    lists = []
    for n in (1, 29, 255, 1000, OPT_CHUNK + 137, 3):
        mag = int(rng.integers(1, 27))
        lists.append(rng.integers(0, 1 << mag, n).astype(np.uint32))
    payloads = [vroom_zoo.encode_list_zoo("simple16", g)[0] for g in lists]
    path = str(tmp_path / "s.simple16")
    stream_mod.write_stream(
        path, payloads, [len(g) for g in lists],
        [int(g.astype(np.int64).sum()) for g in lists],
    )
    arena, meta = stream_mod.load_stream(path)
    plan = unpack_device.plan_simple16(arena, meta)
    eng = unpack_device.Simple16Engine(plan)
    got = eng.decode_all_ordered()
    np.testing.assert_array_equal(got, np.concatenate(lists))
    assert eng.timed_chain(2) >= 0


@pytest.mark.parametrize("codec", ["qmx", "simple16", "optpfor", "vbyte",
                                   "u32", "interpolative"])
def test_ladder_device_engine_exact(tmp_path, codec):
    """The generalized ladder image (plan_ladder: host-decode once at
    load, chunk into 256-value blocks, re-pack at no-straddle ladder
    widths) reproduces the host decode bit-for-bit for any zoo codec,
    including tails shorter than a block and single-value lists."""
    import numpy as np

    from dint_tpu.index import stream as stream_mod
    from dint_tpu.index import vroom_zoo
    from dint_tpu.kernels import unpack_device

    rng = np.random.default_rng(47)
    lists = []
    for n in (1, 40, 256, 300, 1000, 777, 3):
        # tails ride the wire codec's own partial path; optpfor's
        # interpolative tails carry a u32 block-sum contract, so keep
        # tail magnitudes modest and put the big values in a tail-free
        # list below
        mag = int(rng.integers(1, 22))
        lists.append(rng.integers(0, 1 << mag, n).astype(np.uint32))
    # w=32 ladder class; interpolative inherits the reference's u32
    # block-sum contract, so its big list stays under 2^22 per value
    big_mag = 22 if codec == "interpolative" else 27
    lists.append(rng.integers(0, 1 << big_mag, 512).astype(np.uint32))
    lists.append(np.zeros(512, np.uint32))  # all-zero blocks (w=1 class)
    payloads = [vroom_zoo.encode_list_zoo(codec, g)[0] for g in lists]
    path = str(tmp_path / f"s.{codec}")
    stream_mod.write_stream(
        path, payloads, [len(g) for g in lists],
        [int(g.astype(np.int64).sum()) for g in lists],
    )
    arena, meta = stream_mod.load_stream(path)
    plan = unpack_device.plan_ladder(codec, arena, meta)
    eng = unpack_device.UnpackEngine(plan)
    got = eng.decode_all_ordered()
    np.testing.assert_array_equal(got, np.concatenate(lists), err_msg=codec)
    assert eng.device_bytes > 0
    assert eng.timed_chain(2) >= 0


def test_pef_ladder_device_engine_exact(tmp_path):
    """PEF streams decode through the ladder image too: blocks pack
    RELATIVE docids at the width of each block's span, with the block
    minimum broadcast-added back on device (codecs are monotone docid
    sequences here, not gaps — the per-block base is what keeps the
    image narrow)."""
    import numpy as np

    from dint_tpu.index import stream as stream_mod
    from dint_tpu.index import vroom_zoo
    from dint_tpu.kernels import unpack_device

    rng = np.random.default_rng(53)
    lists = []
    for n in (1, 40, 256, 999, 3000):
        docs = np.sort(
            rng.choice(5_000_000, size=n, replace=False)
        ).astype(np.uint32)
        lists.append(docs)
    # a dense cluster: tiny span, exercises the narrow ladder widths
    lists.append((1_000_000 + np.arange(512, dtype=np.uint32) * 2))
    payloads, universes = [], []
    for d in lists:
        body, _bits = vroom_zoo.encode_list_pef(d)
        payloads.append(body)
        universes.append(int(d[-1]) + 1)
    path = str(tmp_path / "s.pef")
    stream_mod.write_stream(
        path, payloads, [len(d) for d in lists], universes,
        [[len(p)] for p in payloads],
    )
    arena, meta = stream_mod.load_stream(path)
    plan = unpack_device.plan_ladder("pef", arena, meta)
    eng = unpack_device.UnpackEngine(plan)
    got = eng.decode_all_ordered()
    np.testing.assert_array_equal(got, np.concatenate(lists))
    assert any(c.val_base is not None for c in plan.classes)
    # the dense cluster must land in a narrow class, not the
    # universe-width one
    assert min(c.b for c in plan.classes) <= 16
    assert eng.timed_chain(2) >= 0


@pytest.mark.parametrize("codec", ["vbyte", "maskedvbyte", "streamvbyte", "varintgb", "varintg8iu"])
def test_byteclass_device_engine_exact(tmp_path, codec):
    """Byte-length-class device decode: values excised into dense
    per-length arrays at plan time, decoded as fused shifts — exact
    for all byte-granular codecs, incl. chunked long lists."""
    import numpy as np

    from dint_tpu.codecs.encode_batch import OPT_CHUNK
    from dint_tpu.index import stream as stream_mod
    from dint_tpu.index import vroom_zoo
    from dint_tpu.kernels import unpack_device

    rng = np.random.default_rng(21)
    lists = []
    for n in (1, 40, 255, 1000, OPT_CHUNK + 77):
        mag = int(rng.integers(2, 31))
        lists.append(rng.integers(0, 1 << mag, n).astype(np.uint32))
    payloads = [vroom_zoo.encode_list_zoo(codec, g)[0] for g in lists]
    path = str(tmp_path / f"s.{codec}")
    stream_mod.write_stream(
        path, payloads, [len(g) for g in lists],
        [int(g.astype(np.int64).sum()) for g in lists],
    )
    arena, meta = stream_mod.load_stream(path)
    plan = unpack_device.plan_byteclass(codec, arena, meta)
    eng = unpack_device.ByteClassEngine(plan)
    got = eng.decode_all_ordered()
    np.testing.assert_array_equal(got, np.concatenate(lists), err_msg=codec)
    assert eng.timed_chain(2) >= 0
