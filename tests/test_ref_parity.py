"""Cross-validation against the REFERENCE C++ encoders.

native/ref_check.cpp compiles the reference's own single_opt_dint /
multi_opt_dint (vroom_env/dint_codecs.hpp) against OUR dictionary files
and unit streams, so both the dictionary FILE format and the encoded
STREAM bytes are diffed against the actual reference implementation —
not merely against this repo's oracle.  Skipped when the read-only
reference checkout or a C++ toolchain is unavailable.

Full-scale runs on the 16.7M-int bench collection (8,003 single units +
71,150 multi units) were byte-exact; this test keeps a fast subset in
the suite.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from dint_tpu.codecs import native
from dint_tpu.config import NUM_SELECTORS
from dint_tpu.dictionary.builder import build_dictionary
from dint_tpu.stats import block_stats, collectors
from tests.test_dictionary_and_dint import make_gap_lists

REF = os.environ.get("DINT_REF", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "vroom_env", "dint_codecs.hpp"))
    or shutil.which("g++") is None
    or native.get_lib() is None,
    reason="reference checkout or toolchain unavailable",
)


@pytest.fixture(scope="module")
def ref_check(tmp_path_factory):
    exe = str(tmp_path_factory.mktemp("refbin") / "ref_check")
    subprocess.run(
        [
            "g++", "-O2", "-std=c++17", "-msse4.1",
            f"-I{REF}/include", f"-I{REF}/include/dint", f"-I{REF}",
            f"-I{REPO}/native/ref_harness",
            f"{REPO}/native/ref_check.cpp", "-o", exe,
        ],
        check=True,
        capture_output=True,
    )
    return exe


@pytest.fixture(scope="module")
def dicts(tmp_path_factory):
    gap_lists = make_gap_lists(np.random.default_rng(41), num=50, mean_len=700)
    total = sum(len(g) for g in gap_lists)
    per_size = collectors.collect_single(gap_lists)
    ctx = block_stats._filter_sort(per_size, total)
    sstats = block_stats.BlockStats(total, [ctx])
    per_key = collectors.collect_multi(gap_lists)
    contexts = [
        block_stats._filter_sort(
            {s: per_key[(sel, s)] for s in collectors.TARGET_SIZES}, total
        )
        for sel in range(NUM_SELECTORS)
    ]
    mstats = block_stats.BlockStats(total, contexts)
    ds = build_dictionary(sstats, "single")
    dm = build_dictionary(mstats, "multi")
    dr = build_dictionary(sstats, "rectangular")
    d = tmp_path_factory.mktemp("dicts")
    ds.store(str(d / "single.dict"))
    dm.store(str(d / "multi.dict"))
    dr.store(str(d / "rect.dict"))
    return (gap_lists, ds, str(d / "single.dict"), dm,
            str(d / "multi.dict"), dr, str(d / "rect.dict"))


def _write_units(units, tmp):
    flat = (
        np.concatenate(units).astype("<u4")
        if units
        else np.zeros(0, "<u4")
    )
    offs = np.zeros(len(units) + 1, "<u8")
    np.cumsum([len(u) for u in units], out=offs[1:])
    ufile = os.path.join(tmp, "units.bin")
    with open(ufile, "wb") as f:
        np.asarray([len(units)], "<u8").tofile(f)
        offs.tofile(f)
        flat.tofile(f)
    return ufile


def _run_ref(exe, mode, dict_file, units, tmp):
    ufile = _write_units(units, tmp)
    ofile = os.path.join(tmp, "ref.bin")
    subprocess.run([exe, mode, dict_file, ufile, ofile], check=True,
                   capture_output=True)
    raw = open(ofile, "rb").read()
    nu = int(np.frombuffer(raw[:8], "<u8")[0])
    lens = np.frombuffer(raw[8 : 8 + 8 * nu], "<u8")
    blob = raw[8 + 8 * nu :]
    out, p = [], 0
    for ln in lens:
        out.append(blob[p : p + int(ln)])
        p += int(ln)
    return out


def _ref_decode_check(exe, mode, dict_file, units, ours, tmp):
    """Reference decoder over OUR bytes must reproduce the units."""
    ufile = _write_units(units, tmp)
    efile = os.path.join(tmp, "ours.bin")
    with open(efile, "wb") as f:
        np.asarray([len(units)], "<u8").tofile(f)
        np.asarray([len(b) for b in ours], "<u8").tofile(f)
        f.write(b"".join(ours))
    r = subprocess.run([exe, mode, dict_file, ufile, efile],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()


def test_single_bytes_match_reference(ref_check, dicts, tmp_path):
    gap_lists, ds, sdict, _, _, _, _ = dicts
    from dint_tpu.codecs.encode_batch import OPT_CHUNK

    units = []
    for g in gap_lists:
        for i in range(0, max(1, len(g)), OPT_CHUNK):
            units.append(g[i : i + OPT_CHUNK])
    ours = native.native_encoder_for(ds).encode_units(units, 0)
    ref = _run_ref(ref_check, "single", sdict, units, str(tmp_path))
    assert ours == ref
    _ref_decode_check(ref_check, "dsingle", sdict, units, ours,
                      str(tmp_path))


def test_qmx_bytes_match_reference(ref_check, tmp_path):
    """Our QMX (codecs/qmx.py) is the ORIGINAL wire format: encode
    bytes equal the reference codec's, our decode inverts the
    reference's bytes, and the reference decoder accepts ours."""
    from dint_tpu.codecs import qmx as qmx_wire

    rng = np.random.default_rng(17)
    units = []
    for n in (1, 3, 5, 8, 9, 16, 17, 63, 255, 256, 1000):
        units.append(rng.integers(0, 4, n).astype("<u4"))
        units.append(np.ones(n, "<u4"))
        units.append(rng.integers(0, 1 << 20, n).astype("<u4"))
        units.append(rng.integers(0, 1 << 31, n).astype("<u4"))
    ufile = _write_units(units, str(tmp_path))
    rfile = os.path.join(str(tmp_path), "qref.bin")
    subprocess.run([ref_check, "qmx", ufile, rfile], check=True,
                   capture_output=True)
    raw = open(rfile, "rb").read()
    nu = int(np.frombuffer(raw[:8], "<u8")[0])
    lens = np.frombuffer(raw[8 : 8 + 8 * nu], "<u8")
    blob = raw[8 + 8 * nu :]
    p = 0
    ours = []
    for i, u in enumerate(units):
        ref = blob[p : p + int(lens[i])]
        p += int(lens[i])
        mine = qmx_wire.encode(u)
        assert mine == ref, f"unit {i} n={len(u)}"
        np.testing.assert_array_equal(qmx_wire.decode_payload(ref, len(u)), u)
        ours.append(mine)
    efile = os.path.join(str(tmp_path), "qours.bin")
    with open(efile, "wb") as f:
        np.asarray([len(units)], "<u8").tofile(f)
        np.asarray([len(b) for b in ours], "<u8").tofile(f)
        f.write(b"".join(ours))
    r = subprocess.run([ref_check, "qmxdec", ufile, efile],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()


def test_varintgb_and_g8iu_bytes_match_reference(ref_check, tmp_path):
    """varintgb and varint_G8IU encodings equal the reference classes
    (ds2i::VarIntGB<false>.encodeArray; varint_G8IU_block's
    encodeBlock loop over a zeroed buffer) byte-for-byte."""
    from dint_tpu.codecs import blocks as B

    rng = np.random.default_rng(5)
    units = []
    for n in (256, 512, 1000, 4096):
        for mag in (3, 8, 15, 24, 31):
            units.append(rng.integers(0, 1 << mag, n).astype("<u4"))
    units.append(np.zeros(256, "<u4"))
    ufile = _write_units(units, str(tmp_path))
    for mode, enc in (("vgb", lambda u: B.varintgb_encode(u, B.UNKNOWN)),
                      ("g8iu", B._varint_g8iu_encode_full)):
        rfile = os.path.join(str(tmp_path), f"{mode}.bin")
        subprocess.run([ref_check, mode, ufile, rfile], check=True,
                       capture_output=True)
        raw = open(rfile, "rb").read()
        nu = int(np.frombuffer(raw[:8], "<u8")[0])
        lens = np.frombuffer(raw[8 : 8 + 8 * nu], "<u8")
        blob = raw[8 + 8 * nu :]
        p = 0
        for i, u in enumerate(units):
            ref = blob[p : p + int(lens[i])]
            p += int(lens[i])
            assert enc(u) == ref, f"{mode} unit {i} n={len(u)}"


def test_interpolative_bit_sizes_match_reference(ref_check, tmp_path):
    """Our interpolative coder deliberately reorders bits for batched
    decode (level order), but every code is the same minimal binary
    code — so the exact BIT COUNT must equal the reference's recursive
    coder on every sequence."""
    from dint_tpu.codecs import interpolative as interp

    rng = np.random.default_rng(13)
    units = []
    for n in (2, 3, 5, 17, 100, 256):
        for _ in range(6):
            u = int(rng.integers(n, n * 50))
            vals = np.sort(rng.choice(u, n - 1, replace=False)).astype("<u4")
            units.append(np.concatenate([vals, [u]]).astype("<u4"))
    ufile = _write_units(units, str(tmp_path))
    rfile = os.path.join(str(tmp_path), "ibits.bin")
    subprocess.run([ref_check, "interp", ufile, rfile], check=True,
                   capture_output=True)
    bits = np.frombuffer(open(rfile, "rb").read()[8:], "<u8")
    for i, v in enumerate(units):
        assert interp.encoded_bits(v[:-1], 0, int(v[-1])) == int(bits[i]), i


def test_ef_family_bits_match_reference(ref_check, tmp_path):
    """Every EF-family sequence writer produces bit-for-bit the words
    the reference writers produce (via a functional
    bit_vector_builder shim compiled against the reference headers):
    compact EF (incl. 0/1-pointer slots), ranked bitvector (incl. the
    never-written universe-boundary rank sample), strict, indexed,
    uniform-partitioned, partitioned (PEF), and positive sequences."""
    from dint_tpu.codecs import ef
    from dint_tpu.utils.bitio import BitBuilder

    rng = np.random.default_rng(43)
    units = []
    for n in (1, 2, 64, 257, 1000):
        for dense in (1.1, 2.0, 100.0):
            u = max(n + 1, int(n * dense))
            vals = np.sort(rng.choice(u, n, replace=False)).astype("<u4")
            units.append(np.concatenate([vals, [u]]).astype("<u4"))
    punits = []
    for n in (1, 5, 100, 1000):
        vals = rng.integers(1, 50, n).astype("<u4")
        punits.append(
            np.concatenate([vals, [int(vals.sum()) + 1]]).astype("<u4")
        )
    kinds = {
        "ef": (ef.compact_elias_fano, units),
        "rb": (ef.compact_ranked_bitvector, units),
        "strict": (ef.strict_sequence, units),
        "indexed": (ef.indexed_sequence, units),
        "uniform": (ef.uniform_partitioned_sequence(ef.indexed_sequence),
                    units),
        "part": (ef.partitioned_sequence(ef.indexed_sequence), units),
        "positive": (ef.positive_sequence(ef.strict_sequence), punits),
    }
    for kind, (seq, us) in kinds.items():
        ufile = _write_units(us, str(tmp_path))
        rfile = os.path.join(str(tmp_path), f"ef_{kind}.bin")
        subprocess.run([ref_check, "ef", kind, ufile, rfile], check=True,
                       capture_output=True)
        raw = open(rfile, "rb").read()
        p = 8
        for i, v in enumerate(us):
            nbits, nwords = np.frombuffer(raw[p : p + 16], "<u8")
            p += 16
            words = np.frombuffer(raw[p : p + 8 * int(nwords)], "<u8")
            p += 8 * int(nwords)
            bb = BitBuilder()
            seq.write(bb, v[:-1], int(v[-1]), len(v) - 1, ef.PARAMS)
            assert bb.size == int(nbits), (kind, i)
            got = bb.words()
            assert got.shape[0] == int(nwords), (kind, i)
            np.testing.assert_array_equal(got, words, err_msg=f"{kind} {i}")


def test_greedy_bytes_match_reference(ref_check, dicts, tmp_path):
    """The greedy coder (DS2I_HEURISTIC_GREEDY path) matches the
    reference's single_greedy_dint byte-for-byte."""
    gap_lists, ds, sdict, _, _, _, _ = dicts
    from dint_tpu.codecs import dint
    from dint_tpu.codecs.encode_batch import OPT_CHUNK

    lt = ds.lookup_table()
    units = []
    for g in gap_lists:
        for i in range(0, max(1, len(g)), OPT_CHUNK):
            units.append(g[i : i + OPT_CHUNK])
    ours = [dint.encode_greedy_single(lt, u) for u in units]
    ref = _run_ref(ref_check, "greedy", sdict, units, str(tmp_path))
    assert ours == ref


def test_rect_bytes_match_reference(ref_check, dicts, tmp_path):
    """The rectangular dictionary type (the bench headline) loads in
    the reference's builder and encodes byte-identically."""
    gap_lists, _, _, _, _, dr, rdict = dicts
    from dint_tpu.codecs.encode_batch import OPT_CHUNK

    units = []
    for g in gap_lists:
        for i in range(0, max(1, len(g)), OPT_CHUNK):
            units.append(g[i : i + OPT_CHUNK])
    ours = native.native_encoder_for(dr).encode_units(units, 0)
    ref = _run_ref(ref_check, "rect", rdict, units, str(tmp_path))
    assert ours == ref


def test_multi_bytes_match_reference(ref_check, dicts, tmp_path):
    gap_lists, _, _, dm, mdict, _, _ = dicts
    units = []
    for g in gap_lists:
        for i in range(0, max(1, len(g)), 256):
            units.append(g[i : i + 256])
    ours = native.native_encoder_for(dm).encode_units(units, 1)
    ref = _run_ref(ref_check, "multi", mdict, units, str(tmp_path))
    assert ours == ref
    _ref_decode_check(ref_check, "dmulti", mdict, units, ours,
                      str(tmp_path))
