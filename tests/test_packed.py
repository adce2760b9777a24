"""Packed-transport tests: bit-packed h2d words + out-of-band gap ranges.

The packed path (engine.counter PackedGroup / ops.finalize
count_kmers_packed) must count exactly like the uint8-stream path and the
pure-Python oracle for every key shape (1-word, exact-fit tie-break,
multi-word) and for multi-file fid-tagged launches.
"""

import gzip
import random

import numpy as np
import pytest

from mercat2_tpu.engine.codec import DNA_CODEC, codec_for_bytes
from mercat2_tpu.engine.counter import (
    KmerCounter, NumpySource, pack_codes_into, _REC_GAP,
)

from oracle import naive_kmers


def _seq_rec(records: list[str]):
    joined = "".join(records)
    seq = np.frombuffer(joined.encode("latin-1"), np.uint8)
    rec = np.repeat(
        np.arange(1, len(records) + 1, dtype=np.int64),
        [len(r) for r in records],
    )
    return seq, rec


def _random_records(rng, n_rec, lo=0, hi=200, alphabet="ACGT"):
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(lo, hi)))
        for _ in range(n_rec)
    ]


def _packed_count(records, k, min_count=1, codec=None):
    seq, rec = _seq_rec(records)
    codec = codec or codec_for_bytes(seq)
    counter = KmerCounter(k, codec)
    assert counter.packable()
    src = NumpySource(seq, rec, codec)
    group = counter.build_packed_group([src])
    if group is None:
        return {}
    return counter.dispatch_packed(group, min_count).table().to_dict()


def test_pack_codes_into_roundtrip():
    rng = np.random.default_rng(0)
    for bits in (1, 2, 4, 8):
        per = 32 // bits
        n = 3 * per + 5
        codes = rng.integers(0, 1 << bits, size=n, dtype=np.uint8)
        words = np.zeros(8, np.uint32)
        pack_codes_into(codes, words, per, bits)  # offset = one word in
        # decode back: symbol j of word w sits at the top
        got = []
        for w in words:
            for s in range(per):
                got.append((int(w) >> (32 - bits * (s + 1))) & ((1 << bits) - 1))
        assert got[per : per + n] == codes.tolist()
        assert all(g == 0 for g in got[:per])


def test_packed_window_validity_unit():
    import jax.numpy as jnp
    from mercat2_tpu.ops.finalize import packed_window_validity

    # symbols 0..9, gap at [4, 6), k=3 -> windows 2..5 invalid, p=8
    v = packed_window_validity(
        jnp.array([4, 100], jnp.int32), jnp.array([6, 100], jnp.int32), 3, 8
    )
    assert v.tolist() == [True, True, False, False, False, False, True, True]


@pytest.mark.parametrize("k", [1, 3, 11, 16, 21, 31])
def test_packed_single_vs_oracle(k):
    rng = random.Random(100 + k)
    recs = _random_records(rng, 20)
    assert _packed_count(recs, k) == naive_kmers(recs, k)


def test_packed_min_count():
    recs = ["AAAAAAAAAA", "CCC", "AAAA"]
    assert _packed_count(recs, 2, min_count=5) == naive_kmers(recs, 2, min_count=5)


def test_packed_4bit_alphabet():
    # force a 4-bit codec to exercise per=8
    from mercat2_tpu.engine.codec import Codec

    rng = random.Random(5)
    recs = _random_records(rng, 10, alphabet="ACGTNacgt")
    seq, rec = _seq_rec(recs)
    alpha = np.unique(seq)
    codec = Codec(alpha, 4)
    assert _packed_count(recs, 3, codec=codec) == naive_kmers(recs, 3)


def test_packed_3bit_alphabet():
    # 8 distinct symbols -> natural 3-bit codec: per=10, 2 spare bits per
    # word (bits does not divide 32)
    rng = random.Random(6)
    recs = _random_records(rng, 12, alphabet="ACGTNacg")
    for k in (3, 11):  # 1-word and 2-word keys
        assert _packed_count(recs, k) == naive_kmers(recs, k)


@pytest.mark.parametrize("k", [1, 3, 6, 7, 13])
def test_packed_5bit_protein(k):
    # 20-25 amino-acid symbols -> 5-bit codec: per=6 (the protein transport
    # saves 1/3 of h2d bytes vs the uint8 stream)
    rng = random.Random(7 + k)
    recs = _random_records(rng, 15, alphabet="ACDEFGHIKLMNPQRSTVWY*XBZU")
    recs = [r.replace("*", "") for r in recs]
    assert _packed_count(recs, k) == naive_kmers(recs, k)


def test_packed_5bit_multi_file_segments():
    rng = random.Random(8)
    codecs_recs = [
        _random_records(rng, 6, alphabet="ACDEFGHIKLMNPQRSTVWYX"),
        _random_records(rng, 3, alphabet="ACDEFGHIKLMNPQRSTVWYX"),
    ]
    seqs = [_seq_rec(r) for r in codecs_recs]
    allseq = np.concatenate([s for s, _ in seqs])
    codec = codec_for_bytes(allseq)
    assert codec.bits == 5
    counter = KmerCounter(5, codec)
    assert counter.packable()
    srcs = [NumpySource(s, r, codec) for s, r in seqs]
    pendings = counter.dispatch_packed_segments(srcs, min_count=2)
    for recs, p in zip(codecs_recs, pendings):
        assert p.table().to_dict() == naive_kmers(recs, 5, min_count=2)


def test_packed_multi_file_parity():
    rng = random.Random(42)
    from mercat2_tpu.engine.counter import _MultiView

    for k in (3, 16, 21):
        counter = KmerCounter(k, DNA_CODEC)
        filesets = [_random_records(rng, 5, 10, 300) for _ in range(4)]
        sources = []
        expected = []
        for recs in filesets:
            seq, rec = _seq_rec(recs)
            sources.append(NumpySource(seq, rec, DNA_CODEC))
            expected.append(naive_kmers(recs, k, min_count=2))
        group = counter.build_packed_group(sources)
        multi = counter.dispatch_packed(group, min_count=2)
        got = [multi.row_table(i).to_dict() for i in range(4)]
        assert got == expected, f"k={k}"


def test_packed_sources_grouping(monkeypatch):
    """dispatch_packed_sources splits into several launch groups."""
    rng = random.Random(9)
    counter = KmerCounter(5, DNA_CODEC)
    monkeypatch.setattr(KmerCounter, "_PACK_TARGET", 4096)
    filesets = [_random_records(rng, 3, 200, 1200) for _ in range(7)]
    filesets.insert(2, [""])  # empty file mid-list keeps its slot
    sources = []
    expected = []
    for recs in filesets:
        seq, rec = _seq_rec(recs)
        sources.append(NumpySource(seq, rec, DNA_CODEC))
        expected.append(naive_kmers(recs, 5))
    pendings = counter.dispatch_packed_sources(sources, min_count=1)
    got = [p.table().to_dict() for p in pendings]
    assert got == expected


def test_packed_overflow_retry(monkeypatch):
    """n_out > cap triggers the bigger-cap relaunch (min_count caps output)."""
    import mercat2_tpu.engine.counter as counter_mod

    monkeypatch.setattr(counter_mod, "_DEFAULT_CAP", 1024)
    rng = np.random.default_rng(17)
    n = 40_000
    half = DNA_CODEC.symbols[rng.integers(0, 4, size=n)]
    seq = np.concatenate([half, half])  # every k-mer count >= 2
    recs = [seq[:n].tobytes().decode(), seq[n:].tobytes().decode()]
    counter = KmerCounter(21, DNA_CODEC)
    src = NumpySource(*_seq_rec(recs), DNA_CODEC)
    group = counter.build_packed_group([src])
    pending = counter.dispatch_packed(group, min_count=2)
    assert pending._cap == 16384  # < n_out: the retry path is exercised
    assert pending.table().to_dict() == naive_kmers(recs, 21, min_count=2)


def test_numpy_source_matches_native(tmp_path):
    """NativeFasta and NumpySource agree on the whole packed interface."""
    from mercat2_tpu.io.native import open_fasta_native

    rng = random.Random(3)
    recs = _random_records(rng, 8, 0, 150)
    fa = tmp_path / "x.fna.gz"
    with gzip.open(fa, "wt") as f:
        for i, r in enumerate(recs):
            f.write(f">r{i}\n")
            for j in range(0, len(r), 60):
                f.write(r[j : j + 60] + "\n")
    nf = open_fasta_native(fa)
    if nf is None:
        pytest.skip("native lib not built")
    seq, rec = _seq_rec([r for r in recs if r])  # parser drops empty records?
    nseq, nrec = nf.seq_and_rec()
    ns = NumpySource(nseq, nrec, DNA_CODEC)
    gap = _REC_GAP
    assert nf.packed_len(gap) == ns.packed_len(gap)
    nb, ne = nf.gap_ranges(gap)
    sb, se = ns.gap_ranges(gap)
    assert nb.tolist() == sb.tolist() and ne.tolist() == se.tolist()
    per = 32 // DNA_CODEC.bits
    total = nf.packed_len(gap)
    nwords = -(-(total + per) // per)
    w_native = np.zeros(nwords, np.uint32)
    w_numpy = np.zeros(nwords, np.uint32)
    lut = DNA_CODEC.lut_encode()
    assert nf.fill_packed(DNA_CODEC.bits, gap, lut, w_native, per) == total
    ns.fill_packed(DNA_CODEC.bits, gap, lut, w_numpy, per)
    assert w_native.tolist() == w_numpy.tolist()
    nf.close()


def test_packed_empty_and_short():
    assert _packed_count([""], 3, codec=DNA_CODEC) == {}
    assert _packed_count(["AC"], 3, codec=DNA_CODEC) == {}
    assert _packed_count(["AC", "GATTACA"], 5, codec=DNA_CODEC) == naive_kmers(
        ["GATTACA"], 5
    )
