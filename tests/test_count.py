import random

import numpy as np
import pytest

from mercat2_tpu.engine.codec import codec_for_bytes
from mercat2_tpu.engine.counter import KmerCounter, KmerTable, merge_tables

from oracle import naive_kmers


def _count(records: list[str], k: int, min_count: int = 1) -> dict[str, int]:
    joined = "".join(r.replace("*", "") for r in records)
    seq = np.frombuffer(joined.encode("latin-1"), np.uint8)
    rec = np.repeat(
        np.arange(1, len(records) + 1, dtype=np.int64),
        [len(r.replace("*", "")) for r in records],
    )
    codec = codec_for_bytes(seq)
    return KmerCounter(k, codec).count(seq, rec, min_count).to_dict()


def test_single_record_k3():
    got = _count(["GATTACA"], 3)
    assert got == naive_kmers(["GATTACA"], 3)


def test_records_do_not_bridge():
    # windows must not span record boundaries
    got = _count(["AAA", "AAA"], 3)
    assert got == {"AAA": 2}
    got = _count(["AC", "GT"], 2)
    assert got == {"AC": 1, "GT": 1}


def test_k_equals_1():
    got = _count(["ACGT", "AA"], 1)
    assert got == {"A": 3, "C": 1, "G": 1, "T": 1}


def test_short_records_skipped():
    got = _count(["AC", "GATTACA"], 5)
    assert got == naive_kmers(["GATTACA"], 5)


def test_min_count_filter():
    recs = ["AAAAAAAAAA", "CCC"]
    got = _count(recs, 2, min_count=5)
    assert got == naive_kmers(recs, 2, min_count=5)


def test_case_sensitive_and_n_kept():
    recs = ["ACgtNNacGT"]
    got = _count(recs, 3)
    assert got == naive_kmers(recs, 3)


def test_exact_fit_tiebreak_k16_dna():
    # 16 * 2 bits == 32: the all-T 16-mer packs to the all-ones word and
    # must not be confused with invalid windows
    recs = ["T" * 40, "T" * 10]
    got = _count(recs, 16)
    assert got == naive_kmers(recs, 16)


@pytest.mark.parametrize("k", [1, 2, 3, 5, 11, 16, 21, 31, 33])
def test_random_dna_vs_oracle(k):
    rng = random.Random(42 + k)
    recs = [
        "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 200)))
        for _ in range(20)
    ]
    assert _count(recs, k) == naive_kmers(recs, k)


@pytest.mark.parametrize("k", [2, 3, 7])
def test_random_protein_vs_oracle(k):
    rng = random.Random(7 + k)
    alphabet = "ACDEFGHIKLMNPQRSTVWYXBZ*"
    recs = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))
        for _ in range(15)
    ]
    assert _count(recs, k) == naive_kmers(recs, k)


def test_weird_alphabet_lowercase_digits():
    recs = ["acgtACGT0123acgt", "zzzyyyxxx"]
    for k in (2, 4):
        assert _count(recs, k) == naive_kmers(recs, k)


def test_lexicographic_output_order():
    rng = random.Random(1)
    recs = ["".join(rng.choice("ACGT") for _ in range(500))]
    table_k = KmerCounter(4, codec_for_bytes(np.frombuffer(recs[0].encode(), np.uint8)))
    seq = np.frombuffer(recs[0].encode(), np.uint8)
    t = table_k.count(seq, np.ones(len(seq), np.int64))
    strings = t.kmer_strings()
    assert strings == sorted(strings)


def test_empty_input():
    got = _count([], 3)
    assert got == {}
    got = _count([""], 3)
    assert got == {}


def test_merge_tables():
    a = _count(["AAACCC"], 2)
    b = _count(["CCCGGG"], 2)
    ta = KmerCounter.__new__(KmerCounter)  # only need tables
    import mercat2_tpu.engine.counter as counter_mod

    t1 = _table_from_dict(a, 2)
    t2 = _table_from_dict(b, 2)
    merged = merge_tables([t1, t2], 2).to_dict()
    expect = dict(a)
    for k_, v in b.items():
        expect[k_] = expect.get(k_, 0) + v
    assert merged == expect


def _table_from_dict(d: dict[str, int], k: int) -> KmerTable:
    items = sorted(d.items())
    if not items:
        return KmerTable.empty(k)
    kmers = np.frombuffer("".join(km for km, _ in items).encode("latin-1"), np.uint8)
    return KmerTable(kmers.reshape(-1, k).copy(), np.array([c for _, c in items], np.int64))


def test_dispatch_streams_batched_parity():
    """Batched multi-stream dispatch == per-stream counting (all paths)."""
    rng = random.Random(7)
    from mercat2_tpu.engine.codec import DNA_CODEC

    for k in (3, 21):  # small (1-word) and multi-word key shapes
        counter = KmerCounter(k, DNA_CODEC)
        streams = []
        expected = []
        for n in (3000, 5000, 800, 4800):
            seq = np.frombuffer(
                "".join(rng.choice("ACGT") for _ in range(n)).encode(), np.uint8
            )
            rec = np.ones(n, np.int64)
            streams.append(counter.build_stream(seq, rec))
            expected.append(counter.count(seq, rec, 2).to_dict())
        pending = counter.dispatch_streams(streams, 2)
        for p in pending:
            p.prefetch()
        got = [p.table().to_dict() for p in pending]
        assert got == expected, f"k={k}"


def test_approx_compaction_path_parity():
    """Large stream takes the approx_min_k compaction path; must stay exact."""
    from mercat2_tpu.engine.counter import _DEFAULT_CAP
    from mercat2_tpu.engine.codec import DNA_CODEC

    n = 4 * _DEFAULT_CAP + 64  # p >= 4*cap -> approx path in finalize
    rng = np.random.default_rng(3)
    seq = DNA_CODEC.symbols[rng.integers(0, 4, size=n)]
    rec = np.ones(n, np.int64)
    counter = KmerCounter(21, DNA_CODEC)
    t = counter.count(seq, rec, 2)
    # oracle on a sample of kmers via python dict over the same sequence
    s = seq.tobytes().decode()
    from collections import Counter as PyCounter

    oracle = PyCounter(s[i : i + 21] for i in range(len(s) - 20))
    oracle = {km: c for km, c in oracle.items() if c >= 2}
    assert t.to_dict() == oracle


def test_dispatch_streams_fid_word_mode():
    """k=16 DNA: 32-bit keys leave no spare bits -> dedicated fid word."""
    from mercat2_tpu.engine.codec import DNA_CODEC
    from mercat2_tpu.ops.finalize import fid_layout

    assert fid_layout(16, 2, 3)[0] == "word"
    rng = random.Random(11)
    counter = KmerCounter(16, DNA_CODEC)
    streams, expected = [], []
    for n in (2000, 1500, 3000):
        seq = np.frombuffer(
            "".join(rng.choice("ACGT") for _ in range(n)).encode(), np.uint8
        )
        rec = np.ones(n, np.int64)
        streams.append(counter.build_stream(seq, rec))
        expected.append(counter.count(seq, rec, 1).to_dict())
    got = [p.table().to_dict() for p in counter.dispatch_streams(streams, 1)]
    assert got == expected


def test_packed_segments_match_stream_path(tmp_path):
    """The single-launch per-file-segment packed path returns exactly the
    per-file tables of the stream path (same per-file min-count semantics,
    ref /root/reference/lib/mercat2_kmers.py:73-76)."""
    import numpy as np

    from mercat2_tpu.engine.codec import codec_for_alphabet
    from mercat2_tpu.engine.counter import KmerCounter, NumpySource, fetch_tables

    rng = np.random.default_rng(42)
    codec = codec_for_alphabet(np.frombuffer(b"ACGT", np.uint8))
    for k in (5, 16, 21):
        counter = KmerCounter(k, codec)
        files = []
        for n in (9000, 3000, 700):
            seq = codec.symbols[rng.integers(0, 4, size=n)]
            rec = np.repeat(np.arange(4), -(-n // 4))[:n].astype(np.int64)
            files.append((seq, rec))
        sources = [NumpySource(seq, rec, codec) for seq, rec in files]
        pendings = counter.dispatch_packed_segments(sources, min_count=2)
        got = fetch_tables(pendings)
        want = [counter.count(seq, rec, 2) for seq, rec in files]
        for g, w in zip(got, want):
            assert len(g) == len(w), (k, len(g), len(w))
            np.testing.assert_array_equal(g.kmers, w.kmers)
            np.testing.assert_array_equal(g.counts, w.counts)


def test_packed_segments_cap_overflow_retry():
    """n_out beyond the speculative/cap limits still returns exact tables."""
    import numpy as np

    from mercat2_tpu.engine.codec import codec_for_alphabet
    from mercat2_tpu.engine.counter import KmerCounter, NumpySource, fetch_tables

    rng = np.random.default_rng(7)
    codec = codec_for_alphabet(np.frombuffer(b"ACGT", np.uint8))
    counter = KmerCounter(9, codec)
    n = 60000  # ~60k distinct 9-mers at min_count=1 >> _SPEC_ROWS
    seq = codec.symbols[rng.integers(0, 4, size=n)]
    rec = np.zeros(n, np.int64)
    sources = [NumpySource(seq, rec, codec)]
    got = fetch_tables(counter.dispatch_packed_segments(sources, 1))[0]
    want = counter.count(seq, rec, 1)
    assert len(got) == len(want) and len(got) > KmerCounter._SPEC_ROWS
    np.testing.assert_array_equal(got.kmers, want.kmers)
    np.testing.assert_array_equal(got.counts, want.counts)


@pytest.mark.parametrize("k", [135, 200])
def test_large_k_stays_on_device(k):
    """k in (128, 256] runs the device sort path (multiword keys), exact
    vs the naive oracle; the host-numpy fallback now starts above 256."""
    from mercat2_tpu.engine.counter import _MAX_DEVICE_K

    assert k <= _MAX_DEVICE_K
    rng = random.Random(k)
    recs = ["".join(rng.choice("ACGT") for _ in range(rng.randint(100, 400)))
            for _ in range(6)]
    recs += [recs[0]]  # a duplicate record -> counts >= 2 exist
    got = _count(recs, k)
    assert got == naive_kmers(recs, k)
    got2 = _count(recs, k, min_count=2)
    want2 = {km: c for km, c in naive_kmers(recs, k).items() if c >= 2}
    assert got2 == want2


@pytest.mark.parametrize("k", [7, 8, 12])
def test_protein_two_word_keys(k):
    """5-bit protein keys spanning two words take the fused-u64 sort path;
    exact vs the naive oracle, with and without min-count."""
    rng = random.Random(k)
    aas = "ACDEFGHIKLMNPQRSTVWYXBZ"
    recs = ["".join(rng.choice(aas) for _ in range(rng.randint(40, 200)))
            for _ in range(8)]
    recs += recs[:2]
    got = _count(recs, k)
    assert got == naive_kmers(recs, k)
    got2 = _count(recs, k, min_count=2)
    want2 = {km: c for km, c in naive_kmers(recs, k).items() if c >= 2}
    assert got2 == want2
