"""count_native (C++ stream build) vs count (numpy path) equivalence."""

import numpy as np
import pytest

from mercat2_tpu.engine.codec import codec_for_alphabet, codec_for_bytes
from mercat2_tpu.engine.counter import KmerCounter
from mercat2_tpu.io.fasta import parse_fasta_seq_bytes, read_file_bytes
from mercat2_tpu.io.native import native_lib, open_fasta_native

pytestmark = pytest.mark.skipif(native_lib() is None, reason="native lib not built")


def _both(path, k, min_count=1, bucket=None):
    with open_fasta_native(path) as nf:
        codec = codec_for_alphabet(nf.alphabet())
        native = KmerCounter(k, codec).count_native(nf, min_count, bucket=bucket)
    seq, rec = parse_fasta_seq_bytes(read_file_bytes(path))
    codec2 = codec_for_bytes(seq)
    numpy_t = KmerCounter(k, codec2).count(seq, rec, min_count, bucket=bucket)
    return native, numpy_t


@pytest.mark.parametrize("k,minc", [(3, 1), (5, 10), (21, 2)])
def test_native_count_matches_numpy(tmp_path, k, minc):
    rng = np.random.default_rng(7)
    recs = []
    for i in range(30):
        n = int(rng.integers(1, 200))
        recs.append(f">r{i}\n" + "".join(rng.choice(list("ACGT"), n)) + "\n")
    p = tmp_path / "x.fna"
    p.write_text("".join(recs))
    a, b = _both(p, k, minc)
    np.testing.assert_array_equal(a.kmers, b.kmers)
    np.testing.assert_array_equal(a.counts, b.counts)


def test_native_count_short_records_and_n(tmp_path):
    p = tmp_path / "y.fna"
    p.write_text(">a\nAC\n>b\nACGTNNACGT\n>c\n\n>d\nACGTACGTAC\n")
    a, b = _both(p, 4, 1)
    np.testing.assert_array_equal(a.kmers, b.kmers)
    np.testing.assert_array_equal(a.counts, b.counts)
    # 'N' k-mers are counted as-is, like the reference
    assert any(b"N" in bytes(row) for row in a.kmers)


def test_native_count_on_reference(ref_data):
    f = ref_data / "5-genomes-fna_gz" / "GIC31.fna.gz"
    a, b = _both(f, 5, 10)
    np.testing.assert_array_equal(a.kmers, b.kmers)
    np.testing.assert_array_equal(a.counts, b.counts)


def test_stream_len_matches(tmp_path):
    p = tmp_path / "z.fna"
    p.write_text(">a\nACGTT\n>b\nGG\n>c\nTTTT\n")
    with open_fasta_native(p) as nf:
        codec = codec_for_alphabet(nf.alphabet())
        c = KmerCounter(3, codec)
        seq, rec = parse_fasta_seq_bytes(read_file_bytes(p))
        assert nf.stream_len(3) == c.stream_len(seq, rec)
