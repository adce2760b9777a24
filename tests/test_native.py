"""Native C++ IO parser vs the numpy reference implementation."""

import gzip

import numpy as np
import pytest

from mercat2_tpu.io.fasta import parse_fasta_seq_bytes, read_file_bytes
from mercat2_tpu.io.native import (
    build_native,
    native_lib,
    parse_fasta_native,
    parse_fastq_native,
)

pytestmark = pytest.mark.skipif(native_lib() is None, reason="native lib not built")


def _check_file(path):
    seq_n, rec_n = parse_fasta_native(path)
    seq_p, rec_p = parse_fasta_seq_bytes(read_file_bytes(path))
    np.testing.assert_array_equal(seq_n, seq_p)
    np.testing.assert_array_equal(rec_n, rec_p)


def test_parity_on_reference_genomes(ref_data):
    for f in sorted((ref_data / "5-genomes-fna_gz").glob("*.fna.gz")):
        _check_file(f)


def test_parity_scaffolds(ref_data):
    _check_file(ref_data / "Scaffolds_with-NNN.fna")


def test_parity_protein(ref_data):
    for f in sorted((ref_data / "5-genomes-faa").glob("*"))[:2]:
        _check_file(f)


def test_edge_cases(tmp_path):
    cases = {
        "empty.fa": b"",
        "no_header.fa": b"ACGT\nTTTT\n",
        "stars.fa": b">r1\nAC*GT\n*\n>r2\nGG\n",
        "whitespace.fa": b">r1\n  ACGT  \r\n\tGG\n",
        "no_trailing_nl.fa": b">r1\nACGT",
        "blank_lines.fa": b">r1\n\n\nAC\n\n>r2\nGT\n",
    }
    for name, data in cases.items():
        p = tmp_path / name
        p.write_bytes(data)
        _check_file(p)


def test_gzip_roundtrip(tmp_path):
    p = tmp_path / "x.fa.gz"
    with gzip.open(p, "wb") as f:
        f.write(b">a\nACGTACGT\n>b\nGGGG\n")
    seq, rec = parse_fasta_native(p)
    assert bytes(seq) == b"ACGTACGTGGGG"
    np.testing.assert_array_equal(rec, [1] * 8 + [2] * 4)


def test_fastq_native(tmp_path):
    p = tmp_path / "r.fastq"
    p.write_bytes(b"@read1 x\nACGT\n+\nIIII\n@read2\nGGTT\n+\nIIII\n")
    seq, starts, headers = parse_fastq_native(p)
    assert bytes(seq) == b"ACGTGGTT"
    np.testing.assert_array_equal(starts, [0, 4])
    assert headers == ["read1 x", "read2"]


def test_build_idempotent():
    assert build_native()
