"""remove_n parity: cleaned output must byte-match the reference's committed
clean files, and GC stats must match the golden stats (with quirks)."""

import gzip

import pytest

from mercat2_tpu.io.clean import remove_n, split_sequence_n


def test_split_basic():
    seqs, n_lens = split_sequence_n("chr1 some info", "ACGTNNNACGT")
    assert seqs == [">chr1_1 some info", "ACGT", ">chr1_2 some info", "ACGT"]
    assert n_lens == [3]


def test_split_no_info_has_trailing_space():
    seqs, _ = split_sequence_n("chr1", "ACNGT")
    assert seqs[0] == ">chr1_1 "  # reference always emits the space


def test_split_leading_trailing_n():
    seqs, n_lens = split_sequence_n("x", "NNACGTNN")
    # leading/trailing runs produce empty sub-records (header only)
    assert seqs == [">x_1 ", ">x_2 ", "ACGT", ">x_3 "]
    assert n_lens == [2, 2]


def test_split_wraps_at_80():
    seqs, _ = split_sequence_n("x", "A" * 200)
    assert seqs == [">x_1 ", "A" * 80, "A" * 80, "A" * 40]


@pytest.mark.parametrize("name", ["RW1", "GIC31", "RW2"])
def test_remove_n_golden_parity(tmp_path, ref_data, golden_results, name):
    cleaned, stats = remove_n(ref_data / "5-genomes-fna" / f"{name}.fna", tmp_path, False)
    golden = golden_results / "fna-5genomes-10" / "clean" / f"{name}_clean.fna.gz"
    with gzip.open(cleaned) as got, gzip.open(golden) as want:
        assert got.read() == want.read()


def test_remove_n_scaffolds(tmp_path, ref_data):
    cleaned, stats = remove_n(ref_data / "Scaffolds_with-NNN.fna", tmp_path, False)
    with gzip.open(cleaned, "rt") as f:
        text = f.read()
    assert "N" not in text.split("\n", 2)[1]  # first sequence line has no N
    assert 0 < stats["GC Content"] < 100


def test_remove_n_header_gc_quirk(tmp_path):
    # headers are tallied in the N-branch GC stats (reference lines 103-104)
    src = tmp_path / "x.fna"
    src.write_text(">GC_GC desc\nAANAA\n")
    _, stats = remove_n(src, tmp_path / "out", False)
    # sequences: ">GC_GC_1 desc" (4 G/C, len 13), "AA", ">GC_GC_2 desc", "AA"
    total = 13 + 2 + 13 + 2
    gc = 4 + 0 + 4 + 0
    assert stats["GC Content"] == pytest.approx(100.0 * gc / total)


def test_remove_n_toupper(tmp_path):
    src = tmp_path / "x.fna"
    src.write_text(">a\nacgt\n")
    cleaned, _ = remove_n(src, tmp_path / "out", True)
    with gzip.open(cleaned, "rt") as f:
        assert f.read() == ">a\nACGT\n"
