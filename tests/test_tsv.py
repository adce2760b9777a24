"""TSV writer/merge behavior, incl. parity with golden combined matrices."""

import numpy as np
import pytest

from mercat2_tpu.engine.counter import KmerTable
from mercat2_tpu.report.tsv import merge_tsv, merge_tsv_T, write_counts_tsv


def _table(d: dict[str, int], k: int) -> KmerTable:
    items = sorted(d.items())
    kmers = np.frombuffer("".join(km for km, _ in items).encode(), np.uint8)
    return KmerTable(kmers.reshape(-1, k).copy(),
                     np.array([c for _, c in items], np.int64))


def test_write_counts_format(tmp_path):
    t = _table({"AAA": 5, "CCC": 2}, 3)
    out = write_counts_tsv(t, "S1", tmp_path / "S1_counts.tsv")
    assert out.read_text() == "k-mer\tS1_Count\nAAA\t5\nCCC\t2\n"


def test_write_counts_empty_returns_none(tmp_path):
    assert write_counts_tsv(KmerTable.empty(3), "S", tmp_path / "x.tsv") is None


def test_merge_tsv_union_zero_fill(tmp_path):
    a = write_counts_tsv(_table({"AA": 1, "CC": 2}, 2), "a", tmp_path / "a.tsv")
    b = write_counts_tsv(_table({"CC": 5, "GG": 7}, 2), "b", tmp_path / "b.tsv")
    out = merge_tsv({"b": b, "a": a}, tmp_path / "combined.tsv")
    assert out.read_text() == (
        "k-mer\ta\tb\nAA\t1\t0\nCC\t2\t5\nGG\t0\t7\n"
    )


def test_merge_tsv_T_deterministic_sorted(tmp_path):
    a = write_counts_tsv(_table({"AA": 1, "CC": 2}, 2), "a", tmp_path / "a.tsv")
    b = write_counts_tsv(_table({"CC": 5, "GG": 7}, 2), "b", tmp_path / "b.tsv")
    out = merge_tsv_T({"b": b, "a": a}, tmp_path / "T.tsv")
    assert out.read_text() == (
        "sample\tAA\tCC\tGG\na\t1\t2\t0\nb\t0\t5\t7\n"
    )


def test_merge_tsv_golden_parity(tmp_path, golden_results):
    """Re-merge the golden per-sample TSVs; rows must match the golden
    combined matrix (header differs: the old release wrote 'kmer', the
    current reference source takes the first header cell -> 'k-mer')."""
    base = golden_results / "fna-5genomes-10"
    tsvs = {
        p.name.replace("_counts.tsv", ""): p
        for p in (base / "tsv_nucleotide").glob("*_counts.tsv")
    }
    out = merge_tsv(tsvs, tmp_path / "combined.tsv")
    got = out.read_text().split("\n")
    want = (base / "combined_Nucleotide.tsv").read_text().split("\n")
    assert got[0].split("\t")[1:] == want[0].split("\t")[1:]
    assert got[1:] == want[1:]


def test_merge_identical_row_order_files(tmp_path):
    """Alpha-diversity merge case: same row keys in non-sorted order must
    pass through in file order (reference merges metric TSVs this way)."""
    f1 = tmp_path / "m1.tsv"
    f1.write_text("Metric\tA\nshannon\t1.0\nace\t2.0\n")
    f2 = tmp_path / "m2.tsv"
    f2.write_text("Metric\tB\nshannon\t3.0\nace\t4.0\n")
    out = merge_tsv({"A": f1, "B": f2}, tmp_path / "d.tsv")
    assert out.read_text() == "Metric\tA\tB\nshannon\t1.0\t3.0\nace\t2.0\t4.0\n"
