"""Alpha diversity golden parity: feed the reference's committed per-sample
count TSVs through our implementation and byte-compare the metric TSVs."""

import pytest

from mercat2_tpu.metrics.alpha import compute_alpha_diversity, alpha_metric

import numpy as np


@pytest.mark.parametrize("name", ["DJ", "GIC31", "RW1", "RW2", "Rleg"])
def test_alpha_golden_parity(tmp_path, golden_results, name):
    counts_tsv = (
        golden_results / "fna-5genomes-10" / "tsv_nucleotide" / f"{name}_counts.tsv"
    )
    golden = (
        golden_results / "fna-5genomes-10" / "report" / "diversity"
        / f"nucleotide-{name}.tsv"
    )
    out = compute_alpha_diversity(name, counts_tsv, tmp_path / "out.tsv")
    assert out.read_text() == golden.read_text()


@pytest.mark.parametrize("name", ["DJ", "RW1"])
def test_alpha_golden_parity_fgs(tmp_path, golden_results, name):
    counts_tsv = golden_results / "fna-5genomes-10" / "tsv_fgs" / f"{name}_counts.tsv"
    golden = (
        golden_results / "fna-5genomes-10" / "report" / "diversity" / f"fgs-{name}.tsv"
    )
    if not counts_tsv.exists():
        pytest.skip("golden fgs counts missing")
    out = compute_alpha_diversity(name, counts_tsv, tmp_path / "out.tsv")
    assert out.read_text() == golden.read_text()


def test_alpha_with_singletons_and_doubletons():
    counts = np.array([1, 1, 1, 2, 2, 5, 10, 100])
    # chao1 bias-corrected: S + f1(f1-1)/(2(f2+1)) = 8 + 3*2/(2*3) = 9
    assert alpha_metric("chao1", counts) == 9.0
    lo, hi = alpha_metric("chao1_ci", counts)
    assert lo <= 9.0 <= hi
    sh = alpha_metric("shannon", counts)
    assert 0 < sh < np.log2(8) + 1e-9


def test_alpha_failure_is_na():
    assert alpha_metric("fisher_alpha", np.array([1, 1, 1])) == "NA"
